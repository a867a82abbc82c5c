"""Trace the full SRNet forward on TPU and print per-op durations from the
xplane, comparing chunked vs plain kNN dispatch."""
import glob
import os
import sys
import time

import jax
jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/tpugan_jax'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
import jax.numpy as jnp
import numpy as np

import tpugan_tpu.ops.pallas.knn_kernel as kk
from tpugan_tpu.models import SRNet

N = 10240
mode = sys.argv[1]  # plain | chunked
if mode == "plain":
    kk._use_chunked = lambda nc, k, d: False

model = SRNet(in_feats=3, node_emb_dim=128, upsample_ratio=8)
rng = np.random.default_rng(0)
pos = jnp.asarray(rng.standard_normal((1, N, 3)).astype(np.float32) * 0.3)
variables = jax.jit(lambda k, p: model.init(k, p, p, False))(
    jax.random.PRNGKey(0), pos)
step = jax.jit(lambda v, p: model.apply(v, p, p, False)[0][:, :N] * 0.999)
step = step.lower(variables, pos).compile()

# warm
p = pos
for _ in range(3):
    p = step(variables, p)
_ = np.asarray(p[0, 0, 0])

logdir = f"/tmp/trace_{mode}"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    p = pos
    for _ in range(4):
        p = step(variables, p)
    _ = np.asarray(p[0, 0, 0])

# parse
path = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplane files:", path)
pd = jax.profiler.ProfileData.from_serialized_xspace(
    open(path[0], "rb").read())
tot = {}
for plane in pd.planes:
    if "TPU" not in plane.name and "Device" not in plane.name:
        continue
    print("PLANE:", plane.name)
    for line in plane.lines:
        for ev in line.events:
            name = ev.name
            dur = ev.duration_ns
            tot[name] = tot.get(name, 0) + dur
for name, dur in sorted(tot.items(), key=lambda kv: -kv[1])[:25]:
    print(f"{dur/4/1e6:9.3f} ms  {name[:110]}")
