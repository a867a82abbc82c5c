"""Trace the SRNet serving-mode forward on TPU and print per-op durations.

Usage: python tools/profile_serving.py [f32|bf16|bf16static]

Prints every device op >= 20 us summed over ITERS chained forwards. Other
programs sharing the chip (a training run) appear as separate entries; the
forward's ops are identified by run grouping in time — we print raw totals,
so read marginal numbers comparatively, not absolutely, under contention.
"""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/tpugan_jax'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
import jax.numpy as jnp
import numpy as np

from tpugan_tpu.models import SRNet

N = 10240
ITERS = 8
mode = sys.argv[1] if len(sys.argv) > 1 else "bf16static"
kw = {}
if mode in ("bf16", "bf16static"):
    kw["compute_dtype"] = jnp.bfloat16
if mode == "bf16static":
    kw["graph_mode"] = "static"

model = SRNet(in_feats=3, node_emb_dim=128, upsample_ratio=8, **kw)
f32 = SRNet(in_feats=3, node_emb_dim=128, upsample_ratio=8)
rng = np.random.default_rng(0)
pos = jnp.asarray(rng.standard_normal((1, N, 3)).astype(np.float32) * 0.3)
variables = jax.jit(lambda k, p: f32.init(k, p, p, False))(
    jax.random.PRNGKey(0), pos)
step = jax.jit(lambda v, p: model.apply(v, p, p, False)[0][:, :N] * 0.999)
step = step.lower(variables, pos).compile()

p = pos
for _ in range(3):
    p = step(variables, p)
_ = np.asarray(p[0, 0, 0])

logdir = f"/tmp/trace_serving_{mode}"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    p = pos
    for _ in range(ITERS):
        p = step(variables, p)
    _ = np.asarray(p[0, 0, 0])

path = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
pd = jax.profiler.ProfileData.from_serialized_xspace(
    open(path[0], "rb").read())
tot, cnt = {}, {}
for plane in pd.planes:
    if "TPU" not in plane.name and "Device" not in plane.name:
        continue
    for line in plane.lines:
        for ev in line.events:
            tot[ev.name] = tot.get(ev.name, 0) + ev.duration_ns
            cnt[ev.name] = cnt.get(ev.name, 0) + 1
print(f"== {mode}: per-op totals / {ITERS} iters (ms per iter) ==")
gtot = 0.0
for name, dur in sorted(tot.items(), key=lambda kv: -kv[1])[:40]:
    per = dur / ITERS / 1e6
    if per < 0.02:
        break
    gtot += per
    print(f"{per:9.3f} ms x{cnt[name]:4d}  {name[:100]}")
print(f"{gtot:9.3f} ms  TOTAL(shown)")
