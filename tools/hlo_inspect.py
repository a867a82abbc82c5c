"""Compile the bf16+static forward and report cost analysis + the largest
materialized buffers between fusions (premise check for post-gather fusion)."""
import os, re, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/tpugan_jax'))
import jax.numpy as jnp
import numpy as np
from tpugan_tpu.models import SRNet

N = 10240
model = SRNet(in_feats=3, node_emb_dim=128, upsample_ratio=8,
              compute_dtype=jnp.bfloat16, graph_mode="static")
f32 = SRNet(in_feats=3, node_emb_dim=128, upsample_ratio=8)
rng = np.random.default_rng(0)
pos = jnp.asarray(rng.standard_normal((1, N, 3)).astype(np.float32) * 0.3)
variables = jax.jit(lambda k, p: f32.init(k, p, p, False))(
    jax.random.PRNGKey(0), pos)
step = jax.jit(lambda v, p: model.apply(v, p, p, False)[0][:, :N] * 0.999)
comp = step.lower(variables, pos).compile()
ca = comp.cost_analysis()
print("flops:", ca.get("flops"), "bytes accessed:", ca.get("bytes accessed"))
for k_, v in sorted(ca.items()):
    if "bytes" in k_ and isinstance(v, float) and v > 1e6:
        print(f"  {k_}: {v/1e6:.1f} MB")
txt = comp.as_text()
# shapes written by each top-level instruction in the entry computation
sizes = {}
for m in re.finditer(r"(\w+)\s*=\s*(bf16|f32|s32|u32)\[([\d,]+)\]", txt):
    dt, dims = m.group(2), m.group(3)
    n = 1
    for d in dims.split(","):
        n *= int(d)
    b = n * (2 if dt == "bf16" else 4)
    if b > 4e6:
        sizes.setdefault((dt, dims), 0)
        sizes[(dt, dims)] += 1
for (dt, dims), cnt in sorted(sizes.items(),
                              key=lambda kv: -kv[1]):
    n = 1
    for d in dims.split(","):
        n *= int(d)
    b = n * (2 if dt == "bf16" else 4) / 1e6
    print(f"{cnt:3d} x {dt}[{dims}] = {b:.1f} MB each")
