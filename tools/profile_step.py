"""Trace the full fluid GAN train step on TPU and print per-op durations.

Run AFTER the long training finishes (single-client chip). Uses the same
config as the training run (batch 4, patch 9216, use_vel) with the
adversarial gate forced on so D towers and cubic interpolation are live.
``--fast_d`` profiles the stacked-D step (config.py fast_d) for the A/B.
"""
import argparse
import glob
import os

import jax
jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/tpugan_jax'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
import jax.numpy as jnp
import numpy as np

from tpugan_tpu.config import FluidTrainConfig
from tpugan_tpu.train import init_fluid_state, make_fluid_gan_step

_ap = argparse.ArgumentParser()
_ap.add_argument("--fast_d", action="store_true")
_opt = _ap.parse_args()

cfg = FluidTrainConfig(
    batch_size=4, patch_size=9216, use_vel=True, in_node_feats=6,
    ml_gate=10.0,  # force the adversarial branch live
    fast_d=_opt.fast_d,
    log_dir="/tmp/step_prof",
)
key = jax.random.PRNGKey(0)
models, txs, state = init_fluid_state(cfg, key)
jstep = make_fluid_gan_step(models, txs, cfg)  # already jitted+donated

rng = np.random.default_rng(0)
n, m = cfg.lowres_size, cfg.patch_size
batch = {
    "lowres_pos": jnp.asarray(rng.standard_normal((3, 4, n, 3)
                                                  ).astype(np.float32) * .3),
    "lowres_vel": jnp.asarray(rng.standard_normal((3, 4, n, 3)
                                                  ).astype(np.float32) * .1),
    "highres_pos": jnp.asarray(rng.standard_normal((3, 4, m, 3)
                                                   ).astype(np.float32) * .3),
    "highres_vel": jnp.asarray(rng.standard_normal((3, 4, m, 3)
                                                   ).astype(np.float32) * .1),
}
# force past the warmup (iter > 10) and an even iter for the D update
state = state.replace(n_iter=jnp.int32(101))

for i in range(3):
    state, metrics = jstep(state, batch, jax.random.PRNGKey(i))
print("warm metrics:", {k: float(v) for k, v in metrics.items()
                        if jnp.ndim(v) == 0})

logdir = "/tmp/trace_step"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    for i in range(3):
        state, metrics = jstep(state, batch, jax.random.PRNGKey(10 + i))
    _ = float(metrics["Chamfer_distance_no_norm"])

path = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)[0]
pd = jax.profiler.ProfileData.from_serialized_xspace(open(path, "rb").read())
tot = {}
spans = []
for plane in pd.planes:
    if "TPU" not in plane.name:
        continue
    for line in plane.lines:
        for ev in line.events:
            tot[ev.name] = tot.get(ev.name, 0) + ev.duration_ns
            if ev.name.startswith("jit_step") or "jit_" in ev.name and ev.duration_ns > 3e7:
                spans.append(ev.duration_ns)
print(f"\nper-step program time: {[round(s/1e6,1) for s in sorted(spans)[-3:]]} ms")
for name, dur in sorted(tot.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{dur/3/1e6:9.3f} ms  {name[:120]}")
