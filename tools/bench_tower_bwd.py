"""Time the discriminator-tower fwd+bwd: XLA SetConv vs fused Pallas
(forward + dedicated multi-pass backward, pooled_mlp_kernel.py).

Timing fetches a scalar value per rep (block_until_ready does not
synchronize under the axon tunnel — see BENCH_NOTES.md).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import tpugan_tpu.nn.setconv as sc
from tpugan_tpu.models.discriminator import FluidSpatialDis, FluidTempoDis

B, N = 4, 9216
rng = np.random.default_rng(0)
pts = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32) * 0.3)
pts3 = [jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32) * 0.3)
        for _ in range(3)]
vel3 = [jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32) * 0.1)
        for _ in range(3)]

dis = FluidSpatialDis()
v = dis.init(jax.random.PRNGKey(0), pts, train=True)
tempo = FluidTempoDis(3)
vt = tempo.init(jax.random.PRNGKey(1), pts3, 0.1, feat_lst=vel3, train=True)


def make_loss(fused):
    def loss(params):
        sc._FUSED_TRAIN = fused
        out, _ = dis.apply({**v, "params": params}, pts, train=True,
                           mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.sum(out ** 2)
    return jax.jit(jax.grad(loss))


def make_tempo_loss(fused):
    def loss(params):
        sc._FUSED_TRAIN = fused
        out, _ = tempo.apply({**vt, "params": params}, pts3, 0.1,
                             feat_lst=vel3, train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.sum(out ** 2)
    return jax.jit(jax.grad(loss))


def timeit(fn, args, reps=20):
    g = fn(args)
    _ = float(jax.tree_util.tree_leaves(g)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        g = fn(args)
        _ = float(jax.tree_util.tree_leaves(g)[0].ravel()[0])
    return (time.perf_counter() - t0) / reps * 1e3


for fused in (False, True):
    sc._FUSED_TRAIN = fused  # trace-time flag (see setconv.py)
    spatial_fn = make_loss(fused)
    ms = timeit(spatial_fn, v["params"])
    print(f"FluidSpatialDis fwd+bwd b{B}x{N} fused={fused}: {ms:.2f} ms")

for fused in (False, True):
    sc._FUSED_TRAIN = fused
    tempo_fn = make_tempo_loss(fused)
    ms = timeit(tempo_fn, vt["params"])
    print(f"FluidTempoDis  fwd+bwd b{B}x{N} fused={fused}: {ms:.2f} ms")
