"""Compare XLA cost-analysis bytes for three neighborhood-gather forms."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/tpugan_jax'))
import jax.numpy as jnp
from jax import lax
import numpy as np

B, N, K, C = 1, 10240, 20, 32
rng = np.random.default_rng(0)
pts = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32)).astype(jnp.bfloat16)
idx = jnp.asarray(rng.integers(0, N, (B, N, K)).astype(np.int32))


def form_a(points, idx):   # current: take_along_axis, broadcast over C
    b, m, k = idx.shape
    flat = jnp.take_along_axis(points, idx.reshape(b, m * k)[..., None], axis=1)
    return flat.reshape(b, m, k, points.shape[-1])


def form_b(points, idx):   # explicit lax.gather of [1, C] row slices
    b, m, k = idx.shape
    out = lax.gather(
        points,
        idx.reshape(b, m * k)[..., None],
        lax.GatherDimensionNumbers(
            offset_dims=(2,),
            collapsed_slice_dims=(1,),
            start_index_map=(1,),
            operand_batching_dims=(0,),
            start_indices_batching_dims=(0,),
        ),
        slice_sizes=(1, 1, points.shape[-1]),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )
    return out.reshape(b, m, k, points.shape[-1])


def form_c(points, idx):   # gather on squeezed batch (B=1 fast path)
    m, k = idx.shape[1], idx.shape[2]
    out = jnp.take(points[0], idx[0].reshape(m * k), axis=0,
                   mode="clip")
    return out.reshape(1, m, k, points.shape[-1])


for name, fn in [("a take_along_axis", form_a), ("b lax.gather", form_b),
                 ("c jnp.take B=1", form_c)]:
    # consume with a reduce so the gather output is the only real product
    g = jax.jit(lambda p, i, fn=fn: jnp.sum(fn(p, i), axis=2))
    comp = g.lower(pts, idx).compile()
    ca = comp.cost_analysis()
    out = np.asarray(g(pts, idx))
    ref = np.asarray(pts)[0][np.asarray(idx)[0]].sum(axis=1)[None]
    ok = np.allclose(out, ref, rtol=1e-2, atol=1e-2)
    print(f"{name}: bytes={ca.get('bytes accessed', 0)/1e6:8.1f} MB "
          f"flops={ca.get('flops', 0)/1e6:6.1f} M correct={ok}")
