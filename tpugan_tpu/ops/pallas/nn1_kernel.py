"""Large-cloud single-nearest-neighbor Pallas kernel (Chamfer backbone).

The fused kNN kernel (knn_kernel.py) holds a [TILE_Q, M] distance row in
VMEM, capping M near 24k. For Chamfer at eval scale (the reference's
timing harness runs batch 8 x 79,872 points,
train_fluid/analysis_helper.py:306-344) only k=1 is needed, so the
distance row can be *streamed* in candidate blocks with a running
(min, argmin) — the distance matrix never exists anywhere, HBM or VMEM.

Layout note: candidates are carried as [3, M] (coordinates on sublanes,
points on lanes). The natural [M, 3] layout lane-pads 3 -> 128 in VMEM
(42 MB for an 80k cloud, double-buffered = instant scoped-vmem OOM);
transposed it is ~2.6 MB and the per-block matmul contracts q's coordinate
axis against the block's sublane axis directly.

Differentiable via the same recompute-from-gathered-coordinates VJP as
the kNN kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e10
TILE_Q = 128
CBLK = 4096          # candidate block width (lane dim of one d2 block)
MAX_M = 1048576      # cand [3, M] f32 + bias [M] ~ 16 MB of VMEM at the cap
_UNROLL = 8          # blocks per fori_loop step: Mosaic stack-allocates
                     # each unrolled block's [TQ, CBLK] temporaries, so a
                     # full unroll would need n_blocks * ~4MB of scoped
                     # vmem; groups of 8 keep it bounded while amortizing
                     # the loop's scalar overhead


def _nn1_kernel(q_ref, ct_ref, v_ref, d2_ref, idx_ref, *, n_blocks):
    q = q_ref[0]                                    # [TQ, 3]
    q2 = jnp.sum(q * q, axis=1, keepdims=True)      # [TQ, 1]

    def one_block(i, m, am):
        off = pl.multiple_of(i * CBLK, CBLK)
        ct = ct_ref[0, :, pl.ds(off, CBLK)]         # [3, CBLK]
        c2 = jnp.sum(ct * ct, axis=0)[None, :]      # [1, CBLK]
        cross = jax.lax.dot_general(
            q, ct, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                           # [TQ, CBLK]
        d2 = jnp.maximum(q2 + c2 - 2.0 * cross, 0.0)
        d2 = d2 + v_ref[0, 0, pl.ds(off, CBLK)][None, :]
        mb = jnp.min(d2, axis=1)
        ab = jnp.argmin(d2, axis=1).astype(jnp.int32) + i * CBLK
        better = mb < m                              # ties keep lower block
        return jnp.where(better, mb, m), jnp.where(better, ab, am)

    init = (
        jnp.full((q.shape[0],), BIG, jnp.float32),
        jnp.zeros((q.shape[0],), jnp.int32),
    )
    n_groups = n_blocks // _UNROLL

    def group(g, carry):
        m, am = carry
        base = g * _UNROLL
        for u in range(_UNROLL):
            m, am = one_block(base + u, m, am)
        return m, am

    m, am = jax.lax.fori_loop(0, n_groups, group, init)
    for i in range(n_groups * _UNROLL, n_blocks):
        m, am = one_block(i, m, am)
    d2_ref[0, :, 0] = m
    idx_ref[0, :, 0] = am


def _nn1_impl(query, cand, cvalid_bias):
    b, nq, d = query.shape
    mm = cand.shape[1]
    pad_q = (-nq) % TILE_Q
    pad_m = (-mm) % CBLK
    qp = jnp.pad(query, ((0, 0), (0, pad_q), (0, 0))) if pad_q else query
    if pad_m:
        cand = jnp.pad(cand, ((0, 0), (0, pad_m), (0, 0)))
        cvalid_bias = jnp.pad(cvalid_bias, ((0, 0), (0, pad_m)),
                              constant_values=BIG)
    nq_p, m_p = nq + pad_q, mm + pad_m
    cand_t = jnp.swapaxes(cand, 1, 2)               # [B, 3, M]

    d2, idx = pl.pallas_call(
        functools.partial(_nn1_kernel, n_blocks=m_p // CBLK),
        grid=(b, nq_p // TILE_Q),
        in_specs=[
            pl.BlockSpec((1, TILE_Q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, m_p), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m_p), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_Q, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_Q, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nq_p, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, nq_p, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(qp, cand_t, cvalid_bias[:, None, :])
    return d2[:, :nq, 0], idx[:, :nq, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def nn1_pallas(
    query: jnp.ndarray,        # [B, Nq, 3]
    cand: jnp.ndarray,         # [B, M, 3]
    cvalid_bias: jnp.ndarray,  # [B, M] f32: 0 valid / BIG invalid
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest neighbor per query: (d2 [B, Nq], idx [B, Nq] int32)."""
    return _nn1_impl(query, cand, cvalid_bias)


def _nn1_fwd(query, cand, cvalid_bias):
    d2, idx = _nn1_impl(query, cand, cvalid_bias)
    return (d2, idx), (query, cand, idx)


def _nn1_bwd(residuals, cotangents):
    query, cand, idx = residuals
    g_d2, _ = cotangents
    b, nq = idx.shape
    nbr = jnp.take_along_axis(cand, idx[..., None], axis=1)   # [B, Nq, D]
    diff = query - nbr
    gq = 2.0 * g_d2[..., None] * diff
    gc = jnp.zeros_like(cand).at[
        jnp.arange(b)[:, None], idx
    ].add(-2.0 * g_d2[..., None] * diff)
    return gq, gc, None


nn1_pallas.defvjp(_nn1_fwd, _nn1_bwd)
