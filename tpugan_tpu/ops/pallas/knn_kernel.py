"""Fused pairwise-distance + top-k Pallas kernel (exact kNN).

One kernel program handles a [TILE_Q, 3] query tile against the full
candidate set: the [TILE_Q, Nc] squared-distance block is produced on the
MXU into VMEM scratch and k minima are peeled off with k min/argmin passes
(k is small — 4..64 — so k VPU reductions beat the full row sort XLA's
``top_k`` lowering does through HBM). HBM traffic is O(inputs + outputs),
never O(Nq * Nc).

Replaces (with tpugan_tpu.ops.neighbors.knn as the portable fallback) the
CUDA kNN of pytorch3d ``knn_points`` and — via the kNN-padding identity —
FRNN ``frnn_grid_points`` (reference gcn_lib/pointnet/gcn.py:13-45).

Differentiability: custom VJP recomputing d2 = |q - c[idx]|^2 from gathered
neighbor coordinates, so gradients flow to both point sets without saving
the distance matrix.

Capacity: TILE_Q=128 rows of f32 distances need 512 * Nc bytes of VMEM
scratch; Nc <= ~24k fits the 16 MB budget alongside blocks. Larger clouds
should go through the chunked XLA fallback.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e10  # python float: jnp constants would be captured tracers in kernels
TILE_Q = 128  # fallback; _tile_q picks the largest tile the 16MB VMEM allows


def _tile_q(nc: int) -> int:
    # scratch is TILE_Q * Nc * 4 bytes and must stay well under the ~14MB
    # scoped-vmem budget (measured: 512x10240 OOMs, 256x10240 fits)
    return 128  # 256 wins ~8% in isolation but crashes the remote compiler
    # inside the full train-step graph; pinned pending a Mosaic fix


def _knn_kernel(q_ref, c_ref, v_ref, d2_ref, idx_ref, scratch, *, k):
    # refs carry a singleton batch-block axis
    q = q_ref[0]                                   # [TQ, D]
    c = c_ref[0]                                   # [Nc, D]
    q2 = jnp.sum(q * q, axis=1, keepdims=True)     # [TQ, 1]
    c2 = jnp.sum(c * c, axis=1)[None, :]           # [1, Nc]
    # precision HIGHEST: Mosaic's default f32 matmul runs bf16 passes and
    # ~1e-1 distance error flips neighbor rankings (measured on v5e).
    cross = jax.lax.dot_general(
        q, c,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                              # [TQ, Nc]
    d2 = jnp.maximum(q2 + c2 - 2.0 * cross, 0.0)
    scratch[:] = d2 + v_ref[0]                     # +BIG on invalid slots

    iota = jax.lax.broadcasted_iota(jnp.int32, scratch.shape, 1)
    for j in range(k):
        row = scratch[:]
        m = jnp.min(row, axis=1)                   # [TQ]
        am = jnp.argmin(row, axis=1).astype(jnp.int32)
        d2_ref[0, :, j] = m
        idx_ref[0, :, j] = am
        scratch[:] = jnp.where(iota == am[:, None], BIG, row)


def _knn_pallas_impl(query, cand, cvalid_bias, k):
    b, nq, d = query.shape
    nc = cand.shape[1]
    tile_q = _tile_q(nc)
    pad_q = (-nq) % tile_q
    qp = jnp.pad(query, ((0, 0), (0, pad_q), (0, 0))) if pad_q else query
    nq_p = nq + pad_q

    kernel = functools.partial(_knn_kernel, k=k)
    d2, idx = pl.pallas_call(
        kernel,
        grid=(b, nq_p // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_q, k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nq_p, k), jnp.float32),
            jax.ShapeDtypeStruct((b, nq_p, k), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((tile_q, nc), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(qp, cand, cvalid_bias[:, None, :])
    return d2[:, :nq], idx[:, :nq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def knn_pallas(
    query: jnp.ndarray,        # [B, Nq, D]
    cand: jnp.ndarray,         # [B, Nc, D]
    cvalid_bias: jnp.ndarray,  # [B, Nc] f32: 0 valid / BIG invalid
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact kNN, ascending: (d2 [B, Nq, k], idx [B, Nq, k] int32)."""
    return _knn_pallas_impl(query, cand, cvalid_bias, k)


def _knn_fwd(query, cand, cvalid_bias, k):
    d2, idx = _knn_pallas_impl(query, cand, cvalid_bias, k)
    return (d2, idx), (query, cand, idx)


def _knn_bwd(k, residuals, cotangents):
    query, cand, idx = residuals
    g_d2, _ = cotangents
    b, nq, kk = idx.shape
    flat_idx = idx.reshape(b, nq * kk).astype(jnp.int32)
    d = cand.shape[-1]
    nbr = jnp.take_along_axis(
        cand, flat_idx[..., None], axis=1
    ).reshape(b, nq, kk, d)
    diff = query[:, :, None, :] - nbr                   # [B, Nq, k, D]
    gq = jnp.sum(2.0 * g_d2[..., None] * diff, axis=2)  # [B, Nq, D]
    gc_flat = (-2.0 * g_d2[..., None] * diff).reshape(b, nq * kk, d)
    gc = jnp.zeros_like(cand).at[
        jnp.arange(b)[:, None], flat_idx
    ].add(gc_flat)
    return gq, gc, None


knn_pallas.defvjp(_knn_fwd, _knn_bwd)
