"""Fused ball-query Pallas kernel (pointnet2 index-order semantics).

Per query: the first ``nsample`` candidates *in index order* whose squared
distance is < radius^2, padded by repeating the first found (0 when the
ball is empty) — exactly pointnet2_ops' CUDA ball_query as used by
``QueryAndGroup`` in every set-abstraction module (reference
discriminator.py:141,190-192).

Same structure as the kNN kernel: distance block on the MXU into VMEM
scratch, then ``nsample`` min-peeling passes — but over the *index key*
``(d2 < r^2 ? candidate_index : BIG)``, whose minima enumerate in-ball
candidates in index order. No gradients flow through indices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIGI = 1 << 29
TILE_Q = 128


def _tile_q(nc: int) -> int:
    # scratch TILE_Q * Nc * 4B must stay under the ~14MB scoped-vmem budget
    return 128  # 256 wins ~8% in isolation but crashes the remote compiler
    # inside the full train-step graph; pinned pending a Mosaic fix


def _ball_kernel(q_ref, c_ref, v_ref, idx_ref, scratch, *, nsample, radius):
    q = q_ref[0]                                   # [TQ, D]
    c = c_ref[0]                                   # [Nc, D]
    q2 = jnp.sum(q * q, axis=1, keepdims=True)
    c2 = jnp.sum(c * c, axis=1)[None, :]
    cross = jax.lax.dot_general(
        q, c,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = q2 + c2 - 2.0 * cross                     # [TQ, Nc]
    iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    within = (d2 < radius * radius) & (v_ref[0] < 1.0)
    scratch[:] = jnp.where(within, iota, BIGI)

    for j in range(nsample):
        row = scratch[:]
        m = jnp.min(row, axis=1).astype(jnp.int32)  # next in-ball index
        idx_ref[0, :, j] = m
        scratch[:] = jnp.where(row == m[:, None], BIGI, row)


def ball_query_pallas(
    query: jnp.ndarray,        # [B, Nq, 3]
    cand: jnp.ndarray,         # [B, Nc, 3]
    radius: float,
    nsample: int,
    cvalid_bias: jnp.ndarray,  # [B, Nc] f32: 0 valid / >=1 invalid
) -> jnp.ndarray:
    """idx [B, Nq, nsample] int32 (index-order, first-found padding)."""
    b, nq, d = query.shape
    nc = cand.shape[1]
    # Non-differentiable index op: cut tangents before the kernel.
    query = jax.lax.stop_gradient(query)
    cand = jax.lax.stop_gradient(cand)
    cvalid_bias = jax.lax.stop_gradient(cvalid_bias)
    tile_q = _tile_q(nc)
    pad_q = (-nq) % tile_q
    qp = jnp.pad(query, ((0, 0), (0, pad_q), (0, 0))) if pad_q else query
    nq_p = nq + pad_q

    kernel = functools.partial(_ball_kernel, nsample=nsample,
                               radius=float(radius))
    idx = pl.pallas_call(
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
        out_specs=pl.BlockSpec((1, tile_q, nsample), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nq_p, nsample), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tile_q, nc), jnp.int32)],
        interpret=jax.default_backend() != "tpu",
    )(qp, cand, cvalid_bias[:, None, :])
    idx = idx[:, :nq]

    found = idx < BIGI
    first = jnp.where(found[..., :1], idx[..., :1], 0)
    return jnp.where(found, idx, first).astype(jnp.int32)
