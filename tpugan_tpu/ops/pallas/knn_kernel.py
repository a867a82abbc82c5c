"""Fused pairwise-distance + top-k Pallas kernels (exact kNN).

One kernel program handles a [TILE_Q, 3] query tile against the full
candidate set: the [TILE_Q, Nc] squared-distance block is produced on the
MXU into VMEM scratch and the k minima are extracted on the VPU. HBM
traffic is O(inputs + outputs), never O(Nq * Nc).

Two extraction strategies, dispatched on (Nc, k):

* **Plain peel** (small Nc or k <= 2): k min/argmin passes over the full
  [TILE_Q, Nc] scratch — k VPU reductions beat the full row sort XLA's
  ``top_k`` lowering does through HBM.
* **Chunked peel** (large Nc, k >= 3): view the row as 128 lane-column
  chunks, extract only kp << k local minima per chunk with kp *read-only*
  fold passes (prior extractions are masked inline by (value, source-tile)
  identity — scratch is never written after the distance fill), then
  merge the per-chunk candidate lists with k cheap peels over the kp*128
  candidate buffer. Exactness is certified for free from the last fold's
  per-lane minima (a lane whose kp-th local min is <= the k-th selected
  value might hide a (kp+1)-th competitor); the rare tile that fails the
  certificate re-runs the full k-pass peel on the still-pristine scratch
  under ``pl.when``. Tie order matches a stable argsort: folds keep the
  smallest source tile on value ties, and the merge resolves value ties
  by global index, so results are bit-identical to the plain peel.

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
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e10  # python float: jnp constants would be captured tracers in kernels
TILE_Q = 128  # fallback; _tile_q picks the largest tile the 16MB VMEM allows


def _tile_q(nc: int) -> int:
    # scratch is TILE_Q * Nc * 4 bytes. 256-row tiles now COMPILE (the
    # round-1 Mosaic crash no longer reproduces with the fold-peel body)
    # but measure neutral-to-slightly-worse in the full forward
    # (trace-based bench: 40.0 fps vs 41.2 at 128), so 128 stays.
    return 128


_CHUNK_L = 128          # candidate-chunk width (one lane tile)
_CHUNK_MIN_NC = 4096    # below this the plain peel is already cheap


def _chunk_kp(k: int) -> int:
    """Local minima kept per lane-column chunk (128 chunks per row).
    Chosen so the probability that more than kp of the true top-k land in
    one column (certificate failure -> full-peel fallback) is negligible:
    with the top-k scattered uniformly over 128 columns the per-column
    count is ~Poisson(k/128), and P(X > kp) at these settings is < 1e-7
    per column."""
    if k >= 16:
        return 5
    if k >= 10:
        return 4
    return 3


def _chunk_kp_approx(k: int) -> int:
    """Fold count for the approximate mode: tolerate a small per-query
    chance of dropping a tail neighbor (P(one lane column holds > kp of
    the true top-k) ~ Poisson tail; at k=20/kp=3 the expected dropped
    neighbors are ~0.3% of queries, at k<=12/kp=2 ~1-2%) in exchange for
    ~kp^2-scaling fold work. Only used for feature-space graph builds
    where the kNN graph is a training detail, never for metrics."""
    if k >= 16:
        return 3
    return 2


def _use_chunked(nc: int, k: int, d: int) -> bool:
    """Dispatch predicate for the chunked fold-peel (patchable for
    in-context A/B bisection)."""
    return nc >= _CHUNK_MIN_NC and nc % _CHUNK_L == 0 and k >= 3


def _peel_loop(scratch, d2_ref, idx_ref, k):
    """Plain k-pass min/argmin extraction over the full scratch row."""
    iota = jax.lax.broadcasted_iota(jnp.int32, scratch.shape, 1)
    for j in range(k):
        row = scratch[:]
        m = jnp.min(row, axis=1)                   # [TQ]
        am = jnp.argmin(row, axis=1).astype(jnp.int32)
        d2_ref[0, :, j] = m
        idx_ref[0, :, j] = am
        scratch[:] = jnp.where(iota == am[:, None], BIG, row)


def _compute_d2(q_ref, c_ref, v_ref, approx=False):
    q = q_ref[0]                                   # [TQ, D]
    c = c_ref[0]                                   # [Nc, D]
    q2 = jnp.sum(q * q, axis=1, keepdims=True)     # [TQ, 1]
    c2 = jnp.sum(c * c, axis=1)[None, :]           # [1, Nc]
    if approx:
        # single bf16 MXU pass; ranking flips between near-equal distances
        # are accepted by the approximate contract.
        cross = jax.lax.dot_general(
            q.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d2 = jnp.maximum(q2 + c2 - 2.0 * cross, 0.0) + v_ref[0]
        return d2.astype(jnp.bfloat16)
    # precision HIGHEST: Mosaic's default f32 matmul runs bf16 passes and
    # ~1e-1 distance error flips neighbor rankings (measured on v5e).
    cross = jax.lax.dot_general(
        q, c,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                              # [TQ, Nc]
    d2 = jnp.maximum(q2 + c2 - 2.0 * cross, 0.0)
    return d2 + v_ref[0]                           # +BIG on invalid slots


_MAXI = 2**31 - 1


def _knn_chunked_kernel(
    q_ref, c_ref, v_ref, d2_ref, idx_ref, scratch, cd, ci, *, k, kp,
    unroll, approx=False
):
    """Chunked fold-peel extraction; see module docstring.

    Chunks are *lane columns*: chunk l = candidates {i*128 + l}. A fold
    peel streams the S = Nc/128 lane tiles once, keeping a running
    per-lane (min, source-tile) pair — min+argmin in a single traversal.
    Folds are READ-ONLY: fold j masks the j elements already extracted in
    folds 0..j-1 inline, each identified by its (source tile, value) pair
    — within one lane a tile index names a unique element, so the mask is
    exact — instead of writing BIG back into scratch. One fold therefore
    costs one VMEM read of the row (the plain peel's fused
    min/argmin/where costs a read plus a write), and only kp folds run
    instead of k peels. The lane-column chunking also scatters
    index-adjacent duplicates (expanded r-copies) across chunks, which
    keeps the certificate-failure rate low exactly where clustered data
    would hurt a contiguous chunking.

    scratch: [TQ, Nc] f32 distance rows (written once, never mutated).
    cd/ci:   [TQ, kp*128] candidate values / global indices.
    """
    tq, nc = scratch.shape
    S = nc // _CHUNK_L
    scratch[:] = _compute_d2(q_ref, c_ref, v_ref, approx=approx)

    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, _CHUNK_L), 1)

    def sl(i):
        return slice(i * _CHUNK_L, (i + 1) * _CHUNK_L)

    # Phase 1: kp read-only fold peels. On TPU the tile loop is unrolled
    # (static slices compile to straight-line vector loads; a fully rolled
    # fori_loop with dynamic offsets costs ~5us/iteration of scalar
    # address overhead, measured 2x the pure VMEM-read time). ``unroll``
    # semantics: True = full static unroll, False = rolled loop (interpret
    # mode, keeps CPU test builds fast), int U > 1 = PARTIAL unroll — a
    # fori_loop whose body processes U tiles from a dynamic base offset,
    # amortizing the scalar overhead over U vector reads while emitting
    # S/U-times less straight-line code (Mosaic compile time for new
    # shapes drops roughly proportionally; ROADMAP round-3 item).
    def _tile_at(i):
        if isinstance(i, int):       # unrolled: static slice
            return slice(i * _CHUNK_L, (i + 1) * _CHUNK_L)
        return pl.ds(pl.multiple_of(i * _CHUNK_L, _CHUNK_L), _CHUNK_L)

    def fold(taken):
        def body(i, carry):
            m, src = carry
            # bf16 scratch (approx mode) halves the fold's VMEM traffic;
            # compute stays f32 — Mosaic cannot relayout the i1 mask a
            # bf16-tiled compare would produce.
            tile = scratch[:, _tile_at(i)].astype(jnp.float32)
            for mj, srcj in taken:
                tile = jnp.where((srcj == i) & (tile == mj), BIG, tile)
            better = tile < m          # strict: ties keep the smaller i
            m = jnp.where(better, tile, m)
            src = jnp.where(better, i, src)
            return m, src

        init = (
            jnp.full((tq, _CHUNK_L), BIG, jnp.float32),
            jnp.zeros((tq, _CHUNK_L), jnp.int32),
        )
        U = int(unroll)
        if U == 1 and unroll is not False:   # True: full static unroll
            carry = init
            for i in range(S):
                carry = body(i, carry)
            return carry
        if U > 1:
            n_rolled = (S // U) * U

            def body_u(g, carry):
                base = g * U
                for t in range(U):
                    carry = body(base + t, carry)
                return carry

            carry = jax.lax.fori_loop(0, S // U, body_u, init)
            for i in range(n_rolled, S):     # static remainder tiles
                carry = body(i, carry)
            return carry
        return jax.lax.fori_loop(0, S, body, init)

    taken = []
    for j in range(kp):
        m, src = fold(taken)
        cd[:, sl(j)] = m
        ci[:, sl(j)] = src * _CHUNK_L + lane
        taken.append((m, src))
    m_last = taken[-1][0]              # kp-th local min per lane

    # Phase 2: merge — k peels over the [TQ, kp*128] candidate lists.
    # Ties are resolved by *global index* (min index among value-equal
    # entries), so results match a stable argsort exactly.
    for j in range(k):
        vals = cd[:]
        idxs = ci[:]
        m = jnp.min(vals, axis=1)                          # [TQ]
        sel = jnp.min(
            jnp.where(vals == m[:, None], idxs, _MAXI), axis=1
        )
        d2_ref[0, :, j] = m
        idx_ref[0, :, j] = sel
        cd[:] = jnp.where(idxs == sel[:, None], BIG, vals)

    if approx:
        # approximate contract: no exactness certificate, no fallback.
        return

    # Phase 3: exactness certificate, free of scratch traffic: the only
    # failure mode is a lane column whose kp extracted local minima did
    # not exhaust its members of the true top-k — then its kp-th local
    # min is <= the k-th selected value (<=, not <, keeps index-order
    # ties exact). Conservative: such a lane may hold no (kp+1)-th
    # competitor, but the check costs nothing and failures are rare
    # (P ~ Binom(k, 1/128) >= kp per lane).
    tau = d2_ref[0, :, k - 1]                              # [TQ]
    bad = jnp.sum((m_last <= tau[:, None]).astype(jnp.int32))

    @pl.when(bad > 0)
    def _fallback():
        # scratch still holds pristine distances; no recompute needed
        _peel_loop(scratch, d2_ref, idx_ref, k)


def _knn_kernel_plain(q_ref, c_ref, v_ref, d2_ref, idx_ref, scratch, *, k):
    scratch[:] = _compute_d2(q_ref, c_ref, v_ref)
    _peel_loop(scratch, d2_ref, idx_ref, k)


def _knn_pallas_impl(query, cand, cvalid_bias, k, approx=False):
    b, nq, d = query.shape
    nc = cand.shape[1]
    tile_q = _tile_q(nc)
    pad_q = (-nq) % tile_q
    qp = jnp.pad(query, ((0, 0), (0, pad_q), (0, 0))) if pad_q else query
    nq_p = nq + pad_q

    in_specs = [
        pl.BlockSpec((1, tile_q, d), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nc, d), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nc), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = (qp, cand, cvalid_bias[:, None, :])
    interpret = jax.default_backend() != "tpu"

    chunked = _use_chunked(nc, k, d)
    if chunked:
        kp = _chunk_kp_approx(k) if approx else _chunk_kp(k)
        vdtype = jnp.bfloat16 if approx else jnp.float32
        # TPUGAN_KNN_FOLD_UNROLL=<U>: partial unroll (U tiles per rolled
        # step) — much faster Mosaic compiles for new shapes at a small
        # runtime cost. Unset/0 = full unroll.
        env_u = int(os.environ.get("TPUGAN_KNN_FOLD_UNROLL", "0"))
        unroll = env_u if env_u > 1 else not interpret
        d2, idx = pl.pallas_call(
            functools.partial(_knn_chunked_kernel, k=k, kp=kp,
                              unroll=unroll, approx=approx),
            grid=(b, nq_p // tile_q),
            in_specs=in_specs,
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
            scratch_shapes=[
                pltpu.VMEM((tile_q, nc), vdtype),
                pltpu.VMEM((tile_q, kp * _CHUNK_L), jnp.float32),
                pltpu.VMEM((tile_q, kp * _CHUNK_L), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                # unrolled fold temporaries need headroom over the default
                # 16M scoped-vmem budget at large Nc
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*args)
        return d2[:, :nq], idx[:, :nq]

    d2, idx = pl.pallas_call(
        functools.partial(_knn_kernel_plain, k=k),
        grid=(b, nq_p // tile_q),
        in_specs=in_specs,
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
        interpret=interpret,
    )(*args)
    return d2[:, :nq], idx[:, :nq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def knn_pallas(
    query: jnp.ndarray,        # [B, Nq, D]
    cand: jnp.ndarray,         # [B, Nc, D]
    cvalid_bias: jnp.ndarray,  # [B, Nc] f32: 0 valid / BIG invalid
    k: int,
    approx: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """kNN, ascending: (d2 [B, Nq, k], idx [B, Nq, k] int32).

    ``approx=True`` runs the bf16 reduced-fold variant (see
    ``_chunk_kp_approx``): distances rank in bf16 and a small fraction of
    queries may miss a tail neighbor. Only valid for feature-space graph
    builds; shapes that dispatch to the plain peel stay exact.
    """
    return _knn_pallas_impl(query, cand, cvalid_bias, k, approx)


def _knn_fwd(query, cand, cvalid_bias, k, approx):
    d2, idx = _knn_pallas_impl(query, cand, cvalid_bias, k, approx)
    return (d2, idx), (query, cand, idx)


def _knn_bwd(k, approx, residuals, cotangents):
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
