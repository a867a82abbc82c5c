"""Grid-binned dense SPH interpolation: FRNN-equivalent candidate pruning.

The dense kernel (interp_kernel.py) scans ALL M candidates per query tile;
at fluid density the in-radius fraction is a few percent, so most of the
pairwise work is wasted. This is the TPU answer to the reference's FRNN
fixed-radius grid (reference gcn_lib/pointnet/gcn.py:30,
train_step_final.py:51-66 via gcn_lib/interpolation.py):

1. Sort candidates AND queries along a Morton (Z-order) curve — pure XLA,
   one argsort each. Contiguous runs of the sorted order are spatially
   compact, so fixed-size candidate BLOCKS have tight axis-aligned
   bounding boxes, computed with static reshapes (no scatter).
2. For every query tile, select the ``max_blocks`` nearest candidate
   blocks by AABB-to-AABB separation. Any block whose separation exceeds
   the cutoff contains NO in-radius candidate for any query in the tile,
   so selecting it is harmless and skipping it is exact.
3. A Pallas kernel walks (tile, selected-block) pairs with the block ids
   as scalar-prefetch — the DMA engine fetches exactly the needed blocks;
   nothing is gathered in HBM — and accumulates the kernel-weighted sums.
4. Results are unsorted back via the inverse query permutation.

Exactness: identical to the dense all-in-radius sum (up to fp reorder)
whenever every in-radius block is within the ``max_blocks`` budget. The
selection pass counts in-radius blocks; on overflow the caller's
``lax.cond`` falls back to the dense kernel, so the public op is ALWAYS
exact — the budget only gates the fast path.

Forward-only, like the dense kernel: the train step consumes advected
velocities under stop_gradient (train/step.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpugan_tpu.ops.pallas.interp_kernel import (
    TILE_Q,
    _VAL_PAD,
    _kernel_w,
    kernel_interp_pallas,
)

_BIG = 1e9

# [TILE_Q, M] distance + weight tiles must fit the dense kernel's VMEM
# budget; beyond this the dense form runs as candidate chunks.
_DENSE_CAND_LIMIT = 16384


def chunked_dense_interp(query, cand, values, cutoff, cvalid_bias,
                         kind="bicubic"):
    """Exact all-in-radius interpolation at ANY candidate count: the dense
    kernel applied to candidate chunks, numerators/denominators summed.
    Scale-safe twin of kernel_interp_pallas (whose [TILE_Q, M] tiles hit
    the VMEM wall past ~16k candidates)."""
    m = cand.shape[1]
    if m <= _DENSE_CAND_LIMIT:
        return kernel_interp_pallas(query, cand, values, cutoff,
                                    cvalid_bias, kind=kind)
    nch = -(-m // _DENSE_CAND_LIMIT)
    pad = nch * _DENSE_CAND_LIMIT - m
    if pad:
        cand = jnp.pad(cand, ((0, 0), (0, pad), (0, 0)),
                       constant_values=_BIG)
        values = jnp.pad(values, ((0, 0), (0, pad), (0, 0)))
        cvalid_bias = jnp.pad(cvalid_bias, ((0, 0), (0, pad)),
                              constant_values=1e10)
    num = None
    den = None
    for i in range(nch):
        sl = slice(i * _DENSE_CAND_LIMIT, (i + 1) * _DENSE_CAND_LIMIT)
        o, d = kernel_interp_pallas(query, cand[:, sl], values[:, sl],
                                    cutoff, cvalid_bias[:, sl], kind=kind)
        # o = num_chunk / d with d = weightsum_chunk + 1e-6: recover the
        # raw sums and accumulate
        nchunk = o * d[..., None]
        dchunk = d - 1e-6
        num = nchunk if num is None else num + nchunk
        den = dchunk if den is None else den + dchunk
    den = den + 1e-6
    return num / den[..., None], den


def _part1by2(x):
    x = x.astype(jnp.uint32)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def _morton(p, lo, hi):
    """Z-order key per point; p [b, n, 3], lo/hi [b, 1, 3]."""
    g = jnp.clip((p - lo) / jnp.maximum(hi - lo, 1e-12) * 1024.0,
                 0.0, 1023.0).astype(jnp.uint32)
    return (_part1by2(g[..., 0]) | (_part1by2(g[..., 1]) << 1)
            | (_part1by2(g[..., 2]) << 2))


def _aabb_sep2(amin, amax, bmin, bmax):
    """Squared separation between AABB sets [.., na, 3] and [.., nb, 3]."""
    gap = jnp.maximum(
        0.0,
        jnp.maximum(bmin[..., None, :, :] - amax[..., :, None, :],
                    amin[..., :, None, :] - bmax[..., None, :, :]),
    )
    return jnp.sum(gap * gap, axis=-1)


def _sort_and_blocks(query, cand, values, cvalid_bias, blk):
    """Morton-sort both sides; return sorted+padded arrays, block AABBs,
    tile AABBs, and the inverse query permutation."""
    b, nq, _ = query.shape
    m = cand.shape[1]
    both_lo = jnp.minimum(cand.min(axis=1), query.min(axis=1))[:, None]
    both_hi = jnp.maximum(cand.max(axis=1), query.max(axis=1))[:, None]

    # invalid candidates sort to the tail (their own far-away blocks)
    ckey = jnp.where(cvalid_bias > 0, jnp.uint32(0xFFFFFFFF),
                     _morton(cand, both_lo, both_hi))
    corder = jnp.argsort(ckey, axis=1)
    cs = jnp.take_along_axis(cand, corder[..., None], axis=1)
    vs = jnp.take_along_axis(values, corder[..., None], axis=1)
    bs = jnp.take_along_axis(cvalid_bias, corder, axis=1)

    pad_c = (-m) % blk
    if pad_c:
        cs = jnp.pad(cs, ((0, 0), (0, pad_c), (0, 0)),
                     constant_values=_BIG)
        vs = jnp.pad(vs, ((0, 0), (0, pad_c), (0, 0)))
        bs = jnp.pad(bs, ((0, 0), (0, pad_c)), constant_values=_BIG)
    nb = cs.shape[1] // blk
    cb = cs.reshape(b, nb, blk, 3)
    vb = vs.reshape(b, nb, blk, -1)
    bb = bs.reshape(b, nb, blk)
    # exclude invalid slots from the block AABBs so a tail block holding
    # real-but-masked candidates cannot shrink-wrap garbage positions
    live = (bb <= 0)[..., None]
    bmin = jnp.min(jnp.where(live, cb, _BIG), axis=2)
    bmax = jnp.max(jnp.where(live, cb, -_BIG), axis=2)

    qkey = _morton(query, both_lo, both_hi)
    qorder = jnp.argsort(qkey, axis=1)
    qs = jnp.take_along_axis(query, qorder[..., None], axis=1)
    pad_q = (-nq) % TILE_Q
    if pad_q:
        qs = jnp.pad(qs, ((0, 0), (0, pad_q), (0, 0)), constant_values=_BIG)
    nt = qs.shape[1] // TILE_Q
    qt = qs.reshape(b, nt, TILE_Q, 3)
    # pad rows must not blow up the last real tile's AABB
    qvalid = (jnp.arange(nt * TILE_Q) < nq).reshape(1, nt, TILE_Q, 1)
    tmin = jnp.min(jnp.where(qvalid, qt, _BIG), axis=2)
    tmax = jnp.max(jnp.where(qvalid, qt, -_BIG), axis=2)
    return qs, qorder, cb, vb, bb, bmin, bmax, tmin, tmax


def _select_blocks(bmin, bmax, tmin, tmax, cutoff, max_blocks):
    """Nearest ``max_blocks`` candidate blocks per query tile.

    Returns (sel [b, nt, B] int32, need [b, nt] int32, overflow scalar).
    ``need`` is the per-tile in-radius block count clamped to the budget:
    because top_k orders by ascending AABB separation, the first ``need``
    slots of ``sel`` are exactly the in-radius blocks, and every later
    slot is provably out of radius (weight exactly 0 for all its
    candidates). Those dead slots are rewritten to REPEAT the tile's last
    live block id, so the Pallas walk's index map returns an unchanged
    block on every skipped step and the grid pipeline elides the DMA —
    the static budget then costs ~nothing beyond each tile's true need
    (per-tile adaptive pruning; ROADMAP round-3 item)."""
    sep2 = _aabb_sep2(tmin, tmax, bmin, bmax)          # [b, nt, nb]
    max_blocks = min(max_blocks, sep2.shape[-1])
    in_radius = sep2 <= cutoff * cutoff
    need_full = jnp.sum(in_radius.astype(jnp.int32), axis=-1)
    overflow = jnp.sum((need_full > max_blocks).astype(jnp.int32))
    _, sel = jax.lax.top_k(-sep2, max_blocks)          # [b, nt, B]
    sel = sel.astype(jnp.int32)
    need = jnp.minimum(need_full, max_blocks)
    last_live = jnp.take_along_axis(
        sel, jnp.maximum(need - 1, 0)[..., None], axis=-1)
    slot = jnp.arange(max_blocks, dtype=jnp.int32)[None, None, :]
    sel = jnp.where(slot < need[..., None], sel, last_live)
    return sel, need, overflow


def _binned_kernel(sel_ref, need_ref, q_ref, c_ref, v_ref, bias_ref,
                   num_ref, den_ref, *, cutoff, kind):
    si = pl.program_id(2)

    @pl.when(si == 0)
    def _():
        num_ref[0] = jnp.zeros_like(num_ref[0])
        den_ref[0] = jnp.zeros_like(den_ref[0])

    # Compute only the tile's live (in-radius) blocks: dead slots carry a
    # repeated block id (DMA elided) and provably-zero weights, so skipping
    # them is exact and drops the per-tile cost from the static budget to
    # the tile's true need.
    @pl.when(si < need_ref[pl.program_id(0), pl.program_id(1)])
    def _():
        # Same cancellation-free VPU distance pass as the dense kernel
        # (interp_kernel._interp_kernel): three lane-broadcast difference
        # squares from a candidates-transposed [3, blk] layout beat a K=3
        # MXU matmul (3/128 lane utilization) and agree with it bitwise
        # only away from r ~ 0, so both kernels must use the same form.
        q = q_ref[0]                                   # [TQ, 3]
        c = c_ref[0, 0]                                # [3, blk]
        dx = q[:, 0:1] - c[0:1, :]                     # [TQ, blk]
        dy = q[:, 1:2] - c[1:2, :]
        dz = q[:, 2:3] - c[2:3, :]
        d2 = dx * dx + dy * dy + dz * dz + bias_ref[0, 0, 0][None]
        w = _kernel_w(d2, cutoff, kind)                # [TQ, blk]
        num = jax.lax.dot_general(
            w, v_ref[0, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        num_ref[0] += num
        den_ref[0] += jnp.sum(w, axis=1)[:, None]


def _compute_d2_rows(q, c, bias):
    # Difference-squares form, matching _binned_kernel / the dense kernel.
    d = q[:, None, :] - c[None, :, :]
    return jnp.sum(d * d, axis=-1) + bias[None]


def _binned_xla(qs, cb, vb, bb, sel, need, cutoff, kind):
    """Gather-based XLA twin of the Pallas walk (CPU path / oracle).

    Dead slots repeat a LIVE block id (for the Pallas DMA elision), so
    they must be masked out here or they would double-count."""
    b, nt, bsel = sel.shape
    tq = TILE_Q
    blk = cb.shape[2]
    flat = sel.reshape(b, nt * bsel)
    csel = jnp.take_along_axis(
        cb, flat[:, :, None, None], axis=1).reshape(b, nt, bsel * blk, 3)
    vsel = jnp.take_along_axis(
        vb, flat[:, :, None, None], axis=1).reshape(b, nt, bsel * blk, -1)
    bsel_b = jnp.take_along_axis(
        bb, flat[:, :, None], axis=1).reshape(b, nt, bsel * blk)
    slot_dead = jnp.arange(bsel, dtype=jnp.int32)[None, None] >= need[..., None]
    bsel_b = bsel_b + jnp.repeat(
        jnp.where(slot_dead, _BIG, 0.0), blk, axis=-1)

    def per_tile(q, c, v, bias):
        d2 = _compute_d2_rows(q, c, bias)
        w = _kernel_w(d2, cutoff, kind)
        num = jnp.einsum("qc,cf->qf", w, v,
                         precision=jax.lax.Precision.HIGHEST)
        return num, jnp.sum(w, axis=1)

    qt = qs.reshape(b, nt, tq, 3)
    num, den = jax.vmap(jax.vmap(per_tile))(qt, csel, vsel, bsel_b)
    return num.reshape(b, nt * tq, -1), den.reshape(b, nt * tq)


# Scalar-prefetch operands live in SMEM (~1 MB/core); keep each call's
# block-id table comfortably under that by walking tile chunks.
_SEL_SMEM_BYTES = 512 * 1024


def _binned_pallas(qs, cb, vb, bb, sel, need, cutoff, kind):
    """Tile-chunking wrapper: a [b, nt, bsel] int32 ``sel`` table beyond
    the SMEM budget (e.g. 624 tiles x 512 blocks at eval scale = 1.28 MB)
    is split into per-chunk pallas_calls along the tile axis; outputs
    concatenate exactly."""
    b, nt, bsel = sel.shape
    max_nt = max(1, _SEL_SMEM_BYTES // max(1, b * bsel * 4))
    if nt > max_nt:
        nums, dens = [], []
        for t0 in range(0, nt, max_nt):
            t1 = min(nt, t0 + max_nt)
            n, d = _binned_pallas_call(
                qs[:, t0 * TILE_Q:t1 * TILE_Q], cb, vb, bb,
                sel[:, t0:t1], need[:, t0:t1], cutoff, kind)
            nums.append(n)
            dens.append(d)
        return jnp.concatenate(nums, axis=1), jnp.concatenate(dens, axis=1)
    return _binned_pallas_call(qs, cb, vb, bb, sel, need, cutoff, kind)


def _binned_pallas_call(qs, cb, vb, bb, sel, need, cutoff, kind):
    b, nb, blk, _ = cb.shape
    nt = sel.shape[1]
    bsel = sel.shape[2]
    cp = vb.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nt, bsel),
        in_specs=[
            pl.BlockSpec((1, TILE_Q, 3),
                         lambda bi, ti, si, sel, need: (bi, ti, 0)),
            # candidates transposed to [b, nb, 3, blk] (lanes hold the block)
            pl.BlockSpec((1, 1, 3, blk),
                         lambda bi, ti, si, sel, need:
                         (bi, sel[bi, ti, si], 0, 0)),
            pl.BlockSpec((1, 1, blk, cp),
                         lambda bi, ti, si, sel, need:
                         (bi, sel[bi, ti, si], 0, 0)),
            # [b, nb, 1, blk]: Mosaic needs the last two block dims to be
            # (sublane-multiple, lane-multiple) or full — (1, blk) is full/128
            pl.BlockSpec((1, 1, 1, blk),
                         lambda bi, ti, si, sel, need:
                         (bi, sel[bi, ti, si], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_Q, cp),
                         lambda bi, ti, si, sel, need: (bi, ti, 0)),
            pl.BlockSpec((1, TILE_Q, 1),
                         lambda bi, ti, si, sel, need: (bi, ti, 0)),
        ],
    )
    num, den = pl.pallas_call(
        functools.partial(_binned_kernel, cutoff=float(cutoff), kind=kind),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, nt * TILE_Q, cp), jnp.float32),
            jax.ShapeDtypeStruct((b, nt * TILE_Q, 1), jnp.float32),
        ],
    )(sel, need, qs, jnp.swapaxes(cb, 2, 3), vb, bb[:, :, None, :])
    return num, den[..., 0]


def binned_interp_pallas(
    query: jnp.ndarray,        # [B, Nq, 3]
    cand: jnp.ndarray,         # [B, M, 3]
    values: jnp.ndarray,       # [B, M, C]
    cutoff: float,
    cvalid_bias: jnp.ndarray,  # [B, M] f32: 0 valid / BIG invalid
    kind: str = "bicubic",
    blk: int = 128,
    max_blocks: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact all-in-radius interpolation via block pruning.

    Same contract as ``kernel_interp_pallas``: returns (out [B, Nq, C],
    den [B, Nq]). Falls back to the dense kernel inside a ``lax.cond``
    whenever any tile's in-radius block set exceeds ``max_blocks``, so the
    result is always the exact dense sum (up to fp reorder).
    """
    b, nq, _ = query.shape
    c = values.shape[-1]
    cp = -(-c // _VAL_PAD) * _VAL_PAD
    vals = jnp.pad(values, ((0, 0), (0, 0), (0, cp - c))) if cp != c \
        else values

    qs, qorder, cb, vb, bb, bmin, bmax, tmin, tmax = _sort_and_blocks(
        query, cand, vals, cvalid_bias, blk)
    sel, need, overflow = _select_blocks(bmin, bmax, tmin, tmax, cutoff,
                                         max_blocks)

    def fast(_):
        if jax.default_backend() == "tpu":
            num, den = _binned_pallas(qs, cb, vb, bb, sel, need, cutoff, kind)
        else:
            num, den = _binned_xla(qs, cb, vb, bb, sel, need, cutoff, kind)
        den = den + 1e-6
        out_sorted = num / den[..., None]
        # inverse permutation: position of each original query in qorder
        inv = jnp.argsort(qorder, axis=1)
        out = jnp.take_along_axis(out_sorted[:, :nq].astype(jnp.float32),
                                  inv[..., None], axis=1)
        dn = jnp.take_along_axis(den[:, :nq], inv, axis=1)
        return out, dn

    def dense(_):
        out, den = chunked_dense_interp(query, cand, vals, cutoff,
                                        cvalid_bias, kind=kind)
        return out, den + 0.0

    out, den = jax.lax.cond(overflow > 0, dense, fast, None)
    return out[..., :c], den
