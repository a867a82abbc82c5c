"""Distance metrics on padded point batches: Chamfer, auction EMD, MMD.

TPU-native replacements for chamferdist (reference loss.py:3,121-128), the
MSN auction-EMD CUDA kernel (reference loss.py:29-78), and geomloss's
Gaussian MMD (reference train_fluid/analysis_helper.py:8,226).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpugan_tpu.ops.neighbors import pairwise_sqdist, _chunked_query, BIG, _CHUNK


def nearest_neighbor(
    query: jnp.ndarray,
    cand: jnp.ndarray,
    c_valid: Optional[jnp.ndarray] = None,
    chunk: int = _CHUNK,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single nearest neighbor of each query point.

    Returns (sqdist [B, Nq], idx [B, Nq] int32).
    """
    from tpugan_tpu.ops.neighbors import _PALLAS_MAX_NC, _on_tpu

    if (
        _on_tpu()
        and query.ndim == 3
        and cand.shape[-2] <= _PALLAS_MAX_NC
        and query.dtype == jnp.float32
    ):
        # k=1 case of the fused Pallas kNN kernel (differentiable d2)
        from tpugan_tpu.ops.pallas.knn_kernel import knn_pallas

        if c_valid is None:
            bias = jnp.zeros(cand.shape[:-1], jnp.float32)
        else:
            bias = jnp.where(c_valid, 0.0, BIG)
        d2, idx = knn_pallas(query, cand, bias, 1)
        return d2[..., 0], idx[..., 0]

    from tpugan_tpu.ops.pallas.nn1_kernel import MAX_M, nn1_pallas

    if (
        _on_tpu()
        and query.ndim == 3
        and cand.shape[-2] <= MAX_M
        and query.dtype == jnp.float32
        and cand.shape[-1] == 3
    ):
        # eval-scale clouds: candidate-block streaming kernel (the
        # reference timing harness runs Chamfer at 8 x 79,872 points)
        if c_valid is None:
            bias = jnp.zeros(cand.shape[:-1], jnp.float32)
        else:
            bias = jnp.where(c_valid, 0.0, BIG)
        return nn1_pallas(query, cand, bias)

    def one_chunk(q):
        d2 = pairwise_sqdist(q, cand)
        if c_valid is not None:
            d2 = jnp.where(c_valid[..., None, :], d2, BIG)
        return jnp.min(d2, axis=-1), jnp.argmin(d2, axis=-1).astype(jnp.int32)

    return _chunked_query(one_chunk, query, chunk)


def chamfer(
    a: jnp.ndarray,
    b: jnp.ndarray,
    a_valid: Optional[jnp.ndarray] = None,
    b_valid: Optional[jnp.ndarray] = None,
    bidirectional: bool = True,
    chunk: int = _CHUNK,
) -> jnp.ndarray:
    """Masked (bidirectional) Chamfer distance.

    Matches chamferdist's convention used throughout the reference
    (loss.py:121-128,176-182): per-cloud *sum* of squared nearest-neighbor
    distances, forward (a->b) plus backward (b->a). The training logs call
    this "Chamfer_distance_no_norm" (reference train_step_final.py:225);
    divide by point count for the eval-normalized variant (reference
    train_fluid/analysis_helper.py:240).

    Invalid points contribute nothing as queries and are never selected as
    neighbors.

    Returns per-batch distance [B].
    """
    d2_ab, _ = nearest_neighbor(a, b, c_valid=b_valid, chunk=chunk)
    if a_valid is not None:
        d2_ab = jnp.where(a_valid, d2_ab, 0.0)
    out = jnp.sum(d2_ab, axis=-1)
    if bidirectional:
        d2_ba, _ = nearest_neighbor(b, a, c_valid=a_valid, chunk=chunk)
        if b_valid is not None:
            d2_ba = jnp.where(b_valid, d2_ba, 0.0)
        out = out + jnp.sum(d2_ba, axis=-1)
    return out


# Per-phase eps decay for the auction's epsilon-scaling schedule. Bertsekas
# recommends 4-10; measured on random clouds: 6x steps keep every phase's
# reassignment short, while one 136x jump strands bidders past any round cap.
_THETA = 6.0


def _auction_phase(x, y, price, eps, iters, obj_chunk=2048, assign0=None):
    """One eps-phase of the Jacobi auction, scatter- and sort-free.

    TPU design notes: a previous formulation used ``lax.top_k(value, 2)``
    (lowered as a full row sort on TPU) and ``.at[].max/.min`` scatters
    (serialized element loops) — 37 s for 100 rounds at 8 x 8192. Here the
    per-bidder top-2 is two fused max/argmax passes over regenerated cost
    rows (MXU matmul, never materializing [B, N, N] in HBM), and the
    per-object winner resolution is a chunked compare-reduce; bidder-side
    state updates are gathers only. The price vector is carried across
    phases for eps-scaling warm starts.

    Returns (price, assign) with assign[i] = object of bidder i or -1.
    """
    b, n, _ = x.shape
    eps = jnp.asarray(eps, jnp.float32)  # may be a traced scalar (eps-scaling)
    iota_i = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    iota_j_full = jnp.arange(n, dtype=jnp.int32)
    NEG = jnp.float32(-1e30)

    # bound transient [B, CH, N] value blocks to ~1 GB so eval-scale solves
    # (8 x 79,872: a full row set would be 5.2 GB) never exhaust HBM
    budget = (1 << 30) // (b * n * 4)
    bid_chunk = max(256, min(_CHUNK, (budget // 128) * 128))
    obj_chunk = max(256, min(obj_chunk, (budget // 128) * 128))

    def bid_pass(price, unassigned):
        # per-bidder best/second-best value over all objects
        def one_chunk(xc):
            v = -pairwise_sqdist(xc, y) - price[:, None, :]     # [B, CH, N]
            v1 = jnp.max(v, axis=-1)
            a1 = jnp.argmax(v, axis=-1).astype(jnp.int32)
            iota = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
            v2 = jnp.max(jnp.where(iota == a1[..., None], NEG, v), axis=-1)
            return a1, v1 - v2
        best_j, gamma = _chunked_query(one_chunk, x, bid_chunk)
        bid = jnp.where(unassigned, gamma + eps, NEG)           # [B, N]
        return best_j, bid

    def winner_pass(best_j, bid):
        # per-object max bid + lowest-index winning bidder, object-chunked
        nchunks = -(-n // obj_chunk)
        pad = nchunks * obj_chunk - n
        jc = jnp.pad(iota_j_full, (0, pad), constant_values=n).reshape(
            nchunks, obj_chunk
        )

        def one_chunk(j_ids):
            m = best_j[:, :, None] == j_ids[None, None, :]      # [B, N, CHj]
            bids = jnp.where(m, bid[:, :, None], NEG)
            bmax = jnp.max(bids, axis=1)                        # [B, CHj]
            win = jnp.min(
                jnp.where(bids >= bmax[:, None, :], iota_i[:, :, None], n),
                axis=1,
            ).astype(jnp.int32)
            return bmax, win

        bmax, win = jax.lax.map(one_chunk, jc)                  # [nc, B, CHj]
        fix = lambda a: jnp.moveaxis(a, 0, 1).reshape(
            b, nchunks * obj_chunk)[:, :n]
        return fix(bmax), fix(win)

    def cond(state):
        it, price, owner, assign = state
        return jnp.logical_and(it < iters, jnp.any(assign < 0))

    def body(state):
        it, price, owner, assign = state
        unassigned = assign < 0
        best_j, bid = bid_pass(price, unassigned)
        bid_max, winner = winner_pass(best_j, bid)
        got = bid_max > NEG                                     # objects w/ bids

        price = price + jnp.where(got, bid_max, 0.0)

        # bidder i won iff it bid on best_j[i] and was resolved the winner
        won = unassigned & (
            jnp.take_along_axis(winner, best_j, axis=1) == iota_i
        )
        # a currently-assigned bidder is evicted iff its object was
        # re-auctioned (winners were unassigned bidders, a disjoint set)
        obj = jnp.where(assign >= 0, assign, 0)
        lost = (assign >= 0) & jnp.take_along_axis(got, obj, axis=1)
        assign = jnp.where(won, best_j, jnp.where(lost, -1, assign))
        owner = jnp.where(got, winner, owner)
        return it + 1, price, owner, assign

    owner0 = jnp.full((b, n), -1, dtype=jnp.int32)
    if assign0 is None:
        # phase start: re-auction everything under the new eps
        assign0 = jnp.full((b, n), -1, dtype=jnp.int32)
    _, price, _, assign = jax.lax.while_loop(
        cond, body, (jnp.int32(0), price, owner0, assign0)
    )
    return price, assign


def auction_assignment(
    x: jnp.ndarray,
    y: jnp.ndarray,
    eps: float = 0.05,
    iters: int = 100,
    phases: int = 1,
    theta: Optional[float] = None,
    final_iters: Optional[int] = None,
) -> jnp.ndarray:
    """Approximate min-cost bijective assignment x[i] -> y[assignment[i]] via
    the Bertsekas auction algorithm, vectorized as a Jacobi auction in a
    ``lax.while_loop``.

    TPU-native equivalent of the MSN CUDA EMD kernel (reference
    loss.py:29-78; constraints there: n % 1024 == 0, batch <= 512, eval
    only). Here any n works; ``iters`` caps the bidding rounds per phase, so
    with few iterations the result is approximate exactly like the
    reference's (eps, iters) trade-off.

    ``phases > 1`` enables epsilon scaling — the standard cure for the
    auction's slow tail at small eps. The schedule is anchored at the
    *data's cost scale*: the first phase runs at ~ the squared bounding-box
    diagonal of the joint cloud (no value difference can exceed it, so it
    completes in a handful of rounds), later phases decay by ~``_THETA``
    per step down to the target ``eps``, and the phase count grows beyond
    ``phases`` when the eps0/eps ratio needs it (a jump much larger than
    ~6x leaves prices too stale to warm-start the next phase — measured:
    3 phases over a 1.8e4 ratio strand bidders; ~6x steps converge). Each
    phase restarts assignments but keeps the learned prices. The final
    (target-eps) phase gets a larger round cap (``final_iters``, default
    10x ``iters``); the ``while_loop`` early-exits as soon as every bidder
    holds an object, so a generous cap costs nothing once converged.
    Under jit tracing the data scale is unknown at trace time, so the
    schedule falls back to a fixed ladder eps * theta^p (theta defaults to
    ``_THETA``) with exactly ``phases`` phases.

    phases=1 with the target eps reproduces the single-phase contract.

    Args:
      x: [B, N, 3] sources.  y: [B, N, 3] targets.
    Returns:
      assignment [B, N] int32 (may contain duplicates if not converged;
      unassigned bidders fall back to their nearest target).
    """
    b, n, _ = x.shape
    if n >= 32768 and b > 1:
        # eval-scale solves are per-item independent; full batches at
        # 8 x 79,872 fault the device under memory pressure — slice.
        return jnp.concatenate([
            auction_assignment(x[i:i + 1], y[i:i + 1], eps, iters,
                               phases, theta, final_iters)
            for i in range(b)
        ], axis=0)
    price = jnp.zeros((b, n), dtype=jnp.float32)
    assign = None
    if final_iters is None:
        final_iters = 10 * iters if phases > 1 else iters
    if phases <= 1:
        eps_schedule = [jnp.float32(eps)]
    elif theta is not None:
        eps_schedule = [jnp.float32(eps * theta ** p)
                        for p in range(phases - 1, -1, -1)]
    else:
        import numpy as _np

        lo = jnp.minimum(jnp.min(x, axis=(0, 1)), jnp.min(y, axis=(0, 1)))
        hi = jnp.maximum(jnp.max(x, axis=(0, 1)), jnp.max(y, axis=(0, 1)))
        eps0 = jnp.maximum(jnp.sum((hi - lo) ** 2) / 4.0, eps)
        try:
            eps0f = float(eps0)  # concrete outside jit (the eval paths)
            nph = max(phases, 1 + int(_np.ceil(
                _np.log(max(eps0f / eps, 1.0)) / _np.log(_THETA))))
            ratio = eps0f / eps
        except (jax.errors.ConcretizationTypeError,
                jax.errors.TracerArrayConversionError):  # traced under jit
            nph, ratio = phases, eps0 / eps  # traced: fixed count
        eps_schedule = [eps * ratio ** (p / max(nph - 1, 1))
                        for p in range(nph - 1, -1, -1)]
    for i, eps_p in enumerate(eps_schedule):
        if i < len(eps_schedule) - 1:
            price, assign = _auction_phase(x, y, price, eps_p, iters)
            continue
        # Final (target-eps) phase: segment the round budget across
        # dispatches. One while_loop program covering ``final_iters``
        # rounds at eval scale (n ~ 8e4, each round an MXU regeneration of
        # all n^2 cost rows) runs for minutes on-device and crashes the
        # tunneled TPU worker (observed at 8 x 79,872, phases=4 — round 5).
        # Prices and the partial bijection carry across segments via
        # ``assign0``, so this is the identical computation split at
        # host-visible boundaries with an early exit between segments.
        # Under jit (traced values, no host sync possible) fall back to
        # the single-dispatch form.
        if isinstance(x, jax.core.Tracer):  # jitted caller: one dispatch
            price, assign = _auction_phase(x, y, price, eps_p, final_iters)
            continue
        remaining = int(final_iters)
        assign = None  # first segment re-auctions under the final eps
        while remaining > 0:
            seg = min(int(iters), remaining)
            price, assign = _auction_phase(
                x, y, price, eps_p, seg, assign0=assign)
            remaining -= seg
            if not bool(jnp.any(assign < 0)):
                break
    if phases > 1:
        repaired = _repair_assignment_tail(x, y, assign)
        if repaired is not None:
            return repaired
    # Fall back to nearest target for any bidder left unassigned at the cap
    # (single-phase approximate contract, or phases>1 under jit tracing).
    _, nn_idx = nearest_neighbor(x, y)
    return jnp.where(assign < 0, nn_idx, assign)


def _repair_assignment_tail(x, y, assign):
    """Exact Hungarian repair of the auction's unassigned tail.

    The Jacobi auction assigns the bulk quickly, but its last few contested
    bidders walk prices in ~eps increments — a near-sequential tail that no
    realistic round cap covers at eval scale. Since the auction maintains a
    partial bijection (winners are unique per object), the leftover is a
    tiny k x k assignment problem between unassigned bidders and unclaimed
    objects: solve it exactly host-side (scipy Hungarian, k is typically
    < 1e3) so the returned assignment is always a full permutation — the
    convergence contract of the reference CUDA kernel (loss.py:29-78).

    Returns None under jit tracing (no concrete values host-side).
    """
    import numpy as np
    from scipy.optimize import linear_sum_assignment

    try:
        a = np.array(assign)
        xs, ys = np.asarray(x), np.asarray(y)
    except (jax.errors.ConcretizationTypeError,
            jax.errors.TracerArrayConversionError):  # traced under jit
        return None
    b, n = a.shape
    for bi in range(b):
        ab = a[bi]
        # Defensive: the auction maintains a partial bijection, but if a
        # caller hands in duplicated claims, demote every claimant after
        # the first to unassigned so the Hungarian tail sees a clean
        # miss/free split and the full-permutation contract still holds.
        pos = np.where(ab >= 0)[0]
        _, first = np.unique(ab[pos], return_index=True)
        if first.size != pos.size:
            dup = np.ones(pos.size, dtype=bool)
            dup[first] = False
            ab[pos[dup]] = -1
        miss = np.where(ab < 0)[0]
        if miss.size == 0:
            continue
        free = np.setdiff1d(np.arange(n), ab[ab >= 0],
                            assume_unique=False)
        # NOTE indexing: ``ys[bi, None, free, :]`` is WRONG here — numpy
        # moves the broadcast advanced-index dims to the front when they
        # are separated by None, yielding [k, 1, 3] and a [k, 1] cost
        # matrix that repairs exactly one bidder (observed at 8 x 79,872:
        # ~6 leftovers per item — round 5). Index in two steps instead.
        d = xs[bi, miss][:, None, :] - ys[bi, free][None, :, :]
        cost = np.einsum("ijk,ijk->ij", d, d)
        r, c = linear_sum_assignment(cost)
        ab[miss[r]] = free[c]
    return jnp.asarray(a, dtype=jnp.int32)


def emd_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    eps: float = 0.05,
    iters: int = 100,
    phases: int = 1,
) -> jnp.ndarray:
    """Earth-mover distance with auction assignment, reference semantics
    (loss.py:294-316): assignment is computed without gradient; the loss is
    the sum of euclidean distances under the fixed assignment, so gradients
    flow through point coordinates only. ``phases > 1`` enables the
    epsilon-scaling schedule (see :func:`auction_assignment`) for eval-grade
    convergence.

    pred/target: [B, N, 3]. Returns per-batch EMD [B].
    """
    assign = jax.lax.stop_gradient(
        auction_assignment(pred, target, eps, iters, phases=phases))
    matched = jnp.take_along_axis(target, assign[..., None], axis=1)
    d = jnp.sqrt(jnp.maximum(jnp.sum((pred - matched) ** 2, axis=-1), 1e-20))
    return jnp.sum(d, axis=-1)


def masking_target(
    pos_gt: jnp.ndarray,
    pos_input: jnp.ndarray,
    particle_radius: float,
    gt_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Supervision target for the binary masking head.

    Reference semantics (loss.py:253-275): a ground-truth point is "dense" if
    it has > 3 neighbors within 1.4 * particle_radius (K-capped at 16, which
    cannot affect the > 3 test); each input point inherits the density bit of
    its nearest ground-truth point within 1.9 * particle_radius, or 0 when no
    ground-truth point is that close.

    Returns target [B, N_input] float32 in {0, 1}.
    """
    from tpugan_tpu.ops.neighbors import radius_count

    cnt = radius_count(
        pos_gt, pos_gt, 1.4 * particle_radius, cap=16, c_valid=gt_valid
    )
    dense = (cnt > 3).astype(jnp.float32)                      # [B, Ngt]
    d2, idx = nearest_neighbor(pos_input, pos_gt, c_valid=gt_valid)
    in_range = d2 < (1.9 * particle_radius) ** 2
    tgt = jnp.take_along_axis(dense, idx, axis=1)
    return jnp.where(in_range, tgt, 0.0)


def gaussian_mmd(
    x: jnp.ndarray,
    y: jnp.ndarray,
    blur: float = 0.05,
) -> jnp.ndarray:
    """Gaussian-kernel maximum mean discrepancy between two point sets.

    Direct O(N^2)-matmul replacement for geomloss ``SamplesLoss('gaussian')``
    (reference train_fluid/analysis_helper.py:8,226): MMD^2 = E k(x,x') +
    E k(y,y') - 2 E k(x,y) with k = exp(-|d|^2 / (2 blur^2)).

    x: [B, N, 3], y: [B, M, 3] -> [B].
    """
    g = 1.0 / (2.0 * blur * blur)

    def mean_k(a, bb):
        return jnp.mean(jnp.exp(-g * pairwise_sqdist(a, bb)), axis=(-1, -2))

    return 0.5 * (mean_k(x, x) + mean_k(y, y)) - mean_k(x, y)
