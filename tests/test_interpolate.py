"""Tests for SPH-kernel scattered interpolation vs a direct numpy oracle
(formula from reference gcn_lib/interpolation.py:92-123)."""

import numpy as np
import jax.numpy as jnp

from tpugan_tpu.ops import bicubic_kernel, cubic_interpolation, linear_kernel


def _bicubic_np(r, cutoff):
    coeff = 8.0 / (np.pi * cutoff ** 3)
    q = r / cutoff
    ker = np.zeros_like(q)
    m1 = (q >= 0) & (q <= 0.5)
    ker[m1] = (6.0 * (q ** 3 - q ** 2) + 1.0)[m1]
    m2 = (q > 0.5) & (q <= 1.0)
    ker[m2] = (2.0 * (1.0 - q) ** 3)[m2]
    return ker * coeff


def test_bicubic_kernel_matches_reference_formula():
    r = np.linspace(0, 0.2, 101).astype(np.float32)
    cutoff = 0.1
    got = np.asarray(bicubic_kernel(jnp.asarray(r), cutoff))
    np.testing.assert_allclose(got, _bicubic_np(r, cutoff), rtol=1e-4, atol=1e-4)


def test_linear_kernel():
    r = np.array([0.0, 0.05, 0.1, 0.2], np.float32)
    got = np.asarray(linear_kernel(jnp.asarray(r), 0.1))
    np.testing.assert_allclose(got, [1.0, 0.5, 0.0, 0.0], atol=1e-6)


def test_cubic_interpolation_matches_direct_sum(rng):
    nq, nc, c = 40, 120, 3
    cutoff = 0.5
    q = rng.uniform(-1, 1, (nq, 3)).astype(np.float32)
    p = rng.uniform(-1, 1, (nc, 3)).astype(np.float32)
    f = rng.standard_normal((nc, c)).astype(np.float32)

    got = np.asarray(cubic_interpolation(jnp.asarray(q), jnp.asarray(f),
                                         jnp.asarray(p), cutoff))

    d = np.sqrt(np.sum((q[:, None] - p[None]) ** 2, -1))
    w = _bicubic_np(d, cutoff) * (d < cutoff)
    # cap at 32 nearest in-range neighbors like the op / reference K=32
    order = np.argsort(d, axis=1)
    keep = np.zeros_like(w, dtype=bool)
    for i in range(nq):
        keep[i, order[i, :32]] = True
    w = w * keep
    want = (w @ f) / (w.sum(1, keepdims=True) + 1e-6)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_cubic_interpolation_constant_field_reproduced(rng):
    """Partition of unity up to normalization: constant fields interpolate
    to the constant wherever a neighbor exists."""
    p = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
    f = np.ones((200, 2), np.float32) * 7.0
    q = p[:50] + rng.standard_normal((50, 3)).astype(np.float32) * 0.01
    got = np.asarray(cubic_interpolation(jnp.asarray(q), jnp.asarray(f),
                                         jnp.asarray(p), 0.4))
    np.testing.assert_allclose(got, 7.0, rtol=1e-3)


def test_cubic_interpolation_batched(rng):
    q = rng.uniform(-1, 1, (2, 16, 3)).astype(np.float32)
    p = rng.uniform(-1, 1, (2, 64, 3)).astype(np.float32)
    f = rng.standard_normal((2, 64, 3)).astype(np.float32)
    got = np.asarray(cubic_interpolation(jnp.asarray(q), jnp.asarray(f),
                                         jnp.asarray(p), 0.6))
    for b in range(2):
        want = np.asarray(cubic_interpolation(jnp.asarray(q[b]), jnp.asarray(f[b]),
                                              jnp.asarray(p[b]), 0.6))
        np.testing.assert_allclose(got[b], want, rtol=1e-5)


def test_dense_interpolation_matches_full_radius_oracle(rng):
    from tpugan_tpu.ops import cubic_interpolation_dense

    nq, nc, c = 40, 260, 3
    cutoff = 0.5
    q = rng.uniform(-1, 1, (nq, 3)).astype(np.float32)
    p = rng.uniform(-1, 1, (nc, 3)).astype(np.float32)
    f = rng.standard_normal((nc, c)).astype(np.float32)
    got = np.asarray(cubic_interpolation_dense(
        jnp.asarray(q), jnp.asarray(f), jnp.asarray(p), cutoff))
    d = np.sqrt(np.sum((q[:, None] - p[None]) ** 2, -1))
    w = _bicubic_np(d, cutoff) * (d <= cutoff)   # ALL in-radius neighbors
    want = (w @ f) / (w.sum(1, keepdims=True) + 1e-6)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_dense_interpolation_equals_capped_when_sparse(rng):
    """With <= 32 in-radius neighbors per query the dense form must equal
    the reference-capped variant exactly."""
    from tpugan_tpu.ops import cubic_interpolation, cubic_interpolation_dense

    nq, nc = 30, 150
    cutoff = 0.18  # sparse: few neighbors in radius
    q = rng.uniform(-1, 1, (nq, 3)).astype(np.float32)
    p = rng.uniform(-1, 1, (nc, 3)).astype(np.float32)
    f = rng.standard_normal((nc, 3)).astype(np.float32)
    d = np.sqrt(np.sum((q[:, None] - p[None]) ** 2, -1))
    assert (d <= cutoff).sum(1).max() <= 32, "test setup: must be sparse"
    dense = np.asarray(cubic_interpolation_dense(
        jnp.asarray(q), jnp.asarray(f), jnp.asarray(p), cutoff))
    capped = np.asarray(cubic_interpolation(
        jnp.asarray(q), jnp.asarray(f), jnp.asarray(p), cutoff))
    np.testing.assert_allclose(dense, capped, rtol=1e-3, atol=1e-5)


def test_dense_interpolation_respects_validity_mask(rng):
    from tpugan_tpu.ops import cubic_interpolation_dense

    q = rng.uniform(-1, 1, (20, 3)).astype(np.float32)
    p = rng.uniform(-1, 1, (60, 3)).astype(np.float32)
    f = rng.standard_normal((60, 2)).astype(np.float32)
    valid = np.ones(60, bool)
    valid[30:] = False
    got = np.asarray(cubic_interpolation_dense(
        jnp.asarray(q), jnp.asarray(f), jnp.asarray(p), 0.6,
        pos_valid=jnp.asarray(valid)))
    want = np.asarray(cubic_interpolation_dense(
        jnp.asarray(q), jnp.asarray(f[:30]), jnp.asarray(p[:30]), 0.6))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_binned_interp_matches_dense(rng):
    # Grid-binned pruned interpolation == dense all-in-radius kernel
    # (exact up to fp reorder); includes a validity mask and a non-TILE_Q
    # query count (exercises the pad-row AABB handling).
    from tpugan_tpu.ops.pallas.binned_interp_kernel import (
        binned_interp_pallas)
    from tpugan_tpu.ops.pallas.interp_kernel import kernel_interp_pallas

    b, nq, m, c = 2, 300, 1024, 3
    q = jnp.asarray(rng.uniform(-1, 1, (b, nq, 3)).astype(np.float32))
    p = jnp.asarray(rng.uniform(-1, 1, (b, m, 3)).astype(np.float32))
    f = jnp.asarray(rng.standard_normal((b, m, c)).astype(np.float32))
    bias = jnp.zeros((b, m), jnp.float32)
    bias = bias.at[:, m - 64:].set(1e10)       # masked tail candidates

    for cutoff in (0.15, 0.3):
        got, gden = binned_interp_pallas(q, p, f, cutoff, bias,
                                         blk=128, max_blocks=24)
        want, wden = kernel_interp_pallas(q, p, f, cutoff, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"cutoff={cutoff}")
        np.testing.assert_allclose(np.asarray(gden), np.asarray(wden),
                                   rtol=2e-4, atol=1e-5)


def test_binned_interp_overflow_falls_back_exact(rng):
    # A budget of 1 block cannot cover the in-radius set at this cutoff;
    # the lax.cond fallback must return the exact dense result anyway.
    from tpugan_tpu.ops.pallas.binned_interp_kernel import (
        _select_blocks, _sort_and_blocks, binned_interp_pallas)
    from tpugan_tpu.ops.pallas.interp_kernel import kernel_interp_pallas

    b, nq, m, c = 1, 256, 512, 2
    q = jnp.asarray(rng.uniform(-1, 1, (b, nq, 3)).astype(np.float32))
    p = jnp.asarray(rng.uniform(-1, 1, (b, m, 3)).astype(np.float32))
    f = jnp.asarray(rng.standard_normal((b, m, c)).astype(np.float32))
    bias = jnp.zeros((b, m), jnp.float32)

    qs, qorder, cb, vb, bb, bmin, bmax, tmin, tmax = _sort_and_blocks(
        q, p, f, bias, 128)
    _, _, overflow = _select_blocks(bmin, bmax, tmin, tmax, 1.0, 1)
    assert int(overflow) > 0
    got, _ = binned_interp_pallas(q, p, f, 1.0, bias, blk=128, max_blocks=1)
    want, _ = kernel_interp_pallas(q, p, f, 1.0, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_select_blocks_adaptive_dead_slots(rng):
    # Per-tile adaptive pruning contract: ``need`` counts exactly the
    # in-radius blocks, they occupy the first ``need`` slots, and every
    # dead slot repeats the tile's LAST live block id (so the Pallas
    # walk's index map is constant over dead steps and the DMA is elided).
    from tpugan_tpu.ops.pallas.binned_interp_kernel import (
        _aabb_sep2, _select_blocks, _sort_and_blocks)

    b, nq, m = 1, 512, 8192
    q = jnp.asarray(rng.uniform(-1, 1, (b, nq, 3)).astype(np.float32))
    p = jnp.asarray(rng.uniform(-1, 1, (b, m, 3)).astype(np.float32))
    f = jnp.asarray(rng.standard_normal((b, m, 2)).astype(np.float32))
    bias = jnp.zeros((b, m), jnp.float32)
    cutoff, budget = 0.1, 52   # need spans ~38..50 of 64 blocks here

    _, _, _, _, _, bmin, bmax, tmin, tmax = _sort_and_blocks(
        q, p, f, bias, 128)
    sel, need, overflow = _select_blocks(bmin, bmax, tmin, tmax, cutoff,
                                         budget)
    sep2 = np.asarray(_aabb_sep2(tmin, tmax, bmin, bmax))
    want_need = (sep2 <= cutoff * cutoff).sum(-1)
    if int(overflow) == 0:
        np.testing.assert_array_equal(np.asarray(need), want_need)
    sel_np, need_np = np.asarray(sel), np.asarray(need)
    assert (need_np < budget).any(), "budget never slack; test is vacuous"
    for ti in range(sel_np.shape[1]):
        nd = need_np[0, ti]
        live = sel_np[0, ti, :max(nd, 1)]
        # live slots are exactly the in-radius blocks
        if 0 < nd <= budget:
            assert set(live) == set(np.where(sep2[0, ti] <= cutoff ** 2)[0])
        # dead slots repeat the last live id
        assert (sel_np[0, ti, nd:] == sel_np[0, ti, max(nd - 1, 0)]).all()

    # end-to-end with slack budget (dead slots live) == dense kernel;
    # a double-count of the repeated block id would break this
    from tpugan_tpu.ops.pallas.binned_interp_kernel import (
        binned_interp_pallas)
    from tpugan_tpu.ops.pallas.interp_kernel import kernel_interp_pallas

    got, gden = binned_interp_pallas(q, p, f, cutoff, bias,
                                     blk=128, max_blocks=budget)
    want, wden = kernel_interp_pallas(q, p, f, cutoff, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gden), np.asarray(wden),
                               rtol=2e-4, atol=1e-5)


def test_chunked_dense_matches_single_pass(rng):
    # chunked_dense_interp (scale-safe form) == single dense kernel call
    from tpugan_tpu.ops.pallas.binned_interp_kernel import (
        _DENSE_CAND_LIMIT, chunked_dense_interp)
    from tpugan_tpu.ops.pallas import binned_interp_kernel as bik
    from tpugan_tpu.ops.pallas.interp_kernel import kernel_interp_pallas

    b, nq, m, c = 1, 200, 700, 2
    q = jnp.asarray(rng.uniform(-1, 1, (b, nq, 3)).astype(np.float32))
    p = jnp.asarray(rng.uniform(-1, 1, (b, m, 3)).astype(np.float32))
    f = jnp.asarray(rng.standard_normal((b, m, c)).astype(np.float32))
    bias = jnp.zeros((b, m), jnp.float32)

    # force chunking by shrinking the limit
    orig = bik._DENSE_CAND_LIMIT
    bik._DENSE_CAND_LIMIT = 256
    try:
        got, gden = bik.chunked_dense_interp(q, p, f, 0.4, bias)
    finally:
        bik._DENSE_CAND_LIMIT = orig
    want, wden = kernel_interp_pallas(q, p, f, 0.4, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gden), np.asarray(wden),
                               rtol=1e-4, atol=1e-5)
