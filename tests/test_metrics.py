"""Golden tests for Chamfer / EMD / MMD / masking-target ops."""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from tpugan_tpu.ops import (
    auction_assignment,
    chamfer,
    emd_loss,
    gaussian_mmd,
    masking_target,
    nearest_neighbor,
)


def _chamfer_numpy(a, b):
    d2 = np.sum((a[:, None] - b[None]) ** 2, axis=-1)
    return d2.min(1).sum() + d2.min(0).sum()


def test_chamfer_matches_numpy(rng):
    a = rng.standard_normal((2, 40, 3)).astype(np.float32)
    b = rng.standard_normal((2, 55, 3)).astype(np.float32)
    got = np.asarray(chamfer(jnp.asarray(a), jnp.asarray(b)))
    want = np.array([_chamfer_numpy(a[i], b[i]) for i in range(2)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_chamfer_identical_clouds_zero(rng):
    a = rng.standard_normal((1, 30, 3)).astype(np.float32)
    got = np.asarray(chamfer(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(got, 0.0, atol=1e-5)


def test_chamfer_mask_equals_slicing(rng):
    """Masked chamfer on padded clouds == chamfer on the valid slices —
    the 999-sentinel invariance test (SURVEY.md §4b)."""
    a = rng.standard_normal((1, 40, 3)).astype(np.float32)
    b = rng.standard_normal((1, 50, 3)).astype(np.float32)
    a_pad = np.concatenate([a, np.full((1, 9, 3), 999.0, np.float32)], axis=1)
    b_pad = np.concatenate([b, np.full((1, 6, 3), 999.0, np.float32)], axis=1)
    a_valid = np.arange(49)[None] < 40
    b_valid = np.arange(56)[None] < 50
    got = np.asarray(
        chamfer(
            jnp.asarray(a_pad),
            jnp.asarray(b_pad),
            a_valid=jnp.asarray(a_valid),
            b_valid=jnp.asarray(b_valid),
        )
    )
    want = np.asarray(chamfer(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_nearest_neighbor(rng):
    a = rng.standard_normal((1, 20, 3)).astype(np.float32)
    b = rng.standard_normal((1, 30, 3)).astype(np.float32)
    d2, idx = nearest_neighbor(jnp.asarray(a), jnp.asarray(b))
    full = np.sum((a[0][:, None] - b[0][None]) ** 2, -1)
    np.testing.assert_array_equal(np.asarray(idx)[0], full.argmin(1))
    np.testing.assert_allclose(np.asarray(d2)[0], full.min(1), rtol=1e-4)


def test_auction_near_optimal_assignment(rng):
    """Auction EMD should land within a few percent of the Hungarian
    optimum (the reference's CUDA auction has the same eps/iters
    approximation trade-off, loss.py:29-78)."""
    n = 64
    x = rng.standard_normal((1, n, 3)).astype(np.float32)
    y = rng.standard_normal((1, n, 3)).astype(np.float32)
    assign = np.asarray(auction_assignment(jnp.asarray(x), jnp.asarray(y),
                                           eps=0.02, iters=2000))[0]
    # near-permutation (a handful of nearest-neighbor fallbacks allowed at
    # the iteration cap) and near-optimal total cost
    assert len(np.unique(assign)) >= n - 2
    cost = np.sqrt(np.sum((x[0] - y[0][assign]) ** 2, -1)).sum()
    d = np.sqrt(np.sum((x[0][:, None] - y[0][None]) ** 2, -1))
    ri, ci = linear_sum_assignment(d)
    opt = d[ri, ci].sum()
    assert cost <= opt * 1.25 + 1.0


def test_emd_loss_permutation_is_small(rng):
    x = rng.standard_normal((1, 32, 3)).astype(np.float32)
    perm = rng.permutation(32)
    got = np.asarray(emd_loss(jnp.asarray(x), jnp.asarray(x[:, perm]),
                              eps=0.002, iters=800))
    assert got[0] < 0.2


def test_masking_target_semantics(rng):
    """Dense gt regions -> target 1 for inputs near them; isolated inputs
    -> 0 (reference loss.py:253-275)."""
    pr = 0.1
    # cluster of 10 gt points within 1.4*pr of each other => dense
    cluster = (rng.standard_normal((10, 3)) * 0.02).astype(np.float32)
    lonely = np.array([[5.0, 5.0, 5.0]], np.float32)
    gt = np.concatenate([cluster, lonely])[None]
    inputs = np.array([
        [0.0, 0.0, 0.0],      # near dense cluster -> 1
        [5.0, 5.0, 5.05],     # near lonely point (not dense) -> 0
        [-9.0, 0.0, 0.0],     # near nothing -> 0
    ], np.float32)[None]
    tgt = np.asarray(masking_target(jnp.asarray(gt), jnp.asarray(inputs), pr))
    np.testing.assert_array_equal(tgt[0], [1.0, 0.0, 0.0])


def test_gaussian_mmd_zero_for_identical_and_positive_otherwise(rng):
    x = rng.standard_normal((1, 64, 3)).astype(np.float32)
    y = x + 1.0
    same = float(np.asarray(gaussian_mmd(jnp.asarray(x), jnp.asarray(x)))[0])
    diff = float(np.asarray(gaussian_mmd(jnp.asarray(x), jnp.asarray(y)))[0])
    assert abs(same) < 1e-5
    assert diff > 1e-3


def test_auction_near_optimal_at_scale(rng):
    """Mid-scale auction quality gate (VERDICT: extend beyond toy n=64;
    the full n=2048-vs-Hungarian and reference 8x79872-CD timing runs live
    in BENCH_NOTES.md — too slow for the CPU suite)."""
    n = 512
    x = rng.standard_normal((1, n, 3)).astype(np.float32)
    y = rng.standard_normal((1, n, 3)).astype(np.float32)
    assign = np.asarray(auction_assignment(jnp.asarray(x), jnp.asarray(y),
                                           eps=0.01, iters=1500))[0]
    assert len(np.unique(assign)) >= n - 5
    cost = np.sqrt(np.sum((x[0] - y[0][assign]) ** 2, -1)).sum()
    d = np.sqrt(np.sum((x[0][:, None] - y[0][None]) ** 2, -1))
    ri, ci = linear_sum_assignment(d)
    opt = d[ri, ci].sum()
    assert cost <= opt * 1.1


def test_auction_epsilon_scaling_converges(rng):
    """phases>1 epsilon-scaling must reach a FULL unique assignment where
    the single-phase auction at the same per-phase iteration cap leaves
    duplicates (VERDICT r3 missing #5 — eval paths now default phases=3)."""
    n = 512
    x = rng.standard_normal((1, n, 3)).astype(np.float32)
    y = rng.standard_normal((1, n, 3)).astype(np.float32)
    kw = dict(eps=0.002, iters=300)
    single = np.asarray(auction_assignment(jnp.asarray(x), jnp.asarray(y),
                                           phases=1, **kw))[0]
    scaled = np.asarray(auction_assignment(jnp.asarray(x), jnp.asarray(y),
                                           phases=3, **kw))[0]
    assert len(np.unique(scaled)) >= len(np.unique(single))
    assert len(np.unique(scaled)) == n, (
        f"epsilon-scaled auction left {n - len(np.unique(scaled))} dups")
    # and the assignment cost stays near-optimal
    cost = np.sqrt(np.sum((x[0] - y[0][scaled]) ** 2, -1)).sum()
    d = np.sqrt(np.sum((x[0][:, None] - y[0][None]) ** 2, -1))
    ri, ci = linear_sum_assignment(d)
    assert cost <= d[ri, ci].sum() * 1.1


def test_auction_repair_fills_multi_entry_tail(rng):
    """Regression (round 5): with per-phase iters starved so the final
    segmented phase leaves a LARGE unassigned tail, the Hungarian repair
    must still return a full permutation for every batch item. The
    original repair indexed ``ys[bi, None, free, :]`` — numpy moves the
    advanced-index dims to the front, producing a [k, 1] cost matrix that
    repaired exactly ONE bidder (observed as ~6 leftover duplicates per
    item at the 8 x 79,872 reference harness size)."""
    b, n = 2, 1024
    x = rng.standard_normal((b, n, 3)).astype(np.float32)
    y = rng.standard_normal((b, n, 3)).astype(np.float32)
    # iters=3 forces the eager segmented final phase AND a big tail
    a = np.asarray(auction_assignment(jnp.asarray(x), jnp.asarray(y),
                                      eps=0.01, iters=3, phases=3,
                                      final_iters=9))
    for i in range(b):
        assert (a[i] >= 0).all(), f"item {i}: {np.sum(a[i] < 0)} unassigned"
        assert len(np.unique(a[i])) == n, (
            f"item {i}: {n - len(np.unique(a[i]))} duplicate assignments")


def test_nn1_large_cloud_kernel_matches_oracle(rng):
    """Candidate-block streaming NN kernel (interpret mode here; the TPU
    path serves Chamfer beyond the fused kNN kernel's ~24k-candidate VMEM
    cap)."""
    from tpugan_tpu.ops.pallas.nn1_kernel import nn1_pallas

    q = rng.standard_normal((2, 200, 3)).astype(np.float32)
    c = rng.standard_normal((2, 5000, 3)).astype(np.float32)
    valid = np.ones((2, 5000), bool)
    valid[:, 4500:] = False
    bias = np.where(valid, 0.0, 1e10).astype(np.float32)
    d2, idx = nn1_pallas(jnp.asarray(q), jnp.asarray(c), jnp.asarray(bias))
    d = np.sum((q[:, :, None] - c[:, None]) ** 2, -1)
    d[:, :, 4500:] = np.inf
    np.testing.assert_array_equal(np.asarray(idx), d.argmin(-1))
    np.testing.assert_allclose(np.asarray(d2), d.min(-1), rtol=1e-4,
                               atol=1e-5)


def test_nn1_gradient_matches_reference(rng):
    import jax

    from tpugan_tpu.ops.pallas.nn1_kernel import nn1_pallas

    q = jnp.asarray(rng.standard_normal((1, 64, 3)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((1, 90, 3)).astype(np.float32))
    bias = jnp.zeros((1, 90), jnp.float32)

    gq, gc = jax.grad(
        lambda q, c: jnp.sum(nn1_pallas(q, c, bias)[0]), argnums=(0, 1)
    )(q, c)
    d2 = jnp.sum((q[:, :, None] - c[:, None]) ** 2, -1)
    gq_ref, gc_ref = jax.grad(
        lambda q, c: jnp.sum(jnp.min(
            jnp.sum((q[:, :, None] - c[:, None]) ** 2, -1), -1)),
        argnums=(0, 1),
    )(q, c)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gq_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gc_ref), atol=1e-4)
