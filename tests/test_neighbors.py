"""Golden tests for the neighborhood op library vs scipy/numpy oracles
(SURVEY.md §4: kNN vs cKDTree, ball query vs query_ball_point, FPS
determinism, masked-sentinel invariance)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial import cKDTree

from tpugan_tpu.ops import (
    ball_query,
    fps,
    gather,
    group,
    knn,
    pairwise_sqdist,
    query_and_group,
    radius_count,
    radius_mask_knn,
)


def _clouds(rng, b=2, nq=64, nc=96):
    q = rng.standard_normal((b, nq, 3)).astype(np.float32)
    c = rng.standard_normal((b, nc, 3)).astype(np.float32)
    return q, c


def test_pairwise_sqdist_matches_numpy(rng):
    q, c = _clouds(rng)
    got = np.asarray(pairwise_sqdist(jnp.asarray(q), jnp.asarray(c)))
    want = np.sum((q[:, :, None, :] - c[:, None, :, :]) ** 2, axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_knn_matches_kdtree(rng):
    q, c = _clouds(rng)
    k = 7
    d2, idx = knn(jnp.asarray(q), jnp.asarray(c), k)
    d2, idx = np.asarray(d2), np.asarray(idx)
    for b in range(q.shape[0]):
        tree = cKDTree(c[b])
        dist, want_idx = tree.query(q[b], k)
        np.testing.assert_allclose(np.sqrt(d2[b]), dist, atol=1e-3)
        np.testing.assert_array_equal(idx[b], want_idx)


def test_knn_self_includes_self(rng):
    q = rng.standard_normal((1, 32, 3)).astype(np.float32)
    d2, idx = knn(jnp.asarray(q), k=4)
    assert np.array_equal(np.asarray(idx)[0, :, 0], np.arange(32))
    np.testing.assert_allclose(np.asarray(d2)[0, :, 0], 0.0, atol=1e-5)


def test_knn_chunked_matches_unchunked(rng):
    q, c = _clouds(rng, nq=130, nc=50)
    d2a, ia = knn(jnp.asarray(q), jnp.asarray(c), 5, chunk=32)
    d2b, ib = knn(jnp.asarray(q), jnp.asarray(c), 5, chunk=4096)
    np.testing.assert_allclose(np.asarray(d2a), np.asarray(d2b), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))


def test_knn_respects_candidate_mask(rng):
    q, c = _clouds(rng, nq=16, nc=40)
    c_valid = np.ones((2, 40), bool)
    c_valid[:, 20:] = False
    _, idx = knn(jnp.asarray(q), jnp.asarray(c), 6, c_valid=jnp.asarray(c_valid))
    assert np.all(np.asarray(idx) < 20)
    # and equals kNN against the truncated candidate set
    _, idx_ref = knn(jnp.asarray(q), jnp.asarray(c[:, :20]), 6)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))


def test_radius_mask_knn_flags_match_kdtree(rng):
    q, c = _clouds(rng)
    r = 0.8
    d2, idx, in_range = radius_mask_knn(jnp.asarray(q), jnp.asarray(c), k=8, radius=r)
    d2, idx, in_range = map(np.asarray, (d2, idx, in_range))
    for b in range(q.shape[0]):
        tree = cKDTree(c[b])
        for i in range(q.shape[1]):
            ball = set(tree.query_ball_point(q[b, i], r))
            flagged = set(idx[b, i][in_range[b, i]].tolist())
            # flagged = the min(8, |ball|) nearest members of the ball
            assert flagged <= ball
            assert len(flagged) == min(8, len(ball))


def test_ball_query_index_order_semantics(rng):
    """pointnet2 semantics: first nsample in-radius candidates in index
    order, padded by repeating the first found."""
    q, c = _clouds(rng, b=1, nq=32, nc=64)
    r, ns = 0.9, 6
    idx = np.asarray(ball_query(jnp.asarray(q), jnp.asarray(c), r, ns))
    d2 = np.sum((q[:, :, None] - c[:, None]) ** 2, axis=-1)
    for i in range(32):
        hits = np.nonzero(d2[0, i] < r * r)[0]
        want = hits[:ns]
        if len(want) == 0:
            np.testing.assert_array_equal(idx[0, i], 0)
        else:
            pad = np.full(ns - len(want), want[0])
            np.testing.assert_array_equal(idx[0, i], np.concatenate([want, pad]))


def test_fps_matches_greedy_numpy(rng):
    pos = rng.standard_normal((2, 50, 3)).astype(np.float32)
    m = 10
    got = np.asarray(fps(jnp.asarray(pos), m))
    for b in range(2):
        sel = [0]
        mind = np.sum((pos[b] - pos[b, 0]) ** 2, axis=-1)
        for _ in range(m - 1):
            nxt = int(np.argmax(mind))
            sel.append(nxt)
            mind = np.minimum(mind, np.sum((pos[b] - pos[b, nxt]) ** 2, -1))
        np.testing.assert_array_equal(got[b], sel)


def test_fps_never_selects_invalid(rng):
    pos = rng.standard_normal((1, 40, 3)).astype(np.float32)
    pos[0, 25:] = 999.0  # dummy sentinel far away => FPS would love them
    valid = np.ones((1, 40), bool)
    valid[0, 25:] = False
    idx = np.asarray(fps(jnp.asarray(pos), 20, valid=jnp.asarray(valid)))
    assert np.all(idx < 25)
    assert len(np.unique(idx[0])) == 20  # all distinct valid picks


def test_gather_and_group(rng):
    pts = rng.standard_normal((2, 20, 4)).astype(np.float32)
    idx = rng.integers(0, 20, size=(2, 5)).astype(np.int32)
    got = np.asarray(gather(jnp.asarray(pts), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], pts[b, idx[b]])
    gidx = rng.integers(0, 20, size=(2, 5, 3)).astype(np.int32)
    got = np.asarray(group(jnp.asarray(pts), jnp.asarray(gidx)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], pts[b][gidx[b]])


def test_query_and_group_shapes_and_centering(rng):
    xyz = rng.standard_normal((2, 64, 3)).astype(np.float32)
    new_xyz = xyz[:, :8]
    feat = rng.standard_normal((2, 64, 5)).astype(np.float32)
    out = query_and_group(
        jnp.asarray(xyz), jnp.asarray(new_xyz), jnp.asarray(feat), 0.7, 16
    )
    assert out.shape == (2, 8, 16, 8)
    # each center is its own neighbor => some grouped_xyz row is ~0
    rel = np.asarray(out)[..., :3]
    assert np.min(np.sum(np.abs(rel), axis=-1), axis=-1).max() < 1e-5


def test_radius_count_matches_kdtree(rng):
    q, c = _clouds(rng, b=1)
    r = 0.75
    got = np.asarray(radius_count(jnp.asarray(q), jnp.asarray(c), r))
    tree = cKDTree(c[0])
    want = tree.query_ball_point(q[0], r, return_length=True)
    # scipy counts <= r; ours counts < r. Perturb radius check loosely:
    np.testing.assert_array_equal(got[0], want)


def test_ops_jit_and_grad_safe(rng):
    """Ops must be jittable; knn/chamfer-style gathers must not produce NaNs
    under grad."""
    q = jnp.asarray(rng.standard_normal((1, 32, 3)).astype(np.float32))

    @jax.jit
    def f(q):
        d2, idx = knn(q, k=4)
        return jnp.sum(d2)

    g = jax.grad(f)(q)
    assert np.all(np.isfinite(np.asarray(g)))
