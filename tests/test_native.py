"""Tests for the C++ data-loader library vs numpy/scipy oracles."""

import numpy as np
import pytest
from scipy.spatial import cKDTree

from tpugan_tpu.data import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def test_native_fps_matches_numpy_greedy(rng):
    pts = rng.standard_normal((500, 3)).astype(np.float32)
    idx = native.fps(pts, 50, start=0)
    sel = [0]
    mind = np.sum((pts - pts[0]) ** 2, -1)
    for _ in range(49):
        nxt = int(np.argmax(mind))
        sel.append(nxt)
        mind = np.minimum(mind, np.sum((pts - pts[nxt]) ** 2, -1))
    np.testing.assert_array_equal(idx, sel)


def test_native_knn_patch_matches_kdtree(rng):
    pts = rng.standard_normal((1000, 3)).astype(np.float32)
    idx = native.knn_patch(pts, seed=17, k=64)
    tree = cKDTree(pts)
    _, want = tree.query(pts[17], 64)
    np.testing.assert_array_equal(np.sort(idx), np.sort(want))
    # ascending by distance
    d = np.sum((pts[idx] - pts[17]) ** 2, -1)
    assert np.all(np.diff(d) >= -1e-7)


def test_native_radius_count_matches_kdtree(rng):
    pts = rng.standard_normal((800, 3)).astype(np.float32)
    counts = native.radius_count(pts, 0.4)
    tree = cKDTree(pts)
    want = tree.query_ball_point(pts, 0.4, return_length=True)
    np.testing.assert_array_equal(counts, want)


def test_native_voxel_downsample_centroids(rng):
    pts = rng.uniform(0, 1, (2000, 3)).astype(np.float32)
    ds = native.voxel_downsample(pts, 0.2)
    assert 0 < ds.shape[0] <= 2000
    # every centroid must lie inside the cloud's bounding box
    assert np.all(ds >= pts.min(0) - 1e-5) and np.all(ds <= pts.max(0) + 1e-5)
    # roughly one representative per occupied voxel
    keys = np.unique(np.floor((pts - pts.min(0)) / 0.2).astype(int), axis=0)
    assert ds.shape[0] == keys.shape[0]


def test_pipeline_uses_native_fps(rng):
    """data.sampling.farthest_point_sampling routes through native and
    matches the pure-numpy greedy result."""
    from tpugan_tpu.data.sampling import farthest_point_sampling

    pts = rng.standard_normal((300, 3)).astype(np.float32)
    idx, _ = farthest_point_sampling(pts, 30, initial_idx=0)
    want = native.fps(pts, 30, start=0)
    np.testing.assert_array_equal(idx, want)
