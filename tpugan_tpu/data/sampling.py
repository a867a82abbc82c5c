"""Host-side numpy sampling utilities for the input pipeline.

Equivalents of the reference's CPU data-prep stack: numba FPS
(sampling.py:50-106), KDTree patch extraction + FPS downsampling
(train_utils.py:98-139), voxel downsampling (train_utils.py:13-30), point
cloud normalization (train_utils.py:214-221) and free-surface detection
(train_utils.py:281-286). These run in the input pipeline on the host, so
plain vectorized numpy (+ scipy KDTree) replaces numba/Open3D.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
from scipy.spatial import cKDTree

BASE_RADIUS = 0.025  # reference train_utils.py:10


def farthest_point_sampling(
    pts: np.ndarray,
    k: int,
    initial_idx: Optional[int] = None,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy farthest point sampling (reference sampling.py:50-106).

    Returns (indices [k], min_distances [N]) — the reference's full [k, N]
    distance matrix is never needed by callers, only the running minimum.
    """
    assert pts.ndim == 2
    n = pts.shape[0]
    indices = np.zeros((k,), dtype=np.int64)
    if initial_idx is None:
        rng = rng or np.random.default_rng()
        indices[0] = rng.integers(n)
    else:
        indices[0] = initial_idx

    from tpugan_tpu.data import native

    if native.available():
        idx = native.fps(pts.astype(np.float32), k, start=int(indices[0]))
        # native path skips returning running distances; recompute cheaply
        # only if a caller ever needs them (none do in the pipeline)
        return idx, np.empty(0, np.float32)

    diff = pts - pts[indices[0]]
    min_d = np.einsum("nd,nd->n", diff, diff)
    for i in range(1, k):
        indices[i] = int(np.argmax(min_d))
        diff = pts - pts[indices[i]]
        d = np.einsum("nd,nd->n", diff, diff)
        np.minimum(min_d, d, out=min_d)
    return indices, min_d


def normalize_point_cloud(pos: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.float32]:
    """Centroid shift; furthest-distance scale pinned to 1 exactly like the
    reference (train_utils.py:214-221)."""
    centroid = np.mean(pos, axis=0, keepdims=True)
    out = pos - centroid
    furthest_distance = np.float32(1.0)
    return out / furthest_distance, centroid, furthest_distance


def sample_patch_with_fps(
    input_pos: np.ndarray,
    sample_num: Optional[int] = None,
    fps_ratio: float = 0.125,
    rng: Optional[np.random.Generator] = None,
    tree: Optional[cKDTree] = None,
    fps: bool = True,
) -> Tuple[Dict[str, np.ndarray], np.ndarray, np.ndarray]:
    """KDTree neighborhood patch around a random seed + FPS downsample
    (reference train_utils.py:98-139). Returns (dict, patch_idx, fps_idx)
    with dict = {patch_pos, ds_pos}. ``fps=False`` skips the downsample
    (fps_idx is None) for callers that FPS on device instead.
    """
    rng = rng or np.random.default_rng()
    total = input_pos.shape[0]
    if sample_num is None:
        patch_num = 9216 if total > 10000 else (total // 1024) * 1024
    else:
        patch_num = sample_num if total > sample_num else 4096
    patch_num = min(patch_num, total)

    from tpugan_tpu.data import native

    seed = int(rng.integers(total))
    if native.available() and tree is None:
        patch_idx = native.knn_patch(input_pos.astype(np.float32), seed,
                                     patch_num)
    else:
        tree = tree or cKDTree(input_pos)
        _, patch_idx = tree.query(input_pos[seed], patch_num)
    patch_pos = input_pos[patch_idx]

    if not fps:
        return {"patch_pos": patch_pos, "ds_pos": None}, patch_idx, None
    fps_idx, _ = farthest_point_sampling(
        patch_pos, int(fps_ratio * patch_num), rng=rng
    )
    return (
        {"patch_pos": patch_pos, "ds_pos": patch_pos[fps_idx]},
        patch_idx,
        fps_idx,
    )


def voxel_downsample(
    pos: np.ndarray,
    radius: float,
    ds_ratio: float,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Grid-quantized downsample: one representative (the voxel centroid)
    per occupied voxel of edge (1/ds_ratio)*radius, then random truncation to
    the target count — the numpy equivalent of the reference's Open3D
    ``voxel_down_sample`` (train_utils.py:13-30)."""
    rng = rng or np.random.default_rng()
    pos = pos.reshape(-1, 3)
    voxel = (1.0 / ds_ratio) * radius + 1e-9
    keys = np.floor((pos - pos.min(0)) / voxel).astype(np.int64)
    _, inverse, counts = np.unique(
        keys, axis=0, return_inverse=True, return_counts=True
    )
    sums = np.zeros((counts.shape[0], 3), np.float64)
    np.add.at(sums, inverse, pos)
    ds_pos = (sums / counts[:, None]).astype(np.float32)

    target = int(ds_ratio * pos.shape[0])
    if ds_pos.shape[0] > target:
        ds_pos = ds_pos[rng.choice(ds_pos.shape[0], target, replace=False)]
    return ds_pos


def voxel_downsample_with_feat(
    pos: np.ndarray,
    feat: np.ndarray,
    radius: float,
    ds_ratio: float,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Voxel downsample carrying per-point features as voxel means
    (reference train_utils.py:68-95 via Open3D trace)."""
    rng = rng or np.random.default_rng()
    pos = pos.reshape(-1, 3)
    voxel = (1.0 / ds_ratio) * radius + 1e-9
    keys = np.floor((pos - pos.min(0)) / voxel).astype(np.int64)
    _, inverse, counts = np.unique(
        keys, axis=0, return_inverse=True, return_counts=True
    )
    psums = np.zeros((counts.shape[0], 3), np.float64)
    np.add.at(psums, inverse, pos)
    fsums = np.zeros((counts.shape[0], feat.shape[1]), np.float64)
    np.add.at(fsums, inverse, feat)
    ds_pos = (psums / counts[:, None]).astype(np.float32)
    ds_feat = (fsums / counts[:, None]).astype(np.float32)

    target = int(ds_ratio * pos.shape[0])
    if ds_pos.shape[0] > target:
        sel = rng.choice(ds_pos.shape[0], target, replace=False)
        ds_pos, ds_feat = ds_pos[sel], ds_feat[sel]
    return ds_pos, ds_feat


def sample_patch(
    input_pos: np.ndarray,
    h: float = 1.0,
    return_free_surface_particles: bool = True,
    rng: Optional[np.random.Generator] = None,
):
    """Voxel-downsample flavored patch sampler (reference
    train_utils.py:33-65): size-bucketed KDTree patch + 0.5-ratio voxel
    downsample, retried until the downsample keeps >= 500 points."""
    rng = rng or np.random.default_rng()
    total = input_pos.shape[0]
    if total > 80000:
        patch_num = 32768
    elif total > 40000:
        patch_num = 16384
    elif total > 10000:
        patch_num = 8192
    else:
        patch_num = total
    tree = cKDTree(input_pos)
    for attempt in range(100):
        seed = input_pos[rng.integers(total)]
        _, patch = tree.query(seed, patch_num)
        patch_pos = input_pos[patch]
        ds_pos = voxel_downsample(patch_pos, radius=BASE_RADIUS / h,
                                  ds_ratio=0.50, rng=rng)
        if ds_pos.shape[0] >= 500 or patch_num < 1000:
            break
    else:
        raise RuntimeError("Abnormal sampling times!")
    if return_free_surface_particles:
        surface = get_free_surface_particles(patch_pos, 2.2 * BASE_RADIUS / h)
        return patch_pos, ds_pos, surface
    return patch_pos, ds_pos


def filter_overlap_particles(pos: np.ndarray, h: float = BASE_RADIUS * 0.5) -> np.ndarray:
    """Deduplicate near-coincident particles by voxel hashing (reference
    train_utils.py:241-255)."""
    pos = np.asarray(pos, np.float32).reshape(-1, 3)
    voxel = h + 1e-8
    keys = np.floor((pos - pos.min(0)) / voxel).astype(np.int64)
    _, inverse, counts = np.unique(
        keys, axis=0, return_inverse=True, return_counts=True
    )
    sums = np.zeros((counts.shape[0], 3), np.float64)
    np.add.at(sums, inverse, pos)
    return (sums / counts[:, None]).astype(np.float32)


def get_distribution_info(points: np.ndarray):
    """(centroid, min bound, max bound) of a cloud (reference
    train_utils.py:201-211)."""
    return points.mean(0), points.min(0), points.max(0)


def dump_pointcloud_visualization(pos: np.ndarray, filename: str) -> None:
    """Headless scatter render to PNG via matplotlib (reference
    train_utils.py:224-238 used Open3D's offscreen capture)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        np.save(filename + ".npy", pos)
        return
    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(pos[:, 0], pos[:, 2], pos[:, 1], s=0.5)
    ax.set_axis_off()
    fig.savefig(filename, dpi=120, bbox_inches="tight")
    plt.close(fig)


def pad_with_appropriate_size(
    pos: np.ndarray,
    bucket: int = 1024,
    sentinel: float = 999.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad a variable-size cloud up to the next ``bucket`` multiple so jit
    programs are reused across frames (reference
    train_action/analysis_helper.py:71-83 pads clips for fixed-shape EMD;
    here the pad is the 999 sentinel plus a validity mask)."""
    n = pos.shape[0]
    target = max(bucket, ((n + bucket - 1) // bucket) * bucket)
    padded = np.full((target, pos.shape[1]), sentinel, pos.dtype)
    padded[:n] = pos
    valid = np.zeros(target, bool)
    valid[:n] = True
    return padded, valid


def fixed_radius_neighbor_num(pos: np.ndarray, radius: float) -> np.ndarray:
    """Per-point neighbor counts within ``radius`` (reference
    train_utils.py:269-272)."""
    tree = cKDTree(pos)
    return np.asarray(tree.query_ball_point(pos, radius, return_length=True))


def get_free_surface_particles(pos: np.ndarray, radius: float) -> np.ndarray:
    """Particles whose neighbor count falls below 85% of the dense-bulk
    threshold (reference train_utils.py:281-286)."""
    nbr = fixed_radius_neighbor_num(pos, radius)
    sorted_nbr = np.sort(nbr)
    n = pos.shape[0]
    threshold = np.mean(sorted_nbr[int(n * 0.95): n - int(n * 0.01)])
    return pos[nbr < 0.85 * threshold]
