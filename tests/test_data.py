"""Tests for the host-side data pipeline: synthetic fixtures, host FPS,
patching, fluid siamese batches, MSR clips."""

import numpy as np
import pytest

from tpugan_tpu.data import (
    MSRAction3DDataset,
    SiamFluidDataset,
    action_batch_iterator,
    farthest_point_sampling,
    fluid_batch_iterator,
    get_free_surface_particles,
    make_synthetic_fluid_dataset,
    normalize_point_cloud,
    sample_patch_with_fps,
    voxel_downsample,
)
from tpugan_tpu.data.synthetic import make_synthetic_action_dataset


@pytest.fixture(scope="module")
def fluid_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("fluid")
    return make_synthetic_fluid_dataset(
        str(root), case_num=2, case_steps=6, num_particles=3000
    )


@pytest.fixture(scope="module")
def action_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("msr")
    return make_synthetic_action_dataset(str(root), num_videos=4, frames=8,
                                         points=700)


def test_host_fps_greedy_property(rng):
    pts = rng.standard_normal((200, 3)).astype(np.float32)
    idx, _ = farthest_point_sampling(pts, 20, initial_idx=0)
    assert idx[0] == 0
    assert len(np.unique(idx)) == 20
    # greedy invariant: each new point maximizes min distance to selected
    sel = [0]
    mind = np.sum((pts - pts[0]) ** 2, -1)
    for i in idx[1:]:
        assert mind[i] == mind.max()
        sel.append(i)
        mind = np.minimum(mind, np.sum((pts - pts[i]) ** 2, -1))


def test_normalize_point_cloud(rng):
    pos = rng.standard_normal((100, 3)).astype(np.float32) + 5
    out, c, h = normalize_point_cloud(pos)
    np.testing.assert_allclose(np.mean(out, 0), 0, atol=1e-5)
    assert h == 1.0


def test_sample_patch_with_fps(rng):
    pos = rng.standard_normal((3000, 3)).astype(np.float32)
    d, patch_idx, fps_idx = sample_patch_with_fps(pos, sample_num=1024,
                                                  fps_ratio=0.125, rng=rng)
    assert d["patch_pos"].shape == (1024, 3)
    assert d["ds_pos"].shape == (128, 3)
    np.testing.assert_array_equal(d["ds_pos"], d["patch_pos"][fps_idx])
    np.testing.assert_array_equal(d["patch_pos"], pos[patch_idx])


def test_voxel_downsample(rng):
    pos = rng.uniform(0, 1, (4000, 3)).astype(np.float32)
    ds = voxel_downsample(pos, radius=0.05, ds_ratio=0.5, rng=rng)
    assert ds.shape[0] <= 2000
    assert ds.shape[1] == 3


def test_free_surface_extraction(rng):
    # dense cube: surface particles are near the faces
    g = np.linspace(0, 1, 12)
    cube = np.stack(np.meshgrid(g, g, g), -1).reshape(-1, 3).astype(np.float32)
    surf = get_free_surface_particles(cube, radius=0.12)
    assert 0 < surf.shape[0] < cube.shape[0]
    d_face = np.minimum(surf.min(1), (1 - surf).min(1))
    assert np.all(d_face < 0.2)


def test_fluid_dataset_and_iterator(fluid_root):
    ds = SiamFluidDataset(fluid_root, case_num=2, case_steps=6,
                          sample_num=1024, fps_ratio=0.125)
    assert len(ds) == 8
    item = ds[0]
    assert item["highres_pos"].shape == (3, 1024, 3)
    assert item["lowres_pos"].shape == (3, 128, 3)
    # frame alignment: particles share identity across frames, so center
    # lowres ~ center highres[fps]; and motion between frames is small
    drift = np.abs(item["highres_pos"][1] - item["highres_pos"][0]).max()
    assert drift < 0.5
    assert item["highres_pos"].dtype == np.float32

    it = fluid_batch_iterator(ds, batch_size=2, seed=0)
    batch = next(it)
    assert batch["lowres_pos"].shape == (3, 2, 128, 3)
    assert batch["highres_pos"].shape == (3, 2, 1024, 3)
    assert batch["h"].shape == (2,)


def test_msr_dataset_split_and_shapes(action_root):
    tr = MSRAction3DDataset(action_root, frames_per_clip=3, num_points=512)
    te = MSRAction3DDataset(action_root, frames_per_clip=3, num_points=512,
                            train=False)
    assert len(tr) > 0 and len(te) > 0
    item = tr[0]
    assert item["highres_pos"].shape == (3, 512, 3)
    assert item["lowres_pos"].shape == (3, 32, 3)
    # train clips centered on middle frame
    np.testing.assert_allclose(item["highres_pos"][1].mean(0), 0, atol=1e-4)
    # test clips carry per-frame centers + video index
    t_item = te[0]
    assert "centers" in t_item and "video_index" in t_item
    np.testing.assert_allclose(t_item["highres_pos"][0].mean(0), 0, atol=1e-4)

    batch = next(action_batch_iterator(tr, batch_size=2, seed=0))
    assert batch["highres_pos"].shape == (3, 2, 512, 3)
    assert batch["lowres_pos"].shape == (3, 2, 32, 3)
    assert batch["label"].shape == (2,)


def test_voxel_downsample_with_feat(rng):
    from tpugan_tpu.data.sampling import voxel_downsample_with_feat

    pos = rng.uniform(0, 1, (3000, 3)).astype(np.float32)
    feat = np.tile(pos[:, :1] * 10, (1, 2)).astype(np.float32)
    ds_pos, ds_feat = voxel_downsample_with_feat(pos, feat, 0.05, 0.5, rng=rng)
    assert ds_pos.shape[0] == ds_feat.shape[0] <= 1500
    # features are voxel means of a smooth field -> close to 10*x
    np.testing.assert_allclose(ds_feat[:, 0], ds_pos[:, 0] * 10, atol=1.2)


def test_filter_overlap_particles(rng):
    from tpugan_tpu.data.sampling import filter_overlap_particles

    base = rng.uniform(0, 1, (200, 3)).astype(np.float32)
    dup = np.concatenate([base, base + 1e-5])
    out = filter_overlap_particles(dup, h=0.01)
    assert out.shape[0] <= 210  # near-duplicates collapsed


def test_sample_patch_voxel_flavor(rng):
    from tpugan_tpu.data.sampling import sample_patch

    pos = rng.uniform(0, 1, (12000, 3)).astype(np.float32) * 2.0
    patch, ds, surface = sample_patch(pos, h=1.0, rng=rng)
    assert patch.shape[0] == 8192
    assert ds.shape[0] >= 500
    assert surface.shape[0] > 0


def test_prefetch_iterator_preserves_order():
    from tpugan_tpu.data.prefetch import prefetch_iterator

    out = list(prefetch_iterator(iter(range(50)), size=4))
    assert out == list(range(50))


def test_pad_with_appropriate_size():
    from tpugan_tpu.data.sampling import pad_with_appropriate_size

    pos = np.zeros((1500, 3), np.float32)
    padded, valid = pad_with_appropriate_size(pos, bucket=1024)
    assert padded.shape == (2048, 3)
    assert valid.sum() == 1500
    assert np.all(padded[1500:] == 999.0)


def test_synthetic_action_signal_survives_test_centering(tmp_path):
    """Regression (round 5): the MSR test protocol centers every test
    frame on its own mean (data/msr.py:105-108, reference
    msr_dataset.py:115-120), erasing rigid translation — so synthetic
    classes must differ NON-rigidly or the transfer eval measures chance.
    Pin that a covariance-trajectory nearest-centroid probe separates
    classes on per-frame-centered TEST clips."""
    root = make_synthetic_action_dataset(
        str(tmp_path / "msr"), num_videos=18, frames=8, points=1200,
        num_classes=3, seed=0)
    iu = np.triu_indices(3)

    def feats(ds):
        xs, ys = [], []
        for i in range(len(ds)):
            item = ds[i]
            pos = np.asarray(item["highres_pos"])
            covs = np.stack([np.cov((pos[f] - pos[f].mean(0)).T)[iu]
                             for f in range(pos.shape[0])])
            xs.append(np.concatenate(
                [covs[0], covs[1] - covs[0], covs[2] - covs[1]]))
            ys.append(int(item["label"]))
        return np.stack(xs), np.array(ys)

    tr = MSRAction3DDataset(root, frames_per_clip=3, num_points=512,
                            return_lowres=False, seed=0)
    te = MSRAction3DDataset(root, frames_per_clip=3, num_points=512,
                            train=False, return_lowres=False, seed=0)
    xtr, ytr = feats(tr)
    xte, yte = feats(te)
    # every test frame is per-frame centered (the rigid signal is gone)
    assert abs(np.asarray(te[0]["highres_pos"][2]).mean(0)).max() < 1e-4
    mu, sd = xtr.mean(0), xtr.std(0) + 1e-9
    classes = np.unique(ytr)
    ztr, zte = (xtr - mu) / sd, (xte - mu) / sd
    cents = np.stack([ztr[ytr == c].mean(0) for c in classes])
    pred = classes[np.argmin(
        ((zte[:, None, :] - cents[None]) ** 2).sum(-1), axis=1)]
    acc = float((pred == yte).mean())
    assert acc > 0.55, f"shape-dynamics probe at {acc} (chance 0.33)"
