"""Single-step training tests (SURVEY.md §4d): finite losses, metric-key
parity with the reference's TensorBoard schema, D-update gating, checkpoint
roundtrip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugan_tpu.config import ActionTrainConfig, FluidTrainConfig, replace
from tpugan_tpu.train import (
    init_action_state,
    init_fluid_state,
    load_checkpoint,
    make_action_gan_step,
    make_fluid_gan_step,
    save_checkpoint,
)

# compile-heavy tier (jitted GAN-step graphs) — deselect with -m 'not slow'
# for the quick unit run
pytestmark = pytest.mark.slow

TINY_FLUID = FluidTrainConfig(
    batch_size=2, patch_size=128, fps_ratio=0.125, upsample_ratio=8,
    node_embedding=32,
)
TINY_ACTION = ActionTrainConfig(
    batch_size=2, num_points=128, fps_ratio=0.0625, upsample_ratio=16,
    node_embedding=32,
)


@pytest.fixture(scope="module")
def fluid_setup():
    """Share one compiled fluid step across tests (XLA-CPU compile of the
    full GAN step is expensive)."""
    cfg = TINY_FLUID
    models, txs, state = init_fluid_state(cfg, jax.random.PRNGKey(0))
    step = make_fluid_gan_step(models, txs, cfg)
    return cfg, step, state


@pytest.fixture(scope="module")
def action_setup():
    cfg = TINY_ACTION
    models, txs, state = init_action_state(cfg, jax.random.PRNGKey(0))
    step = make_action_gan_step(models, txs, cfg)
    return cfg, step, state


def _fluid_batch(rng, cfg):
    n, m = cfg.lowres_size, cfg.lowres_size * cfg.upsample_ratio
    b = cfg.batch_size
    return {
        "lowres_pos": jnp.asarray(rng.standard_normal((3, b, n, 3)).astype(np.float32) * 0.3),
        "lowres_vel": jnp.asarray(rng.standard_normal((3, b, n, 3)).astype(np.float32)),
        "highres_pos": jnp.asarray(rng.standard_normal((3, b, m, 3)).astype(np.float32) * 0.3),
        "highres_vel": jnp.asarray(rng.standard_normal((3, b, m, 3)).astype(np.float32)),
    }


FLUID_KEYS = {
    "tempo_G_loss", "tempo_D_loss", "Chamfer_distance_no_norm",
    "masking_loss", "spatial_G_loss", "spatial_D_loss",
}


def _copy_state(state):
    # the jitted steps donate their input state; tests sharing the fixture
    # state must hand in a fresh copy
    return jax.tree_util.tree_map(jnp.copy, state)


def test_fluid_gan_step_runs_and_updates(rng, fluid_setup):
    cfg, step, state0 = fluid_setup
    state = _copy_state(state0)
    batch = _fluid_batch(rng, cfg)

    p0 = jax.tree_util.tree_map(np.asarray, state.sr.params)
    metrics_hist = []
    for i in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(i + 1))
        metrics_hist.append({k: float(v) for k, v in metrics.items()})

    assert int(state.n_iter) == 2
    for m in metrics_hist:
        assert set(m) == FLUID_KEYS
        assert all(np.isfinite(v) for v in m.values())
    # generator params moved
    p1 = jax.tree_util.tree_map(np.asarray, state.sr.params)
    diffs = jax.tree_util.tree_map(lambda a, b: np.abs(a - b).max(), p0, p1)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_fluid_gan_step_use_vel(rng):
    cfg = replace(TINY_FLUID, use_vel=True, in_node_feats=6)
    models, txs, state = init_fluid_state(cfg, jax.random.PRNGKey(0))
    step = make_fluid_gan_step(models, txs, cfg)
    state, metrics = step(state, _fluid_batch(rng, cfg), jax.random.PRNGKey(1))
    assert set(metrics) == FLUID_KEYS
    assert all(np.isfinite(float(v)) for v in metrics.values())


def test_fluid_step_masking_warmup_gates_adversarial(rng, fluid_setup):
    """For the first 10 iters masking loss is pinned at 1.0 (> gate 0.1) so
    adversarial losses and D-losses must be exactly 0 (reference
    train_step_final.py:117,171-174)."""
    cfg, step, state0 = fluid_setup
    state = _copy_state(state0)
    state, metrics = step(state, _fluid_batch(rng, cfg), jax.random.PRNGKey(9))
    assert float(metrics["masking_loss"]) == 1.0
    assert float(metrics["tempo_G_loss"]) == 0.0
    assert float(metrics["spatial_G_loss"]) == 0.0
    assert float(metrics["tempo_D_loss"]) == 0.0
    assert float(metrics["spatial_D_loss"]) == 0.0


def test_action_gan_step_runs_and_d_gating(rng, action_setup):
    cfg, step, state0 = action_setup
    state = _copy_state(state0)
    n, m = cfg.lowres_size, cfg.lowres_size * cfg.upsample_ratio
    b = cfg.batch_size
    batch = {
        "lowres_pos": jnp.asarray(rng.standard_normal((3, b, n, 3)).astype(np.float32)),
        "highres_pos": jnp.asarray(rng.standard_normal((3, b, m, 3)).astype(np.float32)),
    }
    # iter 1: odd -> D update skipped
    state, m1 = step(state, batch, jax.random.PRNGKey(1))
    assert float(m1["tempo_D_loss"]) == 0.0
    assert float(m1["spatial_D_loss"]) == 0.0
    assert float(m1["tempo_G_loss"]) > 0.0  # adversarial always on (no mask gate)
    # iter 2: even -> D updates happen
    state, m2 = step(state, batch, jax.random.PRNGKey(2))
    assert float(m2["tempo_D_loss"]) != 0.0
    assert float(m2["spatial_D_loss"]) != 0.0
    assert int(state.n_iter) == 2


def test_checkpoint_roundtrip(rng, tmp_path):
    cfg = TINY_ACTION
    models, txs, state = init_action_state(cfg, jax.random.PRNGKey(0))
    path = os.path.join(tmp_path, "ckpt", "tpugan_checkpoint1.ckpt")
    save_checkpoint(state, path, max_keep=3)
    assert os.path.exists(os.path.join(tmp_path, "ckpt", "latest_checkpoint.txt"))

    _, _, fresh = init_action_state(cfg, jax.random.PRNGKey(42))
    restored = load_checkpoint(os.path.join(tmp_path, "ckpt"), fresh)
    a = jax.tree_util.tree_leaves(state.sr.params)
    b = jax.tree_util.tree_leaves(restored.sr.params)
    assert all(np.allclose(x, y) for x, y in zip(a, b))

    # manifest rotation + max_keep pruning
    for i in range(2, 6):
        save_checkpoint(
            restored, os.path.join(tmp_path, "ckpt", f"tpugan_checkpoint{i}.ckpt"),
            max_keep=3,
        )
    with open(os.path.join(tmp_path, "ckpt", "latest_checkpoint.txt")) as fh:
        names = [l.strip() for l in fh.readlines()]
    assert names == [
        "tpugan_checkpoint5.ckpt", "tpugan_checkpoint4.ckpt",
        "tpugan_checkpoint3.ckpt",
    ]
    assert not os.path.exists(
        os.path.join(tmp_path, "ckpt", "tpugan_checkpoint1.ckpt")
    )


def test_async_checkpoint(rng, tmp_path, action_setup):
    from tpugan_tpu.train.checkpoint import save_checkpoint_async

    _, _, state = action_setup
    path = os.path.join(tmp_path, "actx", "ck1.ckpt")
    fut = save_checkpoint_async(state, path, max_keep=2)
    fut.result(timeout=60)
    assert os.path.exists(path)
    _, _, fresh = init_action_state(TINY_ACTION, jax.random.PRNGKey(9))
    restored = load_checkpoint(path, fresh)
    a = jax.tree_util.tree_leaves(jax.device_get(state.sr.params))
    b = jax.tree_util.tree_leaves(restored.sr.params)
    assert all(np.allclose(x, y) for x, y in zip(a, b))


def test_device_sample_lowres_matches_host_fps(rng):
    # the device path (fps_pallas on the center frame, shared indices
    # across frames) must reproduce the loader's greedy FPS exactly when
    # given the same start index (data/sampling.py:farthest_point_sampling)
    from tpugan_tpu.data.sampling import farthest_point_sampling
    from tpugan_tpu.train.step import device_sample_lowres

    f, b, m, n_low = 3, 2, 96, 12
    hp = rng.standard_normal((f, b, m, 3)).astype(np.float32)
    hv = rng.standard_normal((f, b, m, 3)).astype(np.float32)
    start = np.array([5, 40], np.int32)
    lp, lv = device_sample_lowres(
        jnp.asarray(hp), jnp.asarray(hv), n_low, 0.0,
        jax.random.PRNGKey(0), start=jnp.asarray(start),
    )
    for i in range(b):
        idx, _ = farthest_point_sampling(hp[1, i], n_low,
                                         initial_idx=int(start[i]))
        np.testing.assert_allclose(np.asarray(lp)[:, i], hp[:, i][:, idx])
        np.testing.assert_allclose(np.asarray(lv)[:, i], hv[:, i][:, idx])


def test_fluid_step_device_sampling(rng):
    # a lowres-free batch + device_sampling cfg runs end to end and trains
    cfg = replace(TINY_FLUID, device_sampling=True)
    models, txs, state = init_fluid_state(cfg, jax.random.PRNGKey(0))
    step = make_fluid_gan_step(models, txs, cfg)
    batch = _fluid_batch(rng, cfg)
    del batch["lowres_pos"], batch["lowres_vel"]
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert set(metrics) == FLUID_KEYS
    for v in metrics.values():
        assert np.isfinite(float(v))


def test_fluid_dataset_emit_lowres_false(tmp_path, rng):
    from tpugan_tpu.data.synthetic import make_synthetic_fluid_dataset

    root = str(tmp_path / "fluid")
    make_synthetic_fluid_dataset(root, case_num=1, case_steps=4,
                                 num_particles=1500, seed=0)
    from tpugan_tpu.data import SiamFluidDataset, fluid_batch_iterator

    ds = SiamFluidDataset(root, case_num=1, case_steps=4, sample_num=1024,
                          fps_ratio=0.125, emit_lowres=False)
    item = ds[0]
    assert "lowres_pos" not in item and "lowres_vel" not in item
    batch = next(fluid_batch_iterator(ds, batch_size=2, seed=0))
    assert set(batch) == {"highres_pos", "highres_vel", "h"}
    assert batch["highres_pos"].shape == (3, 2, 1024, 3)


def test_action_step_device_sampling(rng):
    # lowres-free batch + per-frame device FPS runs end to end
    cfg = replace(TINY_ACTION, device_sampling=True)
    models, txs, state = init_action_state(cfg, jax.random.PRNGKey(0))
    step = make_action_gan_step(models, txs, cfg)
    m = cfg.num_points
    batch = {"highres_pos": jnp.asarray(
        rng.standard_normal((3, 2, m, 3)).astype(np.float32) * 0.3)}
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for v in metrics.values():
        assert np.isfinite(float(v))
