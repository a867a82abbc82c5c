"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md §4e):
data-parallel GAN step must compile, execute, and agree with the
single-device step (same global batch, same key)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugan_tpu.config import ActionTrainConfig
from tpugan_tpu.parallel import batch_sharded, make_mesh, replicated
from tpugan_tpu.parallel.mesh import device_put_batch, device_put_replicated
from tpugan_tpu.train import init_action_state, make_action_gan_step

# compile-heavy / subprocess tier — deselect with -m 'not slow' for the quick unit run
pytestmark = pytest.mark.slow

CFG = ActionTrainConfig(
    batch_size=8, num_points=64, fps_ratio=0.125, upsample_ratio=4,
    node_embedding=32,
)


def _batch(rng, cfg):
    n, m = cfg.lowres_size, cfg.lowres_size * cfg.upsample_ratio
    return {
        "lowres_pos": rng.standard_normal((3, cfg.batch_size, n, 3)).astype(np.float32),
        "highres_pos": rng.standard_normal((3, cfg.batch_size, m, 3)).astype(np.float32),
    }


def test_mesh_creation():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_data_parallel_step_matches_single_device(rng):
    assert len(jax.devices()) == 8
    batch = _batch(rng, CFG)
    key = jax.random.PRNGKey(7)

    # single device
    models, txs, state1 = init_action_state(CFG, jax.random.PRNGKey(0))
    step1 = make_action_gan_step(models, txs, CFG)
    state1, m1 = step1(state1, {k: jnp.asarray(v) for k, v in batch.items()}, key)

    # 8-device mesh, same global batch
    mesh = make_mesh(8)
    models8, txs8, state8 = init_action_state(CFG, jax.random.PRNGKey(0))
    step8 = make_action_gan_step(models8, txs8, CFG, mesh=mesh)
    state8 = device_put_replicated(state8, mesh)
    sharded_batch = device_put_batch(batch, mesh)
    state8, m8 = step8(state8, sharded_batch, jax.device_put(key, replicated(mesh)))

    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), rtol=2e-3, atol=2e-4,
            err_msg=f"metric {k} diverged between 1x and 8x execution",
        )
    # parameters evolve identically up to reduction order
    a = jax.tree_util.tree_leaves(jax.device_get(state1.sr.params))
    b = jax.tree_util.tree_leaves(jax.device_get(state8.sr.params))
    # Adam divides by sqrt(v): float reduction-order noise in gradients can
    # surface as up to ~lr-sized update differences on isolated elements.
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, rtol=5e-2, atol=2e-3)


def test_data_parallel_step_bitwise_deterministic(rng):
    """Run-to-run determinism of the sharded step: two executions of the
    SAME compiled program from the same state/batch/key must produce
    bitwise-identical metrics and parameters (the cross-device psum has a
    fixed reduction order under GSPMD; nothing in the step may introduce
    nondeterminism)."""
    batch = _batch(rng, CFG)
    key = jax.random.PRNGKey(11)
    mesh = make_mesh(8)
    models, txs, state0 = init_action_state(CFG, jax.random.PRNGKey(0))
    step = make_action_gan_step(models, txs, CFG, mesh=mesh)
    state0 = device_put_replicated(state0, mesh)
    sb = device_put_batch(batch, mesh)
    rkey = jax.device_put(key, replicated(mesh))

    # NB: the step donates its state buffers; re-replicate for the 2nd run
    sa, ma = step(state0, sb, rkey)
    models2, txs2, state1 = init_action_state(CFG, jax.random.PRNGKey(0))
    state1 = device_put_replicated(state1, mesh)
    sb2 = device_put_batch(batch, mesh)
    sbit, mb = step(state1, sb2, jax.device_put(key, replicated(mesh)))

    for k in ma:
        np.testing.assert_array_equal(np.asarray(ma[k]), np.asarray(mb[k]))
    a = jax.tree_util.tree_leaves(jax.device_get(sa.sr.params))
    b = jax.tree_util.tree_leaves(jax.device_get(sbit.sr.params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_sharded_batch_layout(rng):
    mesh = make_mesh(8)
    batch = _batch(rng, CFG)
    sb = device_put_batch(batch, mesh)
    shard = sb["lowres_pos"].addressable_shards[0]
    assert shard.data.shape == (3, 1, CFG.lowres_size, 3)  # B split 8 ways


def test_sharded_knn_matches_unsharded(rng):
    from tpugan_tpu.ops.neighbors import knn
    from tpugan_tpu.parallel.sharded_ops import sharded_knn

    mesh = make_mesh(8)
    q = jnp.asarray(rng.standard_normal((1, 256, 3)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((1, 512, 3)).astype(np.float32))
    d2s, idxs = sharded_knn(q, c, 8, mesh)
    d2, idx = knn(q, c, 8)
    np.testing.assert_array_equal(np.asarray(idxs), np.asarray(idx))
    np.testing.assert_allclose(np.asarray(d2s), np.asarray(d2), atol=1e-5)


def test_sharded_chamfer_matches_unsharded(rng):
    from tpugan_tpu.ops.metrics import chamfer
    from tpugan_tpu.parallel.sharded_ops import sharded_chamfer

    mesh = make_mesh(8)
    a = jnp.asarray(rng.standard_normal((2, 128, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((2, 256, 3)).astype(np.float32))
    got = np.asarray(sharded_chamfer(a, b, mesh))
    want = np.asarray(chamfer(a, b))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sharded_ball_query_matches_unsharded(rng):
    from tpugan_tpu.ops.neighbors import ball_query
    from tpugan_tpu.parallel.sharded_ops import sharded_ball_query

    mesh = make_mesh(8)
    q = jnp.asarray(rng.standard_normal((1, 64, 3)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((1, 128, 3)).astype(np.float32))
    got = np.asarray(sharded_ball_query(q, c, 0.8, 8, mesh))
    want = np.asarray(ball_query(q, c, 0.8, 8))
    np.testing.assert_array_equal(got, want)
