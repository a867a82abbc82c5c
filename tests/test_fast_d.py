"""Grouped-statistics batch norm + frame-stacked temporal towers.

The fast-D path (train/step.py ``fast_d``) replaces per-frame / per-source
(fake, real) sequential applies of the BatchNorm-bearing discriminator
towers with ONE stacked apply whose norms run under
``layers.stat_groups(G)``. These tests pin the exactness contract:

- GroupedBatchNorm == G sequential flax ``nn.BatchNorm`` train calls,
  bitwise (outputs AND running stats), and == flax at groups=1.
- Frame-stacked tempo towers == the per-frame loop, bitwise, with spectral
  norm off (spectral norm advances its power iteration once per apply
  instead of once per frame — the documented u-trajectory deviation).
- A fake/real-stacked tower apply under ``stat_groups(2)`` == two
  sequential applies (the reference D-update semantics,
  train_step_final.py:185-190).
- SetConv treats an all-ones valid mask exactly like valid=None (the
  stacked D update feeds ones for the real half where the loop passed
  None).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from tpugan_tpu.nn.layers import GroupedBatchNorm, stat_groups
from tpugan_tpu.nn.setconv import SetConv


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_grouped_bn_matches_sequential_flax(rng):
    g, b, n, c = 3, 4, 17, 8
    x = jnp.asarray(rng.standard_normal((g * b, n, c)).astype(np.float32))

    ref = nn.BatchNorm(use_running_average=False, axis_name=None)
    variables = ref.init(jax.random.PRNGKey(0), x[:b])
    # scale/bias off the init defaults so affine terms are exercised
    variables = {
        "params": {
            "scale": jnp.asarray(
                rng.standard_normal(c).astype(np.float32)),
            "bias": jnp.asarray(rng.standard_normal(c).astype(np.float32)),
        },
        "batch_stats": {
            "mean": jnp.asarray(rng.standard_normal(c).astype(np.float32)),
            "var": jnp.abs(
                jnp.asarray(rng.standard_normal(c).astype(np.float32))),
        },
    }

    outs, stats = [], variables["batch_stats"]
    for i in range(g):
        y, upd = ref.apply(
            {"params": variables["params"], "batch_stats": stats},
            x[i * b:(i + 1) * b], mutable=["batch_stats"],
        )
        outs.append(y)
        stats = upd["batch_stats"]
    seq_out = jnp.concatenate(outs, axis=0)

    gbn = GroupedBatchNorm(groups=g)
    stacked_out, upd = gbn.apply(variables, x, mutable=["batch_stats"])

    np.testing.assert_array_equal(np.asarray(seq_out),
                                  np.asarray(stacked_out))
    np.testing.assert_array_equal(np.asarray(stats["mean"]),
                                  np.asarray(upd["batch_stats"]["mean"]))
    np.testing.assert_array_equal(np.asarray(stats["var"]),
                                  np.asarray(upd["batch_stats"]["var"]))


def test_grouped_bn_groups1_is_flax(rng):
    b, c = 6, 5
    x = jnp.asarray(rng.standard_normal((b, c)).astype(np.float32) * 3)
    ref = nn.BatchNorm(use_running_average=False, axis_name=None)
    variables = ref.init(jax.random.PRNGKey(0), x)
    y_ref, upd_ref = ref.apply(variables, x, mutable=["batch_stats"])
    y_g, upd_g = GroupedBatchNorm(groups=1).apply(
        variables, x, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_g))
    np.testing.assert_array_equal(
        np.asarray(upd_ref["batch_stats"]["mean"]),
        np.asarray(upd_g["batch_stats"]["mean"]))
    np.testing.assert_array_equal(
        np.asarray(upd_ref["batch_stats"]["var"]),
        np.asarray(upd_g["batch_stats"]["var"]))


def _tree_equal(a, b):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(b)}
    assert len(flat_a) == len(flat_b)
    for k, v in flat_a:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(flat_b[jax.tree_util.keystr(k)]),
            err_msg=jax.tree_util.keystr(k))


def test_fluid_tempo_stack_frames_bitwise(rng):
    from tpugan_tpu.models.discriminator import FluidTempoDis

    b, n = 2, 96
    pos = [jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32)
                       * 0.3) for _ in range(3)]
    vel = [jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32)
                       * 0.1) for _ in range(3)]
    valid = [jnp.ones((b, n), bool) for _ in range(3)]
    dis = FluidTempoDis(3, spectral_norm=False)
    variables = dis.init(jax.random.PRNGKey(0), pos, 0.1, feat_lst=vel,
                         valid_lst=valid, train=True)

    kw = dict(feat_lst=vel, valid_lst=valid, train=True,
              mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(7)})
    out_loop, upd_loop = dis.apply(variables, pos, 0.1, **kw)
    out_stack, upd_stack = dis.apply(variables, pos, 0.1,
                                     stack_frames=True, **kw)
    np.testing.assert_array_equal(np.asarray(out_loop),
                                  np.asarray(out_stack))
    _tree_equal(upd_loop["batch_stats"], upd_stack["batch_stats"])


def test_action_tower_fake_true_stacking_bitwise(rng):
    """One stacked apply on concat([fake, true]) under stat_groups(2) must
    equal the two sequential applies of the reference D update — per-frame
    AND per-source batch statistics preserved (frames are stacked too, so
    the norms inside sa1/sa2 run with 6 groups). The tower output carries
    no dropout, so equality is bitwise with spectral norm off. Running
    stats differ only in EMA replay order (frame-major vs the loop's
    source-major) — checked to tight tolerance."""
    from tpugan_tpu.models.discriminator import ActionTempoDis

    b, n = 2, 64
    fake = [jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
            for _ in range(3)]
    true = [jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
            for _ in range(3)]
    dis = ActionTempoDis(3, spectral_norm=False)
    variables = dis.init(jax.random.PRNGKey(0), fake, 2.0, train=True)

    def tower_apply(pos_lst, stats, stack, groups):
        mod = ActionTempoDis(3, spectral_norm=False)
        v = {"params": variables["params"], "batch_stats": stats}

        def inner(m):
            return m.tower(pos_lst, 2.0, train=True, stack_frames=stack)

        with stat_groups(groups):
            return nn.apply(inner, mod, mutable=["batch_stats"])(v)

    # sequential reference: fake apply then true apply, stats threaded
    f_out, f_upd = tower_apply(fake, variables["batch_stats"], False, 1)
    t_out, t_upd = tower_apply(true, f_upd["batch_stats"], False, 1)

    both = [jnp.concatenate([f, t], axis=0) for f, t in zip(fake, true)]
    s_out, s_upd = tower_apply(both, variables["batch_stats"], True, 2)

    np.testing.assert_array_equal(np.asarray(f_out), np.asarray(s_out[:b]))
    np.testing.assert_array_equal(np.asarray(t_out), np.asarray(s_out[b:]))

    flat_seq = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
                jax.tree_util.tree_leaves_with_path(t_upd["batch_stats"])}
    for k, v in jax.tree_util.tree_leaves_with_path(s_upd["batch_stats"]):
        ref = flat_seq[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(np.asarray(v), ref, rtol=0, atol=5e-3,
                                   err_msg=jax.tree_util.keystr(k))


@pytest.mark.slow
def test_fluid_gan_step_fast_d(rng):
    """Full fluid GAN step with fast_d: adversarial branch + stacked D
    update live (ml gate forced open), finite losses, all params move."""
    from tpugan_tpu.config import FluidTrainConfig
    from tpugan_tpu.train import init_fluid_state, make_fluid_gan_step

    cfg = FluidTrainConfig(
        batch_size=2, patch_size=128, fps_ratio=0.125, upsample_ratio=8,
        node_embedding=32, use_vel=True, in_node_feats=6,
        ml_gate=10.0, fast_d=True,
    )
    models, txs, state = init_fluid_state(cfg, jax.random.PRNGKey(0))
    step = make_fluid_gan_step(models, txs, cfg)
    n, m = cfg.lowres_size, cfg.lowres_size * cfg.upsample_ratio
    b = cfg.batch_size
    batch = {
        "lowres_pos": jnp.asarray(
            rng.standard_normal((3, b, n, 3)).astype(np.float32) * 0.3),
        "lowres_vel": jnp.asarray(
            rng.standard_normal((3, b, n, 3)).astype(np.float32)),
        "highres_pos": jnp.asarray(
            rng.standard_normal((3, b, m, 3)).astype(np.float32) * 0.3),
        "highres_vel": jnp.asarray(
            rng.standard_normal((3, b, m, 3)).astype(np.float32)),
    }
    t0 = jax.tree_util.tree_map(np.asarray, state.tempo.params)
    for i in range(2):  # step 2 runs the D update (iter % 2 == 0)
        state, metrics = step(state, batch, jax.random.PRNGKey(i + 1))
    vals = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in vals.values())
    assert vals["tempo_D_loss"] != 0.0 and vals["spatial_D_loss"] != 0.0
    t1 = jax.tree_util.tree_map(np.asarray, state.tempo.params)
    diffs = jax.tree_util.tree_map(lambda a, c: np.abs(a - c).max(), t0, t1)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


@pytest.mark.slow
def test_action_gan_step_fast_d(rng):
    from tpugan_tpu.config import ActionTrainConfig
    from tpugan_tpu.train import init_action_state, make_action_gan_step

    cfg = ActionTrainConfig(
        batch_size=2, num_points=128, fps_ratio=0.0625, upsample_ratio=16,
        node_embedding=32, fast_d=True,
    )
    models, txs, state = init_action_state(cfg, jax.random.PRNGKey(0))
    step = make_action_gan_step(models, txs, cfg)
    n = int(cfg.num_points * cfg.fps_ratio)
    b, m, f = cfg.batch_size, cfg.num_points, cfg.frames_per_clip
    batch = {
        "lowres_pos": jnp.asarray(
            rng.standard_normal((f, b, n, 3)).astype(np.float32)),
        "highres_pos": jnp.asarray(
            rng.standard_normal((f, b, m, 3)).astype(np.float32)),
    }
    for i in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(i + 1))
    vals = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in vals.values())
    assert vals["tempo_D_loss"] != 0.0 and vals["spatial_D_loss"] != 0.0


def test_setconv_valid_ones_equals_none(rng):
    b, n = 2, 80
    pos = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    sa = SetConv.ssg([16, 32], npoint=24, radius=0.5, nsample=8,
                     mask_dummy=True, spectral_norm=False)
    variables = sa.init(jax.random.PRNGKey(0), pos, pos, train=True)
    kw = dict(train=True, mutable=["batch_stats"])
    (p_none, f_none), _ = sa.apply(variables, pos, pos, valid=None, **kw)
    (p_ones, f_ones), _ = sa.apply(variables, pos, pos,
                                   valid=jnp.ones((b, n), bool), **kw)
    np.testing.assert_array_equal(np.asarray(p_none), np.asarray(p_ones))
    np.testing.assert_array_equal(np.asarray(f_none), np.asarray(f_ones))
