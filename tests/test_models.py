"""Forward-pass tests for nn modules and models on tiny synthetic clouds
(SURVEY.md §4c): shapes, finiteness, mask protocol, mutable-state handling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugan_tpu.models import (
    ActionCls,
    ActionSpatialDis,
    ActionTempoDis,
    FluidSpatialDis,
    FluidTempoDis,
    NoMaskSRNet,
    SRNet,
    transfer_feature_extractor,
)
from tpugan_tpu.models.generator import (
    RolloutMaskState,
    expand_pos,
    expand_pos_with_masking,
    rollout_mask_update,
)
from tpugan_tpu.nn import EdgeConv, FlowModule, SetConv


def _cloud(rng, b=2, n=64):
    return jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32) * 0.3)


def test_edgeconv_shapes(rng):
    x = _cloud(rng)
    m = EdgeConv(32, k=8)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 64, 32)
    assert np.all(np.isfinite(np.asarray(y)))


def test_edgeconv_dilation_param_count_independent(rng):
    x = _cloud(rng)
    v1 = EdgeConv(32, k=8, dilation=1).init(jax.random.PRNGKey(0), x)
    v2 = EdgeConv(32, k=8, dilation=2).init(jax.random.PRNGKey(0), x)
    n1 = sum(a.size for a in jax.tree_util.tree_leaves(v1))
    n2 = sum(a.size for a in jax.tree_util.tree_leaves(v2))
    assert n1 == n2


def test_setconv_downsamples_and_masks(rng):
    pos = _cloud(rng, b=1, n=128)
    # park half the points at the sentinel
    pos = pos.at[:, 64:].set(999.0)
    valid = jnp.arange(128)[None] < 64
    m = SetConv.ssg([16, 32], npoint=16, radius=0.5, nsample=8,
                    mask_dummy=True, spectral_norm=False)
    v = m.init(jax.random.PRNGKey(0), pos, pos, valid, True)
    (new_xyz, feat), _ = m.apply(v, pos, pos, valid, True,
                                 mutable=["batch_stats"])
    assert new_xyz.shape == (1, 16, 3)
    assert feat.shape == (1, 16, 32)
    # FPS must never have picked a dummy center
    assert np.all(np.abs(np.asarray(new_xyz)) < 100)


def test_setconv_group_all(rng):
    pos = _cloud(rng, b=2, n=32)
    feat = jnp.ones((2, 32, 8))
    m = SetConv.ssg([16, 16], spectral_norm=False, bn=False)
    v = m.init(jax.random.PRNGKey(0), pos, feat)
    _, out = m.apply(v, pos, feat)
    assert out.shape == (2, 1, 16)


def test_expand_pos_layout():
    pos = jnp.asarray(np.arange(6, dtype=np.float32).reshape(1, 2, 3))
    edge = jnp.zeros((1, 2, 12))  # r=4
    out = expand_pos(pos, edge, 4)
    assert out.shape == (1, 8, 3)
    # copies of point i occupy slots i*r..i*r+r-1
    np.testing.assert_array_equal(np.asarray(out[0, :4]), np.tile([0, 1, 2], (4, 1)))
    np.testing.assert_array_equal(np.asarray(out[0, 4:]), np.tile([3, 4, 5], (4, 1)))


def test_expand_pos_with_masking_sentinel_protocol():
    pos = jnp.zeros((1, 3, 3))
    edge = jnp.ones((1, 3, 6))  # r=2
    mask = jnp.asarray([[0.5, 0.0, 0.2]])  # point 1 masked out
    expanded, padded, valid = expand_pos_with_masking(pos, edge, mask, 2)
    v = np.asarray(valid)[0]
    # copy 0 always kept; masked point keeps only copy 0
    np.testing.assert_array_equal(v, [1, 1, 1, 0, 1, 1])
    p = np.asarray(padded)[0]
    assert np.all(p[3] == 999.0)
    # masked point's offsets zeroed -> its kept copy sits at pos
    np.testing.assert_array_equal(p[2], [0, 0, 0])
    # unmasked point's copies offset by edge
    np.testing.assert_array_equal(p[0], [1, 1, 1])


def test_srnet_forward(rng):
    b, n, r = 1, 48, 4
    pos = _cloud(rng, b, n)
    model = SRNet(in_feats=3, node_emb_dim=32, upsample_ratio=r)
    v = model.init(jax.random.PRNGKey(0), pos, pos, False)
    expanded, mask, padded, valid = model.apply(v, pos, pos, False)
    assert expanded.shape == (b, n * r, 3)
    assert mask.shape == (b, n)
    assert padded.shape == (b, n * r, 3)
    assert valid.shape == (b, n * r)
    assert np.all(np.isfinite(np.asarray(expanded)))
    # every r-th slot valid (copy 0 of each point)
    assert np.all(np.asarray(valid)[:, ::r])


def test_srnet_bf16_compute_tracks_f32(rng):
    # bf16 inference mode: same params, inner activations in bfloat16.
    # Offsets/mask heads promote back to f32; predictions must track the
    # exact forward to bf16 resolution (graph ties may flip a few
    # neighbors, so compare cloud-level Chamfer, not elementwise).
    from tpugan_tpu.ops.metrics import chamfer

    b, n, r = 1, 48, 4
    pos = _cloud(rng, b, n)
    f32 = SRNet(in_feats=3, node_emb_dim=32, upsample_ratio=r)
    bf16 = SRNet(in_feats=3, node_emb_dim=32, upsample_ratio=r,
                 compute_dtype=jnp.bfloat16)
    v = f32.init(jax.random.PRNGKey(0), pos, pos, False)
    exp_a, mask_a, pad_a, val_a = f32.apply(v, pos, pos, False)
    exp_b, mask_b, pad_b, val_b = bf16.apply(v, pos, pos, False)
    assert exp_b.dtype == jnp.float32 and mask_b.dtype == jnp.float32
    cd = float(jnp.mean(chamfer(pad_a, pad_b, a_valid=val_a, b_valid=val_b)))
    scale = float(jnp.mean(jnp.sum(pos**2, -1)))
    assert cd / (exp_a.shape[1] * scale) < 5e-3
    # the binary keep-decisions should almost all agree
    agree = float(jnp.mean((mask_a > 0.01) == (mask_b > 0.01)))
    assert agree > 0.95


def test_srnet_velocity_features(rng):
    pos = _cloud(rng, 1, 32)
    feat = jnp.concatenate([pos, 0.025 * _cloud(rng, 1, 32)], axis=-1)
    model = SRNet(in_feats=6, node_emb_dim=32, upsample_ratio=2)
    v = model.init(jax.random.PRNGKey(0), feat, pos, False)
    expanded, *_ = model.apply(v, feat, pos, False)
    assert expanded.shape == (1, 64, 3)


def test_nomask_srnet(rng):
    pos = _cloud(rng, 2, 32)
    model = NoMaskSRNet(in_feats=3, node_emb_dim=32, upsample_ratio=4)
    v = model.init(jax.random.PRNGKey(0), pos, pos, False)
    out, edge = model.apply(v, pos, pos, False)
    assert out.shape == (2, 128, 3)
    assert edge.shape == (2, 128, 3)


def test_rollout_mask_history():
    st = RolloutMaskState.create(1, 4, history=3)
    m1 = jnp.asarray([[0.7, 0.1, 0.65, 0.6]])
    mean, st = rollout_mask_update(st, m1)
    # clamp: >0.6 -> 0.6, <0.6 -> 0, ==0.6 stays
    np.testing.assert_allclose(np.asarray(mean)[0], [0.6, 0.0, 0.6, 0.6])
    m2 = jnp.zeros((1, 4))
    mean, st = rollout_mask_update(st, m2)
    np.testing.assert_allclose(np.asarray(mean)[0], [0.3, 0.0, 0.3, 0.3])
    # ring saturates at history
    for _ in range(5):
        mean, st = rollout_mask_update(st, m2)
    assert int(st.count) == 3
    np.testing.assert_allclose(np.asarray(mean)[0], 0.0)


def test_rollout_mask_history_valid_tracking():
    """Ragged sequences: rows that were sentinel padding in an earlier
    frame must not pollute the keep/prune gate once a larger frame makes
    them real (ADVICE round 3)."""
    st = RolloutMaskState.create(1, 4, history=3, track_valid=True)
    # frame 1: rows 0-1 real (mask 0.6); rows 2-3 are padding whose network
    # mask came out below the clamp threshold (writes 0 without tracking)
    m1 = jnp.asarray([[0.6, 0.6, 0.1, 0.1]])
    v1 = jnp.asarray([[True, True, False, False]])
    mean, st = rollout_mask_update(st, m1, v1)
    np.testing.assert_allclose(np.asarray(mean)[0], [0.6, 0.6, 0.0, 0.0])
    # frame 2: all rows real with mask 0.6 — rows 2-3 must read 0.6 (their
    # only real observation), not (0 + 0.6)/2 = 0.3
    m2 = jnp.full((1, 4), 0.6)
    v2 = jnp.ones((1, 4), bool)
    mean, st = rollout_mask_update(st, m2, v2)
    np.testing.assert_allclose(np.asarray(mean)[0], [0.6, 0.6, 0.6, 0.6])


def test_rollout_mask_history_valid_tracking_uniform_bitwise():
    """For uniform (all-valid) sequences the tracked ring matches the
    plain ring bitwise — serving paths may enable tracking unconditionally."""
    st_a = RolloutMaskState.create(1, 5, history=3)
    st_b = RolloutMaskState.create(1, 5, history=3, track_valid=True)
    rng = np.random.default_rng(0)
    for _ in range(7):
        m = jnp.asarray(rng.random((1, 5)), jnp.float32)
        mean_a, st_a = rollout_mask_update(st_a, m)
        mean_b, st_b = rollout_mask_update(st_b, m)
        np.testing.assert_array_equal(np.asarray(mean_a), np.asarray(mean_b))


@pytest.mark.parametrize("cls,needs_seq", [
    (FluidSpatialDis, False),
    (ActionSpatialDis, False),
])
def test_spatial_discriminators(rng, cls, needs_seq):
    pos = _cloud(rng, 2, 320)
    model = cls()
    key = jax.random.PRNGKey(0)
    v = model.init({"params": key, "dropout": key}, pos, None, True)
    out, _ = model.apply(v, pos, None, True, mutable=["batch_stats"],
                         rngs={"dropout": key})
    assert out.shape == (2, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_fluid_tempo_dis_window(rng):
    seq = [_cloud(rng, 2, 320) for _ in range(3)]
    model = FluidTempoDis(3)
    key = jax.random.PRNGKey(0)
    v = model.init({"params": key, "dropout": key}, seq, 0.1, None, None, True)
    out, _ = model.apply(v, seq, 0.1, None, None, True,
                         mutable=["batch_stats"], rngs={"dropout": key})
    assert out.shape == (2, 1)


def test_fluid_tempo_dis_with_velocity_features(rng):
    seq = [_cloud(rng, 1, 320) for _ in range(3)]
    feats = [_cloud(rng, 1, 320) for _ in range(3)]
    model = FluidTempoDis(3)
    key = jax.random.PRNGKey(0)
    v = model.init({"params": key, "dropout": key}, seq, 0.1, feats, None, True)
    out, _ = model.apply(v, seq, 0.1, feats, None, True,
                         mutable=["batch_stats"], rngs={"dropout": key})
    assert out.shape == (1, 1)


def test_tempo_tower_stacked_fps_identity(rng, monkeypatch):
    """The temporal towers batch their per-frame FPS rounds into one
    stacked kernel call (_stacked_fps); selections must be bit-identical to
    per-frame FPS, so the tower output must match exactly."""
    import tpugan_tpu.models.discriminator as D

    seq = [_cloud(rng, 2, 320) for _ in range(3)]
    valid = [jnp.asarray(rng.random((2, 320)) > 0.2) for _ in range(3)]
    model = FluidTempoDis(3)
    key = jax.random.PRNGKey(0)
    v = model.init({"params": key, "dropout": key}, seq, 0.1, None, valid,
                   True)
    out_stacked, _ = model.apply(v, seq, 0.1, None, valid, True,
                                 mutable=["batch_stats"],
                                 rngs={"dropout": key})
    monkeypatch.setattr(
        D, "_stacked_fps", lambda sa, pos_lst, valid_lst: [None] * len(pos_lst)
    )
    out_plain, _ = model.apply(v, seq, 0.1, None, valid, True,
                               mutable=["batch_stats"],
                               rngs={"dropout": key})
    np.testing.assert_array_equal(np.asarray(out_stacked),
                                  np.asarray(out_plain))


def test_action_tempo_tower_stacked_fps_identity(rng, monkeypatch):
    """Same _stacked_fps bit-identity pin for the ACTION tempo tower and
    the cls-transfer path (ADVICE round 3: only the fluid tower was
    pinned, so a divergence in _ActionTempoTower's deferred sa2 loop
    would have gone unnoticed)."""
    import tpugan_tpu.models.discriminator as D

    seq = [_cloud(rng, 2, 320) for _ in range(3)]
    key = jax.random.PRNGKey(0)

    dis = ActionTempoDis(3)
    vd = dis.init({"params": key, "dropout": key}, seq, 2.0, None, True)
    cls = ActionCls(3)
    vc = cls.init({"params": key, "dropout": key}, seq, 2.0, True)

    def run_both():
        out_d, _ = dis.apply(vd, seq, 2.0, None, True,
                             mutable=["batch_stats"], rngs={"dropout": key})
        out_c, _ = cls.apply(vc, seq, 2.0, True,
                             mutable=["batch_stats"], rngs={"dropout": key})
        return np.asarray(out_d), np.asarray(out_c)

    stacked_d, stacked_c = run_both()
    monkeypatch.setattr(
        D, "_stacked_fps", lambda sa, pos_lst, valid_lst: [None] * len(pos_lst)
    )
    plain_d, plain_c = run_both()
    np.testing.assert_array_equal(stacked_d, plain_d)
    np.testing.assert_array_equal(stacked_c, plain_c)


def test_action_tempo_dis_and_cls_transfer(rng):
    seq = [_cloud(rng, 2, 320) for _ in range(3)]
    key = jax.random.PRNGKey(0)
    dis = ActionTempoDis(3)
    vd = dis.init({"params": key, "dropout": key}, seq, 2.0, None, True)
    out, _ = dis.apply(vd, seq, 2.0, None, True, mutable=["batch_stats"],
                       rngs={"dropout": key})
    assert out.shape == (2, 1)

    cls = ActionCls(3)
    vc = cls.init({"params": key, "dropout": key}, seq, 2.0, True)
    vc2 = transfer_feature_extractor(vc, vd)
    # sa towers must now match the discriminator's weights
    a = jax.tree_util.tree_leaves(vc2["params"]["tower"]["sa1"])
    b = jax.tree_util.tree_leaves(vd["params"]["tower"]["sa1"])
    assert all(np.allclose(x, y) for x, y in zip(a, b))
    logits, _ = cls.apply(vc2, seq, 2.0, True, mutable=["batch_stats"],
                          rngs={"dropout": key})
    assert logits.shape == (2, 20)


def test_mask_head_alive_at_init_all_seeds(rng):
    """The masking head must not initialize ReLU-dead (a dead head zeroes
    the masking-loss gradient and, through the hard gate, every upsampling
    gradient — permanent training collapse, observed on-device)."""
    pos = _cloud(rng, 1, 128)
    model = SRNet(in_feats=3, node_emb_dim=128, upsample_ratio=4)
    for seed in range(4):
        v = model.init(jax.random.PRNGKey(seed), pos, pos, False)
        _, mask, _, _ = model.apply(v, pos, pos, False)
        assert float(jnp.mean(mask > 0)) > 0.3, f"dead mask head at seed {seed}"


def test_srnet_static_graph_mode(rng):
    # Static-graph serving mode: one k=20 kNN shared by every layer instead
    # of the reference's per-layer feature-space rebuild. Same params apply;
    # predictions stay close to the dynamic forward (a serving
    # approximation, gated the same way in bench.py).
    from tpugan_tpu.ops.metrics import chamfer

    b, n, r = 1, 48, 4
    pos = _cloud(rng, b, n)
    dyn = SRNet(in_feats=3, node_emb_dim=32, upsample_ratio=r)
    sta = SRNet(in_feats=3, node_emb_dim=32, upsample_ratio=r,
                graph_mode="static")
    v = dyn.init(jax.random.PRNGKey(0), pos, pos, False)
    exp_a, mask_a, pad_a, val_a = dyn.apply(v, pos, pos, False)
    exp_b, mask_b, pad_b, val_b = sta.apply(v, pos, pos, False)
    assert exp_b.shape == exp_a.shape and val_b.shape == val_a.shape
    assert np.all(np.isfinite(np.asarray(exp_b)))
    cd = float(jnp.mean(chamfer(pad_a, pad_b, a_valid=val_a, b_valid=val_b)))
    scale = float(jnp.mean(jnp.sum(pos**2, -1)))
    assert cd / (exp_a.shape[1] * scale) < 5e-2

    # velocity-feature config (in_feats > 3) builds the shared graph from
    # pos, like the reference's pos-graph branch
    feat6 = jnp.concatenate([pos, 0.1 * pos], axis=-1)
    dyn6 = SRNet(in_feats=6, node_emb_dim=32, upsample_ratio=r)
    sta6 = SRNet(in_feats=6, node_emb_dim=32, upsample_ratio=r,
                 graph_mode="static")
    v6 = dyn6.init(jax.random.PRNGKey(0), feat6, pos, False)
    out6 = sta6.apply(v6, feat6, pos, False)
    assert out6[0].shape == (b, n * r, 3)


def test_nomask_srnet_static_graph_mode(rng):
    b, n, r = 1, 40, 4
    pos = _cloud(rng, b, n)
    dyn = NoMaskSRNet(in_feats=3, node_emb_dim=32, upsample_ratio=r)
    sta = NoMaskSRNet(in_feats=3, node_emb_dim=32, upsample_ratio=r,
                      graph_mode="static")
    v = dyn.init(jax.random.PRNGKey(0), pos, pos, False)
    out_d, _ = dyn.apply(v, pos, pos, False)
    out_s, _ = sta.apply(v, pos, pos, False)
    assert out_s.shape == out_d.shape
    assert np.all(np.isfinite(np.asarray(out_s)))
