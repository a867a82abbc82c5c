"""Tests for rollout inference and the analysis metrics."""

import jax
import jax.numpy as jnp
import numpy as np

from tpugan_tpu.eval.analysis import (
    cycle_consistency,
    free_surface_particle_count_diff,
    get_particle_density,
    position_metrics,
)
from tpugan_tpu.eval.rollout import rollout_sequence, rollout_sequence_device
from tpugan_tpu.models import SRNet


def test_rollout_sequence_shapes_and_mask_context(rng):
    n, r = 64, 4
    model = SRNet(in_feats=3, node_emb_dim=32, upsample_ratio=r)
    pos0 = jnp.asarray(rng.standard_normal((1, n, 3)).astype(np.float32) * 0.3)
    variables = model.init(jax.random.PRNGKey(0), pos0, pos0, False)

    frames = [
        (rng.standard_normal((n, 3)).astype(np.float32) * 0.3, None)
        for _ in range(4)
    ]
    outs = rollout_sequence(model, variables, frames)
    assert len(outs) == 4
    for o in outs:
        assert o.ndim == 2 and o.shape[1] == 3
        assert n <= o.shape[0] <= n * r  # hard mask keeps >= copy-0 of each
        assert np.all(np.isfinite(o))
        assert np.all(np.abs(o) < 100)  # no sentinel leakage


def test_rollout_sequence_device_matches_host(rng):
    # The chunked device-resident lax.scan rollout must produce exactly the
    # per-frame host loop's outputs (same mask-history ring semantics),
    # including across a chunk boundary and tail padding.
    n, r, t = 64, 4, 5
    model = SRNet(in_feats=6, node_emb_dim=32, upsample_ratio=r)
    pos0 = jnp.asarray(rng.standard_normal((1, n, 3)).astype(np.float32) * 0.3)
    feat0 = jnp.concatenate([pos0, jnp.zeros_like(pos0)], axis=-1)
    variables = model.init(jax.random.PRNGKey(0), feat0, pos0, False)

    frames = [
        (rng.standard_normal((n, 3)).astype(np.float32) * 0.3,
         rng.standard_normal((n, 3)).astype(np.float32))
        for _ in range(t)
    ]
    host = rollout_sequence(model, variables, frames, use_vel=True,
                            history=3)
    pos_seq = np.stack([p for p, _ in frames])
    vel_seq = np.stack([v for _, v in frames])
    dev = rollout_sequence_device(model, variables, pos_seq, vel_seq,
                                  use_vel=True, history=3, chunk=2)
    assert len(dev) == len(host) == t
    for a, b in zip(host, dev):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_rollout_alignment_padding_is_transparent(rng, monkeypatch):
    # Sentinel alignment padding (ALIGN-bucket) must not perturb real
    # points' outputs: the network is neighborhood-local and the 999
    # sentinels are never feature-space neighbors of real points.
    import tpugan_tpu.eval.rollout as rollout_mod

    n, r, t = 48, 4, 3
    model = SRNet(in_feats=3, node_emb_dim=32, upsample_ratio=r)
    pos0 = jnp.asarray(rng.standard_normal((1, n, 3)).astype(np.float32) * 0.3)
    variables = model.init(jax.random.PRNGKey(0), pos0, pos0, False)
    frames = [
        (rng.standard_normal((n, 3)).astype(np.float32) * 0.3, None)
        for _ in range(t)
    ]

    padded = rollout_sequence(model, variables, frames)      # bucket = 256
    monkeypatch.setattr(rollout_mod, "ALIGN", 1)             # bucket = n
    exact = rollout_sequence(model, variables, frames)
    assert len(padded) == len(exact) == t
    for a, b in zip(exact, padded):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_rollout_ragged_frames_within_bucket(rng):
    # Frame point counts may vary under the first frame's bucket: one
    # compiled program serves all of them (n_valid is a traced scalar).
    n0, r = 40, 4
    model = SRNet(in_feats=3, node_emb_dim=32, upsample_ratio=r)
    pos0 = jnp.asarray(
        rng.standard_normal((1, n0, 3)).astype(np.float32) * 0.3)
    variables = model.init(jax.random.PRNGKey(0), pos0, pos0, False)
    counts = [40, 36, 44]
    frames = [
        (rng.standard_normal((c, 3)).astype(np.float32) * 0.3, None)
        for c in counts
    ]
    outs = rollout_sequence(model, variables, frames)
    assert len(outs) == len(counts)
    for c, o in zip(counts, outs):
        assert c <= o.shape[0] <= c * r
        assert np.all(np.abs(o) < 100)  # no sentinel leakage


def test_position_metrics_identical_clouds(rng):
    x = rng.standard_normal((256, 3)).astype(np.float32)
    cd, emd, mmd = position_metrics(jnp.asarray(x), jnp.asarray(x),
                                    emd_iters=50)
    assert cd < 1e-6
    assert emd < 0.05
    assert abs(mmd) < 1e-4


def test_cycle_consistency_exact_for_constant_advection(rng):
    """With a generator that reproduces its input exactly (r=1 identity) and
    a constant advection field, upsample-then-advect equals
    advect-then-upsample, so all three metrics ~ 0."""
    n = 128
    left = rng.standard_normal((1, n, 3)).astype(np.float32) * 0.3
    adv = np.tile(np.array([[0.05, -0.02, 0.01]], np.float32), (n, 1))[None]
    right = left + adv

    def sr_apply(feature, pos):
        return jnp.asarray(pos)

    cd, emd, mmd = cycle_consistency(
        sr_apply,
        jnp.asarray(left), jnp.asarray(right),
        jnp.asarray(adv), jnp.asarray(left),
        cutoff=0.2, emd_iters=100,
    )
    assert cd < 1e-5
    assert emd < 0.1
    assert abs(mmd) < 1e-3


def test_get_particle_density_bulk_exceeds_surface(rng):
    g = np.linspace(0, 1, 10)
    cube = np.stack(np.meshgrid(g, g, g), -1).reshape(-1, 3).astype(np.float32)
    dns = get_particle_density(cube, cutoff=0.3)
    center_idx = np.argmin(np.sum((cube - 0.5) ** 2, -1))
    corner_idx = np.argmin(np.sum(cube ** 2, -1))
    assert dns[center_idx, 0] > dns[corner_idx, 0] * 1.5


def test_free_surface_count_diff_zero_for_same_cloud(rng):
    pos = rng.standard_normal((2000, 3)).astype(np.float32) * 0.2
    assert free_surface_particle_count_diff(pos, pos, radius=0.05) == 0


# ---------------------------------------------------------------------------
# exact action eval protocol (reference train_action/analysis_helper.py:46-83)

def test_action_position_metrics_constants(rng):
    from tpugan_tpu.eval.analysis import action_position_metrics
    from tpugan_tpu.ops.metrics import chamfer

    x = rng.standard_normal((512, 3)).astype(np.float32)
    shift = np.array([0.05, 0.0, 0.0], np.float32)
    y = x + shift

    cd, emd = action_position_metrics(jnp.asarray(x), jnp.asarray(y),
                                      emd_iters=200)
    # CD is the bidirectional summed Chamfer divided by the CONSTANT 2048
    # even though the clouds have 512 points
    expected_cd = float(chamfer(jnp.asarray(x)[None], jnp.asarray(y)[None])[0]) / 2048.0
    assert np.isclose(cd, expected_cd, rtol=1e-5)
    # a pure translation has an obvious optimal transport: every point to its
    # translate, so EMD == |shift|; the /2-then-x2 scaling must cancel exactly
    assert np.isclose(emd, np.linalg.norm(shift), rtol=1e-2)


def test_action_position_metrics_identical(rng):
    from tpugan_tpu.eval.analysis import action_position_metrics

    x = rng.standard_normal((256, 3)).astype(np.float32)
    cd, emd = action_position_metrics(jnp.asarray(x), jnp.asarray(x),
                                      emd_iters=50)
    assert cd < 1e-6
    assert emd < 1e-2


def test_pad_clip_with_appropriate_size(rng):
    from tpugan_tpu.eval.analysis import pad_clip_with_appropriate_size

    big = rng.standard_normal((3000, 3)).astype(np.float32)
    small = rng.standard_normal((700, 3)).astype(np.float32)
    clip = pad_clip_with_appropriate_size([big, small], num_points=2048,
                                          rng=np.random.default_rng(0))
    assert clip.shape == (2, 2048, 3)
    # pc_normalize: centered and max-norm == 1 per frame
    for f in range(2):
        assert np.allclose(clip[f].mean(0), 0.0, atol=1e-5)
        assert np.isclose(np.linalg.norm(clip[f], axis=1).max(), 1.0, rtol=1e-5)
    assert np.all(np.isfinite(clip))


def test_position_metrics_masked_cd_full_cloud(rng):
    """The masked CD must equal the compact-cloud CD (dropped tail points
    still count), and EMD must be computed on the valid prefix only."""
    from tpugan_tpu.data.sampling import pad_with_appropriate_size

    pred = rng.standard_normal((900, 3)).astype(np.float32)
    gt = rng.standard_normal((1100, 3)).astype(np.float32)

    cd_ref, emd_ref, mmd_ref = position_metrics(
        jnp.asarray(pred), jnp.asarray(gt), emd_iters=50)

    padded, valid = pad_with_appropriate_size(pred)
    assert padded.shape[0] == 1024 and valid.sum() == 900
    cd_m, emd_m, mmd_m = position_metrics(
        jnp.asarray(padded), jnp.asarray(gt), emd_iters=50,
        pred_valid=jnp.asarray(valid))
    assert np.isclose(cd_m, cd_ref, rtol=1e-5)
    assert np.isclose(emd_m, emd_ref, rtol=1e-4)
    assert np.isclose(mmd_m, mmd_ref, rtol=1e-4)


def test_dense_density_matches_bruteforce_oracle(rng):
    # The uncapped (binned-kernel) density vs a numpy all-pairs oracle on
    # a cloud dense enough that the K=64-capped kNN form would clip.
    from tpugan_tpu.eval.analysis import get_particle_density

    pos = rng.uniform(-0.2, 0.2, (500, 3)).astype(np.float32)
    cutoff = 0.25  # most particles have >64 in-radius neighbors
    d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
    q = d / cutoff
    ker = np.where(q <= 0.5, 6.0 * (q ** 3 - q ** 2) + 1.0,
                   np.where(q <= 1.0, 2.0 * (1.0 - q) ** 3, 0.0))
    want = ker.sum(1)[:, None]
    got = get_particle_density(pos, cutoff, dense=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # and the capped form agrees on a sparse cloud
    sparse = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
    a = get_particle_density(sparse, 0.15, dense=True)
    b = get_particle_density(sparse, 0.15, dense=False)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
