"""Tests for the loss zoo (reference loss.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpugan_tpu.losses import (
    chamfer_distance_loss,
    density_loss,
    edge_uniform_loss,
    lsgan_discriminator_loss,
    lsgan_generator_loss,
    lsgan_labels,
    masking_loss,
    repulsion_loss,
    temporal_loss,
    tpugan_sr_loss,
    earth_mover_distance_loss,
)


def test_tpugan_sr_loss_warmup_pins_masking(rng):
    gt = jnp.asarray(rng.standard_normal((1, 64, 3)).astype(np.float32))
    pred = jnp.asarray(rng.standard_normal((1, 128, 3)).astype(np.float32))
    inp = jnp.asarray(rng.standard_normal((1, 16, 3)).astype(np.float32))
    mask = jnp.ones((1, 16)) * 0.5
    # n_iter <= 10: masking loss pinned at 1.0
    loss, cd, ml = tpugan_sr_loss(100.0, gt, pred, inp, mask, 0.05,
                                  jnp.asarray(5))
    assert float(ml) == 1.0
    np.testing.assert_allclose(float(loss), float(cd) + 100.0, rtol=1e-5)
    # later iters: real masking loss
    _, _, ml2 = tpugan_sr_loss(100.0, gt, pred, inp, mask, 0.05,
                               jnp.asarray(50))
    assert float(ml2) != 1.0
    # w1 = 0 disables the masking branch entirely
    loss0, cd0, ml0 = tpugan_sr_loss(0, gt, pred, None, None, 0.0,
                                     jnp.asarray(50))
    assert float(ml0) == 1.0
    np.testing.assert_allclose(float(loss0), float(cd0), rtol=1e-6)


def test_masking_loss_perfect_mask_is_zero(rng):
    # dense gt blob; inputs on the blob with mask 1 -> L1 == 0
    gt = jnp.asarray((rng.standard_normal((1, 64, 3)) * 0.01).astype(np.float32))
    inp = gt[:, :8]
    ml = masking_loss(gt, inp, jnp.ones((1, 8)), 0.1)
    np.testing.assert_allclose(float(ml), 0.0, atol=1e-6)
    ml_bad = masking_loss(gt, inp, jnp.zeros((1, 8)), 0.1)
    np.testing.assert_allclose(float(ml_bad), 1.0, atol=1e-6)


def test_repulsion_loss_prefers_spread(rng):
    h = 0.1
    clumped = jnp.asarray((rng.standard_normal((64, 3)) * 0.01).astype(np.float32))
    spread = jnp.asarray((rng.standard_normal((64, 3)) * 10.0).astype(np.float32))
    assert float(repulsion_loss(clumped, h)) > float(repulsion_loss(spread, h))


def test_density_loss_zero_at_exact_spacing():
    # two points exactly particle_radius apart (within 1.5r ball)
    pr = 0.1
    pos = jnp.asarray([[[0, 0, 0], [pr, 0, 0]]], jnp.float32)
    np.testing.assert_allclose(float(density_loss(pos, pr)), 0.0, atol=1e-8)
    pos2 = jnp.asarray([[[0, 0, 0], [pr / 2, 0, 0]]], jnp.float32)
    assert float(density_loss(pos2, pr)) > 0.01


def test_edge_uniform_loss():
    cutoff = 0.025
    small = jnp.ones((1, 8, 3)) * cutoff  # |e| ~ 0.043 < 4*cutoff
    np.testing.assert_allclose(float(edge_uniform_loss(small, cutoff)), 0.0)
    big = jnp.ones((1, 8, 3)) * cutoff * 10  # |e| ~ 0.43 > 0.1
    assert float(edge_uniform_loss(big, cutoff)) > 0


def test_temporal_loss_zero_for_matching(rng):
    a = jnp.asarray(rng.standard_normal((1, 32, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((1, 32, 3)).astype(np.float32))
    np.testing.assert_allclose(float(temporal_loss(a, b, a, b)), 0.0, atol=1e-5)
    assert float(temporal_loss(a, b, b, a)) > 0


def test_lsgan_labels_and_losses():
    key = jax.random.PRNGKey(3)
    valid, invalid = lsgan_labels(key)
    v, i = float(valid), float(invalid)
    # either normal or flipped ranges
    assert (0.8 <= v <= 1.2 and 0.0 <= i <= 0.2) or (
        0.0 <= v <= 0.2 and 0.8 <= i <= 1.2
    )
    # flip happens with p=0.03: over many keys, a few flips
    flips = 0
    for s in range(200):
        vv, ii = lsgan_labels(jax.random.PRNGKey(s))
        flips += float(vv) < float(ii)
    assert 0 < flips < 30

    fake = jnp.asarray([[1.0], [1.0]])
    np.testing.assert_allclose(
        float(lsgan_generator_loss(fake, jnp.asarray(1.0))), 0.0
    )
    true = jnp.asarray([[1.0], [1.0]])
    np.testing.assert_allclose(
        float(lsgan_discriminator_loss(true, fake * 0, jnp.asarray(1.0),
                                       jnp.asarray(0.0))), 0.0
    )


def test_chamfer_loss_grad_finite(rng):
    gt = jnp.asarray(rng.standard_normal((1, 32, 3)).astype(np.float32))

    def f(pred):
        return chamfer_distance_loss(gt, pred)

    g = jax.grad(f)(gt + 0.1)
    assert np.all(np.isfinite(np.asarray(g)))


def test_emd_loss_grad_and_value(rng):
    x = jnp.asarray(rng.standard_normal((32, 3)).astype(np.float32))
    y = x + 0.01

    def f(p):
        return earth_mover_distance_loss(p, y, eps=0.02, iters=200)

    val, g = jax.value_and_grad(f)(x)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(g)))
    # identical clouds under identity assignment -> ~0.01*32 total distance
    assert float(val) < 32 * 0.05
