"""LSGAN objectives with label smoothing and random flipping.

Reference semantics: train_step_final.py:85-90 (smoothed labels
valid ~ U(0.8, 1.2), invalid ~ U(0.0, 0.2), flipped with p=0.03) and
loss.py:286-291 (squared-error LSGAN terms). The reference draws these from
global numpy RNG; here they come from explicit jax.random keys so the whole
train step stays jittable and reproducible.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def lsgan_labels(key: jax.Array, flip_p: float = 0.03) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Draw (valid, invalid) smoothed labels, occasionally swapped."""
    k1, k2, k3 = jax.random.split(key, 3)
    valid = jax.random.uniform(k1, (), minval=0.8, maxval=1.2)
    invalid = jax.random.uniform(k2, (), minval=0.0, maxval=0.2)
    flip = jax.random.uniform(k3, ()) < flip_p
    return (
        jnp.where(flip, invalid, valid),
        jnp.where(flip, valid, invalid),
    )


def lsgan_generator_loss(fake_score: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """0.5 (D(fake) - target)^2, batch mean (reference
    train_step_final.py:121-122,152-153)."""
    return jnp.mean(0.5 * (fake_score - target) ** 2)


def lsgan_discriminator_loss(
    true_score: jnp.ndarray,
    fake_score: jnp.ndarray,
    valid: jnp.ndarray,
    invalid: jnp.ndarray,
) -> jnp.ndarray:
    """0.5 [(D(real) - valid)^2 + (D(fake) - invalid)^2], batch mean
    (reference train_step_final.py:185-186)."""
    return jnp.mean(0.5 * ((true_score - valid) ** 2 + (fake_score - invalid) ** 2))
