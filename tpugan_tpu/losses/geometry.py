"""Geometric losses on masked point batches (reference loss.py).

All losses accept optional validity masks so they operate directly on the
hard-masked (999-sentinel) padded clouds the generator emits.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpugan_tpu.ops.metrics import chamfer, masking_target
from tpugan_tpu.ops.neighbors import radius_mask_knn


def chamfer_distance_loss(
    a: jnp.ndarray,
    b: jnp.ndarray,
    a_valid: Optional[jnp.ndarray] = None,
    b_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Bidirectional summed Chamfer distance, batch-mean scalar (reference
    loss.py:121-128; chamferdist sum convention)."""
    return jnp.mean(chamfer(a, b, a_valid, b_valid, bidirectional=True))


def masking_loss(
    pos_gt: jnp.ndarray,
    pos_input: jnp.ndarray,
    binary_mask: jnp.ndarray,
    particle_radius: float,
    gt_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """L1 between the predicted keep-probabilities and the density-derived
    target (reference loss.py:253-275)."""
    target = masking_target(pos_gt, pos_input, particle_radius, gt_valid)
    return jnp.mean(jnp.abs(binary_mask - target))


def tpugan_sr_loss(
    w1: float,
    gt_pos: jnp.ndarray,
    pred_pos: jnp.ndarray,
    input_pos: Optional[jnp.ndarray],
    mask: Optional[jnp.ndarray],
    particle_radius: float,
    n_iter: jnp.ndarray,
    pred_valid: Optional[jnp.ndarray] = None,
    gt_valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Chamfer + w1 * masking loss (reference loss.py:168-183).

    Matching the reference's warm-up behavior: for the first 10 iterations
    (or when w1 == 0) the masking loss is pinned at 1.0 — the value also
    gating the adversarial branch in the train step. Implemented with
    ``jnp.where`` on the traced ``n_iter`` so the step stays jittable.
    """
    cd = jnp.mean(chamfer(gt_pos, pred_pos, gt_valid, pred_valid))
    if w1 != 0 and mask is not None:
        ml_active = masking_loss(gt_pos, input_pos, mask, particle_radius,
                                 gt_valid)
        ml = jnp.where(n_iter > 10, ml_active, 1.0)
    else:
        ml = jnp.asarray(1.0)
    return cd + w1 * ml, cd, ml


def _self_neighbor_sq_distances(
    pos: jnp.ndarray, k: int, radius: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared helper: k nearest self-neighbors with an in-radius flag, with
    degenerate (self / coincident) pairs flagged out like the reference's
    ``distance < 1e-9`` masks."""
    d2, _, in_range = radius_mask_knn(pos, pos, k=k, radius=radius)
    ok = in_range & (d2 > 1e-9)
    return d2, ok


def repulsion_loss(
    pred_pos: jnp.ndarray, h: float, furthest_distance: float = 1.0
) -> jnp.ndarray:
    """Penalize clumping: ((min(d, 3.1h) - h)^2 / h^2 summed over <=8
    neighbors within 1.1h (reference loss.py:139-155)."""
    h = h / furthest_distance
    if pred_pos.ndim == 2:
        pred_pos = pred_pos[None]
    d2, ok = _self_neighbor_sq_distances(pred_pos, k=8, radius=1.1 * h)
    d = jnp.sqrt(jnp.maximum(d2, 1e-20))
    smeared = (jnp.minimum(d, 3.1 * h) - h) ** 2 / (h * h)
    smeared = jnp.where(ok, smeared, 0.0)
    return jnp.mean(jnp.sum(smeared, axis=-1))


def density_loss(pred_pos: jnp.ndarray, particle_radius: float) -> jnp.ndarray:
    """Penalize deviation of inter-particle spacing from the particle
    radius over <=8 neighbors within 1.5r (reference loss.py:228-243)."""
    if pred_pos.ndim == 2:
        pred_pos = pred_pos[None]
    d2, _, in_range = radius_mask_knn(
        pred_pos, pred_pos, k=8, radius=1.5 * particle_radius
    )
    ok = in_range & (d2 > 1e-8)  # reference masks distance < 1e-4 (=1e-8 sq)
    d = jnp.sqrt(jnp.maximum(d2, 1e-20))
    smeared = (d - particle_radius) ** 2 / (particle_radius ** 2)
    smeared = jnp.where(ok, smeared, 0.0)
    return jnp.mean(jnp.sum(smeared, axis=-1))


def density(pcd_pos: jnp.ndarray, h: float, k: int = 32) -> jnp.ndarray:
    """Per-particle density estimate sum(relu(cutoff/d - 1)) over <=32
    neighbors within 2.1h (reference loss.py:100-118). pcd_pos: [N, 3] ->
    [N, 1]."""
    cutoff = 2.1 * h
    d2, _, in_range = radius_mask_knn(
        pcd_pos[None], pcd_pos[None], k=k, radius=cutoff
    )
    d = jnp.sqrt(jnp.maximum(d2, 1e-20))
    ok = in_range & (d2 > 1e-8)
    contrib = jnp.where(ok, jnp.maximum(cutoff / d - 1.0, 0.0), 0.0)
    return jnp.sum(contrib, axis=-1)[0][:, None]


def refinement_loss(
    w: float,
    free_gt: jnp.ndarray,
    pos_pred: jnp.ndarray,
    particle_radius: float,
):
    """free_particle_loss + w * density_loss (reference loss.py:246-250)."""
    free = free_particle_loss(free_gt, pos_pred, particle_radius)
    dns = density_loss(pos_pred, particle_radius)
    return free + w * dns, free, dns


def dense_loss(pred_prob: jnp.ndarray, h: float,
               furthest_distance: float = 1.0) -> jnp.ndarray:
    """Mean absolute keep-probability mass scaled by 1/h (reference
    loss.py:131-136)."""
    h = h / furthest_distance
    return jnp.mean(jnp.sum(jnp.abs(pred_prob), axis=1)) / h


def edge_uniform_loss(edge: jnp.ndarray, cutoff: float) -> jnp.ndarray:
    """Penalize offset vectors longer than 4*cutoff (reference
    loss.py:157-165); averaged over violating offsets only."""
    edge_norm2 = jnp.sum(edge ** 2, axis=-1)
    target = 4.0 * cutoff + 1e-6
    excess = (edge_norm2 - target ** 2) / target ** 2
    viol = edge_norm2 > target ** 2
    count = jnp.sum(viol)
    total = jnp.sum(jnp.where(viol, excess, 0.0))
    return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)


def temporal_loss(
    advect_right: jnp.ndarray,
    advect_left: jnp.ndarray,
    upsample_right: jnp.ndarray,
    upsample_left: jnp.ndarray,
) -> jnp.ndarray:
    """Mean of Chamfer(advected, upsampled) over the two neighbor frames
    (reference loss.py:278-283)."""
    d1 = jnp.mean(chamfer(advect_left, upsample_left))
    d2 = jnp.mean(chamfer(advect_right, upsample_right))
    return 0.5 * d1 + 0.5 * d2


def free_particle_loss(
    free_gt: jnp.ndarray,
    pos_pred: jnp.ndarray,
    particle_radius: float = 0.0,
    free_valid: Optional[jnp.ndarray] = None,
    pred_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Chamfer between ground-truth free-surface particles and the
    prediction (reference loss.py:217-225)."""
    return jnp.mean(chamfer(free_gt, pos_pred, free_valid, pred_valid))


def earth_mover_distance_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    eps: float = 0.05,
    iters: int = 100,
) -> jnp.ndarray:
    """Normalized auction-EMD loss (reference loss.py:294-316): clouds are
    jointly shifted/scaled for the assignment solve; the loss is the sum of
    unscaled matched distances with gradients through coordinates only."""
    squeeze = pred.ndim == 2
    if squeeze:
        pred, target = pred[None], target[None]
    m1 = jnp.min(pred, axis=1, keepdims=True)
    m2 = jnp.min(target, axis=1, keepdims=True)
    m = jnp.minimum(m1, m2)
    p, t = pred - m, target - m
    h1 = jnp.max(jnp.linalg.norm(p, axis=-1), axis=1)
    h2 = jnp.max(jnp.linalg.norm(t, axis=-1), axis=1)
    h = jnp.maximum(h1, h2)[:, None, None]
    from tpugan_tpu.ops.metrics import auction_assignment

    assign = jax.lax.stop_gradient(
        auction_assignment(p / h, t / h, eps=eps, iters=iters)
    )
    matched = jnp.take_along_axis(target, assign[..., None], axis=1)
    d = jnp.sqrt(jnp.maximum(jnp.sum((pred - matched) ** 2, axis=-1), 1e-20))
    out = jnp.sum(d, axis=-1)
    return out[0] if squeeze else out
