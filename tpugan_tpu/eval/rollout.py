"""Sequence rollout inference — the reference's inference product
(train_fluid/demo.ipynb cell 3; SURVEY.md §3.3).

Per frame: normalize (centroid shift), build input features (pos or
pos || vel * DT), run the SRNet heads, clamp the mask and average it over a
25-frame history ring (reference upsampling_network.py:159-174), expand with
hard masking, and denormalize. The per-frame step is one jitted function
carrying the fixed-shape RolloutMaskState, so an 800-frame rollout is 800
dispatches of a single compiled program — no recompilation, no host sync
except the final fetches.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpugan_tpu.config import DT
from tpugan_tpu.models.generator import (
    RolloutMaskState,
    SRNet,
    expand_pos_with_masking,
    rollout_mask_update,
)


def make_rollout_step(model: SRNet, use_vel: bool):
    """Returns jitted step(variables, state, pos, vel) ->
    (padded_pos, valid, new_state)."""

    def step(variables, mask_state, pos, vel):
        centroid = jnp.mean(pos, axis=1, keepdims=True)
        pos_n = pos - centroid
        if use_vel:
            feature = jnp.concatenate([pos_n, vel * DT], axis=-1)
        else:
            feature = pos_n
        edge, mask = model.apply(variables, feature, pos_n, False,
                                 method=model.heads)
        mean_mask, mask_state = rollout_mask_update(mask_state, mask)
        _, padded, valid = expand_pos_with_masking(
            pos_n, edge, mean_mask, model.upsample_ratio, model.epsilon
        )
        out = jnp.where(valid[..., None], padded + centroid, padded)
        return out, valid, mask_state

    return jax.jit(step)


def rollout_sequence(
    model: SRNet,
    variables,
    frames: Iterable[Tuple[np.ndarray, Optional[np.ndarray]]],
    use_vel: bool = False,
    history: int = 25,
    max_pending: int = 16,
) -> List[np.ndarray]:
    """Upsample a sequence of (pos [N,3], vel [N,3] or None) frames.

    The device pipeline is kept full: up to ``max_pending`` frame steps are
    enqueued ahead of the device->host fetches (the per-frame fetch would
    otherwise serialize the rollout; jax dispatch is async, and the mask
    ring-buffer state lives on device between steps).

    Returns a list of variable-size numpy arrays (valid points only),
    denormalized back to world space like the demo loop.
    """
    step = make_rollout_step(model, use_vel)
    mask_state = None
    pending: List[Tuple] = []
    outputs: List[Tuple[np.ndarray, np.ndarray]] = []

    def drain(n: int):
        while len(pending) > n:
            padded, valid = pending.pop(0)
            outputs.append((np.asarray(padded)[0], np.asarray(valid)[0]))

    for pos, vel in frames:
        pos_b = jnp.asarray(pos, jnp.float32)[None]
        vel_b = (
            jnp.asarray(vel, jnp.float32)[None]
            if vel is not None
            else jnp.zeros_like(pos_b)
        )
        if mask_state is None:
            mask_state = RolloutMaskState.create(1, pos_b.shape[1], history)
        padded, valid, mask_state = step(variables, mask_state, pos_b, vel_b)
        # start the D2H copies immediately so they overlap later frames'
        # compute; the blocking np.asarray in drain() then finds the bytes
        # already on host instead of serializing a fetch per frame
        for arr in (padded, valid):
            try:
                arr.copy_to_host_async()
            except AttributeError:
                pass
        pending.append((padded, valid))
        drain(max_pending)
    drain(0)
    return [p[v] for p, v in outputs]
