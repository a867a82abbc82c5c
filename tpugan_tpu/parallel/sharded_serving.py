"""Point-axis sharded generator serving — upsample ONE big frame across the
device mesh.

The reference caps single-frame size by host-side patching (SURVEY.md §5,
tempo_dataset.py patch protocol); the TPU-native scale-out path instead
shards the point axis of one frame over the mesh and runs the *unmodified*
generator under the ``point_shard_axis`` context (ops/neighbors.py): every
conv/expansion/mask op is pointwise and stays local, while the graph builds
all-gather their candidate side over ICI. Per EdgeConv layer that is one
[B, N, C] feature all-gather (25 MB at N=100k, C=128 bf16) against
O(N^2 * C / devices) of MXU distance work kept on-chip — compute scales,
communication stays flat.

Exactness: each device sees the identical full candidate set per graph
build, so outputs equal the single-device rollout step bit-for-bit
(tests/test_sharded_serving.py pins this on the 8-device CPU mesh).

Product surface: ``cli/rollout.py --shard_points`` (big-frame rollout);
matches the inference product of train_fluid/demo.ipynb cell 3 /
upsampling_network.py:159-174 at frame sizes the reference cannot reach
unpatched.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpugan_tpu import PAD_SENTINEL
from tpugan_tpu.config import DT
from tpugan_tpu.models.generator import (
    RolloutMaskState,
    SRNet,
    expand_pos_with_masking,
    rollout_mask_update,
)
from tpugan_tpu.ops.neighbors import point_shard_axis
from tpugan_tpu.parallel.mesh import DATA_AXIS


def _state_specs(track_valid: bool, axis_name: str) -> RolloutMaskState:
    """PartitionSpec pytree for RolloutMaskState ([H, B, N] rings sharded on
    N; scalar count/ptr replicated)."""
    ring = P(None, None, axis_name)
    return RolloutMaskState(
        buffer=ring,
        count=P(),
        ptr=P(),
        valid_buffer=ring if track_valid else None,
    )


def make_sharded_rollout_step(
    model: SRNet,
    use_vel: bool,
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
    track_valid: bool = True,
):
    """Point-sharded twin of ``eval.rollout.make_rollout_step``.

    Returns jitted ``step(variables, mask_state, pos, vel, n_valid) ->
    (padded_pos, valid, new_state)`` where pos/vel are GLOBAL [1, N, 3]
    arrays with N divisible by the mesh size; rows past ``n_valid`` are
    alignment-padding sentinels. Semantics match the unsharded step row for
    row (centroid shift, heads, 25-frame mask ring, masked expansion,
    denormalize).
    """
    r = model.upsample_ratio

    def inner(variables, mask_state, pos, vel, n_valid):
        # local shapes: pos/vel [1, N/dev, 3]; ring [H, 1, N/dev]
        nloc = pos.shape[1]
        off = jax.lax.axis_index(axis_name) * nloc
        gidx = off + jnp.arange(nloc, dtype=jnp.int32)
        real = (gidx < n_valid)[None, :, None]                # [1, nloc, 1]
        local_sum = jnp.sum(jnp.where(real, pos, 0.0), axis=1, keepdims=True)
        centroid = (jax.lax.psum(local_sum, axis_name)
                    / n_valid.astype(pos.dtype))              # [1, 1, 3]
        pos_n = jnp.where(real, pos - centroid, pos)
        if use_vel:
            feature = jnp.concatenate([pos_n, vel * DT], axis=-1)
        else:
            feature = pos_n
        with point_shard_axis(axis_name):
            edge, mask = model.apply(variables, feature, pos_n, False,
                                     method=model.heads)
        mean_mask, mask_state = rollout_mask_update(mask_state, mask,
                                                    valid=real[..., 0])
        _, padded, valid = expand_pos_with_masking(
            pos_n, edge, mean_mask, r, model.epsilon
        )
        # expansion layout: local slot i*r+j is copy j of local point i, so
        # its GLOBAL slot is off*r + i*r + j — pad rows are exactly the
        # global slots >= n_valid * r
        gslot = off * r + jnp.arange(nloc * r, dtype=jnp.int32)
        valid = valid & (gslot[None] < n_valid * r)
        out = jnp.where(valid[..., None], padded + centroid, padded)
        return out, valid, mask_state

    pt = P(None, axis_name, None)
    st = _state_specs(track_valid, axis_name)
    shard = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), st, pt, pt, P()),
        out_specs=(pt, P(None, axis_name), st),
        # Pallas kernels inside the body can't annotate vma on their
        # out_shapes; skip the varying-mesh-axes check
        check_vma=False,
    )
    return jax.jit(shard)


def rollout_sequence_sharded(
    model: SRNet,
    variables,
    pos_seq: np.ndarray,                     # [T, N, 3]
    vel_seq: Optional[np.ndarray] = None,    # [T, N, 3]
    mesh: Optional[Mesh] = None,
    use_vel: bool = False,
    history: int = 25,
    axis_name: str = DATA_AXIS,
    max_pending: int = 4,
) -> List[np.ndarray]:
    """Point-sharded rollout over a uniform-N frame sequence.

    Frames are sentinel-padded so each device's shard is a multiple of the
    Pallas tile alignment (256; eval/rollout.py ALIGN), then each frame runs
    one sharded step; the mask ring stays sharded on device between frames.
    Returns valid points per frame, world space, like
    ``eval.rollout.rollout_sequence_device``.

    ``max_pending`` bounds the async D2H queue: frame f+1..f+max_pending may
    be dispatched before frame f's outputs are materialized on the host, so
    transfers overlap compute; 0 forces a serial dispatch-fetch-dispatch
    loop (the pipelined and serial paths are output-identical —
    tests/test_sharded_serving.py).
    """
    from tpugan_tpu.eval.rollout import ALIGN, _MAX_GRAPH_K
    from tpugan_tpu.parallel.mesh import make_mesh

    if mesh is None:
        mesh = make_mesh()
    ndev = mesh.shape[axis_name]
    t, n, _ = pos_seq.shape
    if n <= _MAX_GRAPH_K:
        raise ValueError(
            f"frame with {n} points <= the generator's max graph k "
            f"({_MAX_GRAPH_K}); sharded rollout targets big frames")
    if vel_seq is None:
        vel_seq = np.zeros_like(pos_seq)
    unit = ALIGN * ndev
    n_pad = (-n) % unit
    if n_pad:
        pos_seq = np.concatenate(
            [pos_seq, np.full((t, n_pad, 3), PAD_SENTINEL, np.float32)],
            axis=1)
        vel_seq = np.concatenate(
            [vel_seq, np.zeros((t, n_pad, 3), np.float32)], axis=1)

    step = make_sharded_rollout_step(model, use_vel, mesh,
                                     axis_name=axis_name)
    state_sh = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        _state_specs(True, axis_name),
        is_leaf=lambda x: isinstance(x, P),
    )
    mask_state = jax.tree_util.tree_map(
        jax.device_put,
        RolloutMaskState.create(1, n + n_pad, history, track_valid=True),
        state_sh,
    )
    pt = NamedSharding(mesh, P(None, axis_name, None))
    n_valid = jnp.int32(n)

    outputs: List[np.ndarray] = []
    pending: List = []

    def drain(keep: int):
        while len(pending) > keep:
            padded, valid = pending.pop(0)
            padded, valid = np.asarray(padded), np.asarray(valid)
            outputs.append(padded[0][valid[0]])

    for f in range(t):
        pos_b = jax.device_put(jnp.asarray(pos_seq[f], jnp.float32)[None], pt)
        vel_b = jax.device_put(jnp.asarray(vel_seq[f], jnp.float32)[None], pt)
        padded, valid, mask_state = step(variables, mask_state, pos_b, vel_b,
                                         n_valid)
        for arr in (padded, valid):
            try:
                arr.copy_to_host_async()
            except AttributeError:
                pass
        pending.append((padded, valid))
        drain(max_pending)
    drain(0)
    return outputs
