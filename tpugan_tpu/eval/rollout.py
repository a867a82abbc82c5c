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

from tpugan_tpu import PAD_SENTINEL
from tpugan_tpu.config import DT
from tpugan_tpu.models.generator import (
    RolloutMaskState,
    SRNet,
    expand_pos_with_masking,
    rollout_mask_update,
)

# Pad input clouds up to a multiple of this before the forward: the fused
# EdgeConv/kNN Pallas kernels tile on 256-point boundaries, and a single
# off-by-one N (e.g. 10239) doubles the frame time on padded slow paths
# (BENCH_NOTES.md 2026-08-18). Pad points sit at the 999 sentinel, far
# outside any normalized fluid cloud, so exact (and bf16) kNN never selects
# them as neighbors of real points — the network is purely neighborhood-
# local (no global pooling), hence real outputs are bitwise unaffected.
ALIGN = 256

# Largest kNN-graph k used anywhere in the generator (EdgeConv k=20,
# upsampler EdgeConvs k=12/k=4; models/generator.py) — frames with fewer
# real points than this cannot be alignment-padded without sentinel
# neighbors leaking into real points' edge features.
_MAX_GRAPH_K = 20


def make_rollout_step(model: SRNet, use_vel: bool):
    """Returns jitted step(variables, state, pos, vel, n_valid) ->
    (padded_pos, valid, new_state). ``pos``/``vel`` may carry sentinel pad
    rows past ``n_valid`` (alignment padding); their output slots are
    reported invalid."""

    def step(variables, mask_state, pos, vel, n_valid):
        n = pos.shape[1]
        real = (jnp.arange(n) < n_valid)[None, :, None]       # [1, N, 1]
        centroid = (jnp.sum(jnp.where(real, pos, 0.0), axis=1, keepdims=True)
                    / n_valid.astype(pos.dtype))
        pos_n = jnp.where(real, pos - centroid, pos)
        if use_vel:
            feature = jnp.concatenate([pos_n, vel * DT], axis=-1)
        else:
            feature = pos_n
        edge, mask = model.apply(variables, feature, pos_n, False,
                                 method=model.heads)
        # ring write masked to REAL rows: a row that is padding now may
        # become real in a later (larger) frame, and its history must not
        # contain sentinel-derived mask values (ADVICE round 3)
        mean_mask, mask_state = rollout_mask_update(mask_state, mask,
                                                    valid=real[..., 0])
        _, padded, valid = expand_pos_with_masking(
            pos_n, edge, mean_mask, model.upsample_ratio, model.epsilon
        )
        # expansion layout: slots i*r .. i*r+r-1 belong to input point i,
        # so pad rows occupy exactly the slots >= n_valid * r
        valid = valid & (jnp.arange(valid.shape[1])[None]
                         < n_valid * model.upsample_ratio)
        out = jnp.where(valid[..., None], padded + centroid, padded)
        return out, valid, mask_state

    return jax.jit(step)


def _pad_frame(pos_b: jnp.ndarray, vel_b: jnp.ndarray, bucket: int):
    """Sentinel-pad a [1, N, 3] frame up to ``bucket`` points."""
    n = pos_b.shape[1]
    if n == bucket:
        return pos_b, vel_b
    pad = bucket - n
    pos_b = jnp.concatenate(
        [pos_b, jnp.full((1, pad, 3), PAD_SENTINEL, pos_b.dtype)], axis=1)
    vel_b = jnp.concatenate(
        [vel_b, jnp.zeros((1, pad, 3), vel_b.dtype)], axis=1)
    return pos_b, vel_b


def make_rollout_scan(model: SRNet, use_vel: bool, chunk: int,
                      n_real: Optional[int] = None):
    """Chunked device-resident rollout: one jitted lax.scan over ``chunk``
    frames. Frames stay on device between steps; the only host traffic is
    one H2D of the chunk's inputs and one D2H of its outputs.

    When ``n_real`` is given, rows past it are alignment-padding sentinels:
    the centroid uses only real rows and the emitted outputs/valids are
    statically sliced to the ``n_real * r`` real slots."""

    def scan_fn(variables, mask_state, pos_c, vel_c):
        # pos_c/vel_c: [chunk, N, 3]
        r = model.upsample_ratio

        def body(carry, xs):
            mask_state = carry
            pos, vel = xs
            real_pos = pos if n_real is None else pos[:n_real]
            centroid = jnp.mean(real_pos, axis=0, keepdims=True)
            pos_n = (pos - centroid)[None]
            if n_real is not None:
                # keep sentinels parked at the sentinel, not sentinel-mean
                pos_n = pos_n.at[:, n_real:].set(PAD_SENTINEL)
            if use_vel:
                feature = jnp.concatenate([pos_n, vel[None] * DT], axis=-1)
            else:
                feature = pos_n
            edge, mask = model.apply(variables, feature, pos_n, False,
                                     method=model.heads)
            mean_mask, mask_state = rollout_mask_update(mask_state, mask)
            _, padded, valid = expand_pos_with_masking(
                pos_n, edge, mean_mask, model.upsample_ratio, model.epsilon
            )
            out = jnp.where(valid[..., None], padded + centroid[None], padded)
            if n_real is not None:
                # layout: slots i*r..i*r+r-1 belong to point i — pad rows
                # occupy exactly the tail slots
                out, valid = out[:, :n_real * r], valid[:, :n_real * r]
            return mask_state, (out[0], valid[0])

        mask_state, (outs, valids) = jax.lax.scan(
            body, mask_state, (pos_c, vel_c)
        )
        return mask_state, outs, valids

    return jax.jit(scan_fn)


def rollout_sequence_device(
    model: SRNet,
    variables,
    pos_seq: np.ndarray,                    # [T, N, 3]
    vel_seq: Optional[np.ndarray] = None,   # [T, N, 3]
    use_vel: bool = False,
    history: int = 25,
    chunk: int = 100,
) -> List[np.ndarray]:
    """Device-resident rollout over a uniform-N frame sequence.

    TPU-native redesign of the demo loop (train_fluid/demo.ipynb cell 3):
    instead of one H2D + dispatch + D2H round trip per frame, frames are
    shipped in chunks and a jitted lax.scan advances the 25-frame mask ring
    across the whole chunk on device. Chunk c+1's scan is dispatched before
    chunk c's outputs are fetched, so transfers overlap compute.
    """
    t, n, _ = pos_seq.shape
    if vel_seq is None:
        vel_seq = np.zeros_like(pos_seq)
    pad = (-t) % chunk
    if pad:
        pos_seq = np.concatenate([pos_seq, pos_seq[-1:].repeat(pad, 0)], 0)
        vel_seq = np.concatenate([vel_seq, vel_seq[-1:].repeat(pad, 0)], 0)
    n_pad = (-n) % ALIGN
    if n_pad:
        pos_seq = np.concatenate(
            [pos_seq, np.full((pos_seq.shape[0], n_pad, 3), PAD_SENTINEL,
                              np.float32)], axis=1)
        vel_seq = np.concatenate(
            [vel_seq, np.zeros((vel_seq.shape[0], n_pad, 3), np.float32)],
            axis=1)
    scan_fn = make_rollout_scan(model, use_vel, chunk,
                                n_real=n if n_pad else None)
    mask_state = RolloutMaskState.create(1, n + n_pad, history)

    pending: List[Tuple] = []
    outputs: List[np.ndarray] = []

    def drain(keep: int):
        while len(pending) > keep:
            outs, valids = pending.pop(0)
            outs, valids = np.asarray(outs), np.asarray(valids)
            for f in range(outs.shape[0]):
                outputs.append(outs[f][valids[f]])

    for c in range(0, pos_seq.shape[0], chunk):
        pos_c = jnp.asarray(pos_seq[c:c + chunk], jnp.float32)
        vel_c = jnp.asarray(vel_seq[c:c + chunk], jnp.float32)
        mask_state, outs, valids = scan_fn(variables, mask_state,
                                           pos_c, vel_c)
        for arr in (outs, valids):
            try:
                arr.copy_to_host_async()
            except AttributeError:
                pass
        pending.append((outs, valids))
        drain(1)
    drain(0)
    return outputs[:t]


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

    Frames are sentinel-padded up to a shared bucket (first frame's count
    rounded up to ``ALIGN``): one compiled program serves every frame, the
    Pallas tile layouts stay aligned, and mildly ragged sequences (counts
    varying within the bucket) are supported — the 25-frame mask ring is
    shaped by the bucket, so a frame larger than it raises.

    Returns a list of variable-size numpy arrays (valid points only),
    denormalized back to world space like the demo loop.
    """
    step = make_rollout_step(model, use_vel)
    mask_state = None
    bucket = None
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
        n_valid = pos_b.shape[1]
        if bucket is None:
            bucket = -(-n_valid // ALIGN) * ALIGN
            mask_state = RolloutMaskState.create(1, bucket, history,
                                                 track_valid=True)
        if n_valid > bucket:
            raise ValueError(
                f"frame with {n_valid} points exceeds the rollout bucket "
                f"{bucket} set by the first frame")
        if n_valid <= _MAX_GRAPH_K and bucket > n_valid:
            # with fewer real points than the EdgeConv k, alignment padding
            # would force 999-sentinels into real points' neighbor sets and
            # their huge (neighbor - center) edge features would corrupt
            # the outputs (ADVICE round 3) — refuse rather than degrade
            raise ValueError(
                f"frame with {n_valid} points <= the generator's max graph "
                f"k ({_MAX_GRAPH_K}): padded rollout would leak sentinel "
                f"neighbors into real points; feed frames with more points")
        pos_b, vel_b = _pad_frame(pos_b, vel_b, bucket)
        padded, valid, mask_state = step(variables, mask_state, pos_b, vel_b,
                                         jnp.int32(n_valid))
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
