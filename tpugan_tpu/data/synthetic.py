"""Synthetic SPH-like fluid fixtures for tests, CI and benchmarking.

The reference trains on SPlisHSPlasH DFSPH output converted to
``case{i}/data_{t}.npz`` frames with ``pos [N,3] f32`` and ``vel [N,3] f32``
(reference fluid_data_generation/process_training_data.py:6-95). Real
simulation needs the external C++ solver; this module synthesizes sequences
with the same schema — particle blobs advected through a smooth
divergence-ish velocity field under gravity with box bounce — so every
pipeline stage downstream of the solver is exercised bit-for-bit
identically.
"""

from __future__ import annotations

import os
import numpy as np

from tpugan_tpu.config import DT


def _blob(rng: np.random.Generator, n: int, center, radius: float) -> np.ndarray:
    """Roughly uniform ball of n particles."""
    v = rng.standard_normal((n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    r = radius * rng.uniform(0, 1, (n, 1)) ** (1.0 / 3.0)
    return (np.asarray(center) + v * r).astype(np.float32)


def synthetic_fluid_sequence(
    seed: int = 0,
    num_particles: int = 12000,
    num_frames: int = 24,
    box: float = 1.0,
):
    """Yield (pos, vel) frames of a falling, swirling particle blob."""
    rng = np.random.default_rng(seed)
    n_blobs = int(rng.integers(1, 4))
    # blob sizes sum exactly to num_particles (remainder on the last blob)
    # so callers get the N they asked for — an off-by-a-few N silently
    # de-aligns the Pallas tile layouts downstream
    counts = [num_particles // n_blobs] * n_blobs
    counts[-1] += num_particles - sum(counts)
    parts = []
    for nb in counts:
        c = rng.uniform(-0.4 * box, 0.4 * box, 3)
        c[1] = rng.uniform(0.0, 0.6 * box)
        parts.append(_blob(rng, nb, c, rng.uniform(0.15, 0.3) * box))
    pos = np.concatenate(parts)[:num_particles]
    vel = np.tile(rng.uniform(-0.5, 0.5, (1, 3)).astype(np.float32), (pos.shape[0], 1))

    g = np.array([0.0, -9.81, 0.0], np.float32)
    for _ in range(num_frames):
        yield pos.copy(), vel.copy()
        # swirl + gravity; value depends smoothly on position so velocity
        # fields are spatially coherent (needed for interpolation tests)
        swirl = 0.8 * np.stack(
            [np.sin(3 * pos[:, 1]), np.zeros(pos.shape[0]), np.cos(3 * pos[:, 0])],
            axis=1,
        ).astype(np.float32)
        vel = vel + DT * (g + swirl)
        pos = pos + DT * vel
        # box bounce
        for d in range(3):
            lo, hi = (-box, box) if d != 1 else (-0.8 * box, 1.5 * box)
            under, over = pos[:, d] < lo, pos[:, d] > hi
            pos[under, d] = 2 * lo - pos[under, d]
            pos[over, d] = 2 * hi - pos[over, d]
            vel[under | over, d] *= -0.5


def make_synthetic_fluid_dataset(
    root: str,
    case_num: int = 2,
    case_steps: int = 12,
    num_particles: int = 12000,
    case_prefix: str = "data",
    case_to_start: int = 1,
    seed: int = 0,
) -> str:
    """Materialize a reference-schema dataset directory
    (``case{i}/data_{t}.npz`` with pos/vel) of synthetic sequences."""
    os.makedirs(root, exist_ok=True)
    for c in range(case_num):
        case_dir = os.path.join(root, f"case{c + case_to_start}")
        os.makedirs(case_dir, exist_ok=True)
        frames = synthetic_fluid_sequence(
            seed=seed + c, num_particles=num_particles, num_frames=case_steps
        )
        for t, (pos, vel) in enumerate(frames):
            np.savez(
                os.path.join(case_dir, f"{case_prefix}_{t}.npz"),
                pos=pos, vel=vel,
            )
    return root


def make_synthetic_action_dataset(
    root: str,
    num_videos: int = 4,
    frames: int = 12,
    points: int = 1500,
    seed: int = 0,
    num_classes: int = 3,
) -> str:
    """Synthetic MSR-Action3D-schema dataset: ``a{label}_s{subj}_e{ex}_
    sdepth.npz`` files holding an object-array ``point_clouds`` of [Ni, 3]
    frames in depth-camera units (reference train_action/msr_dataset.py
    loads exactly this layout; subjects <= 5 are train, > 5 test).

    Classes carry DISTINCT motion signatures so the discriminator-feature
    transfer eval (cli/eval_tempo_feat.py, reference eval_tempo_feat.py)
    measures genuine temporal-feature quality rather than chance: the
    spatial content of every class is the same blob, only the dynamics
    separate them.

    The class dynamics MUST be non-rigid: the MSR test protocol centers
    every test frame on its own mean (reference msr_dataset.py:115-120),
    which removes ALL rigid translation from test clips — a class signal
    carried only by sway/drift (rounds 1-4) is structurally invisible to
    any classifier at test time (measured: the centroid-motion probe and
    the trained transfer arm both sat at chance). Classes therefore
    differ in per-point deformation — anisotropic breathing (axis,
    frequency and amplitude are functions of the label) and a
    class-rate rotation about a class axis — which survives per-frame
    centering, plus the old label-colored rigid sway/drift (train-time
    signal only). Per-video random phase and per-point noise are not
    label-dependent."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    for v in range(num_videos):
        label = (v % num_classes) + 1
        # alternate subjects across the reference's train(<=5)/test(>5)
        # split (order 1,6,2,7,...) so even tiny fixtures hit both splits;
        # (label, subject, ex) is a bijection of v so filenames never clash
        s = (v // num_classes) % 10
        subject = s // 2 + 1 + (5 if s % 2 else 0)
        body = _blob(rng, points, [0, 0, 0], 1.0) * np.array([60, 120, 40])
        # class-determined dynamics; video-random phase
        axis = label % 3
        freq = 0.18 + 0.11 * (label % 5)
        amp = 22.0 + 9.0 * (label % 4)
        drift = 2.0 + 2.5 * ((label // 3) % 3)
        phase = rng.uniform(0, 2 * np.pi)
        # non-rigid, centering-invariant class signature
        b_axis = (label + 1) % 3                 # breathing axis
        b_freq = 0.25 + 0.17 * ((label * 2) % 5)
        b_amp = 0.22 + 0.08 * (label % 3)        # relative stretch
        r_axis = (label * 2) % 3                 # rotation axis
        r_rate = (0.05 + 0.04 * (label % 4)) * (1 if label % 2 else -1)
        b_phase = rng.uniform(0, 2 * np.pi)
        clip = []
        for t in range(frames):
            stretch = np.ones(3, np.float64)
            stretch[b_axis] += b_amp * np.sin(b_freq * t + b_phase)
            th = r_rate * t
            i, j = (r_axis + 1) % 3, (r_axis + 2) % 3
            rot = np.eye(3)
            rot[i, i] = rot[j, j] = np.cos(th)
            rot[i, j], rot[j, i] = -np.sin(th), np.sin(th)
            deformed = (body * stretch) @ rot.T
            sway = np.zeros(3, np.float32)
            sway[axis] = amp * np.sin(freq * t + phase)
            sway[1] += drift * t
            frame = deformed + sway + rng.standard_normal((points, 3)) * 2
            frame = frame + np.array([0, 0, 800], np.float32)
            clip.append(frame.astype(np.float64))
        arr = np.empty(frames, dtype=object)
        for t in range(frames):
            arr[t] = clip[t]
        ex = 1 + (v // num_classes) // 10  # unique filename past 10 subjects
        np.savez(
            os.path.join(root,
                         f"a{label:02d}_s{subject:02d}_e{ex:02d}_sdepth.npz"),
            point_clouds=arr,
        )
    return root
