"""Dataclass config layer mirroring the reference's argparse surfaces
(train_fluid/train_tempo.py:29-106, train_action/train_msr.py:30-83,
train_action/eval_tempo_feat.py:20-31) plus the module-level constants that
double as config there (DT train_step_final.py:7, BASE_RADIUS
train_utils.py:10).

The reference declares ``--R`` as ``type=int`` with a float default — a
latent truncation bug for CLI-set values (SURVEY.md §5); here R is a float.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

DT = 0.025           # advection timestep (reference train_step_final.py:7)
BASE_RADIUS = 0.025  # fluid particle radius (reference train_utils.py:10)


@dataclass
class FluidTrainConfig:
    # optimization (reference train_tempo.py:29-49,165-172)
    lr: float = 3e-4
    iters: int = 80000
    ckpt_every: int = 5000
    lr_decay_steps: int = 10000
    lr_decay_rate: float = 0.7
    dis_lr_factor: float = 0.33
    # model (reference train_tempo.py:52-60)
    in_node_feats: int = 3       # 6 with --use_vel (pos || vel*DT)
    node_embedding: int = 128
    upsample_ratio: int = 8
    feature_extractor_depth: int = 3
    R: float = 0.10              # discriminator cutoff radius
    # dataset (reference train_tempo.py:63-83; tempo_dataset.py:115-126)
    train_dataset_path: str = "data/train_data_0.025_fine"
    test_dataset_path: str = "data/test_data_0.025_fine"
    train_sequence_num: int = 20
    test_sequence_num: int = 4
    sequence_length: int = 200
    batch_size: int = 4
    small_batch: bool = False
    patch_size: int = 9216       # -> 4096 for small batches
    fps_ratio: float = 0.125     # lowres = patch_size * fps_ratio
    jitter: float = 0.003
    # losses (reference train_tempo.py:85-90)
    w: float = 0.5               # weight on the position (Chamfer+mask) loss
    cutoff: float = 0.025        # masking-loss particle radius
    masking_w: float = 100.0     # w1 inside tpugan_sr_loss
    ml_gate: float = 0.1         # adversarial branch gate on masking loss
    # toggles (reference train_tempo.py:92-101)
    use_vel: bool = False
    # velocity-transfer interpolation: "dense" sums every in-radius GT
    # neighbor (two MXU matmuls per tile, fastest); "capped" reproduces the
    # reference's 32-nearest-within-radius FRNN path exactly
    # (gcn_lib/interpolation.py:103-123). At fluid density the two GENUINELY
    # differ (queries have ~100+ in-radius neighbors); see PARITY.md.
    interp: str = "dense"
    # Stack the D-side tower applies: frames into one sa1/sa2 pass, and the
    # D update's fake+real applies into one (grouped batch statistics keep
    # per-call BN semantics — nn/layers.py stat_groups; spectral-norm power
    # iterations advance once per stacked apply instead of once per frame/
    # source, the documented deviation, A/B'd in BENCH_NOTES round 5).
    fast_d: bool = False
    freeze_D: bool = False
    dump_visualization: bool = False
    log_dir: str = "./"
    seed: int = 1
    # TPU-native: compute the lowres inputs (FPS downsample + jitter) on
    # device inside the jitted step instead of in the host loader. The host
    # has one core here, so the O(n*N) FPS (~21 ms/item) throttles the input
    # pipeline, while fps_pallas does the same exact greedy selection in
    # ~3 ms for the whole batch; it also removes the lowres H2D transfer.
    # Semantically identical to the host path up to the RNG stream (same
    # greedy FPS from a uniform random start, same N(0, jitter) noise).
    device_sampling: bool = False
    # parallelism (new, no reference analog — SURVEY.md §2.4)
    data_parallel: bool = False
    mesh_shape: Optional[tuple] = None

    @property
    def lowres_size(self) -> int:
        return int(self.patch_size * self.fps_ratio)


@dataclass
class ActionTrainConfig:
    # reference train_msr.py:30-83,133-141
    lr: float = 3e-4
    iters: int = 100000
    ckpt_every: int = 10000
    lr_decay_rate: float = 0.72
    dis_lr_factor: float = 0.33
    in_node_feats: int = 3
    node_embedding: int = 128
    upsample_ratio: int = 16
    feature_extractor_depth: int = 3
    R: float = 2.0
    data_dir: str = "data/MSR-Action3D"
    frames_per_clip: int = 3
    num_points: int = 2048
    fps_ratio: float = 0.0625    # reference msr_dataset.py:93
    batch_size: int = 4
    w: float = 2.0
    # device-side per-frame FPS downsample inside the jitted step (see
    # FluidTrainConfig.device_sampling; action FPS is per-frame independent)
    device_sampling: bool = False
    fast_d: bool = False         # see FluidTrainConfig.fast_d
    freeze_D: bool = False
    dump_visualization: bool = False
    log_dir: str = "./"
    seed: int = 1
    data_parallel: bool = False
    mesh_shape: Optional[tuple] = None

    @property
    def lr_decay_steps(self) -> int:
        return self.iters // 10   # reference train_msr.py:134

    @property
    def lowres_size(self) -> int:
        return int(self.num_points * self.fps_ratio)


@dataclass
class EvalTempoFeatConfig:
    # reference eval_tempo_feat.py:20-31
    lr: float = 1e-3
    epochs: int = 60
    batch_size: int = 24
    data_dir: str = "data/MSR-Action3D"
    ckpt_path: str = ""
    log_dir: str = "./eval_dis"
    cutoff: float = 2.0
    frames_per_clip: int = 3
    seed: int = 0


def replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)


# ---------------------------------------------------------------------------
# Blessed-config presets — the reference pins its training/eval recipes in
# shell scripts (train_fluid/train_vel/train.sh, train_fluid/train_novel/
# train.sh, train_action/train_dir/train.sh, train_action/eval_dis/run.sh).
# Each preset below is that script's flag set, applied as argparse DEFAULTS
# so explicit CLI flags still win. scripts/*.sh wrap these one-to-one.
# ---------------------------------------------------------------------------

PRESETS = {
    "train_fluid": {
        # train_fluid/train_vel/train.sh
        "train_vel": dict(ckpt_every=10000, iters=80000,
                          dump_visualization=True, batch_size=4,
                          use_vel=True, in_node_feats=6),
        # train_fluid/train_novel/train.sh
        "train_novel": dict(ckpt_every=10000, iters=80000,
                            dump_visualization=True, batch_size=4),
    },
    "train_action": {
        # train_action/train_dir/train.sh
        "train_dir": dict(ckpt_every=10000, iters=100000, lr=3e-4,
                          batch_size=4, dump_visualization=True),
    },
    "eval_tempo_feat": {
        # train_action/eval_dis/run.sh (data/ckpt paths are environment-
        # specific there; the recipe itself is the default hyperparameters)
        "eval_dis": dict(lr=1e-3, epochs=60, batch_size=24, cutoff=2.0,
                         frames_per_clip=3),
    },
}


def parse_with_preset(parser, cli: str, argv=None):
    """Parse args honoring ``--preset``: preset values become parser
    defaults (reference shell-script flag sets, PRESETS above), so flags
    given explicitly on the command line still override them."""
    table = PRESETS[cli]
    parser.add_argument("--preset", choices=sorted(table), default=None,
                        help="blessed reference config (flag values from "
                             "the reference's shell scripts); explicit "
                             "flags override preset values")
    pre, _ = parser.parse_known_args(argv)
    if pre.preset:
        parser.set_defaults(**table[pre.preset])
    return parser.parse_args(argv)
