"""Mask-head diagnosis across training checkpoints (VERDICT r3 missing #3).

The round-3 80k eval showed the free-surface particle-count diff
(reference train_fluid/analysis_helper.py:275-281) WORSE after training
(126.0) than at random init (111.6) — the metric the masking head
(loss.py:253-275 supervision) nominally improves. This tool instruments
WHY, per checkpoint:

  * keep-rate and mask-value quantiles (how aggressively the head prunes),
  * masking loss against the density-derived target, and keep-decision
    agreement with that target (precision/recall on the "dense" bit),
  * SIGNED free-surface counts: pred vs gt, plus the keep-all ablation
    (mask forced on) to separate "the head prunes the wrong points" from
    "the offsets place points badly regardless of masking",
  * free-surface membership of pruned points: is the head pruning
    surface points (bad — that's exactly the sparse region the target
    marks prune=0, see hypothesis below) or bulk duplicates (good)?

Usage:
  python tools/diagnose_mask_head.py --ckpt_dir runs/<run>/model_ckpt \
      [--dataset_path <dir>] [--num_samples 8]
Prints one JSON line per checkpoint (and one for random init).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_dir", type=str, required=True)
    p.add_argument("--dataset_path", type=str, default=None)
    p.add_argument("--sequence_num", type=int, default=1)
    p.add_argument("--sequence_length", type=int, default=8)
    p.add_argument("--num_samples", type=int, default=8)
    p.add_argument("--patch_size", type=int, default=4096)
    p.add_argument("--in_node_feats", type=int, default=6)
    p.add_argument("--node_embedding", type=int, default=128)
    p.add_argument("--upsample_ratio", type=int, default=8)
    p.add_argument("--use_vel", action="store_true", default=True)
    p.add_argument("--R", type=float, default=0.10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fs_radius", type=float, default=0.025)
    p.add_argument("--particle_radius", type=float, default=0.025,
                   help="masking-target radius; the fluid train step passes "
                        "cfg.cutoff (=0.025) straight through "
                        "(train/step.py make_fluid_gan_step, reference "
                        "train_step_final.py:110)")
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from tpugan_tpu.config import DT
    from tpugan_tpu.data import SiamFluidDataset
    from tpugan_tpu.data.sampling import get_free_surface_particles
    from tpugan_tpu.data.synthetic import make_synthetic_fluid_dataset
    from tpugan_tpu.models import SRNet
    from tpugan_tpu.models.generator import expand_pos_with_masking
    from tpugan_tpu.ops.metrics import masking_target

    dataset_path = opt.dataset_path
    if dataset_path is None:
        dataset_path = "/tmp/diag_mask_synth"
        make_synthetic_fluid_dataset(
            dataset_path, case_num=opt.sequence_num,
            case_steps=opt.sequence_length, num_particles=12000,
            seed=opt.seed + 100,
        )
    ds = SiamFluidDataset(
        dataset_path, opt.sequence_num, opt.sequence_length,
        sample_num=opt.patch_size, fps_ratio=0.125, jitter=0.0,
        seed=opt.seed,
    )

    model = SRNet(in_feats=opt.in_node_feats,
                  node_emb_dim=opt.node_embedding,
                  upsample_ratio=opt.upsample_ratio)
    n = int(opt.patch_size * 0.125)
    variables0 = jax.jit(lambda k, f, q: model.init(k, f, q, False))(
        jax.random.PRNGKey(opt.seed), jnp.zeros((1, n, opt.in_node_feats)),
        jnp.zeros((1, n, 3))
    )
    fwd = jax.jit(lambda v, f, q: model.apply(v, f, q, False))

    particle_radius = opt.particle_radius

    def analyze(variables, label):
        rows = []
        for i in range(min(opt.num_samples, len(ds))):
            item = ds[i]
            low = jnp.asarray(item["lowres_pos"])
            high = jnp.asarray(item["highres_pos"])
            vel = jnp.asarray(item["lowres_vel"])
            feat = low
            if opt.in_node_feats == 6:
                feat = jnp.concatenate([low, vel * DT], axis=-1)
            expanded, mask, padded, valid = fwd(variables, feat[1][None],
                                                low[1][None])
            mask_np = np.asarray(mask)[0]
            valid_np = np.asarray(valid)[0]
            pred = np.asarray(padded)[0][valid_np]
            gt = np.asarray(high[1])

            # keep-all ablation: ALL N*r candidate points, mask forced on
            pred_all = np.asarray(expanded)[0]

            tgt = np.asarray(masking_target(
                high[1][None], low[1][None], particle_radius))[0]
            keep = (mask_np > model.epsilon).astype(np.float32)
            tp = float(((keep == 1) & (tgt == 1)).sum())
            prec = tp / max(keep.sum(), 1)
            rec = tp / max(tgt.sum(), 1)

            fs_gt = get_free_surface_particles(gt, opt.fs_radius)
            fs_pred = get_free_surface_particles(pred, opt.fs_radius)
            fs_all = get_free_surface_particles(pred_all, opt.fs_radius)

            # are the INPUT points the head prunes surface-ish? measure the
            # pruned inputs' masking target (0 = sparse/free region)
            pruned_tgt_mean = (float(tgt[keep == 0].mean())
                               if (keep == 0).any() else float("nan"))

            rows.append(dict(
                keep_rate=float(valid_np.mean()),
                mask_q10=float(np.quantile(mask_np, 0.1)),
                mask_q50=float(np.quantile(mask_np, 0.5)),
                mask_q90=float(np.quantile(mask_np, 0.9)),
                masking_l1=float(np.abs(mask_np - tgt).mean()),
                target_keep_rate=float(tgt.mean()),
                keep_precision=float(prec),
                keep_recall=float(rec),
                pruned_target_mean=pruned_tgt_mean,
                fs_pred=int(fs_pred.shape[0]),
                fs_pred_keepall=int(fs_all.shape[0]),
                fs_gt=int(fs_gt.shape[0]),
                pred_count=int(pred.shape[0]),
                gt_count=int(gt.shape[0]),
            ))
        agg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
        agg["fs_diff_abs"] = float(np.mean(
            [abs(r["fs_pred"] - r["fs_gt"]) for r in rows]))
        agg["fs_diff_signed"] = float(np.mean(
            [r["fs_pred"] - r["fs_gt"] for r in rows]))
        agg["fs_diff_abs_keepall"] = float(np.mean(
            [abs(r["fs_pred_keepall"] - r["fs_gt"]) for r in rows]))
        print(json.dumps({"ckpt": label, **agg}), flush=True)

    analyze(variables0, "random_init")

    paths = sorted(
        glob.glob(os.path.join(opt.ckpt_dir, "tpugan_checkpoint*.ckpt")),
        key=lambda s: int(re.search(r"(\d+)\.ckpt$", s).group(1)),
    )
    for path in paths:
        with open(path, "rb") as fh:
            restored = serialization.msgpack_restore(fh.read())
        variables = {"params": serialization.from_state_dict(
            variables0["params"], restored["sr_net"]["params"])}
        analyze(variables, os.path.basename(path))


if __name__ == "__main__":
    main()
