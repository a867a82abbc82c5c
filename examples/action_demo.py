"""MSR-Action3D clip upsampling demo — the reference's
train_action/demo.ipynb as a script: per-frame NoMaskSRNet forward over a
clip, outputs re-offset by per-frame centroids, saved as npz
(SURVEY.md §3.3, batch-eval analog).
"""

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None)
    p.add_argument("--data_dir", default=None,
                   help="MSR-Action3D npz dir; synthetic if omitted")
    p.add_argument("--frames_per_clip", type=int, default=24)
    p.add_argument("--num_points", type=int, default=2048)
    p.add_argument("--out", default="./action_demo_out.npz")
    p.add_argument("--eval_metrics", action="store_true",
                   help="report the reference's exact CD/EMD eval protocol "
                        "(train_action/analysis_helper.py:60-83) vs ground "
                        "truth")
    p.add_argument("--emd_iters", type=int, default=3000)
    p.add_argument("--num_clips", type=int, default=1,
                   help="average --eval_metrics over the first N test clips")
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tpugan_tpu.data import MSRAction3DDataset
    from tpugan_tpu.models import NoMaskSRNet

    data_dir = opt.data_dir
    if data_dir is None:
        from tpugan_tpu.data.synthetic import make_synthetic_action_dataset

        data_dir = "/tmp/action_demo_msr"
        make_synthetic_action_dataset(data_dir, num_videos=4, frames=30,
                                      points=3000)

    ds = MSRAction3DDataset(
        data_dir, frames_per_clip=opt.frames_per_clip,
        num_points=opt.num_points, train=False, fps_ratio=0.0625,
    )
    item = ds[0]
    lowres = item["lowres_pos"]          # [F, n, 3]
    centers = item["centers"]            # [F, 3]

    model = NoMaskSRNet(in_feats=3, node_emb_dim=128, upsample_ratio=16)
    pos0 = jnp.asarray(lowres[0])[None]
    variables = jax.jit(lambda k, q: model.init(k, q, q, False))(
        jax.random.PRNGKey(0), pos0
    )
    if opt.ckpt:
        from flax import serialization

        path = opt.ckpt
        if os.path.isdir(path):
            with open(os.path.join(path, "latest_checkpoint.txt")) as fh:
                path = os.path.join(path, fh.readline().strip())
        with open(path, "rb") as fh:
            restored = serialization.msgpack_restore(fh.read())
        variables = {"params": serialization.from_state_dict(
            variables["params"], restored["sr_net"]["params"])}

    fwd = jax.jit(lambda q: model.apply(variables, q, q, False)[0])

    def upsample_clip(item):
        lowres, centers = item["lowres_pos"], item["centers"]
        preds = []
        for f in range(lowres.shape[0]):
            pred = np.asarray(fwd(jnp.asarray(lowres[f])[None]))[0]
            preds.append(pred + centers[f])   # undo per-frame centering
        return np.stack(preds)

    preds = upsample_clip(item)
    np.savez(opt.out, pred=preds, label=item["label"])
    print(f"wrote {preds.shape} upsampled clip to {opt.out} "
          f"(label {int(item['label'])})")

    if opt.eval_metrics:
        # the reference's exact protocol: resample both clips to 2048 points
        # with y-flip + per-frame pc_normalize, CD/2048, EMD(pred/2)x2 at
        # eps=0.002 (train_action/analysis_helper.py:46-83)
        from tpugan_tpu.eval import (
            action_position_metrics, pad_clip_with_appropriate_size,
        )

        rng = np.random.default_rng(0)
        cds, emds = [], []
        for ci in range(min(opt.num_clips, len(ds))):
            item_i = item if ci == 0 else ds[ci]
            preds_i = preds if ci == 0 else upsample_clip(item_i)
            gt = item_i["highres_pos"] + item_i["centers"][:, None, :]
            pred_clip = pad_clip_with_appropriate_size(list(preds_i), rng=rng)
            gt_clip = pad_clip_with_appropriate_size(list(gt), rng=rng)
            for f in range(pred_clip.shape[0]):
                cd, emd = action_position_metrics(
                    jnp.asarray(pred_clip[f]), jnp.asarray(gt_clip[f]),
                    emd_iters=opt.emd_iters,
                )
                cds.append(cd)
                emds.append(emd)
        print(f"action eval protocol: CD/2048 = {np.mean(cds):.6f}, "
              f"EMD = {np.mean(emds):.6f} over {len(cds)} frames")


if __name__ == "__main__":
    main()
