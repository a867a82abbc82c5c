"""Host-side separability probe for the synthetic MSR fixture.

Answers "does the class signal survive the MSRAction3D preprocessing?"
independently of any network: per clip, extract the 6-D centroid-motion
feature [c1-c0, c2-c1] (the synthetic classes differ ONLY in dynamics —
data/synthetic.py), fit a nearest-class-centroid classifier on the train
split, report clip- and video-level test accuracy with the same per-video
probability (here: vote) accumulation as cli/eval_tempo_feat.py.

CPU-only (numpy); safe to run while the chip is busy.
"""
import argparse
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def clip_features(ds):
    feats, labels, vids = [], [], []
    for i in range(len(ds)):
        item = ds[i]
        pos = np.asarray(item["highres_pos"])          # [F, N, 3]
        cent = pos.mean(axis=1)                        # [F, 3]
        f = np.concatenate([cent[1] - cent[0], cent[2] - cent[1]])
        feats.append(f)
        labels.append(int(item["label"]))
        vids.append(int(item.get("video_index", -1)))  # test items only
    return np.stack(feats), np.array(labels), np.array(vids)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--videos", type=int, default=90)
    p.add_argument("--classes", type=int, default=6)
    p.add_argument("--frames", type=int, default=12)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--root", type=str, default="/tmp/probe_msr")
    opt = p.parse_args()

    from tpugan_tpu.data import MSRAction3DDataset
    from tpugan_tpu.data.synthetic import make_synthetic_action_dataset

    make_synthetic_action_dataset(
        opt.root, num_videos=opt.videos, frames=opt.frames, points=3000,
        num_classes=opt.classes, seed=opt.seed)
    tr = MSRAction3DDataset(opt.root, frames_per_clip=3, num_points=2048,
                            train=True, return_lowres=False, seed=opt.seed)
    te = MSRAction3DDataset(opt.root, frames_per_clip=3, num_points=2048,
                            train=False, return_lowres=False, seed=opt.seed)
    xtr, ytr, _ = clip_features(tr)
    xte, yte, vte = clip_features(te)

    classes = np.unique(ytr)
    # z-score then nearest class centroid
    mu, sd = xtr.mean(0), xtr.std(0) + 1e-9
    ztr, zte = (xtr - mu) / sd, (xte - mu) / sd
    cents = np.stack([ztr[ytr == c].mean(0) for c in classes])
    d = ((zte[:, None, :] - cents[None]) ** 2).sum(-1)
    pred = classes[np.argmin(d, axis=1)]
    clip_acc = float((pred == yte).mean())

    video_votes = defaultdict(lambda: np.zeros(len(classes)))
    video_label = {}
    for p_i, y_i, v_i in zip(pred, yte, vte):
        video_votes[v_i][list(classes).index(p_i)] += 1
        video_label[v_i] = y_i
    correct = sum(
        int(classes[np.argmax(video_votes[v])] == video_label[v])
        for v in video_votes)
    video_acc = correct / max(1, len(video_votes))
    print(f"train clips {len(ytr)}  test clips {len(yte)}  "
          f"test videos {len(video_votes)}  classes {len(classes)}")
    print(f"centroid-motion probe: clip acc {clip_acc:.3f}  "
          f"video acc {video_acc:.3f}  (chance {1 / len(classes):.3f})")


if __name__ == "__main__":
    main()
