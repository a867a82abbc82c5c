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
    """Two probe features per clip.

    ``cent``: centroid-motion [6] — rigid translation between frames. The
    test protocol centers EVERY test frame on its own mean (reference
    msr_dataset.py:115-120), so this is the translation-NULL control: it
    must sit at chance on test clips no matter how label-colored the
    rigid sway is.

    ``shape``: per-frame second-moment (covariance) trajectory [18] — the
    6 unique covariance entries per frame, differenced across frames and
    concatenated with frame-0's. Deformation dynamics (breathing,
    rotation) survive per-frame centering; this measures whether a
    centering-invariant class signal exists in the data at all,
    independent of any network.
    """
    cent_f, shape_f, labels, vids = [], [], [], []
    iu = np.triu_indices(3)
    for i in range(len(ds)):
        item = ds[i]
        pos = np.asarray(item["highres_pos"])          # [F, N, 3]
        cent = pos.mean(axis=1)                        # [F, 3]
        cent_f.append(np.concatenate([cent[1] - cent[0], cent[2] - cent[1]]))
        covs = []
        for f in range(pos.shape[0]):
            c = np.cov((pos[f] - pos[f].mean(0)).T)    # [3, 3]
            covs.append(c[iu])                         # [6]
        covs = np.stack(covs)                          # [F, 6]
        shape_f.append(np.concatenate(
            [covs[0], covs[1] - covs[0], covs[2] - covs[1]]))
        labels.append(int(item["label"]))
        vids.append(int(item.get("video_index", -1)))  # test items only
    return (np.stack(cent_f), np.stack(shape_f),
            np.array(labels), np.array(vids))


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
    ctr, str_, ytr, _ = clip_features(tr)
    cte, ste, yte, vte = clip_features(te)

    classes = np.unique(ytr)

    def probe(xtr, xte, name):
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
        print(f"{name} probe: clip acc {clip_acc:.3f}  "
              f"video acc {video_acc:.3f}  (chance {1 / len(classes):.3f})")
        return len(video_votes)

    print(f"train clips {len(ytr)}  test clips {len(yte)}  "
          f"classes {len(classes)}")
    probe(ctr, cte, "centroid-motion (translation null)")
    probe(str_, ste, "shape-dynamics (covariance trajectory)")


if __name__ == "__main__":
    main()
