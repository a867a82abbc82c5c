"""MSR-Action3D clip dataset + batch iterator.

Equivalent of the reference's ``MSRAction3D`` (train_action/msr_dataset.py):
video files ``a{label}_s{subject}_e{ex}_sdepth.npz`` holding object arrays
of per-frame point clouds; subjects <= 5 train, > 5 test. Per clip:
resample/pad every frame to ``num_points``, flip y, (train) random scale
0.9-1.1, divide by 300, center on the middle frame (train) or per frame
(test), and FPS-downsample each frame by ``fps_ratio``.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from tpugan_tpu.data.sampling import farthest_point_sampling


class MSRAction3DDataset:
    def __init__(
        self,
        root: str,
        frames_per_clip: int = 3,
        num_points: int = 2048,
        step_between_clips: int = 1,
        train: bool = True,
        fps_ratio: float = 0.0625,
        return_lowres: bool = True,
        seed: int = 0,
    ):
        self.num_points = num_points
        self.frames_per_clip = frames_per_clip
        self.step_between_clips = step_between_clips
        self.train = train
        self.fps_ratio = fps_ratio
        self.return_lowres = return_lowres
        self.rng = np.random.default_rng(seed)

        self.videos: List[np.ndarray] = []
        self.labels: List[int] = []
        self.index_map: List[Tuple[int, int]] = []
        index = 0
        for video_name in sorted(os.listdir(root)):
            subject = int(video_name.split("_")[1].split("s")[1])
            is_train_video = subject <= 5
            if train != is_train_video:
                continue
            video = np.load(os.path.join(root, video_name), allow_pickle=True)[
                "point_clouds"
            ]
            self.videos.append(video)
            self.labels.append(int(video_name.split("_")[0][1:]) - 1)
            nframes = video.shape[0]
            span = step_between_clips * (frames_per_clip - 1)
            for t in range(0, nframes - span, step_between_clips):
                self.index_map.append((index, t))
            index += 1
        self.num_classes = max(self.labels) + 1 if self.labels else 0

    def __len__(self) -> int:
        return len(self.index_map)

    def _resample_frame(self, p: np.ndarray, rng) -> np.ndarray:
        """Random subsample or tile-pad to num_points; flip y (reference
        msr_dataset.py:68-76)."""
        n = p.shape[0]
        if n > self.num_points:
            r = rng.choice(n, self.num_points, replace=False)
        else:
            repeat, residue = self.num_points // n, self.num_points % n
            r = np.concatenate(
                [np.arange(n)] * repeat
                + [rng.choice(n, residue, replace=False)]
            )
        p = p.copy()
        p[:, 1] = -p[:, 1]
        return p[r, :]

    def __getitem__(self, idx: int,
                    rng: Optional[np.random.Generator] = None):
        # ``rng`` enables thread-parallel batch assembly (Generator objects
        # are not thread-safe)
        rng = rng or self.rng
        index, t = self.index_map[idx]
        label = self.labels[index]
        video = self.videos[index]
        clip = [
            self._resample_frame(
                np.asarray(video[t + i * self.step_between_clips], np.float64),
                rng,
            )
            for i in range(self.frames_per_clip)
        ]
        clip = np.stack(clip)                                    # [F, P, 3]

        centers = None
        if self.train:
            clip = clip * rng.uniform(0.9, 1.1, 3)
            clip /= 300.0
            clip -= np.mean(clip[len(clip) // 2], axis=0)
        else:
            clip /= 300.0
            centers = np.mean(clip, axis=1, keepdims=True)       # [F, 1, 3]
            clip = clip - centers
            centers = centers[:, 0, :]

        highres = clip.astype(np.float32)
        out = {"highres_pos": highres, "label": np.int32(label)}
        if self.return_lowres:
            k = int(self.num_points * self.fps_ratio)
            low = []
            for f in range(self.frames_per_clip):
                fps_idx, _ = farthest_point_sampling(highres[f], k, rng=rng)
                low.append(highres[f][fps_idx])
            out["lowres_pos"] = np.stack(low)
        if not self.train and centers is not None:
            out["centers"] = centers.astype(np.float32)
            out["video_index"] = np.int32(index)
        return out


def action_batch_iterator(
    dataset: MSRAction3DDataset,
    batch_size: int,
    seed: int = 0,
    shuffle: bool = True,
    endless: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """Batch iterator emitting frame-major [F, B, N, 3] arrays."""
    rng = np.random.default_rng(seed)
    seed_seq = np.random.SeedSequence(seed + 1)
    n = len(dataset)
    pool = ThreadPoolExecutor(max_workers=min(8, max(2, batch_size)))
    while True:
        order = rng.permutation(n) if shuffle else np.arange(n)
        for start in range(0, n - batch_size + 1, batch_size):
            child_seeds = seed_seq.spawn(batch_size)
            items = list(pool.map(
                lambda args: dataset.__getitem__(
                    int(args[0]), rng=np.random.default_rng(args[1])
                ),
                zip(order[start:start + batch_size], child_seeds),
            ))
            batch = {
                "highres_pos": np.stack([x["highres_pos"] for x in items], axis=1),
                "label": np.stack([x["label"] for x in items]),
            }
            if "lowres_pos" in items[0]:
                batch["lowres_pos"] = np.stack(
                    [x["lowres_pos"] for x in items], axis=1
                )
            if "video_index" in items[0]:
                batch["video_index"] = np.stack(
                    [x["video_index"] for x in items]
                )
            yield batch
        if not endless:
            return
