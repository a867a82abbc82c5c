"""Fluid 3-frame siamese dataset + batch iterator.

Equivalent of the reference's ``SiamData`` (train_fluid/tempo_dataset.py):
load three consecutive npz frames, normalize all by the center frame's
centroid, cut one KDTree patch on the center frame, reuse the same patch /
FPS indices on the neighbor frames (particle identity is shared across
frames), jitter the low-res inputs, and emit fixed-shape frame-stacked
arrays ready for the jitted train step:

  {lowres_pos/vel [3, B, n, 3], highres_pos/vel [3, B, m, 3], h [B]}

Instead of torch DataLoader worker processes, batches are assembled in the
host process (numpy is releasing the GIL for the heavy parts) and the
iterator prefetches to device asynchronously via jnp.asarray's async
dispatch. The random-eviction frame cache mirrors
tempo_dataset.py:43-56.
"""

from __future__ import annotations

import os
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

from tpugan_tpu.data.sampling import normalize_point_cloud, sample_patch_with_fps


class SiamFluidDataset:
    def __init__(
        self,
        dataset_path: str,
        case_num: int,
        case_steps: int,
        case_prefix: str = "data",
        case_to_start: int = 1,
        sample_num: int = 9216,
        fps_ratio: float = 0.125,
        jitter: float = 0.003,
        cache_size: int = 2000,
        seed: int = 0,
        emit_lowres: bool = True,
    ):
        # emit_lowres=False skips the host FPS + jitter and omits the
        # lowres_* keys; the jitted train step then computes them on device
        # (train/step.py:device_sample_lowres — the TPU-native path for the
        # single-core host this runs on).
        self.dataset_path = dataset_path
        self.case_num = case_num
        self.case_steps = case_steps
        self.case_prefix = case_prefix
        self.case_to_start = case_to_start
        self.sample_num = sample_num
        self.fps_ratio = fps_ratio
        self.jitter = jitter
        self.cache: Dict[str, dict] = {}
        self.cache_size = cache_size
        self.rng = np.random.default_rng(seed)
        self.py_rng = random.Random(seed)
        self._cache_lock = threading.Lock()
        self.emit_lowres = emit_lowres

    def __len__(self) -> int:
        return self.case_num * (self.case_steps - 2)

    def _load(self, key: str) -> dict:
        if self.cache_size == 0:
            with np.load(os.path.join(self.dataset_path, key)) as z:
                return {"pos": z["pos"], "vel": z["vel"]}
        with self._cache_lock:
            if key in self.cache:
                return self.cache[key]
        with np.load(os.path.join(self.dataset_path, key)) as z:
            data = {"pos": z["pos"], "vel": z["vel"]}
        with self._cache_lock:
            if len(self.cache) >= self.cache_size:
                self.cache.pop(self.py_rng.choice(list(self.cache.keys())))
            self.cache[key] = data
        return data

    def __getitem__(
        self, idx: int, rng: Optional[np.random.Generator] = None
    ) -> Dict[str, np.ndarray]:
        # ``rng`` enables thread-parallel batch assembly (Generator objects
        # are not thread-safe; the iterator hands each item its own stream)
        rng = rng or self.rng
        case = idx // self.case_steps + self.case_to_start
        step = idx % (self.case_steps - 2)
        frames = [
            self._load(f"case{case}/{self.case_prefix}_{step + d}.npz")
            for d in range(3)
        ]

        pos_c, m, h = normalize_point_cloud(frames[1]["pos"].astype(np.float32))
        pos = [
            (frames[0]["pos"].astype(np.float32) - m) / h,
            pos_c,
            (frames[2]["pos"].astype(np.float32) - m) / h,
        ]
        vel = [f["vel"].astype(np.float32) / h for f in frames]

        _, patch_idx, fps_idx = sample_patch_with_fps(
            pos[1], sample_num=self.sample_num, fps_ratio=self.fps_ratio,
            rng=rng, fps=self.emit_lowres,
        )

        highres_pos = np.stack([p[patch_idx] for p in pos])        # [3, m, 3]
        highres_vel = np.stack([v[patch_idx] for v in vel])
        item = {
            "highres_pos": highres_pos,
            "highres_vel": highres_vel,
            "h": np.float32(h),
        }
        if self.emit_lowres:
            lowres_pos = highres_pos[:, fps_idx]                    # [3, n, 3]
            lowres_vel = highres_vel[:, fps_idx]
            lowres_pos = lowres_pos + rng.standard_normal(
                lowres_pos.shape
            ).astype(np.float32) * self.jitter
            item["lowres_pos"] = lowres_pos.astype(np.float32)
            item["lowres_vel"] = lowres_vel
        return item


def fluid_batch_iterator(
    dataset: SiamFluidDataset,
    batch_size: int,
    seed: int = 0,
    shuffle: bool = True,
    drop_last: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """Endless shuffled batch iterator emitting frame-major stacked arrays
    [3, B, N, 3] (+ per-sample h [B]); mirrors the reference's cycling
    DataLoader (train_tempo.py:208-222)."""
    rng = np.random.default_rng(seed)
    seed_seq = np.random.SeedSequence(seed + 1)
    n = len(dataset)
    # numpy/scipy and the native C++ kernels release the GIL, so a thread
    # pool gives real parallel item assembly (the torch-DataLoader-workers
    # analog, without process/pickling overhead).
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
            yield {
                k: np.stack([x[k] for x in items],
                            axis=0 if k == "h" else 1)
                for k in items[0]
            }
        if not drop_last and n % batch_size:
            pass  # fixed-shape training: partial batches are dropped
