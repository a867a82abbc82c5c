"""Scalar telemetry: TensorBoard when available, JSONL always.

The reference logs six scalars per step via tensorboardX
(train_tempo.py:253-254; keys from train_step_final.py:222-229). Here the
same keys go to TensorBoard if tensorboardX is importable, and always to a
``metrics.jsonl`` file so headless CI can assert on curves. Device scalars
are fetched asynchronously every ``flush_every`` steps, never per step —
the host-sync-free discipline of SURVEY.md §7 hard part 7.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List

import numpy as np


class MetricWriter:
    def __init__(self, log_dir: str, flush_every: int = 20):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl_path = os.path.join(log_dir, "metrics.jsonl")
        self._jsonl = open(self.jsonl_path, "a")
        self.flush_every = flush_every
        self._pending: List[tuple] = []
        try:
            from tensorboardX import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(log_dir)
        except Exception:
            self._tb = None

    def add(self, step: int, metrics: Dict) -> None:
        """Queue possibly-device-resident scalars; fetched on flush."""
        self._pending.append((step, metrics))
        if len(self._pending) >= self.flush_every:
            self.flush()

    def flush(self) -> None:
        if not self._pending:
            return
        # ONE device->host transfer for the whole backlog: per-scalar
        # np.asarray costs a full tunnel round-trip each (flush_every x
        # n_metrics of them dominated the train-loop wall clock); a single
        # device_get of the stacked pytree is one transfer.
        import jax

        fetched = jax.device_get([m for _, m in self._pending])
        for (step, _), host_m in zip(self._pending, fetched):
            host = {k: float(v) for k, v in host_m.items()}
            self._jsonl.write(json.dumps({"step": step, **host}) + "\n")
            if self._tb is not None:
                for k, v in host.items():
                    self._tb.add_scalar(k, v, global_step=step)
        self._pending.clear()
        self._jsonl.flush()

    def close(self) -> None:
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """prepare/process wall-time split like the reference's tqdm telemetry
    (train_tempo.py:205,237; train_msr.py:225-227 compute_efficiency)."""

    def __init__(self):
        self._t = time.time()
        self.prepare_time = 0.0
        self.process_time = 0.0

    def data_ready(self):
        now = time.time()
        self.prepare_time = now - self._t
        self._t = now

    def step_done(self):
        now = time.time()
        self.process_time = now - self._t
        self._t = now

    @property
    def compute_efficiency(self) -> float:
        total = self.prepare_time + self.process_time
        return self.process_time / total if total else 0.0
