"""Checkpointing with the reference's manifest protocol.

Schema parity with SURVEY.md §2.2 / reference utils.py:7-63 and
train_tempo.py:300-317: one file per checkpoint holding
{sr_net, tempo_dis, spatial_dis, n_iter, sr_optim, tempo_optim,
spatial_optim} (the reference's three scheduler states are implicit here —
optax schedules derive the learning rate from the step count inside each
optimizer state), a newest-first ``latest_checkpoint.txt`` manifest with
``max_keep`` pruning, and a ``best_model.ckpt`` copy.

Serialization is flax msgpack (host-independent, no pickle).
"""

from __future__ import annotations

import os
import shutil
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Optional

import jax
from flax import serialization

from tpugan_tpu.train.state import GanTrainState

# Single-writer executor: checkpoint serialization + disk I/O happen off the
# training loop's critical path (the lightweight analog of orbax async
# checkpointing; jax arrays are immutable so handing the state to a thread
# is safe).
_EXECUTOR = ThreadPoolExecutor(max_workers=1)


def ensure_dir(dir_name: str) -> None:
    os.makedirs(dir_name, exist_ok=True)


def _manifest_path(save_dir: str) -> str:
    return os.path.join(save_dir, "latest_checkpoint.txt")


def save_checkpoint(
    state: GanTrainState,
    save_path: str,
    is_best: bool = False,
    max_keep: Optional[int] = None,
) -> None:
    """Serialize the full trainer state and rotate the manifest (reference
    utils.py:7-43)."""
    state = jax.device_get(state)
    payload = {
        "sr_net": {"params": state.sr.params, "batch_stats": state.sr.batch_stats},
        "tempo_dis": {"params": state.tempo.params, "batch_stats": state.tempo.batch_stats},
        "spatial_dis": {"params": state.spatial.params, "batch_stats": state.spatial.batch_stats},
        "n_iter": state.n_iter,
        "sr_optim": state.sr.opt_state,
        "tempo_optim": state.tempo.opt_state,
        "spatial_optim": state.spatial.opt_state,
    }
    save_dir = os.path.dirname(save_path) or "."
    ensure_dir(save_dir)
    with open(save_path, "wb") as fh:
        fh.write(serialization.to_bytes(payload))

    list_path = _manifest_path(save_dir)
    base = os.path.basename(save_path)
    ckpt_list = [base + "\n"]
    if os.path.exists(list_path):
        with open(list_path) as fh:
            ckpt_list += fh.readlines()

    if max_keep is not None:
        for entry in ckpt_list[max_keep:]:
            stale = os.path.join(save_dir, entry.strip())
            if os.path.exists(stale):
                os.remove(stale)
        ckpt_list = ckpt_list[:max_keep]

    with open(list_path, "w") as fh:
        fh.writelines(ckpt_list)

    if is_best:
        shutil.copyfile(save_path, os.path.join(save_dir, "best_model.ckpt"))


def _log_ckpt_failure(future: Future) -> None:
    exc = future.exception()
    if exc is not None:
        print(f"[checkpoint] async save FAILED: {exc!r}", flush=True)


def save_checkpoint_async(
    state: GanTrainState,
    save_path: str,
    is_best: bool = False,
    max_keep: Optional[int] = None,
) -> Future:
    """Queue a checkpoint save on the background writer thread; returns a
    Future (call ``.result()`` to join, e.g. before process exit).

    The device->host fetch happens *here, on the caller thread*: the training
    loop's jitted step donates the state pytree (donate_argnums=(0,)), so a
    deferred ``jax.device_get`` on the writer thread would race the next
    step's buffer donation and read deleted arrays. Failures of the
    background write are logged via a done-callback instead of being
    silently dropped."""
    state = jax.device_get(state)
    future = _EXECUTOR.submit(
        save_checkpoint, state, save_path, is_best, max_keep
    )
    future.add_done_callback(_log_ckpt_failure)
    return future


def load_checkpoint(
    ckpt_dir_or_file: str,
    target_state: GanTrainState,
    load_best: bool = False,
) -> GanTrainState:
    """Resolve a directory to its newest checkpoint via the manifest
    (reference utils.py:46-63) and restore into ``target_state``'s
    structure."""
    if os.path.isdir(ckpt_dir_or_file):
        if load_best:
            ckpt_path = os.path.join(ckpt_dir_or_file, "best_model.ckpt")
        else:
            with open(_manifest_path(ckpt_dir_or_file)) as fh:
                ckpt_path = os.path.join(
                    ckpt_dir_or_file, fh.readline().strip()
                )
    else:
        ckpt_path = ckpt_dir_or_file

    template = {
        "sr_net": {"params": target_state.sr.params, "batch_stats": target_state.sr.batch_stats},
        "tempo_dis": {"params": target_state.tempo.params, "batch_stats": target_state.tempo.batch_stats},
        "spatial_dis": {"params": target_state.spatial.params, "batch_stats": target_state.spatial.batch_stats},
        "n_iter": target_state.n_iter,
        "sr_optim": target_state.sr.opt_state,
        "tempo_optim": target_state.tempo.opt_state,
        "spatial_optim": target_state.spatial.opt_state,
    }
    with open(ckpt_path, "rb") as fh:
        restored = serialization.from_bytes(template, fh.read())
    print(f" [*] Loading checkpoint from {ckpt_path} succeed!")
    return GanTrainState(
        n_iter=restored["n_iter"],
        sr=target_state.sr.replace(
            params=restored["sr_net"]["params"],
            batch_stats=restored["sr_net"]["batch_stats"],
            opt_state=restored["sr_optim"],
        ),
        tempo=target_state.tempo.replace(
            params=restored["tempo_dis"]["params"],
            batch_stats=restored["tempo_dis"]["batch_stats"],
            opt_state=restored["tempo_optim"],
        ),
        spatial=target_state.spatial.replace(
            params=restored["spatial_dis"]["params"],
            batch_stats=restored["spatial_dis"]["batch_stats"],
            opt_state=restored["spatial_optim"],
        ),
    )
