"""Two-process multi-host test for the host-sharded input pipeline.

Exercises ``initialize_distributed`` + ``host_local_batch_to_global``
(tpugan_tpu/parallel/mesh.py) across a REAL process boundary: two
subprocesses form a jax.distributed CPU cluster (2 virtual devices each,
4 global), each contributes its host-local half of the global batch, and a
jitted global reduction must see both halves. This is the multi-host data
sharding of SURVEY.md §2.4's TPU-native plan — on real hardware the same
code runs one process per host over DCN.
"""

import os
import socket
import subprocess
import sys

import pytest

# compile-heavy / subprocess tier — deselect with -m 'not slow' for the
# quick unit run
pytestmark = pytest.mark.slow

_WORKER = r"""
import os, sys
import numpy as np

proc_id = int(sys.argv[1])
coord = sys.argv[2]

import jax
from tpugan_tpu.parallel.mesh import (
    initialize_distributed, make_mesh, host_local_batch_to_global,
)

try:
    initialize_distributed(
        coordinator_address=coord, num_processes=2, process_id=proc_id,
    )
except Exception as e:  # surface the real failure in the test output
    raise SystemExit(f"distributed init failed: {type(e).__name__}: {e}")
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

mesh = make_mesh()

# global batch: frame-major [F=2, B=4, N=8, 3]; process p holds B slots
# [2p, 2p+2) filled with value p*100 + slot
B_local = 2
local = np.zeros((2, B_local, 8, 3), np.float32)
for j in range(B_local):
    local[:, j] = proc_id * 100 + (proc_id * B_local + j)
batch = {"pos": local}

global_batch = host_local_batch_to_global(batch, mesh)
assert global_batch["pos"].shape == (2, 2 * B_local, 8, 3)

import jax.numpy as jnp
# per-sample means, replicated output: forces a cross-host collective
f = jax.jit(lambda b: jnp.mean(b["pos"], axis=(0, 2, 3)),
            out_shardings=jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()))
got = np.asarray(f(global_batch))
want = np.array([0.0, 1.0, 102.0, 103.0], np.float32)
np.testing.assert_allclose(got, want, rtol=0, atol=0)
print(f"proc {proc_id} OK", flush=True)
"""


_GAN_WORKER = r"""
import os, sys
import numpy as np

proc_id = int(sys.argv[1])
coord = sys.argv[2]

import jax
from tpugan_tpu.parallel.mesh import (
    initialize_distributed, make_mesh, host_local_batch_to_global,
    replicated,
)

try:
    initialize_distributed(
        coordinator_address=coord, num_processes=2, process_id=proc_id,
    )
except Exception as e:
    raise SystemExit(f"distributed init failed: {type(e).__name__}: {e}")
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

from tpugan_tpu.config import FluidTrainConfig
from tpugan_tpu.train import init_fluid_state, make_fluid_gan_step

# the __graft_entry__.dryrun_multichip config at two samples per device:
# ml_gate=10 forces the adversarial branch live, even iter 2 runs both D
# updates, device_sampling exercises fps_pallas under GSPMD partitioning
cfg = FluidTrainConfig(
    batch_size=4, patch_size=128, fps_ratio=0.125, upsample_ratio=8,
    node_embedding=32, use_vel=True, in_node_feats=6, ml_gate=10.0,
    device_sampling=True,
)
mesh = make_mesh()
models, txs, state = init_fluid_state(cfg, jax.random.PRNGKey(0))
step = make_fluid_gan_step(models, txs, cfg, mesh=mesh)

# every process derives the same GLOBAL batch from the shared seed and
# contributes only its host-local B slots — the multi-host input protocol
rng = np.random.default_rng(0)
m = cfg.lowres_size * cfg.upsample_ratio
def frames(size):
    return rng.standard_normal((3, cfg.batch_size, size, 3)).astype(np.float32)
full = {"highres_pos": frames(m) * 0.3, "highres_vel": frames(m)}
lo, hi = proc_id * 2, proc_id * 2 + 2
local = {k: v[:, lo:hi] for k, v in full.items()}
batch = host_local_batch_to_global(local, mesh)
for v in batch.values():
    assert v.shape[1] == cfg.batch_size, v.shape

repl = replicated(mesh)
state = jax.tree_util.tree_map(
    lambda a: jax.make_array_from_process_local_data(repl, np.asarray(a)),
    state)

import jax.numpy as jnp
printed = []
for i in range(2):
    key = jax.make_array_from_process_local_data(
        repl, np.asarray(jax.random.PRNGKey(1 + i)))
    state, metrics = step(state, batch, key)
    vals = {k: float(v) for k, v in sorted(metrics.items())}
    assert all(np.isfinite(v) for v in vals.values()), vals
    assert vals["tempo_G_loss"] != 0.0 and vals["spatial_G_loss"] != 0.0
    printed.append(vals)
assert printed[1]["tempo_D_loss"] != 0.0
assert printed[1]["spatial_D_loss"] != 0.0
# cross-host agreement: replicated outputs must be identical on both
# processes — printed and diffed by the parent
print(f"METRICS {proc_id} {printed!r}", flush=True)
print(f"proc {proc_id} OK", flush=True)
"""


def _run_two_process(tmp_path, worker_src, timeout):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    env.pop("PYTHONSTARTUP", None)

    script = tmp_path / "worker.py"
    script.write_text(worker_src)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), coord],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out
    return outs


def test_two_process_gan_train_step(tmp_path):
    """Full data-parallel fluid GAN step across a REAL process boundary:
    2 processes x 2 virtual CPU devices form the 4-device mesh, each host
    contributes its local half of the batch, and the replicated metrics
    must come back finite, adversarial-live, and IDENTICAL on both hosts
    (the GSPMD gradient all-reduce spans the process boundary)."""
    outs = _run_two_process(tmp_path, _GAN_WORKER, timeout=900)
    metrics = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("METRICS "):
                _, pid, rest = line.split(" ", 2)
                metrics[int(pid)] = rest
    assert set(metrics) == {0, 1}, f"missing METRICS lines:\n{outs}"
    assert metrics[0] == metrics[1], (
        f"cross-host metric divergence:\n{metrics[0]}\n{metrics[1]}")


def test_two_process_host_sharded_batch(tmp_path):
    _run_two_process(tmp_path, _WORKER, timeout=200)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port
