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


def test_two_process_host_sharded_batch(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    # drop the axon sitecustomize: the distributed CPU cluster must not
    # try to grab the tunneled TPU
    env.pop("PYTHONSTARTUP", None)

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
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
            out, _ = p.communicate(timeout=200)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port
