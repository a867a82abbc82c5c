"""The driver entry points must be exercised by CI, not just by the driver.

``dryrun_multichip`` is the judged multi-chip evidence (SURVEY.md §2.4 /
BASELINE north star): it must run the FULL adversarial fluid GAN step —
including FlowEmbedding/SetConv towers, BatchNorm/dropout, and both
discriminator updates — under a real 8-device data-parallel mesh. Under
conftest the process already holds the 8-CPU virtual mesh, so the in-process
path runs (no subprocess re-exec)."""

import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft
import pytest

# compile-heavy / subprocess tier — deselect with -m 'not slow' for the quick unit run
pytestmark = pytest.mark.slow


def test_force_cpu_mesh_in_process():
    # conftest already forced cpu x 8, so the in-process path must be taken
    assert graft._force_cpu_mesh(8)
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8


def test_dryrun_multichip_adversarial_and_d_updates():
    # asserts internally: finite metrics, nonzero tempo/spatial G losses on
    # both steps, nonzero D losses on the even iteration
    graft.dryrun_multichip(8)


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    padded, valid = jax.jit(fn)(*args)
    assert padded.shape == (1, 1152 * 8, 3)
    assert valid.shape == (1, 1152 * 8)
    assert bool(valid.any())
