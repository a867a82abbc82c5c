"""Test configuration: force a virtual 8-device CPU mesh before JAX loads.

Multi-device tests run without real TPU hardware via
``--xla_force_host_platform_device_count`` (SURVEY.md §4 implication (e)).
"""

import os

# The axon sitecustomize pre-sets JAX_PLATFORMS=axon (TPU-over-tunnel) for
# every interpreter, so a plain setdefault would silently run "CPU" tests on
# the tunneled TPU. Force-override, and also update the live config in case
# jax was already imported by site machinery.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the GAN-step graphs take minutes to compile
# on XLA:CPU; cache them across test runs/rounds. Lives under ~/.cache so a
# /tmp wipe cannot push the cold suite past a 10-minute CI budget.
_cache_dir = os.path.expanduser("~/.cache/tpugan_jax_cpu")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + str(jax.devices()[:1])
)
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for mesh tests"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
