"""Tests for PLY IO, mesh queries, chamfer, and marching tetrahedra."""

import os
import tempfile

import numpy as np

from tropical.ops.mesh_queries import MeshQuery
from tropical.utils.chamfer import (angular_distance, chamfer_distance,
                                    get_rays, sample_surface_from_rays)
from tropical.utils.isosurface import grid_tetrahedra, marching_tetrahedra
from tropical.utils.ply import Mesh, read_ply, write_ply
from tropical.utils.procedural import icosphere, torus


def test_ply_roundtrip():
    mesh = icosphere(1)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.ply")
        write_ply(path, mesh.vertices, mesh.faces)
        back = read_ply(path)
    np.testing.assert_allclose(back.vertices, mesh.vertices, atol=1e-6)
    np.testing.assert_array_equal(back.faces, mesh.faces)


def test_ply_ascii_reader():
    ascii_ply = (
        "ply\nformat ascii 1.0\n"
        "element vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 2\nproperty list uchar int vertex_indices\n"
        "end_header\n"
        "0 0 0\n1 0 0\n0 1 0\n0 0 1\n"
        "3 0 1 2\n4 0 1 2 3\n")  # second face is a quad -> fan-triangulated
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "a.ply")
        with open(path, "w") as f:
            f.write(ascii_ply)
        mesh = read_ply(path)
    assert mesh.vertices.shape == (4, 3)
    assert mesh.faces.shape == (3, 3)  # 1 tri + quad fan (2 tris)
    np.testing.assert_array_equal(mesh.faces[1:], [[0, 1, 2], [0, 2, 3]])


def test_signed_distance_sphere():
    mesh = icosphere(3)  # radius-1 sphere, 1280 faces
    mq = MeshQuery(mesh.vertices, mesh.faces)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.5, 1.5, (256, 3)).astype(np.float32)
    sd = mq.signed_distance(pts)
    r = np.linalg.norm(pts, axis=-1)
    # inside positive, analytic value 1 - r (icosphere slightly inside the
    # unit sphere, so allow a coarse tolerance)
    np.testing.assert_allclose(sd, 1 - r, atol=0.02)


def test_ray_trace_sphere():
    mesh = icosphere(3)
    mq = MeshQuery(mesh.vertices, mesh.faces)
    rays_o, rays_d = get_rays(512)
    pos, fid, t = mq.ray_trace(rays_o, rays_d)
    assert (fid >= 0).all()  # all rays from origin hit the sphere
    r = np.linalg.norm(pos, axis=-1)
    np.testing.assert_allclose(r, 1.0, atol=0.02)


def test_sample_surface_backend_parity(monkeypatch):
    """The host-BVH routing (huge meshes / TROPICAL_RAYS=host) returns the
    same hits as the TPU brute-force path."""
    import pytest

    from tropical.utils import bvh_host

    if not bvh_host.available():
        pytest.skip("no C++ toolchain for the host BVH")
    mesh = icosphere(3)
    rays_o, rays_d = get_rays(256)
    monkeypatch.setenv("TROPICAL_RAYS", "tpu")
    p1, n1, m1 = sample_surface_from_rays(rays_o, rays_d, mesh,
                                          return_normal=True)
    monkeypatch.setenv("TROPICAL_RAYS", "host")
    p2, n2, m2 = sample_surface_from_rays(rays_o, rays_d, mesh,
                                          return_normal=True)
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_allclose(p1, p2, atol=1e-5)
    np.testing.assert_allclose(n1, n2, atol=1e-5)


def test_sample_surface_normals_outward():
    mesh = icosphere(3)
    rays_o, rays_d = get_rays(256)
    pos, normals, mask = sample_surface_from_rays(rays_o, rays_d, mesh,
                                                  return_normal=True)
    # icosphere winding is CCW from outside: normals point outward,
    # aligned with the hit position direction
    dots = (normals[mask] * pos / np.linalg.norm(pos, axis=-1, keepdims=True)).sum(-1)
    assert (dots > 0.9).all()


def test_chamfer_distance_known_offset():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(500, 3)).astype(np.float32)
    y = x + np.asarray([0.01, 0, 0], np.float32)
    cd = chamfer_distance(x, y)
    assert cd <= 0.01 + 1e-5
    assert cd > 0.0


def test_angular_distance():
    x = np.asarray([[1.0, 0, 0], [0, 1, 0]])
    mean, std = angular_distance(x, x)
    assert mean < 1e-3
    y = np.asarray([[0.0, 1, 0], [0, 0, 1]])
    mean, _ = angular_distance(x, y)
    assert abs(mean - 90) < 1e-3


def test_marching_tetrahedra_sphere():
    # analytic sphere SDF on a grid; MT mesh radius ~= 0.6
    n = 24
    s = np.linspace(-1, 1, n, dtype=np.float32)
    gx, gy, gz = np.meshgrid(s, s, s, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    sdf = 0.6 - np.linalg.norm(pts, axis=-1)  # inside positive
    tets = grid_tetrahedra(n, n)
    verts, tris = marching_tetrahedra(pts, tets, sdf)
    assert len(verts) > 100 and len(tris) > 100
    r = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(r, 0.6, atol=0.01)
    assert tris.min() >= 0 and tris.max() < len(verts)
    # orientation: normals point outward (toward negative region)
    v = verts[tris]
    nrm = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    centers = v.mean(1)
    dots = (nrm * centers).sum(-1)
    assert (dots > 0).mean() > 0.99


def test_dataset_sphere_labels():
    from tropical.stanford.dataset import StanfordDataset

    ds = StanfordDataset("sphere", rng=np.random.default_rng(0), n_samples=512)
    assert ds.X.shape == (512, 3)
    # normalized sphere has radius 1 in the dataset frame; labels ~ 1 - r
    r = np.linalg.norm(ds.X, axis=-1)
    np.testing.assert_allclose(ds.Y, 1 - r, atol=0.03)
