"""C++ host BVH vs the TPU brute-force oracle."""

import numpy as np
import pytest

from tropical.utils import bvh_host
from tropical.utils.procedural import icosphere

pytestmark = pytest.mark.skipif(not bvh_host.available(),
                                reason="C++ toolchain unavailable")


def test_signed_distance_matches_tpu_oracle():
    from tropical.ops.mesh_queries import MeshQuery

    mesh = icosphere(3)
    bvh = bvh_host.HostBVH(mesh.vertices, mesh.faces)
    mq = MeshQuery(mesh.vertices, mesh.faces)

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.4, 1.4, (512, 3)).astype(np.float32)
    sd_cpp = bvh.signed_distance(pts)
    sd_jax = mq.signed_distance(pts)
    np.testing.assert_allclose(sd_cpp, sd_jax, atol=2e-5)


def test_ray_trace_matches_tpu_oracle():
    from tropical.ops.mesh_queries import MeshQuery
    from tropical.utils.chamfer import get_rays

    mesh = icosphere(3)
    bvh = bvh_host.HostBVH(mesh.vertices, mesh.faces)
    mq = MeshQuery(mesh.vertices, mesh.faces)

    rays_o, rays_d = get_rays(512)
    pos_c, fid_c, t_c = bvh.ray_trace(rays_o, rays_d)
    pos_j, fid_j, t_j = mq.ray_trace(rays_o, rays_d)
    np.testing.assert_array_equal(fid_c >= 0, fid_j >= 0)
    np.testing.assert_allclose(t_c, t_j, atol=1e-4)
    np.testing.assert_array_equal(fid_c, fid_j)


def test_empty_mesh_no_crash():
    """A 0-triangle mesh (undertrained SDF's empty MC row in the eval
    ladder) must trace to zero hits, not walk off nodes[-1]: the empty
    root leaf has count==0 and its inverted AABB passes the slab test for
    axis-aligned rays via inf arithmetic."""
    from tropical.utils.chamfer import sample_surface_from_rays
    from tropical.utils.ply import Mesh

    v = np.zeros((0, 3), np.float32)
    f = np.zeros((0, 3), np.int32)
    bvh = bvh_host.HostBVH(v, f)
    o = np.zeros((8, 3), np.float32)
    d = np.tile(np.array([0, 0, 1], np.float32), (8, 1))
    _, fid, _ = bvh.ray_trace(o, d)
    assert int((fid >= 0).sum()) == 0

    hits, normals, mask = sample_surface_from_rays(
        o, d, Mesh(v, f.astype(np.int64)), return_normal=True)
    assert hits.shape == (0, 3) and normals.shape == (8, 3)
    assert not mask.any()
