"""End-to-end integration: train a small SDF on the sphere, extract, compare.

This is the reference's de-facto integration test formalized (SURVEY §4.3):
chamfer distance of the extracted polyhedral complex against a marching-
tetrahedra pseudo-GT, plus the on-surface invariant on extracted vertices.
Kept small so the CPU suite stays fast.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest  # noqa: F401  (trained_net fixture lives in conftest)


def test_end_to_end_extraction(trained_net):
    from tropical.extract.subdivide import subpoly
    from tropical.utils.chamfer import chamfer_distance
    from tropical.utils.isosurface import run_marching_tetrahedra

    net = trained_net
    faces, vertices, tris = subpoly(net, 3, 1.2, force=True, verbose=False)

    assert vertices.shape[0] > 100
    assert tris.shape[0] > 100
    assert tris.min() >= 0 and tris.max() < vertices.shape[0]

    # on-surface invariant (approximate in force mode)
    sd = np.asarray(net.sdf(jnp.asarray(vertices)))[:, 0]
    assert np.abs(sd).max() < 2e-2
    assert np.median(np.abs(sd)) < 2e-3

    # against the grid pseudo-GT
    gt = run_marching_tetrahedra(net, 48, 1.2)
    cd = chamfer_distance(vertices, np.asarray(gt.vertices, np.float32))
    assert cd < 0.05, f"chamfer vs MT-48 too large: {cd}"


def test_curved_path_exactness(trained_net):
    """force=False: every surviving vertex is on the surface to eps."""
    from tropical.extract.subdivide import subpoly

    net = trained_net
    faces, vertices, tris = subpoly(net, 3, 1.2, force=False, verbose=False)
    assert vertices.shape[0] > 50
    sd = np.asarray(net.sdf(jnp.asarray(vertices)))[:, 0]
    assert np.abs(sd).max() < 2e-4  # eps plus float slack


def test_extraction_winding_outward(trained_net):
    """Exported triangle normals point outward (away from positive sdf)."""
    from tropical.extract.subdivide import subpoly

    net = trained_net
    _, vertices, tris = subpoly(net, 3, 1.2, force=True, verbose=False)
    v = vertices[tris]
    n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    centers = v.mean(1).astype(np.float32)
    grad = np.asarray(net.normal(jnp.asarray(centers)))
    dots = (n * grad).sum(-1)
    assert (dots < 0).mean() > 0.95
