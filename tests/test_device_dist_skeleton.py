"""Distance-mode device skeleton: same final mesh as sign mode, smaller start.

The device engine defaults to the Lipschitz-distance-pruned initial lattice
(reference PRUNING_MODE default, tropical.py:188) with a slab-local gradient
bound.  The final mesh must be identical to the sign-pruned host engine's
(same vertex SET — ordering may differ because the start sets differ), and
the start set must actually shrink.
"""

import numpy as np
import pytest


def _sorted(V):
    return V[np.lexsort(V.T)]


def test_dist_pool_k_uniform():
    from tropical.extract.device import _dist_pool_k

    mk = np.linspace(0.0, 1.0, 33)
    k = _dist_pool_k(mk)
    # reach = sqrt(3)*2*h ~ 3.46h over spacing h -> 3 planes either side
    assert k == 3, k


def test_dist_skeleton_smaller_and_same_mesh(trained_net):
    from tropical.extract import device as dv

    net = trained_net

    # standalone skeletons: dist never keeps MORE than sign.  On this coarse
    # M=23 fixture the Lipschitz bound ~ sqrt(3)*2*max_cell*|grad| exceeds
    # the net's tanh plateau, so it prunes ~nothing (measured: equality here,
    # but 5.3x fewer edges on the committed medium checkpoint where cells
    # are fine relative to the plateau — see scripts/bench_scale.py).
    M = int(net.marks.shape[0])
    sc = dv.default_skel_caps(M)
    dk = dv._dist_pool_k(np.asarray(net.marks))
    _, _, _, nVs, nEs, ovs = dv.make_skeleton_fn(
        net.spec, sc, M, 1e-4, mode="sign")(net.params, net.marks)
    _, _, _, nVd, nEd, ovd = dv.make_skeleton_fn(
        net.spec, sc, M, 1e-4, mode="dist", dist_k=dk)(net.params, net.marks)
    assert int(ovs) == 0 and int(ovd) == 0
    assert int(nEd) <= int(nEs), (int(nEd), int(nEs))
    assert int(nVd) <= int(nVs), (int(nVd), int(nVs))

    # end-to-end device extraction: dist mode must yield the IDENTICAL final
    # vertex set as sign mode (the dropped lattice edges are exactly those
    # whose subdivision products the loop prunes anyway).  Compared against
    # the device sign run, not the host engine: the two engines compute the
    # skeleton outputs at different batch paddings, so eps-boundary sign
    # flips between them are expected (see test_device_curved.py) — within
    # the device engine the per-row math is identical across modes.
    _, Vs, Ts = dv.subpoly_device(net, verbose=False, force=True,
                                  skeleton_mode="sign")
    _, Vd, Td = dv.subpoly_device(net, verbose=False, force=True,
                                  skeleton_mode="dist")
    assert Vd.shape == Vs.shape, (Vd.shape, Vs.shape)
    assert Td.shape == Ts.shape
    np.testing.assert_allclose(_sorted(Vd), _sorted(Vs), atol=0)


def test_dist_skeleton_curved_path(trained_net):
    """force=False (curved) through the dist skeleton: surface invariant and
    set-parity with the host engine (same tolerance scheme as
    tests/test_device_curved.py)."""
    import jax.numpy as jnp

    from tropical.extract.device import subpoly_device
    from tropical.extract.subdivide import subpoly

    net = trained_net
    _, Vh, _ = subpoly(net, 3, 1.2, force=False, verbose=False,
                       engine="host")
    _, Vd, _ = subpoly_device(net, force=False, verbose=False,
                              skeleton_mode="dist")

    assert abs(Vd.shape[0] - Vh.shape[0]) <= max(5, int(0.005 * Vh.shape[0]))
    from scipy.spatial import cKDTree

    d_hd = cKDTree(Vd).query(Vh)[0]
    d_dh = cKDTree(Vh).query(Vd)[0]
    assert (d_hd > 1e-5).sum() <= max(5, int(0.005 * Vh.shape[0]))
    assert (d_dh > 1e-5).sum() <= max(5, int(0.005 * Vd.shape[0]))
    sd = np.asarray(net.sdf(jnp.asarray(Vd)))[:, 0]
    assert np.abs(sd).max() < 2e-4
