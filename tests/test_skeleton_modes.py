"""Skeleton pruning modes: sign (default) vs distance give identical meshes."""

import numpy as np

import tropical.extract.skeleton as sk
import tropical.extract.subdivide as sp


def test_sign_and_distance_same_final_skeleton(trained_net):
    net = trained_net
    results = {}
    orig = sk.grid_skeleton
    for mode in ("sign", "distance"):
        sp.grid_skeleton = lambda net, unit=128, m=mode: orig(net, unit, m)
        try:
            _, V, T = sp.subpoly(net, 3, 1.2, force=True, verbose=False,
                                 engine="host")
        finally:
            sp.grid_skeleton = orig
        results[mode] = (V, T)

    Vs, Ts = results["sign"]
    Vd, Td = results["distance"]
    assert Vs.shape == Vd.shape, (Vs.shape, Vd.shape)
    assert Ts.shape == Td.shape
    a = Vs[np.lexsort(Vs.T)]
    b = Vd[np.lexsort(Vd.T)]
    np.testing.assert_allclose(a, b, atol=0)
