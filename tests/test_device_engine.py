"""Parity: the fused on-device extraction engine vs the host engine.

The device engine (tropical/extract/device.py) re-implements the force-path
subdivision loop as one jitted program; with caps respected it must produce
the same skeleton as the host engine (same vertex/edge sets, same order).
"""

import numpy as np
import pytest


def _host_skeleton(net):
    import tropical.extract.subdivide as sp
    from tropical.extract.faces import extract_skeleton
    from tropical.extract.skeleton import grid_skeleton

    V, E = grid_skeleton(net)
    outputs = None
    for l in range(net.num_layers - 1):
        for h in range(net.num_hidden):
            V, E, outputs = sp.subpoly_(V, E, net, l, h, 1e-4, outputs,
                                        force=True)
    V, E, outputs = sp.subpoly_(V, E, net, net.num_layers - 2,
                                net.num_hidden, 1e-4, outputs, force=True)
    pre = (V.shape[0], E.shape[0])  # the funnel's "A/B" (subpoly.py:71-84)
    V, E, v_idx = extract_skeleton(V, E, outputs, net, 1e-4)
    return V, E, pre


def _device_skeleton(net):
    import jax.numpy as jnp

    from tropical.extract.device import default_caps, make_extract_fn
    from tropical.extract.skeleton import grid_skeleton

    V0, E0 = grid_skeleton(net)
    out0 = np.asarray(net.outputs(jnp.asarray(V0)))
    caps = default_caps(V0.shape[0], E0.shape[0])
    extract = make_extract_fn(net.spec, caps, 1e-4)

    Vp = np.zeros((caps.vcap, 3), np.float32)
    Vp[:V0.shape[0]] = V0
    Op = np.zeros((caps.vcap, 33), np.float32)
    Op[:V0.shape[0]] = out0
    Ep = np.zeros((caps.ecap, 2), np.int32)
    Ep[:E0.shape[0]] = E0
    V, OUT, E, _tris, meta = extract(
        net.params, net.marks, Vp, Op, Ep,
        np.int32(V0.shape[0]), np.int32(E0.shape[0]))
    m = np.asarray(meta)
    n_v, n_e, ovf, nV_pre, nE_pre = (int(x) for x in m[:5])
    assert ovf == 0, f"capacity overflow mask {ovf}"
    return (np.asarray(V[:n_v]), np.asarray(E[:n_e]).astype(np.int64),
            (nV_pre, nE_pre))


def test_device_matches_host(trained_net):
    Vh, Eh, pre_h = _host_skeleton(trained_net)
    Vd, Ed, pre_d = _device_skeleton(trained_net)

    # funnel "A/B" pre-filter counts must agree for golden-log parity
    assert pre_h == pre_d, (pre_h, pre_d)

    assert Vh.shape == Vd.shape, (Vh.shape, Vd.shape)
    assert Eh.shape == Ed.shape, (Eh.shape, Ed.shape)
    # forwards run at different batch paddings on the two engines, so matmul
    # tiling gives last-ulp output differences -> interpolation weights can
    # differ by ~1e-6
    np.testing.assert_allclose(Vd, Vh, atol=1e-4)
    np.testing.assert_array_equal(Ed, Eh)


def test_device_end_to_end(trained_net):
    import jax.numpy as jnp

    from tropical.extract.device import subpoly_device

    faces, vertices, tris = subpoly_device(trained_net, verbose=False)
    assert vertices.shape[0] > 100
    assert tris.shape[0] > 100
    sd = np.asarray(trained_net.sdf(jnp.asarray(vertices)))[:, 0]
    assert np.abs(sd).max() < 2e-2

    # second call takes the fused on-device skeleton path (caps memoized);
    # results must match the host-skeleton first call
    faces2, vertices2, tris2 = subpoly_device(trained_net, verbose=False)
    assert vertices2.shape == vertices.shape
    assert tris2.shape == tris.shape
    np.testing.assert_allclose(vertices2, vertices, atol=1e-4)


def test_slab_skeleton_matches_single_block(trained_net):
    """The slab-chunked skeleton (large lattices, M>128) must produce
    bit-identical buffers to the single-block variant: same compaction
    order, outputs recomputed per vertex instead of gathered."""
    from tropical.extract.device import (default_skel_caps, make_skeleton_fn,
                                         make_slab_skeleton_fn)

    net = trained_net
    M = int(net.marks.shape[0])
    sc = default_skel_caps(M)
    Vs, Os, Es, nVs, nEs, ovs = make_skeleton_fn(
        net.spec, sc, M, 1e-4)(net.params, net.marks)
    Vb, Ob, Eb, nVb, nEb, ovb = make_slab_skeleton_fn(
        net.spec, sc, M, 1e-4, slab=16)(net.params, net.marks)
    assert int(ovs) == 0 and int(ovb) == 0
    assert int(nVs) == int(nVb) and int(nEs) == int(nEb)
    n_v, n_e = int(nVs), int(nEs)
    np.testing.assert_array_equal(np.asarray(Es[:n_e]), np.asarray(Eb[:n_e]))
    np.testing.assert_array_equal(np.asarray(Vs[:n_v]), np.asarray(Vb[:n_v]))
    np.testing.assert_allclose(np.asarray(Os[:n_v]), np.asarray(Ob[:n_v]),
                               atol=1e-5)


def test_two_tier_dispatch_parity(trained_net):
    """Force a caps configuration large enough to enable the two-tier busy
    dispatcher; every busy step of the tiny fixture then runs the SMALL-tier
    pipeline, which must reproduce the single-tier result exactly."""
    import jax.numpy as jnp

    from tropical.extract.device import Caps, default_caps, make_extract_fn
    from tropical.extract.skeleton import grid_skeleton

    net = trained_net
    V0, E0 = grid_skeleton(net)
    out0 = np.asarray(net.outputs(jnp.asarray(V0)))
    base = default_caps(V0.shape[0], E0.shape[0])
    assert base.ccap < 32768  # fixture is small: single-tier by default
    import dataclasses
    big = dataclasses.replace(base, ccap=32768, pcap=max(base.pcap, 327680),
                              vcap=base.vcap + 8 * 32768,
                              ecap=base.ecap + 8 * 32768)

    def run(caps):
        extract = make_extract_fn(net.spec, caps, 1e-4)
        Vp = np.zeros((caps.vcap, 3), np.float32)
        Vp[:V0.shape[0]] = V0
        Op = np.zeros((caps.vcap, 33), np.float32)
        Op[:V0.shape[0]] = out0
        Ep = np.zeros((caps.ecap, 2), np.int32)
        Ep[:E0.shape[0]] = E0
        V, OUT, E, _t, meta = extract(
            net.params, net.marks, Vp, Op, Ep,
            np.int32(V0.shape[0]), np.int32(E0.shape[0]))
        m = np.asarray(meta)
        assert int(m[2]) == 0, f"overflow {int(m[2])}"
        return np.asarray(V[:int(m[0])]), np.asarray(E[:int(m[1])])

    V1, E1 = run(base)   # single tier
    V2, E2 = run(big)    # two-tier dispatcher, small tier taken
    np.testing.assert_array_equal(E1, E2)
    np.testing.assert_allclose(V1, V2, atol=0)
