"""The caps overflow-retry ramp (device.py root-cause retries) under stress.

Production TPU runs rely on: (a) deliberately-too-small caps converging
through OVF_* retries to the same result as roomy caps, (b) the tight caps
memoized from a successful run's high-water marks giving a zero-overflow
one-shot on the next call.  Neither was covered by a direct test before —
defaults rarely overflow on the fixture.
"""

import dataclasses

import numpy as np


def _sorted(V):
    return V[np.lexsort(V.T)]


def test_caps_retry_ramp_converges(trained_net):
    from tropical.extract import device as dv

    net = trained_net
    M = int(net.marks.shape[0])

    # 1. reference result at (memoized or default) caps
    _, V0, T0 = dv.subpoly_device(net, verbose=False, force=True)
    key = (net.spec, M, True, "dist", dv._net_digest(net))
    good = dv._GOOD_CAPS.get(key)
    assert good is not None, "successful run must memoize tight caps"

    # 2. shrink the candidate/pair buffers below the fixture's needs and
    #    drop the memo so the run must ramp through OVF_C / OVF_P retries
    dv._GOOD_CAPS.pop(key, None)
    tiny = dataclasses.replace(
        good,
        ccap=max(good.ccap // 4, 512),
        pcap=max(good.pcap // 4, 2048),
        conncap=max(good.conncap // 4, 1024),
        cvcap=0, gcap=0)
    _, V1, T1 = dv.subpoly_device(net, verbose=False, force=True, caps=tiny)

    assert V1.shape == V0.shape, (V1.shape, V0.shape)
    assert T1.shape == T0.shape
    np.testing.assert_allclose(_sorted(V1), _sorted(V0), atol=0)

    # 3. the ramp's success memoized fresh tight caps; the next call takes
    #    the fused zero-overflow path and both result and caps are stable
    memo = dv._GOOD_CAPS.get(key)
    assert memo is not None
    _, V2, T2 = dv.subpoly_device(net, verbose=False, force=True)
    assert V2.shape == V0.shape
    np.testing.assert_allclose(_sorted(V2), _sorted(V0), atol=0)
    assert dv._GOOD_CAPS.get(key) == memo, "caps must be hysteresis-stable"


def test_caps_exhausted_falls_back_to_host(trained_net, monkeypatch):
    """If the ramp runs out of attempts, subpoly must finish on the host
    engine instead of raising (capacity, not correctness)."""
    from tropical.extract import device as dv
    from tropical.extract import subdivide as sp

    net = trained_net
    _, Vh, Th = sp.subpoly(net, 3, 1.2, force=True, verbose=False,
                           engine="host")

    def exhausted(*a, **k):
        raise dv.CapsExhausted("test: simulated ramp exhaustion")

    monkeypatch.setattr(dv, "subpoly_device", exhausted)
    _, Vf, Tf = sp.subpoly(net, 3, 1.2, force=True, verbose=False,
                           engine="device")
    assert Vf.shape == Vh.shape
    np.testing.assert_allclose(_sorted(Vf), _sorted(Vh), atol=0)


def test_curved_cvcap_ramp(trained_net):
    """Force=False with a starved curved side buffer: OVF_Q must ramp cvcap
    up and converge to the unstarved result."""
    from tropical.extract import device as dv

    net = trained_net
    M = int(net.marks.shape[0])

    _, V0, T0 = dv.subpoly_device(net, verbose=False, force=False)
    key = (net.spec, M, False, "dist", dv._net_digest(net))
    good = dv._GOOD_CAPS.get(key)
    assert good is not None

    dv._GOOD_CAPS.pop(key, None)
    tiny = dataclasses.replace(good, cvcap=256)
    _, V1, T1 = dv.subpoly_device(net, verbose=False, force=False, caps=tiny)
    assert V1.shape == V0.shape, (V1.shape, V0.shape)
    np.testing.assert_allclose(_sorted(V1), _sorted(V0), atol=0)


def test_caps_keyed_per_checkpoint(trained_net):
    """Two nets sharing a spec but not weights must NOT share caps entries:
    one checkpoint's memoized tight caps overwriting another's costs the
    loser a fresh XLA compile every alternating run (sphere vs torus small,
    observed on the v5e)."""
    import jax

    from tropical.core.net import TropicalNet
    from tropical.extract import device as dv

    net = trained_net
    other = TropicalNet(net.spec, key=jax.random.PRNGKey(123))
    assert dv._net_digest(net) != dv._net_digest(other)

    # a successful run memoizes under the digested key only
    dv.subpoly_device(net, verbose=False, force=True)
    M = int(net.marks.shape[0])
    assert (net.spec, M, True, "dist", dv._net_digest(net)) in dv._GOOD_CAPS
    assert (net.spec, M, True, "dist",
            dv._net_digest(other)) not in dv._GOOD_CAPS
