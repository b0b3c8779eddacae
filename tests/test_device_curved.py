"""Parity of the device engine's curved (force=False) path vs the host engine.

Unlike the flat path (bit-identical), the curved path computes fresh
eps-thresholded quantities (quartic roots, GD residuals, strict filters)
whose last-ulp float differences across the two execution schedules can flip
individual candidates at the eps boundary — so parity here is set-based with
a small tolerance, plus the exactness invariant.
"""

import numpy as np


def test_device_curved_matches_host(trained_net):
    import jax.numpy as jnp

    from tropical.extract.device import subpoly_device
    from tropical.extract.subdivide import subpoly

    net = trained_net
    _, Vh, Th = subpoly(net, 3, 1.2, force=False, verbose=False,
                        engine="host")
    _, Vd, Td = subpoly_device(net, force=False, verbose=False)

    # vertex counts within 0.5% (eps-boundary flips only)
    assert abs(Vd.shape[0] - Vh.shape[0]) <= max(5, int(0.005 * Vh.shape[0]))

    # the two vertex sets coincide except for a handful of boundary cases
    from scipy.spatial import cKDTree

    d_hd = cKDTree(Vd).query(Vh)[0]
    d_dh = cKDTree(Vh).query(Vd)[0]
    assert (d_hd > 1e-5).sum() <= max(5, int(0.005 * Vh.shape[0]))
    assert (d_dh > 1e-5).sum() <= max(5, int(0.005 * Vd.shape[0]))

    # the exactness invariant: every vertex on the surface to eps
    sd = np.asarray(net.sdf(jnp.asarray(Vd)))[:, 0]
    assert np.abs(sd).max() < 2e-4


def _kinked_net(r_max=8, levels=4, scale=3000.0, key=0):
    """A synthetic net with violently kinked trilinear surfaces: the scaled
    random table makes most split edges curved, the quartic solver returns
    out-of-range/no-root sentinels in bulk (incl. the bilinear-degenerate -1
    sentinel, geometry.py:70-138), and the strict filter drops them."""
    import jax
    import jax.numpy as jnp

    from tropical.core import NetSpec, TropicalNet

    spec = NetSpec(num_layers=3, num_hidden=16, levels=levels, r_min=2,
                   r_max=r_max, T=19)
    net = TropicalNet(spec, key=jax.random.PRNGKey(key))
    net.params["table"] = net.params["table"] * scale
    net.enc.params = net.params["table"]
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(-1, 1, (512, 3)).astype(np.float32))
    out, _ = net(x, gather=True)
    b = np.asarray(net.params["mlp"]["b"][2]).copy()
    b[1] -= np.asarray(out[:, 1] - out[:, 0]).mean()
    net.params["mlp"]["b"][2] = jnp.asarray(b)
    return net


def test_device_curved_stage_meters_match_host():
    """The fused program's curved failover stages provably FIRE, and their
    event totals (device LAST_HW[13:16]) agree with the host engine's
    counters to eps-boundary tolerance: thousands of no-root sentinel rows
    and strict-filter drops on this fixture."""
    import jax.numpy as jnp

    from tropical.extract import device as dv
    from tropical.extract import failover as fo
    from tropical.extract.subdivide import subpoly

    net = _kinked_net()
    _, Vh, _ = subpoly(net, 3, 1.2, force=False, verbose=False,
                       engine="host")
    host = dict(fo.COUNTERS)
    _, Vd, _ = dv.subpoly_device(net, force=False, verbose=False)
    sent_d, gd_d, drop_d = (int(x) for x in dv.LAST_HW[13:16])

    assert host["sentinels"] > 1000          # the stage fired, massively
    assert host["strict_drops"] > 1000
    assert sent_d > 1000 and drop_d > 1000
    # eps-boundary flips across engines stay within a percent or two
    assert abs(sent_d - host["sentinels"]) <= max(20, int(
        0.02 * host["sentinels"]))
    assert abs(drop_d - host["strict_drops"]) <= max(20, int(
        0.02 * host["strict_drops"]))
    # GD is allowed to differ by a handful of rows here (near-zero activity)
    assert abs(gd_d - host["gd_rows"]) <= 5

    # vertex-set parity (same tolerance scheme as the trained-net test)
    from scipy.spatial import cKDTree

    d_hd = cKDTree(Vd).query(Vh)[0]
    assert (d_hd > 1e-5).sum() <= max(5, int(0.01 * Vh.shape[0]))
    # exactness invariant on the device mesh
    sd = np.asarray(net.sdf(jnp.asarray(Vd)))[:, 0]
    assert np.abs(sd).max() < 2e-4


def test_device_curved_gd_rescue_fires():
    """A rougher fixture (larger table scale -> f32 root residuals above
    eps) activates the projected-GD rescue INSIDE the fused program: both
    engines report GD-optimized rows, and the device mesh stays on-surface."""
    import jax.numpy as jnp

    from tropical.extract import device as dv
    from tropical.extract import failover as fo
    from tropical.extract.subdivide import subpoly

    net = _kinked_net(r_max=6, levels=3, scale=30000.0)
    _, Vh, _ = subpoly(net, 3, 1.2, force=False, verbose=False,
                       engine="host")
    host = dict(fo.COUNTERS)
    _, Vd, _ = dv.subpoly_device(net, force=False, verbose=False)
    sent_d, gd_d, drop_d = (int(x) for x in dv.LAST_HW[13:16])

    assert host["gd_rows"] > 0, host
    assert gd_d > 0, (sent_d, gd_d, drop_d)
    assert abs(sent_d - host["sentinels"]) <= max(30, int(
        0.02 * host["sentinels"]))
    sd = np.asarray(net.sdf(jnp.asarray(Vd)))[:, 0]
    assert np.abs(sd).max() < 2e-4
