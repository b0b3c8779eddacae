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
