"""Unit tests for the host-engine numerical failovers (extract/failover.py).

The GD rescue (reference subpoly_debug.py:121-165) now runs as a single
jitted ``lax.while_loop`` dispatch; these tests pin its semantics: only
``gd``-selected rows move, padding lanes are inert, and the residuals of
rescued rows shrink toward the surface.
"""

import numpy as np
import pytest


def _edge_straddling_surface(net):
    """Find world-space endpoints along +x with opposite SDF signs."""
    import jax.numpy as jnp

    ts = np.linspace(0.05, 1.1, 64, dtype=np.float32)
    pts = np.zeros((64, 3), np.float32)
    pts[:, 0] = ts
    sd = np.asarray(net.sdf(jnp.asarray(pts)))[:, 0]
    sign_flip = np.nonzero(np.signbit(sd[:-1]) != np.signbit(sd[1:]))[0]
    assert sign_flip.size, "sphere net has no zero crossing on +x ?!"
    i = int(sign_flip[0])
    # widen to a cell-scale bracket around the crossing
    lo, hi = max(i - 3, 0), min(i + 4, 63)
    e0 = pts[lo].copy()
    e1 = pts[hi].copy()
    return e0, e1


def test_gd_failover_single_dispatch_semantics(trained_net):
    import jax.numpy as jnp

    from tropical.extract import failover as fo

    net = trained_net
    e0, e1 = _edge_straddling_surface(net)

    # three rows: [0] rescued, [1] out-of-range (gg), [2] already on-surface
    n = 3
    e_c = np.stack([np.stack([e0, e1])] * n).astype(np.float32)
    idx = net.num_hidden * (net.num_layers - 1)  # final SDF column (32)
    plane_cols = np.full(n, idx, np.int64)       # d0 == d1 == sdf column

    ints = np.full((n, 3), 0.1, np.float32)      # off-surface start
    ints[1] = 2.0                                 # row 1: out of range
    eps = 1e-4

    def resid(t):
        p = e_c[:, 0] + t * (e_c[:, 1] - e_c[:, 0])
        from tropical.core.net import net_outputs
        outs = np.asarray(net_outputs(net.spec, net.params, jnp.asarray(p)))
        return outs[:, idx]

    r0 = resid(ints)
    d_new = np.stack([r0, r0], axis=-1).astype(np.float32)
    d_new[2] = 0.0                                # row 2: already on-surface
    gg = np.array([False, True, False])

    ints2, d_new2 = fo.gradient_descent_failover(
        net, e_c, ints.copy(), d_new.copy(), gg, plane_cols, idx, eps,
        max_iters=500)

    # untouched rows are bit-identical
    np.testing.assert_array_equal(ints2[1], ints[1])
    np.testing.assert_array_equal(d_new2[1], d_new[1])
    np.testing.assert_array_equal(ints2[2], ints[2])
    np.testing.assert_array_equal(d_new2[2], d_new[2])

    # the rescued row moved, stayed in [0,1]^3, and its residual shrank
    assert not np.array_equal(ints2[0], ints[0])
    assert (ints2[0] >= 0).all() and (ints2[0] <= 1).all()
    assert np.abs(d_new2[0]).max() < np.abs(r0[0]) * 0.5
    # reported residuals match a fresh evaluation at (or within one GD step
    # of) the returned point — the loop reports pre-update residuals
    assert np.abs(resid(ints2)[0]) < np.abs(r0[0]) * 0.5


def test_gd_failover_noop_when_all_on_surface(trained_net):
    from tropical.extract import failover as fo

    net = trained_net
    e0, e1 = _edge_straddling_surface(net)
    e_c = np.stack([np.stack([e0, e1])]).astype(np.float32)
    ints = np.full((1, 3), 0.5, np.float32)
    d_new = np.zeros((1, 2), np.float32)
    out_i, out_d = fo.gradient_descent_failover(
        net, e_c, ints, d_new, np.array([False]), np.array([32]), 32, 1e-4)
    np.testing.assert_array_equal(out_i, ints)
    np.testing.assert_array_equal(out_d, d_new)


@pytest.mark.parametrize("n_rows", [1, 3, 5])
def test_gd_failover_pow2_padding_is_inert(trained_net, n_rows):
    """Different live-row counts bucket to pow-2 caps; results must not
    depend on the padding lanes."""
    from tropical.extract import failover as fo

    net = trained_net
    e0, e1 = _edge_straddling_surface(net)
    idx = 32
    e_c = np.stack([np.stack([e0, e1])] * n_rows).astype(np.float32)
    ints = np.full((n_rows, 3), 0.12, np.float32)
    d_new = np.ones((n_rows, 2), np.float32)
    gg = np.zeros(n_rows, bool)
    cols = np.full(n_rows, idx, np.int64)

    out_i, out_d = fo.gradient_descent_failover(
        net, e_c, ints, d_new, gg, cols, idx, 1e-4, max_iters=50)
    # identical rows get identical rescues regardless of bucket padding
    for r in range(1, n_rows):
        np.testing.assert_allclose(out_i[r], out_i[0], rtol=0, atol=0)
        np.testing.assert_allclose(out_d[r], out_d[0], rtol=0, atol=0)
    assert np.isfinite(out_i).all() and np.isfinite(out_d).all()


def test_check_new_vertices_on_surface_counts(capsys):
    """Diagnostic counterpart of reference subpoly_debug.py:168-231: counts
    in-range rows still off-surface, prints the worst row, never exits."""
    import numpy as np

    from tropical.extract import failover as fo

    ints = np.array([[0.5, 0.5, 0.5], [0.2, 0.2, 0.2], [2.0, 0.0, 0.0]],
                    np.float32)
    d_new = np.array([[1e-6, 1e-6], [3e-3, 1e-5], [0.5, 0.5]], np.float32)
    gg = np.array([False, False, True])
    e_c = np.zeros((3, 2, 3), np.float32)
    bad = fo.check_new_vertices_on_surface(ints, d_new, gg, 1e-4, 1, 2,
                                           e_c=e_c)
    assert bad == 1
    out = capsys.readouterr().out
    assert "near-zeros" in out and "test_idx: 1" in out
    assert fo.check_new_vertices_on_surface(
        ints[:1], d_new[:1], gg[:1], 1e-4, 1, 2) == 0
