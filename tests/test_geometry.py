"""Unit tests for the root solver and trilinear intersection machinery."""

import jax.numpy as jnp
import numpy as np

from tropical.core.roots import poly_roots_01
from tropical.core.trilinear import (corner_points, intersection_of_two_planes,
                                     trilinear_interpolation)


def test_poly_roots_against_numpy():
    rng = np.random.default_rng(0)
    coeffs = rng.uniform(-1, 1, (256, 5)).astype(np.float32)
    got = np.asarray(poly_roots_01(jnp.asarray(coeffs)))
    for i in range(coeffs.shape[0]):
        r = np.roots(coeffs[i])
        valid = sorted(x.real for x in r if abs(x.imag) < 1e-6 and -1e-6 <= x.real <= 1 + 1e-6)
        if not valid:
            assert got[i] == -1, f"row {i}: expected sentinel, got {got[i]}"
        else:
            # ours picks the last bracketed root; it must be one of the real
            # roots in [0,1]
            assert min(abs(got[i] - v) for v in valid) < 1e-4, \
                f"row {i}: {got[i]} not in {valid}"


def _quartic_from_roots(roots, extra=(1.0, 1.0)):
    """Monic quartic (t - r0)(t - r1)(t^2 + a t + b), descending coeffs."""
    p = np.poly1d([1.0, -roots[0]]) * np.poly1d([1.0, -roots[1]]) \
        * np.poly1d([1.0, extra[0], extra[1]])
    return np.asarray(p.coeffs, np.float64)


def test_poly_roots_pair_inside_one_cell():
    # two distinct roots < 1/64 apart leave no sign change on the 65-sample
    # grid; the derivative-extrema probe must still find the LAST one
    # (the reference eigensolver finds these directly, geometry.py:271-299)
    rng = np.random.default_rng(1)
    rows, expect = [], []
    for _ in range(64):
        c = rng.uniform(0.05, 0.95)          # cell interior
        d = rng.uniform(1e-4, 0.9) / 64.0    # pair separation < one cell
        a, b = c - d / 2, c + d / 2
        rows.append(_quartic_from_roots((a, b)))
        expect.append(b)
    got = np.asarray(poly_roots_01(jnp.asarray(np.stack(rows))))
    err = np.abs(got - np.asarray(expect))
    # float32 conditioning near a double root bounds precision at
    # ~sqrt(machine eps); anything below the extraction's eps=1e-4
    # on-surface tolerance is exact for the pipeline's purposes
    assert (err < 1e-4).all(), err.max()


def test_poly_roots_tangent_root():
    # even-multiplicity roots: (t - a)^2 (t^2 + 1) touches zero without
    # crossing; expect the root (or a clean -1 — never a wrong value)
    rng = np.random.default_rng(2)
    rows, expect = [], []
    for _ in range(64):
        a = rng.uniform(0.05, 0.95)
        rows.append(_quartic_from_roots((a, a), extra=(0.0, 1.0)))
        expect.append(a)
    got = np.asarray(poly_roots_01(jnp.asarray(np.stack(rows))))
    expect = np.asarray(expect)
    # double roots are sqrt(eps)-conditioned in any solver (a defective
    # eigenvalue perturbs by sqrt(machine eps) too): f32 bounds accuracy at
    # ~sqrt(1e-7) ~ 3e-4 regardless of method
    ok = (np.abs(got - expect) < 5e-4) | (got == -1)
    assert ok.all(), np.abs(got - expect)[~ok]
    # the probe should catch the overwhelming majority outright
    assert (np.abs(got - expect) < 5e-4).mean() > 0.9


def test_poly_roots_triple_cluster_stays_on_cluster():
    # three roots inside one cell: near the cluster |p| ~ d^3 sits at the
    # f32 evaluation-noise floor, so no solver (the reference's f32
    # eigensolver included) can reliably rank the cluster members — but the
    # returned value must always be ON the cluster (a true root up to
    # conditioning), never a bogus point and never the -1 sentinel
    rng = np.random.default_rng(3)
    rows, lo_hi = [], []
    for _ in range(64):
        c = rng.uniform(0.1, 0.9)
        d = rng.uniform(1e-3, 0.8) / 64.0
        a, b, e = c - d, c, c + d
        p = np.poly1d([1.0, -a]) * np.poly1d([1.0, -b]) \
            * np.poly1d([1.0, -e]) * np.poly1d([1.0, 2.0])  # 4th root at -2
        rows.append(np.asarray(p.coeffs, np.float64))
        lo_hi.append((a, e))
    got = np.asarray(poly_roots_01(jnp.asarray(np.stack(rows))))
    lo, hi = np.asarray(lo_hi).T
    # the f32 noise region around a triple root has half-width
    # ~cbrt(machine eps) ~ 5e-3; anywhere inside it, p is numerically zero
    assert (got >= lo - 5e-3).all() and (got <= hi + 5e-3).all(), \
        list(zip(got, lo, hi))


def test_poly_roots_degree_dispatch():
    # leading zeros: quadratic / linear / constant rows
    coeffs = np.array([
        [0, 0, 1, -1, 0.21],     # x^2 - x + 0.21 -> roots 0.3, 0.7 (last = 0.7)
        [0, 0, 0, 2, -1],        # 2x - 1 -> 0.5
        [0, 0, 0, 0, 3],         # constant -> no root
        [0, 0, 0, 0, 0],         # all zero -> no root
        [1, 0, 0, 0, -0.0001],   # x^4 = 1e-4 -> 0.1
    ], np.float32)
    got = np.asarray(poly_roots_01(jnp.asarray(coeffs)))
    assert abs(got[0] - 0.7) < 1e-5
    assert abs(got[1] - 0.5) < 1e-6
    assert got[2] == -1
    assert got[3] == -1
    assert abs(got[4] - 0.1) < 1e-4


def test_corner_points_bit_order():
    e = jnp.asarray([[[0.0, 0.0, 0.0], [1.0, 2.0, 3.0]]])
    c = np.asarray(corner_points(e))[0]
    # idx = 4i + 2j + k -> (x_k, y_j, z_i)
    np.testing.assert_allclose(c[0], [0, 0, 0])
    np.testing.assert_allclose(c[1], [1, 0, 0])
    np.testing.assert_allclose(c[2], [0, 2, 0])
    np.testing.assert_allclose(c[4], [0, 0, 3])
    np.testing.assert_allclose(c[7], [1, 2, 3])


def test_trilinear_interpolation_corners():
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))
    # at each corner's local coords, interpolation returns that corner value
    for idx in range(8):
        i, j, k = idx >> 2, (idx >> 1) & 1, idx & 1
        w = jnp.asarray([[float(k), float(j), float(i)]] * 8)
        out = np.asarray(trilinear_interpolation(p, w))
        np.testing.assert_allclose(out, np.asarray(p)[:, idx], rtol=1e-6)


def _random_trilinear_pair_with_intersection(rng):
    """Construct p, q with a known common zero on the x=z plane."""
    while True:
        p = rng.normal(size=8).astype(np.float32)
        q = rng.normal(size=8).astype(np.float32)
        # force a common zero at (t, y, t): pick t, y, then adjust constants
        t, y = rng.uniform(0.2, 0.8, 2)
        w = np.array([[t, y, t]], np.float32)
        pv = float(np.asarray(trilinear_interpolation(
            jnp.asarray(p[None]), jnp.asarray(w))))
        qv = float(np.asarray(trilinear_interpolation(
            jnp.asarray(q[None]), jnp.asarray(w))))
        p = p - pv  # subtracting a constant from all corners shifts the field
        q = q - qv
        return p, q, t, y


def test_quartic_vanishes_at_planted_root():
    from tropical.core.roots import _poly_eval
    from tropical.core.trilinear import quartic_coeffs

    rng = np.random.default_rng(7)
    ps, qs, ts = [], [], []
    for _ in range(32):
        p, q, t, _ = _random_trilinear_pair_with_intersection(rng)
        ps.append(p)
        qs.append(q)
        ts.append(t)
    coeffs = quartic_coeffs(jnp.asarray(np.stack(ps)), jnp.asarray(np.stack(qs)))
    vals = np.asarray(_poly_eval(
        coeffs, jnp.asarray(np.asarray(ts, np.float32)[:, None])))[:, 0]
    assert np.abs(vals).max() < 1e-4


def test_intersection_of_two_planes_recovers_common_zero():
    rng = np.random.default_rng(7)
    ps, qs = [], []
    for _ in range(32):
        p, q, _, _ = _random_trilinear_pair_with_intersection(rng)
        ps.append(p)
        qs.append(q)
    P = jnp.asarray(np.stack(ps))
    Q = jnp.asarray(np.stack(qs))
    ints = np.asarray(intersection_of_two_planes(P, Q))
    found = (ints >= 0).all(-1) & (ints <= 1).all(-1)
    # both surfaces vanish at most found intersections; the quartic can have
    # secondary roots with near-singular y denominators — those rows are
    # rejected downstream by d_new/GD/strict failovers (same as reference)
    pv = np.asarray(trilinear_interpolation(P, jnp.asarray(ints)))
    qv = np.asarray(trilinear_interpolation(Q, jnp.asarray(ints)))
    assert found.mean() > 0.5  # constructions may have the root off the x=z plane
    ok = (np.abs(pv) < 1e-3) & (np.abs(qv) < 1e-3)
    assert ok[found].mean() > 0.7
    # x = z by construction of the parametrization
    np.testing.assert_allclose(ints[found, 0], ints[found, 2], atol=1e-6)


def test_intersection_degenerate_axis_gives_sentinel():
    # constant along y: corners with j=0 equal corners with j=1
    p = np.array([[1.0, -1.0, 1.0, -1.0, 2.0, -2.0, 2.0, -2.0]], np.float32)
    q = np.array([[0.5, -0.5, 0.5, -0.5, 1.0, -1.0, 1.0, -1.0]], np.float32)
    ints = np.asarray(intersection_of_two_planes(jnp.asarray(p), jnp.asarray(q)))
    np.testing.assert_allclose(ints[0], [-1, -1, -1])
