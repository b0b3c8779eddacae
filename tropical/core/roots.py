"""Batched polynomial roots in [0, 1] without LAPACK.

TPU-native replacement for the reference's companion-matrix eigenvalue solver
(reference tropical/geometry.py:259-299 builds companion matrices and calls
``torch.linalg.eigvals``) — TPUs have no nonsymmetric eig, and a host
round-trip would serialize the hot loop.

Strategy: the extraction only ever needs the *last* real root inside [0, 1]
(out-of-range intersections get the -1 sentinel; reference
geometry.py:263,289-296).  So we evaluate the polynomial on a fixed grid over
[0, 1], find sign-change brackets, and polish the last bracket with bisection
— branch-free, fully vectorized FMA work that maps onto the VPU.

A fixed grid alone misses roots that produce no sign change at the samples:
a pair of distinct roots inside one 1/64 cell, and tangent (even-multiplicity)
roots — both of which the reference's eigensolver finds.  A derivative-extrema
probe closes that gap: the sign-change cells of p' locate every interior
extremum; at each extremum m, either p(m) flips sign against the cell
boundary (two hidden roots; the later one is bracketed by [m, cell_end] and
bisected), or |p(m)| is ~0 (a tangent root at m itself).  The last root is
then the max over the plain bracket root and all probe roots.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

N_SAMPLES = 65
N_BISECT = 40
N_EXTREMA = 3   # a quartic has at most 3 interior extrema
TANGENT_RTOL = 1e-7  # |p(m)| below this (relative to sum|coeffs|) is a touch


def _poly_eval(coeffs: jax.Array, t: jax.Array) -> jax.Array:
    """Horner evaluation. coeffs [B, K] in descending powers, t [B, N] or [B]."""
    acc = jnp.zeros_like(t) + coeffs[..., :1]
    for i in range(1, coeffs.shape[-1]):
        acc = acc * t + coeffs[..., i:i + 1]
    return acc


def _deriv(coeffs: jax.Array) -> jax.Array:
    """Descending-power coefficients of p'."""
    k = coeffs.shape[-1]
    powers = jnp.arange(k - 1, 0, -1, dtype=coeffs.dtype)
    return coeffs[..., :-1] * powers


def _bisect(coeffs, lo, hi, flo, n: int = N_BISECT):
    """Bisection root of each row's polynomial in [lo, hi]; flo = p(lo)."""
    def body(_, state):
        lo, hi, flo = state
        mid = 0.5 * (lo + hi)
        fmid = _poly_eval(coeffs, mid[:, None])[:, 0]
        go_left = flo * fmid <= 0
        lo = jnp.where(go_left, lo, mid)
        flo = jnp.where(go_left, flo, fmid)
        hi = jnp.where(go_left, mid, hi)
        return lo, hi, flo

    lo, hi, _ = jax.lax.fori_loop(0, n, body, (lo, hi, flo))
    return 0.5 * (lo + hi)


def poly_roots_01(coeffs: jax.Array, eps: float = 1e-9) -> jax.Array:
    """Last real root in [0, 1] of each row's polynomial, else -1.

    Matches the contract of reference ``batched_polynomial_roots``
    (geometry.py:259-268): coefficients are in descending powers, entries with
    |c| < eps are zeroed first, all-(near-)zero rows yield -1.
    """
    coeffs = jnp.where(jnp.abs(coeffs) < eps, 0.0, coeffs)
    B = coeffs.shape[0]

    ts = jnp.linspace(0.0, 1.0, N_SAMPLES)
    vals = _poly_eval(coeffs, jnp.broadcast_to(ts, (B, N_SAMPLES)))  # [B, N]

    # bracket = consecutive samples with product <= 0, excluding flat zero-zero
    prod = vals[:, :-1] * vals[:, 1:]
    flat = (vals[:, :-1] == 0) & (vals[:, 1:] == 0)
    brackets = (prod <= 0) & ~flat  # [B, N-1]

    # constant/degenerate rows (degree 0 after zeroing) have no root
    nonconst = jnp.abs(coeffs[:, :-1]).sum(-1) > eps
    brackets = brackets & nonconst[:, None]

    has = brackets.any(-1)
    # last bracket index (reference picks the last valid root, geometry.py:294-296)
    idx = (N_SAMPLES - 2) - jnp.argmax(brackets[:, ::-1], axis=-1)
    lo = jnp.take(ts, idx)
    hi = jnp.take(ts, idx + 1)
    flo = jnp.take_along_axis(vals, idx[:, None], 1)[:, 0]
    root = jnp.where(has, _bisect(coeffs, lo, hi, flo), -1.0)

    # --- derivative-extrema probe for roots the sample grid can't see -------
    dco = _deriv(coeffs)
    dvals = _poly_eval(dco, jnp.broadcast_to(ts, (B, N_SAMPLES)))
    dprod = dvals[:, :-1] * dvals[:, 1:]
    dflat = (dvals[:, :-1] == 0) & (dvals[:, 1:] == 0)
    dbrackets = (dprod <= 0) & ~dflat & nonconst[:, None]

    tau = TANGENT_RTOL * jnp.abs(coeffs).sum(-1)
    cells = jnp.arange(N_SAMPLES - 1)
    for _ in range(N_EXTREMA):
        dhas = dbrackets.any(-1)
        didx = (N_SAMPLES - 2) - jnp.argmax(dbrackets[:, ::-1], axis=-1)
        dbrackets = dbrackets & (cells[None, :] != didx[:, None])

        dlo = jnp.take(ts, didx)
        dhi = jnp.take(ts, didx + 1)
        dflo = jnp.take_along_axis(dvals, didx[:, None], 1)[:, 0]
        m = _bisect(dco, dlo, dhi, dflo)            # extremum location
        pm = _poly_eval(coeffs, m[:, None])[:, 0]
        pr = jnp.take_along_axis(vals, didx[:, None] + 1, 1)[:, 0]

        cross = dhas & (pm * pr < 0)                # hidden pair in the cell
        pair_root = _bisect(coeffs, m, dhi, pm)
        tangent = dhas & ~cross & (jnp.abs(pm) <= tau)
        cand = jnp.where(cross, pair_root, jnp.where(tangent, m, -1.0))
        root = jnp.maximum(root, cand)              # last-root contract

    return root


batched_polynomial_roots = poly_roots_01
