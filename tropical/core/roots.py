"""Batched polynomial roots in [0, 1] without LAPACK.

TPU-native replacement for the reference's companion-matrix eigenvalue solver
(reference tropical/geometry.py:259-299 builds companion matrices and calls
``torch.linalg.eigvals``) — TPUs have no nonsymmetric eig, and a host
round-trip would serialize the hot loop.

Strategy: the extraction only ever needs a real root inside [0, 1] (out-of-range
intersections get the -1 sentinel; reference geometry.py:263,289-296).  So we
evaluate the polynomial on a fixed grid over [0, 1], find sign-change brackets,
and polish the *last* bracket (matching the reference's ``nonzero_last`` pick)
with bisection.  This is branch-free, fully vectorized FMA work that maps onto
the VPU, and is robust for the simple roots these quartics have in practice;
tangent (even-multiplicity) roots fall through to the -1 sentinel exactly like
eigenvalue roots that fail the imaginary-part filter, and are then handled by
the gradient-descent failover (reference subpoly_debug.py:121-165).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

N_SAMPLES = 65
N_BISECT = 40


def _poly_eval(coeffs: jax.Array, t: jax.Array) -> jax.Array:
    """Horner evaluation. coeffs [B, K] in descending powers, t [B, N] or [B]."""
    acc = jnp.zeros_like(t) + coeffs[..., :1]
    for i in range(1, coeffs.shape[-1]):
        acc = acc * t + coeffs[..., i:i + 1]
    return acc


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

    def body(_, state):
        lo, hi, flo = state
        mid = 0.5 * (lo + hi)
        fmid = _poly_eval(coeffs, mid[:, None])[:, 0]
        go_left = flo * fmid <= 0
        lo = jnp.where(go_left, lo, mid)
        flo = jnp.where(go_left, flo, fmid)
        hi = jnp.where(go_left, mid, hi)
        return lo, hi, flo

    lo, hi, _ = jax.lax.fori_loop(0, N_BISECT, body, (lo, hi, flo))
    root = 0.5 * (lo + hi)
    return jnp.where(has, root, -1.0)


batched_polynomial_roots = poly_roots_01
