"""Closed-form trilinear two-surface intersection on an edge's corner cube.

Port of the math in reference tropical/geometry.py:24-170,350-372, re-expressed
as pure vectorized JAX:

- ``corner_points`` expands each edge's AABB into its 8 cube corners with the
  z-major bit order idx = 4i + 2j + k -> (x_k, y_j, z_i) (geometry.py:350-372),
- ``intersection_of_two_planes`` intersects two implicit trilinear surfaces
  (given by their 8 corner values p, q) with the diagonal plane x = z of the
  cube: substituting z = x makes each surface quadratic in x and linear in y,
  eliminating y yields a quartic in x (Bernstein -> monomial via T); y is then
  recovered as a ratio of quadratics (geometry.py:36-67),
- cubes degenerate (constant) along an axis are flagged and given the -1
  no-intersection sentinel: the reference computes a bilinear fallback but
  discards it because ``failover=False`` hard-codes x=y=z=-1
  (geometry.py:90,107-108), so only the detection masks matter for parity.
"""

from __future__ import annotations

import jax.numpy as jnp

from tropical.core.roots import poly_roots_01

# lower/upper y-face corner ids under idx = 4i + 2j + k
_R = (0, 1, 4, 5)  # y = 0 face, ordered (x,z) = (0,0),(1,0),(0,1),(1,1)
_S = (2, 3, 6, 7)  # y = 1 face


def corner_points(edges: jnp.ndarray) -> jnp.ndarray:
    """[B, 2, 3] edge endpoints -> [B, 8, 3] cube corners (z-major bit order)."""
    e = edges
    cs = []
    for i in range(2):
        for j in range(2):
            for k in range(2):
                cs.append(jnp.stack([e[:, k, 0], e[:, j, 1], e[:, i, 2]], axis=-1))
    return jnp.stack(cs, axis=1)


def trilinear_interpolation(p: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Interpolate corner values p [B,8] at local coords w [B,3]."""
    out = 0.0
    for i in range(2):
        for j in range(2):
            for k in range(2):
                weight = (w[:, 0] if k else 1 - w[:, 0]) \
                    * (w[:, 1] if j else 1 - w[:, 1]) \
                    * (w[:, 2] if i else 1 - w[:, 2])
                out = out + weight * p[:, 4 * i + 2 * j + k]
    return out


def _diag_quad(v: jnp.ndarray) -> jnp.ndarray:
    """Face values [B,4] ordered (0,0),(1,0),(0,1),(1,1) -> Bernstein quadratic
    coefficients of the diagonal x=z restriction: [v00, v10+v01, v11]."""
    return jnp.stack([v[:, 0], v[:, 1] + v[:, 2], v[:, 3]], axis=-1)


def _quad_y(q: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Recover y from the x=z quartic root (reference geometry.py:61-67)."""
    X = jnp.stack([(1 - x) ** 2, x * (1 - x), x * (1 - x), x ** 2], axis=-1)
    r = jnp.asarray(_R)
    s = jnp.asarray(_S)
    AX = (q[:, r] * X).sum(-1)
    BX = (q[:, s] * X).sum(-1)
    return AX / (AX - BX)


def quartic_coeffs(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Quartic (descending powers) whose roots are the x=z-plane intersections
    of the two trilinear surfaces given by corner values p, q [B, 8]."""
    r = jnp.asarray(_R)
    s = jnp.asarray(_S)

    # Bernstein-basis outer products; T converts quadratic Bernstein -> monomial
    T = jnp.asarray([[1.0, -2.0, 1.0], [-1.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    A0 = _diag_quad(q[:, r])[:, :, None] * _diag_quad(p[:, s])[:, None, :]
    A1 = _diag_quad(q[:, s])[:, :, None] * _diag_quad(p[:, r])[:, None, :]
    A = A0 - A1
    B = T.T[None] @ A @ T[None]
    return jnp.stack([
        B[:, 0, 0],
        B[:, 1, 0] + B[:, 0, 1],
        B[:, 2, 0] + B[:, 1, 1] + B[:, 0, 2],
        B[:, 1, 2] + B[:, 2, 1],
        B[:, 2, 2],
    ], axis=-1)


def intersection_of_two_planes(p: jnp.ndarray, q: jnp.ndarray, plane: str = "xz",
                               eps: float = 1e-6) -> jnp.ndarray:
    """Intersection point (local cube coords in [0,1]^3) of two trilinear
    surfaces with the plane x=z; rows without a valid intersection are -1.

    Rows where the recovered point is imprecise (near-singular y denominator,
    secondary quartic roots) are caught downstream by the on-surface check +
    gradient-descent failover + strict filter, exactly as in the reference.

    Args:
        p, q: [B, 8] corner values of the two surfaces.
    """
    assert plane == "xz"
    x = poly_roots_01(quartic_coeffs(p, q))
    y = _quad_y(q, x)
    z = x

    out = jnp.stack([x, y, z], axis=-1)

    # cubes constant along one axis: -1 sentinel (see module docstring)
    deg = None
    for t, u in (((0, 1, 4, 5), (2, 3, 6, 7)),    # constant along y
                 ((0, 1, 2, 3), (4, 5, 6, 7)),    # constant along z
                 ((0, 4, 2, 6), (1, 5, 3, 7))):   # constant along x
        t = jnp.asarray(t)
        u = jnp.asarray(u)
        m = ((p[:, t] == p[:, u]) & (q[:, t] == q[:, u])).all(-1)
        deg = m if deg is None else deg | m

    invalid = deg[:, None] | ~jnp.isfinite(out)
    return jnp.where(invalid, -1.0, out)
