"""Numerical failure-recovery mechanisms of the subdivision loop.

Ports of reference tropical/subpoly_debug.py:33-51 (sign-vector override),
:121-165 (projected gradient-descent rescue of missed trilinear
intersections) and :234-271 (strict on-surface filtering).  These are
*on-path, behavior-relevant* mechanisms (SURVEY §5.3), not debug prints.
"""

from __future__ import annotations

import numpy as np


def nonzero_last(mask2d: np.ndarray) -> np.ndarray:
    """[rows-with-any-True, (row, last-True-col)] (reference torch_ext.py:18-29)."""
    mask2d = np.asarray(mask2d, bool)
    any_ = mask2d.any(axis=1)
    if mask2d.shape[1] == 0:
        return np.empty((0, 2), np.int64)
    cols = mask2d.shape[1] - 1 - np.argmax(mask2d[:, ::-1], axis=1)
    rows = np.nonzero(any_)[0]
    return np.stack([rows, cols[any_]], axis=1).astype(np.int64)


def sign_override(edges_m: np.ndarray, _regions: np.ndarray, _offset: np.ndarray,
                  idx: int, outputs_new: np.ndarray, eps: float) -> bool:
    """Force new vertices exactly onto the planes their parent edge lies on.

    If a new vertex's output on a plane shared by both parent endpoints (and,
    for grid planes, the same cell) exceeds eps, all such plane outputs are
    overridden to exactly 0 so later eps-sign-vector region tests do not
    fracture (reference subpoly_debug.py:33-51, used at subpoly.py:189-194).
    Mutates ``outputs_new`` in place; returns True if an override happened.
    """
    m_rgn = _regions[edges_m]          # [N, 2, 3+R]
    offset = _offset[edges_m]          # [N, 2, 3]
    m_chk = (m_rgn[:, 0] == 0) & (m_rgn[:, 1] == 0)
    m_chk[:, :3] &= offset[:, 0] == offset[:, 1]
    b = m_chk[:, 3:].copy()            # neuron-plane membership of the edge
    b[:, idx:] = False
    b[:, idx] = True                   # always pin the current surface
    if (np.abs(outputs_new[b]) > eps).sum() > 0:
        outputs_new[b] = 0.0
        return True
    return False


def gradient_descent_failover(net, e_c: np.ndarray, ints: np.ndarray,
                              d_new: np.ndarray, gg: np.ndarray,
                              plane_cols: np.ndarray, idx: int, eps: float,
                              max_iters: int = 500, lr: float = 1e-2):
    """Pull off-surface trilinear intersections back onto both surfaces.

    <= ``max_iters`` steps of normalized gradient descent on d0^2 + d1^2 over
    the local edge coordinates, clamped to [0, 1]^3 (reference
    subpoly_debug.py:121-165).  Only rows in ``gd`` = not-out-of-range but
    off-surface are optimized.  Returns updated (ints, d_new).
    """
    import jax
    import jax.numpy as jnp

    from tropical.core.net import net_outputs

    gd = (~gg) & ((np.abs(d_new) > eps).any(axis=-1))
    if not gd.any():
        return ints, d_new

    e0 = jnp.asarray(e_c[gd, 0])
    e1 = jnp.asarray(e_c[gd, 1])
    cols = jnp.asarray(plane_cols[gd].astype(np.int32))
    spec, params = net.spec, net.params

    @jax.jit
    def step(x):
        def loss(x):
            pts = e0 + x * (e1 - e0)
            outs = net_outputs(spec, params, pts)
            d0 = jnp.take_along_axis(outs, cols[:, None], axis=1)[:, 0]
            d1 = outs[:, idx]
            return (d0 ** 2 + d1 ** 2).sum(), (d0, d1)

        (_, (d0, d1)), g = jax.value_and_grad(loss, has_aux=True)(x)
        gn = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
        x_next = jnp.clip(x - lr * gn, 0.0, 1.0)
        return x_next, d0, d1

    x = jnp.asarray(ints[gd])
    d0 = d1 = np.array([1.0])
    i = 0
    while (np.abs(d0).max() > eps or np.abs(d1).max() > eps) and i < max_iters:
        x, d0j, d1j = step(x)
        d0, d1 = np.asarray(d0j), np.asarray(d1j)
        i += 1

    ints = ints.copy()
    d_new = d_new.copy()
    ints[gd] = np.asarray(x)
    d_new[gd, 0] = d0
    d_new[gd, 1] = d1
    return ints, d_new


def strict_check(c: np.ndarray, d_new: np.ndarray, eps: float, idx: int,
                 ints: np.ndarray, m: np.ndarray, m_rgn: np.ndarray,
                 m_rgn_: np.ndarray, offset: np.ndarray,
                 outputs_new: np.ndarray, has_curved: bool, v_new: np.ndarray,
                 l: int = -1, h: int = -1, verbose: bool = False):
    """Drop new vertices that failed to land on the current surface.

    Port of reference subpoly_debug.py:234-271: off-surface vertices and rows
    whose trilinear root fell outside [0,1] (no intersection) are filtered out
    of every per-vertex array, and the edge mask ``m`` is updated accordingly.
    """
    chk = outputs_new[:, idx]
    if (np.abs(chk).max(initial=0) >= eps) \
            or (np.abs(d_new[:, 0]).max(initial=0) >= eps) or has_curved:
        g = np.abs(chk) < eps

        gg = np.zeros(0, bool)
        if has_curved:
            gg = ((ints < 0) | (ints > 1)).any(axis=-1)
            g[c] |= gg                      # permit for now (counted separately)
            d_new = d_new.copy()
            d_new[gg, 0] = 0

        if verbose and (~g).sum() > 0:
            print(f"\n{(~g).sum()}/{g.size} new vertices are filtered at "
                  f"{l}/{h} ({np.abs(chk[~g]).max()}).")

        g1 = None
        if eps < np.abs(d_new[:, 0]).max(initial=0):
            g1 = np.abs(d_new[:, 0]) < eps
            if verbose:
                print(f"\n{(~g1).sum()}/{g1.size} old vertices are filtered at "
                      f"{l}/{h}.")

        if has_curved:
            g[c] = (np.abs(chk[c]) < eps) & ~gg
            if g1 is not None:
                g[c] &= g1

        m = m.copy()
        m[m] = g
        v_new = v_new[g]
        m_rgn = m_rgn[g]
        m_rgn_ = m_rgn_[g]
        offset = offset[g]
        outputs_new = outputs_new[g]

    return m, v_new, m_rgn, m_rgn_, offset, outputs_new
