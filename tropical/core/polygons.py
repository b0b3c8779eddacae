"""Half-space polygon clipping and legacy plane bookkeeping.

API-parity ports of reference components that survive only on deprecated
paths but are part of the public surface:

- ``find_polygon`` / ``find_polygon_batch`` (reference geometry.py:375-452):
  convex polygon of a query plane clipped against half-spaces, via all plane
  triples -> least-squares intersection points -> hull filter -> angular sort,
- ``plane_to_vertices`` (reference subpoly.py:538-553): plane-id -> vertex
  list map used by the legacy connecting-edge path,
- ``sort_polygon_vertices`` scalar variant (geometry.py:455-480).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from tropical import deprecated


def sort_polygon_vertices(v: np.ndarray, n: np.ndarray | None = None,
                          idx: int = 0, return_index: bool = False,
                          null_value: int = -1):
    """Angular sort of one polygon's vertices (reference geometry.py:455-480)."""
    v = np.asarray(v, np.float64)
    v = v[(v != null_value).any(-1)].reshape(-1, 3)
    u = v - v.mean(0, keepdims=True)
    d = np.cross(np.broadcast_to(u[idx:idx + 1], u.shape), u)
    if n is None:
        n = d[idx + 1] / np.linalg.norm(d[idx + 1])
    nu = np.linalg.norm(u, axis=-1)
    c = (u[idx:idx + 1] * u).sum(-1) / np.maximum(nu[idx] * nu, 1e-8)
    dn = d @ np.asarray(n)
    s = c * ((dn >= 0) * 2.0 - 1.0) + (dn < 0) * 2.0
    order = np.argsort(-s, kind="stable")
    if return_index:
        return v[order], order
    return v[order]


def find_polygon(q: np.ndarray, planes: np.ndarray, eps: float = 1e-3
                 ) -> np.ndarray:
    """Convex polygon where plane ``q`` cuts the polyhedron of ``planes``.

    Planes are (a,b,c,d) with a*x+b*y+c*z+d = 0 and inside = positive side
    (reference geometry.py:375-411).
    """
    q = np.asarray(q, np.float64).reshape(-1)
    planes = np.asarray(planes, np.float64)
    N = planes.shape[0]

    pts = []
    for i in range(N):
        for j in range(N):
            if i == j:
                continue
            A = np.stack([q[:3], planes[i, :3], planes[j, :3]])
            b = -np.array([q[3], planes[i, 3], planes[j, 3]])
            p, *_ = np.linalg.lstsq(A, b, rcond=None)
            # drop inconsistent/rank-deficient triples (the reference keeps
            # pinverse minimum-norm junk and relies on the hull filter only;
            # the residual check is strictly tighter)
            if np.abs(A @ p - b).max() < eps:
                pts.append(p)
    if not pts:
        return np.empty((0, 3))
    p = np.unique(np.asarray(pts).round(9), axis=0)

    # keep points inside every half-space
    vals = planes[:, :3] @ p.T + planes[:, 3:4]
    p = p[(vals > -eps).all(0)]
    if p.shape[0] < 3:
        return p
    return sort_polygon_vertices(p, q[:3] / np.linalg.norm(q[:3]))


def find_polygon_batch(q: np.ndarray, planes: np.ndarray, eps: float = 1e-3
                       ) -> List[np.ndarray]:
    """Batched find_polygon (reference geometry.py:414-452)."""
    q = np.asarray(q, np.float64)
    planes = np.asarray(planes, np.float64)
    if q.ndim == 2:
        q = q[:, None, :]
    return [find_polygon(q[b, 0], planes[b], eps) for b in range(planes.shape[0])]


@deprecated("Legacy connecting-edge path (reference LEGACY_FIND_EDGES).")
def plane_to_vertices(m: np.ndarray, offset: np.ndarray | None = None,
                      L: int | None = None) -> Dict[int, List[int]]:
    """Map plane-id -> vertices lying on it (reference subpoly.py:538-553).

    Neural planes are keyed by ``L*D + column``; grid planes by
    ``offset + L * axis``.
    """
    m = np.asarray(m)
    pv: Dict[int, List[int]] = {}
    d = 0 if offset is None else offset.shape[1]
    base = 0 if offset is None else L * d

    for row, colm in np.argwhere(m[:, d:] == 0):
        k = int(base + colm)
        lst = pv.setdefault(k, [])
        if row not in lst:
            lst.append(int(row))

    if offset is not None:
        for row, axis in np.argwhere(m[:, :d] == 0):
            k = int(offset[row, axis] + L * axis)
            lst = pv.setdefault(k, [])
            if row not in lst:
                lst.append(int(row))
    return pv
