"""Skeleton filtering and face assembly from sign-vector regions.

Port of reference tropical/subpoly.py:556-728 and geometry.py:455-556:
surviving vertices are grouped by region (excluding the final SDF plane
column), each region polygon is sorted by angle around the SDF normal at its
mean point, and fan-triangulated.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from tropical.core import regions as rg


def extract_skeleton(vertices: np.ndarray, edges: np.ndarray, outputs: np.ndarray,
                     net, eps: float) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Keep vertices with |sdf-plane output| < eps inside the unit range, and
    edges with both endpoints surviving; compact indices (subpoly.py:556-581)."""
    m = np.abs(outputs[:, -1]) < eps
    v = np.asarray(net.preprocess(vertices))
    m[(v > 1).any(axis=-1)] = False
    m[(v < 0).any(axis=-1)] = False

    if m.sum() < 3:
        return (np.empty((0, 3), vertices.dtype), np.empty((0, 2), np.int64),
                np.empty(0, np.int64))

    edges = edges[m[edges].sum(axis=-1) == 2]
    v_idx, r_idx = np.unique(edges.reshape(-1), return_inverse=True)
    return vertices[v_idx], r_idx.reshape(-1, 2).astype(np.int64), v_idx


def sort_polygon_rows(points: np.ndarray, normals: np.ndarray,
                      valid: np.ndarray) -> np.ndarray:
    """Angular ordering of polygon vertices around their normal.

    Port of reference geometry.py:483-514: cosine to the first vertex plus the
    cross-product direction against the normal gives a full 360-degree score
    ``s = cos * sign(d) + 2*(d<0)`` sorted descending.

    Args:
        points: [R, M, 3], invalid entries zero-filled.
        normals: [R, 3].
        valid: [R, M] bool.

    Returns:
        order [R, M] argsort indices (descending score).
    """
    k = np.maximum(valid.sum(-1, keepdims=True), 1)[..., None]
    u = points - points.sum(-2, keepdims=True) / k
    d = np.cross(np.broadcast_to(u[:, :1], u.shape), u)
    # cosine similarity to the base vector
    nrm = np.linalg.norm(u, axis=-1)
    denom = np.maximum(nrm[:, :1] * nrm, 1e-8)
    c = (u[:, :1] * u).sum(-1) / denom
    dn = (d @ normals[..., None]).squeeze(-1)
    s = c * ((dn >= 0) * 2.0 - 1.0) + (dn < 0) * 2.0
    return np.argsort(-s, axis=-1, kind="stable")


def fan_triangles(rows: np.ndarray, null_value: int = -1) -> np.ndarray:
    """Fan-triangulate each row's (angle-sorted) vertex-index list.

    Port of reference subpoly.py:700-728 (``tensor_to_triangle_faces``):
    duplicated indices within a row are removed first, then each row with
    count >= 3 emits the fan (v0, v_{j}, v_{j+1}).
    """
    rows = np.asarray(rows, np.int64).copy()
    R, M = rows.shape
    for i in range(1, M):
        dup = (rows[:, :i] == rows[:, i:i + 1]).any(axis=1)
        rows[dup, i] = null_value

    mask = rows != null_value
    counts = mask.sum(-1)
    flat = rows[mask]
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    ntri = np.clip(counts - 2, 0, None)
    if ntri.sum() == 0:
        return np.empty((0, 3), np.int64)
    row_ids = np.repeat(np.arange(R), ntri)
    tri_starts = np.concatenate([[0], np.cumsum(ntri)[:-1]])
    rank = np.arange(ntri.sum()) - np.repeat(tri_starts, ntri)
    base = starts[row_ids]
    v0 = flat[base]
    v1 = flat[base + rank + 1]
    v2 = flat[base + rank + 2]
    return np.stack([v0, v1, v2], axis=1)


def mean_points_with_valid(vertices: np.ndarray, v_indices: np.ndarray,
                           null_value: int = -1):
    """Mean point per region row; drop rows with < 3 valid vertices
    (subpoly.py:669-678)."""
    safe = np.where(v_indices == null_value, 0, v_indices)
    points = vertices[safe]
    points[v_indices == null_value] = 0
    Z = (v_indices != null_value).sum(-1, keepdims=True)
    mean_points = points.sum(1) / np.maximum(Z, 1)
    keep = Z.squeeze(-1) >= 3
    return mean_points[keep], points[keep], v_indices[keep]


def extract_faces(vertices: np.ndarray, edges: np.ndarray, net,
                  outputs: np.ndarray, eps: float):
    """Region-group surviving vertices, sort each polygon, fan-triangulate.

    Port of reference subpoly.py:584-652.  Returns (face_positions [T,3,3],
    triangle_indices [T,3]).
    """
    import jax.numpy as jnp

    from tropical.extract.common import host_region

    if vertices.shape[0] == 0:
        return np.empty((0, 3, 3), np.float32), np.empty((0, 3), np.int64)

    m_rgn, offset = host_region(net, vertices, outputs, eps)

    # exclude the final SDF plane column (subpoly.py:611)
    r_idx, aug = rg.regions_to_vertices(m_rgn[:, :-1], offset)
    v_indices = rg.region_table(r_idx, aug)
    v_indices = np.unique(v_indices, axis=0)

    mean_points, points, v_indices = mean_points_with_valid(vertices, v_indices)
    if mean_points.shape[0] == 0:
        return np.empty((0, 3, 3), np.float32), np.empty((0, 3), np.int64)

    normals = np.asarray(net.normal(jnp.asarray(mean_points.astype(np.float32))))

    valid = v_indices != -1
    order = sort_polygon_rows(points, normals, valid)
    sorted_idx = np.take_along_axis(v_indices, order, axis=1)

    tris = fan_triangles(sorted_idx)
    # the angular sort is CCW around +grad(sdf) (inward for inside-positive
    # SDFs); reverse the winding so exported normals follow the common
    # outward convention, matching the MT baseline
    tris = tris[:, ::-1]
    face_positions = vertices[tris]
    return face_positions, tris
