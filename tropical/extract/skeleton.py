"""Initial edge skeleton on the hash-grid mark lattice with Lipschitz pruning.

Port of reference tropical/tropical.py:113-138,158-225: sweep the marks^3
lattice in chunks, evaluate |sdf| and its gradient on TPU, and keep only
lattice edges whose two endpoints are within the distance bound
``eps = sqrt(3) * 2 * max_cell * max_grad`` of the surface.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def get_hypercube(d: int, size: float):
    """Fallback start: hypercube vertices/edges/faces (reference subpoly.py:731-750)."""
    x = np.array([-size, size], np.float32)
    grids = np.stack(np.meshgrid(x, x, x, indexing="ij"), axis=-1)
    vertices = grids.reshape(-1, 3)
    edges = []
    for i in range(vertices.shape[0]):
        for j in range(i + 1, vertices.shape[0]):
            if ((vertices[i] * vertices[j]) < 0).sum() == 1:
                edges.append([i, j])
    faces = [[0, 3, 5, 1], [0, 2, 8, 4], [3, 4, 10, 7],
             [1, 2, 9, 6], [8, 9, 11, 10], [7, 11, 6, 5]]
    return vertices, np.asarray(edges, np.int64), faces


AXIS_SLICES = (((slice(1, None), slice(None), slice(None)),
                (slice(None, -1), slice(None), slice(None))),
               ((slice(None), slice(1, None), slice(None)),
                (slice(None), slice(None, -1), slice(None))),
               ((slice(None), slice(None), slice(1, None)),
                (slice(None), slice(None), slice(None, -1))))


def grid_skeleton(net, unit: int = 128, mode: str = "sign"
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Pruned initial skeleton (reference tropical.py:158-225).

    ``mode`` selects the pruning strategy (reference PRUNING_MODE switch,
    tropical.py:188-204): "distance" keeps lattice edges within the Lipschitz
    bound eps = sqrt(3)*2*max_cell*max_grad of the surface; "sign" keeps edges
    whose endpoint sign vectors differ; "none" keeps everything.

    The default here is "sign" (the reference defaults to "distance"): an
    edge whose endpoints share every neuron sign is never split and — since
    the subdivision loop prunes same-future-region edges at every step — can
    never reach the final skeleton, so both modes give the *identical* final
    mesh (verified bitwise in tests/test_device_engine.py), while "sign"
    starts from a ~3-4x smaller edge set and needs no gradient pass.

    Returns (vertices [V,3] world coords float32, edges [E,2] int64 with
    compacted vertex ids).
    """
    import jax.numpy as jnp

    marks = np.asarray(net.marks)
    L = len(marks)
    max_len = float(np.diff(marks).max())

    edge_chunks = []
    for i0 in range(0, L, unit - 1):
        for j0 in range(0, L, unit - 1):
            for k0 in range(0, L, unit - 1):
                start = (i0, j0, k0)
                end = [min(L, s + unit) for s in start]
                axes = [np.arange(s, e) for s, e in zip(start, end)]
                indices = np.stack(
                    np.meshgrid(*axes, indexing="ij"), axis=-1)  # [U,U,U,3]
                x = net.preprocess_inverse(marks[indices].reshape(-1, 3))

                serial = (indices[..., 0] * L * L
                          + indices[..., 1] * L
                          + indices[..., 2]).astype(np.int64)

                if mode == "distance":
                    sdf, grad = net.sdf_and_grad(jnp.asarray(x))
                    max_grad = float(
                        np.linalg.norm(np.asarray(grad), axis=-1).max())
                    dist = np.abs(np.asarray(sdf))[:, 0].reshape(
                        indices.shape[:-1])
                    eps = np.sqrt(3.0) * 2 * max_len * max_grad
                    for sl_a, sl_b in AXIS_SLICES:
                        m = (dist[sl_a] <= eps) & (dist[sl_b] <= eps)
                        edge_chunks.append(np.stack(
                            [serial[sl_a][m], serial[sl_b][m]], axis=-1))
                elif mode == "sign":
                    # neuron sign vectors differ across the edge
                    # (reference _skeleton, tropical.py:81-111)
                    out = np.asarray(net.outputs(jnp.asarray(x)))
                    sgn = np.where(out > 0, 1, -1).astype(np.int8)
                    sgn[np.abs(out) <= net.eps] = 0
                    future = sgn.reshape(*indices.shape[:-1], -1)
                    for sl_a, sl_b in AXIS_SLICES:
                        m = (future[sl_a] != future[sl_b]).sum(-1) > 0
                        edge_chunks.append(np.stack(
                            [serial[sl_a][m], serial[sl_b][m]], axis=-1))
                elif mode == "none":
                    for sl_a, sl_b in AXIS_SLICES:
                        edge_chunks.append(np.stack(
                            [serial[sl_a].reshape(-1),
                             serial[sl_b].reshape(-1)], axis=-1))
                else:
                    raise ValueError(f"unknown pruning mode {mode!r}")

    edges = np.concatenate(edge_chunks, axis=0)
    if edges.shape[0] == 0:
        return np.empty((0, 3), np.float32), np.empty((0, 2), np.int64)

    v_idx, inverse = np.unique(edges.reshape(-1), return_inverse=True)
    edges = inverse.reshape(-1, 2).astype(np.int64)

    # serialized id -> per-axis mark indices -> world coords
    p = np.stack([v_idx // (L * L), (v_idx // L) % L, v_idx % L], axis=-1)
    vertices = np.asarray(net.preprocess_inverse(marks[p]), np.float32)
    return vertices, edges
