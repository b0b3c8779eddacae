"""Region (sign-vector) bookkeeping: Def. 3.4 adjacency via zero expansion.

Port of reference tropical/subpoly.py:281-370,484-535 semantics.  A vertex's
ternary sign vector m in {-1,0,+1}^(D+R) (the first D columns are the {0,1}
grid mask paired with integer cell ``offset``s) is expanded into all
2^(#zeros) adjacent-region replicas; grid columns map their +-1 pattern to the
cell index ``offset`` or ``offset-1``.  Regions are identified by row-unique
ids; the region->vertex table then yields candidate connecting edges, filtered
to pairs sharing at least one common zero plane (grid planes must also share
the cell offset).

This v1 implementation is host-side numpy: it is pure integer bookkeeping with
data-dependent shapes (the compute-heavy work stays on TPU).  A fused on-device
variant with packed-key sort/unique lives behind the same API and can be
swapped in per call site.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _sign_patterns(k: int) -> np.ndarray:
    """All 2^k vectors over {-1, +1}, ordered like torch.cartesian_prod
    (first column slowest; reference subpoly.py:317)."""
    if k == 0:
        return np.zeros((1, 0), np.int64)
    grids = np.meshgrid(*([np.array([-1, 1], np.int64)] * k), indexing="ij")
    return np.stack([g.ravel() for g in grids], axis=-1)


def regions_to_vertices(m: np.ndarray, offset: np.ndarray
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Expand sign vectors into adjacent-region replicas.

    Args:
        m: [N, C] ternary sign matrix (first D columns: {0,1} grid mask).
        offset: [N, D] integer cell offsets.

    Returns:
        (r_idx [M], idx_org [M]): region id per replica and the original row.
        Replicas of a row are contiguous; rows are grouped by ascending
        zero-count (matching reference subpoly.py:306-335 ordering).
    """
    if m.size == 0:
        z = np.empty(0, np.int64)
        return z, z
    m = np.asarray(m, np.int64)
    offset = np.asarray(offset, np.int64)
    D = offset.shape[1]
    C = m.shape[1]

    k = (m == 0).sum(1)
    aug_list, idx_list = [], []
    for ki in np.unique(k):
        rows = np.nonzero(k == ki)[0]
        G = len(rows)
        dim = 1 << int(ki)
        patterns = _sign_patterns(int(ki))
        rep = np.repeat(m[rows], dim, axis=0)  # (g,p) row-major like expand+reshape
        zero_mask = rep == 0
        rep[zero_mask] = np.tile(patterns, (G, 1)).ravel()
        # grid columns: -1 pattern -> cell offset-1, +1 -> offset; mask==1 -> offset
        rep[:, :D] = (rep[:, :D] - 1) // 2 + np.repeat(offset[rows], dim, axis=0)
        aug_list.append(rep)
        idx_list.append(np.repeat(rows, dim))

    m_aug = np.concatenate(aug_list, axis=0)
    idx_org = np.concatenate(idx_list, axis=0)
    # Region ids by packed-key grouping: after expansion, neuron columns are
    # in {-1,+1} (one sign bit) and grid columns are small cell indices, so
    # every row packs exactly into a few int64 keys — grouping is identical
    # to np.unique(axis=0) over the wide row matrix but ~20x faster (the
    # wide-row unique was ~70% of the whole faces stage).  Region id
    # NUMBERING differs (key order vs row-lex order), which nothing
    # downstream observes: connecting-edge pairs are sorted+deduped and the
    # faces table is re-sorted by vertex content (subpoly.py:617-620).
    kg = np.zeros(m_aug.shape[0], np.int64)
    for dax in range(D):
        # +2: grid values reach offset-1 >= -2 under the -1 wrap semantics
        kg = (kg << 21) | (m_aug[:, dax] + 2)
    nb = m_aug[:, D:] > 0
    keys = [kg]
    for c0 in range(0, C - D, 62):
        w = nb[:, c0:c0 + 62]
        keys.append(w.dot(1 << np.arange(w.shape[1], dtype=np.int64)))
    order = np.lexsort(tuple(keys[::-1]))
    ks = [kk[order] for kk in keys]
    new = np.zeros(m_aug.shape[0], bool)
    new[0] = True
    for kk in ks:
        new[1:] |= kk[1:] != kk[:-1]
    rid_sorted = np.cumsum(new) - 1
    r_idx = np.empty(m_aug.shape[0], np.int64)
    r_idx[order] = rid_sorted
    return r_idx, idx_org


def region_table(r_idx: np.ndarray, idx_org: np.ndarray,
                 null_value: int = -1) -> np.ndarray:
    """Left-aligned (Region x maxlen) vertex-index table (subpoly.py:342-370).

    May contain duplicated vertex indices (replicas of the same vertex landing
    in the same region)."""
    if r_idx.size == 0:
        return np.empty((0, 0), np.int64)
    order = np.argsort(r_idx, kind="stable")
    rs = r_idx[order]
    vs = idx_org[order]
    _, starts, counts = np.unique(rs, return_index=True, return_counts=True)
    R = len(counts)
    maxlen = int(counts.max())
    out = np.full((R, maxlen), null_value, np.int64)
    mask = np.arange(maxlen)[None, :] < counts[:, None]
    out[mask] = vs
    return out


def edge_vertices(m: np.ndarray, offset: np.ndarray) -> np.ndarray:
    """Connecting edges among same-region vertices sharing a zero plane.

    Port of reference subpoly.py:484-535.  Returns [P, 2] pairs of *local* row
    indices into m/offset, deduplicated with sorted pair order.
    """
    m = np.asarray(m, np.int64)
    offset = np.asarray(offset, np.int64)
    r_idx, aug = regions_to_vertices(m, offset)
    table = region_table(r_idx, aug)
    if table.size == 0:
        return np.empty((0, 2), np.int64)

    maxlen = table.shape[1]
    pairs = []
    for i in range(1, maxlen):
        a = table[:, i]
        valid = a != -1  # left-aligned: column i valid implies 0..i-1 valid
        if not valid.any():
            break
        av = a[valid]
        for j in range(i):
            pairs.append(np.stack([av, table[valid, j]], axis=1))
    if not pairs:
        return np.empty((0, 2), np.int64)
    out = np.concatenate(pairs, axis=0)
    out.sort(axis=1)
    out = np.unique(out, axis=0)
    out = out[out[:, 0] != out[:, 1]]
    if out.size == 0:
        return out

    # pairs must share >= 1 common zero plane; grid-plane matches must also
    # share the cell offset (subpoly.py:524-531)
    D = offset.shape[1]
    chk1 = (m == 0)[out]  # [P, 2, C]
    both = chk1[:, 0] & chk1[:, 1]
    zero_counts = both.sum(-1)
    chk2 = offset[out]
    zero_counts -= (both[:, :D] & (chk2[:, 0] != chk2[:, 1])).sum(-1)
    return out[zero_counts >= 1]


def row_unique_inverse(m: np.ndarray) -> np.ndarray:
    """Inverse indices of row-wise unique (np.unique(axis=0) wrapper)."""
    if m.shape[0] == 0:
        return np.empty(0, np.int64)
    _, inv = np.unique(np.ascontiguousarray(m), axis=0, return_inverse=True)
    return inv.astype(np.int64)
