"""Small tensor helpers (reference tropical/torch_ext.py equivalents).

The reference monkey-patches these onto ``torch.ext`` (tropical/__init__.py:
6-9); here they are plain vectorized numpy functions (the reference's
``nonzero_last``/``nonzero_first`` are Python loops over ``nonzero()``,
torch_ext.py:18-43 — O(nnz) interpreter time; these are O(N) array ops).
"""

from __future__ import annotations

import numpy as np


def nonzero_last(t: np.ndarray) -> np.ndarray:
    """Per row with any nonzero: (row, last nonzero column)."""
    t = np.asarray(t) != 0
    assert t.ndim == 2
    any_ = t.any(axis=1)
    if t.shape[1] == 0:
        return np.empty((0, 2), np.int64)
    cols = t.shape[1] - 1 - np.argmax(t[:, ::-1], axis=1)
    rows = np.nonzero(any_)[0]
    return np.stack([rows, cols[any_]], axis=1).astype(np.int64)


def nonzero_first(t: np.ndarray) -> np.ndarray:
    """Per row with any nonzero: (row, first nonzero column)."""
    t = np.asarray(t) != 0
    assert t.ndim == 2
    any_ = t.any(axis=1)
    cols = np.argmax(t, axis=1)
    rows = np.nonzero(any_)[0]
    return np.stack([rows, cols[any_]], axis=1).astype(np.int64)


def batched_index_select(t: np.ndarray, dim: int, inds: np.ndarray) -> np.ndarray:
    """Gather rows per batch (reference torch_ext.py:47-50 semantics)."""
    assert dim in (-2, 1, t.ndim - 2)
    return np.take_along_axis(t, inds[..., None], axis=-2)


def low_precision(x: np.ndarray, scale: float = 1e5) -> np.ndarray:
    """Truncate to ~5 decimal digits (reference tropical.py:284-288)."""
    return np.floor(np.asarray(x) * scale) / scale


def batched_unique_consecutive(t: np.ndarray, null_value: int = -1) -> np.ndarray:
    """Row-wise unique_consecutive with right-padding (torch_ext.py:54-66)."""
    t = np.asarray(t)
    rows = []
    for row in t:
        keep = np.concatenate([[True], row[1:] != row[:-1]])
        rows.append(row[keep])
    max_len = max(len(r) for r in rows)
    out = np.full((len(rows), max_len), null_value, t.dtype)
    for i, r in enumerate(rows):
        out[i, :len(r)] = r
    return out
