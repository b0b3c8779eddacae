"""Shared host-side helpers for the extraction engine."""

from __future__ import annotations

import numpy as np


def net_outputs(net, x: np.ndarray, group: int = 1) -> np.ndarray:
    """Gathered neuron-distance columns via the device net (writable copy)."""
    import jax.numpy as jnp

    return np.array(net.outputs(jnp.asarray(np.asarray(x, np.float32)),
                                group=group))


def host_region(net, x: np.ndarray, outputs: np.ndarray, eps: float):
    """Region sign vector + grid offset from *cached* outputs — pure host math
    (elementwise eps-sign + searchsorted over marks), no device round-trip.

    Semantics of reference model.py:90-103 / tropical.py:227-236.
    """
    m = np.where(outputs > 0, 1, -1).astype(np.int32)
    m[np.abs(outputs) <= eps] = 0
    xu = np.asarray(net.preprocess(np.asarray(x, np.float32)))
    marks = np.asarray(net.marks)
    off = np.searchsorted(marks, xu + eps) - 1
    mark_at = marks[off]  # index -1 wraps to the last mark (torch semantics)
    grid = (np.abs(mark_at - xu) > eps).astype(np.int32)
    return np.concatenate([grid, m], axis=-1), off.astype(np.int32)
