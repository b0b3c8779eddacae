"""Static-shape helpers: power-of-two bucketing and padded application.

XLA compiles one program per shape.  The extraction pipeline's vertex/edge
counts change every step (reference subpoly.py:210-277 filters and appends
freely), so every jitted kernel here is called on inputs padded to a
power-of-two bucket: recompilation is O(log V) instead of O(steps).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np


def bucket_size(n: int, minimum: int = 128) -> int:
    """Smallest power of two >= max(n, minimum)."""
    n = max(int(n), minimum)
    return 1 << (n - 1).bit_length()


def pad_to(x, n: int, value=0):
    """Pad the leading axis of ``x`` to length ``n`` with ``value``."""
    x = jnp.asarray(x)
    cur = x.shape[0]
    if cur == n:
        return x
    assert cur < n, f"cannot pad {cur} down to {n}"
    widths = [(0, n - cur)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths, constant_values=value)


def padded_apply(fn: Callable, *arrays, n: int | None = None, minimum: int = 128):
    """Call ``fn`` on bucket-padded copies of ``arrays``; slice outputs back to n.

    All arrays must share their leading-axis length.  ``fn`` may return a
    single array or a tuple/list; every output with the padded leading size is
    sliced back to the true length.
    """
    if n is None:
        n = int(np.shape(arrays[0])[0])
    b = bucket_size(n, minimum)
    padded = [pad_to(a, b) for a in arrays]
    out = fn(*padded)

    def _slice(y):
        if hasattr(y, "shape") and y.ndim >= 1 and y.shape[0] == b:
            return y[:n]
        return y

    if isinstance(out, (tuple, list)):
        return type(out)(_slice(y) for y in out)
    return _slice(out)
