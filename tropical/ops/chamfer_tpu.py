"""Nearest-neighbour min-distance on TPU: MXU matmul trick + Pallas kernel.

The chamfer metric needs ``min_j ||x_i - y_j||`` for ~100k x ~400k points
(reference chamfer_distance.py:39-48 uses sklearn KD-trees on host).  Trees
don't map to TPUs; instead the pairwise distance matrix is computed blockwise
with the classic expansion

    ||x - y||^2 = |x|^2 + |y|^2 - 2 x.y

so the O(N*M) work rides the MXU as a [BX, 3] x [3, BY] matmul, and only the
running row-min ever leaves the block — the [BX, BY] tile never touches HBM.

Two implementations with identical semantics:
- ``min_dist_xla``: lax.scan over y-blocks (XLA fuses the matmul + min),
- ``min_dist_pallas``: explicit Pallas kernel with the y-panel resident in
  VMEM and a fori_loop over x-tiles; used on TPU, falls back to XLA elsewhere.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BX = 1024   # x rows per tile
BY = 4096   # y rows per panel


@partial(jax.jit, static_argnames=("by",))
def min_dist_xla(x, y, by=BY):
    """min_j ||x_i - y_j|| via MXU blocks + exact refinement.

    The expansion |x|^2+|y|^2-2x.y cancels catastrophically for nearby points
    (a ~1e-3 noise floor — fatal for chamfer values of that order), so the
    matmul pass only finds the *argmin*; the distance to that neighbour is
    recomputed with the direct difference, which is exact.  If cancellation
    noise picks a slightly-wrong neighbour, the two candidates were within
    the noise of each other, so the recomputed distance error is negligible.
    """
    ny = y.shape[0] // by
    y_blocks = y.reshape(ny, by, 3)
    x2 = (x * x).sum(-1)

    def body(carry, blk):
        best_d2, best_j = carry
        yb, base = blk
        y2 = (yb * yb).sum(-1)
        cross = jnp.dot(x, yb.T, precision=jax.lax.Precision.HIGHEST)  # MXU, 6-pass f32
        d2 = x2[:, None] + y2[None, :] - 2.0 * cross
        dmin = d2.min(-1)
        jmin = d2.argmin(-1).astype(jnp.int32) + base
        better = dmin < best_d2
        return (jnp.where(better, dmin, best_d2),
                jnp.where(better, jmin, best_j)), None

    init = (jnp.full((x.shape[0],), jnp.inf, x.dtype),
            jnp.zeros((x.shape[0],), jnp.int32))
    bases = jnp.arange(ny, dtype=jnp.int32) * by
    (d2, j), _ = jax.lax.scan(body, init, (y_blocks, bases))
    diff = x - y[j]
    return (diff * diff).sum(-1)


def _min_dist_kernel(x_ref, y_ref, out_ref):
    """One x-tile vs the full y-panel (grid dim 0 walks x tiles).

    The MXU pass only finds the argmin (int32 output); the caller recomputes
    the distance exactly with a direct difference (see min_dist_xla for the
    cancellation rationale — and Mosaic has no vectorized VMEM gather, so the
    refinement lives outside the kernel)."""
    x = x_ref[:]                    # [BX, 3]
    y = y_ref[:]                    # [BY_panel, 3]
    x2 = (x * x).sum(-1)
    y2 = (y * y).sum(-1)
    cross = jnp.dot(x, y.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    d2 = x2[:, None] + y2[None, :] - 2.0 * cross
    out_ref[:] = d2.argmin(-1).astype(jnp.int32)


def min_dist_pallas(x, y):
    """Pallas version: y resident in VMEM, grid over x tiles.

    Requires y to fit VMEM (~<= 1M points of f32x3 = 12 MB); callers fall
    back to min_dist_xla above that.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    assert n % BX == 0, "pad x to a BX multiple"
    j = pl.pallas_call(
        _min_dist_kernel,
        grid=(n // BX,),
        in_specs=[
            pl.BlockSpec((BX, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((y.shape[0], 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BX,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
    )(x, y)
    diff = x - y[j]
    return (diff * diff).sum(-1)


def _pad_rows(a: np.ndarray, mult: int, fill: float) -> np.ndarray:
    """Pad to a power-of-two multiple of ``mult`` (bucketed shapes reuse
    compiled programs across differently-sized point sets)."""
    n = max(a.shape[0], mult)
    target = mult * (1 << (((n + mult - 1) // mult) - 1).bit_length())
    if target == a.shape[0]:
        return a
    return np.concatenate(
        [a, np.full((target - a.shape[0],) + a.shape[1:], fill, a.dtype)])


def min_nn_distance(x: np.ndarray, y: np.ndarray,
                    use_pallas: bool | None = None) -> np.ndarray:
    """Distance from each x point to its nearest y point (host API)."""
    n = x.shape[0]
    xp = jnp.asarray(_pad_rows(np.asarray(x, np.float32), BX, 0.0))
    yp = jnp.asarray(_pad_rows(np.asarray(y, np.float32), BY, 1e8))
    if use_pallas is None:
        # opt-in only: at eval shapes (x=y=131072) the Mosaic compile of the
        # Pallas kernel hangs the tunneled v5e worker indefinitely (measured
        # 2026-08-18; min_dist_xla compiles in ~2 s and is MXU-bound anyway,
        # so the kernel buys nothing at these sizes)
        import os

        use_pallas = (os.environ.get("TROPICAL_CHAMFER") == "pallas"
                      and jax.default_backend() == "tpu"
                      and yp.shape[0] * 12 <= 8 * 2 ** 20)
    if use_pallas:
        try:
            d2 = min_dist_pallas(xp, yp)
        except Exception:
            d2 = min_dist_xla(xp, yp)
    else:
        d2 = min_dist_xla(xp, yp)
    return np.sqrt(np.asarray(d2[:n]))
