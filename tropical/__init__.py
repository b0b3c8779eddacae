"""tropical — TPU-native polyhedral-complex extraction from piecewise-trilinear SDF nets.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the PyTorch
reference ``seonghunn/tropical-nerf.pytorch`` ("Polyhedral Complex Derivation from
Piecewise Trilinear Networks", NeurIPS 2024).  The public package name and API
surface mirror the reference (``tropical/__init__.py:1-34`` re-exports the grid
module there); the implementation is a new TPU-first design:

- hash-grid encoding + MLP run as fused, jitted XLA/Pallas programs,
- the edge-subdivision loop keeps all geometry on-device with bucketed shapes,
- region bookkeeping uses packed-integer sort/unique instead of dict loops,
- polynomial roots are closed-form/bracketed (no LAPACK eig on TPU).
"""

import os as _os

if _os.environ.get("TROPICAL_NO_COMPILE_CACHE") != "1":
    # persistent XLA compilation cache: the fused extraction program costs
    # ~1-3 min to compile; caching it makes every CLI invocation after the
    # first start warm (the reference's CUDA kernels are likewise AOT).
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir",
                       _os.path.expanduser("~/.cache/tropical-xla"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# f32 matmuls must BE f32: TPUs lower default-precision f32 matmuls to
# one-pass bf16 on the MXU (~0.4% relative error).  The geometry here lives
# on CANCELLATION — sdf values near zero are differences of O(1) terms, and
# the chamfer MXU trick |x|^2+|y|^2-2x.y needs the cross term to ~1e-6 —
# so bf16 passes inflate eval CD ~10x (measured: 0.0218 vs 0.0024 on the
# same meshes) and blur root brackets.  The extraction engine is
# gather-bound (ROADMAP.md), so the 6-pass f32 MXU cost is noise.
# The reference runs CUDA fp32 cuBLAS (exact f32) and never faces this.
import jax as _jax2

_jax2.config.update("jax_default_matmul_precision", "highest")

from tropical.core.hashgrid import HashGridSpec, Tropical, TropicalHashGrid
from tropical.version import __version__

__all__ = ["HashGridSpec", "Tropical", "TropicalHashGrid", "deprecated",
           "__version__"]


def deprecated(arg=None):
    """Decorator marking deprecated API (parity with reference tropical/__init__.py:12-34).

    Usable bare (``@deprecated``) or with a reason (``@deprecated("msg")``).
    """
    import functools
    import warnings

    def _wrap(func, reason=""):
        @functools.wraps(func)
        def inner(*args, **kwargs):
            warnings.warn(
                f"{func.__name__} is deprecated. {reason}",
                DeprecationWarning,
                stacklevel=2,
            )
            return func(*args, **kwargs)

        return inner

    if callable(arg):
        return _wrap(arg)
    return lambda func: _wrap(func, arg or "")
