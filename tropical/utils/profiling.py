"""Tracing / profiling utilities.

Formalizes the reference's ad-hoc instrumentation (SURVEY §5.1: a ``timeit``
decorator at subpoly_debug.py:15-30, a DEBUG flag timing extract_faces stages
at subpoly.py:598-650, and the headline ``subpoly`` wall-clock at
train.py:123-129) into one module:

- ``timeit``: wall-clock decorator,
- ``Phases``: named per-phase accumulating timers with a summary table,
- ``trace``: context manager around ``jax.profiler`` for TPU traces
  (view with tensorboard or xprof).

Enable phase timing in the extraction engine with TROPICAL_PROFILE=1.
"""

from __future__ import annotations

import contextlib
import functools
import os
import time
from collections import defaultdict

PROFILE = bool(int(os.environ.get("TROPICAL_PROFILE", "0")))


def timeit(func):
    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        start = time.perf_counter()
        result = func(*args, **kwargs)
        print(f"Function '{func.__name__}' executed in "
              f"{time.perf_counter() - start:.4f} seconds.")
        return result

    return wrapper


class Phases:
    """Accumulating named timers: ``with phases('forward'): ...``."""

    def __init__(self, enabled: bool | None = None):
        self.enabled = PROFILE if enabled is None else enabled
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        if not self.enabled:
            yield
            return
        t = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t
            self.counts[name] += 1

    def summary(self) -> str:
        if not self.totals:
            return ""
        width = max(len(k) for k in self.totals)
        lines = ["phase timing:"]
        for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(f"  {k:<{width}}  {v:8.3f}s  x{self.counts[k]}")
        return "\n".join(lines)

    def report(self):
        if self.enabled and self.totals:
            print(self.summary())


@contextlib.contextmanager
def trace(logdir: str = "/tmp/tropical-trace"):
    """jax.profiler trace around a region (TPU timeline in tensorboard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
