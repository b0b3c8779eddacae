"""Device-health canary: a pinned device program whose runtime is compared
against a committed per-backend reference value.

Motivation (round 4): the tunneled v5e ran the SAME compiled extraction
programs 10-40% slower for hours after a worker crash, which made
cross-session BENCH deltas unfalsifiable — "device is sick" and "code got
slower" looked identical in the recorded numbers.  The canary converts that
device-state variance into a measurement: it never changes across rounds
(any edit invalidates the committed reference — bump CANARY_VERSION and
re-pin), is sort+gather bound like the extraction engine itself, and runs
in ~10-30 ms so bracketing a bench suite with it costs nothing.

Usage::

    from tropical.utils.canary import run_canary
    health = run_canary()      # {"canary_s": ..., "ref_s": ..., "ratio": ...,
                               #  "healthy": bool, "note": str}

`bench.py` runs it before and after the suite and stamps the result into
every metric's ``extra`` so the driver's BENCH_r{N}.json records whether
the chip was at its committed reference speed.
"""

from __future__ import annotations

import json
import os
import time

# Bump ONLY when the canary program changes (which re-pins the reference).
CANARY_VERSION = 1

# Committed reference values: best-of-5 warm runs on a healthy device,
# measured at round 5 pinning time.  Keyed by jax backend platform.
# A missing key means "no reference yet" — run scripts/pin_canary.py.
_REF_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "canary_reference.json")

# deviation beyond this (slower OR faster) vs the committed reference marks
# the device state as suspect; VERDICT round-4 asked for 15%
HEALTHY_BAND = 0.15

_N = 1 << 20        # 1M rows
_GATHER_ITERS = 8   # sort+gather chain length — mirrors the engine's profile


def _canary_program():
    """The pinned program: 1M-row sort + 8 argsort/gather rounds.  Pure
    function of a fixed PRNG key; shapes and op mix never change."""
    import jax
    import jax.numpy as jnp

    def canary(key):
        x = jax.random.uniform(key, (_N,), dtype=jnp.float32)
        idx = jnp.argsort(x)
        y = x[idx]
        for _ in range(_GATHER_ITERS):
            idx = jnp.argsort(y * jnp.float32(1.0000001))
            y = y[idx] + x[idx]
        return y

    return jax.jit(canary)


def measure_canary(warmups: int = 2, runs: int = 5) -> float:
    """Best-of-`runs` warm wall-clock of the canary program in seconds.
    The result is forced with a 1-element device-side slice pull (the axon
    backend's block_until_ready does not block; a full pull would measure
    the ~40 MB/s tunnel, not the device)."""
    import jax
    import numpy as np

    fn = _canary_program()
    k = jax.random.PRNGKey(0)
    for _ in range(warmups):
        r = fn(k)
        np.asarray(r.ravel()[:1])
    best = None
    for _ in range(runs):
        t = time.time()
        r = fn(k)
        np.asarray(r.ravel()[:1])
        dt = time.time() - t
        best = dt if best is None else min(best, dt)
    return float(best)


def load_reference() -> dict:
    if os.path.exists(_REF_PATH):
        with open(_REF_PATH) as f:
            data = json.load(f)
        if data.get("version") == CANARY_VERSION:
            return data.get("refs", {})
    return {}


def pin_reference(value_s: float, platform: str) -> None:
    data = {"version": CANARY_VERSION, "refs": load_reference()}
    data["refs"][platform] = round(value_s, 5)
    with open(_REF_PATH, "w") as f:
        json.dump(data, f, indent=1)
        f.write("\n")


def run_canary(warmups: int = 2, runs: int = 5) -> dict:
    """Measure the canary and judge device health against the committed
    reference.  Never raises — a failure is reported in the dict."""
    try:
        import jax

        platform = jax.devices()[0].platform
        val = measure_canary(warmups, runs)
        refs = load_reference()
        ref = refs.get(platform)
        out = {"canary_s": round(val, 5), "platform": platform,
               "version": CANARY_VERSION}
        if ref is None:
            out["ref_s"] = None
            out["healthy"] = None
            out["note"] = ("no committed reference for this platform — "
                           "run scripts/pin_canary.py on a healthy device")
        else:
            ratio = val / ref
            out["ref_s"] = ref
            out["ratio"] = round(ratio, 3)
            out["healthy"] = bool(abs(ratio - 1.0) <= HEALTHY_BAND)
            if ratio > 1.0 + HEALTHY_BAND:
                out["note"] = (f"DEVICE SLOW: canary {ratio:.2f}x its "
                               "committed reference — wall-clock deltas this "
                               "session are suspect (device-state variance)")
            elif ratio < 1.0 - HEALTHY_BAND:
                out["note"] = (f"device faster than reference ({ratio:.2f}x) "
                               "— reference may be stale")
            else:
                out["note"] = "device at reference speed"
        return out
    except Exception as e:  # pragma: no cover - device-state failures
        return {"canary_s": None, "healthy": None,
                "note": f"canary failed: {e!r}"}
