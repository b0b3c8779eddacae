"""Capture a jax.profiler trace of one warm fused device extraction and
aggregate op-level self-times from the trace events.

Reuses the compiled fused program out of the engine's own cache (zero extra
compiles): run subpoly_device twice to land on tight caps, then trace the
cached program.

    python scripts/trace_device.py [small|medium|large]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")


def force(x):
    import jax

    for leaf in jax.tree_util.tree_leaves(x)[::-1]:
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0) > 0:
            np.asarray(leaf.ravel()[:1])
            return


def main():
    import jax

    from scripts.profile_device import get_net
    from tropical.extract.device import _EXTRACT_CACHE, subpoly_device

    size = sys.argv[1] if len(sys.argv) > 1 else "small"
    net = get_net(size)
    t0 = time.time()
    subpoly_device(net, verbose=False, force=True)  # memoize caps + compile
    print(f"cold {time.time() - t0:.1f}s")
    t0 = time.time()
    _, verts, _ = subpoly_device(net, verbose=False, force=True)
    print(f"warm {time.time() - t0:.2f}s  {verts.shape[0]} verts")

    # the fused skeleton+loop+faces program subpoly_device just ran
    fused = [fn for key, fn in _EXTRACT_CACHE.items()
             if isinstance(key, tuple) and key and key[-1] == "fused"
             and key[0] == net.spec]
    assert fused, "no cached fused program (did the run fall back to ramp?)"
    fn = fused[-1]
    out = fn(net.params, net.marks)
    force(out)

    import shutil
    shutil.rmtree("/tmp/jxtrace", ignore_errors=True)
    with jax.profiler.trace("/tmp/jxtrace"):
        out = fn(net.params, net.marks)
        force(out)

    files = glob.glob("/tmp/jxtrace/**/*.trace.json.gz", recursive=True)
    print("trace files:", files)
    agg = defaultdict(float)
    total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            name = ev.get("name", "")
            dur = ev.get("dur", 0) / 1e3  # us -> ms
            pid = ev.get("pid", 0)
            agg[(pid, name.split(".")[0][:60])] += dur
            total += dur
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    for (pid, name), ms in top:
        print(f"{ms:10.1f} ms  pid={pid}  {name}")


if __name__ == "__main__":
    main()
