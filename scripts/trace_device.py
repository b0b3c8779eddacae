"""Capture a jax.profiler trace of one warm device extraction and aggregate
op-level self-times from the trace events.

    python scripts/trace_device.py [small|medium]
"""

from __future__ import annotations

import glob
import gzip
import json
import sys
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

    from scripts.profile_device import build_pools, get_net
    from tropical.extract.device import _GOOD_CAPS, make_extract_fn, \
        subpoly_device

    size = sys.argv[1] if len(sys.argv) > 1 else "small"
    net = get_net(size)
    t0 = __import__("time").time()
    subpoly_device(net, verbose=False, force=True)  # memoize caps + compile
    print(f"cold {__import__('time').time()-t0:.1f}s")
    t0 = __import__("time").time()
    _, verts, _ = subpoly_device(net, verbose=False, force=True)
    print(f"2nd (tight-caps compile) {__import__('time').time()-t0:.1f}s")
    t0 = __import__("time").time()
    _, verts, _ = subpoly_device(net, verbose=False, force=True)
    print(f"warm {__import__('time').time()-t0:.2f}s  {verts.shape[0]} verts")

    import os

    M = int(net.marks.shape[0])
    mode = os.environ.get("TROPICAL_SKEL_MODE", "dist")
    caps = _GOOD_CAPS[(net.spec, M, True, mode)]
    print("caps:", caps)
    skel, (Vp, Op, Ep, nV0, nE0) = build_pools(net, caps, mode=mode)
    force(Ep)
    fn = make_extract_fn(net.spec, caps, 1e-4, force=True)
    out = fn(net.params, net.marks, Vp, Op, Ep, nV0, nE0)
    force(out)

    import shutil
    shutil.rmtree("/tmp/jxtrace", ignore_errors=True)
    with jax.profiler.trace("/tmp/jxtrace"):
        out = fn(net.params, net.marks, Vp, Op, Ep, nV0, nE0)
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
            # keep device lanes only (heuristic: XLA op names)
            pid = ev.get("pid", 0)
            agg[(pid, name.split(".")[0][:60])] += dur
            total += dur
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    for (pid, name), ms in top:
        print(f"{ms:10.1f} ms  pid={pid}  {name}")


if __name__ == "__main__":
    main()
