"""Cold-process extraction cost across the blessed presets (VERDICT r4 #4).

Spawns a FRESH python process per (size, force) config, times its FIRST
``subpoly`` extraction (cold = process start, caps loaded from the committed
``caps_cache.json``, XLA programs from the persistent compile cache
``~/.cache/tropical-xla``), then times a warm repeat in the same process.
Prints one JSON line per config with cold_s / warm_s / ratio.

Usage::

    python scripts/cold_start.py              # all six blessed configs
    python scripts/cold_start.py small 1      # one config

The acceptance bar from VERDICT round 4: cold <= 2x warm on every preset
(i.e. a fresh process pays cache loads + h2d, not minutes of remote XLA
compiles — logs/run_small_torus.log:11 recorded 339.6 s before the caches
were pre-seeded)."""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, time, sys
t_proc = time.time()
from bench import get_net
from tropical.extract.subdivide import subpoly
size, force = sys.argv[1], sys.argv[2] == "1"
net = get_net(size)
t0 = time.time()
_, v, f = subpoly(net, 3, 1.2, force=force, verbose=False)
cold = time.time() - t0
warm = None
for _ in range(3):
    t0 = time.time()
    subpoly(net, 3, 1.2, force=force, verbose=False)
    dt = time.time() - t0
    warm = dt if warm is None else min(warm, dt)
print(json.dumps({
    "config": f"{size}_{'flat' if force else 'curved'}",
    "cold_s": round(cold, 3), "warm_s": round(warm, 3),
    "cold_over_warm": round(cold / warm, 2),
    "proc_total_s": round(time.time() - t_proc, 3),
    "mesh_vertices": int(v.shape[0]),
}), flush=True)
"""


def main():
    if len(sys.argv) > 2:
        configs = [(sys.argv[1], sys.argv[2])]
    else:
        configs = [(s, f) for s in ("small", "medium", "large")
                   for f in ("1", "0")]
    for size, force in configs:
        r = subprocess.run([sys.executable, "-c", CHILD, size, force],
                           cwd=HERE, capture_output=True, text=True)
        out = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        print(out[-1] if out else json.dumps(
            {"config": f"{size}_{force}", "error": r.stderr[-400:]}),
            flush=True)


if __name__ == "__main__":
    main()
