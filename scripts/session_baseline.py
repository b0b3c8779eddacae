"""Same-session pinned baseline: canary + sphere-large warm extraction.

Run at the start of a perf session; compare lever measurements against THIS
run's numbers (cross-session deltas <15% are device noise)."""
import json
import sys
import time

sys.path.insert(0, ".")

from tropical.utils import canary  # noqa: E402


def main():
    import numpy as np  # noqa: F401

    val = canary.measure_canary(warmups=3, runs=7)
    print(f"canary best-of-7: {val*1e3:.2f} ms", flush=True)

    sys.path.insert(0, ".")
    from bench import get_net
    from tropical.extract.subdivide import subpoly

    size = sys.argv[1] if len(sys.argv) > 1 else "large"
    force = "curved" not in sys.argv
    net = get_net(size)
    for i in range(3):
        t = time.time()
        subpoly(net, 3, 1.2, force=force, verbose=False)
        print(f"warmup {i}: {time.time()-t:.3f}s", flush=True)
    times = []
    for _ in range(5):
        t = time.time()
        _, vertices, tris = subpoly(net, 3, 1.2, force=force, verbose=False)
        times.append(time.time() - t)
    print(json.dumps({
        "config": f"sphere_{size}_{'flat' if force else 'curved'}",
        "runs_s": [round(t, 3) for t in times],
        "best_s": round(min(times), 4),
        "canary_s": round(val, 5),
        "mesh_vertices": int(vertices.shape[0]),
    }), flush=True)
    val2 = canary.measure_canary(warmups=1, runs=5)
    print(f"canary after: {val2*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
