"""Longer-settling large-preset measurement + tier meters readout.

Runs sphere-large warm extraction N times in one process and prints the
fused engine's hw meters (force=True diagnostics: [13] big-tier busy steps,
[14] small-tier busy steps, [15] max n_split over non-final big-tier
steps) — the evidence for whether a mid pair tier would pay.
"""
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    import numpy as np

    from bench import get_net
    from tropical.extract import device as dv
    from tropical.extract.subdivide import subpoly

    size = sys.argv[1] if len(sys.argv) > 1 else "large"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    net = get_net(size)
    for i in range(3):
        t = time.time()
        subpoly(net, 3, 1.2, force=True, verbose=False)
        print(f"warmup {i}: {time.time()-t:.3f}s", flush=True)
    times = []
    for _ in range(runs):
        t = time.time()
        _, vertices, tris = subpoly(net, 3, 1.2, force=True, verbose=False)
        times.append(round(time.time() - t, 3))
    hw = np.asarray(dv.LAST_HW) if dv.LAST_HW is not None else None
    print(json.dumps({
        "config": f"sphere_{size}_flat",
        "runs_s": times,
        "best_s": min(times),
        "mesh_vertices": int(vertices.shape[0]),
        "hw": hw.tolist() if hw is not None else None,
        "big_busy_steps": int(hw[13]) if hw is not None else None,
        "small_busy_steps": int(hw[14]) if hw is not None else None,
        "max_nsplit_big": int(hw[15]) if hw is not None else None,
    }), flush=True)


if __name__ == "__main__":
    main()
