"""Scale benchmark: warm extraction wall-clock for small/medium/large sphere
presets on the attached TPU (reference scale datapoints: BASELINE.md —
small-bunny 0.87 s / 5.2k verts/s, large-bunny 1.59 s / 85k verts/s).

    python scripts/bench_scale.py [small medium large]

Prints one JSON line per preset: {"preset", "warm_s", "verts", "verts_per_sec"}.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax

    from tropical.stanford.model import Net
    from tropical.utils import checkpoint as ckpt
    from tropical.extract.subdivide import subpoly

    presets = sys.argv[1:] or ["small", "medium", "large"]
    cfg = {"small": (2, 32), "medium": (4, 64), "large": (8, 128)}
    for preset in presets:
        r_min, r_max = cfg[preset]
        net = Net(num_layers=3, num_hidden=16, levels=4, r_min=r_min,
                  r_max=r_max, T=19, key=jax.random.PRNGKey(1))
        path = f"tropical/stanford/models/sphere/sphere_sdf_{preset}_1.pth"
        found = ckpt.find_checkpoint(path)
        assert found, path
        ckpt.load_into(net, found)

        t0 = time.time()
        subpoly(net, 3, 1.2, force=True, verbose=False)
        cold = time.time() - t0
        t0 = time.time()
        subpoly(net, 3, 1.2, force=True, verbose=False)  # tight-caps compile
        ramp = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            _, verts, tris = subpoly(net, 3, 1.2, force=True, verbose=False)
            times.append(time.time() - t0)
        warm = min(times)
        print(json.dumps({
            "preset": preset, "cold_s": round(cold, 2),
            "recompile_s": round(ramp, 2), "warm_s": round(warm, 3),
            "verts": int(verts.shape[0]), "tris": int(tris.shape[0]),
            "verts_per_sec": int(verts.shape[0] / warm)}), flush=True)


if __name__ == "__main__":
    main()
