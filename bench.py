"""Benchmark: polyhedral-complex extraction throughput on the flagship config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol: small-config SDF net (r_min=2, r_max=32, 3x16 MLP — the reference's
'small' preset, train.py:70-82) trained on the procedural sphere; the timed
quantity is the full ``subpoly`` extraction wall-clock (same boundary as the
reference's timer at train.py:123-129), after one warm-up run so XLA compile
time is excluded (the reference's CUDA kernels are likewise precompiled).

Baseline: reference small-bunny extraction = 0.87 s on the authors' GPU
(logs/run_small.log:12; see BASELINE.md).  vs_baseline = baseline_s / ours_s
(>1 means faster than the reference GPU run).
"""

from __future__ import annotations

import json
import os
import time

BASELINE_SMALL_S = 0.87
CKPT = os.path.join(os.path.dirname(__file__),
                    "tropical/stanford/models/sphere/sphere_sdf_small_1.pth")


def get_net():
    import jax

    from tropical.stanford.model import Net
    from tropical.utils import checkpoint as ckpt

    net = Net(num_layers=3, num_hidden=16, levels=4, r_min=2, r_max=32, T=19,
              key=jax.random.PRNGKey(1))
    found = ckpt.find_checkpoint(CKPT)
    if found:
        ckpt.load_into(net, found)
    else:  # train from scratch (slower first bench run)
        import numpy as np

        from tropical.stanford.dataset import StanfordDataset
        from tropical.stanford.training import train
        from tropical.utils.checkpoint import save_params

        ds = StanfordDataset("sphere", rng=np.random.default_rng(1))
        train(net, ds, epochs=10, batch_size=1000, verbose=False)
        save_params(CKPT, net.params)
    return net


def main():
    from tropical.extract.subdivide import subpoly

    net = get_net()

    # warm-up twice: the first call sizes the caps (host-skeleton path) and
    # compiles the loop; the second compiles the fused device-skeleton path
    subpoly(net, 3, 1.2, force=True, verbose=False)
    subpoly(net, 3, 1.2, force=True, verbose=False)

    times = []
    n_verts = 0
    for _ in range(3):
        t = time.time()
        _, vertices, tris = subpoly(net, 3, 1.2, force=True, verbose=False)
        times.append(time.time() - t)
        n_verts = vertices.shape[0]

    best = min(times)
    print(json.dumps({
        "metric": "sphere_small_extraction_time",
        "value": round(best, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_SMALL_S / best, 3),
        "extra": {"mesh_vertices": int(n_verts),
                  "verts_per_sec": int(n_verts / best),
                  "runs_s": [round(t, 3) for t in times]},
    }))


if __name__ == "__main__":
    main()
