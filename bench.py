"""Benchmark suite: polyhedral-complex extraction across the headline regimes.

Prints ONE JSON line PER CONFIG (driver captures all of them), flagship
(sphere-small, flat) LAST so a last-line parser still sees the headline
metric.  Configs cover the reference's published regimes:

- small/flat    vs bunny-small   0.87 s (logs/run_small.log:12)
- small/curved  vs lucy-small    3.39 s (run_small.log:137 — the only
                                  published force=False config)
- medium/flat   (no published medium baseline: the geometric mean of the
                                  small/large bunny times stands in, noted
                                  in `extra.baseline`)
- large/flat    vs bunny-large   1.59 s (run_large.log:12)

Protocol: per config, the SDF net is loaded from the committed procedural
sphere checkpoint (same training recipe as the reference, train.py:70-82);
the timed quantity is the full ``subpoly`` extraction wall-clock (same
boundary as the reference's timer, train.py:123-129) after warm-up runs so
XLA compile time is excluded (the reference's CUDA kernels are likewise
precompiled).  vs_baseline = baseline_s / ours_s (>1 = faster than the
reference GPU run).

Roofline extras (per config): MEASURED — a jax.profiler device trace of the
fused program gives per-op self-time; each op is charged its unique
operand+output HLO buffer bytes per dynamic execution (inter-fusion buffers
live in HBM), so `hbm_util_pct_measured` is physically bounded by the 819
GB/s v5e peak.  `top_ops_by_time` names the three hottest ops.  The XLA
cost-model flops figure is kept for the MXU-utilization line only (the
engine is gather-bound by design; MXU% ~0 is expected).
"""

from __future__ import annotations

import json
import os
import time

HERE = os.path.dirname(os.path.abspath(__file__))

V5E_PEAK_FLOPS = 197e12   # bf16 MXU peak (f32 work runs below this ceiling)
V5E_PEAK_HBM_BPS = 819e9  # HBM bandwidth

# per-vertex rate of the only published force=False run: lucy-small extracts
# 2388 mesh vertices in 3.39 s (run_small.log:135-137) => ~704 verts/s on the
# reference GPU.  Curved configs with no published counterpart at their scale
# use `"lucy_pv"` as baseline_s: baseline = our mesh_vertices / LUCY_VPS,
# i.e. "what the reference GPU's curved path would take at this mesh size".
LUCY_VPS = 2388 / 3.39

# (metric, size, force, baseline_s, baseline_note, timed_runs)
CONFIGS = [
    ("sphere_medium_extraction_time", "medium", True, None,
     "sqrt(0.87*1.59)=1.18s interpolated bunny small/large (no published medium)", 3),
    ("sphere_medium_curved_extraction_time", "medium", False, "lucy_pv",
     "lucy-small per-vertex rate (704 v/s, run_small.log:137) x our mesh size"
     " — no published medium force=False run", 3),
    ("sphere_large_extraction_time", "large", True, 1.59,
     "bunny-large run_large.log:12", 3),
    ("sphere_small_curved_extraction_time", "small", False, 3.39,
     "lucy-small (force=False) run_small.log:137", 3),
    ("sphere_small_extraction_time", "small", True, 0.87,
     "bunny-small run_small.log:12", 3),
]


def get_net(size: str):
    import jax

    from tropical.stanford.model import net_for_size
    from tropical.utils import checkpoint as ckpt

    net = net_for_size(size, dataset="sphere", seed=1)
    path = os.path.join(
        HERE, f"tropical/stanford/models/sphere/sphere_sdf_{size}_1.pth")
    found = ckpt.find_checkpoint(path)
    if found:
        ckpt.load_into(net, found)
    else:  # train from scratch (slower first bench run)
        import numpy as np

        from tropical.stanford.dataset import StanfordDataset
        from tropical.stanford.training import train
        from tropical.utils.checkpoint import save_params

        ds = StanfordDataset("sphere", rng=np.random.default_rng(1))
        train(net, ds, epochs=10, batch_size=1000, verbose=False)
        save_params(path, net.params)
    return net


def fused_cost_analysis(net, force: bool):
    """XLA's (flops, bytes-accessed) estimate for the compiled fused
    extraction program of this config, if one is cached.  Lowering is
    re-traced but compilation hits the (persistent) XLA cache."""
    try:
        # (warm-up may compile a persisted-caps program first, then a
        # tight-caps one after _memoize_tight re-derives caps; _fused_fn
        # returns the last == the one the timed runs execute)
        fn = _fused_fn(net, force)
        if fn is not None:
            ca = fn.lower(net.params, net.marks).compile().cost_analysis()
            if isinstance(ca, list):  # older jax returns [dict]
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
            nbytes = float(ca.get("bytes accessed", 0.0))
            return flops, nbytes
    except Exception:
        pass
    return None, None


def _fused_fn(net, force):
    from tropical.extract import device as dv

    # the LAST matching entry is the program the timed runs execute
    matches = [fn for key, fn in dv._EXTRACT_CACHE.items()
               if (isinstance(key, tuple) and key and key[-1] == "fused"
                   and key[0] == net.spec and key[3] is force)]
    return matches[-1] if matches else None


def measured_roofline(net, force):
    """Trace-measured roofline of the fused program: device self-time, HBM
    traffic from trace-weighted HLO buffer sizes (each fusion charged its
    unique operand+output bytes per dynamic execution — physically bounded
    by the HBM peak, unlike the cost model's re-read-inflated 'bytes
    accessed'), and the top-3 ops by measured time.  See
    tropical/utils/roofline.py for the method."""
    try:
        from tropical.utils import roofline as rl

        fn = _fused_fn(net, force)
        if fn is None:
            return None
        r = rl.measure(fn, net.params, net.marks)
        util = 100.0 * r["hbm_gbps"] * 1e9 / V5E_PEAK_HBM_BPS
        return {
            "device_time_s": r["device_time_s"],
            "hbm_gbytes_measured": round(r["hbm_bytes"] / 1e9, 2),
            "hbm_gbps_measured": r["hbm_gbps"],
            "hbm_util_pct_measured": round(util, 1),
            "top_ops_by_time": r["top_ops"],
        }
    except Exception:
        return None


def device_program_time(net, force):
    """Wall-clock of the fused device program alone (result forced via a
    1-element meta pull), best of 2."""
    try:
        import numpy as np

        fn = _fused_fn(net, force)
        if fn is None:
            return None
        best = None
        for _ in range(2):
            t = time.time()
            *_, meta = fn(net.params, net.marks)
            np.asarray(meta)  # 84-byte pull: one RTT, no bulk transfer
            dt = time.time() - t
            best = dt if best is None else min(best, dt)
        return best
    except Exception:
        return None


_DEVICE_HEALTH = None  # canary run once at suite start, stamped per metric


def device_health():
    """Device-health canary (tropical/utils/canary.py): a pinned 1M-row
    sort+gather program timed against its committed reference value.  Run
    once at suite start; every metric's extra carries the result so the
    recorded wall-clocks are interpretable — a `healthy: false` bench is
    flagged as device-state variance, not a code regression."""
    global _DEVICE_HEALTH
    if _DEVICE_HEALTH is None:
        from tropical.utils.canary import run_canary
        _DEVICE_HEALTH = run_canary()
    return _DEVICE_HEALTH


def run_config(metric, size, force, baseline_s, note, timed_runs,
               canary_after=False):
    from tropical.extract.subdivide import subpoly

    net = get_net(size)

    # warm-up three times: the first call sizes the caps (standalone-skeleton
    # ramp path) and compiles the loop; the second compiles the fused
    # skeleton+loop+faces program from the memoized tight caps; the third
    # settles the runtime (the first post-compile dispatch is consistently
    # the slowest — recorded runs_s were still descending at 2 warm-ups)
    for _ in range(3):
        subpoly(net, 3, 1.2, force=force, verbose=False)

    times = []
    n_verts = n_tris = 0
    for _ in range(timed_runs):
        t = time.time()
        _, vertices, tris = subpoly(net, 3, 1.2, force=force, verbose=False)
        times.append(time.time() - t)
        n_verts, n_tris = vertices.shape[0], tris.shape[0]

    best = min(times)
    if baseline_s == "lucy_pv":
        base = n_verts / LUCY_VPS
    elif baseline_s is not None:
        base = baseline_s
    else:
        base = (0.87 * 1.59) ** 0.5
    extra = {
        "mesh_vertices": int(n_verts),
        "mesh_triangles": int(n_tris),
        "verts_per_sec": int(n_verts / best),
        "runs_s": [round(t, 3) for t in times],
        "baseline": note,
    }
    dev_s = device_program_time(net, force)
    if dev_s is not None:
        # device-program-only wall (1-element result force): the remainder
        # of `value` is the mesh pull over the ~40 MB/s dev tunnel — a cost
        # the reference pays over PCIe at >10 GB/s (its timer boundary also
        # includes the GPU->CPU faces pull, subpoly.py:728)
        extra["device_program_s"] = round(dev_s, 4)
    rf = measured_roofline(net, force)
    if rf is not None:
        extra["roofline"] = rf
    flops, nbytes = fused_cost_analysis(net, force)
    if flops is not None:
        extra.setdefault("roofline", {})
        extra["roofline"]["xla_cost_model_gflops"] = round(flops / 1e9, 2)
        extra["roofline"]["mxu_util_pct_of_bf16_peak"] = round(
            100.0 * flops / best / V5E_PEAK_FLOPS, 2)
    extra["device_health"] = device_health()
    if canary_after:
        # re-measure on the LAST config so the suite is bracketed: a chip
        # that degraded mid-suite shows up as before/after disagreement
        from tropical.utils.canary import run_canary
        extra["device_health_after"] = run_canary()
    print(json.dumps({
        "metric": metric,
        "value": round(best, 4),
        "unit": "s",
        "vs_baseline": round(base / best, 3),
        "extra": extra,
    }), flush=True)


def run_training_bench():
    """Steps/sec of the jitted SDF train step on this chip (reference
    recipe: batch 1000, 50 steps/epoch on 50k samples — train.py:64-68).
    The epoch runs as ONE lax.scan dispatch (tropical/stanford/training.py
    make_scan_epoch); steps/sec = scanned steps / warm wall-clock including
    the epoch's h2d batch upload.  The reference publishes no training
    wall-clock (its committed logs load pretrained checkpoints), so
    vs_baseline is pinned at 1.0 and this line is a perf record."""
    import numpy as np

    from tropical.stanford.training import (make_optimizer, make_scan_epoch)

    net = get_net("small")
    B, n_batches = 1000, 50
    rng = np.random.default_rng(0)
    d = rng.normal(size=(n_batches * B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    r = rng.uniform(0.1, 1.1, (n_batches * B, 1)).astype(np.float32)
    xs = (d * r).reshape(n_batches, B, 3)
    ys = (0.6 - r[:, 0]).reshape(n_batches, B).astype(np.float32)

    tx, _ = make_optimizer(1e-3, n_batches)
    epoch = make_scan_epoch(net.spec, tx, B)
    opt_state = tx.init(net.params)
    params = net.params
    # warm-up (compile)
    p, o, totals, _ = epoch(params, opt_state, xs, ys)
    np.asarray(totals[-1:])
    times = []
    for _ in range(3):
        t = time.time()
        p, o, totals, _ = epoch(params, opt_state, xs, ys)
        np.asarray(totals[-1:])  # force: tiny pull, no bulk transfer
        times.append(time.time() - t)
    best = min(times)
    print(json.dumps({
        "metric": "training_steps_per_sec",
        "value": round(n_batches / best, 1),
        "unit": "steps/s",
        "vs_baseline": 1.0,
        "extra": {
            "batch_size": B,
            "scanned_steps_per_dispatch": n_batches,
            "epoch_wall_s": round(best, 4),
            "runs_s": [round(t, 4) for t in times],
            "baseline": ("no published training baseline — reference logs "
                         "load pretrained checkpoints; vs_baseline pinned 1.0"),
        },
    }), flush=True)


def main():
    only = os.environ.get("TROPICAL_BENCH_ONLY")  # e.g. "small,large"
    # canary FIRST: stamp device health before any extraction work, so the
    # recorded numbers carry their own credibility evidence
    try:
        import sys
        print(f"device_health: {json.dumps(device_health())}",
              file=sys.stderr, flush=True)
    except Exception:
        pass
    if not only or "train" in only.split(","):
        try:
            run_training_bench()
        except Exception as e:  # pragma: no cover - device-state failures
            import sys
            import traceback
            print(f"bench config training failed: {e!r}", file=sys.stderr)
            traceback.print_exc()
    live = [c for c in CONFIGS
            if not only or c[1] in only.split(",")]
    for i, (metric, size, force, baseline_s, note, runs) in enumerate(live):
        try:
            run_config(metric, size, force, baseline_s, note, runs,
                       canary_after=(i + 1 == len(live)))
        except Exception as e:  # pragma: no cover - device-state failures
            # never let one config (e.g. a caps re-ramp hitting a degraded
            # TPU worker) abort the suite before the flagship small config
            # prints; report the failure on stderr and move on
            import sys
            import traceback
            print(f"bench config {metric} failed: {e!r}", file=sys.stderr)
            traceback.print_exc()


if __name__ == "__main__":
    main()
