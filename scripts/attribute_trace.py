"""Per-fusion attribution of a warm fused-extraction trace.

``trace_device.py`` showed the large config is uniformly gather-bound with
generic "fusion" op names and no single hot op.  This script joins each
device trace event (``fusion.N`` ...) with the optimized HLO module's
instruction metadata — the jax ``op_name`` scope and ``source_file:line``
XLA carries through from tracing — and aggregates self-time per pipeline
stage (device.py source line), so the perf attack knows which *stage* to
cut rather than which anonymous fusion.

Measurement-only: reuses the engine's cached compiled program (lowering is
re-traced; compilation hits the persistent XLA cache), so it is safe to run
over the tunnel without paying a remote compile.

    python scripts/attribute_trace.py [small|medium|large] [--csv out.csv]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import shutil
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")

# one HLO instruction definition line:  %name = type opcode(...) ..., metadata={...}
_INSTR_RE = re.compile(r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*\S+\s+(\w+)\(")
_META_OPNAME_RE = re.compile(r'op_name="([^"]*)"')
_META_SRC_RE = re.compile(r'source_file="([^"]*)"(?:.*?source_line=(\d+))?')


def parse_hlo(text: str) -> dict:
    """instruction name -> (opcode, op_name metadata, source 'file:line')."""
    out = {}
    for line in text.splitlines():
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, opcode = m.group(1), m.group(2)
        opn = _META_OPNAME_RE.search(line)
        src = _META_SRC_RE.search(line)
        srcs = ""
        if src:
            srcs = os.path.basename(src.group(1))
            if src.group(2):
                srcs += f":{src.group(2)}"
        out[name] = (opcode, opn.group(1) if opn else "", srcs)
    return out


def force(x):
    for leaf in __import__("jax").tree_util.tree_leaves(x)[::-1]:
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0) > 0:
            np.asarray(leaf.ravel()[:1])
            return


def stage_of(op_name: str, source: str) -> str:
    """Collapse a jax op_name scope to a human pipeline stage."""
    # op_name looks like jit(fused_extract)/while/body/...deep scopes...;
    # keep the two outermost non-jit scopes plus the source line — the
    # engine has no named_scope annotations, so source_line carries the
    # stage identity (device.py line ranges map to stages)
    parts = [p for p in op_name.split("/") if p and not p.startswith("jit(")]
    head = "/".join(parts[:2])
    return f"{head} @{source}" if source else head


def main():
    import jax

    from scripts.profile_device import get_net
    from tropical.extract.device import _EXTRACT_CACHE, subpoly_device

    size = "small"
    csv_path = None
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--csv":
            csv_path = args.pop(0)
        else:
            size = a

    net = get_net(size)
    t0 = time.time()
    subpoly_device(net, verbose=False, force=True)  # memoize caps + compile
    print(f"cold {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    _, verts, _ = subpoly_device(net, verbose=False, force=True)
    print(f"warm {time.time() - t0:.2f}s  {verts.shape[0]} verts", flush=True)

    fused = [fn for key, fn in _EXTRACT_CACHE.items()
             if isinstance(key, tuple) and key and key[-1] == "fused"
             and key[0] == net.spec]
    assert fused, "no cached fused program (did the run fall back to ramp?)"
    fn = fused[-1]

    # optimized HLO with metadata (no recompile: persistent-cache hit)
    t0 = time.time()
    compiled = fn.lower(net.params, net.marks).compile()
    try:
        hlo_text = compiled.as_text()
    except Exception as e:  # PJRT plugins may not expose the executable HLO
        print(f"compiled.as_text() unavailable ({e!r}); "
              "falling back to pre-optimization HLO (coarser attribution)")
        hlo_text = fn.lower(net.params, net.marks).as_text()
    print(f"hlo {time.time() - t0:.1f}s, {len(hlo_text) / 1e6:.1f} MB",
          flush=True)
    instrs = parse_hlo(hlo_text)
    print(f"{len(instrs)} HLO instructions with metadata", flush=True)

    out = fn(net.params, net.marks)
    force(out)
    shutil.rmtree("/tmp/jxtrace", ignore_errors=True)
    with jax.profiler.trace("/tmp/jxtrace"):
        out = fn(net.params, net.marks)
        force(out)

    files = glob.glob("/tmp/jxtrace/**/*.trace.json.gz", recursive=True)
    per_event = defaultdict(float)
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            per_event[ev.get("name", "").lstrip("%")] += ev.get("dur", 0) / 1e3

    # join events with HLO metadata; aggregate per stage
    per_stage = defaultdict(float)
    rows = []
    matched = unmatched = 0.0
    for name, ms in per_event.items():
        info = instrs.get(name)
        if info is None:
            # trace may suffix-remap (fusion.123.clone etc.)
            info = instrs.get(name.split(".clone")[0])
        if info is None:
            unmatched += ms
            continue
        matched += ms
        opcode, op_name, src = info
        rows.append((ms, name, opcode, src, op_name))
        per_stage[stage_of(op_name, src)] += ms

    rows.sort(reverse=True)
    print(f"\nmatched {matched:.0f} ms device-op time, "
          f"{unmatched:.0f} ms unmatched (host/runtime events)")
    print("\n== top HLO ops by self-time ==")
    for ms, name, opcode, src, op_name in rows[:30]:
        print(f"{ms:9.1f} ms  {opcode:<12} {name:<22} {src:<22} "
              f"{op_name[-90:]}")
    print("\n== per-stage (outer scopes @ source line) ==")
    for stage, ms in sorted(per_stage.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{ms:9.1f} ms  {stage}")

    # named-scope rollup: the busy-step pipeline annotates its stages
    # (s2_compact .. s12_conndedup, prune_compact) with jax.named_scope —
    # aggregate self-time per stage tag AND per control context (while-loop
    # body vs the final big-tier insertion), the split that decides where a
    # pair-tier or prefix-tier change pays
    scope_re = re.compile(r"(s\d+_\w+|prune_compact)")
    per_scope = defaultdict(float)
    for ms, _name, _opcode, _src, op_name in rows:
        m = scope_re.search(op_name)
        if not m:
            continue
        ctx = "loop" if "/while/" in op_name else "final"
        per_scope[f"{m.group(1)} [{ctx}]"] += ms
    if per_scope:
        print("\n== busy-step named scopes (loop vs final insertion) ==")
        for scope, ms in sorted(per_scope.items(), key=lambda kv: -kv[1]):
            print(f"{ms:9.1f} ms  {scope}")

    if csv_path:
        import csv

        with open(csv_path, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["ms", "hlo_op", "opcode", "source", "op_name"])
            for ms, name, opcode, src, op_name in rows:
                w.writerow([round(ms, 2), name, opcode, src, op_name])
        print(f"full table -> {csv_path}")


if __name__ == "__main__":
    main()
