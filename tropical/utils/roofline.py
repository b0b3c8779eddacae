"""Measured roofline of a compiled JAX program: device self-time, top ops,
and HBM traffic from trace-weighted HLO buffer sizes.

Why not ``compile().cost_analysis()``: XLA's "bytes accessed" counts every
operand *touch* inside a fusion, including VMEM-hit re-reads, so dividing it
by wall-clock can exceed the physical HBM bandwidth (observed 117-433% on
the fused extraction programs) — an upper bound that says nothing about
headroom.  This module instead:

1. captures a ``jax.profiler`` device trace of one execution (each dynamic
   op execution is an event with its measured duration),
2. parses the optimized HLO for each instruction's operand/output buffer
   sizes (on TPU, inter-fusion buffers live in HBM: a fusion reads its
   operands from HBM once and writes its outputs once, whatever re-use
   happens inside stays in VMEM),
3. charges each traced event its instruction's unique operand+output bytes.

``sum(bytes) / device_time`` is then a *measured-traffic* bandwidth figure
that is physically bounded by the HBM peak, and the per-op table names the
program's real hot spots.  Small over-count: operands that persist in VMEM
across consecutive ops are charged per op; under-count: DMA prefetch overlap
is invisible.  Both are second-order next to the cost-model's 4x+ re-read
inflation.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import shutil
import tempfile
from collections import defaultdict
from typing import Any, Callable

import numpy as np

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1,
    "pred": 1, "c64": 8, "c128": 16,
}

# one shape token: dtype[d0,d1,...]{layout} — layout/tiling braces optional
_SHAPE_RE = re.compile(r"\b(" + "|".join(_DTYPE_BYTES) + r")\[([0-9,]*)\]")
# instruction definition: [ROOT] %name = <output-type> opcode(...)
_INSTR_RE = re.compile(
    r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.+?)\s+(\w+)\((.*)\)")
_META_SRC_RE = re.compile(
    r'source_file="([^"]*)"(?:.*?source_line=(\d+))?')
_META_OPNAME_RE = re.compile(r'op_name="([^"]*)"')


def _shape_bytes(text: str) -> int:
    """Total bytes of every shape token in ``text`` (tuples sum members)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


_OPERAND_NAME_RE = re.compile(r"%([\w.\-]+)")


def parse_hlo_buffers(hlo_text: str) -> dict:
    """instruction name -> (output_bytes, operand_bytes, opcode, src, op_name).

    Two passes: first record every instruction's output bytes, then charge
    each instruction's operands.  Operand shapes are taken from the argument
    list when printed inline; otherwise the operand name's own definition
    supplies them (some backends print bare ``%name`` operands)."""
    defs = {}   # name -> (out_bytes, opcode, arg_text, src, op_name)
    for line in hlo_text.splitlines():
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, out_type, opcode, args = m.groups()
        # metadata trails the operand list on the same line; split it off so
        # shape tokens inside metadata strings are not charged as operands
        meta_at = args.find(", metadata=")
        arg_text = args if meta_at < 0 else args[:meta_at]
        # control-flow/fusion bodies are named via to_apply=/body=/...; cut
        # anything after the first ", <kw>=" so computation names and
        # backend-config blobs are not treated as operands
        arg_text = re.split(r", [a-z_]+=", arg_text)[0]
        src = ""
        sm = _META_SRC_RE.search(line)
        if sm:
            src = os.path.basename(sm.group(1))
            if sm.group(2):
                src += f":{sm.group(2)}"
        om = _META_OPNAME_RE.search(line)
        defs[name] = (_shape_bytes(out_type), opcode, arg_text, src,
                      om.group(1) if om else "")

    out = {}
    for name, (out_b, opcode, arg_text, src, op_name) in defs.items():
        in_b = _shape_bytes(arg_text)
        if in_b == 0:  # bare %name operands: resolve via their definitions
            in_b = sum(defs[op][0] for op in _OPERAND_NAME_RE.findall(arg_text)
                       if op in defs)
        out[name] = (out_b, in_b, opcode, src, op_name)
    return out


# opcodes whose "operands" are not HBM reads of that size (control flow
# bodies account for their own inner ops in the trace; parameters and
# constants are materialization bookkeeping)
_SKIP_TRAFFIC = {"parameter", "constant", "while", "conditional", "call",
                 "tuple", "get-tuple-element", "bitcast"}


def measure(fn: Callable, *args: Any, compiled=None) -> dict:
    """Trace one execution of jitted ``fn(*args)``; return the roofline.

    Returns dict with: device_time_s (sum of device-op self-time),
    hbm_bytes (trace-weighted buffer traffic), hbm_gbps, top_ops
    (top-3 [time_ms, opcode, source, bytes] rows), matched_ms/unmatched_ms.
    The caller provides ``compiled`` to reuse an existing executable
    (skips a lower+compile; compilation hits the persistent cache).
    """
    import jax

    if compiled is None:
        compiled = jax.jit(fn).lower(*args).compile() \
            if not hasattr(fn, "lower") else fn.lower(*args).compile()
    try:
        hlo_text = compiled.as_text()
    except Exception:
        hlo_text = ""
    instrs = parse_hlo_buffers(hlo_text) if hlo_text else {}

    run = fn if callable(fn) else compiled
    # warm once outside the trace (compile/caps effects), then trace one run
    out = run(*args)
    for leaf in jax.tree_util.tree_leaves(out)[::-1]:
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0) > 0:
            np.asarray(leaf.ravel()[:1])
            break
    tdir = tempfile.mkdtemp(prefix="roofline-")
    try:
        with jax.profiler.trace(tdir):
            out = run(*args)
            for leaf in jax.tree_util.tree_leaves(out)[::-1]:
                if hasattr(leaf, "ravel") and getattr(leaf, "size", 0) > 0:
                    np.asarray(leaf.ravel()[:1])
                    break
        # the profiler emits several device lanes (XLA Ops, XLA Modules,
        # step/TraceMe tracks) that all carry the same spans — summing
        # across lanes double-counts (observed 4.2 s "device time" for a
        # 1.6 s program).  Collect per (pid, tid) lane and keep the single
        # lane with the most HLO-matched time.
        lanes = defaultdict(lambda: defaultdict(lambda: [0.0, 0]))
        for f in glob.glob(os.path.join(tdir, "**/*.trace.json.gz"),
                           recursive=True):
            with gzip.open(f, "rt") as fh:
                data = json.load(fh)
            pid_ok = _device_pids(data)
            for ev in data.get("traceEvents", []):
                if ev.get("ph") != "X" or ev.get("pid") not in pid_ok:
                    continue
                e = lanes[(ev.get("pid"), ev.get("tid"))][
                    ev.get("name", "").lstrip("%")]
                e[0] += ev.get("dur", 0) / 1e3
                e[1] += 1

        # mirrored lanes carry identical per-name totals -> the per-name MAX
        # across lanes dedupes them exactly (a genuinely thread-split CPU op
        # is slightly undercounted, which only makes the estimate safer)
        events = {}
        for evs in lanes.values():
            for name, (ms, cnt) in evs.items():
                cur = events.get(name)
                if cur is None or ms > cur[0]:
                    events[name] = [ms, cnt]
    finally:
        shutil.rmtree(tdir, ignore_errors=True)

    matched_ms = unmatched_ms = 0.0
    total_bytes = 0
    rows = []
    for name, (ms, cnt) in events.items():
        info = instrs.get(name) or instrs.get(name.split(".clone")[0])
        if info is None:
            unmatched_ms += ms
            continue
        out_b, in_b, opcode, src, _ = info
        if opcode in _SKIP_TRAFFIC:
            # control-flow spans ENCLOSE their body's op events on the same
            # lane — counting them double-counts the leaves (a 1.6 s program
            # read 3.8 s); parameters/tuples are bookkeeping
            continue
        matched_ms += ms
        b = (out_b + in_b) * cnt
        total_bytes += b
        rows.append((ms, opcode, src, b))
    rows.sort(reverse=True)
    dev_s = matched_ms / 1e3
    return {
        "device_time_s": round(dev_s, 4),
        "hbm_bytes": int(total_bytes),
        "hbm_gbps": round(total_bytes / dev_s / 1e9, 1) if dev_s > 0 else 0.0,
        "top_ops": [[round(ms, 1), opcode, src, int(b)]
                    for ms, opcode, src, b in rows[:3]],
        "matched_ms": round(matched_ms, 1),
        "unmatched_ms": round(unmatched_ms, 1),
    }


def _device_pids(data: dict) -> set:
    """Trace pids whose process name looks like a device (TPU/GPU/XLA CPU
    device rows), excluding host-side python/runtime threads."""
    pids = set()
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pname = (ev.get("args") or {}).get("name", "")
            if re.search(r"TPU|GPU|/device|XLA", pname, re.I):
                pids.add(ev.get("pid"))
    if not pids:  # fall back to everything (CPU traces name processes oddly)
        pids = {ev.get("pid") for ev in data.get("traceEvents", [])}
    return pids
