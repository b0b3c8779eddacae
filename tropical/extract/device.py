"""Fully on-device edge-subdivision engine (flat/force path).

The host-orchestrated engine in :mod:`tropical.extract.subdivide` is exact but
latency-bound: every neuron insertion needs device round-trips, and on a
tunneled TPU each one costs ~25 ms.  This module re-expresses the whole
(L-1)*H+1-step loop (reference subpoly.py:60-69) as ONE jitted XLA program
over capacity-padded state, so a full extraction is a single dispatch plus two
slice pulls.

TPU-shaped design decisions (random scatters/gathers are the enemy; dense
passes, cumsums and sorts are cheap):

- both pools track the LIVE working set: every prune compacts surviving
  edges AND their vertices to pool prefixes (order-preserving renumber,
  mirroring the reference's per-step index compaction subpoly.py:262-272),
  so per-step pool passes and the memoized caps follow live maxima,
- the per-step work set is compacted by a single-key ``lax.sort`` of
  (live ? lane : N) — an ordered live prefix at ~2.6 ns/element — and all
  appends are contiguous ``dynamic_update_slice`` writes,
- future-region pruning (reference subpoly.py:253-272) needs no unique():
  ternary sign rows are packed into base-3 integer keys *elementwise*, and an
  edge survives iff its endpoints' keys differ — pure gather+compare,
- candidate region data for the connecting-edge search is packed into two
  int32 bitfields per vertex (zero-plane mask + grid-cell word), so the
  shared-plane filter (reference subpoly.py:524-533) is 6 gathered words and
  a population count per pair instead of ~80 gathered columns,
- Def. 3.4 region grouping: the 2^zeros replica table (reference
  subpoly.py:299-335) is grouped by one multi-key ``lax.sort`` per step;
  same-region pairs get slots by prefix sum over per-replica in-run ranks
  and each slot gathers its two replicas — O(PCAP) work, no materialized
  pair window; pair dedup is a 2-key sort.  Capacity overflows are flagged
  and retried, and the tight caps derived from a run's high-water marks are
  persisted (caps_cache.json) so fresh processes compile once.

Exactness: with caps respected (overflow flags returned), the result matches
the host engine — verified in tests/test_device_engine.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import os

import jax
import jax.numpy as jnp
import numpy as np

from tropical.core.hashgrid import lattice_tables
from tropical.core.net import (NetSpec, net_outputs, net_outputs_lattice,
                               net_sdf, preprocess)
from tropical.core.trilinear import intersection_of_two_planes
from tropical.extract import stats

R_COLS = 33  # (num_layers-1)*num_hidden + 1 for the 3x16 architecture
D = 3

OVF_V, OVF_E, OVF_C, OVF_P, OVF_K, OVF_W, OVF_H = 1, 2, 4, 8, 16, 32, 64
OVF_X = 128  # invariant violation: a curved edge lies on no earlier plane
OVF_B = 256  # tier-B (high-zero-count) expansion side buffer overflow
OVF_F = 512  # faces-stage capacity (final verts / regions / triangles)
OVF_Q = 1024  # curved-candidate compaction buffer (force=False path)

# high-water vector of the most recent fused run (np.ndarray[16], see
# State.hw) — diagnostics for tests/tools: [13:16] prove the curved-path
# failover stages (no-root sentinels, GD rescue, strict filter) fired
LAST_HW = None
OVF_G = 2048  # faces-stage region polygon width (gcap)


class CapsExhausted(RuntimeError):
    """The root-cause retry ramp ran out of attempts.  Capacity, not
    correctness: callers (subpoly) fall back to the host engine."""


@dataclass(frozen=True)
class Caps:
    vcap: int            # vertex pool (live maximum + one step's appends)
    ecap: int            # edge pool (live maximum + one step's appends)
    ccap: int            # per-step new-vertex candidates
    hcap: int            # per-step eps-hit old-vertex candidates
    pcap: int            # per-step same-region pair buffer
    kcap: int = 5        # max zeros expanded per vertex (2^kcap replicas;
    #                      lattice hit vertices sit on 3 grid + >=1 neuron
    #                      planes, so 4-5 zeros occur routinely)
    wcap: int = 32       # max candidate vertices per region (pair window)
    conncap: int = 65536  # per-step connecting-edge append block
    hb: int = 0          # tier-B expansion rows (0 = auto); each row costs
    #                      2^kcap replica lanes in the pair window, so a
    #                      tight cap (from the hw marks) matters
    fvcap: int = 0       # faces stage: final surface vertices (0 = auto)
    rgcap: int = 0       # faces stage: region polygon rows (0 = auto)
    tcap: int = 0        # faces stage: output triangles (0 = auto)
    hbf: int = 0         # faces stage: tier-B expansion rows (0 = auto)
    cvcap: int = 0       # curved-candidate compaction buffer (0 = auto;
    #                      force=False only: curved rows are typically a
    #                      small fraction of the split candidates, so the
    #                      corner/quartic/GD stages run on a compacted
    #                      side buffer instead of all CCAP lanes)
    gcap: int = 0        # faces stage: max vertices per region polygon
    #                      (0 = follow wcap; decoupled because the LOOP's
    #                      pair window can ramp to 128 on degenerate grids
    #                      while real surface polygons stay <= ~18-sided,
    #                      and every faces array is [RGC, gcap]-shaped)


class State(NamedTuple):
    V: jax.Array        # [VCAP, 3] f32
    OUT: jax.Array      # [VCAP, R] f32
    E: jax.Array        # [ECAP, 2] i32
    aliveV: jax.Array   # [VCAP] bool
    aliveE: jax.Array   # [ECAP] bool
    nV: jax.Array       # i32 creation cursor
    nE: jax.Array       # i32 creation cursor
    overflow: jax.Array  # i32 bitmask of OVF_* flags
    hw: jax.Array       # [16] i32 high-water marks: splits, hits, pairs,
    #                     conns, nV, nE, tierB, then the faces stage's
    #                     final-verts/tierB/regions/triangles, then the
    #                     loop's curved-candidate count and the faces
    #                     stage's max region polygon size — lets the host
    #                     re-derive tight caps.  [13:16] are curved-path
    #                     stage meters (per-step maxima, diagnostics only):
    #                     no-root/out-of-range sentinel rows, GD-rescued
    #                     rows, strict-filter curved drops — observable
    #                     evidence that those failover stages fired
    SB: jax.Array       # [NW, VCAP] u32 per-vertex sign words (out > 0)
    ZB: jax.Array       # [NW, VCAP] u32 per-vertex zero words (|out| <= eps)
    SZ: jax.Array       # [NW, VCAP] u32 per-vertex strict words (|out| < eps)
    EB: jax.Array       # [NW, ECAP] u32 per-edge split words (see _edge_bits)
    LD: jax.Array       # [ECAP] i32 per-edge last eps-sign-differing column
    EZ0: jax.Array      # [NW, ECAP] u32 endpoint-0 strict words (hit scan)
    EZ1: jax.Array      # [NW, ECAP] u32 endpoint-1 strict words


def _eps_sign(out, eps):
    s = jnp.where(out > 0, 1, -1).astype(jnp.int32)
    return jnp.where(jnp.abs(out) <= eps, 0, s)


NW = (R_COLS + 31) // 32  # u32 words covering the R_COLS sign columns


def _pack_out_words(out, eps):
    """[N, R] f32 -> (sign words, zero words), each [NW, N] u32.

    Bit j of word w: sign = ``out[:, 32w+j] > 0``; zero = ``|out| <= eps``.
    OUT rows are static for a vertex's lifetime, so these words are packed
    once at vertex creation and the per-step split/prune predicates become
    bit tests instead of pool-wide float gathers (the idle-step probe was
    ~2 ECAP-sized gathers x 33 steps — the single largest cost at M=201)."""
    sb, zb, sz = [], [], []
    for w in range(NW):
        lo, hi = 32 * w, min(32 * w + 32, R_COLS)
        bit = jnp.uint32(1) << jnp.arange(hi - lo, dtype=jnp.uint32)
        blk = out[:, lo:hi]
        sb.append(jnp.sum((blk > 0).astype(jnp.uint32) * bit[None, :],
                          axis=1, dtype=jnp.uint32))
        zb.append(jnp.sum((jnp.abs(blk) <= eps).astype(jnp.uint32)
                          * bit[None, :], axis=1, dtype=jnp.uint32))
        # strict band |out| < eps: the hit-vertex scan's predicate
        # (subpoly.py:232-239) is strict, the split/prune trits are not —
        # they differ only at |out| == eps exactly, but bit-parity with the
        # host engine demands both
        sz.append(jnp.sum((jnp.abs(blk) < eps).astype(jnp.uint32)
                          * bit[None, :], axis=1, dtype=jnp.uint32))
    return jnp.stack(sb), jnp.stack(zb), jnp.stack(sz)


def _high_bit(v):
    """Index of the highest set bit of u32 ``v`` (-1 for 0), branch-free."""
    v = v | (v >> 1)
    v = v | (v >> 2)
    v = v | (v >> 4)
    v = v | (v >> 8)
    v = v | (v >> 16)
    return jax.lax.population_count(v).astype(jnp.int32) - 1


def _edge_bits(sbp, zbp, sbq, zbq):
    """Per-edge static predicates from endpoint words ([NW, K] u32 each).

    Returns (split words [NW, K] u32, last-differing column [K] i32):
    - split bit j: plane j strictly splits the edge — both endpoint values
      outside the eps band and of opposite sign (bit-exact to the float
      predicate ``d0*d1 < 0 & |d0| > eps & |d1| > eps``).
    - last-differ: highest column whose eps-sign trit differs between the
      endpoints (-1 if none).  The future-sign prune test at step idx
      (reference subpoly.py:253-277, trits over ``m[:, idx:]``) is then the
      scalar compare ``ld >= idx`` — monotone in idx because a trit
      difference at column c matters exactly for steps idx <= c."""
    split, ld = [], None
    for w in range(NW):
        nz = ~zbp[w] & ~zbq[w]
        sdif = (sbp[w] ^ sbq[w]) & nz
        split.append(sdif)
        dif = (zbp[w] ^ zbq[w]) | sdif
        cand = jnp.where(dif > 0, 32 * w + _high_bit(dif), -1)
        ld = cand if ld is None else jnp.maximum(ld, cand)
    return jnp.stack(split), ld


def _gather_words(W2, idx):
    """[NW, N] u32 word store gathered at ``idx`` -> [NW, K] (single-column
    gathers per word; see _split_w6 for merging several stores at the SAME
    index vector into one short row gather)."""
    return jnp.stack([W2[w][idx] for w in range(NW)])


def _split_w6(rows):
    """[K, 3*NW] rows of the packed per-step word table -> (sb, zb, sz),
    each [NW, K].

    Independent single-column gathers do NOT overlap on the TPU gather
    emitter (~11-13 ns/index EACH, scripts/probe_gather.py) while a packed
    short row gather costs ~11-14 ns/row total, so reading SB+ZB+SZ at one
    index vector is ~5x cheaper through a per-step ``[N, 3*NW]`` table
    (built once per busy step: three transposes, bandwidth-trivial)."""
    return rows[:, :NW].T, rows[:, NW:2 * NW].T, rows[:, 2 * NW:].T


def _pack_tri_words(a, b, c):
    """Pack an (a, b, c) triangle of 18-bit vertex ids into 2 u32 words.

    The index pull is the largest d2h transfer of a run and the dev tunnel
    moves ~40 MB/s: 8 B/tri instead of 12.  Layout: w0 = a | b<<18 (low 14
    bits of b), w1 = b>>14 | c<<4."""
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    c = c.astype(jnp.uint32)
    return a | (b << 18), (b >> 14) | (c << 4)


def _unpack_tri_words(raw: np.ndarray) -> np.ndarray:
    """Host-side exact inverse of :func:`_pack_tri_words` -> [N, 3] i64."""
    a = raw[:, 0] & 0x3FFFF
    b = (raw[:, 0] >> 18) | ((raw[:, 1] & 0xF) << 14)
    c = raw[:, 1] >> 4
    return np.stack([a, b, c], axis=1).astype(np.int64)


def _grid_region(marks, xu, eps):
    """({0,1} mask, cell offset) per axis (reference tropical.py:227-236)."""
    off = jnp.searchsorted(marks, xu + eps).astype(jnp.int32) - 1
    wrapped = jnp.where(off < 0, off + marks.shape[0], off)
    mark_at = jnp.take(marks, wrapped, axis=0, mode="clip")
    mask = (jnp.abs(mark_at - xu) > eps).astype(jnp.int32)
    return mask, off


LUTN = 1024  # uniform-grid cells for the mark lookup table


def _grid_region_lut(marks, base, xu, eps, K: int):
    """Exact replacement for :func:`_grid_region` using a uniform lookup
    table: ``base[j] = #marks < j/LUTN`` plus at most ``K`` refinement
    gathers (K = max marks per 1/LUTN cell, computed host-side) instead of
    the log2(M)-round vectorized binary search — the search was ~24 ms per
    busy step at medium scale."""
    q = xu + eps
    j = jnp.clip((q * LUTN).astype(jnp.int32), 0, LUTN - 1)
    cnt = jnp.take(base, j, axis=0)
    start = cnt
    Mm = marks.shape[0]
    for t in range(K):
        pos = start + t
        mk = jnp.take(marks, jnp.minimum(pos, Mm - 1), axis=0)
        cnt = cnt + ((pos < Mm) & (mk < q)).astype(jnp.int32)
    off = cnt - 1
    wrapped = jnp.where(off < 0, off + Mm, off)
    mark_at = jnp.take(marks, wrapped, axis=0, mode="clip")
    mask = (jnp.abs(mark_at - xu) > eps).astype(jnp.int32)
    return mask, off


def _compact_lanes(mask, K: int):
    """Indices of the first K live lanes, in order.

    Implemented as a single-key sort of (live ? lane : N): XLA's TPU sort
    moves live lanes to an ordered prefix at ~1.4 ns/element, ~5x cheaper
    per element than the log2(N) binary-search gathers of the previous
    cumsum+searchsorted formulation (measured: the searchsorted whiles were
    ~75%% of the busy-step cost; sorts were noise).

    Returns (lanes [K] i32 — zeroed where invalid, valid [K] bool, total).
    """
    n = mask.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(mask, idx, jnp.int32(n))
    skey = jax.lax.sort(key)
    if K <= n:
        lanes = jax.lax.slice(skey, (0,), (K,))
    else:
        lanes = jnp.concatenate(
            [skey, jnp.full((K - n,), n, jnp.int32)])
    total = mask.sum().astype(jnp.int32)
    valid = jnp.arange(K, dtype=jnp.int32) < total
    return jnp.where(valid, lanes, 0), valid, total


def _pack_base3(signs, col_active):
    """Pack 33 ternary sign columns into 2 int32 keys (19 + 14 base-3 digits;
    3^19 < 2^31).

    Inactive columns contribute a constant digit, so they never split groups.
    Equal keys <=> equal active sign rows (exact encoding, no hashing).
    """
    digits = jnp.where(col_active[None, :], signs + 1, 0)
    keys = []
    for lo, hi in ((0, 19), (19, 33)):
        w = 3 ** jnp.arange(hi - lo - 1, -1, -1, dtype=jnp.int32)
        keys.append(jnp.sum(digits[:, lo:hi] * w[None, :], axis=1,
                            dtype=jnp.int32))
    return keys


BIGKEY = 2 ** 30  # sorts invalid replica lanes past every real region key


def _expand_keys(cols0, zrank0, off0, valid0, kz0, P, kmax, rows0):
    """2^zeros region-replica expansion -> packed (k1,k2,k3) sort keys.

    Each of P sign patterns substitutes the row's zero columns (pattern bit
    b of the column's zero-rank); grid columns map -1/+1 to cell offset-1 /
    offset (reference subpoly.py:299-335).  Invalid replicas get k1=BIGKEY.
    """
    p = jnp.arange(P, dtype=jnp.int32)[:, None, None]
    bit = (p >> jnp.clip(zrank0, 0, kmax - 1)[None]) & 1
    sub = jnp.where(bit > 0, 1, -1)
    vals = jnp.where((cols0 == 0)[None], sub, cols0[None])
    gd = (vals[:, :, :D] - 1) // 2 + off0[None]
    nb = (vals[:, :, D:] + 1) // 2
    rep_valid = valid0[None, :] & (
        p[:, :, 0] < (1 << jnp.minimum(kz0, kmax))[None, :])
    k1 = ((gd[..., 0] + 1) + ((gd[..., 1] + 1) << 10)
          + ((gd[..., 2] + 1) << 20))
    b16 = 1 << jnp.arange(16, dtype=jnp.int32)
    k2 = jnp.sum(nb[..., :16] * b16, axis=-1, dtype=jnp.int32)
    b17 = 1 << jnp.arange(17, dtype=jnp.int32)
    k3 = jnp.sum(nb[..., 16:33] * b17, axis=-1, dtype=jnp.int32)
    k1 = jnp.where(rep_valid, k1, jnp.int32(BIGKEY))
    rows = jnp.broadcast_to(rows0[None], k1.shape)
    return (k1.reshape(-1), k2.reshape(-1), k3.reshape(-1),
            rows.reshape(-1))


def _expand4_keys(cols0, off0, valid0, kz0, rows0):
    """Tier-A (kz <= 2) replica keys WITHOUT materializing the [4, N, C]
    substitution grid of :func:`_expand_keys`: the all-minus base key plus
    per-zero-rank column deltas reproduce the same four replicas with ~16x
    less memory traffic (the grid was the dominant HBM cost of the
    expansion stage at large scale).  Layout and key values are identical
    to ``_expand_keys(..., P=4, kmax=2, ...)``."""
    is_zero = cols0 == 0
    vals = jnp.where(is_zero, -1, cols0)
    gd = (vals[:, :D] - 1) // 2 + off0
    nb = (vals[:, D:] + 1) // 2
    k1b = (gd[:, 0] + 1) + ((gd[:, 1] + 1) << 10) + ((gd[:, 2] + 1) << 20)
    b16 = 1 << jnp.arange(16, dtype=jnp.int32)
    k2b = jnp.sum(nb[:, :16] * b16, axis=-1, dtype=jnp.int32)
    b17 = 1 << jnp.arange(17, dtype=jnp.int32)
    k3b = jnp.sum(nb[:, 16:33] * b17, axis=-1, dtype=jnp.int32)

    cz = jnp.cumsum(is_zero.astype(jnp.int32), axis=1)
    col0 = jnp.argmax(is_zero & (cz == 1), axis=1).astype(jnp.int32)
    col1 = jnp.argmax(is_zero & (cz == 2), axis=1).astype(jnp.int32)

    def _deltas(c):
        is_grid = c < D
        j = c - D
        d1 = jnp.where(is_grid, 1 << (10 * jnp.minimum(c, 2)), 0)
        d2 = jnp.where(~is_grid & (j < 16), 1 << jnp.clip(j, 0, 15), 0)
        d3 = jnp.where(~is_grid & (j >= 16), 1 << jnp.clip(j - 16, 0, 16), 0)
        return d1, d2, d3

    a1, a2, a3 = _deltas(col0)
    c1, c2, c3 = _deltas(col1)
    pow2kz = 1 << jnp.minimum(kz0, 2)
    k1s, k2s, k3s = [], [], []
    for p in range(4):
        f0 = p & 1
        f1 = (p >> 1) & 1
        rep_valid = valid0 & (p < pow2kz)
        k1s.append(jnp.where(rep_valid, k1b + f0 * a1 + f1 * c1,
                             jnp.int32(BIGKEY)))
        k2s.append(k2b + f0 * a2 + f1 * c2)
        k3s.append(k3b + f0 * a3 + f1 * c3)
    return (jnp.concatenate(k1s), jnp.concatenate(k2s),
            jnp.concatenate(k3s), jnp.tile(rows0, 4))


def _corner_points(e0, e1):
    """[B,3] x2 endpoint coords -> [B, 8, 3] cube corners, z-major bit order
    idx = 4i + 2j + k -> (x_k, y_j, z_i) (reference geometry.py:350-372)."""
    cs = []
    for i in range(2):
        for j in range(2):
            for k in range(2):
                cs.append(jnp.stack([
                    e1[:, 0] if k else e0[:, 0],
                    e1[:, 1] if j else e0[:, 1],
                    e1[:, 2] if i else e0[:, 2]], axis=-1))
    return jnp.stack(cs, axis=1)


def make_step_fn(spec: NetSpec, caps: Caps, eps: float,
                 disable: frozenset = frozenset(), force: bool = True,
                 lut_k: int = 4):
    """``disable`` is a profiling knob: any of {"forward", "override",
    "pairs", "repsort", "windows", "prune"} cuts a stage out to isolate
    costs (results are then of course not meaningful).

    ``force=True`` is the flat-assumption path (reference -f default);
    ``force=False`` adds the bi-/tri-linear correction: corner-cube group-8
    forwards, the x=z quartic intersection, the projected-GD rescue
    (subpoly_debug.py:121-165) and the strict on-surface filter
    (subpoly_debug.py:234-271)."""
    VCAP, ECAP, CCAP, HCAP, PCAP = (caps.vcap, caps.ecap, caps.ccap,
                                    caps.hcap, caps.pcap)
    KCAP, WCAP = caps.kcap, caps.wcap
    PREP = 1 << KCAP
    CAND = CCAP + HCAP

    HB_BIG = caps.hb or max(HCAP, CCAP // 8)
    QC_BIG = min(caps.cvcap or max(CCAP // 4, 1024), CCAP)
    TIER_BIG = (CCAP, HCAP, PCAP, caps.conncap, HB_BIG, QC_BIG)
    # a small tier pays off only when the big buffers are large (and its
    # second compiled pipeline is worth the compile time)
    two_tier = CCAP >= 32768
    if two_tier:
        CCAP_S = max(_round_up(CCAP // 8, 4096), 4096)
        HCAP_S = max(_round_up(HCAP // 2, 2048), 2048)
        TIER_SMALL = (CCAP_S, HCAP_S,
                      max(_round_up(PCAP // 8), 16384),
                      max(_round_up(caps.conncap // 8, 4096), 4096),
                      max(_round_up(HB_BIG // 8, 256), 256),
                      min(max(_round_up(QC_BIG // 8, 1024), 1024), CCAP_S))

    def step(params, marks, lut, state: State, idx, prune: bool,
             final: bool = False) -> State:
        """One insertion.  Steps whose plane splits no edge return unchanged
        (reference subpoly.py:110-111) — in practice ~2/3 of all steps — via
        lax.cond.  The split probe is a bit test on the per-edge split words
        (one contiguous [ECAP] u32 row slice + reduce; the previous float
        probe paid two pool-wide gathers every step — the engine's single
        largest cost at M=201).  Busy steps recompute the full-width float
        mask (they need the d-values anyway) and dispatch to a small- or
        big-tier pipeline by live candidate counts."""
        (V, OUT, E, aliveV, aliveE, nV, nE, ovf, hw,
         SB, ZB, SZ, EB, LD, EZ0, EZ1) = state

        # --- 1. sign-change split probe (reference subpoly.py:102-105), as a
        # bit test on the static per-edge split words ------------------------
        wi = idx >> 5
        shift = (idx & 31).astype(jnp.uint32)

        def bitcol(W2):
            w = jax.lax.dynamic_index_in_dim(W2, wi, axis=0, keepdims=False)
            return (jax.lax.shift_right_logical(w, shift) & jnp.uint32(1)) > 0

        split_col = aliveE & bitcol(EB)
        has_split = split_col.any()

        def dispatch(st):
            # busy steps read the hit predicates from the per-edge endpoint
            # strict-zero words; d-values are gathered only at the candidate
            # and hit lanes inside _busy_step — no pool-wide float gathers
            # anywhere in the pipeline
            h0 = bitcol(EZ0)
            h1 = bitcol(EZ1)

            if final or not two_tier:
                # the final insertion is the peak step: always big tier, and
                # `final` prunes the word-store maintenance no later step
                # will ever read (see _busy_step)
                return _busy_step(params, marks, lut, TIER_BIG, st, idx,
                                  prune, split_col, h0, h1, final)

            # tier selection runs only on busy steps (the count reductions
            # cost real passes over the edge pool; idle steps skip them)
            n_split = split_col.sum().astype(jnp.int32)
            n_he = (aliveE & (h0 | h1)).sum().astype(jnp.int32)
            pred_small = (n_split <= TIER_SMALL[0]) \
                & (n_he <= 4 * TIER_SMALL[1])
            st1 = jax.lax.cond(
                pred_small,
                lambda q: _busy_step(params, marks, lut, TIER_SMALL, q, idx,
                                     prune, split_col, h0, h1),
                lambda q: q,
                st)
            # a small-tier capacity miss (pairs/conn/tier-B are only known
            # mid-pipeline) reruns the step on the big tier from the saved
            # pre-state; the high-water marks it recorded are true counts,
            # so they stay valid
            small_failed = pred_small & (st1.overflow != ovf)
            return jax.lax.cond(
                ~pred_small | small_failed,
                lambda pair: _busy_step(params, marks, lut, TIER_BIG,
                                        pair[0], idx, prune, split_col,
                                        h0, h1),
                lambda pair: pair[1],
                (st, st1))

        return jax.lax.cond(has_split, dispatch, lambda st: st, state)

    def _busy_step(params, marks, lut, tier, state: State, idx,
                   prune: bool, split, h0, h1, final: bool = False) -> State:
        # ``final=True`` (static): this is the last insertion — the per-edge
        # word stores (EB split bits, LD last-differ, EZ0/EZ1 hit bits) and
        # the per-vertex SZ strict words exist solely to feed LATER steps'
        # probes, so every gather/update that maintains them is dead work
        # here (~10 pool-wide word gathers + update slices at large caps).
        # V/OUT/E/aliveE/SB/ZB and all counts are maintained identically —
        # the epilogue and funnel see bit-identical state.
        # per-tier candidate capacities: late insertions split a fraction of
        # the peak step's edges, so a small-tier pipeline (1/8 buffers) runs
        # most busy steps at a fraction of the gather/sort cost; the
        # dispatcher falls back to the big tier if a small-tier buffer
        # overflows (reference semantics are cap-independent)
        CCAP, HCAP, PCAP, CONNCAP, HB, QC = tier
        CAND = CCAP + HCAP
        (V, OUT, E, aliveV, aliveE, nV, nE, ovf, hw,
         SB, ZB, SZ, EB, LD, EZ0, EZ1) = state

        # --- 2. compact split edges into the candidate block -----------------
        with jax.named_scope("s2_compact"):
            lanes, cval, n_split = _compact_lanes(split, CCAP)
        ovf = ovf | jnp.where(n_split > CCAP, OVF_C, 0)
        ovf = ovf | jnp.where(nV + n_split > VCAP - CCAP, OVF_V, 0)
        ce = E[lanes]                              # one [CCAP, 2] row gather
        ce0 = ce[:, 0]
        ce1 = ce[:, 1]
        # d-values of the current plane, gathered at candidate lanes only
        ocp = jnp.take(OUT, idx, axis=1)           # [VCAP] column slice
        cd0 = ocp[ce0]
        cd1 = jnp.where(cval, ocp[ce1], 1.0)

        # --- 3. linear interpolation (subpoly.py:117,180) ---------------------
        with jax.named_scope("s3_lerp"):
            wgt = jnp.abs(cd0) / jnp.maximum(jnp.abs(cd1 - cd0), 1e-30)
            v0 = V[ce0]
            v1 = V[ce1]
            cand_v = v0 * (1 - wgt[:, None]) + v1 * wgt[:, None]

            col = jnp.arange(R_COLS, dtype=jnp.int32)[None, :]
            # shared zero-plane bits of each split edge's endpoints, from the
            # per-vertex zero-word store (2 u32 gathers per endpoint instead
            # of 33 floats — the row gathers were ~6M gathered elements per
            # busy step at medium scale; the words themselves are packed once
            # at vertex creation)
            zb0r = ZB.T[ce0]                       # [CCAP, NW] row gathers
            zb1r = ZB.T[ce1]
            both_lo = zb0r[:, 0] & zb1r[:, 0]
            both_hi = (zb0r[:, 1] & zb1r[:, 1]) if NW > 1 else \
                jnp.zeros_like(both_lo)
        colu = jnp.arange(R_COLS, dtype=jnp.uint32)[None, :]
        # [CCAP, R] bool: column is eps-zero at BOTH endpoints
        both_zero_col = jnp.where(
            col < 32,
            ((both_lo[:, None] >> jnp.minimum(colu, 31)) & 1) > 0,
            (both_hi[:, None] & 1) > 0)

        if not force:
            # --- 3b. bi-/tri-linear correction (subpoly.py:120-183) ------------
            e0w = V[ce0]
            e1w = V[ce1]
            curved_raw = cval & (((jnp.abs(e1w - e0w) > eps).sum(-1)) > 1)

            # the earlier plane each curved edge lies on: last shared zero
            # column below idx (subpoly.py:131-151; reference exits when a
            # curved edge lies on no earlier plane — flagged here instead)
            r_edges = both_zero_col & (col < idx)
            has_plane = r_edges.any(-1)
            # a curved split edge lying on NO earlier plane breaks the
            # reference's invariant (it hard-exits, subpoly.py:141-148);
            # flag it so the host can detect the break instead of silently
            # masking the edge out
            ovf = ovf | jnp.where((curved_raw & ~has_plane).any(),
                                  jnp.int32(OVF_X), 0)
            curved = curved_raw & has_plane
            inds = (R_COLS - 1
                    - jnp.argmax(r_edges[:, ::-1], axis=-1)).astype(jnp.int32)
            inds = jnp.where(has_plane, inds, 0)

            # Curved rows are typically a small fraction of the split
            # candidates, yet the corner forward (8 rows each through the
            # net), the quartic solve and the on-surface forward used to run
            # on every CCAP lane with the flat majority masked out after.
            # Compact the curved lanes into a QC-sized side buffer first
            # (per-row math is independent, so the compacted stages are
            # row-for-row identical), then scatter results back.
            n_cv = curved.sum().astype(jnp.int32)
            qlanes, qval, _ = _compact_lanes(curved, QC)
            ovf = ovf | jnp.where(n_cv > QC, OVF_Q, 0)
            qe0 = e0w[qlanes]
            qe1 = qe0 + jnp.where(qval[:, None], (e1w - e0w)[qlanes], 0.0)
            q_inds = inds[qlanes]

            # corner-cube outputs in one shared linear region (group=8)
            corners = _corner_points(qe0, qe1).reshape(-1, 3)
            d_corner = net_outputs(spec, params, corners, group=8)
            d_corner = d_corner.reshape(QC, 8, R_COLS)
            p = jnp.take_along_axis(
                d_corner, q_inds[:, None, None].repeat(8, 1), axis=2)[..., 0]
            q = jnp.take_along_axis(
                d_corner, jnp.broadcast_to(idx, (QC,))[:, None, None]
                .repeat(8, 1), axis=2)[..., 0]

            ints_q = intersection_of_two_planes(p, q)            # [QC, 3]
            gg_q = ((ints_q < 0) | (ints_q > 1)).any(-1)

            cand_cv = qe0 + ints_q * (qe1 - qe0)
            outs_cv = net_outputs(spec, params, cand_cv)
            d_new0_q = jnp.take_along_axis(outs_cv, q_inds[:, None], 1)[:, 0]
            d_new1_q = jnp.take_along_axis(
                outs_cv, jnp.broadcast_to(idx, (QC,))[:, None], 1)[:, 0]

            # projected-GD rescue of off-surface intersections
            # (subpoly_debug.py:121-165): rescued rows are a few percent of
            # the curved rows — compact once more so each GD iteration pays
            # a GDC-row forward+grad only.
            gd = qval & ~gg_q & ((jnp.abs(d_new0_q) > eps)
                                 | (jnp.abs(d_new1_q) > eps))
            GDC = max(QC // 4, 256)
            glanes, gval, n_gd = _compact_lanes(gd, GDC)
            ovf = ovf | jnp.where(n_gd > GDC, OVF_Q, 0)
            # stage meters for hw[13:15]: sentinel rows (quartic returned no
            # in-range root — incl. the bilinear-degenerate -1 sentinel,
            # geometry.py:70-138) and GD-rescued rows this step
            n_sent = (qval & gg_q).sum().astype(jnp.int32)
            ge0 = qe0[glanes]
            ge1 = ge0 + jnp.where(gval[:, None], (qe1 - qe0)[glanes], 0.0)
            g_inds = q_inds[glanes]
            gx0 = ints_q[glanes]

            def gd_cond(carry):
                x, pd0, pd1, i = carry
                m0 = jnp.where(gval, jnp.abs(pd0), 0.0).max()
                m1 = jnp.where(gval, jnp.abs(pd1), 0.0).max()
                return ((m0 > eps) | (m1 > eps)) & (i < 500)

            def gd_body(carry):
                x, pd0, pd1, i = carry

                def loss(x):
                    pts = ge0 + x * (ge1 - ge0)
                    outs = net_outputs(spec, params, pts)
                    a = jnp.take_along_axis(outs, g_inds[:, None], 1)[:, 0]
                    b_ = jnp.take_along_axis(
                        outs, jnp.broadcast_to(idx, (GDC,))[:, None],
                        1)[:, 0]
                    y = jnp.where(gval, a ** 2 + b_ ** 2, 0.0).sum()
                    return y, (a, b_)

                (_, (a, b_)), g = jax.value_and_grad(loss, has_aux=True)(x)
                gn = g / jnp.maximum(
                    jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
                x2 = jnp.clip(x - 1e-2 * gn, 0.0, 1.0)
                x2 = jnp.where(gval[:, None], x2, x)
                return x2, jnp.where(gval, a, pd0), jnp.where(gval, b_, pd1), i + 1

            init_pd = (jnp.where(gval, 1.0, 0.0), jnp.where(gval, 1.0, 0.0))
            x_gd, pd0, pd1, _ = jax.lax.while_loop(
                gd_cond, gd_body, (gx0, *init_pd, jnp.int32(0)))
            backq = jnp.where(gval, glanes, QC)
            ints_q = ints_q.at[backq].set(x_gd, mode="drop")
            d_new0_q = d_new0_q.at[backq].set(pd0, mode="drop")

            # scatter the curved side buffer back to candidate lanes; the
            # defaults (gg=True, d_new0=1) make any lane the buffer did not
            # compute fail the strict filter — only curved lanes are ever
            # read downstream, and all of them are in the buffer unless
            # OVF_Q was just flagged
            back = jnp.where(qval, qlanes, CCAP)
            ints = jnp.zeros((CCAP, 3), jnp.float32).at[back].set(
                ints_q, mode="drop")
            gg = jnp.ones((CCAP,), bool).at[back].set(gg_q, mode="drop")
            d_new0 = jnp.ones((CCAP,), jnp.float32).at[back].set(
                d_new0_q, mode="drop")
            # no-intersection rows pass the old-vertex filter by fiat
            # (strict_check sets d_new[gg, 0] = 0; subpoly_debug.py:246)
            d_new0 = jnp.where(gg, 0.0, d_new0)

            # mix: curved rows take the trilinear intersection point
            cand_v = jnp.where(curved[:, None],
                               e0w + ints * (e1w - e0w), cand_v)

        # --- 4. forward on the new vertices -----------------------------------
        if "forward" not in disable:
            with jax.named_scope("s4_cand_forward"):
                cand_out = net_outputs(spec, params, cand_v)   # [CCAP, R]
        else:
            cand_out = jnp.zeros((CCAP, R_COLS), jnp.float32) + cand_v[:, :1]

        # --- 5. sign-override failover (subpoly_debug.py:33-51) ---------------
        if "override" not in disable:
            b = (both_zero_col & (col < idx)) | (col == idx)
            viol = (cval[:, None] & b & (jnp.abs(cand_out) > eps)).any()
            cand_out = jnp.where(viol & b, 0.0, cand_out)

        # --- 5b. strict on-surface filter (subpoly_debug.py:234-271) -----------
        if force:
            keep_c = cval
        else:
            chk = jnp.take_along_axis(
                cand_out, jnp.broadcast_to(idx, (CCAP,))[:, None], 1)[:, 0]
            chk_ok = jnp.abs(chk) < eps
            # curved: on-surface, a real in-range intersection, and the parent
            # plane residual within eps; no-earlier-plane rows are dropped
            # (the reference hard-exits there, subpoly.py:143-148)
            keep_cv = chk_ok & ~gg & (jnp.abs(d_new0) < eps) & has_plane
            keep_c = cval & jnp.where(curved_raw, keep_cv, chk_ok)
            # hw[15] meter: curved candidates the strict filter dropped
            n_strict_drop = (cval & curved_raw
                             & ~keep_cv).sum().astype(jnp.int32)

        # survivors, compacted to the front of the append block
        rank2 = jnp.cumsum(keep_c.astype(jnp.int32)) - 1
        n_new = keep_c.sum().astype(jnp.int32)
        slanes, sval, _ = _compact_lanes(keep_c, CCAP)
        cand_v_s = cand_v[slanes]
        cand_out_s = cand_out[slanes]

        # --- 6. append new vertices (contiguous block writes) ------------------
        with jax.named_scope("s6_append"):
            start_v = jnp.minimum(nV, VCAP - CCAP)  # overflow already flagged
            V = jax.lax.dynamic_update_slice(V, cand_v_s, (start_v, 0))
            OUT = jax.lax.dynamic_update_slice(OUT, cand_out_s, (start_v, 0))
            # pack the new rows' sign/zero words once (slot space,
            # pre-compaction: rewrite + append sites below index them by
            # slot) and store the survivor-compacted block alongside OUT
            sb_pre, zb_pre, sz_pre = _pack_out_words(cand_out, eps)
            # one row gather at slanes instead of 2-3*NW column gathers
            w_pre = jnp.concatenate(
                [sb_pre.T, zb_pre.T] + ([sz_pre.T] if not final else []),
                axis=1)
            w_sel = jnp.where(sval[:, None], w_pre[slanes], 0)
            sb_s = w_sel[:, :NW].T
            zb_s = w_sel[:, NW:2 * NW].T
            SB = jax.lax.dynamic_update_slice(SB, sb_s, (0, start_v))
            ZB = jax.lax.dynamic_update_slice(ZB, zb_s, (0, start_v))
            if not final:
                sz_s = w_sel[:, 2 * NW:].T
                SZ = jax.lax.dynamic_update_slice(SZ, sz_s, (0, start_v))
        # aliveV is not maintained per step: liveness is implied by aliveE
        # (the hit scan walks edges); the epilogue recomputes it once

        if not final:
            # packed per-vertex word table for this step's remaining word
            # reads (rewrite @ce0, appends @ra, connecting edges @c_app):
            # one short row gather per index set instead of 3*NW serialized
            # column gathers (see _split_w6).  Built AFTER the stage-6 block
            # write so the new vertices' rows are included.
            W6 = jnp.concatenate([SB.T, ZB.T, SZ.T], axis=1)  # [VCAP, 3*NW]

        # --- 7. edge rewrite + right-edge append (subpoly.py:210-215) ----------
        # Appends are PRE-filtered by the same future-sign test the
        # end-of-step prune applies (subpoly.py:253-272): an appended edge
        # whose endpoints share every future sign would be dropped by the
        # prune a few stages later anyway, so filtering at append time is
        # semantically identical but keeps the edge pool (and its memoized
        # cap — every pool lane costs work each step) at the live size.
        # The test is the scalar ``last-differ >= idx`` on the per-edge
        # words (see _edge_bits), which every created edge computes anyway.
        prefilter = prune  # static: the final insertion is NOT pruned
        #                    (subpoly.py:67-69,253), so its appends must not
        #                    be pre-filtered either — the funnel's "B" count
        #                    includes them

        # lane -> candidate index -> survivor rank (gathers only, no scatter)
        with jax.named_scope("s7_rewrite"):
            rank = jnp.cumsum(split.astype(jnp.int32)) - 1
            split_kept = split & keep_c[rank]
            new_id = nV + rank2[rank]
            old_second = ce1          # E[lanes, 1]; E is untouched since s2
            aliveE_pre = aliveE       # pre-append liveness, for the hit scan
            e0_col = E[:, 0]          # pre-rewrite endpoints, ditto
            e1_col = E[:, 1]
            E = jnp.stack(
                [E[:, 0], jnp.where(split_kept, new_id, E[:, 1])], axis=-1)

            # rewritten edges (a, new): update their static split words in
            # place (slot space: slot s rewrites lane lanes[s] iff its
            # candidate survived; a = ce0[s], new words = slot-space pack)
            if not final:
                rw_p_sb, rw_p_zb, rw_p_sz = _split_w6(W6[ce0])
                eb_rw, ld_rw = _edge_bits(rw_p_sb, rw_p_zb, sb_pre, zb_pre)
                rw_tgt = jnp.where(cval & keep_c, lanes, ECAP)
                EB = jnp.stack([EB[w].at[rw_tgt].set(eb_rw[w], mode="drop")
                                for w in range(NW)])
                LD = LD.at[rw_tgt].set(ld_rw, mode="drop")
                EZ0 = jnp.stack(
                    [EZ0[w].at[rw_tgt].set(rw_p_sz[w], mode="drop")
                     for w in range(NW)])
                EZ1 = jnp.stack(
                    [EZ1[w].at[rw_tgt].set(sz_pre[w], mode="drop")
                     for w in range(NW)])

            ra = jnp.where(sval, old_second[slanes], 0)
            if prefilter:
                # appended edges (old second endpoint, new vertex): the
                # pre-filter needs their last-differ columns
                ap_p_sb, ap_p_zb, ap_p_sz = _split_w6(W6[ra])
                eb_ap, ld_ap = _edge_bits(ap_p_sb, ap_p_zb, sb_s, zb_s)
                keep_r = sval & (ld_ap >= idx)
                rlanes, rval, n_eapp = _compact_lanes(keep_r, CCAP)
                # every appended-edge column (ra + the word-store block) in
                # ONE row gather at rlanes instead of 7 serialized 1D
                # gathers (_split_w6 rationale)
                ap8 = jnp.concatenate(
                    [ra[:, None].astype(jnp.uint32), eb_ap.T,
                     ld_ap[:, None].astype(jnp.uint32), ap_p_sz.T, sz_s.T],
                    axis=1)[rlanes]
                ra_c = ap8[:, 0].astype(jnp.int32)
                eb_blk = jnp.where(rval[None, :], ap8[:, 1:1 + NW].T, 0)
                ld_blk = jnp.where(rval,
                                   ap8[:, 1 + NW].astype(jnp.int32), -1)
                ez0_blk = jnp.where(rval[None, :],
                                    ap8[:, 2 + NW:2 + 2 * NW].T, 0)
                ez1_blk = jnp.where(rval[None, :], ap8[:, 2 + 2 * NW:].T, 0)
            else:
                # no pre-filter: the survivor block appends as-is (slot
                # order), so no compaction gathers are needed at all
                rlanes, rval, n_eapp = (jnp.arange(CCAP, dtype=jnp.int32),
                                        sval, n_new)
                ra_c = ra
                if not final:
                    ap_p_sb, ap_p_zb, ap_p_sz = _split_w6(W6[ra])
                    eb_ap, ld_ap = _edge_bits(ap_p_sb, ap_p_zb, sb_s, zb_s)
                    eb_blk = jnp.where(rval[None, :], eb_ap, 0)
                    ld_blk = jnp.where(rval, ld_ap, -1)
                    ez0_blk = jnp.where(rval[None, :], ap_p_sz, 0)
                    ez1_blk = jnp.where(rval[None, :], sz_s, 0)
            e_app = jnp.stack(
                [jnp.where(rval, ra_c, 0),
                 jnp.where(rval, nV + rlanes, 0)], axis=-1)
            start_e = jnp.minimum(nE, ECAP - CCAP)
            ovf = ovf | jnp.where(nE + n_eapp > ECAP - CCAP, OVF_E, 0)
            E = jax.lax.dynamic_update_slice(E, e_app, (start_e, 0))
            aliveE = jax.lax.dynamic_update_slice(aliveE, rval, (start_e,))
            if not final:
                EB = jax.lax.dynamic_update_slice(EB, eb_blk, (0, start_e))
                LD = jax.lax.dynamic_update_slice(LD, ld_blk, (start_e,))
                EZ0 = jax.lax.dynamic_update_slice(EZ0, ez0_blk,
                                                   (0, start_e))
                EZ1 = jax.lax.dynamic_update_slice(EZ1, ez1_blk,
                                                   (0, start_e))
        nE2 = nE + n_eapp
        nV2 = nV + n_new

        if "pairs" in disable:  # profiling cut: skip stages 8-12
            state = State(V, OUT, E, aliveV, aliveE, nV2, nE2, ovf, hw,
                          SB, ZB, SZ, EB, LD, EZ0, EZ1)
            if prune and "prune" not in disable:
                state = _prune(state, idx, eps)
            return state

        # --- 8. candidates for connecting edges: new + eps-hit old vertices ----
        #     (subpoly.py:232-239); hits are *live* old vertices only.  Live
        #     == referenced by an alive edge, so the eps-hit endpoints of the
        #     (pre-append) alive edges ARE the hit set — found with one edge
        #     compaction + a tiny sort instead of per-step vertex liveness
        #     (which needed a bool scatter every prune).
        he = aliveE_pre & (h0 | h1)
        HE = 4 * HCAP  # hit vertices appear once per incident edge
        with jax.named_scope("s8_hitscan"):
            helanes, heval, n_he_busy = _compact_lanes(he, HE)
        ovf = ovf | jnp.where(n_he_busy > HE, OVF_H, 0)
        ids0 = jnp.where(heval & h0[helanes], e0_col[helanes], VCAP)
        ids1 = jnp.where(heval & h1[helanes], e1_col[helanes], VCAP)
        sids = jax.lax.sort(jnp.concatenate([ids0, ids1]))
        uniq_h = jnp.concatenate([jnp.ones(1, bool), sids[1:] != sids[:-1]]) \
            & (sids < VCAP)
        hulanes, hval, n_hit = _compact_lanes(uniq_h, HCAP)
        hlanes = jnp.where(hval, sids[hulanes], 0)  # ascending vertex ids
        ovf = ovf | jnp.where(n_hit > HCAP, OVF_H, 0)

        # region data: new (surviving) block, then the hit block from V/OUT
        hv = V[hlanes]
        hout = OUT[hlanes]
        all_v = jnp.concatenate([cand_v_s, hv], axis=0)        # [CAND, 3]
        all_out = jnp.concatenate([cand_out_s, hout], axis=0)  # [CAND, R]
        all_vid = jnp.concatenate(
            [nV + jnp.arange(CCAP, dtype=jnp.int32), hlanes])
        all_valid = jnp.concatenate([sval, hval])

        xu = preprocess(spec, all_v)
        cand_g, cand_o = _grid_region_lut(marks, lut, xu, eps, lut_k)  # [CAND, 3]
        cand_s = _eps_sign(all_out, eps)                        # [CAND, R]
        # active neuron columns: col < idx (current plane excluded;
        # reference subpoly.py:187 splits at m_idx)
        cand_s = jnp.where(col < idx, cand_s, 1)

        # packed per-candidate words for the pair filter:
        #   zs: bit j = neuron col j is zero (cols 0..31; col 32 is never
        #       active since idx <= 32)
        #   go: 3 x 9-bit grid cell (+1) | 3-bit grid-zero mask at bits 27..29
        zbit = jnp.uint32(1) << jnp.arange(min(R_COLS, 32),
                                           dtype=jnp.uint32)
        zs = jnp.sum((cand_s[:, :min(R_COLS, 32)] == 0).astype(jnp.uint32)
                     * zbit[None, :], axis=1, dtype=jnp.uint32)
        go = ((cand_o[:, 0] + 1)
              | ((cand_o[:, 1] + 1) << 9)
              | ((cand_o[:, 2] + 1) << 18)).astype(jnp.uint32)
        for dax in range(D):
            go = go | ((cand_g[:, dax] == 0).astype(jnp.uint32) << (27 + dax))

        # --- 9. 2^zeros region expansion (subpoly.py:299-335), two tiers -------
        # The bulk of candidates lie on exactly 2 planes (parent-edge plane +
        # a grid/neuron coincidence) -> 4 replicas; lattice hit vertices sit
        # on 3 grid planes + neuron planes -> up to 2^KCAP replicas, but they
        # are few.  Tier A expands every candidate 4x; tier B re-expands the
        # rare high-zero rows 2^KCAP x in a small side buffer.
        allcols = jnp.concatenate([cand_g, cand_s], axis=1)     # [CAND, 36]
        is_zero = allcols == 0
        kz = is_zero.sum(-1)
        ovf = ovf | jnp.where((all_valid & (kz > KCAP)).any(), OVF_K, 0)
        zrank = jnp.cumsum(is_zero.astype(jnp.int32), axis=1) - 1

        big = jnp.int32(2 ** 30)

        _keys = _expand_keys

        cand_rows = jnp.arange(CAND, dtype=jnp.int32)
        tierB = all_valid & (kz > 2)
        with jax.named_scope("s9_expand"):
            kA1, kA2, kA3, rA = _expand4_keys(allcols, cand_o,
                                              all_valid & ~tierB, kz,
                                              cand_rows)

            blanes, bval, n_b = _compact_lanes(tierB, HB)
            ovf = ovf | jnp.where(n_b > HB, OVF_B, 0)
            kB1, kB2, kB3, rB = _keys(allcols[blanes], zrank[blanes],
                                      cand_o[blanes], bval, kz[blanes],
                                      PREP, KCAP, blanes)

        k1f = jnp.concatenate([kA1, kB1])
        k2f = jnp.concatenate([kA2, kB2])
        k3f = jnp.concatenate([kA3, kB3])
        rowf = jnp.concatenate([rA, rB])

        if "repsort" in disable:  # profiling cut: expansion only
            ovf = ovf | (k1f.max() * 0) | (k2f.max() * 0) | (k3f.max() * 0)
            state = State(V, OUT, E, aliveV, aliveE, nV2, nE2, ovf, hw,
                          SB, ZB, SZ, EB, LD, EZ0, EZ1)
            if prune and "prune" not in disable:
                state = _prune(state, idx, eps)
            return state

        with jax.named_scope("s9_repsort"):
            sk1, sk2, sk3, srow = jax.lax.sort((k1f, k2f, k3f, rowf),
                                               num_keys=3)

        if "windows" in disable:  # profiling cut: expansion + sort only
            ovf = ovf | (srow.max() * 0) | (sk1.max() * 0)
            state = State(V, OUT, E, aliveV, aliveE, nV2, nE2, ovf, hw,
                          SB, ZB, SZ, EB, LD, EZ0, EZ1)
            if prune and "prune" not in disable:
                state = _prune(state, idx, eps)
            return state

        # --- 10. same-region pairs by prefix-sum slot assignment ---------------
        # Every region is a contiguous run after the sort; a replica at
        # in-run rank r pairs with its min(r, WCAP) closest predecessors
        # (identical pair set to the old WCAP-shifted window, reference
        # subpoly.py:505-513; truncation beyond WCAP is flagged the same).
        # Pair slots come from a prefix sum over per-replica pair counts and
        # each slot GATHERS its two replicas — O(PCAP) work instead of the
        # old O(WCAP*N) materialized window + compaction sort (a 21M-lane
        # sort per busy step at medium caps, the engine's biggest single op).
        svalid = sk1 < big
        nrep_sz = sk1.shape[0]
        irep = jnp.arange(nrep_sz, dtype=jnp.int32)
        newrun = jnp.concatenate([
            jnp.ones((1,), bool),
            (sk1[1:] != sk1[:-1]) | (sk2[1:] != sk2[:-1])
            | (sk3[1:] != sk3[:-1])])
        run_start = jax.lax.cummax(jnp.where(newrun, irep, 0))
        rank = irep - run_start
        ovf = ovf | jnp.where((svalid & (rank >= WCAP)).any(), OVF_W, 0)
        r = jnp.where(svalid, jnp.minimum(rank, WCAP), 0)
        cum = jnp.cumsum(r)
        n_pairs = cum[-1]
        ovf = ovf | jnp.where(n_pairs > PCAP, OVF_P, 0)

        if "paircompact" in disable:  # profiling cut: stop after pair counts
            ovf = ovf | (cum.max() * 0) | (rank.max() * 0)
            state = State(V, OUT, E, aliveV, aliveE, nV2, nE2, ovf, hw,
                          SB, ZB, SZ, EB, LD, EZ0, EZ1)
            if prune and "prune" not in disable:
                state = _prune(state, idx, eps)
            return state

        # slot -> owning replica: each pair-owning replica writes its index
        # at its first slot (cum[i]-r[i]; block starts are unique), then a
        # running max fills each block.  Replica 0 never owns pairs, so the
        # zero-init never collides with a real index.
        with jax.named_scope("s10_pairslots"):
            starts = jnp.where(r > 0, cum - r, PCAP)
            marker = jnp.zeros(PCAP, jnp.int32).at[starts].max(
                irep, mode="drop", unique_indices=True)
            si = jax.lax.cummax(marker)
            slot = jnp.arange(PCAP, dtype=jnp.int32)
            p_valid = slot < n_pairs
            # one [nrep, 2] row gather at si replaces the separate cum/r/srow
            # column gathers: independent single-column gathers do NOT
            # overlap on TPU (~11-13 ns/index EACH) while a packed short row
            # costs ~11 ns total (scripts/probe_gather.py); the replica
            # payload (zs/go/vid) rides the same rows so stage 11 needs no
            # further candidate-table gathers at all
            rtab = jnp.stack([(cum - r).astype(jnp.uint32),
                              zs[srow], go[srow],
                              all_vid[srow].astype(jnp.uint32)], axis=1)
            ra_row = rtab[si]
            off = slot - ra_row[:, 0].astype(jnp.int32) + 1
            rb_row = rtab[jnp.clip(si - off, 0, nrep_sz - 1)]

        # --- 11. shared-plane filter (subpoly.py:524-533), on packed words -----
        with jax.named_scope("s11_pairfilter"):
            zs_ab = ra_row[:, 1] & rb_row[:, 1]
            go_a = ra_row[:, 2]
            go_b = rb_row[:, 2]
        shared = jax.lax.population_count(zs_ab).astype(jnp.int32)
        both_zero = (go_a >> 27) & (go_b >> 27)                  # 3-bit mask
        for dax in range(D):
            off_eq = ((go_a ^ go_b) >> (9 * dax)) & jnp.uint32(511)
            shared = shared + jnp.where(
                ((both_zero >> dax) & 1 > 0) & (off_eq == 0), 1, 0)
        va = ra_row[:, 3].astype(jnp.int32)
        vb = rb_row[:, 3].astype(jnp.int32)
        keep_pair = p_valid & (shared >= 1) & (va != vb)

        if "dedup" in disable:  # profiling cut: stop before the dedup sort
            ovf = ovf | (keep_pair.any() * 0)
            state = State(V, OUT, E, aliveV, aliveE, nV2, nE2, ovf, hw,
                          SB, ZB, SZ, EB, LD, EZ0, EZ1)
            if prune and "prune" not in disable:
                state = _prune(state, idx, eps)
            return state

        # --- 12. dedup + append connecting edges (subpoly.py:241-250) ----------
        # (also pre-filtered by the future-sign-key prune test, like the
        # right-edge appends in stage 7 — most raw connecting edges die in
        # the same step's prune, so filtering first keeps the pool small)
        with jax.named_scope("s12_conndedup"):
            lo = jnp.where(keep_pair, jnp.minimum(va, vb), jnp.int32(VCAP))
            hi = jnp.where(keep_pair, jnp.maximum(va, vb), jnp.int32(VCAP))
            slo, shi = jax.lax.sort((lo, hi), num_keys=2)
        first = jnp.concatenate([
            jnp.ones(1, bool),
            (slo[1:] != slo[:-1]) | (shi[1:] != shi[:-1])])
        uniq = first & (slo < VCAP)
        if prefilter:
            # future-sign pre-filter on packed base-3 keys (pair-pool width;
            # the per-edge word store only helps once an edge exists); the
            # two key words ride one [VCAP, 2] table so each side is a
            # single row gather
            colf = jnp.arange(R_COLS, dtype=jnp.int32)
            pktab = jnp.stack(_pack_base3(_eps_sign(OUT, eps), colf >= idx),
                              axis=1)
            plo = pktab[jnp.minimum(slo, VCAP - 1)]
            phi = pktab[jnp.minimum(shi, VCAP - 1)]
            uniq = uniq & ((plo[:, 0] != phi[:, 0])
                           | (plo[:, 1] != phi[:, 1]))
        ulanes, uval, n_conn = _compact_lanes(uniq, CONNCAP)
        ovf = ovf | jnp.where(n_conn > CONNCAP, OVF_P, 0)
        c_app = jnp.stack([jnp.where(uval, slo[ulanes], 0),
                           jnp.where(uval, shi[ulanes], 0)], axis=-1)
        start_e2 = jnp.minimum(nE2, ECAP - CONNCAP)
        ovf = ovf | jnp.where(nE2 + n_conn > ECAP - CONNCAP, OVF_E, 0)
        E = jax.lax.dynamic_update_slice(E, c_app, (start_e2, 0))
        aliveE = jax.lax.dynamic_update_slice(aliveE, uval, (start_e2,))
        if not final:
            # connecting edges' static split words (endpoints are all written
            # to the word store by now: new vertices in stage 6, hits old);
            # one packed row gather per endpoint instead of 3*NW column
            # gathers each
            cn_p_sb, cn_p_zb, cn_p_sz = _split_w6(W6[c_app[:, 0]])
            cn_q_sb, cn_q_zb, cn_q_sz = _split_w6(W6[c_app[:, 1]])
            eb_cn, ld_cn = _edge_bits(cn_p_sb, cn_p_zb, cn_q_sb, cn_q_zb)
            EB = jax.lax.dynamic_update_slice(
                EB, jnp.where(uval[None, :], eb_cn, 0), (0, start_e2))
            LD = jax.lax.dynamic_update_slice(
                LD, jnp.where(uval, ld_cn, -1), (start_e2,))
            EZ0 = jax.lax.dynamic_update_slice(
                EZ0, jnp.where(uval[None, :], cn_p_sz, 0), (0, start_e2))
            EZ1 = jax.lax.dynamic_update_slice(
                EZ1, jnp.where(uval[None, :], cn_q_sz, 0), (0, start_e2))
        nE3 = nE2 + n_conn

        z = jnp.int32(0)
        # the hit slot must cover BOTH caps it sizes: HCAP (unique hits) and
        # HE = 4*HCAP (hit-edge scan, pre-dedup) — recording only n_hit made
        # re-derived caps overflow on the next run
        hit_need = jnp.maximum(n_hit, -(-n_he_busy // 4))
        hw = jnp.maximum(hw, jnp.stack(
            [n_split, hit_need, n_pairs, n_conn, nV2, nE3, n_b, z, z, z, z,
             n_cv if not force else z, z, z, z, z]))
        if not force:
            # the curved stage meters [13:16] ACCUMULATE across steps (the
            # capacity marks above are per-step maxima) so they are directly
            # comparable to host-engine event totals
            hw = hw.at[13:16].add(jnp.stack([n_sent, n_gd, n_strict_drop]))
        else:
            # force=True diagnostics (the curved meters are unused): [13]
            # big-tier busy steps, [14] small-tier busy steps, [15] max
            # n_split over non-final big-tier steps — evidence for whether
            # a mid tier between TIER_SMALL and TIER_BIG would pay
            if tier is TIER_BIG:
                if not final:
                    hw = hw.at[13].add(1)
                    hw = hw.at[15].max(n_split)
            else:
                hw = hw.at[14].add(1)
        state = State(V, OUT, E, aliveV, aliveE, nV2, nE3, ovf, hw,
                      SB, ZB, SZ, EB, LD, EZ0, EZ1)
        if prune and "prune" not in disable:
            state = _prune(state, idx, eps)
        return state

    def _prune(state: State, idx, eps) -> State:
        """Drop edges whose endpoints share identical future sign vectors and
        compact survivors to the pool prefix (reference subpoly.py:253-277).
        The future-sign test is the scalar compare ``LD >= idx`` on the
        per-edge last-differing column (see _edge_bits) — no key pack or
        endpoint gathers.

        The vertex pool is compacted lazily — every 8th insertion or under
        pool pressure — because the compaction scatter/gather passes cost
        more per step than the vertex-width passes they save; lazy still
        bounds the pool at roughly the live maximum (order-preserving
        renumber, so the final mesh ordering is unchanged)."""
        (V, OUT, E, aliveV, aliveE, nV, nE, ovf, hw,
         SB, ZB, SZ, EB, LD, EZ0, EZ1) = state

        keep = aliveE & (LD >= idx)
        n_keep = keep.sum().astype(jnp.int32)

        # compact surviving edges to the prefix only when dead lanes pile up
        # (>25% of live) or the pool nears its append headroom — compaction
        # reorders five pool-wide arrays (~6 ECAP gathers), while a masked
        # aliveE costs nothing: every consumer (probe bit test, hit scan,
        # prune, epilogue) is aliveE-masked, appends go through the nE
        # cursor past any holes, and compaction is order-preserving, so
        # deferring it never changes the final mesh — only pool density.
        # The gathers run on the smallest static pool prefix covering the
        # nE cursor (live edges always occupy [0, nE)): mid-run occupancy is
        # well below ECAP, and each dead tail lane still costs gather+sort.
        def _compact_edges_at(T: int):
            def go(args):
                E, EB, LD, EZ0, EZ1 = args
                with jax.named_scope("prune_compact"):
                    kp = jax.lax.slice(keep, (0,), (T,))
                    lanes, val, _ = _compact_lanes(kp, T)
                    # ONE packed row gather reorders all five edge-pool
                    # arrays (E cols, EB, LD, EZ0, EZ1) — serialized 1D
                    # gathers cost ~13 ns/index EACH (_split_w6 rationale)
                    row = jnp.concatenate(
                        [jax.lax.slice(E, (0, 0), (T, 2)).astype(jnp.uint32),
                         jax.lax.slice(EB, (0, 0), (NW, T)).T,
                         jax.lax.slice(LD, (0,), (T,))[:, None]
                         .astype(jnp.uint32),
                         jax.lax.slice(EZ0, (0, 0), (NW, T)).T,
                         jax.lax.slice(EZ1, (0, 0), (NW, T)).T],
                        axis=1)[lanes]
                    Ec = jnp.where(val[:, None],
                                   row[:, :2].astype(jnp.int32), 0)
                    EBc = jnp.where(val[None, :], row[:, 2:2 + NW].T, 0)
                    LDc = jnp.where(val,
                                    row[:, 2 + NW].astype(jnp.int32), -1)
                    EZ0c = jnp.where(val[None, :],
                                     row[:, 3 + NW:3 + 2 * NW].T, 0)
                    EZ1c = jnp.where(val[None, :], row[:, 3 + 2 * NW:].T, 0)
                if T < ECAP:
                    pe = ECAP - T
                    Ec = jnp.concatenate(
                        [Ec, jnp.zeros((pe, 2), Ec.dtype)])
                    EBc = jnp.concatenate(
                        [EBc, jnp.zeros((NW, pe), EBc.dtype)], axis=1)
                    LDc = jnp.concatenate(
                        [LDc, jnp.full((pe,), -1, LDc.dtype)])
                    EZ0c = jnp.concatenate(
                        [EZ0c, jnp.zeros((NW, pe), EZ0c.dtype)], axis=1)
                    EZ1c = jnp.concatenate(
                        [EZ1c, jnp.zeros((NW, pe), EZ1c.dtype)], axis=1)
                    val = jnp.concatenate([val, jnp.zeros((pe,), bool)])
                return (Ec, EBc, LDc, EZ0c, EZ1c), val, n_keep
            return go

        def _mask_edges(args):
            return args, keep, nE

        do_compact = ((nE - n_keep) * 4 > n_keep) \
            | (nE + 2 * (CCAP + caps.conncap) > ECAP)
        # finer tier ladder (round 5): at large caps the compaction fires
        # mostly between ECAP/2 and ECAP where the old 3-tier ladder ran at
        # full pool width — quarter-steps keep the 9 pool-wide gathers on
        # the smallest covering prefix (prune_compact was ~100 ms of the
        # large loop, the single biggest attributed loop cost)
        e_tiers = sorted({max(ECAP // 8, 65536), max(ECAP // 4, 65536),
                          max(3 * ECAP // 8, 65536), max(ECAP // 2, 65536),
                          max(5 * ECAP // 8, 65536), max(3 * ECAP // 4, 65536),
                          ECAP})
        e_tiers = [t for t in e_tiers if t <= ECAP]

        def _compact_tiered(args):
            def pick(i, args):
                T = e_tiers[i]
                if i + 1 == len(e_tiers):
                    return _compact_edges_at(T)(args)
                return jax.lax.cond(nE <= T, _compact_edges_at(T),
                                    lambda a: pick(i + 1, a), args)
            return pick(0, args)

        (E, EB, LD, EZ0, EZ1), aliveE, nE = jax.lax.cond(
            do_compact, _compact_tiered, _mask_edges, (E, EB, LD, EZ0, EZ1))
        val = aliveE

        def _compact_vertices_at(T: int):
            # same prefix-tier trick: live vertex ids are < nV <= T, so the
            # row gathers (OUT is [*, 36] — the widest array the engine
            # owns) run on the covering prefix; the used/new_index passes
            # stay pool-wide (streaming scatter+cumsum, bandwidth-cheap, and
            # E's renumber gather indexes dead lanes up to VCAP)
            def go(args):
                V, OUT, E, SB, ZB, SZ, nV = args
                with jax.named_scope("prune_vcompact"):
                    used = jnp.zeros(VCAP, bool)
                    used = used.at[jnp.where(val, E[:, 0], VCAP)].set(
                        True, mode="drop")
                    used = used.at[jnp.where(val, E[:, 1], VCAP)].set(
                        True, mode="drop")
                    new_index = jnp.cumsum(used.astype(jnp.int32)) - 1
                    vlanes, vval, n_used = _compact_lanes(
                        jax.lax.slice(used, (0,), (T,)), T)
                    Vc = jnp.where(
                        vval[:, None],
                        jax.lax.slice(V, (0, 0), (T, 3))[vlanes], 0)
                    OUTc = jnp.where(
                        vval[:, None],
                        jax.lax.slice(OUT, (0, 0), (T, R_COLS))[vlanes], 0)
                    wrow = jnp.concatenate(
                        [jax.lax.slice(SB, (0, 0), (NW, T)).T,
                         jax.lax.slice(ZB, (0, 0), (NW, T)).T,
                         jax.lax.slice(SZ, (0, 0), (NW, T)).T],
                        axis=1)[vlanes]
                    SBc, ZBc, SZc = (jnp.where(vval[None, :], w, 0)
                                     for w in _split_w6(wrow))
                if T < VCAP:
                    pv = VCAP - T
                    Vc = jnp.concatenate([Vc, jnp.zeros((pv, 3), Vc.dtype)])
                    OUTc = jnp.concatenate(
                        [OUTc, jnp.zeros((pv, R_COLS), OUTc.dtype)])
                    wz = jnp.zeros((NW, pv), jnp.uint32)
                    SBc = jnp.concatenate([SBc, wz], axis=1)
                    ZBc = jnp.concatenate([ZBc, wz], axis=1)
                    SZc = jnp.concatenate([SZc, wz], axis=1)
                E2 = jnp.where(val[:, None], new_index[E], 0)
                return Vc, OUTc, E2, SBc, ZBc, SZc, n_used
            return go

        v_tiers = sorted({max(VCAP // 8, 65536), max(VCAP // 4, 65536),
                          max(3 * VCAP // 8, 65536), max(VCAP // 2, 65536),
                          max(5 * VCAP // 8, 65536), max(3 * VCAP // 4, 65536),
                          VCAP})
        v_tiers = [t for t in v_tiers if t <= VCAP]

        def _compact_v_tiered(args):
            def pick(i, args):
                T = v_tiers[i]
                if i + 1 == len(v_tiers):
                    return _compact_vertices_at(T)(args)
                return jax.lax.cond(nV <= T, _compact_vertices_at(T),
                                    lambda a: pick(i + 1, a), args)
            return pick(0, args)

        V, OUT, E, SB, ZB, SZ, nV = jax.lax.cond(
            (idx % 8 == 7) | (nV + 2 * CCAP > VCAP),
            _compact_v_tiered, lambda args: args,
            (V, OUT, E, SB, ZB, SZ, nV))

        return State(V, OUT, E, aliveV, aliveE, nV, nE, ovf, hw,
                     SB, ZB, SZ, EB, LD, EZ0, EZ1)

    return step, _prune


def make_extract_fn(spec: NetSpec, caps: Caps, eps: float,
                    disable: frozenset = frozenset(), force: bool = True,
                    stop_before_final: bool = False, lut_k: int = 4,
                    with_skeleton: bool = False, marks_len: int | None = None,
                    with_faces: bool = False, skel_mode: str = "sign",
                    dist_k: int = 0, init_hint: tuple | None = None):
    """One jitted program: 32 hidden insertions + the final-layer insertion +
    the |sdf|<eps skeleton filter (reference subpoly.py:60-74,556-581).

    ``stop_before_final`` is a debug knob: return the raw padded state after
    the hidden insertions (V, OUT, E, aliveE-compacted edges) for cross-engine
    divergence hunting.

    ``init_hint=(SV, SE)`` bounds the initial skeleton's vertex/edge counts
    (the skeleton's own caps): the one-time word pack then runs on those
    static pool prefixes instead of full VCAP/ECAP width — at M=201 the edge
    pool is ~2.6x the skeleton cap, and the pack's 12 pool-wide gathers +
    33-column bit scans were ~13%% of the whole run.  Counts above the hint
    flag OVF_V/OVF_E (the ramp retries without a hint), so a stale hint can
    only cost a retry, never correctness."""
    step, _ = make_step_fn(spec, caps, eps, disable, force, lut_k)
    VCAP, ECAP = caps.vcap, caps.ecap
    KCAP, WCAP = caps.kcap, caps.wcap
    # faces-stage capacities (0 = auto-derive from the vertex pool)
    FVC = caps.fvcap or max(_round_up(VCAP // 4), 16384)
    RGC = caps.rgcap or _round_up(FVC + FVC // 2)
    TC = caps.tcap or _round_up(3 * FVC)
    HBF = caps.hbf or max(_round_up(FVC // 4, 2048), 2048)
    n_hidden_steps = (spec.num_layers - 1) * spec.num_hidden

    def _run(params, marks, V0, OUT0, E0, nV0, nE0, ovf0):
        aliveV0 = jnp.arange(VCAP, dtype=jnp.int32) < nV0
        aliveE0 = jnp.arange(ECAP, dtype=jnp.int32) < nE0
        hw0 = jnp.stack([jnp.int32(0)] * 4
                        + [jnp.int32(nV0), jnp.int32(nE0)]
                        + [jnp.int32(0)] * 10)
        # one-time pack of the skeleton's static sign/zero words and the
        # per-edge split words / last-differ columns (the loop maintains
        # them incrementally at every vertex/edge creation site).  With an
        # init_hint the pack runs on the skeleton-cap prefix and pads: rows
        # past the prefix are exactly what full-width packing of the
        # zero-padded pools produced (all-zero V/OUT rows pack to the
        # fixed zero-row words; dead edge lanes to EB=0/LD=-1/EZ=0).
        SVh = min(init_hint[0], VCAP) if init_hint else VCAP
        SEh = min(init_hint[1], ECAP) if init_hint else ECAP
        ovf0 = ovf0 | jnp.where(nV0 > SVh, OVF_V, 0) \
            | jnp.where(nE0 > SEh, OVF_E, 0)

        def _padv(w, fill):
            if SVh == VCAP:
                return w
            tail = jnp.full((NW, VCAP - SVh), fill, w.dtype)
            return jnp.concatenate([w, tail], axis=1)

        SB0, ZB0, SZ0 = _pack_out_words(
            jax.lax.slice(OUT0, (0, 0), (SVh, R_COLS)), eps)
        # a zero OUT row packs to sb=0 and zb=sz=<all R_COLS bits set>
        # (|0| <= eps): replicate for the padded tail bit-for-bit
        zfill = [jnp.uint32((1 << (min(32 * w + 32, R_COLS) - 32 * w)) - 1)
                 for w in range(NW)]
        SB0 = _padv(SB0, jnp.uint32(0))
        if SVh < VCAP:
            ztail = jnp.stack([jnp.full((VCAP - SVh,), zfill[w], jnp.uint32)
                               for w in range(NW)])
            ZB0 = jnp.concatenate([ZB0, ztail], axis=1)
            SZ0 = jnp.concatenate([SZ0, ztail], axis=1)

        aliveE_h = jax.lax.slice(aliveE0, (0,), (SEh,))
        E0h = jax.lax.slice(E0, (0, 0), (SEh, 2))
        se0 = jnp.where(aliveE_h, E0h[:, 0], 0)
        se1 = jnp.where(aliveE_h, E0h[:, 1], 0)
        # one packed row gather per endpoint instead of 3*NW serialized
        # column gathers each (_split_w6 rationale)
        W60 = jnp.concatenate([SB0.T, ZB0.T, SZ0.T], axis=1)
        sb_e0, zb_e0, sz_e0 = _split_w6(W60[se0])
        sb_e1, zb_e1, sz_e1 = _split_w6(W60[se1])
        eb0, ld0 = _edge_bits(sb_e0, zb_e0, sb_e1, zb_e1)

        def _pade(w, fill):
            if SEh == ECAP:
                return w
            shape = ((NW, ECAP - SEh) if w.ndim == 2 else (ECAP - SEh,))
            return jnp.concatenate(
                [w, jnp.full(shape, fill, w.dtype)], axis=w.ndim - 1)

        state = State(V0, OUT0, E0, aliveV0, aliveE0, nV0, nE0,
                      ovf0, hw0, SB0, ZB0, SZ0,
                      _pade(jnp.where(aliveE_h[None, :], eb0, 0),
                            jnp.uint32(0)),
                      _pade(jnp.where(aliveE_h, ld0, -1), jnp.int32(-1)),
                      _pade(jnp.where(aliveE_h[None, :], sz_e0, 0),
                            jnp.uint32(0)),
                      _pade(jnp.where(aliveE_h[None, :], sz_e1, 0),
                            jnp.uint32(0)))

        lut = jnp.searchsorted(
            marks, jnp.arange(LUTN, dtype=marks.dtype) / LUTN
        ).astype(jnp.int32)

        # --- busy-skip loop driver (round 5) -------------------------------
        # ~2/3 of the 32 hidden-plane insertions split nothing (reference
        # early-return, subpoly.py:110-111; idle steps leave the state
        # bit-identical), yet each idle fori iteration paid a pool-wide
        # [ECAP] split-bit probe + cond dispatch (~1 ms/step at M=201).  A
        # [NW]-word OR summary of the alive edges' split words knows every
        # plane with at least one live split, so the loop jumps straight
        # from busy plane to busy plane: the while_loop runs ~3-10
        # iterations instead of 32, and the summary refresh is one masked
        # [NW, ECAP] OR-reduce per BUSY step.  `step`'s own has_split cond
        # stays as a harmless second gate (summary bit set => split exists).
        def _split_summary(st: State):
            live = jnp.where(st.aliveE[None, :], st.EB, jnp.uint32(0))
            return jax.lax.reduce(live, jnp.uint32(0),
                                  jax.lax.bitwise_or, (1,))

        def _next_busy(i, SM):
            """Smallest plane j >= i with a live split bit, else
            n_hidden_steps (i, j traced i32 scalars)."""
            nxt = jnp.int32(n_hidden_steps)
            for w in range(NW):
                if 32 * w >= n_hidden_steps:
                    break
                lo = jnp.clip(i - 32 * w, 0, 32)
                keep_mask = jnp.where(
                    lo >= 32, jnp.uint32(0),
                    jax.lax.shift_left(
                        jnp.uint32(0xFFFFFFFF),
                        jnp.clip(lo, 0, 31).astype(jnp.uint32)))
                word = SM[w] & keep_mask
                lowbit = word & (~word + jnp.uint32(1))
                tz = jax.lax.population_count(
                    lowbit - jnp.uint32(1)).astype(jnp.int32)
                cand = jnp.where(word > 0, 32 * w + tz, n_hidden_steps)
                nxt = jnp.minimum(nxt, cand)
            return jnp.minimum(nxt, jnp.int32(n_hidden_steps))

        def cond(carry):
            return carry[0] < n_hidden_steps

        def body(carry):
            i, st, SM = carry
            st = step(params, marks, lut, st, i, prune=True)
            SM = _split_summary(st)
            return (_next_busy(i + 1, SM), st, SM)

        SM0 = _split_summary(state)
        _, state, _ = jax.lax.while_loop(
            cond, body, (_next_busy(jnp.int32(0), SM0), state, SM0))
        if stop_before_final:
            return state
        # final layer (h == num_hidden): no pruning (subpoly.py:67-69,253);
        # final=True also skips the per-edge/per-vertex word-store
        # maintenance no later step exists to read
        state = step(params, marks, lut, state, jnp.int32(n_hidden_steps),
                     prune=False, final=True)

        # extract_skeleton: |last col| < eps, inside [0,1]^D (subpoly.py:556-581)
        V, OUT, E, aliveV, aliveE, nV, nE, ovf, hw = state[:9]

        # pre-filter funnel counts (the reference's "A/B" in its
        # "# of vertices and edges = A/B => C/D" line, subpoly.py:71-84):
        # A = vertices referenced by live edges after the final insertion
        # (the host engine compacts to exactly that set), B = live edges
        used_pre = jnp.zeros(VCAP, bool)
        used_pre = used_pre.at[jnp.where(aliveE, E[:, 0], VCAP)].set(
            True, mode="drop")
        used_pre = used_pre.at[jnp.where(aliveE, E[:, 1], VCAP)].set(
            True, mode="drop")
        nV_pre = used_pre.sum().astype(jnp.int32)

        xu = preprocess(spec, V)
        # vertex liveness need not be tracked: dead vertices cannot appear in
        # alive edges, and only e_keep feeds the final used set
        v_lane = jnp.arange(VCAP, dtype=jnp.int32)
        keep_v = (v_lane < nV) & (jnp.abs(OUT[:, -1]) < eps) \
            & (xu <= 1).all(-1) & (xu >= 0).all(-1)
        e_keep = aliveE & keep_v[E[:, 0]] & keep_v[E[:, 1]]

        # final vertex set: only vertices used by surviving edges.  In faces
        # mode the survivors compact straight into the FVC-wide buffer the
        # faces stage consumes (counts above FVC flag OVF_F and the result
        # is discarded), and the edge compaction is skipped outright — its
        # output is never consumed when triangles are assembled on device,
        # only the surviving-edge COUNT feeds the funnel line.
        used = jnp.zeros(VCAP, bool)
        used = used.at[jnp.where(e_keep, E[:, 0], VCAP)].set(True, mode="drop")
        used = used.at[jnp.where(e_keep, E[:, 1], VCAP)].set(True, mode="drop")
        new_index = jnp.cumsum(used.astype(jnp.int32)) - 1

        vlanes, vval, n_used = _compact_lanes(used, FVC if with_faces
                                              else VCAP)
        V = jnp.where(vval[:, None], V[vlanes], 0)

        if with_faces:
            # the faces stage only consumes eps-SIGNS of the outputs: gather
            # the 2 packed u32 words per vertex instead of the 34 f32
            # columns (~17x less gather traffic), and return a 0-row OUT —
            # it is never pulled on this path
            SBf = _gather_words(state.SB, vlanes)      # [NW, FVC]
            ZBf = _gather_words(state.ZB, vlanes)
            OUT = jnp.zeros((0, R_COLS), jnp.float32)
            n_ekeep = e_keep.sum().astype(jnp.int32)
            E = jnp.zeros((0, 2), jnp.int32)
        else:
            OUT = jnp.where(vval[:, None], OUT[vlanes], 0)
            elanes, eval_, n_ekeep = _compact_lanes(e_keep, ECAP)
            E = jnp.where(eval_[:, None], new_index[E[elanes]], 0)

        # funnel "B" counts LIVE edges (deferred prune compaction can leave
        # the nE cursor past dead holes)
        nE_live = aliveE.sum().astype(jnp.int32)

        # the skeleton's true initial counts ride at the meta tail so the
        # host can memoize TIGHT skeleton caps (the ramped ones are doubled
        # past need, and they size the init word pack + skeleton sorts)
        skel_counts = jnp.stack([nV0, nE0])

        if not with_faces:
            # all control scalars in ONE vector: each separate int() pull
            # costs a ~25 ms tunnel round trip
            meta = jnp.concatenate([
                jnp.stack([n_used, n_ekeep, ovf, nV_pre, nE_live,
                           jnp.int32(0)]), hw, skel_counts])
            return V, OUT, E, jnp.zeros((0, 3), jnp.int32), meta

        # ---- faces stage, fused on device (reference subpoly.py:584-652,
        # geometry.py:455-556): region-group the surviving vertices by sign
        # vector (final sdf column excluded), lex-order + dedup the region
        # rows (np.unique semantics), angular-sort each polygon around the
        # sdf normal at its mean, fan-triangulate.  Output is the triangle
        # index array - the host no longer pulls OUT or runs any region
        # bookkeeping.
        KF = KCAP
        PREPF = 1 << KF

        fvalid = jnp.arange(FVC, dtype=jnp.int32) < n_used
        ovf = ovf | jnp.where(n_used > FVC, OVF_F, 0)
        Vf = V          # compacted straight into the FVC-wide buffer above

        xu2 = preprocess(spec, Vf)
        g_mask, g_off = _grid_region_lut(marks, lut, xu2, eps, lut_k)
        colf = jnp.arange(R_COLS, dtype=jnp.int32)
        # eps-sign trits unpacked from the per-vertex sign/zero words (exact
        # _eps_sign equivalent: zero bit = |out| <= eps, sign bit = out > 0)
        parts_s, parts_z = [], []
        for w in range(NW):
            sh = jnp.arange(min(32 * w + 32, R_COLS) - 32 * w,
                            dtype=jnp.uint32)
            parts_s.append((SBf[w][:, None] >> sh[None, :]) & 1)
            parts_z.append((ZBf[w][:, None] >> sh[None, :]) & 1)
        sb_col = jnp.concatenate(parts_s, axis=1).astype(jnp.int32)
        zb_col = jnp.concatenate(parts_z, axis=1).astype(jnp.int32)
        sgn_f = jnp.where(zb_col > 0, 0, jnp.where(sb_col > 0, 1, -1))
        sgn_f = jnp.where(colf[None, :] < R_COLS - 1, sgn_f, 1)
        allc = jnp.concatenate([g_mask, sgn_f], axis=1)
        is_zero = allc == 0
        kzf = is_zero.sum(-1)
        ovf = ovf | jnp.where((fvalid & (kzf > KF)).any(), OVF_K, 0)
        zrankf = jnp.cumsum(is_zero.astype(jnp.int32), axis=1) - 1
        rows_f = jnp.arange(FVC, dtype=jnp.int32)
        tierBf = fvalid & (kzf > 2)
        fb_lanes, fb_val, n_fb = _compact_lanes(tierBf, HBF)
        ovf = ovf | jnp.where(n_fb > HBF, OVF_F, 0)
        kA1, kA2, kA3, rA = _expand4_keys(allc, g_off,
                                          fvalid & ~tierBf, kzf, rows_f)
        kB1, kB2, kB3, rB = _expand_keys(
            allc[fb_lanes], zrankf[fb_lanes], g_off[fb_lanes], fb_val,
            kzf[fb_lanes], PREPF, KF, fb_lanes)
        k1f = jnp.concatenate([kA1, kB1])
        k2f = jnp.concatenate([kA2, kB2])
        k3f = jnp.concatenate([kA3, kB3])
        rowf = jnp.concatenate([rA, rB])

        sk1, sk2, sk3, srow = jax.lax.sort((k1f, k2f, k3f, rowf), num_keys=3)
        sval2 = sk1 < BIGKEY
        nrep = sk1.shape[0]
        irep = jnp.arange(nrep, dtype=jnp.int32)
        newrun = jnp.concatenate([
            jnp.ones((1,), bool),
            (sk1[1:] != sk1[:-1]) | (sk2[1:] != sk2[:-1])
            | (sk3[1:] != sk3[:-1])])
        rid = jnp.cumsum(newrun.astype(jnp.int32)) - 1
        n_rg = (newrun & sval2).sum().astype(jnp.int32)
        ovf = ovf | jnp.where(n_rg > RGC, OVF_F, 0)
        rids = jnp.where(sval2, rid, RGC)

        # ---- ragged region pipeline: every per-polygon quantity rides the
        # [nrep] replica axis.  Regions average ~3-4 members, so the old
        # dense [RGC, G] member table was ~80% padding and its gathers and
        # row-sorts dominated the faces stage (73 ms for the [RGC, G, 3]
        # point gather alone at the large preset).
        #
        # replica order within a region mirrors the host expansion order
        # (zero-count group, then vertex id; subpoly.py:306-335)
        r2a, r2kz, r2v = jax.lax.sort(
            (rids, kzf[srow], srow), num_keys=3)
        i2 = jnp.arange(nrep, dtype=jnp.int32)
        nr2 = jnp.concatenate([jnp.ones((1,), bool), r2a[1:] != r2a[:-1]])
        is_last2 = jnp.concatenate([r2a[1:] != r2a[:-1],
                                    jnp.ones((1,), bool)])
        valid_rep = r2a < RGC
        rsafe = jnp.clip(r2a, 0, RGC - 1)
        rstart = jax.lax.cummax(jnp.where(nr2, i2, 0))
        krank = i2 - rstart                    # member rank within region
        starts = jnp.zeros(RGC, jnp.int32).at[
            jnp.where(nr2 & valid_rep, r2a, RGC)].max(
            i2, mode="drop", unique_indices=True)
        # exclusive end positions (present regions only; absent -> 0, so
        # cnt = ends1 - starts is 0 there with no extra presence scatter)
        ends1 = jnp.zeros(RGC, jnp.int32).at[
            jnp.where(is_last2 & valid_rep, r2a, RGC)].max(
            i2 + 1, mode="drop", unique_indices=True)
        cnt = jnp.maximum(ends1 - starts, 0)
        gmax = cnt.max().astype(jnp.int32)     # stats only (sizes hw[12])

        # per-region sums ride ONE packed cumsum over the region-sorted
        # replica axis + two [RGC]-row boundary gathers instead of
        # [nrep]-row scatter-adds (the means scatter-add alone measured
        # 52 ms at M=201).  Columns: member vid (i32; wraparound diffs are
        # exact) and the member coordinates in 2^-22 fixed point (|coord|
        # <= canvas 1.2 -> |fix| < 2^23 exact in f32 and i32; segment sums
        # < gcap * 2^23 < 2^31; quantization perturbs each mean by
        # <= 2^-22 ~ 2e-7, the same order as the f32 scatter-add's
        # order-dependent rounding — only angular-sort tie-breaks on
        # sliver polygons can flip, the divergence class the faces parity
        # test already pins)
        ptsr = Vf[jnp.clip(r2v, 0, FVC - 1)] * valid_rep[:, None]
        PFIX = jnp.float32(1 << 22)
        pfix = jnp.rint(ptsr * PFIX).astype(jnp.int32)
        seg1 = jnp.concatenate(
            [jnp.where(valid_rep, r2v, 0)[:, None], pfix], axis=1)
        cum1 = jnp.cumsum(seg1, axis=0)
        e_idx = jnp.clip(ends1 - 1, 0, nrep - 1)
        s_idx = jnp.clip(starts, 0, nrep - 1)
        sums1 = jnp.where((cnt > 0)[:, None],
                          cum1[e_idx] - (cum1 - seg1)[s_idx], 0)
        tsum = sums1[:, 0]
        kdiv = jnp.maximum(cnt, 1)[:, None].astype(jnp.float32)
        means = sums1[:, 1:].astype(jnp.float32) / (PFIX * kdiv)

        # deterministic region ordering + duplicate-row removal (np.unique
        # semantics, subpoly.py:617-620): order regions by a compact key
        # (first four member vids + count + sum) that puts identical member
        # lists adjacent, then exact-compare ADJACENT regions member-by-
        # member in replica space.  Region ORDER therefore differs from the
        # host's np.unique lex order (triangle ordering only; content is
        # deduplicated exactly, same guarantee as the host).
        # members 0..3 sit at CONSECUTIVE replica positions: one row gather
        # of a shifted-window table replaces 4 serialized 1D gathers
        r2v_pad = jnp.concatenate([r2v, jnp.broadcast_to(r2v[-1:], (3,))])
        r2v4 = jnp.stack([r2v_pad[k:k + nrep] for k in range(4)], axis=1)
        mrows = r2v4[jnp.clip(starts, 0, nrep - 1)]

        def member_k(k):
            return jnp.where(cnt > k, mrows[:, k], -1)
        guard = jnp.where(cnt > 0, 0, jnp.int32(BIGKEY))
        rar = jnp.arange(RGC, dtype=jnp.int32)
        sorted_ops = jax.lax.sort(
            (guard, member_k(0), member_k(1), member_k(2), member_k(3),
             cnt, tsum, rar), num_keys=7)
        rord = sorted_ops[-1]                  # output rank j -> region id
        jrank = jnp.zeros(RGC, jnp.int32).at[rord].set(
            rar, unique_indices=True)          # region id -> output rank j
        prev_rid = jnp.concatenate([rord[:1], rord[:-1]])[jrank]
        pstart = starts[prev_rid]
        pcnt = cnt[prev_rid]
        # replica (region, k) checks member k of the region one output rank
        # earlier; a region is a duplicate iff counts match and no member
        # mismatches (segment-AND via a mismatch-count scatter)
        ppos = jnp.clip(pstart[rsafe] + krank, 0, nrep - 1)
        mism = valid_rep & (r2v != r2v[ppos])
        # sorted-segment count (same boundary-gather trick as cnt/tsum)
        cumm = jnp.cumsum(mism.astype(jnp.int32))
        neq = jnp.where(cnt > 0,
                        cumm[e_idx] - cumm[s_idx]
                        + mism[s_idx].astype(jnp.int32), 0)
        dup_rg = (jrank > 0) & (cnt > 0) & (cnt == pcnt) & (neq == 0)
        keep_rg = (cnt >= 3) & ~dup_rg

        # mean point + sdf normal per region (subpoly.py:627-635); the
        # normal rides three shared-primal jvps (same vjp-SIGILL avoidance
        # and cost argument as _sdf_dist_grad: the primal's table gathers
        # are CSE'd once, the tangents are arithmetic-only) — sdf = tanh of
        # the last column, so grad = (1 - sdf^2) * dcol/dq
        fm = lambda w: net_outputs(spec, params, w)
        out_m, fm_lin = jax.linearize(fm, means)
        tangs = []
        for dax in range(3):
            em = jnp.zeros_like(means).at[:, dax].set(1.0)
            tangs.append(fm_lin(em)[:, -1])
        sd_m = jnp.tanh(out_m[:, -1])
        normals = jnp.stack(tangs, -1) * (1.0 - sd_m * sd_m)[:, None]

        # angular score per replica (geometry.py:483-514), relative to the
        # region's FIRST member (the dense row-sort's u[:, :1])
        u = ptsr - means[rsafe]
        u0 = u[rstart]
        dcr = jnp.cross(u0, u)
        nrm = jnp.linalg.norm(u, axis=-1)
        denom = jnp.maximum(nrm[rstart] * nrm, 1e-8)
        cosb = (u0 * u).sum(-1) / denom
        dn = (dcr * normals[rsafe]).sum(-1)
        score = cosb * ((dn >= 0) * 2.0 - 1.0) + (dn < 0) * 2.0

        # one global stable sort groups replicas by output region rank and
        # angle-sorts within each region (ties keep the (zero-count, vid)
        # member order, like the dense stable row-sort did)
        jkey_rid = jnp.where(keep_rg, jrank, jnp.int32(RGC))
        jkey = jnp.where(valid_rep, jkey_rid[rsafe], jnp.int32(RGC))
        jk_s, _, vid_s = jax.lax.sort((jkey, -score, r2v), num_keys=2,
                                      is_stable=True)

        # duplicate-vid removal keeping the first occurrence in angle order
        # (tensor_to_triangle_faces, subpoly.py:700-728): sort by (region,
        # vid, angle-pos), flag adjacent repeats, scatter the flag back to
        # angle order
        apos = jnp.arange(nrep, dtype=jnp.int32)
        vkey = jnp.where(jk_s < RGC, vid_s, jnp.int32(BIGKEY))
        jk2, vk2, ap2 = jax.lax.sort((jk_s, vkey, apos), num_keys=3)
        dup2 = jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            ((jk2[1:] == jk2[:-1]) & (vk2[1:] == vk2[:-1])
             & (vk2[1:] < BIGKEY)).astype(jnp.int32)])
        dup_back = jnp.zeros(nrep, jnp.int32).at[ap2].set(
            dup2, unique_indices=True)
        valid3 = (jk_s < RGC) & (dup_back == 0)

        # rank among the region's surviving members + left-compaction into
        # a [nrep] buffer ordered by (output region rank, angle rank)
        v3i = valid3.astype(jnp.int32)
        csv = jnp.cumsum(v3i)
        newj = jnp.concatenate([jnp.ones((1,), bool), jk_s[1:] != jk_s[:-1]])
        jstart = jax.lax.cummax(jnp.where(newj, apos, 0))
        rank3 = csv - (csv - v3i)[jstart] - 1
        cnt2 = jnp.zeros(RGC, jnp.int32).at[
            jnp.where(valid3, jk_s, RGC)].add(1, mode="drop")  # j space
        ntri = jnp.clip(cnt2 - 2, 0, None)
        base2 = jnp.cumsum(cnt2) - cnt2
        cpos = base2[jnp.clip(jk_s, 0, RGC - 1)] + rank3
        cvid = jnp.zeros(nrep, jnp.int32).at[
            jnp.where(valid3, jnp.clip(cpos, 0, nrep - 1), nrep)].set(
            vid_s, mode="drop", unique_indices=True)

        # fan-triangle slot assignment (same prefix-sum/cummax trick as the
        # pair stage), winding reversed to outward (faces.py:140-142)
        cumt = jnp.cumsum(ntri)
        total_t = cumt[-1]
        ovf = ovf | jnp.where(total_t > TC, OVF_F, 0)
        starts_t = cumt - ntri
        marker_t = jnp.zeros(TC, jnp.int32).at[
            jnp.where(ntri > 0, starts_t, TC)].max(
            rar, mode="drop", unique_indices=True)
        sit = jax.lax.cummax(marker_t)
        slot_t = jnp.arange(TC, dtype=jnp.int32)
        # starts_t/base2 ride one packed row gather at sit; vb_/vc_ sit at
        # CONSECUTIVE positions so they ride one row gather of a
        # next-neighbor pair table (_split_w6 rationale)
        stt = jnp.stack([starts_t, base2], axis=1)[sit]
        ot = slot_t - stt[:, 0]
        t_valid = slot_t < total_t
        cb = stt[:, 1]
        cvid2 = jnp.stack(
            [cvid, jnp.concatenate([cvid[1:], cvid[-1:]])], axis=1)
        va_ = cvid[jnp.clip(cb, 0, nrep - 1)]
        vbc = cvid2[jnp.clip(cb + ot + 1, 0, nrep - 1)]
        vb_ = vbc[:, 0]
        vc_ = vbc[:, 1]
        if (FVC - 1).bit_length() <= 18:
            # 2-word packed triangles (vids are < FVC <= 2^18); the host
            # detects the u32[:, 2] shape and unpacks exactly
            p0, p1 = _pack_tri_words(vc_, vb_, va_)
            tris = jnp.where(t_valid[:, None],
                             jnp.stack([p0, p1], axis=-1), 0)
        else:
            tris = jnp.where(t_valid[:, None],
                             jnp.stack([vc_, vb_, va_], axis=-1), 0)

        hwf = jnp.stack([jnp.int32(0)] * 7
                        + [n_used, n_fb, n_rg, total_t, jnp.int32(0), gmax]
                        + [jnp.int32(0)] * 3)
        hw = jnp.maximum(hw, hwf)
        meta = jnp.concatenate([
            jnp.stack([n_used, n_ekeep, ovf, nV_pre, nE_live, total_t]), hw,
            skel_counts])
        return V, OUT, E, tris, meta

    if not with_skeleton:
        @jax.jit
        def extract(params, marks, V0, OUT0, E0, nV0, nE0):
            return _run(params, marks, V0, OUT0, E0,
                        jnp.int32(nV0), jnp.int32(nE0), jnp.int32(0))

        return extract

    # --- fused variant: skeleton + subdivision in ONE program --------------
    # (steady-state path once caps are known: saves the skeleton dispatch,
    # the pool-padding dispatch and their tunnel round trips)
    M = marks_len
    use_slab = M > 128 or M ** 3 * R_COLS * 4 > 2 ** 30
    S = min(16, M)
    n_slabs = -(-M // S)

    @jax.jit
    def extract_fused(params, marks):
        if not use_slab:
            V0, OUT0, E0, nV0, nE0, ovf0 = _skel_single_block(
                spec, params, marks, M, eps, skel_mode, dist_k, VCAP, ECAP)
        else:
            V0, OUT0, E0, nV0, nE0, ovf0 = _skel_slab(
                spec, params, marks, M, S, n_slabs, eps, skel_mode, dist_k,
                VCAP, ECAP)
        return _run(params, marks, V0, OUT0, E0, nV0, nE0, ovf0)

    return extract_fused


def _round_up(n: int, m: int = 8192) -> int:
    return ((int(n) + m - 1) // m) * m


def _edges_from_sgn(sgn, M: int, keepv=None):
    """Axis-major lattice edge masks from the sign lattice [M,M,M,R] — the
    exact emission order of the host grid_skeleton (single chunk) so every
    skeleton variant yields bit-identical edge ordering.

    ``keepv`` ([M,M,M] bool, distance mode) additionally requires both edge
    endpoints to pass the Lipschitz distance bound (reference
    tropical.py:113-138); the sign-difference test stays AND-ed in because an
    edge whose endpoints share every neuron sign never splits and is pruned
    by the loop's future-sign prune anyway (see tests/test_skeleton_modes.py
    — both prunings yield the identical final mesh)."""
    ax = jnp.arange(M, dtype=jnp.int32)
    gx, gy, gz = jnp.meshgrid(ax, ax, ax, indexing="ij")
    serial = (gx * M * M + gy * M + gz).astype(jnp.int32)
    masks, e_a, e_b = [], [], []
    for axis in range(3):
        sl_a = tuple(slice(1, None) if d == axis else slice(None)
                     for d in range(3))
        sl_b = tuple(slice(None, -1) if d == axis else slice(None)
                     for d in range(3))
        m = (sgn[sl_a] != sgn[sl_b]).any(-1)
        if keepv is not None:
            m = m & keepv[sl_a] & keepv[sl_b]
        masks.append(m.reshape(-1))
        e_a.append(serial[sl_a].reshape(-1))
        e_b.append(serial[sl_b].reshape(-1))
    return (jnp.concatenate(masks), jnp.concatenate(e_a),
            jnp.concatenate(e_b))


def _sdf_dist_grad(spec: NetSpec, params, world):
    """(outputs [N,R], |sdf| [N], |grad sdf| [N]): the sdf is tanh of the
    last gathered column, so its gradient is (1 - sdf^2) * dcol/dx.

    dcol/dx comes from three forward-mode jvps (one per axis; the shared
    primal is CSE'd by XLA) rather than one vjp: fusing a vjp's backward
    pass with any consumer reduction crashes the TPU compiler's priority
    fusion pass (SIGILL in TpuPriorityFusionQueue::NormalizedComputationCost,
    measured on v5e libtpu 2026-08-17 — standalone vjp compiles fine, vjp +
    reduce does not), and the tangent passes of this small MLP are cheap."""
    f = lambda w: net_outputs(spec, params, w)
    # linearize, not three jvp calls: each jax.jvp re-traces the primal and
    # XLA does NOT CSE the duplicated encode gathers across them (measured:
    # 3x the gather fusions at M=201); linearize evaluates the primal once
    # and the three tangent calls reuse its residuals
    out, f_lin = jax.linearize(f, world)
    tangents = []
    for d in range(3):
        e = jnp.zeros_like(world).at[:, d].set(1.0)
        tangents.append(f_lin(e)[:, -1])
    gl = jnp.stack(tangents, axis=-1)
    sd = jnp.tanh(out[:, -1])
    gn = jnp.linalg.norm(gl, axis=-1) * (1.0 - sd * sd)
    return out, jnp.abs(sd), gn


# the skeleton's lattice forward: factored dense-level interpolation
# (encode_lattice) unless disabled; flip to "0" to fall back to the
# pointwise-gather forward for A/B or bit-for-bit debugging vs hosts
_USE_LATTICE_ENC = os.environ.get("TROPICAL_LATTICE_ENC", "1") != "0"


def _sdf_dist_grad_lattice(spec: NetSpec, params, xw, yw, zw, tables=None):
    """Lattice-forward variant of :func:`_sdf_dist_grad`: the three axis
    tangents ride jvp through :func:`net_outputs_lattice`, whose dense-level
    tangents are einsums against the weight-derivative matrices — no extra
    gathers (same vjp-SIGILL avoidance as the pointwise variant)."""
    f = lambda a, b, c: net_outputs_lattice(spec, params, a, b, c,
                                            tables=tables)
    # linearize for the same no-CSE reason as _sdf_dist_grad: one primal,
    # three residual-reusing tangent calls
    out, f_lin = jax.linearize(f, xw, yw, zw)
    tangents = []
    for d in range(3):
        t3 = [jnp.zeros_like(xw), jnp.zeros_like(yw), jnp.zeros_like(zw)]
        t3[d] = jnp.ones_like(t3[d])
        tangents.append(f_lin(*t3)[:, -1])
    gl = jnp.stack(tangents, axis=-1)
    sd = jnp.tanh(out[:, -1])
    gn = jnp.linalg.norm(gl, axis=-1) * (1.0 - sd * sd)
    return out, jnp.abs(sd), gn


def _lipschitz_keepv(dist, gnorm, marks, k: int):
    """Per-vertex distance-bound keep mask (reference _skeleton_dist,
    tropical.py:113-138: keep if |sdf| <= sqrt(3)*2*max_cell*max_grad) with a
    LOCAL gradient bound: |grad sdf| max-pooled over the (2k+1)^3 lattice
    neighborhood whose world extent covers the bound's reach (k computed
    host-side by :func:`_dist_pool_k`).  The reference takes max_grad over a
    whole 128^3 chunk (tropical.py:190-195), which for saturating tanh SDFs
    degenerates to the global max and prunes almost nothing; the local pool
    is the same bound evaluated over the only region the edge can reach.
    k <= 0 falls back to the reference's global max."""
    if k <= 0:
        gmax = jnp.full_like(gnorm, gnorm.max())
    else:
        gmax = gnorm
        for ax in range(3):
            wd = [1, 1, 1]
            wd[ax] = 2 * k + 1
            gmax = jax.lax.reduce_window(
                gmax, -jnp.inf, jax.lax.max, tuple(wd), (1, 1, 1), "SAME")
    bound = np.sqrt(3.0) * 2.0 * jnp.max(jnp.diff(marks)) * gmax
    return dist <= bound


def _dist_pool_k(marks) -> int:
    """Index-space pooling radius covering the Lipschitz bound's world reach
    sqrt(3)*2*max_cell from any lattice plane (marks may be non-uniform).
    Returns 0 (= global-max fallback) if the union lattice is so non-uniform
    that a local window would have to span >16 planes."""
    mk = np.asarray(marks, np.float64)
    if mk.size < 2:
        return 0
    reach = np.sqrt(3.0) * 2.0 * np.diff(mk).max()
    lo = np.searchsorted(mk, mk - reach, side="left")
    hi = np.searchsorted(mk, mk + reach, side="right") - 1
    i = np.arange(mk.size)
    k = int(max((i - lo).max(), (hi - i).max()))
    return k if k <= 16 else 0


def _skel_single_block(spec: NetSpec, params, marks, M: int, eps: float,
                       mode: str, dist_k: int, SV: int, SE: int):
    """Whole-lattice skeleton body (float outputs fit HBM)."""
    if _USE_LATTICE_ENC:
        aw = marks * (spec.scale * 2) - spec.scale
        if mode == "dist":
            out, dq, gn = _sdf_dist_grad_lattice(spec, params, aw, aw, aw)
            keepv = _lipschitz_keepv(dq.reshape(M, M, M),
                                     gn.reshape(M, M, M), marks, dist_k)
        else:
            out = net_outputs_lattice(spec, params, aw, aw, aw)
            keepv = None
    else:
        ax = jnp.arange(M, dtype=jnp.int32)
        gx, gy, gz = jnp.meshgrid(ax, ax, ax, indexing="ij")
        xu = jnp.stack([jnp.take(marks, g.reshape(-1), axis=0)
                        for g in (gx, gy, gz)], axis=-1)
        world = xu * (spec.scale * 2) - spec.scale
        if mode == "dist":
            out, dq, gn = _sdf_dist_grad(spec, params, world)
            keepv = _lipschitz_keepv(dq.reshape(M, M, M),
                                     gn.reshape(M, M, M), marks, dist_k)
        else:
            out = net_outputs(spec, params, world)
            keepv = None
    sgn = _eps_sign(out, eps).astype(jnp.int8).reshape(M, M, M, R_COLS)
    mask, ea, eb = _edges_from_sgn(sgn, M, keepv)
    return _squeeze_edges(spec, mask, ea, eb, M, SV, SE,
                          lattice_out=out, marks=marks)


def _skel_slab(spec: NetSpec, params, marks, M: int, S: int, n_slabs: int,
               eps: float, mode: str, dist_k: int, SV: int, SE: int):
    """Slab-chunked skeleton body: stores the int8 sign lattice (plus, in
    distance mode, two [M,M,M] f32 planes for |sdf| and |grad|) and — when
    it fits comfortably in HBM — the full f32 output lattice, so the
    squeeze stage gathers surviving vertices' OUT rows instead of paying a
    second pointwise forward over them (~140 ms at M=201)."""
    SGN = jnp.zeros((M, M, M, R_COLS), jnp.int8)
    # 1.07 GB at M=201; transient (dead after squeeze).  Past ~4 GB fall
    # back to the recompute path.
    keep_out = M ** 3 * R_COLS * 4 <= 4 * 2 ** 30
    OUTL = (jnp.zeros((M * M * M, R_COLS), jnp.float32)
            if keep_out else None)

    # corner-value grids hoisted out of the slab loop (measured: XLA's LICM
    # left the K^3 grid gather inside the fori_loop body — one full gather
    # per slab instead of one per run)
    tables = (lattice_tables(spec.grid, params["table"], M ** 3)
              if _USE_LATTICE_ENC else None)

    if mode == "dist":
        DQ = jnp.zeros((M, M, M), jnp.float32)
        GR = jnp.zeros((M, M, M), jnp.float32)

        def body(si, carry):
            SGN, OUTL, DQ, GR = carry
            x0 = jnp.minimum(si * S, M - S)
            xs = x0 + jnp.arange(S, dtype=jnp.int32)
            mk_x = jnp.take(marks, xs, axis=0, mode="clip")
            if _USE_LATTICE_ENC:
                out, dq, gn = _sdf_dist_grad_lattice(
                    spec, params,
                    mk_x * (spec.scale * 2) - spec.scale,
                    marks * (spec.scale * 2) - spec.scale,
                    marks * (spec.scale * 2) - spec.scale, tables=tables)
            else:
                gx, gy, gz = jnp.meshgrid(mk_x, marks, marks, indexing="ij")
                pts = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
                world = pts * (spec.scale * 2) - spec.scale
                out, dq, gn = _sdf_dist_grad(spec, params, world)
            sg = _eps_sign(out, eps).astype(jnp.int8).reshape(
                S, M, M, R_COLS)
            SGN = jax.lax.dynamic_update_slice(SGN, sg, (x0, 0, 0, 0))
            if OUTL is not None:
                OUTL = jax.lax.dynamic_update_slice(
                    OUTL, out.reshape(S * M * M, R_COLS), (x0 * M * M, 0))
            DQ = jax.lax.dynamic_update_slice(
                DQ, dq.reshape(S, M, M), (x0, 0, 0))
            GR = jax.lax.dynamic_update_slice(
                GR, gn.reshape(S, M, M), (x0, 0, 0))
            return SGN, OUTL, DQ, GR

        SGN, OUTL, DQ, GR = jax.lax.fori_loop(
            0, n_slabs, body, (SGN, OUTL, DQ, GR))
        keepv = _lipschitz_keepv(DQ, GR, marks, dist_k)
    else:
        def body(si, carry):
            SGN, OUTL = carry
            x0 = jnp.minimum(si * S, M - S)
            xs = x0 + jnp.arange(S, dtype=jnp.int32)
            mk_x = jnp.take(marks, xs, axis=0, mode="clip")
            if _USE_LATTICE_ENC:
                o = net_outputs_lattice(
                    spec, params,
                    mk_x * (spec.scale * 2) - spec.scale,
                    marks * (spec.scale * 2) - spec.scale,
                    marks * (spec.scale * 2) - spec.scale, tables=tables)
            else:
                gx, gy, gz = jnp.meshgrid(mk_x, marks, marks, indexing="ij")
                pts = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
                world = pts * (spec.scale * 2) - spec.scale
                o = net_outputs(spec, params, world)
            sg = _eps_sign(o, eps).astype(jnp.int8).reshape(
                S, M, M, R_COLS)
            SGN = jax.lax.dynamic_update_slice(SGN, sg, (x0, 0, 0, 0))
            if OUTL is not None:
                OUTL = jax.lax.dynamic_update_slice(
                    OUTL, o.reshape(S * M * M, R_COLS), (x0 * M * M, 0))
            return SGN, OUTL

        SGN, OUTL = jax.lax.fori_loop(0, n_slabs, body, (SGN, OUTL))
        keepv = None

    mask, ea, eb = _edges_from_sgn(SGN, M, keepv)
    return _squeeze_edges(spec, mask, ea, eb, M, SV, SE,
                          lattice_out=OUTL, params=params, marks=marks)


def _squeeze_edges(spec, mask, ea, eb, M: int, SV: int, SE: int,
                   lattice_out=None, params=None, marks=None):
    """Compact lattice edges + vertices used by them (squeeze_edges,
    reference tropical.py:211-222).  Per-vertex outputs come from the full
    lattice array when available, else are recomputed with a forward pass
    over the compacted vertices (when the float lattice would not fit HBM).
    MEASURED (round 5): splitting the [SV, R] row gather into R
    single-column gathers from a transposed [R, M^3] lattice was 5x SLOWER
    on the v5e (40.7 -> 213 ms at M=201) — the ROADMAP multi-column-gather
    lesson applies to PACKED index gathers, not this row gather, which the
    TPU emitter already handles at ~2 ns/element.  Keep the row gather."""
    lanes, val, n_edges = _compact_lanes(mask, SE)
    ovf = jnp.where(n_edges > SE, jnp.int32(OVF_E), 0)
    # one [n, 2] row gather instead of two 1D gathers (_split_w6 rationale)
    eab = jnp.stack([ea, eb], axis=1)[lanes]
    ea_c = jnp.where(val, eab[:, 0], 0)
    eb_c = jnp.where(val, eab[:, 1], 0)

    used = jnp.zeros(M * M * M, bool)
    used = used.at[jnp.where(val, ea_c, M * M * M)].set(True, mode="drop")
    used = used.at[jnp.where(val, eb_c, M * M * M)].set(True, mode="drop")
    new_index = jnp.cumsum(used.astype(jnp.int32)) - 1
    vlanes, vval, n_verts = _compact_lanes(used, SV)
    ovf = ovf | jnp.where(n_verts > SV, jnp.int32(OVF_V), 0)

    # serial id -> unit-cube coords -> world
    vx = vlanes // (M * M)
    vy = (vlanes // M) % M
    vz = vlanes % M
    xu = jnp.stack([jnp.take(marks, g, axis=0, mode="clip")
                    for g in (vx, vy, vz)], axis=-1)
    world = xu * (spec.scale * 2) - spec.scale
    V = jnp.where(vval[:, None], world, 0)
    if lattice_out is not None:
        OUT = jnp.where(vval[:, None], lattice_out[vlanes], 0)
    else:
        OUT = jnp.where(vval[:, None],
                        net_outputs(spec, params, world), 0)
    E = jnp.stack([new_index[ea_c], new_index[eb_c]], axis=-1)
    E = jnp.where(val[:, None], E, 0)
    return V, OUT, E, n_verts, n_edges, ovf


def make_skeleton_fn(spec: NetSpec, skel_caps: tuple, marks_len: int,
                     eps: float, mode: str = "sign", dist_k: int = 0):
    """On-device initial skeleton into (SV, SE)-capped buffers — no host
    round-trip for the lattice outputs.

    Reference semantics: tropical.py:81-111 (sign mode) / :113-138 (distance
    mode, with the slab-local gradient bound of :func:`_lipschitz_keepv`)
    + :211-223 (squeeze_edges); single-block variant for lattices whose
    float outputs fit HBM (marks_len^3 * R * 4 bytes; up to ~medium
    configs).  Larger lattices use :func:`make_slab_skeleton_fn`.
    """
    SV, SE = skel_caps
    M = marks_len

    @jax.jit
    def skeleton(params, marks):
        return _skel_single_block(spec, params, marks, M, eps, mode, dist_k,
                                  SV, SE)

    return skeleton


def make_slab_skeleton_fn(spec: NetSpec, skel_caps: tuple, marks_len: int,
                          eps: float, slab: int = 16, mode: str = "sign",
                          dist_k: int = 0):
    """Slab-chunked device skeleton for lattices too big to hold float
    outputs in HBM (marks > 128, e.g. the large preset's M~201 where the
    full [M^3, R] float lattice is ~1 GiB).

    A fori_loop sweeps x-slabs, storing only the int8 sign lattice
    ([M^3, R] bytes, ~268 MB at M=201); edge extraction then runs globally
    in the same axis-major order as the single-block variant, so vertex and
    edge ordering are bit-identical.  Per-vertex float outputs are
    recomputed for the compacted vertex set only.
    """
    SV, SE = skel_caps
    M = marks_len
    S = min(slab, M)
    n_slabs = -(-M // S)

    @jax.jit
    def skeleton(params, marks):
        return _skel_slab(spec, params, marks, M, S, n_slabs, eps, mode,
                          dist_k, SV, SE)

    return skeleton


def default_skel_caps(marks_len: int, mode: str = "sign") -> tuple:
    """Initial-skeleton buffer sizes from the lattice resolution.  Sign-mode
    skeleton edges measured at ~39-51*M^2 (sphere small/medium); 64*M^2
    gives headroom, with overflow-flag retries doubling on miss.  Distance
    mode keeps only a few-cell shell around the surface (~12-25x fewer,
    measured sphere small/large), so it starts at a quarter of that."""
    n = _round_up((16 if mode == "dist" else 64) * marks_len * marks_len)
    return (n, n)


def _pow2(n: int, minimum: int = 1024) -> int:
    n = max(int(n), minimum)
    return 1 << (n - 1).bit_length()


def default_caps(n_vertices: int, n_edges: int) -> Caps:
    """Caps sized from the initial skeleton.  Both pools track the LIVE
    working set (edges and vertices are compacted every prune; live peaks
    measured at ~1.2x the skeleton size, plus one step's append blocks);
    per-step buffers come from the observed workload shape (SURVEY-derived
    stats: splits per step <= ~6% of edges, zeros per vertex <= 4, region
    size <= 18).  Sizes are 8192-multiples, not powers of two — every
    buffer lane costs real work each step, so tight beats round."""
    ccap = _round_up(max(n_edges // 3, 8192))
    conncap = _round_up(max(ccap, 32768))
    vcap = _round_up(int(n_vertices * 1.4) + 4 * ccap)
    ecap = _round_up(int(n_edges * 1.3) + 2 * ccap + 2 * conncap)
    return Caps(vcap=vcap, ecap=ecap, ccap=ccap,
                hcap=_round_up(max(ccap // 4, 2048), 2048),
                pcap=_round_up(max(10 * ccap, 131072)), conncap=conncap)


_EXTRACT_CACHE: dict = {}
# fused programs whose compile failed (e.g. HBM exhaustion at very large
# caps): skip further attempts — each failed remote compile costs minutes
_FUSED_BROKEN: set = set()
# caps that succeeded for a (spec, problem-size bucket): subsequent
# extractions skip the overflow-retry ramp entirely
_GOOD_CAPS: dict = {}
# skeleton buffer caps that succeeded per (spec, marks, eps)
_SKEL_CAPS: dict = {}

# --- cross-process caps persistence ---------------------------------------
# A fresh process normally pays TWO big XLA compiles (the default-caps ramp
# program, then the tight-caps program memoized from its high-water marks).
# Persisting the tight caps lets the next process compile the final program
# directly — the committed cache file seeds known configs (e.g. the bench).
_CAPS_FILE = __import__("os").environ.get(
    "TROPICAL_CAPS_FILE",
    __import__("os").path.join(
        __import__("os").path.dirname(__file__), "caps_cache.json"))
_CAPS_LOADED = False


def _caps_token(spec: NetSpec, tail: str) -> str:
    return (f"{spec.num_layers}x{spec.num_hidden}-L{spec.levels}"
            f"F{spec.features}-r{spec.r_min}-{spec.r_max}-T{spec.T}"
            f"-eps{spec.eps}-{tail}")


def _net_digest(net) -> str:
    """4-byte hex digest of the net's weights (a slice of the hash table).

    Caps are learned per *checkpoint*, not per architecture: two nets that
    share a spec (e.g. the sphere and torus small models) need different
    pool shapes, and a spec-level key would let one overwrite the other's
    tight caps — costing the loser a fresh XLA compile next run.  Hashing
    64 table rows is checkpoint-specific (training always updates the
    table) and pulls <2 KB from the device, once per net object.
    """
    dg = getattr(net, "_caps_digest", None)
    if dg is None:
        import hashlib

        tb = np.asarray(jax.device_get(net.params["table"][:64]), np.float32)
        dg = hashlib.blake2s(tb.tobytes(), digest_size=4).hexdigest()
        try:
            net._caps_digest = dg
        except AttributeError:
            pass
    return dg


_PERSISTED: dict = {"good": {}, "skel": {}}


def _load_persisted_caps() -> None:
    global _CAPS_LOADED
    if _CAPS_LOADED:
        return
    _CAPS_LOADED = True
    import json
    import os

    if not os.path.exists(_CAPS_FILE):
        return
    try:
        with open(_CAPS_FILE) as fh:
            data = json.load(fh)
    except (OSError, ValueError):
        return
    for k, v in data.get("good", {}).items():
        c = Caps(**v)
        # never adopt entries with zero-sized pools (caches written before
        # the ccap floor could hold them; a 0-cap buffer is a trace error)
        if min(c.vcap, c.ecap, c.ccap, c.hcap, c.pcap, c.conncap) > 0:
            _PERSISTED["good"][k] = c
    for k, v in data.get("skel", {}).items():
        _PERSISTED["skel"][k] = tuple(v)


def _persist_caps() -> None:
    import dataclasses
    import json
    import os
    import tempfile

    data = {"good": {k: dataclasses.asdict(v)
                     for k, v in _PERSISTED["good"].items()},
            "skel": {k: list(v) for k, v in _PERSISTED["skel"].items()}}
    try:
        # merge-on-write: concurrent processes (bench + tests + ad-hoc runs)
        # each hold only their own view; a wholesale rewrite would drop keys
        # another process persisted since this one loaded the file
        try:
            with open(_CAPS_FILE) as fh:
                on_disk = json.load(fh)
        except (OSError, ValueError):
            on_disk = {}
        for sec in ("good", "skel"):
            merged = dict(on_disk.get(sec, {}))
            merged.update(data[sec])
            data[sec] = merged
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(_CAPS_FILE))
        with os.fdopen(fd, "w") as fh:
            json.dump(data, fh, indent=1, sort_keys=True)
        os.replace(tmp, _CAPS_FILE)
    except OSError:
        pass


def _evict_stale_programs(keep: int = 2) -> None:
    """Keep at most ``keep`` compiled programs per (family minus caps) —
    every overflow-retry compiles a fresh multi-second XLA program keyed by
    its full Caps tuple (or skeleton/pool size tuples), and without eviction
    the ramp's intermediate programs live forever (real memory at large
    caps)."""
    by_family: dict = {}
    for k in _EXTRACT_CACHE:
        fam = tuple(x for x in k
                    if not (isinstance(x, (Caps, tuple))
                            or (isinstance(x, int) and not isinstance(x, bool))))
        by_family.setdefault(fam, []).append(k)
    for keys in by_family.values():
        for k in keys[:-keep]:  # dicts are insertion-ordered: oldest first
            del _EXTRACT_CACHE[k]


def device_engine_supports(net) -> bool:
    """The fused engine hard-codes R_COLS=33 sign columns and packs grid-cell
    offsets into 9-bit fields (valid only for len(marks) <= 511); any other
    net must take the host engine (which is shape-generic)."""
    r = (net.num_layers - 1) * net.num_hidden + 1
    return r == R_COLS and int(net.marks.shape[0]) <= 511


def _start_host_copy(*arrays):
    """Queue d2h copies without blocking (they start the moment each array's
    producing program finishes).  Over the ~40 MB/s dev tunnel this both
    pipelines the transfers behind one another and removes the dispatch
    round-trip a later blocking ``np.asarray`` would otherwise pay."""
    for a in arrays:
        try:
            a.copy_to_host_async()
        except Exception:  # backend without async copies: asarray will block
            pass


# start full-buffer d2h pulls of the (tight-caps) V/tris outputs as soon as
# the fused program is dispatched, iff the padded buffers are small enough
# that the padding tax beats the saved round-trips.  16 MB ~ 0.4 s worst
# case on the tunnel; with memoized tight caps the padding is ~20%.
_PREFETCH_BYTES = 16 * 2 ** 20


def subpoly_device(net, d: int = 3, size: float = 1.2, eps: float = 1e-4,
                   verbose: bool = True, caps: Caps | None = None,
                   force: bool = True, skeleton_mode: str = "auto",
                   mesh=None):
    """Drop-in fast path for ``subpoly``; force=False enables the exact
    bi-/tri-linear intersection path.

    ``mesh``: a multi-device ``jax.sharding.Mesh`` routes the initial
    skeleton's lattice forward over the mesh's ``dp`` axis (the pipeline's
    embarrassingly parallel stage — `skeleton_sharded`); the insertion loop
    and faces epilogue stay single-chip per the DESIGN.md crossover
    analysis.  The funnel is identical to single-chip (tests/test_parallel).

    ``skeleton_mode``: "dist" (default via "auto"; overridable with the
    TROPICAL_SKEL_MODE env var) starts from the Lipschitz-distance-pruned
    lattice (reference PRUNING_MODE default, tropical.py:188) with the
    slab-local gradient bound — a ~4-20x smaller start set than "sign",
    which in turn sizes every pool the loop touches.  Both modes yield the
    identical final mesh (tests/test_skeleton_modes.py,
    tests/test_device_dist_skeleton.py).

    Returns (faces [T,3,3], vertices [V,3], triangles [T,3]).  Retries with
    enlarged caps if any capacity overflowed.
    """
    global LAST_HW
    import os

    from tropical.extract.faces import extract_faces
    from tropical.extract.skeleton import get_hypercube

    if not device_engine_supports(net):
        raise ValueError(
            f"device engine supports only {R_COLS}-column nets with <=511 "
            f"marks (got {(net.num_layers - 1) * net.num_hidden + 1} cols, "
            f"{int(net.marks.shape[0])} marks); use engine='host'")

    mode = skeleton_mode
    if mode == "auto":
        mode = os.environ.get("TROPICAL_SKEL_MODE", "dist")
    assert mode in ("sign", "dist"), mode

    M = int(net.marks.shape[0])
    _load_persisted_caps()
    dg = _net_digest(net)
    mtag = f"M{M}" if mode == "sign" else f"M{M}-{mode}"
    size_key = (net.spec, M, force, mode, dg)
    size_tok = _caps_token(net.spec, f"{mtag}-f{int(force)}-e{eps}-n{dg}")
    # legacy spec-level key: read-only seed for caches written before caps
    # were keyed per checkpoint (writes always go to the digested key)
    size_tok_legacy = _caps_token(net.spec, f"{mtag}-f{int(force)}-e{eps}")
    caps = (caps or _GOOD_CAPS.get(size_key)
            or _PERSISTED["good"].get(size_tok)
            or _PERSISTED["good"].get(size_tok_legacy))

    # max marks per uniform LUT cell (exactness bound for the fast
    # grid-region lookup)
    mk_np = np.asarray(net.marks)
    lut_k = max(1, int(np.bincount(
        np.clip((mk_np * LUTN).astype(np.int64), 0, LUTN - 1),
        minlength=LUTN).max()))
    dist_k = _dist_pool_k(mk_np) if mode == "dist" else 0

    def _memoize_tight(hw, used_caps, n_final):
        # memoize *tight* caps from the run's high-water marks rather than
        # whatever the overflow-retry ramp landed on — every padded lane
        # costs real work each step
        (hws, hwh, hwp, hwc, hwv, hwe, hwb,
         hwfv, hwfb, hwrg, hwt, hwcv, hwg) = (
            int(x) for x in np.asarray(hw)[:13])  # [13:16] are diagnostics
        # floor at one block: a degenerate run (e.g. an undertrained SDF
        # whose zero set barely enters the canvas) can record hws == 0, and
        # a persisted ccap=0 would poison every later net of the same spec
        # with zero-sized candidate buffers (gather trace error)
        ccap_t = max(_round_up(int(hws * 1.15), 4096), 4096)
        conncap_t = _round_up(int(hwc * 1.15) + 4096)
        # faces-stage caps: from this run's counts when the fused faces
        # epilogue ran (hwfv > 0), else seeded from the final vertex count
        fv = hwfv if hwfv > 0 else n_final
        derived = Caps(
            # pools need headroom for one step's append blocks on top of
            # the high-water (the overflow checks use ECAP-CCAP etc.)
            vcap=_round_up(int(hwv * 1.05) + ccap_t + 8192),
            ecap=_round_up(int(hwe * 1.05) + ccap_t + conncap_t + 8192),
            ccap=ccap_t,
            hcap=_round_up(int(hwh * 1.3) + 512, 2048),
            pcap=_round_up(int(hwp * 1.15) + 4096),
            kcap=used_caps.kcap, wcap=used_caps.wcap,
            conncap=conncap_t,
            # each tier-B row costs 2^kcap pair-window lanes: keep tight
            hb=_round_up(int(hwb * 1.3) + 128, 256),
            fvcap=_round_up(int(fv * 1.2) + 4096),
            rgcap=_round_up(int((hwrg if hwrg > 0 else fv * 1.1) * 1.25)
                            + 4096),
            tcap=_round_up(int((hwt if hwt > 0 else fv * 2.2) * 1.2) + 4096),
            hbf=_round_up(int((hwfb if hwfb > 0 else fv // 3) * 1.3) + 1024,
                          2048),
            # curved side buffer from the loop's curved-count high-water
            # (force runs record 0 -> keep the auto default)
            cvcap=(_round_up(int(hwcv * 1.3) + 256, 1024) if hwcv > 0 else 0),
            # faces polygon width from the max region size actually seen
            gcap=(max(-(-int(hwg * 1.3) // 8) * 8, 16) if hwg > 0 else 0))
        # hysteresis: the high-water marks themselves depend (mildly) on the
        # caps the run used (lazy-compaction trigger points), so re-deriving
        # every run would oscillate, and each oscillation costs a full XLA
        # recompile.  Keep the caps we just ran with unless some buffer is
        # meaningfully oversized (>1.5x) or too small.
        import dataclasses

        def eff(c: Caps, name: str) -> int:
            # resolve auto (0) fields to the defaults the programs actually
            # use — comparing raw zeros against a derived concrete value
            # would flip the memo every time a run records (or doesn't
            # record) the corresponding high-water mark, e.g. when faces ran
            # on the host instead of fused
            v = getattr(c, name)
            if v:
                return v
            fv = c.fvcap or max(_round_up(c.vcap // 4), 16384)
            return {
                "hb": max(c.hcap, c.ccap // 8),
                "cvcap": min(max(c.ccap // 4, 1024), c.ccap),
                "fvcap": fv,
                "rgcap": _round_up(fv + fv // 2),
                "tcap": _round_up(3 * fv),
                "hbf": max(_round_up(fv // 4, 2048), 2048),
                "gcap": c.wcap,
            }.get(name, 0)

        def acceptable(cur: Caps, want: Caps) -> bool:
            # vcap gets a wide band: the vertex high-water depends on WHEN
            # the lazy compaction fired, which depends on the caps the run
            # used — a tight band makes successive runs derive an endless
            # chain of slightly different caps, each a full XLA recompile
            slack = {"vcap": 3.0}
            for f in dataclasses.fields(Caps):
                c, w = eff(cur, f.name), eff(want, f.name)
                hi = max(int(w * slack.get(f.name, 1.5)), w + 16384)
                if c < w or c > hi:
                    return False
            return True

        chosen = used_caps if acceptable(used_caps, derived) else derived
        _GOOD_CAPS[size_key] = chosen
        if _PERSISTED["good"].get(size_tok) != chosen:
            _PERSISTED["good"][size_tok] = chosen
            _persist_caps()
        _evict_stale_programs()

    def _memoize_skel_tight(nv0: int, ne0: int):
        # tight skeleton caps from the run's true initial counts: the
        # ramped caps are doubled past need and they size the standalone
        # skeleton program AND the fused program's init word pack.  Same
        # hysteresis rationale as _memoize_tight (every change is a new
        # fused-program key, i.e. a full XLA recompile).
        want = (_round_up(int(nv0 * 1.1) + 1024, 8192),
                _round_up(int(ne0 * 1.1) + 1024, 8192))
        cur = (_SKEL_CAPS.get(skel_key)
               or _PERSISTED["skel"].get(skel_tok))
        if cur is not None and all(
                w <= c <= max(int(w * 1.25), w + 16384)
                for c, w in zip(cur, want)):
            want = tuple(cur)
        _SKEL_CAPS[skel_key] = want
        if _PERSISTED["skel"].get(skel_tok) != want:
            _PERSISTED["skel"][skel_tok] = want
            _persist_caps()

    def _finish(V, OUT, E, nV, nE, nV_pre, nE_pre, tris=None, n_tris=0,
                prefetched=False):
        n_v = int(nV)
        n_e = int(nE)
        if prefetched:
            # the full (tight, FVC-wide) buffer is already riding the tunnel
            # from _start_host_copy: a [:n_v] host view avoids the device
            # slice dispatch (~25 ms RTT) entirely
            vertices = np.asarray(V)[:n_v]
        elif tris is not None and n_v > 0:
            # one jitted slicer for BOTH outputs (a single dispatch RTT
            # instead of two), then overlap the two d2h copies
            n_t = int(n_tris)
            skey = ("fin-slice", V.shape, tris.shape, str(tris.dtype),
                    n_v, n_t)
            if skey not in _EXTRACT_CACHE:
                _EXTRACT_CACHE[skey] = jax.jit(
                    lambda v, t, nv=n_v, nt=n_t: (v[:nv], t[:nt]))
            Vs_d, Ts_d = _EXTRACT_CACHE[skey](V, tris)
            _start_host_copy(Vs_d, Ts_d)
            vertices = np.asarray(Vs_d)
            tris, n_tris, prefetched = Ts_d, n_t, True
        else:
            vertices = np.asarray(V[:n_v])

        if verbose:
            # reference funnel line format (subpoly.py:71-84): A/B => C/D
            print(f"{int(nV_pre)}/{int(nE_pre)} => "
                  f"{vertices.shape[0]}/{n_e}", end=", ")

        if n_v == 0:
            stats.record(int(nV_pre), int(nE_pre), 0, 0, 0)
            return (np.empty((0, 3, 3), np.float32), vertices[:0],
                    np.empty((0, 3), np.int64))

        if tris is not None:
            # faces were assembled on device: pull only vertices + index
            # triples — the edge array is never consumed on this path, and
            # its ~8 B/edge would ride a ~40 MB/s tunnel
            raw = np.asarray(tris)[:n_tris] if prefetched \
                else np.asarray(tris[:n_tris])
            if raw.dtype == np.uint32 and raw.ndim == 2 and \
                    raw.shape[-1] == 2:
                tri_idx = _unpack_tri_words(raw)
            else:
                tri_idx = raw.astype(np.int64)
            faces = vertices[tri_idx]
        else:
            edges = np.asarray(E[:n_e]).astype(np.int64)
            outputs = np.asarray(OUT[:n_v])
            faces, tri_idx = extract_faces(vertices, edges, net, outputs,
                                           eps)
        if verbose:
            print(f"{len(faces)} faces", end=", ")
        stats.record(int(nV_pre), int(nE_pre), vertices.shape[0],
                     n_e, len(faces))
        return faces, vertices, tri_idx

    # the skeleton's own (SV, SE) caps double as the initial-pack prefix
    # hint for the fused program (the skeleton is deterministic per
    # checkpoint, so a persisted bound from any earlier run is a true
    # bound; a stale one flags OVF and falls back to the ramp)
    skel_key = (net.spec, M, eps, mode, dg)
    skel_tok = _caps_token(net.spec, f"{mtag}-e{eps}-n{dg}-skel")
    skel_tok_legacy = _caps_token(net.spec, f"{mtag}-e{eps}-skel")
    skel_caps = (_SKEL_CAPS.get(skel_key)
                 or _PERSISTED["skel"].get(skel_tok)
                 or _PERSISTED["skel"].get(skel_tok_legacy))

    multichip = mesh is not None and getattr(mesh, "size", 1) > 1

    # --- steady-state fast path: skeleton + loop fused in ONE program ------
    # (caps already known from a previous run or the persisted cache: one
    # dispatch, no skeleton/pool round trips; a multi-chip mesh takes the
    # staged path below so the skeleton forward can ride the mesh)
    if caps is not None and not multichip:
        import dataclasses

        hint = tuple(skel_caps) if skel_caps else None
        for _fa in range(3):
            fkey = (net.spec, caps, eps, force, lut_k, M, mode, hint, "fused")
            if fkey in _FUSED_BROKEN:
                ovf, nE_pre = -1, -1
                break
            if fkey not in _EXTRACT_CACHE:
                _EXTRACT_CACHE[fkey] = make_extract_fn(
                    net.spec, caps, eps, force=force, lut_k=lut_k,
                    with_skeleton=True, marks_len=M, with_faces=True,
                    skel_mode=mode, dist_k=dist_k, init_hint=hint)
            try:
                V, OUT, E, tris, meta = _EXTRACT_CACHE[fkey](
                    net.params, net.marks)
                pre = V.nbytes + tris.nbytes <= _PREFETCH_BYTES
                if pre:
                    _start_host_copy(meta, V, tris)
                else:
                    _start_host_copy(meta)
            except Exception as e:  # remote compile OOM etc.: ramp fallback
                if verbose:
                    msg = str(e).splitlines()[0][:200] if str(e) else ""
                    print(f"[device-extract] fused path failed "
                          f"({type(e).__name__}: {msg}); falling back "
                          "to the ramp")
                _EXTRACT_CACHE.pop(fkey, None)
                _FUSED_BROKEN.add(fkey)
                ovf, nE_pre = -1, -1
                break
            m = np.asarray(meta)
            nV, nE, ovf, nV_pre, nE_pre, n_tris = (int(x) for x in m[:6])
            hw = m[6:22]
            LAST_HW = hw.copy()
            sk = (int(m[22]), int(m[23])) if m.size >= 24 else None
            if ovf & OVF_X:
                raise RuntimeError(
                    "curved split edge lies on no earlier plane (reference "
                    "invariant subpoly.py:141-148); extraction aborted")
            if ovf == 0 and nE_pre > 0:
                _memoize_tight(hw, caps, nV)
                if sk is not None and min(sk) > 0:
                    _memoize_skel_tight(*sk)
                return _finish(V, OUT, E, nV, nE, nV_pre, nE_pre,
                               tris=tris, n_tris=n_tris, prefetched=pre)
            if ovf != 0 and ovf & ~(OVF_F | OVF_G) == 0:
                # faces-stage-only capacity miss: grow just those buffers
                # and retry the fused program (the loop itself was fine)
                caps = dataclasses.replace(
                    caps,
                    fvcap=(caps.fvcap or _round_up(caps.vcap // 4))
                    * (2 if ovf & OVF_F else 1),
                    rgcap=(caps.rgcap or _round_up(caps.vcap // 3))
                    * (2 if ovf & OVF_F else 1),
                    tcap=(caps.tcap or _round_up(caps.vcap))
                    * (2 if ovf & OVF_F else 1),
                    hbf=(caps.hbf or 2048) * (2 if ovf & OVF_F else 1),
                    gcap=((caps.gcap or caps.wcap) * 2)
                    if ovf & OVF_G else caps.gcap)
                if verbose:
                    print(f"[device-extract] faces overflow; retry {caps}")
                continue
            break
        if ovf != 0 or nE_pre == 0:
            if verbose:
                print(f"[device-extract] fused path overflow mask {ovf}; "
                      "falling back to the ramp")

    # --- initial skeleton, fully on device with its own (SV, SE) caps ------
    # (decoupled from the loop caps so no host round-trip of the lattice is
    # ever needed — the chunked host skeleton pulls ~130 MB/([M/128]^3 chunk)
    # through a ~40 MB/s tunnel)
    skel_caps = skel_caps or default_skel_caps(M, mode)
    for _ in range(5):
        if multichip:
            # lattice forward sharded over the mesh's dp axis; epilogue
            # replicated — identical skeleton, therefore identical funnel
            from tropical.parallel.shard_step import skeleton_sharded

            Vs, Os, Es, nV0, nE0, ovf_s = skeleton_sharded(
                net, mesh, skel_caps, eps, mode, dist_k)
        else:
            kkey = ("skel", net.spec, skel_caps, M, eps, mode)
            if kkey not in _EXTRACT_CACHE:
                mk = (make_skeleton_fn if M <= 128
                      and M ** 3 * R_COLS * 4 <= 2 ** 30
                      else make_slab_skeleton_fn)
                _EXTRACT_CACHE[kkey] = mk(net.spec, skel_caps, M, eps,
                                          mode=mode, dist_k=dist_k)
            Vs, Os, Es, nV0, nE0, ovf_s = _EXTRACT_CACHE[kkey](
                net.params, net.marks)
        ovf_s = int(ovf_s)
        if ovf_s == 0:
            break
        skel_caps = (skel_caps[0] * (2 if ovf_s & OVF_V else 1),
                     skel_caps[1] * (2 if ovf_s & OVF_E else 1))
        if verbose:
            print(f"[device-skeleton] overflow {ovf_s}; retry {skel_caps}")
    else:
        raise RuntimeError(f"skeleton exceeded caps after retries: {skel_caps}")
    nV0 = np.int32(nV0)
    nE0 = np.int32(nE0)
    if int(nE0) > 0:
        _memoize_skel_tight(int(nV0), int(nE0))
    else:
        _SKEL_CAPS[skel_key] = skel_caps
        if _PERSISTED["skel"].get(skel_tok) != skel_caps:
            _PERSISTED["skel"][skel_tok] = skel_caps
            _persist_caps()

    if int(nE0) == 0:  # degenerate net: hypercube fallback (subpoly.py:51-52)
        V0, E0, _ = get_hypercube(d, size)
        Vs = jnp.asarray(np.asarray(V0, np.float32))
        Es = jnp.asarray(np.asarray(E0, np.int32))
        Os = net.outputs(Vs)
        nV0 = np.int32(V0.shape[0])
        nE0 = np.int32(E0.shape[0])

    caps = caps or default_caps(int(nV0), int(nE0))

    def _fit(a, n):
        if a.shape[0] >= n:
            return jax.lax.slice(a, (0,) * a.ndim, (n,) + a.shape[1:])
        pad = jnp.zeros((n - a.shape[0],) + a.shape[1:], a.dtype)
        return jnp.concatenate([a, pad])

    for _attempt in range(9):
        pkey = ("pools", Vs.shape[0], Es.shape[0], caps.vcap, caps.ecap)
        if pkey not in _EXTRACT_CACHE:
            _EXTRACT_CACHE[pkey] = jax.jit(
                lambda v, o, e, vc=caps.vcap, ec=caps.ecap:
                (_fit(v, vc), _fit(o, vc), _fit(e, ec)))
        Vp, Op, Ep = _EXTRACT_CACHE[pkey](Vs, Os, Es)

        ramp_hint = (int(Vs.shape[0]), int(Es.shape[0]))
        key = (net.spec, caps, eps, force, lut_k, ramp_hint)
        if key not in _EXTRACT_CACHE:
            _EXTRACT_CACHE[key] = make_extract_fn(net.spec, caps, eps,
                                                  force=force, lut_k=lut_k,
                                                  init_hint=ramp_hint)
        extract = _EXTRACT_CACHE[key]

        V, OUT, E, _tris0, meta = extract(
            net.params, net.marks, Vp, Op, Ep, nV0, nE0)
        _start_host_copy(meta)
        m = np.asarray(meta)
        nV, nE, ovf, nV_pre, nE_pre, _ = (int(x) for x in m[:6])
        hw = m[6:22]
        LAST_HW = hw.copy()
        ovf = ovf | ovf_s
        if ovf & OVF_X:
            # invariant violation, not a capacity problem: a curved split
            # edge lies on no earlier plane (the reference hard-exits here,
            # subpoly.py:141-148) — retrying with bigger caps cannot help
            raise RuntimeError(
                "curved split edge lies on no earlier plane (reference "
                "invariant subpoly.py:141-148); extraction aborted")
        if ovf == 0:
            _memoize_tight(hw, caps, nV)
            break
        # root-cause retry: once a capacity buffer overflows, the dynamics
        # downstream are garbage and every later flag is noise — grow only
        # the most upstream overflowing buffer class per attempt
        import dataclasses

        if ovf & (OVF_C | OVF_H):
            caps = dataclasses.replace(
                caps,
                vcap=caps.vcap + 4 * caps.ccap,
                ecap=caps.ecap + 2 * caps.ccap,
                ccap=caps.ccap * 2 if ovf & OVF_C else caps.ccap,
                hcap=caps.hcap * 2 if ovf & OVF_H else caps.hcap,
                pcap=caps.pcap * 2, conncap=caps.conncap * 2)
        elif ovf & OVF_Q:
            # curved side buffer (or its GD sub-buffer, sized QC/4) missed;
            # once it has grown to CCAP the candidate block itself is the
            # binding cap, so grow that instead
            cur = caps.cvcap or max(caps.ccap // 4, 1024)
            if cur >= caps.ccap:
                caps = dataclasses.replace(
                    caps, ccap=caps.ccap * 2, cvcap=cur * 2,
                    vcap=caps.vcap + 4 * caps.ccap,
                    ecap=caps.ecap + 2 * caps.ccap)
            else:
                caps = dataclasses.replace(caps, cvcap=cur * 2)
        elif ovf & (OVF_V | OVF_E | OVF_P):
            caps = dataclasses.replace(
                caps,
                vcap=caps.vcap * (2 if ovf & OVF_V else 1),
                ecap=caps.ecap * (2 if ovf & OVF_E else 1),
                pcap=caps.pcap * (2 if ovf & OVF_P else 1),
                conncap=caps.conncap * (2 if ovf & OVF_P else 1))
        else:
            caps = dataclasses.replace(
                caps,
                kcap=caps.kcap + (1 if ovf & OVF_K else 0),
                wcap=caps.wcap * (2 if ovf & OVF_W else 1),
                hb=(caps.hb or max(caps.hcap, caps.ccap // 8))
                * (2 if ovf & OVF_B else 1))
        if verbose:
            print(f"[device-extract] overflow mask {ovf}; retrying with {caps}")
    else:
        raise CapsExhausted(
            f"extraction exceeded caps after retries: {caps}")

    return _finish(V, OUT, E, nV, nE, nV_pre, nE_pre)
