"""Derive golden hash-grid encoding values from tiny-cuda-nn kernel semantics.

INDEPENDENT of tropical.core.hashgrid — this re-states the public
tiny-cuda-nn grid kernel rules (grid.h: grid_scale, grid_resolution,
grid_index with its unconditional ``index % hashmap_size``, the coherent
prime hash, and N-linear interpolation) in plain numpy, and prints the
fixture literals committed in tests/test_hashgrid.py.  If the library and
these rules ever disagree, the committed literals catch it even if both
implementations were edited in tandem.

Reference for the semantics being pinned: the reference repo wraps
``tcnn.Encoding`` at tropical/tropical.py:32-47; the rules themselves are
from the public tiny-cuda-nn sources (include/tiny-cuda-nn/encodings/grid.h).

Run: python scripts/derive_tcnn_goldens.py
"""

import numpy as np

PRIMES = (1, 2654435761, 805459861)


def next_multiple(x, m):
    return ((x + m - 1) // m) * m


def level_params(l, n_min, n_max, scale, levels, T, D=3):
    growth = (1.0 if levels == 1 else
              np.exp2(np.log2(n_max * scale / n_min) / (levels - 1)))
    s = float(np.exp2(l * np.log2(growth)) * n_min - 1.0)
    res = int(np.ceil(s)) + 1
    entries = min(next_multiple(res ** D, 8), 1 << T)
    offset = 0
    for ll in range(l):
        sl = float(np.exp2(ll * np.log2(growth)) * n_min - 1.0)
        rl = int(np.ceil(sl)) + 1
        offset += min(next_multiple(rl ** D, 8), 1 << T)
    return s, res, entries, offset


def grid_index(pos_grid, res, entries, T, D=3):
    """tcnn grid.h grid_index: linear while dense, coherent-prime hash when
    the level is hashed, then unconditional % hashmap_size."""
    if res ** D > (1 << T):  # hashed level
        with np.errstate(over="ignore"):  # uint32 wraparound is the hash
            h = np.uint32(0)
            for d in range(D):
                h ^= np.uint32(pos_grid[d]) * np.uint32(PRIMES[d])
        return int(h % np.uint32(entries))
    idx = 0
    stride = 1
    for d in range(D):
        idx += int(pos_grid[d]) * stride
        stride *= res
    return idx % entries


def encode_point(x, table, l, n_min, n_max, scale, levels, T, F=2):
    """One level's N-linear interpolation, f32 pos/frac arithmetic like the
    kernel; corner accumulation in f64 for a tight golden."""
    s, res, entries, offset = level_params(l, n_min, n_max, scale, levels, T)
    pos = np.float32(x) * np.float32(s) + np.float32(0.5)
    pg = np.floor(pos).astype(np.int64)
    frac = (pos - pg.astype(np.float32)).astype(np.float64)
    acc = np.zeros(F)
    for corner in range(8):
        bits = [(corner >> d) & 1 for d in range(3)]
        cp = pg + bits
        idx = grid_index(cp, res, entries, T)
        w = 1.0
        for d in range(3):
            w *= frac[d] if bits[d] else 1.0 - frac[d]
        acc += w * table[offset + idx]
    return acc, [grid_index(pg + [(c >> d) & 1 for d in range(3)], res,
                            entries, T) for c in range(8)]


def fill_table(n_entries, F=2):
    e = np.arange(n_entries)[:, None]
    f = np.arange(F)[None, :]
    return (((3 * e + 5 * f) % 257) - 128) / 64.0  # f32-exact multiples of 1/64


def main():
    # SMALL preset of the rebuild's tests: L=4 F=2 T=19 N_min=2 N_max=32
    n_entries_small = 35192
    tab = fill_table(n_entries_small)
    print("== SMALL (2,32,T19,L4): all levels dense; res 2/6/13/32 ==")
    for name, x in [("interior", (0.35, 0.60, 0.85)),
                    ("boundary x=1", (1.0, 1.0, 1.0))]:
        feats = []
        for l in range(4):
            v, idxs = encode_point(np.array(x), tab, l, 2, 32, 1.0, 4, 19)
            feats += list(v)
            print(f"  {name} L{l}: corner idxs {idxs}")
        print(f"  {name} {x}: [" + ", ".join(f"{v:.10f}" for v in feats) + "]")

    # NGP default: L=16 F=2 T19 N_min=16 N_max=2048; level 6 hashed (res 112)
    n_entries_ngp = 6098120
    tab = fill_table(n_entries_ngp)
    x = np.array((0.3217, 0.5861, 0.0523))
    v, idxs = encode_point(x, tab, 6, 16, 2048, 1.0, 16, 19)
    print("== NGP level 6 (hashed, res 112) ==")
    print(f"  corner idxs {idxs}")
    print(f"  {tuple(x)}: [" + ", ".join(f"{vv:.10f}" for vv in v) + "]")

    # ---- round-5 adversarial fixtures (VERDICT task 6) ---------------------

    # (a) EVERY level hashed: T=14 (16384 entries/level), L=4, N_min=26
    #     (26^3 = 17576 > 2^14 already at level 0), N_max=64.
    print("== ALLHASH (26,64,T14,L4): every level hashed ==")
    n_entries = 4 * (1 << 14)
    tab = fill_table(n_entries)
    for name, x in [("interior", (0.137, 0.482, 0.911)),
                    ("corner x=1", (1.0, 1.0, 1.0))]:
        feats = []
        for l in range(4):
            s, res, entries, off = level_params(l, 26, 64, 1.0, 4, 14)
            assert res ** 3 > (1 << 14), (l, res)
            v, idxs = encode_point(np.array(x), tab, l, 26, 64, 1.0, 4, 14)
            feats += list(v)
            print(f"  {name} L{l}: res {res} entries {entries} "
                  f"corner idxs {idxs}")
        print(f"  {name} {x}: [" + ", ".join(f"{v:.10f}" for v in feats)
              + "]")

    # (b) the dense/hash switch boundary at T=19: 80^3 = 512000 <= 2^19
    #     (dense, linear index), 81^3 = 531441 > 2^19 (hashed).  Single-level
    #     configs pin the exact switch resolution from both sides.
    for n_min in (80, 81):
        s, res, entries, off = level_params(0, n_min, n_min, 1.0, 1, 19)
        hashed = res ** 3 > (1 << 19)
        n_entries = entries
        tab = fill_table(n_entries)
        x = (0.507, 0.253, 0.851)
        v, idxs = encode_point(np.array(x), tab, 0, n_min, n_min, 1.0, 1, 19)
        print(f"== SWITCH res {res} ({'hashed' if hashed else 'dense'}, "
              f"entries {entries}) ==")
        print(f"  corner idxs {idxs}")
        print(f"  {x}: [" + ", ".join(f"{vv:.10f}" for vv in v) + "]")

    # (c) x EXACTLY on level grid planes of the SMALL preset: x = 0.5 gives
    #     pos = x*s + 0.5 integral on levels 0 (s=1) and 3 (s=31) — the
    #     interpolation weight degenerates to a single corner row there, so
    #     any off-by-one in floor/frac or corner order shows up raw.
    tab = fill_table(n_entries_small)
    x = (0.5, 0.5, 0.5)
    feats = []
    for l in range(4):
        s32 = np.float32(level_params(l, 2, 32, 1.0, 4, 19)[0])
        pos = np.float32(0.5) * s32 + np.float32(0.5)
        v, idxs = encode_point(np.array(x), tab, l, 2, 32, 1.0, 4, 19)
        feats += list(v)
        print(f"  on-plane L{l}: pos {pos!r} integral={float(pos).is_integer()}")
    print(f"  on-plane {x}: [" + ", ".join(f"{v:.10f}" for v in feats) + "]")


if __name__ == "__main__":
    main()
