"""In-program probe: per-index cost of TPU gathers vs row width.

Round-5 contradiction to settle: the round-2 lesson says packing 2-3 i32
columns into row gathers was ~6x SLOWER than separate single-column gathers
(ROADMAP), yet the round-5 squeeze measurement shows a [SV, 33] row gather
at ~4.7 ns/element while 33 separate 1D gathers cost ~25 ns/index each.
If the per-INDEX issue cost dominates (not per element), merging the pair
stage's zs/go/vid single-column gathers into one row gather would cut
s10/s11's ~145 ms materially.

Method: each variant runs ITERS dependent gathers inside one jitted
fori_loop (index chain depends on gathered values, so iterations cannot
fuse/CSE); wall time is forced with a 1-element device slice pull.

    python scripts/probe_gather.py [n_log2=21]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 30


def run(fn, *args):
    r = fn(*args)
    np.asarray(r.ravel()[:1])          # warm (compile)
    best = None
    for _ in range(5):
        t = time.time()
        r = fn(*args)
        np.asarray(r.ravel()[:1])
        dt = time.time() - t
        best = dt if best is None else min(best, dt)
    return best


def main():
    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    N = 1 << nlog                      # index count (PCAP-like)
    M = 1 << (nlog + 1)                # table rows

    k = jax.random.PRNGKey(0)
    idx = jax.random.randint(k, (N,), 0, M, dtype=jnp.int32)
    cols = [jax.random.randint(jax.random.PRNGKey(i), (M,), 0, 2 ** 30,
                               dtype=jnp.int32) for i in range(8)]
    tab2 = jnp.stack(cols[:2], axis=1)              # [M, 2]
    tab3 = jnp.stack(cols[:3], axis=1)              # [M, 3]
    tab4 = jnp.stack(cols[:4], axis=1)              # [M, 4]
    tab8 = jnp.stack(cols, axis=1)                  # [M, 8]

    def chain(upd):
        def body(i, c):
            s, ix = c
            v, nxt = upd(ix)
            return s + v, (nxt + i) % M
        return jax.jit(lambda ix: jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros(N, jnp.int32), ix))[0])

    def sep1(ix):                       # 1 single-column gather
        g = cols[0][ix]
        return g, g

    def sep2(ix):                       # 2 single-column gathers
        g = [c[ix] for c in cols[:2]]
        return g[0] + g[1], g[0]

    def sep4(ix):                       # 4 single-column gathers
        g = [c[ix] for c in cols[:4]]
        return g[0] + g[1] + g[2] + g[3], g[0]

    def sep6(ix):                       # 6 single-column gathers
        g = [c[ix] for c in cols[:6]]
        return sum(g[1:], g[0]), g[0]

    def row2(ix):                       # one [N, 2] row gather
        r = tab2[ix]
        return r.sum(1), r[:, 0]

    def row3(ix):                       # one [N, 3] row gather
        r = tab3[ix]
        return r.sum(1), r[:, 0]

    def row4(ix):                       # one [N, 4] row gather
        r = tab4[ix]
        return r.sum(1), r[:, 0]

    def row8(ix):                       # one [N, 8] row gather
        r = tab8[ix]
        return r.sum(1), r[:, 0]

    def pack_row3(ix):                  # per-call pack + one [N, 3] row gather
        t = jnp.stack(cols[:3], axis=1)
        r = t[ix]
        return r.sum(1), r[:, 0]

    for name, fn in [("sep1", sep1), ("sep2", sep2), ("sep4", sep4),
                     ("sep6", sep6), ("row2", row2), ("row3", row3),
                     ("row4", row4), ("row8", row8),
                     ("pack_row3", pack_row3)]:
        t = run(chain(fn), idx)
        per_idx = t / ITERS / N * 1e9
        print(f"{name}: {t*1e3:8.1f} ms total  {per_idx:6.2f} ns/index",
              flush=True)


if __name__ == "__main__":
    main()
