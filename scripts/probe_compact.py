"""v5e A/B: sort-based lane compaction (_compact_lanes) vs cumsum+scatter,
at the fused engine's pool widths.  The engine compacts lanes dozens of
times per run (candidates, prune, conn dedup); the round-2 note measured
sort 5x cheaper than cumsum+searchsorted — scatter-based writing was never
tried.  Run: python scripts/probe_compact.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def force(r):
    import jax

    np.asarray(jax.tree_util.tree_leaves(r)[-1].ravel()[:1])


def timeit(fn, *args, n=7):
    force(fn(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    for logn, logk, dens in ((21, 18, 0.05), (21, 18, 0.5), (18, 15, 0.1)):
        n, K = 1 << logn, 1 << logk
        rng = np.random.default_rng(0)
        mask = jnp.asarray(rng.random(n) < dens)

        @jax.jit
        def by_sort(m):
            idx = jnp.arange(n, dtype=jnp.int32)
            key = jnp.where(m, idx, jnp.int32(n))
            skey = jax.lax.sort(key)
            lanes = jax.lax.slice(skey, (0,), (K,))
            total = m.sum().astype(jnp.int32)
            valid = jnp.arange(K, dtype=jnp.int32) < total
            return jnp.where(valid, lanes, 0), valid, total

        @jax.jit
        def by_scatter(m):
            idx = jnp.arange(n, dtype=jnp.int32)
            cnt = jnp.cumsum(m.astype(jnp.int32))
            rank = cnt - 1
            total = cnt[-1]
            lanes = jnp.zeros(K, jnp.int32).at[
                jnp.where(m & (rank < K), rank, K)].set(idx, mode="drop")
            valid = jnp.arange(K, dtype=jnp.int32) < total
            return lanes, valid, total

        a = by_sort(mask)
        b = by_scatter(mask)
        same = all(np.array_equal(np.asarray(x), np.asarray(y))
                   for x, y in zip(a, b))
        ts = timeit(by_sort, mask)
        tc = timeit(by_scatter, mask)
        print(f"n=2^{logn} K=2^{logk} dens={dens}: sort {ts*1e3:.2f} ms, "
              f"scatter {tc*1e3:.2f} ms, equal={same}", flush=True)


if __name__ == "__main__":
    main()
