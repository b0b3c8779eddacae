"""v5e timing for the sharded-step experiment (parallel/shard_step.py).

Measures, at large-preset pool sizes, (a) the single-chip step front half
vs the shard_map variant instantiated on a 1-chip mesh (the program-
restructuring overhead: collectives degenerate, the merge sort remains),
and (b) the skeleton lattice forward single vs 1-chip shard_map.  Numbers
feed the DESIGN.md crossover analysis.

Run on the real TPU:  python scripts/probe_shard_step.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def force(r):
    import jax

    np.asarray(jax.tree_util.tree_leaves(r)[-1].ravel()[:1])


def timeit(fn, *args, n=5):
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

    from tropical.parallel.mesh import make_mesh
    from tropical.parallel.shard_step import (front_half_sharded,
                                              front_half_single,
                                              shard_edge_pool,
                                              skeleton_forward_sharded)

    print("backend:", jax.default_backend(), flush=True)
    # large-preset pool scale (caps_cache large entry: ecap ~1.6M, vcap ~400k,
    # ccap ~100k; rounded pow2 here)
    vcap, ecap, ccap, R = 1 << 19, 1 << 21, 1 << 17, 33
    rng = np.random.default_rng(0)
    V = jnp.asarray(rng.uniform(-1, 1, (vcap, 3)).astype(np.float32))
    OUT = jnp.asarray(rng.normal(size=(vcap, R)).astype(np.float32))
    E = jnp.asarray(rng.integers(0, vcap, (ecap, 2)).astype(np.int32))
    aliveE = jnp.asarray(rng.random(ecap) < 0.5)
    # ~ccap/2 candidates on the probed column (a busy step's load)
    bits = (rng.random(ecap) < (ccap / 2 / ecap)).astype(np.uint32)
    EB = jnp.asarray(np.stack([bits, np.zeros_like(bits)]))

    import functools
    single = jax.jit(functools.partial(front_half_single, ccap=ccap))
    t1 = timeit(single, V, OUT, E, aliveE, EB, jnp.int32(0))
    print(f"front half single-chip: {t1*1e3:.2f} ms", flush=True)

    mesh = make_mesh(1, shape=(1, 1))
    fn = front_half_sharded(mesh, ecap, ccap)
    Es, As, EBs = shard_edge_pool(E, aliveE, EB, mesh)
    t2 = timeit(fn, V, OUT, Es, As, EBs, jnp.int32(0))
    print(f"front half shard_map(n=1): {t2*1e3:.2f} ms "
          f"(overhead {100*(t2-t1)/t1:.0f}%)", flush=True)

    # skeleton lattice forward at large scale (M=201 -> 201^3 pts, slabbed:
    # here one 16-slab like the slab skeleton's inner step)
    from tropical.core.net import NetSpec, net_outputs_lattice
    from tropical.stanford.model import net_for_size
    from tropical.utils import checkpoint as ckpt

    net = net_for_size("large", "sphere", 1)
    ckpt.load_into(
        net, "tropical/stanford/models/sphere/sphere_sdf_large_1.pth.npz")
    M = net.marks.shape[0]
    xw = jnp.asarray(np.linspace(-1, 1, 16, dtype=np.float32))
    yw = jnp.asarray(np.linspace(-1, 1, M, dtype=np.float32))
    sk_single = jax.jit(lambda p, a, b, c: net_outputs_lattice(
        net.spec, p, a, b, c))
    t3 = timeit(sk_single, net.params, xw, yw, yw)
    print(f"skeleton fwd 16x{M}x{M} single: {t3*1e3:.2f} ms", flush=True)
    sk_sh = skeleton_forward_sharded(net.spec, mesh)
    t4 = timeit(sk_sh, net.params, xw, yw, yw)
    print(f"skeleton fwd shard_map(n=1): {t4*1e3:.2f} ms "
          f"(overhead {100*(t4-t3)/t3:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
