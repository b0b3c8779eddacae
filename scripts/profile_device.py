"""Per-stage cost profile of the fused device extraction engine.

Runs the single-dispatch extraction with each 'disable' knob (profiling cuts
that remove pipeline stages) and prints stage deltas.  Run on the real TPU:

    python scripts/profile_device.py [small|medium]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def force(x):
    """Force device completion: block_until_ready does NOT block on the axon
    backend; a 1-element device-side slice pull does."""
    leaves = jax.tree_util.tree_leaves(x)
    for leaf in leaves[::-1]:
        if hasattr(leaf, 'ravel') and getattr(leaf, 'size', 0) > 0:
            np.asarray(leaf.ravel()[:1])
            return

sys.path.insert(0, ".")

from tropical.extract.device import (Caps, _GOOD_CAPS, _SKEL_CAPS,
                                     default_skel_caps, make_extract_fn,
                                     make_skeleton_fn, make_slab_skeleton_fn,
                                     subpoly_device)


def build_pools(net, caps, eps=1e-4, mode="dist"):
    """Run the device skeleton and pad its buffers into loop-caps pools
    (mirrors subpoly_device's wiring)."""
    import jax.numpy as jnp

    from tropical.extract.device import _dist_pool_k

    M = int(net.marks.shape[0])
    skel_caps = (_SKEL_CAPS.get((net.spec, M, eps, mode))
                 or default_skel_caps(M, mode))
    dk = _dist_pool_k(np.asarray(net.marks)) if mode == "dist" else 0
    mk = make_skeleton_fn if M <= 128 else make_slab_skeleton_fn
    skel = mk(net.spec, skel_caps, M, eps, mode=mode, dist_k=dk)
    Vs, Os, Es, nV0, nE0, _ = skel(net.params, net.marks)

    def pad(a, n):
        if a.shape[0] >= n:
            return a[:n]
        return jnp.concatenate(
            [a, jnp.zeros((n - a.shape[0],) + a.shape[1:], a.dtype)])

    Vp, Op, Ep = jax.jit(lambda v, o, e: (
        pad(v, caps.vcap), pad(o, caps.vcap), pad(e, caps.ecap)))(Vs, Os, Es)
    return skel, (Vp, Op, Ep, np.int32(nV0), np.int32(nE0))
from tropical.stanford.model import Net
from tropical.utils import checkpoint as ckpt


def get_net(size: str):
    r_min, r_max = {"small": (2, 32), "medium": (4, 64),
                    "large": (8, 128)}[size]
    net = Net(num_layers=3, num_hidden=16, levels=4, r_min=r_min,
              r_max=r_max, T=19, key=jax.random.PRNGKey(1))
    path = f"tropical/stanford/models/sphere/sphere_sdf_{size}_1.pth"
    found = ckpt.find_checkpoint(path)
    assert found, path
    ckpt.load_into(net, found)
    return net


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "small"
    net = get_net(size)

    # one clean run to memoize tight caps and warm the skeleton path
    t0 = time.time()
    subpoly_device(net, verbose=False, force=True)
    print(f"cold run {time.time() - t0:.2f}s")
    t0 = time.time()
    _, verts, tris = subpoly_device(net, verbose=False, force=True)
    warm_total = time.time() - t0
    print(f"warm run {warm_total:.2f}s  ({verts.shape[0]} verts, "
          f"{verts.shape[0]/warm_total:.0f} v/s)")

    import os

    M = int(net.marks.shape[0])
    mode = os.environ.get("TROPICAL_SKEL_MODE", "dist")
    caps = _GOOD_CAPS[(net.spec, M, True, mode)]
    print("caps:", caps)

    skel, (Vp, Op, Ep, nV0, nE0) = build_pools(net, caps, mode=mode)
    force(Ep)

    variants = [
        ("full", frozenset()),
        ("no-prune", frozenset({"prune"})),
        ("stop@dedup", frozenset({"dedup"})),
        ("stop@paircompact", frozenset({"paircompact"})),
        ("stop@windows", frozenset({"windows"})),
        ("stop@repsort", frozenset({"repsort"})),
        ("stop@pairs", frozenset({"pairs"})),
        ("no-forward", frozenset({"forward"})),
    ]
    times = {}
    for name, dis in variants:
        fn = make_extract_fn(net.spec, caps, 1e-4, disable=dis, force=True)
        out = fn(net.params, net.marks, Vp, Op, Ep, nV0, nE0)
        force(out)  # compile+warm
        reps = []
        for _ in range(3):
            t0 = time.time()
            out = fn(net.params, net.marks, Vp, Op, Ep, nV0, nE0)
            force(out)
            reps.append(time.time() - t0)
        times[name] = min(reps)
        print(f"{name:18s} {times[name]*1000:8.1f} ms")

    # skeleton cost
    reps = []
    for _ in range(3):
        t0 = time.time()
        out = skel(net.params, net.marks)
        force(out)
        reps.append(time.time() - t0)
    print(f"{'skeleton':18s} {min(reps)*1000:8.1f} ms")

    print()
    print("stage deltas (ms):")
    print(f"  prune           {1000*(times['full'] - times['no-prune']):8.1f}")
    print(f"  dedup+append    {1000*(times['full'] - times['stop@dedup']):8.1f}")
    print(f"  pair filter     {1000*(times['stop@dedup'] - times['stop@paircompact']):8.1f}")
    print(f"  window compare  {1000*(times['stop@paircompact'] - times['stop@windows']):8.1f}")
    print(f"  repsort         {1000*(times['stop@windows'] - times['stop@repsort']):8.1f}")
    print(f"  expansion       {1000*(times['stop@repsort'] - times['stop@pairs']):8.1f}")
    print(f"  stages1-7       {1000*times['stop@pairs']:8.1f}")
    print(f"  fwd cost        {1000*(times['full'] - times['no-forward']):8.1f}")


if __name__ == "__main__":
    main()
