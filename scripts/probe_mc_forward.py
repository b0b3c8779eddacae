"""TPU probe: what does one MC slab's SDF forward cost, pointwise vs the
separable lattice encode?  Informs the device-side MC ladder design
(VERDICT r03 item 3: 512^3 pseudo-GT < 30 s needs the forward itself to
shrink — the sign sweep measured ~2.8 s per 4.2M-point slab).

Run on the real TPU:  python scripts/probe_mc_forward.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def force(r):
    np.asarray(jax.tree_util.tree_leaves(r)[-1].ravel()[:1])


def timeit(fn, *args, n=3):
    force(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from tropical.core import mlp as mlp_mod
    from tropical.core.hashgrid import encode_lattice, lattice_tables
    from tropical.core.net import preprocess
    from tropical.stanford.model import net_for_size
    from tropical.utils import checkpoint as ckpt
    from tropical.utils.isosurface import _grid_sign_fn

    print("backend:", jax.default_backend(), flush=True)
    for size in ("small", "large"):
        net = net_for_size(size, "sphere", 1)
        ckpt.load_into(
            net, f"tropical/stanford/models/sphere/sphere_sdf_{size}_1.pth.npz")
        spec = net.spec
        res, nxs = 512, 16
        canvas = 1.2

        # 1) pointwise packed-sign program (the current eval-ladder path)
        fn = _grid_sign_fn(spec, 1 << 21)
        t = timeit(lambda: fn(net.params, res, canvas, 64 * res * res))
        print(f"[{size}] pointwise signs 2^21 pts: {t:.3f}s "
              f"({(1 << 21) / t / 1e6:.1f} M pts/s)", flush=True)

        # 2) separable lattice sdf forward on one [nxs, res, res] slab
        @jax.jit
        def lat_sdf(params, x0):
            step = (2.0 * canvas) / (res - 1)
            xw = (x0 + jnp.arange(nxs, dtype=jnp.int32)).astype(jnp.float32) \
                * step - canvas
            yw = jnp.arange(res, dtype=jnp.float32) * step - canvas
            feats = encode_lattice(spec.grid, params["table"],
                                   preprocess(spec, xw), preprocess(spec, yw),
                                   preprocess(spec, yw))
            out, _ = mlp_mod.mlp_forward(params["mlp"],
                                         feats.astype(jnp.float32))
            return jnp.tanh(out[:, 1] - out[:, 0])

        t = timeit(lambda: lat_sdf(net.params, 64))
        npts = nxs * res * res
        print(f"[{size}] lattice sdf slab {nxs}x{res}x{res}: {t:.3f}s "
              f"({npts / t / 1e6:.1f} M pts/s)", flush=True)

        # 2b) with hoisted corner tables (as the skeleton does)
        tabs = lattice_tables(spec.grid, net.params["table"], npts)

        @jax.jit
        def lat_sdf_tab(params, tabs, x0):
            step = (2.0 * canvas) / (res - 1)
            xw = (x0 + jnp.arange(nxs, dtype=jnp.int32)).astype(jnp.float32) \
                * step - canvas
            yw = jnp.arange(res, dtype=jnp.float32) * step - canvas
            feats = encode_lattice(spec.grid, params["table"],
                                   preprocess(spec, xw), preprocess(spec, yw),
                                   preprocess(spec, yw), tables=tabs)
            out, _ = mlp_mod.mlp_forward(params["mlp"],
                                         feats.astype(jnp.float32))
            return jnp.tanh(out[:, 1] - out[:, 0])

        t = timeit(lambda: lat_sdf_tab(net.params, tabs, 64))
        print(f"[{size}] lattice sdf + hoisted tables: {t:.3f}s "
              f"({npts / t / 1e6:.1f} M pts/s)", flush=True)

        # 3) layout experiment: same MLP with [C, B] transposed activations
        #    (does [B, 16] pay lane padding on TPU?)
        @jax.jit
        def lat_sdf_T(params, tabs, x0):
            step = (2.0 * canvas) / (res - 1)
            xw = (x0 + jnp.arange(nxs, dtype=jnp.int32)).astype(jnp.float32) \
                * step - canvas
            yw = jnp.arange(res, dtype=jnp.float32) * step - canvas
            feats = encode_lattice(spec.grid, params["table"],
                                   preprocess(spec, xw), preprocess(spec, yw),
                                   preprocess(spec, yw), tables=tabs)
            h = feats.astype(jnp.float32).T              # [LF, B]
            mp = params["mlp"]
            for li in range(len(mp["w"])):
                h = mp["w"][li].T @ h + mp["b"][li][:, None]
                if li < len(mp["w"]) - 1:
                    h = jnp.maximum(h, 0.0)
            return jnp.tanh(h[1] - h[0])

        t = timeit(lambda: lat_sdf_T(net.params, tabs, 64))
        print(f"[{size}] lattice sdf transposed-MLP: {t:.3f}s "
              f"({npts / t / 1e6:.1f} M pts/s)", flush=True)


if __name__ == "__main__":
    main()
