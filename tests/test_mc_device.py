"""Device-topology marching cubes (utils/mc_device.py) vs the host path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _bumpy_vals(nxs=9, res=16, seed=0):
    """A values lattice with a wavy zero set plus noise — exercises many MC
    cases including ambiguous faces."""
    rng = np.random.default_rng(seed)
    x = np.linspace(-1, 1, nxs)[:, None, None]
    y = np.linspace(-1, 1, res)[None, :, None]
    z = np.linspace(-1, 1, res)[None, None, :]
    v = (np.sin(3 * x) * np.cos(4 * y) + np.sin(5 * z) - 0.1
         + 0.3 * rng.standard_normal((nxs, res, res)))
    return v.astype(np.float32)


def _host_mesh(vals):
    from tropical.utils.marching_cubes import marching_cubes

    nxs, res = vals.shape[0], vals.shape[1]
    xs = np.linspace(-1.2, 1.2, 64, dtype=np.float32)
    return marching_cubes(vals, xs[:nxs], xs[:res], xs[:res]), xs


def test_topology_bitwise_vs_host():
    """Given the SAME values lattice, the device topology reproduces the
    host path bitwise: same crossing-edge keys/order, same endpoint values,
    same triangle indices — hence identical vertices through the shared
    interpolation."""
    from tropical.utils import mc_device as mcd

    vals = _bumpy_vals()
    (hverts, htris), xs = _host_mesh(vals)

    f = jax.jit(lambda v: mcd._topology(v, 0, 4096, 4096, 8192))
    meta, keys, va, vb, tris = f(jnp.asarray(vals))
    n_e, n_t, ovf, _ = (int(x) for x in np.asarray(meta))
    assert ovf == 0 and n_e > 100 and n_t > 100
    keys = np.asarray(keys)[:n_e]
    va = np.asarray(va)[:n_e]
    vb = np.asarray(vb)[:n_e]
    tris = np.asarray(tris)[:n_t]

    nxs, res = vals.shape[0], vals.shape[1]
    dverts = mcd.interp_edge_keys(keys, va, vb, xs[:nxs], xs[:res], xs[:res])
    assert np.array_equal(htris, tris)
    assert np.array_equal(hverts, dverts)


def test_topology_counts_overflow_flagged():
    from tropical.utils import mc_device as mcd

    vals = _bumpy_vals()
    f = jax.jit(lambda v: mcd._topology(v, 0, 64, 64, 64))
    meta, *_ = f(jnp.asarray(vals))
    n_e, n_t, ovf, n_a = (int(x) for x in np.asarray(meta))
    assert ovf != 0
    # true counts are still reported so the retry ramp can size caps
    assert n_e > 64 and n_t > 64


def _synthetic_net():
    from tropical.core import NetSpec, TropicalNet

    spec = NetSpec(num_layers=3, num_hidden=16, levels=4, r_min=2, r_max=8,
                   T=19)
    net = TropicalNet(spec, key=jax.random.PRNGKey(0))
    net.params["table"] = net.params["table"] * 3000.0
    net.enc.params = net.params["table"]
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(-1, 1, (512, 3)).astype(np.float32))
    out, _ = net(x, gather=True)
    b = np.asarray(net.params["mlp"]["b"][2]).copy()
    b[1] -= np.asarray(out[:, 1] - out[:, 0]).mean()
    net.params["mlp"]["b"][2] = jnp.asarray(b)
    return net


def test_device_slabs_match_single_dispatch():
    """Slab decomposition (incl. the overlapped final slab and its cmin cube
    mask) is EXACTLY invisible: a 4-slab sweep equals the single-slab sweep
    vertex-for-vertex, triangle-for-triangle."""
    from tropical.utils.mc_device import run_marching_cubes_device

    net = _synthetic_net()
    res = 26
    one = run_marching_cubes_device(net, res, 1.2, max_pts=1 << 22)
    # max_pts res*res*8 -> nxs=8, slabs at x0 = 0, 7, 14, 18(overlap, cmin=3)
    many = run_marching_cubes_device(net, res, 1.2, max_pts=res * res * 8)
    assert np.array_equal(one.vertices, many.vertices)
    assert np.array_equal(one.faces, many.faces)


def test_device_overflow_retry_converges():
    from tropical.utils.mc_device import run_marching_cubes_device

    net = _synthetic_net()
    full = run_marching_cubes_device(net, 20, 1.2)
    tiny = run_marching_cubes_device(net, 20, 1.2, ecap0=64)
    assert np.array_equal(full.vertices, tiny.vertices)
    assert np.array_equal(full.faces, tiny.faces)


def test_device_e2e_close_to_host_pointwise(trained_net):
    """End-to-end device mesh vs the host dense path on a trained net: the
    lattice forward differs from the pointwise forward only by f32 rounding
    (association), so topology matches unless a grid value sits within ulp
    of zero, and vertices agree to interpolation noise."""
    import os

    from tropical.utils.marching_cubes import run_marching_cubes
    from tropical.utils.mc_device import run_marching_cubes_device

    net = trained_net
    res = 32
    os.environ["TROPICAL_MC_ENGINE"] = "host"
    try:
        host = run_marching_cubes(net, res, 1.2, R=0.8)
    finally:
        os.environ.pop("TROPICAL_MC_ENGINE", None)
    dev = run_marching_cubes_device(net, res, 1.2, R=0.8)
    assert host.faces.shape == dev.faces.shape
    assert host.vertices.shape == dev.vertices.shape

    # vertex values differ by ~1e-7 (coordinate synthesis + einsum
    # association), which reorders the final lexicographic vertex dedup —
    # compare up to that renumbering: nearest-host-vertex must be a
    # bijection at ~ulp distance, and the remapped triangle sets must match
    # (same cyclic orientation)
    perm = np.empty(len(dev.vertices), np.int64)
    dmax = 0.0
    for i in range(0, len(dev.vertices), 512):
        d = np.linalg.norm(dev.vertices[i:i + 512, None]
                           - host.vertices[None], axis=-1)
        perm[i:i + 512] = d.argmin(1)
        dmax = max(dmax, d.min(1).max())
    assert dmax < 1e-5
    assert len(np.unique(perm)) == len(perm)          # bijection

    def canon(f):
        r = f.argmin(1)
        rot = np.stack([f[np.arange(len(f)), (r + k) % 3]
                        for k in range(3)], -1)
        return rot[np.lexsort((rot[:, 2], rot[:, 1], rot[:, 0]))]

    assert np.array_equal(canon(perm[dev.faces]), canon(host.faces))


def test_run_marching_cubes_routes_to_device(trained_net, monkeypatch):
    """TROPICAL_MC_ENGINE=device forces the fused path through the public
    entry point (the accelerator backends take it by default)."""
    from tropical.utils import marching_cubes as mc

    monkeypatch.setenv("TROPICAL_MC_ENGINE", "device")
    called = {}
    import tropical.utils.mc_device as mcd

    orig = mcd.run_marching_cubes_device

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(mcd, "run_marching_cubes_device", spy)
    mesh = mc.run_marching_cubes(trained_net, 16, 1.2, R=0.8)
    assert called.get("yes") and len(mesh.vertices) > 0
