"""True marching cubes: table derivation, watertightness, metric parity.

The 256-case tables are derived programmatically (face-loop walking with a
fixed ambiguous-face convention); these tests pin the invariants that any
correct MC must satisfy, plus CD agreement with the MT baseline (reference
evaluate.py compares both families against the same MC pseudo-GT).
"""

from collections import Counter

import numpy as np
import pytest

from tropical.utils.marching_cubes import (_EDGE_HI, _EDGE_LO, _NTRIS,
                                           _TRI_TABLE, _case_loops,
                                           marching_cubes)


def test_table_shape_and_counts():
    # standard MC: at most 5 triangles per case; 254 non-trivial cases
    assert _NTRIS.max() == 5
    assert (_NTRIS > 0).sum() == 254
    assert _NTRIS[0] == 0 and _NTRIS[255] == 0


def test_case_loops_cover_cut_edges_exactly_once():
    for code in range(256):
        loops = _case_loops(code)
        flat = [e for lp in loops for e in lp]
        assert len(flat) == len(set(flat))
        inside = [(code >> c) & 1 for c in range(8)]
        cut = [i for i in range(12)
               if inside[_EDGE_LO[i]] != inside[_EDGE_HI[i]]]
        assert sorted(flat) == sorted(cut), code


def _boundary_imbalance(tris):
    de = Counter()
    for t in tris:
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            de[(a, b)] += 1
    return sum(abs(de[(a, b)] - de[(b, a)]) for (a, b) in list(de) if a < b)


def test_sphere_watertight_outward_euler():
    res = 33
    s = np.linspace(-1.2, 1.2, res)
    gx, gy, gz = np.meshgrid(s, s, s, indexing="ij")
    vals = 0.8 - np.sqrt(gx ** 2 + gy ** 2 + gz ** 2)  # inside-positive
    verts, tris = marching_cubes(vals, s, s, s)

    r = np.linalg.norm(verts, axis=1)
    assert r.max() <= 0.8 + 1e-9 and r.min() > 0.75  # on the crossing

    assert _boundary_imbalance(tris) == 0  # closed surface

    edges = {(min(a, b), max(a, b))
             for t in tris for a, b in ((t[0], t[1]), (t[1], t[2]),
                                        (t[2], t[0]))}
    assert len(verts) - len(edges) + len(tris) == 2  # sphere topology

    v = verts[tris]
    n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    c = v.mean(1)
    assert ((n * c).sum(-1) > 0).all()  # normals point inside -> outside


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_fields_watertight(seed):
    # junk fields maximize ambiguous-face coverage; the fixed face
    # convention must still give a zero-boundary (crack-free) surface
    rng = np.random.default_rng(seed)
    res = 12
    vals = rng.normal(size=(res, res, res))
    vals[[0, -1], :, :] = -1.0
    vals[:, [0, -1], :] = -1.0
    vals[:, :, [0, -1]] = -1.0
    s = np.linspace(-1, 1, res)
    _, tris = marching_cubes(vals, s, s, s)
    assert len(tris) and _boundary_imbalance(tris) == 0


def test_mc_mt_cd_parity(trained_net):
    # MC and MT sample the same interpolated crossings; their meshes must
    # agree within a grid cell on chamfer distance
    from tropical.utils.chamfer import chamfer_distance
    from tropical.utils.isosurface import run_marching_tetrahedra
    from tropical.utils.marching_cubes import run_marching_cubes

    res = 48
    mc = run_marching_cubes(trained_net, res, 1.2)
    mt = run_marching_tetrahedra(trained_net, res, 1.2)
    assert mc.vertices.shape[0] > 100
    cd = chamfer_distance(np.asarray(mc.vertices), np.asarray(mt.vertices))
    assert cd < 2 * 2.4 / (res - 1)  # within ~a cell diagonal


def test_grid_sdf_device_synthesis_matches_host_points(trained_net):
    """The device-synthesized grid evaluator (_grid_sdf_fn: points built from
    iota + dynamic res/canvas/lin0 scalars, no coordinate h2d) must agree
    with net.sdf over host-built linspace points to f32 rounding."""
    import jax.numpy as jnp

    from tropical.utils.isosurface import _grid_sdf_fn

    res, canvas = 9, 1.2
    batch = 128
    fn = _grid_sdf_fn(trained_net.spec, batch)
    s = np.linspace(-canvas, canvas, res, dtype=np.float32)
    for lin0 in (0, res ** 3 - batch):  # front and tail of the grid
        dev = np.asarray(fn(trained_net.params, res, canvas, lin0))
        idx = lin0 + np.arange(batch)
        pts = np.stack([s[idx // (res * res)], s[(idx // res) % res],
                        s[idx % res]], axis=-1)
        host = np.asarray(trained_net.sdf(jnp.asarray(pts))[:, 0])
        # identical gather cells + f32 coordinate rounding only
        np.testing.assert_allclose(dev, host, atol=2e-5)


@pytest.mark.parametrize("seed", [0, 3])
def test_signs_path_bitwise_matches_dense(seed):
    """marching_cubes_signs (sign grid + crossing-endpoint value oracle — the
    TPU path that avoids pulling the full f32 grid) must reproduce the dense
    marching_cubes output bitwise."""
    from tropical.utils.marching_cubes import marching_cubes_signs

    rng = np.random.default_rng(seed)
    res = 10
    vals = rng.normal(size=(res, res, res))
    vals[[0, -1], :, :] = vals[:, [0, -1], :] = vals[:, :, [0, -1]] = -1.0
    s = np.linspace(-1, 1, res)
    dv, dt = marching_cubes(vals, s, s, s)

    calls = []

    def vals_at(lin):
        calls.append(lin.shape[0])
        return vals.reshape(-1)[lin]

    sv, st = marching_cubes_signs(vals > 0, s, s, s, vals_at)
    np.testing.assert_array_equal(dv, sv)
    np.testing.assert_array_equal(dt, st)
    # fetched exactly the two endpoints of each unique crossing edge
    assert sum(calls) == 2 * dv.shape[0]


def test_sign_and_vals_at_programs_match_dense_grid(trained_net):
    """Device-side packed-sign and values-at-indices programs must agree with
    the dense grid evaluator (CPU backend exercises the host equivalents;
    the jitted variants share the exact same synthesis formula)."""
    from tropical.utils.isosurface import (_grid_sign_fn, _grid_vals_at_fn,
                                           _sdf_grid_vals)

    res, canvas = 9, 1.2
    dense = _sdf_grid_vals(trained_net, res, canvas, 0, res ** 3)

    batch = (res ** 3 + 7) // 8 * 8  # one call covering the whole grid
    sfn = _grid_sign_fn(trained_net.spec, batch)
    packed = np.asarray(sfn(trained_net.params, res, canvas, 0))
    signs = np.unpackbits(packed, bitorder="little")[:res ** 3]
    np.testing.assert_array_equal(signs.astype(bool), dense > 0)

    idx = np.asarray([0, 1, res, res * res, res ** 3 - 1], np.int32)
    vfn = _grid_vals_at_fn(trained_net.spec, idx.shape[0])
    at = np.asarray(vfn(trained_net.params, res, canvas, idx))
    np.testing.assert_allclose(at, dense[idx], atol=1e-6)


def test_mt_sparse_splat_matches_dense(trained_net):
    """The accelerator MT branch (sign grid + exact values splatted at
    mixed-cube corners) must be bitwise-identical to the dense-values path
    over the same device-synthesized field."""
    from unittest import mock

    import jax

    import tropical.utils.isosurface as iso

    with mock.patch.object(jax, "default_backend", lambda: "axon"):
        sp = iso.run_marching_tetrahedra(trained_net, 20, 1.2)

    orig = iso._sdf_grid_vals

    def synth_vals(net_, res, canvas, lin0, count, batch=1 << 18):
        with mock.patch.object(jax, "default_backend", lambda: "axon"):
            return orig(net_, res, canvas, lin0, count, batch)

    with mock.patch.object(iso, "_sdf_grid_vals", synth_vals):
        dn = iso.run_marching_tetrahedra(trained_net, 20, 1.2)

    np.testing.assert_array_equal(np.asarray(dn.vertices),
                                  np.asarray(sp.vertices))
    np.testing.assert_array_equal(np.asarray(dn.faces), np.asarray(sp.faces))
