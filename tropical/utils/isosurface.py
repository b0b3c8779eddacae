"""Isosurface extraction baselines: marching tetrahedra on a 6-tet cube lattice.

The evaluation protocol compares against grid-sampled baselines (reference
evaluate.py:141-194 runs a marching-tetrahedra variant on a per-cube
tetrahedral decomposition; true marching cubes lives in
:mod:`tropical.utils.marching_cubes` and provides the pseudo-GT).  MT
vertices sit exactly on the zero crossing of the linearly interpolated
field, the same property the MC pseudo-GT relies on.

The sign-case tables are derived programmatically from the 16 corner-sign
patterns instead of hard-coding the kaolin tables (reference utils/mtet.py:7-46
— which is syntactically corrupt in the snapshot, SURVEY §2.5); triangle
orientation is fixed by pointing normals from the positive (inside) toward the
negative (outside) region.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# 6 tetrahedra per cube over corners v0..v7 with idx(x,y,z) bit order
# (x*4 + y*2 + z offsets); matches reference evaluate.py:155-170
CUBE_TETS = np.asarray([
    [0, 1, 2, 6],
    [1, 2, 4, 6],
    [0, 1, 3, 6],
    [1, 3, 5, 6],
    [4, 5, 6, 7],
    [1, 4, 5, 6],
], np.int64)

# corner offsets matching evaluate.py:154-162: v0=(0,0,0) v1=(1,0,0) v2=(0,1,0)
# v3=(0,0,1) v4=(1,1,0) v5=(1,0,1) v6=(0,1,1) v7=(1,1,1)
CUBE_CORNERS = np.asarray([
    [0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
    [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1],
], np.int64)


def _case_tables():
    """For each of 16 corner-sign codes: up to 2 triangles, each vertex being
    a (corner_a, corner_b) crossing edge; -1 padding."""
    tris_table = np.full((16, 2, 3, 2), -1, np.int64)
    ntris = np.zeros(16, np.int64)
    for code in range(16):
        pos = [i for i in range(4) if (code >> i) & 1]
        neg = [i for i in range(4) if not (code >> i) & 1]
        if len(pos) == 1:
            p = pos[0]
            a, b, c = neg
            tris_table[code, 0] = [(p, a), (p, b), (p, c)]
            ntris[code] = 1
        elif len(pos) == 3:
            n = neg[0]
            a, b, c = pos
            tris_table[code, 0] = [(n, a), (n, b), (n, c)]
            ntris[code] = 1
        elif len(pos) == 2:
            p0, p1 = pos
            n0, n1 = neg
            e00, e01, e10, e11 = (p0, n0), (p0, n1), (p1, n1), (p1, n0)
            tris_table[code, 0] = [e00, e01, e10]
            tris_table[code, 1] = [e00, e10, e11]
            ntris[code] = 2
    return tris_table, ntris


_TRIS_TABLE, _NTRIS = _case_tables()


def marching_tetrahedra(points: np.ndarray, tets: np.ndarray, sdf: np.ndarray
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Triangulate the zero level set of ``sdf`` over the tetrahedral mesh.

    Args:
        points: [P, 3] vertex positions.
        tets: [T, 4] tetrahedron corner indices.
        sdf: [P] field values (inside positive).

    Returns:
        (vertices [V, 3], triangles [F, 3]) with deduplicated edge vertices.
    """
    points = np.asarray(points, np.float64)
    sdf = np.asarray(sdf, np.float64)
    occ = sdf > 0
    code = (occ[tets] << np.arange(4)).sum(-1)
    active = (_NTRIS[code] > 0)
    tets = tets[active]
    code = code[active]
    if tets.shape[0] == 0:
        return np.empty((0, 3)), np.empty((0, 3), np.int64)

    # gather per-tet triangle corner-pair lists, flatten valid triangles
    tt = _TRIS_TABLE[code]              # [T, 2, 3, 2] local corner ids
    nt = _NTRIS[code]                   # [T]
    tri_mask = np.arange(2)[None, :] < nt[:, None]   # [T, 2]
    tri_pairs = tt[tri_mask]            # [F, 3, 2]
    tet_of_tri = np.repeat(np.arange(tets.shape[0]), nt)

    # global vertex ids of each edge endpoint
    ga = np.take_along_axis(tets[tet_of_tri], tri_pairs[..., 0], axis=1)
    gb = np.take_along_axis(tets[tet_of_tri], tri_pairs[..., 1], axis=1)

    # dedup crossing edges
    lo = np.minimum(ga, gb)
    hi = np.maximum(ga, gb)
    key = lo.astype(np.int64) * points.shape[0] + hi
    uniq, inv = np.unique(key, return_inverse=True)
    ua = (uniq // points.shape[0]).astype(np.int64)
    ub = (uniq % points.shape[0]).astype(np.int64)
    sa = sdf[ua]
    sb = sdf[ub]
    w = sa / (sa - sb)
    verts = points[ua] * (1 - w[:, None]) + points[ub] * w[:, None]
    tris = inv.reshape(-1, 3)

    # orientation: normal points from inside (positive) to outside (negative)
    v = verts[tris]
    n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    # direction toward the negative region: mean(neg corners) - mean(pos corners)
    tet_pts = points[tets[tet_of_tri]]           # [F, 4, 3]
    tet_occ = occ[tets[tet_of_tri]]              # [F, 4]
    wpos = tet_occ / np.maximum(tet_occ.sum(-1, keepdims=True), 1)
    wneg = (~tet_occ) / np.maximum((~tet_occ).sum(-1, keepdims=True), 1)
    out_dir = (tet_pts * wneg[..., None]).sum(1) - (tet_pts * wpos[..., None]).sum(1)
    flip = (n * out_dir).sum(-1) < 0
    tris[flip] = tris[flip][:, ::-1]

    return verts, tris


def grid_tetrahedra(nx: int, n: int) -> np.ndarray:
    """Tet indices for an nx x n x n grid with idx = x*n^2 + y*n + z
    (reference evaluate.py:141-172), vectorized."""
    x, y, z = np.meshgrid(np.arange(nx - 1), np.arange(n - 1), np.arange(n - 1),
                          indexing="ij")
    base = np.stack([x, y, z], axis=-1).reshape(-1, 3)  # [C, 3]
    corner_ids = ((base[:, None, :] + CUBE_CORNERS[None]) *
                  np.asarray([n * n, n, 1])).sum(-1)    # [C, 8]
    return corner_ids[:, CUBE_TETS].reshape(-1, 4).astype(np.int64)


_GRID_SDF_CACHE = {}


def _grid_sdf_fn(spec, batch: int):
    """One fixed-shape jitted program: SDF values for ``batch`` consecutive
    row-major linear indices of ANY res^3 grid over [-canvas, canvas]^3.

    The grid points are synthesized ON DEVICE from the linear index (res,
    canvas and lin0 are dynamic scalars), so a grid sweep ships a few scalars
    per step through the host<->TPU tunnel instead of uploading coordinates
    (~570 MB for one 512^3 pseudo-GT ladder; h2d is the tunnel's weak
    direction) — and every resolution and slab reuses the SAME compiled
    program (remote compiles cost minutes)."""
    key = (spec, batch)
    fn = _GRID_SDF_CACHE.get(key)
    if fn is None:
        import jax
        import jax.numpy as jnp

        from tropical.core.net import net_sdf

        @jax.jit
        def f(params, res, canvas, lin0):
            idx = lin0 + jnp.arange(batch, dtype=jnp.int32)
            r2 = res * res
            ijk = jnp.stack([idx // r2, (idx // res) % res, idx % res],
                            axis=-1)
            step = (2.0 * canvas) / (res - 1)  # f32: canvas is f32, res i32
            pts = ijk.astype(jnp.float32) * step - canvas
            return net_sdf(spec, params, pts)[:, 0]

        fn = _GRID_SDF_CACHE[key] = f
    return fn


def _sdf_grid_vals(net, res: int, canvas: float, lin0: int, count: int,
                   batch: int = 1 << 18) -> np.ndarray:
    """SDF values for row-major linear indices [lin0, lin0+count) of the
    res^3 grid over [-canvas, canvas]^3 (device-synthesized points)."""
    import jax

    if jax.default_backend() == "cpu":
        # compiles are cheap here and tests use tiny grids: host points +
        # net.sdf's own pow-2 bucketing beat one 262144-wide padded program
        s = np.linspace(-canvas, canvas, res, dtype=np.float32)
        idx = lin0 + np.arange(count)
        pts = np.stack([s[idx // (res * res)], s[(idx // res) % res],
                        s[idx % res]], axis=-1)
        return _sdf_points(net, pts)

    fn = _grid_sdf_fn(net.spec, batch)
    out = np.empty(count, np.float32)
    for i in range(0, count, batch):
        n = min(batch, count - i)
        vals = fn(net.params, res, float(canvas), lin0 + i)
        out[i:i + n] = np.asarray(vals[:n])
    return out


def _grid_sign_fn(spec, batch: int):
    """Jitted program: PACKED sign bits (sdf > 0) for ``batch`` consecutive
    row-major linear indices of any res^3 grid — uint8[batch/8], bit i of
    byte b = point ``lin0 + 8*b + i``.  The d2h pull is batch/8 bytes instead
    of batch*4: a 512^3 pseudo-GT sweep ships ~17 MB of signs through the
    ~40 MB/s tunnel instead of ~540 MB of f32 values (hours -> seconds);
    exact f32 values are then fetched only at crossing-edge endpoints
    (:func:`_sdf_grid_vals_at`), which is all marching cubes consumes."""
    assert batch % 8 == 0
    key = (spec, batch, "sign")
    fn = _GRID_SDF_CACHE.get(key)
    if fn is None:
        import jax
        import jax.numpy as jnp

        from tropical.core.net import net_sdf

        @jax.jit
        def f(params, res, canvas, lin0):
            idx = lin0 + jnp.arange(batch, dtype=jnp.int32)
            r2 = res * res
            ijk = jnp.stack([idx // r2, (idx // res) % res, idx % res],
                            axis=-1)
            step = (2.0 * canvas) / (res - 1)
            pts = ijk.astype(jnp.float32) * step - canvas
            bits = (net_sdf(spec, params, pts)[:, 0] > 0).astype(jnp.uint8)
            return (bits.reshape(-1, 8)
                    << jnp.arange(8, dtype=jnp.uint8)).sum(-1).astype(jnp.uint8)

        fn = _GRID_SDF_CACHE[key] = f
    return fn


def _sdf_grid_signs(net, res: int, canvas: float, lin0: int, count: int,
                    batch: int = 1 << 21) -> np.ndarray:
    """bool[count]: sdf > 0 at row-major linear indices [lin0, lin0+count)."""
    import jax

    if jax.default_backend() == "cpu":
        return _sdf_grid_vals(net, res, canvas, lin0, count) > 0

    fn = _grid_sign_fn(net.spec, batch)
    out = np.empty(count, bool)
    for i in range(0, count, batch):
        n = min(batch, count - i)
        packed = np.asarray(fn(net.params, res, float(canvas), lin0 + i))
        out[i:i + n] = np.unpackbits(packed, bitorder="little")[:n]
    return out


def _grid_vals_at_fn(spec, batch: int):
    """Jitted program: f32 SDF values at ``batch`` arbitrary row-major linear
    indices of a res^3 grid (points synthesized on device)."""
    key = (spec, batch, "at")
    fn = _GRID_SDF_CACHE.get(key)
    if fn is None:
        import jax
        import jax.numpy as jnp

        from tropical.core.net import net_sdf

        @jax.jit
        def f(params, res, canvas, idx):
            r2 = res * res
            ijk = jnp.stack([idx // r2, (idx // res) % res, idx % res],
                            axis=-1)
            step = (2.0 * canvas) / (res - 1)
            pts = ijk.astype(jnp.float32) * step - canvas
            return net_sdf(spec, params, pts)[:, 0]

        fn = _GRID_SDF_CACHE[key] = f
    return fn


def _sdf_grid_vals_at(net, res: int, canvas: float, lin_idx: np.ndarray,
                      batch: int = 1 << 18) -> np.ndarray:
    """f32[n] SDF values at the given row-major linear grid indices."""
    import jax

    lin_idx = np.asarray(lin_idx)
    if jax.default_backend() == "cpu":
        s = np.linspace(-canvas, canvas, res, dtype=np.float32)
        pts = np.stack([s[lin_idx // (res * res)],
                        s[(lin_idx // res) % res],
                        s[lin_idx % res]], axis=-1)
        return _sdf_points(net, pts)

    fn = _grid_vals_at_fn(net.spec, batch)
    out = np.empty(lin_idx.shape[0], np.float32)
    for i in range(0, lin_idx.shape[0], batch):
        n = min(batch, lin_idx.shape[0] - i)
        chunk = lin_idx[i:i + batch].astype(np.int32)
        if n < batch:
            chunk = np.concatenate([chunk, np.zeros(batch - n, np.int32)])
        vals = fn(net.params, res, float(canvas), chunk)
        out[i:i + n] = np.asarray(vals[:n])
    return out


def _sdf_points(net, pts: np.ndarray, batch: int = 1 << 18) -> np.ndarray:
    import jax.numpy as jnp

    import jax

    # Remote (TPU) compiles cost minutes: pad every chunk to the ONE fixed
    # batch shape so the whole eval ladder (~10 grid resolutions) reuses a
    # single compiled forward.  On CPU, compiles are cheap — net.sdf's own
    # pow-2 bucketing (padded_apply) already bounds the shape count.
    fixed = jax.default_backend() != "cpu"
    out = np.empty(pts.shape[0], np.float32)
    for i in range(0, pts.shape[0], batch):
        chunk = pts[i:i + batch]
        n = chunk.shape[0]
        if fixed and n < batch:
            chunk = np.concatenate(
                [chunk, np.zeros((batch - n, chunk.shape[1]), chunk.dtype)])
        # slice to the sdf column ON DEVICE: the pull below is the eval
        # ladder's bandwidth bill through the ~40 MB/s tunnel — halve it
        out[i:i + n] = np.asarray(net.sdf(jnp.asarray(chunk))[:, 0])[:n]
    return out


def sdf_grid(net, res: int, canvas: float) -> np.ndarray:
    """Evaluate net.sdf on a res^3 grid (reference train.py:278-283)."""
    out = np.empty((res, res, res), np.float32)
    for i in range(res):  # x-plane slabs bound host memory at res=512
        out[i] = _sdf_grid_vals(net, res, canvas, i * res * res,
                                res * res).reshape(res, res)
    return out


def run_marching_tetrahedra(net, res: int, canvas: float, R: float = 1.0,
                            slab: int = 16):
    """Grid MT baseline mesh of the net's zero level set (evaluate.py:175-194).

    Processed in x-slabs so a 512^3 grid never materializes the full 800M-tet
    array; duplicate vertices on slab boundaries (bitwise-identical positions)
    are deduplicated at the end.
    """
    import jax

    from tropical.utils.ply import Mesh

    # MT consumes the field only through signs (case codes + orientation)
    # and values at crossing-edge endpoints, all of which lie in mixed-sign
    # cubes: on accelerators pull packed sign bits for the grid and exact
    # f32 values only at mixed-cube corners (splatted over a +/-1 sign
    # fill) — identical output to the dense pull at ~1/30 the d2h transfer
    # (a 512^3 ladder would otherwise ship ~540 MB through the ~40 MB/s
    # tunnel).
    sparse = jax.default_backend() != "cpu"
    s = np.linspace(-canvas, canvas, res, dtype=np.float32)
    all_verts, all_tris = [], []
    for x0 in range(0, res - 1, slab):
        x1 = min(res - 1, x0 + slab)
        nx = x1 - x0 + 1
        gx, gy, gz = np.meshgrid(s[x0:x1 + 1], s, s, indexing="ij")
        pts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
        # pts stay host-side for the tet geometry; the SDF values come from
        # device-synthesized grid points (no coordinate h2d)
        if sparse:
            occ = _sdf_grid_signs(net, res, canvas, x0 * res * res,
                                  nx * res * res)
            o3 = occ.reshape(nx, res, res)
            csum = np.zeros((nx - 1, res - 1, res - 1), np.uint8)
            for dx, dy, dz in CUBE_CORNERS:
                csum += o3[dx:dx + nx - 1, dy:dy + res - 1, dz:dz + res - 1]
            mi, mj, mk = np.nonzero((csum > 0) & (csum < 8))
            corner = (((mi[:, None] + CUBE_CORNERS[None, :, 0]) * res
                       + (mj[:, None] + CUBE_CORNERS[None, :, 1])) * res
                      + (mk[:, None] + CUBE_CORNERS[None, :, 2]))
            uniq = np.unique(corner.ravel())
            sdf = np.where(occ, np.float32(1.0), np.float32(-1.0))
            if uniq.size:
                sdf[uniq] = _sdf_grid_vals_at(net, res, canvas,
                                              uniq + x0 * res * res)
        else:
            sdf = _sdf_grid_vals(net, res, canvas, x0 * res * res,
                                 nx * res * res)
        tets = grid_tetrahedra(nx, res)
        verts, tris = marching_tetrahedra(pts.astype(np.float64), tets, sdf)
        if len(verts):
            base = sum(len(v) for v in all_verts)
            all_verts.append(verts)
            all_tris.append(tris + base)

    if not all_verts:
        return Mesh(np.empty((0, 3)), np.empty((0, 3), np.int64))
    verts = np.concatenate(all_verts)
    tris = np.concatenate(all_tris)
    uniq, inverse = np.unique(verts, axis=0, return_inverse=True)
    return Mesh(uniq / R, inverse[tris])
