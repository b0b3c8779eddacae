"""True marching cubes with programmatically derived 256-case tables.

The reference's evaluation protocol keys off marching-cubes pseudo-GT
(reference train.py:276-293 and evaluate.py:119-137, both via ``pymcubes``,
which does not ship in this image).  Instead of embedding a third-party
table, the full 256-entry triangle table is derived here from first
principles by walking face loops:

- per cube face, the cut boundary edges bounding each maximal cyclic run of
  *inside* corners are joined by a surface segment (a fixed convention for
  the 4-cut ambiguous face, so neighbouring cubes always agree — unlike the
  original Lorensen-Cline table, this cannot produce cracks),
- every cut edge lies on exactly two faces, so segments chain into closed
  loops; each loop is fan-triangulated,
- orientation: triangle normals point from the positive (inside) region
  toward the negative region, matching the extraction engine's outward
  winding and the MT baseline in :mod:`tropical.utils.isosurface`.

Vertices sit on grid edges at the linearly interpolated zero crossing —
identical vertex positions to any standard MC implementation; only the
triangulation of ambiguous cases may differ (CD/AD are insensitive to that,
and the result here is watertight per construction).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# corner c -> offset (bit0 = x, bit1 = y, bit2 = z)
_CORNER_OFF = np.stack([(np.arange(8) >> a) & 1 for a in range(3)],
                       axis=-1).astype(np.int64)  # [8, 3]

# 12 edges, axis-major: for each axis, the 4 corners with that bit clear
_EDGES = []  # (corner_lo, axis)
for _a in range(3):
    for _c in range(8):
        if not (_c >> _a) & 1:
            _EDGES.append((_c, _a))
_EDGE_LO = np.asarray([c for c, _ in _EDGES], np.int64)      # [12]
_EDGE_AXIS = np.asarray([a for _, a in _EDGES], np.int64)    # [12]
_EDGE_HI = _EDGE_LO | (1 << _EDGE_AXIS)
_EDGE_ID = {(int(c), int(a)): i for i, (c, a) in enumerate(_EDGES)}


def _face_cycles():
    """For each of the 6 faces: (4 corners in cyclic order, outward normal)."""
    faces = []
    for axis in range(3):
        u, v = [a for a in range(3) if a != axis]
        for side in range(2):
            cyc = []
            for du, dv in ((0, 0), (1, 0), (1, 1), (0, 1)):
                c = (side << axis) | (du << u) | (dv << v)
                cyc.append(c)
            fn = np.zeros(3)
            fn[axis] = 1.0 if side else -1.0
            faces.append((cyc, fn))
    return faces


_FACES = _face_cycles()


def _edge_of(ca: int, cb: int) -> int:
    lo, hi = min(ca, cb), max(ca, cb)
    axis = (lo ^ hi).bit_length() - 1
    return _EDGE_ID[(lo, axis)]


def _edge_mid(e: int) -> np.ndarray:
    return 0.5 * (_CORNER_OFF[_EDGE_LO[e]] + _CORNER_OFF[_EDGE_HI[e]])


def _case_loops(code: int):
    """Directed closed loops of cut-edge ids for one corner-sign code
    (bit c set = corner c inside).

    The isosurface's intersection with the cube surface is the oriented
    boundary of the inside region on that surface.  Per face, the segment
    bounding each maximal cyclic run of inside corners is DIRECTED so the
    inside lies to the left of the travel direction when viewed down the
    outward face normal (t = fn x s with s pointing from the segment toward
    the inside corners).  A neighbouring cube sees the same face with the
    opposite outward normal, so it directs the shared segment oppositely —
    orientation is globally consistent (each directed mesh edge appears
    exactly once) with no geometric normal estimation at all.
    """
    inside = [(code >> c) & 1 for c in range(8)]
    nxt: dict = {}
    for cyc, fn in _FACES:
        s = [inside[c] for c in cyc]
        cuts = [i for i in range(4) if s[i] != s[(i + 1) % 4]]
        if not cuts:
            continue
        for i in cuts:
            if s[(i + 1) % 4] != 1:
                continue  # the run after this cut is outside; handled once
            j = (i + 1) % 4
            run = [cyc[j]]
            while s[(j + 1) % 4] == 1:
                j = (j + 1) % 4
                run.append(cyc[j])
            ea = _edge_of(cyc[i], cyc[(i + 1) % 4])
            eb = _edge_of(cyc[j], cyc[(j + 1) % 4])
            ma, mb = _edge_mid(ea), _edge_mid(eb)
            m_in = _CORNER_OFF[run].mean(0)
            t = np.cross(fn, m_in - 0.5 * (ma + mb))
            if float((mb - ma) @ t) > 0:
                nxt[ea] = eb
            else:
                nxt[eb] = ea

    # each cut edge has exactly one outgoing and one incoming segment ->
    # the next-pointers decompose into disjoint directed cycles
    loops = []
    seen = set()
    for start in sorted(nxt):
        if start in seen:
            continue
        loop = [start]
        seen.add(start)
        cur = nxt[start]
        while cur != start:
            loop.append(cur)
            seen.add(cur)
            cur = nxt[cur]
        loops.append(loop)
    return loops


def _build_tables() -> Tuple[np.ndarray, np.ndarray]:
    """(tri_table [256, MAXT, 3] edge ids with -1 pad, ntris [256])."""
    all_tris = []
    for code in range(256):
        loops = _case_loops(code)
        tris = []
        for loop in loops:
            for k in range(1, len(loop) - 1):
                tris.append((loop[0], loop[k], loop[k + 1]))
        all_tris.append(tris)
    maxt = max(len(t) for t in all_tris)
    table = np.full((256, maxt, 3), -1, np.int64)
    ntris = np.zeros(256, np.int64)
    for code, tris in enumerate(all_tris):
        ntris[code] = len(tris)
        for i, t in enumerate(tris):
            table[code, i] = t
    return table, ntris


_TRI_TABLE, _NTRIS = _build_tables()


def marching_cubes(vals: np.ndarray, xs: np.ndarray, ys: np.ndarray,
                   zs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Zero level set of ``vals`` [nx, ny, nz] over the rectilinear grid
    (xs, ys, zs); inside = vals > 0.  Returns (vertices [V,3] f64,
    triangles [F,3] i64) with per-edge-deduplicated vertices.
    """
    vals = np.asarray(vals, np.float64)

    def fetch(pi, pj, pk, qi, qj, qk):
        return vals[pi, pj, pk], vals[qi, qj, qk]

    return _marching_cubes_core(vals > 0, xs, ys, zs, fetch)


def marching_cubes_signs(occ: np.ndarray, xs: np.ndarray, ys: np.ndarray,
                         zs: np.ndarray, vals_at) -> Tuple[np.ndarray,
                                                           np.ndarray]:
    """Marching cubes from an occupancy grid (``occ`` [nx,ny,nz] bool,
    True = vals > 0) plus a value oracle ``vals_at(lin)`` returning the field
    at row-major linear indices of the SAME local grid.  MC consumes values
    ONLY at crossing-edge endpoints, so this produces bitwise-identical
    output to :func:`marching_cubes` on the dense field while fetching a few
    thousand values instead of nx*ny*nz — the device path uses it to avoid
    pulling a 512^3 f32 grid through the host<->TPU tunnel."""
    ny, nz = occ.shape[1], occ.shape[2]

    def fetch(pi, pj, pk, qi, qj, qk):
        la = (pi * ny + pj) * nz + pk
        lb = (qi * ny + qj) * nz + qk
        v = np.asarray(vals_at(np.concatenate([la, lb])), np.float64)
        return v[:la.shape[0]], v[la.shape[0]:]

    return _marching_cubes_core(np.asarray(occ, bool), xs, ys, zs, fetch)


def _marching_cubes_core(occ: np.ndarray, xs, ys, zs, fetch
                         ) -> Tuple[np.ndarray, np.ndarray]:
    nx, ny, nz = occ.shape

    code = np.zeros((nx - 1, ny - 1, nz - 1), np.uint8)
    for c in range(8):
        dx, dy, dz = _CORNER_OFF[c]
        code |= (occ[dx:dx + nx - 1, dy:dy + ny - 1, dz:dz + nz - 1]
                 .astype(np.uint8) << c)

    active = np.nonzero(_NTRIS[code.reshape(-1)] > 0)[0]
    if active.size == 0:
        return np.empty((0, 3)), np.empty((0, 3), np.int64)
    acode = code.reshape(-1)[active]

    # cube base point (i, j, k) of each active cube
    ci = active // ((ny - 1) * (nz - 1))
    cj = (active // (nz - 1)) % (ny - 1)
    ck = active % (nz - 1)

    # triangles as (active-cube row, local edge id)
    tt = _TRI_TABLE[acode]                     # [A, MAXT, 3]
    nt = _NTRIS[acode]
    tri_mask = np.arange(tt.shape[1])[None, :] < nt[:, None]
    tri_edges = tt[tri_mask]                   # [F, 3] local edge ids
    cube_of_tri = np.repeat(np.arange(active.size), nt)

    # global edge key = axis * npts + linear index of the edge's low point
    npts = nx * ny * nz
    lo_off = _CORNER_OFF[_EDGE_LO]             # [12, 3]
    gi = ci[:, None] + lo_off[None, :, 0]
    gj = cj[:, None] + lo_off[None, :, 1]
    gk = ck[:, None] + lo_off[None, :, 2]
    gkey = (_EDGE_AXIS[None, :] * npts
            + (gi * ny + gj) * nz + gk)        # [A, 12]

    tri_keys = np.take_along_axis(gkey[cube_of_tri], tri_edges, axis=1)
    uniq, inv = np.unique(tri_keys, return_inverse=True)

    # interpolate each unique crossing
    axis = uniq // npts
    lin = uniq % npts
    pi = lin // (ny * nz)
    pj = (lin // nz) % ny
    pk = lin % nz
    step = np.stack([axis == 0, axis == 1, axis == 2], -1).astype(np.int64)
    qi, qj, qk = pi + step[:, 0], pj + step[:, 1], pk + step[:, 2]
    va, vb = fetch(pi, pj, pk, qi, qj, qk)
    t = va / (va - vb)
    pa = np.stack([xs[pi], ys[pj], zs[pk]], -1)
    pb = np.stack([xs[qi], ys[qj], zs[qk]], -1)
    verts = pa * (1 - t[:, None]) + pb * t[:, None]
    tris = inv.reshape(-1, 3)
    return verts, tris


def run_marching_cubes(net, res: int, canvas: float, R: float = 1.0,
                       slab: int = 16):
    """MC mesh of the net's zero level set on a res^3 grid (reference
    train.py:276-293 protocol: grid over [-canvas, canvas]^3, vertices
    divided by the dataset scale R).  x-slab streamed like the MT baseline
    so a 512^3 field never materializes at once; slab-boundary duplicates
    (bitwise-identical positions) are deduplicated at the end."""
    import jax

    from tropical.utils.isosurface import (_sdf_grid_signs,
                                           _sdf_grid_vals,
                                           _sdf_grid_vals_at)
    from tropical.utils.ply import Mesh

    # On accelerators the d2h tunnel (~40 MB/s) is the eval ladder's wall:
    # pull packed sign bits for the whole grid (res^3/8 bytes) and exact f32
    # values only at crossing-edge endpoints — bitwise-identical mesh to the
    # dense path at ~1/30 the transfer.
    import os
    import sys
    import time

    trace = os.environ.get("TROPICAL_PROFILE")

    def note(msg):
        if trace:
            print(f"[mc res={res}] {msg} t={time.time():.1f}",
                  file=sys.stderr, flush=True)

    # engine routing: "device" fuses forward+topology into one dispatch per
    # slab and pulls only compacted buffers (accelerator default);
    # "sparse" = packed signs + host topology; "host" = dense-vals topology
    engine = os.environ.get("TROPICAL_MC_ENGINE", "")
    if engine == "device" or (jax.default_backend() != "cpu"
                              and engine not in ("sparse", "host")):
        from tropical.utils.mc_device import run_marching_cubes_device
        return run_marching_cubes_device(net, res, canvas, R, note=note)

    sparse = jax.default_backend() != "cpu" and engine != "host"
    s = np.linspace(-canvas, canvas, res, dtype=np.float32)
    all_verts, all_tris = [], []
    for x0 in range(0, res - 1, slab):
        x1 = min(res - 1, x0 + slab)
        nxs = x1 - x0 + 1
        if sparse:
            note(f"slab {x0} signs")
            occ = _sdf_grid_signs(net, res, canvas, x0 * res * res,
                                  nxs * res * res).reshape(nxs, res, res)
            note(f"slab {x0} topo+vals")
            verts, tris = marching_cubes_signs(
                occ, s[x0:x1 + 1], s, s,
                lambda lin: _sdf_grid_vals_at(net, res, canvas,
                                              lin + x0 * res * res))
            note(f"slab {x0} done ({len(verts)} verts)")
        else:
            # SDF values from device-synthesized grid points (no coordinate
            # h2d); the MC geometry below only needs the 1-D axis arrays
            vals = _sdf_grid_vals(net, res, canvas, x0 * res * res,
                                  nxs * res * res).reshape(nxs, res, res)
            verts, tris = marching_cubes(vals, s[x0:x1 + 1], s, s)
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
