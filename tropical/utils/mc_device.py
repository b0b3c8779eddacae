"""Single-dispatch marching-cubes slabs: SDF lattice forward + full MC
topology fused into ONE jitted program per slab, returning only COMPACTED
buffers (crossing-edge keys + endpoint values, triangle index triples).

Why: the eval ladder's pseudo-GT (reference train.py:276-293 protocol) was
wall-clocked by two host-side costs the packed-sign path still paid —
numpy topology over every slab cell (~1 s per 4M-cell slab on this image's
single core) and a second crossing-endpoint value fetch per slab (~25 ms
tunnel RTT each).  This module moves case-code derivation, active-cube and
crossing-edge compaction, and triangle emission onto the device; the host
pulls `n_edges` keys/values and `n_tris` index rows (a few MB per 512^3
sweep) and only runs the f64 interpolation arithmetic.

Output contract: BITWISE-identical topology to the host path
(:func:`tropical.utils.marching_cubes._marching_cubes_core`) given the same
values lattice — same crossing-edge set in the same (axis-major, row-major)
order as numpy's sorted ``np.unique(tri_keys)``, same triangle order
(active cubes row-major x table order), same f32 endpoint values handed to
the same f64 interpolation.  The values themselves come from the factored
lattice forward (:func:`tropical.core.net.net_sdf_lattice`), which agrees
with the pointwise forward to f32 rounding; tests pin the topology bitwise
and the end-to-end meshes through the shared interpolation.
"""

from __future__ import annotations

import numpy as np

from tropical.utils.marching_cubes import (_CORNER_OFF, _EDGE_AXIS, _EDGE_LO,
                                           _NTRIS, _TRI_TABLE)

_MAXT = _TRI_TABLE.shape[1]

_FN_CACHE = {}


def _topology(vals, cmin, ecap: int, ccap: int, tcap: int):
    """Traced MC topology over a values lattice ``vals`` [nxs, res, res]:
    compacted crossing edges (keys + endpoint values) and triangles.

    Pure function of its arguments — tests jit it directly on a pinned
    lattice to check bitwise agreement with the host topology.  ``cmin``
    masks cubes below that local x-layer (final-slab overlap dedup).
    Returns (meta [n_edges, n_tris, ovf, n_active], keys [ecap] i32,
    va [ecap], vb [ecap] f32, tris [tcap, 3] i32).
    """
    import jax.numpy as jnp

    nxs, res = vals.shape[0], vals.shape[1]
    TT = jnp.asarray(_TRI_TABLE, jnp.int32)                 # [256, MAXT, 3]
    NT = jnp.asarray(_NTRIS, jnp.int32)                     # [256]
    EAX = jnp.asarray(_EDGE_AXIS, jnp.int32)                # [12]
    ELO = jnp.asarray(_CORNER_OFF[_EDGE_LO], jnp.int32)     # [12, 3]
    npts = nxs * res * res
    ncubes = (nxs - 1) * (res - 1) * (res - 1)
    occ = vals > 0

    # --- crossing edges, axis-major flat order == numpy's sorted keys
    # (key = axis*npts + row-major lin of the low endpoint)
    mx = jnp.zeros((nxs, res, res), bool) \
        .at[:nxs - 1].set(occ[:-1] != occ[1:])
    my = jnp.zeros((nxs, res, res), bool) \
        .at[:, :res - 1].set(occ[:, :-1] != occ[:, 1:])
    mz = jnp.zeros((nxs, res, res), bool) \
        .at[:, :, :res - 1].set(occ[:, :, :-1] != occ[:, :, 1:])
    mask = jnp.concatenate([mx.reshape(-1), my.reshape(-1), mz.reshape(-1)])
    cnt = jnp.cumsum(mask.astype(jnp.int32))
    n_e = cnt[-1]
    rank = cnt - 1                                           # [3*npts]
    pos = jnp.arange(3 * npts, dtype=jnp.int32)
    keys = jnp.zeros(ecap, jnp.int32).at[
        jnp.where(mask & (rank < ecap), rank, ecap)].set(pos, mode="drop")
    axis = keys // npts
    lin = keys % npts
    stride = jnp.where(axis == 0, res * res, jnp.where(axis == 1, res, 1))
    vf = vals.reshape(-1)
    va = jnp.take(vf, lin, mode="clip")
    vb = jnp.take(vf, jnp.minimum(lin + stride, npts - 1), mode="clip")

    # --- cube case codes (bit c = corner c inside), active compaction
    code = jnp.zeros((nxs - 1, res - 1, res - 1), jnp.int32)
    for c in range(8):
        dx, dy, dz = (int(v) for v in _CORNER_OFF[c])
        code = code | (occ[dx:dx + nxs - 1, dy:dy + res - 1,
                           dz:dz + res - 1].astype(jnp.int32) << c)
    codef = code.reshape(-1)
    cpos = jnp.arange(ncubes, dtype=jnp.int32)
    ci_full = cpos // ((res - 1) * (res - 1))
    ntf = jnp.take(NT, codef, mode="clip")
    act = (ntf > 0) & (ci_full >= cmin)
    acnt = jnp.cumsum(act.astype(jnp.int32))
    n_a = acnt[-1]
    # TRUE triangle total (independent of the cube compaction capacity, so
    # one overflow retry sizes every cap correctly)
    n_t_true = jnp.where(act, ntf, 0).sum()
    arank = acnt - 1
    scat = jnp.where(act & (arank < ccap), arank, ccap)
    ccode = jnp.zeros(ccap, jnp.int32).at[scat].set(codef, mode="drop")
    cidx = jnp.zeros(ccap, jnp.int32).at[scat].set(cpos, mode="drop")

    # --- triangle emission: per active cube, table rows -> global edge keys
    # -> compact edge indices, compacted in (cube, table-row) order
    ci = cidx // ((res - 1) * (res - 1))
    cj = (cidx // (res - 1)) % (res - 1)
    ck = cidx % (res - 1)
    te = jnp.take(TT, ccode, axis=0)                         # [C, MAXT, 3]
    ntc = jnp.take(NT, ccode, mode="clip")                   # [C]
    tec = jnp.maximum(te, 0)                                 # -1 pads -> 0
    eax = jnp.take(EAX, tec, mode="clip")
    off = jnp.take(ELO, tec, axis=0, mode="clip")            # [C, MAXT, 3, 3]
    gi = ci[:, None, None] + off[..., 0]
    gj = cj[:, None, None] + off[..., 1]
    gk = ck[:, None, None] + off[..., 2]
    gkey = eax * npts + (gi * res + gj) * res + gk
    eind = jnp.take(rank, gkey, mode="clip")                 # compact edge id
    tmask = (jnp.arange(_MAXT, dtype=jnp.int32)[None, :]
             < ntc[:, None]).reshape(-1)
    tcnt = jnp.cumsum(tmask.astype(jnp.int32))
    n_t = tcnt[-1]
    trank = tcnt - 1
    tris = jnp.zeros((tcap, 3), jnp.int32).at[
        jnp.where(tmask & (trank < tcap), trank, tcap)].set(
        eind.reshape(-1, 3), mode="drop")

    ovf = jnp.where(n_e > ecap, 1, 0) | jnp.where(n_a > ccap, 2, 0) \
        | jnp.where(n_t_true > tcap, 4, 0)
    meta = jnp.stack([n_e, n_t_true, ovf, n_a])
    return meta, keys, va, vb, tris


def _mc_slab_fn(spec, nxs: int, res: int, ecap: int, ccap: int, tcap: int):
    """The fused forward+topology slab program (memoized per static config).

    Dynamic args: (params, tables, xw [nxs] f32 — the slab's slice of the
    HOST linspace axis, yw [res] f32 — the full axis, cmin i32 — first local
    cube x-layer to emit).  The host linspace is passed in rather than
    re-synthesized on device so the SDF is sampled at EXACTLY the coordinates
    :func:`interp_edge_keys` later interpolates between (a device-side
    ``(x0+i)*step - canvas`` differs from ``np.linspace`` by ~1 ulp —
    round-4 advisor finding).
    """
    key = (spec, nxs, res, ecap, ccap, tcap)
    fn = _FN_CACHE.get(key)
    if fn is not None:
        return fn

    import jax

    from tropical.core.net import net_sdf_lattice

    @jax.jit
    def f(params, tables, xw, yw, cmin):
        vals = net_sdf_lattice(spec, params, xw, yw, yw, tables=tables) \
            .reshape(nxs, res, res)
        return _topology(vals, cmin, ecap, ccap, tcap)

    _FN_CACHE[key] = f
    return f


def _pow2(n: int) -> int:
    return 1 << max(0, int(n - 1).bit_length())


def _pull_compact(arr, n: int, cap: int):
    """Pull the first ``n`` rows through a pow-2-padded device slice (one
    compiled slice program per bucket instead of a full-capacity pull)."""
    if n <= 0:
        return np.asarray(arr[:0])
    n2 = min(cap, _pow2(n))
    return np.asarray(arr[:n2])[:n]


_SLICE4_CACHE = {}


def _pull4(keys, va, vb, tris, n_e: int, n_t: int, ecap: int, tcap: int):
    """Slice all four output buffers to their pow-2 buckets in ONE jitted
    dispatch (one RTT instead of four), queue the d2h copies async so the
    four transfers pipeline, then block."""
    import jax

    ne2 = min(ecap, _pow2(max(n_e, 1)))
    nt2 = min(tcap, _pow2(max(n_t, 1)))
    k = (keys.shape, tris.shape, ne2, nt2)
    if k not in _SLICE4_CACHE:
        _SLICE4_CACHE[k] = jax.jit(
            lambda a, b, c, d, ne=ne2, nt=nt2:
            (a[:ne], b[:ne], c[:ne], d[:nt]))
    outs = _SLICE4_CACHE[k](keys, va, vb, tris)
    for o in outs:
        try:
            o.copy_to_host_async()
        except Exception:  # backend without async copies: asarray blocks
            pass
    ks, vas, vbs, trs = (np.asarray(o) for o in outs)
    return ks[:n_e], vas[:n_e], vbs[:n_e], trs[:n_t]


def _slab_width(res: int, max_pts: int) -> int:
    return max(2, min(res, max_pts // (res * res)))


def mc_slabs_device(net, res: int, canvas: float, max_pts: int = 1 << 24,
                    note=lambda msg: None, ecap0: int | None = None):
    """Yield per-slab ``(x0, keys, va, vb, tris)`` host arrays for the res^3
    grid sweep — each slab one fused device dispatch + compacted pulls.

    ``keys`` are axis*npts + row-major lin within the slab's LOCAL
    [nxs, res, res] point block (identical to the host path's keys);
    ``tris`` index into that slab's keys.

    Round-5 ladder cuts (VERDICT task 3): slab ``i+1``'s device program is
    dispatched BEFORE slab ``i``'s results are pulled, so device compute
    overlaps the host's tunnel pulls + f64 interpolation; the four output
    buffers ride one jitted slicer + pipelined async copies (1 RTT, not 4);
    ``max_pts`` doubled to 1<<24 (halves the slab/dispatch count at 512 and
    makes 256^3 a SINGLE whole-grid dispatch; peak forward footprint ~2.5 GB
    of the chip's 16)."""
    from tropical.core.hashgrid import lattice_tables

    spec = net.spec
    nxs = _slab_width(res, max_pts)
    s = np.linspace(-canvas, canvas, res, dtype=np.float32)
    tables = tuple(lattice_tables(spec.grid, net.params["table"],
                                  nxs * res * res))
    # crossing edges scale with the surface area inside the slab: ~2-3.5x
    # res^2 for a whole-grid slab (observed 52k at 128^3 sphere), well under
    # 2x res^2 per 32-wide slab at 512 — generous caps cost only output
    # buffer memory, while an overflow retry costs a fresh remote compile
    ecap = ecap0 or _pow2(max(1 << 13,
                              (6 if nxs == res else 2) * res * res))
    ccap, tcap = ecap, 2 * ecap

    starts = []
    x0 = 0
    while x0 < res - 1:
        starts.append(x0)
        x0 += nxs - 1

    def dispatch(x0):
        cmin = 0
        if x0 + nxs > res:
            # final slab: shift back to fit and emit only the cube layers
            # the previous slabs have not covered (local x >= cmin)
            cmin = (x0 + nxs) - res
            x0 = res - nxs
        fn = _mc_slab_fn(spec, nxs, res, ecap, ccap, tcap)
        meta, keys, va, vb, tris = fn(net.params, tables,
                                      s[x0:x0 + nxs], s, cmin)
        try:
            meta.copy_to_host_async()
        except Exception:
            pass
        return x0, meta, keys, va, vb, tris

    pending = dispatch(starts[0]) if starts else None
    for si in range(len(starts)):
        x0, meta, keys, va, vb, tris = pending
        # queue the NEXT slab's program before blocking on this slab's
        # meta/pulls: its device compute rides behind our host work.  (If
        # this slab overflows and grows the caps, the prefetched next slab
        # still runs with the old caps and will itself retry — wasted work
        # only on the rare ramp run.)
        pending = dispatch(starts[si + 1]) if si + 1 < len(starts) else None
        for _attempt in range(4):
            n_e, n_t, ovf, n_a = (int(v) for v in np.asarray(meta))
            if not ovf:
                break
            # meta reports TRUE counts even when the scatters dropped rows:
            # jump straight to fitting caps (one retry in the common case)
            ecap = max(ecap, _pow2(n_e))
            ccap = max(ccap, _pow2(n_a))
            tcap = max(tcap, _pow2(n_t))
            note(f"slab {x0} caps overflow {ovf}; -> {ecap}/{ccap}/{tcap}")
            x0, meta, keys, va, vb, tris = dispatch(starts[si])
        else:
            raise RuntimeError("mc_device: caps overflow after retries")
        if n_t == 0:
            # nothing referenced: skip the edge pulls entirely (an overlapped
            # final slab still compacts the covered layers' crossings)
            empty = np.empty(0, np.float32)
            yield (x0, np.empty(0, np.int32), empty, empty,
                   np.empty((0, 3), np.int32))
        else:
            yield (x0, *_pull4(keys, va, vb, tris, n_e, n_t, ecap, tcap))
        note(f"slab {x0} done ({n_e} edges, {n_t} tris)")


def interp_edge_keys(keys: np.ndarray, va: np.ndarray, vb: np.ndarray,
                     xs: np.ndarray, ys: np.ndarray, zs: np.ndarray
                     ) -> np.ndarray:
    """f64 crossing positions for edge ``keys`` (axis*npts + lin of the low
    endpoint) given endpoint values — the exact interpolation arithmetic of
    :func:`tropical.utils.marching_cubes._marching_cubes_core`."""
    nx, ny, nz = len(xs), len(ys), len(zs)
    npts = nx * ny * nz
    axis = keys.astype(np.int64) // npts
    lin = keys.astype(np.int64) % npts
    pi = lin // (ny * nz)
    pj = (lin // nz) % ny
    pk = lin % nz
    step = np.stack([axis == 0, axis == 1, axis == 2], -1).astype(np.int64)
    qi, qj, qk = pi + step[:, 0], pj + step[:, 1], pk + step[:, 2]
    va = np.asarray(va, np.float64)
    vb = np.asarray(vb, np.float64)
    t = va / (va - vb)
    pa = np.stack([xs[pi], ys[pj], zs[pk]], -1).astype(np.float64)
    pb = np.stack([xs[qi], ys[qj], zs[qk]], -1).astype(np.float64)
    return pa * (1 - t[:, None]) + pb * t[:, None]


def run_marching_cubes_device(net, res: int, canvas: float, R: float = 1.0,
                              max_pts: int = 1 << 24, note=lambda msg: None,
                              ecap0: int | None = None):
    """Device-topology MC mesh of the net's zero level set — the accelerator
    path of :func:`tropical.utils.marching_cubes.run_marching_cubes` (same
    grid protocol, same final cross-slab vertex dedup)."""
    from tropical.utils.ply import Mesh

    s = np.linspace(-canvas, canvas, res, dtype=np.float32)
    nxs = _slab_width(res, max_pts)
    all_verts, all_tris = [], []
    for x0, keys, va, vb, tris in mc_slabs_device(net, res, canvas, max_pts,
                                                  note=note, ecap0=ecap0):
        if keys.shape[0] == 0 or tris.shape[0] == 0:
            continue
        # the final (overlapped) slab's edge pass also compacts crossings in
        # the cube layers masked by cmin — drop edges no triangle references
        # so no dead vertices enter the mesh (regular slabs: every crossing
        # edge is referenced by construction; this is a no-op)
        used = np.zeros(keys.shape[0], bool)
        used[tris] = True
        if not used.all():
            remap = np.cumsum(used) - 1
            keys, va, vb = keys[used], va[used], vb[used]
            tris = remap[tris]
        verts = interp_edge_keys(keys, va, vb, s[x0:x0 + nxs], s, s)
        base = sum(len(v) for v in all_verts)
        all_verts.append(verts)
        all_tris.append(tris.astype(np.int64) + base)

    if not all_verts:
        return Mesh(np.empty((0, 3)), np.empty((0, 3), np.int64))
    verts = np.concatenate(all_verts)
    tris = np.concatenate(all_tris)
    uniq, inverse = np.unique(verts, axis=0, return_inverse=True)
    return Mesh(uniq / R, inverse[tris])
