"""Edge-sharded extraction step stages (the multi-chip extrapolation test).

SURVEY §5.8 / round-3 verdict: the fused extraction engine runs single-chip,
and the claim "sharding the fused step would lose" was extrapolated from the
host loop rather than measured.  This module makes the claim testable:

- :func:`front_half_single` / :func:`front_half_sharded` — the per-edge
  data-parallel front of one insertion step (split-bit probe, candidate
  compaction, endpoint gathers, linear interpolation; device.py:426-517) as
  a standalone function and as a ``shard_map`` program whose edge pool
  (E / aliveE / EB) is sharded over the mesh's ``dp`` axis while the vertex
  stores stay replicated.  Per shard the candidates compact locally; one
  ``all_gather`` + a key-sorted merge reproduces the single-chip candidate
  block EXACTLY (tests pin bitwise equality on a virtual 8-device mesh).
  The ``psum``/``all_gather`` pair is exactly the collective pattern a fully
  sharded step would pay per insertion — its cost vs the per-shard saving is
  the crossover the design doc quantifies.
- :func:`skeleton_forward_sharded` — the skeleton's lattice forward sharded
  over x-slabs (zero communication; the genuinely parallel part of the
  pipeline).

The insertion back half (pair windows, region replica sort, appends) is
sequentially coupled through the growing vertex/edge pools; a sharded
variant would run it replicated from the gathered candidates, so its cost
does NOT shrink with chips — that asymmetry is the core of the crossover
analysis in DESIGN.md.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tropical.extract.device import _compact_lanes


def front_half_single(V, OUT, E, aliveE, EB, idx, ccap: int):
    """Split probe + candidate compaction + endpoint interpolation of one
    insertion step (device.py:426-517), pool-order candidates.

    Returns (lanes [ccap] i32 global edge ids, valid [ccap] bool, n_split,
    cd0, cd1 [ccap] f32, cand_v [ccap, 3] f32).
    """
    wi = idx >> 5
    shift = (idx & 31).astype(jnp.uint32)
    w = jax.lax.dynamic_index_in_dim(EB, wi, axis=0, keepdims=False)
    split = aliveE & ((jax.lax.shift_right_logical(w, shift)
                       & jnp.uint32(1)) > 0)
    lanes, cval, n_split = _compact_lanes(split, ccap)
    ce0 = E[lanes, 0]
    ce1 = E[lanes, 1]
    ocp = jnp.take(OUT, idx, axis=1)
    cd0 = jnp.where(cval, ocp[ce0], 0.0)
    cd1 = jnp.where(cval, ocp[ce1], 1.0)
    wgt = jnp.abs(cd0) / jnp.maximum(jnp.abs(cd1 - cd0), 1e-30)
    cand_v = jnp.where(cval[:, None],
                       V[ce0] * (1 - wgt[:, None]) + V[ce1] * wgt[:, None],
                       0.0)
    return lanes, cval, n_split, cd0, cd1, cand_v


def front_half_sharded(mesh: Mesh, ecap: int, ccap: int):
    """The same front half with the edge pool sharded over ``dp``.

    Per shard: local probe + compaction (capacity ccap per shard — capacity
    semantics differ from single-chip only through the per-shard overflow
    flag, which psum-reports).  One all_gather of the compacted candidate
    blocks + a key-sorted merge (keys = global edge ids, ascending, matching
    pool order) reconstructs the single-chip candidate block bitwise.

    Returns a jitted fn(V, OUT, E, aliveE, EB, idx) -> same tuple as
    :func:`front_half_single` plus a trailing per-shard-overflow flag.
    """
    from jax.experimental.shard_map import shard_map

    n = mesh.shape["dp"]
    assert ecap % n == 0
    es = ecap // n
    cs = min(ccap, es)

    def body(V, OUT, E, aliveE, EB, idx):
        sid = jax.lax.axis_index("dp")
        wi = idx >> 5
        shift = (idx & 31).astype(jnp.uint32)
        w = jax.lax.dynamic_index_in_dim(EB, wi, axis=0, keepdims=False)
        split = aliveE & ((jax.lax.shift_right_logical(w, shift)
                           & jnp.uint32(1)) > 0)
        lanes, cval, n_loc = _compact_lanes(split, cs)
        glanes = jnp.where(cval, lanes + sid * es, jnp.int32(ecap))
        ce0 = E[lanes, 0]            # E rows hold GLOBAL vertex ids
        ce1 = E[lanes, 1]
        ocp = jnp.take(OUT, idx, axis=1)
        cd0 = jnp.where(cval, ocp[ce0], 0.0)
        cd1 = jnp.where(cval, ocp[ce1], 1.0)
        wgt = jnp.abs(cd0) / jnp.maximum(jnp.abs(cd1 - cd0), 1e-30)
        cand_v = jnp.where(cval[:, None],
                           V[ce0] * (1 - wgt[:, None])
                           + V[ce1] * wgt[:, None], 0.0)

        ovf_loc = (split.sum() > cs).astype(jnp.int32)
        n_split = jax.lax.psum(n_loc, "dp")
        # overflow if ANY shard clipped locally OR the merged global block
        # exceeds ccap (8 x cs can exceed ccap without any shard clipping —
        # mirrors the single-chip OVF_C check; round-4 advisor finding)
        ovf = jax.lax.psum(ovf_loc, "dp") + (n_split > ccap).astype(jnp.int32)

        # merge: gather every shard's block, sort by global edge id (invalid
        # rows keyed ecap sort to the back) — single-chip candidate order
        gl = jax.lax.all_gather(glanes, "dp").reshape(-1)
        gv = jax.lax.all_gather(cval, "dp").reshape(-1)
        g0 = jax.lax.all_gather(cd0, "dp").reshape(-1)
        g1 = jax.lax.all_gather(cd1, "dp").reshape(-1)
        gx = jax.lax.all_gather(cand_v, "dp").reshape(-1, 3)
        key, sv, s0, s1, sx0, sx1, sx2 = jax.lax.sort(
            (gl, gv, g0, g1, gx[:, 0], gx[:, 1], gx[:, 2]), num_keys=1)
        key = key[:ccap]
        sv = sv[:ccap]
        out = (jnp.where(sv, key, 0), sv, n_split,
               jnp.where(sv, s0[:ccap], 0.0), jnp.where(sv, s1[:ccap], 1.0),
               jnp.where(sv[:, None], jnp.stack(
                   [sx0[:ccap], sx1[:ccap], sx2[:ccap]], -1), 0.0),
               ovf)
        return out

    edge_spec = P("dp")
    word_spec = P(None, "dp")
    rep = P()
    fn = shard_map(body, mesh=mesh,
                   in_specs=(rep, rep, edge_spec, edge_spec, word_spec, rep),
                   out_specs=rep, check_rep=False)
    return jax.jit(fn)


def shard_edge_pool(E, aliveE, EB, mesh: Mesh):
    """Place the edge pool arrays with their edge axis sharded over dp."""
    e_sh = NamedSharding(mesh, P("dp"))
    w_sh = NamedSharding(mesh, P(None, "dp"))
    return (jax.device_put(E, e_sh), jax.device_put(aliveE, e_sh),
            jax.device_put(EB, w_sh))


_SKEL_SHARDED_CACHE: dict = {}


def skeleton_sharded(net, mesh: Mesh, skel_caps: tuple, eps: float,
                     mode: str, dist_k: int):
    """PRODUCT-path initial skeleton with the lattice forward shard_map'd
    over x-slabs of the marks lattice (round-5, VERDICT task 5).

    The forward (the skeleton's FLOP/gather bulk — reference
    tropical.py:176-195) is embarrassingly parallel per lattice point:
    each chip evaluates a contiguous x-slab with the factored lattice
    encode; the edge extraction + squeeze epilogue then runs replicated on
    the gathered outputs, reusing the exact single-chip device helpers
    (`_eps_sign` / `_edges_from_sgn` / `_squeeze_edges`).  The resulting
    skeleton matches single-chip in counts and edge topology; coordinates
    and outputs agree to fp tolerance only — the shard_map'd forward is a
    different XLA program over different shapes, and XLA guarantees no
    bitwise reproducibility across partitionings, so downstream sliver
    polygons may flip a fan pivot (quantified contract pinned by
    tests/test_parallel.py, same shape as the device/host faces contract).

    Returns (V, OUT, E, n_verts, n_edges, ovf) like the device skeleton fns.
    """
    from jax.experimental.shard_map import shard_map

    from tropical.extract import device as dev

    spec = net.spec
    M = int(net.marks.shape[0])
    ndp = int(mesh.shape["dp"])
    Mp = -(-M // ndp) * ndp
    R = dev.R_COLS

    key = (spec, M, ndp, mode, dist_k, tuple(skel_caps), eps,
           tuple(sorted(mesh.shape.items())))
    if key not in _SKEL_SHARDED_CACHE:
        def fwd_body(params, xw, yw, zw):
            if mode == "dist":
                return dev._sdf_dist_grad_lattice(spec, params, xw, yw, zw)
            from tropical.core.net import net_outputs_lattice
            out = net_outputs_lattice(spec, params, xw, yw, zw)
            z = jnp.zeros((out.shape[0],), jnp.float32)
            return out, z, z

        fwd = jax.jit(shard_map(
            fwd_body, mesh=mesh,
            in_specs=(P(), P("dp"), P(), P()),
            out_specs=(P("dp"), P("dp"), P("dp")), check_rep=False))

        SV, SE = skel_caps

        @jax.jit
        def epilogue(out, dq, gn, marks):
            # slice the padded slabs off, then run the exact single-chip
            # edge + squeeze stages (per-point math already identical: the
            # sharded forward evaluates the same f32 ops per lattice point)
            out = out.reshape(Mp, M, M, R)[:M]
            keepv = None
            if mode == "dist":
                keepv = dev._lipschitz_keepv(
                    dq.reshape(Mp, M, M)[:M], gn.reshape(Mp, M, M)[:M],
                    marks, dist_k)
            sgn = dev._eps_sign(out.reshape(-1, R), eps) \
                .astype(jnp.int8).reshape(M, M, M, R)
            mask, ea, eb = dev._edges_from_sgn(sgn, M, keepv)
            return dev._squeeze_edges(
                spec, mask, ea, eb, M, SV, SE,
                lattice_out=out.reshape(M * M * M, R), marks=marks)

        _SKEL_SHARDED_CACHE[key] = (fwd, epilogue)

    fwd, epilogue = _SKEL_SHARDED_CACHE[key]
    import numpy as np
    mk = np.asarray(net.marks)
    xs = np.concatenate([mk, np.full(Mp - M, mk[-1], mk.dtype)])
    scale = spec.scale
    xw = jnp.asarray(xs * (scale * 2) - scale)
    aw = net.marks * (scale * 2) - scale
    out, dq, gn = fwd(net.params, xw, aw, aw)
    return epilogue(out, dq, gn, net.marks)


def skeleton_forward_sharded(spec, mesh: Mesh):
    """The skeleton's lattice forward sharded over x-slabs (dp): each chip
    evaluates its contiguous slab of the marks lattice with the factored
    encode — zero communication, linear speedup expected (DESIGN.md
    'sharded extraction' section).

    Returns fn(params, xw, yw, zw) -> [Nx*Ny*Nz, R] with xw length divisible
    by the dp size.
    """
    from jax.experimental.shard_map import shard_map

    from tropical.core.net import net_outputs_lattice

    def body(params, xw, yw, zw):
        return net_outputs_lattice(spec, params, xw, yw, zw)

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(), P("dp"), P(), P()),
                   out_specs=P("dp"), check_rep=False)
    return jax.jit(fn)
