"""The edge-subdivision extraction engine.

Port of reference tropical/subpoly.py:23-279: starting from the hash-grid
skeleton, every neuron's folding hypersurface is inserted sequentially (the
(L-1)*H hidden neurons, then the final SDF plane); each insertion splits
sign-crossing edges, solves trilinear intersections for curved edges, adds
connecting edges among coplanar same-region vertices, and prunes edges whose
endpoints share identical future sign vectors.

Orchestration runs on host (data-dependent shapes); all network evaluations,
intersection solves and distance math run on TPU through the bucketed jitted
kernels of :mod:`tropical.core.net` / :mod:`tropical.core.trilinear`.
"""

from __future__ import annotations

import os
import time
from typing import Tuple

import numpy as np

from tropical.core import regions as rg
from tropical.extract import failover as fo
from tropical.extract import stats
from tropical.extract.faces import extract_faces, extract_skeleton
from tropical.extract.skeleton import get_hypercube, grid_skeleton
from tropical.utils.profiling import Phases

PHASES = Phases()


from tropical.extract.common import host_region, net_outputs as _net_outputs


_INTS_JIT = None


def _intersections(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    global _INTS_JIT
    import jax
    import jax.numpy as jnp

    from tropical.core.buffers import padded_apply
    from tropical.core.trilinear import intersection_of_two_planes

    if _INTS_JIT is None:
        _INTS_JIT = jax.jit(intersection_of_two_planes)
    return np.asarray(padded_apply(
        lambda pp, qq: _INTS_JIT(pp, qq), jnp.asarray(p), jnp.asarray(q)))


def _corner_points_np(e: np.ndarray) -> np.ndarray:
    """Host-side corner expansion (idx = 4i+2j+k -> (x_k, y_j, z_i))."""
    out = np.empty((e.shape[0], 8, 3), e.dtype)
    for i in range(2):
        for j in range(2):
            for k in range(2):
                out[:, 4 * i + 2 * j + k, 0] = e[:, k, 0]
                out[:, 4 * i + 2 * j + k, 1] = e[:, j, 1]
                out[:, 4 * i + 2 * j + k, 2] = e[:, i, 2]
    return out


def subpoly_(vertices: np.ndarray, edges: np.ndarray, net, l: int, h: int,
             eps: float, outputs_: np.ndarray | None = None,
             pruning: bool = True, strict: bool = True, force: bool = False):
    """One hyperplane insertion (reference subpoly.py:90-279)."""
    if outputs_ is None:
        outputs_ = _net_outputs(net, vertices)
    else:
        assert outputs_.shape[0] == vertices.shape[0]

    idx = l * net.num_hidden + h
    outputs = outputs_[:, idx]

    # 1. subdivide edges: strict sign change, both endpoints off-plane
    d = outputs[edges]
    m = (d[:, 0] * d[:, 1]) < 0
    m &= (np.abs(d[:, 0]) > eps) & (np.abs(d[:, 1]) > eps)

    if m.sum() == 0:
        return vertices, edges, outputs_

    dm = d[m]
    e = vertices[edges][m]  # [N, 2, 3]

    # 1-1. linear interpolation weights
    w = np.abs(dm[:, :1]) / np.abs(dm[:, 1:] - dm[:, :1])
    _regions, _offset = host_region(net, vertices, outputs_, eps)

    has_curved = False
    if not force:
        # 1-2. curved edges span more than one axis (subpoly.py:122)
        c = ((np.abs(e[:, 1] - e[:, 0]) > eps).sum(axis=-1)) > 1
        corners = None
        if c.any():
            corners = _corner_points_np(e[c]).reshape(-1, 3)
        regions_pair = _regions[edges][m][c][:, :, 3:]  # [Nc, 2, R]
        r_edges = (regions_pair[:, 0] == 0) & (regions_pair[:, 1] == 0)
        has_curved = r_edges.shape[0] > 0
    else:
        c = np.ones(e.shape[0], bool)

    if (not force) and has_curved:
        # corner-cube outputs, evaluated in one shared linear region
        d_corner = _net_outputs(net, corners, group=8)
        d_corner = d_corner.reshape(-1, 8, d_corner.shape[-1])  # [Nc, 8, R]

        # the earlier plane each curved edge lies on
        inds = fo.nonzero_last(r_edges[:, :idx])
        if r_edges.shape[0] != inds.shape[0]:
            bad = ~(r_edges[:, :idx].any(axis=1))
            raise RuntimeError(
                f"curved edges not on any earlier plane at {l}/{h}: "
                f"{bad.sum()}/{r_edges.shape[0]}")

        p = np.take_along_axis(
            d_corner, inds[:, 1][:, None, None].repeat(8, 1), axis=2)[..., 0]
        q = d_corner[:, :, idx]

        # intersection of the two (curved) surfaces on the x=z diagonal plane
        ints = _intersections(p, q)

        cand = e[c, 0] * (1 - ints) + e[c, 1] * ints
        _outputs = _net_outputs(net, cand)
        d_new = np.stack([
            np.take_along_axis(_outputs, inds[:, 1:], axis=1)[:, 0],
            _outputs[:, idx]], axis=-1)

        # exclude no-intersection edges; rescue the rest by gradient descent
        gg = ((ints < 0) | (ints > 1)).any(axis=-1)
        ints, d_new = fo.gradient_descent_failover(
            net, e[c], ints, d_new, gg, inds[:, 1], idx, eps)
        if os.environ.get("TROPICAL_DEBUG"):
            # diagnostic only (reference subpoly_debug.py:168-231): report
            # rows still off-surface after the rescue; strict_check below
            # drops them from the complex either way
            fo.check_new_vertices_on_surface(ints, d_new, gg, eps, l, h,
                                             e_c=e[c])
    else:
        ints = np.zeros((0, 3), np.float32)
        d_new = np.zeros((1, 2), np.float32)

    # 1-3. new vertices
    v_new = e[:, 0] * (1 - w) + e[:, 1] * w
    if not force and c.any():
        v_new[c] = e[c, 0] + ints * (e[c, 1] - e[c, 0])

    with PHASES("forward_new"):
        outputs_new = _net_outputs(net, v_new)
    m_rgn, offset = host_region(net, v_new, outputs_new, eps)
    m_idx = offset.shape[1] + idx

    if fo.sign_override(edges[m], _regions, _offset, idx, outputs_new, eps):
        # re-region with the overridden outputs so new vertices sit exactly on
        # the planes of their parent edge and the current surface
        m_rgn, offset = host_region(net, v_new, outputs_new, eps)

    m_rgn, m_rgn_ = m_rgn[:, :m_idx], m_rgn[:, m_idx:]
    assert m_rgn.shape[0] > 0

    if (not force) and strict:
        m, v_new, m_rgn, m_rgn_, offset, outputs_new = fo.strict_check(
            c, d_new, eps, idx, ints, m, m_rgn, m_rgn_, offset, outputs_new,
            has_curved, v_new, l, h)

    # 2. rewrite left edges in place; append right edges
    n_new = v_new.shape[0]
    new_ids = vertices.shape[0] + np.arange(n_new, dtype=np.int64)
    temp = edges[m][:, 1].copy()
    edges = edges.copy()
    edges[m, 1] = new_ids
    e_new = np.stack([temp, new_ids], axis=-1)

    # 3. connecting edges among coplanar same-region vertices, including old
    #    vertices the plane hits within eps (subpoly.py:232-250)
    h_idx = np.abs(outputs_[:, idx]) < eps
    v_rgn = np.concatenate([m_rgn, _regions[h_idx][:, :m_idx]], axis=0)
    v_off = np.concatenate([offset, _offset[h_idx]], axis=0)
    v_ids = np.concatenate([new_ids, np.nonzero(h_idx)[0]], axis=0)

    with PHASES("edge_vertices"):
        pairs = rg.edge_vertices(v_rgn, v_off)
    c_new = v_ids[pairs]
    if c_new.size:
        c_new.sort(axis=1)
        c_new = np.unique(c_new, axis=0)

    vertices = np.concatenate([vertices, v_new], axis=0)
    edges = np.concatenate([edges, e_new], axis=0)
    if c_new.size:
        edges = np.concatenate([edges, c_new], axis=0)
    outputs_ = np.concatenate([outputs_, outputs_new], axis=0)

    # 4. prune edges whose endpoints share identical future sign vectors
    if h < net.num_hidden and pruning:
        m_prn = np.concatenate([_regions[:, m_idx:], m_rgn_], axis=0)
        assert m_prn.shape[0] == vertices.shape[0]
        with PHASES("prune_unique"):
            inv = rg.row_unique_inverse(m_prn)
        e_prn = inv[edges]
        edges = edges[e_prn[:, 0] != e_prn[:, 1]]

        v_idx, r_idx = np.unique(edges.reshape(-1), return_inverse=True)
        vertices = vertices[v_idx]
        edges = r_idx.reshape(-1, 2).astype(np.int64)
        outputs_ = outputs_[v_idx]

    return vertices, edges, outputs_


def subpoly(net, d: int, size: float, eps: float = 1e-4, force: bool = False,
            verbose: bool = True, engine: str = "auto", mesh=None
            ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full subdivision-polygons extraction (reference subpoly.py:23-86).

    Returns (face_positions [T,3,3], vertices [V,3], triangles [T,3]).

    engine: "auto" uses the fused on-device loop (tropical/extract/device.py)
    for the flat/force path — one XLA dispatch for all 33 insertions — and the
    host-orchestrated loop otherwise; "host"/"device" force a choice.

    mesh: a jax.sharding.Mesh.  Extraction always takes the FASTEST engine
    available: for supported nets that is the fused single-dispatch device
    engine, which is latency-bound and runs as one single-chip XLA program
    (measured: it beats the dp-fanned host loop on every headline config by
    >5x, so "sharding" extraction over the mesh by fanning host-loop
    forwards would be a slowdown, not a speedup — the mesh still
    accelerates training, chamfer and the MC/MT eval ladders, which are
    throughput-bound).  Unsupported nets keep the host loop with every
    batched forward (candidate/corner evaluations) dp-fanned over the mesh
    devices; those results are bit-identical to single-device (the per-row
    math is unchanged, only placement differs).
    """
    dev_mesh = None
    if mesh is not None and mesh.size > 1:
        from tropical.extract.device import device_engine_supports

        if engine in ("auto", "device") and device_engine_supports(net):
            # the initial skeleton's lattice forward (embarrassingly
            # parallel) rides the mesh's dp axis; the fused insertion loop
            # stays single-chip — params replicated (extraction gathers are
            # latency-critical; an mp-sharded table would turn every gather
            # into a collective).  Funnel identical to single-chip
            # (tests/test_parallel.py).
            engine = "device"
            dev_mesh = mesh
        else:
            net = net.sharded(mesh)
            engine = "host"
    if engine == "auto":
        from tropical.extract.device import device_engine_supports

        engine = "device" if device_engine_supports(net) else "host"
    if engine == "device":
        from tropical.extract.device import CapsExhausted, subpoly_device

        if verbose:
            print()
            print("# of vertices and edges = ", end="")
        try:
            return subpoly_device(net, d, size, eps, verbose=verbose,
                                  force=force, mesh=dev_mesh)
        except CapsExhausted as e:
            # capacity, not correctness: the host loop has no static caps —
            # finish there (slower) rather than failing the extraction
            if verbose:
                print(f"\n[extract] {e}; host-engine fallback")

    fo.reset_counters()
    with PHASES("skeleton"):
        vertices, edges = grid_skeleton(net)
    if edges.shape[0] == 0:
        vertices, edges, _ = get_hypercube(d, size)

    outputs = None
    for l in range(net.num_layers - 1):
        for h in range(net.num_hidden):
            vertices, edges, outputs = subpoly_(
                vertices, edges, net, l, h, eps, outputs, force=force)

    vertices, edges, outputs = subpoly_(
        vertices, edges, net, net.num_layers - 2, net.num_hidden, eps, outputs,
        force=force)

    pre_v, pre_e = vertices.shape[0], edges.shape[0]
    if verbose:
        print()
        print(f"# of vertices and edges = {pre_v}/{pre_e} => ", end="")

    vertices, edges, v_idx = extract_skeleton(vertices, edges, outputs, net, eps)
    if vertices.shape[0] == 0:
        if verbose:
            print("0/0, 0 faces", end=", ")
        stats.record(pre_v, pre_e, 0, 0, 0)
        return (np.empty((0, 3, 3), np.float32), vertices,
                np.empty((0, 3), np.int64))
    outputs = outputs[v_idx]

    if verbose:
        print(f"{vertices.shape[0]}/{edges.shape[0]}", end=", ")

    with PHASES("extract_faces"):
        faces, tris = extract_faces(vertices, edges, net, outputs, eps)

    if verbose:
        print(f"{len(faces)} faces", end=", ")
    PHASES.report()
    stats.record(pre_v, pre_e, vertices.shape[0], edges.shape[0], len(faces))

    return faces, vertices, tris
