"""TPU-native triangle-mesh queries: signed distance and ray casting.

Replaces the reference's ``cubvh.cuBVH`` CUDA extension (reference
tropical/stanford/dataset.py:77,92 uses ``signed_distance`` for SDF training
labels; tropical/utils/chamfer_distance.py:192-195 uses ``ray_trace`` for
evaluation surface sampling).

Instead of a BVH (pointer-chasing trees don't map to the MXU/VPU), queries are
brute-force point x triangle tiles with a running min/argmin carried through a
``lax.scan`` over triangle chunks — dense FMA work that XLA pipelines well.
At the workload's sizes (50k points / 100k rays x ~10k-500k triangles) this is
seconds on a v5e.  A host-side C++ BVH with the same API lives in
``tropical/utils/bvh_host.py`` as the CPU fallback / native-runtime component.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

TRI_CHUNK = 2048


def _closest_dist2(p, a, b, c):
    """Squared distance point->triangle (Ericson, Real-Time Collision
    Detection 5.1.5), vectorized over [P, T] pair tiles.

    p: [P, 1, 3]; a/b/c: [1, T, 3] -> [P, T]
    """
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = (ab * ap).sum(-1)
    d2 = (ac * ap).sum(-1)

    bp = p - b
    d3 = (ab * bp).sum(-1)
    d4 = (ac * bp).sum(-1)

    cp = p - c
    d5 = (ab * cp).sum(-1)
    d6 = (ac * cp).sum(-1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    def safe_div(x, y):
        return x / jnp.where(jnp.abs(y) < 1e-30, 1e-30, y)

    # interior point
    denom = safe_div(1.0, va + vb + vc)
    v_in = vb * denom
    w_in = vc * denom
    closest = a + ab * v_in[..., None] + ac * w_in[..., None]

    # edge BC
    w_bc = safe_div(d4 - d3, (d4 - d3) + (d5 - d6))
    on_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)
    closest = jnp.where(on_bc[..., None], b + (c - b) * w_bc[..., None], closest)

    # edge AC
    w_ac = safe_div(d2, d2 - d6)
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    closest = jnp.where(on_ac[..., None], a + ac * w_ac[..., None], closest)

    # edge AB
    w_ab = safe_div(d1, d1 - d3)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    closest = jnp.where(on_ab[..., None], a + ab * w_ab[..., None], closest)

    # vertices
    closest = jnp.where(((d6 >= 0) & (d5 <= d6))[..., None], c, closest)
    closest = jnp.where(((d3 >= 0) & (d4 <= d3))[..., None], b, closest)
    closest = jnp.where(((d1 <= 0) & (d2 <= 0))[..., None], a, closest)

    diff = p - closest
    return (diff * diff).sum(-1)


def _ray_tri_t(o, d, a, b, c, eps=1e-9):
    """Moller-Trumbore: hit parameter t (inf if miss). o,d: [P,1,3]; a,b,c [1,T,3]."""
    e1 = b - a
    e2 = c - a
    h = jnp.cross(d, e2)
    det = (e1 * h).sum(-1)
    inv = 1.0 / jnp.where(jnp.abs(det) < eps, eps, det)
    s = o - a
    u = (s * h).sum(-1) * inv
    q = jnp.cross(s, e1)
    v = (d * q).sum(-1) * inv
    t = (e2 * q).sum(-1) * inv
    hit = (jnp.abs(det) > eps) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-6)
    return jnp.where(hit, t, jnp.inf)


def _pad_tris(tri: np.ndarray, chunk: int) -> np.ndarray:
    """Pad triangles to a power-of-two chunk multiple with far-away
    degenerate tris — pow2 bucketing lets XLA reuse one compiled program
    across meshes of different sizes (remote compiles cost ~minutes)."""
    T = max(tri.shape[0], chunk)
    Tp = chunk * (1 << (((T + chunk - 1) // chunk) - 1).bit_length())
    if Tp == tri.shape[0]:
        return tri
    pad = np.full((Tp - tri.shape[0], 3, 3), 1e8, tri.dtype)
    return np.concatenate([tri, pad], axis=0)


# point/ray tiles: [P_BLOCK, TRI_CHUNK] pair tiles bound the fused
# intermediates to ~64 MB so the whole working set pipelines through VMEM/HBM
# instead of materializing [100k, T] arrays (multi-GB at eval sizes)
P_BLOCK = 8192


def _pblock(n: int) -> int:
    return min(P_BLOCK, n)


@partial(jax.jit, static_argnames=("chunk", "pblock"))
def _min_dist2_scan(points, tris, chunk=TRI_CHUNK, pblock=P_BLOCK):
    n_chunks = tris.shape[0] // chunk
    tri_chunks = tris.reshape(n_chunks, chunk, 3, 3)
    pb = points.reshape(points.shape[0] // pblock, pblock, 3)

    def outer(_, p):
        p = p[:, None, :]

        def body(carry, tc):
            d2 = _closest_dist2(p, tc[None, :, 0], tc[None, :, 1],
                                tc[None, :, 2])
            return jnp.minimum(carry, d2.min(-1)), None

        init = jnp.full((pblock,), jnp.inf, points.dtype)
        out, _ = jax.lax.scan(body, init, tri_chunks)
        return None, out

    _, out = jax.lax.scan(outer, None, pb)
    return out.reshape(points.shape[0])


@partial(jax.jit, static_argnames=("chunk", "pblock"))
def _parity_scan(points, dirs, tris, chunk=TRI_CHUNK, pblock=P_BLOCK):
    n_chunks = tris.shape[0] // chunk
    tri_chunks = tris.reshape(n_chunks, chunk, 3, 3)
    pb = points.reshape(points.shape[0] // pblock, pblock, 3)
    db = dirs.reshape(dirs.shape[0] // pblock, pblock, 3)

    def outer(_, od):
        o, d = od
        o = o[:, None, :]
        d = d[:, None, :]

        def body(carry, tc):
            t = _ray_tri_t(o, d, tc[None, :, 0], tc[None, :, 1],
                           tc[None, :, 2])
            return carry + jnp.isfinite(t).sum(-1), None

        init = jnp.zeros((pblock,), jnp.int32)
        out, _ = jax.lax.scan(body, init, tri_chunks)
        return None, out

    _, out = jax.lax.scan(outer, None, (pb, db))
    return out.reshape(points.shape[0])


@partial(jax.jit, static_argnames=("chunk", "pblock"))
def _ray_trace_scan(rays_o, rays_d, tris, chunk=TRI_CHUNK, pblock=P_BLOCK):
    n_chunks = tris.shape[0] // chunk
    tri_chunks = tris.reshape(n_chunks, chunk, 3, 3)
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    ob = rays_o.reshape(rays_o.shape[0] // pblock, pblock, 3)
    db = rays_d.reshape(rays_d.shape[0] // pblock, pblock, 3)

    def outer(_, od):
        o, d = od
        o = o[:, None, :]
        d = d[:, None, :]

        def body(carry, xs):
            best_t, best_id = carry
            tc, base = xs
            t = _ray_tri_t(o, d, tc[None, :, 0], tc[None, :, 1],
                           tc[None, :, 2])
            tmin = t.min(-1)
            amin = t.argmin(-1).astype(jnp.int32) + base
            better = tmin < best_t
            return (jnp.where(better, tmin, best_t),
                    jnp.where(better, amin, best_id)), None

        init = (jnp.full((pblock,), jnp.inf, rays_o.dtype),
                jnp.full((pblock,), -1, jnp.int32))
        (t, fid), _ = jax.lax.scan(body, init, (tri_chunks, bases))
        return None, (t, fid)

    _, (t, fid) = jax.lax.scan(outer, None, (ob, db))
    return t.reshape(rays_o.shape[0]), fid.reshape(rays_o.shape[0])


class MeshQuery:
    """Bundled mesh with signed-distance and ray-trace queries (cuBVH API)."""

    def __init__(self, vertices: np.ndarray, faces: np.ndarray,
                 chunk: int = TRI_CHUNK):
        self.vertices = np.asarray(vertices, np.float32)
        self.faces = np.asarray(faces, np.int64)
        tris = self.vertices[self.faces]  # [T, 3, 3]
        self.n_tris = tris.shape[0]
        self.chunk = chunk
        self._tris = jnp.asarray(_pad_tris(tris, chunk))

    def unsigned_distance(self, points: np.ndarray) -> np.ndarray:
        from tropical.core.buffers import padded_apply

        p = jnp.asarray(np.asarray(points, np.float32))
        d2 = padded_apply(lambda pp: _min_dist2_scan(
            pp, self._tris, self.chunk, _pblock(pp.shape[0])), p)
        return np.sqrt(np.asarray(d2))

    def signed_distance(self, points: np.ndarray) -> np.ndarray:
        """Signed distance, positive inside (cubvh convention used by the
        reference labels; dataset.py:92-96)."""
        from tropical.core.buffers import padded_apply

        p = np.asarray(points, np.float32)
        dist = self.unsigned_distance(p)
        # parity of crossings along a fixed irrational-ish direction: robust to
        # the axis-aligned edge/vertex coincidences of scan meshes
        dirs = np.broadcast_to(
            np.asarray([0.5320963, 0.6418563, 0.55234/0.9], np.float32), p.shape)
        dirs = dirs / np.linalg.norm(dirs[0])
        hits = padded_apply(
            lambda pp, dd: _parity_scan(pp, dd, self._tris, self.chunk,
                                        _pblock(pp.shape[0])),
            jnp.asarray(p), jnp.asarray(dirs.copy()))
        inside = (np.asarray(hits) % 2) == 1
        return np.where(inside, dist, -dist)

    def ray_trace(self, rays_o: np.ndarray, rays_d: np.ndarray):
        """First-hit positions, face ids (-1 = miss) and depths."""
        from tropical.core.buffers import padded_apply

        o = jnp.asarray(np.asarray(rays_o, np.float32))
        d = jnp.asarray(np.asarray(rays_d, np.float32))
        t, fid = padded_apply(
            lambda oo, dd: _ray_trace_scan(oo, dd, self._tris, self.chunk,
                                           _pblock(oo.shape[0])), o, d)
        t = np.asarray(t)
        fid = np.asarray(fid)
        fid = np.where(fid >= self.n_tris, -1, fid)  # hits on padding
        miss = ~np.isfinite(t) | (fid < 0)
        fid = np.where(miss, -1, fid)
        t = np.where(miss, 0.0, t)
        positions = np.asarray(rays_o) + t[:, None] * np.asarray(rays_d)
        return positions.astype(np.float32), fid, t
