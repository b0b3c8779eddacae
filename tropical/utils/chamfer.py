"""Chamfer / angular distance metrics and ray-based surface sampling.

TPU-native replacement for reference tropical/utils/chamfer_distance.py:
- ``chamfer_distance`` = symmetric mean nearest-neighbour L2 distance
  (reference :39-48 uses sklearn KD-trees); here a brute-force tiled min
  distance runs on TPU — at 100k x ~400k points this is dense VPU work,
- ``sample_surface_from_rays`` casts the evaluation rays with the TPU ray
  tracer and returns hit positions + per-face cross-product normals + hit
  mask (reference :184-212 via cubvh),
- ``get_rays``/``angular_distance`` match reference train.py:296-321.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PT_CHUNK = 4096


@partial(jax.jit, static_argnames=("chunk",))
def _min_dist_scan(a, b, chunk=PT_CHUNK):
    """min_j ||a_i - b_j|| for every i; b padded to a chunk multiple."""
    n_chunks = b.shape[0] // chunk
    bc = b.reshape(n_chunks, chunk, 3)

    def body(carry, bb):
        d2 = ((a[:, None, :] - bb[None, :, :]) ** 2).sum(-1)
        return jnp.minimum(carry, d2.min(-1)), None

    init = jnp.full((a.shape[0],), jnp.inf, a.dtype)
    d2, _ = jax.lax.scan(body, init, bc)
    return jnp.sqrt(d2)


def _pad_pts(x: np.ndarray, chunk: int) -> np.ndarray:
    n = x.shape[0]
    npad = ((n + chunk - 1) // chunk) * chunk - n
    if npad == 0:
        return x
    return np.concatenate([x, np.full((npad, 3), 1e8, x.dtype)], axis=0)


def min_nn_distance(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """For each point in x, the distance to its nearest neighbour in y.

    Uses the MXU matmul formulation (tropical/ops/chamfer_tpu.py); the
    broadcast-difference scan below is kept as the reference implementation
    for tests."""
    from tropical.ops.chamfer_tpu import min_nn_distance as fast

    return fast(x, y)


def min_nn_distance_scan(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Reference VPU implementation (broadcast-diff scan)."""
    from tropical.core.buffers import padded_apply

    xb = jnp.asarray(np.asarray(x, np.float32))
    yb = jnp.asarray(_pad_pts(np.asarray(y, np.float32), PT_CHUNK))
    return np.asarray(padded_apply(lambda aa: _min_dist_scan(aa, yb), xb))


def chamfer_distance(x: np.ndarray, y: np.ndarray) -> float:
    """Symmetric mean NN distance (reference chamfer_distance.py:39-48)."""
    min_yx = min_nn_distance(np.asarray(y), np.asarray(x))
    min_xy = min_nn_distance(np.asarray(x), np.asarray(y))
    return float((min_yx.mean() + min_xy.mean()) / 2.0)


def get_rays(n: int = 100000, rng: np.random.Generator | None = None):
    """Random unit directions from the origin (reference train.py:296-304)."""
    rng = rng or np.random.default_rng(0)
    theta = rng.random(n) * 2 * np.pi
    phi = rng.random(n) * 2 * np.pi
    x = np.cos(theta) * np.sin(phi)
    y = np.sin(theta) * np.sin(phi)
    z = np.cos(phi)
    rays_d = np.stack([x, y, z], axis=1).astype(np.float32)
    rays_o = np.zeros_like(rays_d)
    return rays_o, rays_d


def sample_surface_from_rays(rays_o, rays_d, mesh, return_normal: bool = False):
    """First-hit surface samples (reference chamfer_distance.py:184-212).

    Backend: the C++ host BVH by default — the eval ladder traces ~11
    meshes whose pow-2 triangle buckets each trigger a fresh XLA compile of
    the brute-force tiles (measured ~400-800 s per bucket through the
    tunnel, turning one eval into hours), the MC-512 pseudo-GT's ~2M tris
    would be 10^11 pair tests on the brute-force path anyway, and the
    tunneled v5e worker has twice kernel-faulted on exactly that program.
    The host BVH is the same Möller-Trumbore, O(rays * log tris), seconds
    for 100k rays.  TROPICAL_RAYS=tpu forces the device tiles (parity
    tests); =host forces the BVH.
    """
    import os

    if int(np.asarray(mesh.faces).shape[0]) == 0:
        # degenerate mesh (e.g. an undertrained SDF's empty MC row in the
        # eval ladder): no hits — also keeps the normals gather below from
        # indexing an empty faces array
        n = np.asarray(rays_o).shape[0]
        empty = np.zeros((0, 3), np.float32)
        mask = np.zeros(n, bool)
        if return_normal:  # normals are per-ray in the hit path below
            return empty, np.zeros((n, 3), np.float64), mask
        return empty

    backend = os.environ.get("TROPICAL_RAYS", "auto")
    mq = None
    if backend != "tpu":
        try:
            from tropical.utils.bvh_host import HostBVH

            mq = HostBVH(mesh.vertices, mesh.faces)
        except Exception:
            mq = None  # no toolchain: fall through to the TPU path
    if mq is None:
        from tropical.ops.mesh_queries import MeshQuery

        mq = MeshQuery(mesh.vertices, mesh.faces)
    positions, face_id, _ = mq.ray_trace(rays_o, rays_d)
    mask = face_id >= 0
    hit_positions = positions[mask]

    if not return_normal:
        return hit_positions

    fid = np.where(mask, face_id, 0)
    tris = np.asarray(mesh.vertices, np.float64)[np.asarray(mesh.faces)[fid]]
    normals = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True) + 1e-12
    return hit_positions, normals, mask


def angular_distance(x: np.ndarray, y: np.ndarray):
    """Mean/std of angle in degrees between unit normals (train.py:317-321)."""
    deg = np.degrees(np.arccos(np.clip(np.sum(x * y, axis=-1), -1, 1)))
    return float(np.mean(deg)), float(np.std(deg))


def get_camera_rays(poses, intrinsics, H: int, W: int, n: int = -1,
                    rng: np.random.Generator | None = None):
    """Pinhole camera rays (NeRF convention; legacy API of reference
    chamfer_distance.py:52-125).

    Args:
        poses: [B, 4, 4] cam2world matrices.
        intrinsics: (fx, fy, cx, cy).
        n: if > 0, sample n random pixels per pose.

    Returns dict with 'rays_o', 'rays_d' of shape [B, N, 3].
    """
    rng = rng or np.random.default_rng(0)
    poses = np.asarray(poses, np.float64)
    fx, fy, cx, cy = intrinsics
    i, j = np.meshgrid(np.arange(W, dtype=np.float64) + 0.5,
                       np.arange(H, dtype=np.float64) + 0.5, indexing="xy")
    i = i.reshape(-1)
    j = j.reshape(-1)
    if n > 0:
        sel = rng.integers(0, H * W, n)
        i, j = i[sel], j[sel]
    zs = -np.ones_like(i)            # z flipped
    xs = (i - cx) / fx
    ys = -(j - cy) / fy              # y flipped
    directions = np.stack([xs, ys, zs], axis=-1)          # [N, 3]
    rays_d = directions[None] @ poses[:, :3, :3].transpose(0, 2, 1)
    rays_o = np.broadcast_to(poses[:, None, :3, 3], rays_d.shape)
    return {"rays_o": rays_o, "rays_d": rays_d}


def sample_surface(poses, intrinsics, mesh, n: int,
                   rng: np.random.Generator | None = None):
    """Sample ~n surface points by ray-casting from camera poses (legacy API
    of reference chamfer_distance.py:128-182); mesh is normalized to the unit
    box, positions returned in the original frame."""
    from tropical.ops.mesh_queries import MeshQuery
    from tropical.utils.ply import Mesh

    rng = rng or np.random.default_rng(0)
    vmin, vmax = np.asarray(mesh.vertices).min(0), np.asarray(mesh.vertices).max(0)
    center = (vmin + vmax) / 2
    scale = 1.0 / (vmax - vmin)
    norm_mesh = Mesh((np.asarray(mesh.vertices) - center) * scale, mesh.faces)
    mq = MeshQuery(norm_mesh.vertices, norm_mesh.faces)

    per_frame = max(1, n // len(poses))
    out = []
    for pose in np.asarray(poses):
        rays = get_camera_rays(pose[None], intrinsics, H=800, W=800, rng=rng)
        o = rays["rays_o"].reshape(-1, 3)
        d = rays["rays_d"].reshape(-1, 3)
        pos, fid, _ = mq.ray_trace(o, d)
        hits = pos[fid >= 0]
        if len(hits) == 0:
            continue
        sel = rng.choice(len(hits), per_frame, replace=len(hits) < per_frame)
        out.append(hits[sel])
    all_pos = np.concatenate(out, axis=0) if out else np.empty((0, 3))
    return all_pos / scale + center
