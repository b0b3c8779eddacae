"""Stanford 3D scan datasets (+ procedural shapes) with SDF training labels.

Port of reference tropical/stanford/dataset.py:25-99.  Loads the same PLY
paths when present (the scans are downloaded separately from the Stanford 3D
scanning repository, exactly as in the reference), normalizes the longest AABB
side to 2 and centers, then samples 50k jittered near-surface points labeled by
signed distance — computed with the TPU brute-force mesh query (or the C++
host BVH) instead of ``cubvh``.  ``sphere``/``torus`` are self-contained
procedural shapes for tests and benchmarks.
"""

from __future__ import annotations

import os

import numpy as np

from tropical.utils.ply import Mesh, read_ply
from tropical.utils.procedural import icosphere, torus

BASE_DIR = os.path.dirname(__file__)

# name -> relative PLY path (reference dataset.py:35-67)
_PLY_PATHS = {
    "bunny": "bunny/reconstruction/bun_zipper.ply",
    "armadillo": "armadillo/Armadillo.ply",
    "drill": "drill/reconstruction/drill_shaft_vrip.ply",
    "lucy": "lucy/lucy_res10.ply",
    "dragon": "dragon_recon/dragon_vrip_res3.ply",
    "happy": "happy_recon/happy_vrip_res3.ply",
}

_PROCEDURAL = {
    "sphere": lambda: icosphere(4),
    "torus": lambda: torus(),
}


class StanfordDataset:
    """50k resampled (point, signed-distance) pairs around the target mesh."""

    def __init__(self, name: str = "dragon", rng: np.random.Generator | None = None,
                 n_samples: int = 50000):
        self.R = 0.8  # world scale divisor applied at export (reference :27)
        self.name = name
        self.rng = rng or np.random.default_rng(0)
        self.n_samples = n_samples
        self.init()
        self.resample()

    def __len__(self) -> int:
        return self.n_samples

    def init(self):
        name = self.name.lower()
        if name in _PROCEDURAL:
            print(f"Building procedural {name} mesh ...")
            self.mesh = _PROCEDURAL[name]()
        elif name == "bunny_npy":
            # density-grid variant (reference dataset.py:41-48): rebuild the
            # mesh from models/bunny.npy via grid isosurfacing
            print("Loading bunny.npy ...")
            path = os.path.join(BASE_DIR, "models/bunny.npy")
            density = np.load(path)
            from tropical.utils.isosurface import (grid_tetrahedra,
                                                   marching_tetrahedra)

            n = density.shape[0]
            g = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing="ij"), -1)
            pts = (g.reshape(-1, 3) / 32.0 - 1.0) * self.R
            tets = grid_tetrahedra(n, n)
            verts, tris = marching_tetrahedra(pts, tets, density.reshape(-1))
            self.mesh = Mesh(verts, tris)
        else:
            rel = _PLY_PATHS.get(name)
            if rel is None:
                raise ValueError(f"unknown dataset {self.name}")
            path = os.path.join(BASE_DIR, rel)
            print(f"Loading {os.path.basename(rel)} ...")
            if not os.path.isfile(path):
                raise FileNotFoundError(
                    f"{path} not found — download the Stanford scans into "
                    f"tropical/stanford/ (same layout as the reference), or "
                    f"use the procedural 'sphere'/'torus' datasets")
            self.mesh = read_ply(path)
        print("Done.", flush=True)

        # normalize longest AABB side to 2, center (reference dataset.py:71-74;
        # bunny_npy is already in [-R, R], reference :71)
        if name != "bunny_npy":
            vertices = np.asarray(self.mesh.vertices, np.float64)
            scale = (vertices.max(0) - vertices.min(0)).max()
            vertices = vertices / scale * 2
            vertices -= (vertices.max(0) + vertices.min(0)) / 2
            self.mesh = Mesh(vertices, self.mesh.faces)

        from tropical.ops.mesh_queries import MeshQuery

        self.query = MeshQuery(self.mesh.vertices, self.mesh.faces)
        print("Mesh query initialized.", flush=True)

    def resample(self):
        """Draw 50k jittered surface-adjacent points with SD labels
        (reference dataset.py:80-96; inside is positive)."""
        vertices = np.asarray(self.mesh.vertices, np.float32)
        d = 0.4
        if self.name.lower() != "lucy":  # lucy has too many vertices
            vertices = np.tile(vertices, (10, 1))
        if vertices.shape[0] < len(self):  # drill has few vertices
            vertices = np.tile(np.asarray(self.mesh.vertices, np.float32), (30, 1))
            d = 0.2
        perm = self.rng.permutation(vertices.shape[0])[:len(self)]
        points = vertices[perm] + (
            self.rng.random((len(self), 3), np.float32) * d - d / 2)

        if self.name.lower() in _PROCEDURAL:
            # Procedural datasets (our extension; not in the reference) mix
            # in 20% uniform-volume samples over the extraction canvas.  The
            # surface-jitter-only recipe leaves everything farther than d/2
            # from the surface unsupervised, and a tanh SDF head is free to
            # graze zero there — measured on the sphere checkpoint: a patchy
            # phantom shell at r~0.57 (net coords) that both MC-512 and the
            # exact extraction faithfully mesh, inflating eval CD ~10x
            # (first-hit rays land on phantom slivers).  Far-field sign
            # supervision (labels still clamped at ±0.2 in the loss) removes
            # the graze without touching the reference recipe for the scans.
            n_vol = len(self) // 5
            vol = (self.rng.random((n_vol, 3), np.float32) * 2.4 - 1.2)
            points[:n_vol] = vol

        self.X = points.astype(np.float32)
        self.Y = self.query.signed_distance(points).astype(np.float32)

    def batches(self, batch_size: int, shuffle: bool = True):
        """Mini-batch iterator (replaces the torch DataLoader)."""
        order = (self.rng.permutation(len(self)) if shuffle
                 else np.arange(len(self)))
        for i in range(0, len(self), batch_size):
            sel = order[i:i + batch_size]
            yield self.X[sel], self.Y[sel]
