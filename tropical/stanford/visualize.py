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


def _mesh_tag(path: str, size: str, seed: int) -> str:
    """'our' / 'mc256' / 'mt032' from a gallery mesh filename."""
    base = os.path.basename(path)
    stem = base[: -len(f"_{size}_{seed}.ply")]
    return "our" if stem in ("our", "our_mesh") else stem.replace("_mesh", "")


def gallery_meshes(meshes_root: str, data: str, size: str, seed: int):
    """All renderable meshes for one (dataset, size, seed) run, ours first
    then baselines by ascending resolution (reference visualize_all's sweep
    of our_mesh + mc{016..512}; this repo's evaluate CLI also emits mt###)."""
    import glob

    d = os.path.join(meshes_root, data)
    paths = sorted(
        set(glob.glob(os.path.join(d, f"*_{size}_{seed}.ply"))))
    ours = [p for p in paths if _mesh_tag(p, size, seed) == "our"]
    rest = sorted((p for p in paths if p not in ours),
                  key=lambda p: _mesh_tag(p, size, seed))
    return ours + rest


def visualize_all(data: str, size: str, seed: int, meshes_root: str = "meshes",
                  out_dir: str | None = None):
    """Gallery generator (reference visualize.py ``visualize_all``): render
    every available mesh of the run — ours plus each marching-cubes/-tets
    baseline resolution — as individual PNGs and one combined figure.

    Returns (individual paths, combined figure path)."""
    from tropical.utils.ply import read_ply

    paths = gallery_meshes(meshes_root, data, size, seed)
    if not paths:
        raise FileNotFoundError(
            f"no meshes matching {meshes_root}/{data}/*_{size}_{seed}.ply")
    out_dir = out_dir or os.path.join(meshes_root, data, "outputs")

    outs, meshes, labels = [], [], []
    for p in paths:
        tag = _mesh_tag(p, size, seed)
        mesh = read_ply(p)
        out = os.path.join(out_dir, f"{size}_{tag}_{seed}.png")
        outs.append(visualize_mesh(mesh, out, data))
        meshes.append(mesh)
        labels.append(f"{tag} ({mesh.faces.shape[0]} tris)")
    combined = visualize_comparison(
        meshes, labels, os.path.join(out_dir, f"{size}_gallery_{seed}.png"),
        data)
    return outs, combined


def main(argv=None):
    from tropical.utils.ply import read_ply

    parser = argparse.ArgumentParser(prog="python -m tropical.stanford.visualize")
    parser.add_argument("-d", "--dataset", default="sphere")
    parser.add_argument("-s", "--seed", default=1, type=int)
    parser.add_argument("-m", "--model_size", default="small")
    parser.add_argument("-o", "--out", default=None)
    parser.add_argument("-a", "--all", action="store_true",
                        help="render every mesh of the run plus a combined "
                             "gallery figure (reference visualize_all)")
    parser.add_argument("--meshes_root", default="meshes")
    args = parser.parse_args(argv)

    if args.all:
        outs, combined = visualize_all(
            args.dataset, args.model_size, args.seed,
            meshes_root=args.meshes_root, out_dir=args.out)
        for p in outs:
            print(p)
        print(combined)
        return 0

    mesh_path = os.path.join(
        args.meshes_root, args.dataset,
        f"our_mesh_{args.model_size}_{args.seed}.ply")
    mesh = read_ply(mesh_path)
    out = args.out or mesh_path.replace(".ply", ".png")
    print(visualize_mesh(mesh, out, args.dataset))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
