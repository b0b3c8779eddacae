"""Standalone evaluation of a cached SDF + extracted mesh.

CLI-compatible port of reference tropical/stanford/evaluate.py (flags
-d/-s/-m/-t).  ``-t mc`` runs true marching cubes
(:mod:`tropical.utils.marching_cubes`); ``-t mtet`` runs marching
tetrahedra, with the pseudo-GT resolution still computed by MC exactly as
the reference does (evaluate.py:253-256).

    python -m tropical.stanford.evaluate -d sphere -m small -s 1
"""

from __future__ import annotations

import argparse
import os

import numpy as np

CANVAS_SIZE = 1.2
TRAINING_DATA_R = 0.8


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        prog="python -m tropical.stanford.evaluate",
        description="Polyhedral complex derivation from piecewise trilinear "
                    "networks (TPU-native)")
    parser.add_argument("-d", "--dataset", default="dragon",
                        choices=["bunny", "dragon", "happy", "armadillo",
                                 "drill", "lucy", "sphere", "torus"])
    parser.add_argument("-s", "--seed", default=45, type=int, help="Seed")
    parser.add_argument("-m", "--model_size", default="small",
                        choices=["small", "medium", "large"], help="Model size")
    parser.add_argument("-t", "--method", default="mc",
                        choices=["mc", "mtet"], help="Mesh extraction method")
    parser.add_argument("--gt_res", default=None, type=int)
    return parser.parse_args(argv)


def count_vertices_near_values(vertices, values, threshold=1e-4):
    """Vertices with >= 1 coordinate within threshold of a grid mark
    (reference evaluate.py:100-116)."""
    near = np.zeros(len(vertices), bool)
    for v in np.asarray(values).ravel():
        near |= (np.abs(vertices - v) < threshold).any(-1)
    return int(near.sum())


def main(argv=None):
    from tropical.stanford.model import net_for_size
    from tropical.stanford.train import evaluate_against_grid_gt, model_path_for
    from tropical.utils import checkpoint as ckpt
    from tropical.utils.ply import read_ply

    args = parse_args(argv)
    print(args)
    seed = args.seed
    np.random.seed(seed)

    model_path = model_path_for(args.dataset, args.model_size, seed)
    found = ckpt.find_checkpoint(model_path)
    mesh_path = os.path.join(
        f"meshes/{args.dataset}",
        f"our_mesh_{args.model_size}_{seed}.ply")

    if not found:
        print(f"Model path is not found: {model_path}")
        return 1
    if not os.path.isfile(mesh_path):
        print(f"Mesh path is not found: {mesh_path}")
        return 1

    net = net_for_size(args.model_size, args.dataset, seed)
    ckpt.load_into(net, found)
    print(f"The pretrained model is loaded from {found}")
    our_mesh = read_ply(mesh_path)
    print(f"The mesh is loaded from {mesh_path}")
    print(f"Ours: {our_mesh.vertices.shape}/{our_mesh.faces.shape}")

    # on-grid vertex statistics (world coords = preprocess_inverse(marks)/R)
    marks_world = np.asarray(net.preprocess_inverse(net.marks)) / TRAINING_DATA_R
    count = count_vertices_near_values(np.asarray(our_mesh.vertices), marks_world)
    print(f"Number of vertices near the grid marks: {count} "
          f"({count / our_mesh.vertices.shape[0]:.4f})")

    gt_res = args.gt_res or (256 if args.model_size == "small" else 512)
    if args.method == "mc":
        resolutions = [gt_res, 16, 24, 32, 40, 48, 56, 64, 128, 192, 224]
    else:
        resolutions = [gt_res, 16, 32, 48, 64, 96]
        if args.model_size == "large":
            resolutions += [128, 192]
    resolutions = [resolutions[0]] + [r for r in resolutions[1:] if r < gt_res]

    out_dir = f"meshes/{args.dataset}"
    os.makedirs(out_dir, exist_ok=True)
    evaluate_against_grid_gt(net, our_mesh, -1.0, TRAINING_DATA_R, gt_res,
                             out_dir, f"{args.model_size}_{seed}",
                             resolutions=resolutions, method=args.method)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
