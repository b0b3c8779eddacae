"""Train an SDF net, extract its exact polyhedral complex, evaluate.

CLI-compatible port of reference tropical/stanford/train.py (flags -d/-s/-c/
-m/-e/-f with the reference's inverted store_false semantics for -c/-f:
*passing* -c disables caching, *passing* -f disables the flat assumption).

    python -m tropical.stanford.train -e -m small -d bunny -s 1
    python -m tropical.stanford.train -e -m small -d sphere      # procedural
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

# Constants (reference train.py:64-68)
DIM = 3
CANVAS_SIZE = 1.2
BATCH_SIZE = 1000


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        prog="python -m tropical.stanford.train",
        description="Polyhedral complex derivation from piecewise trilinear "
                    "networks (TPU-native)")
    parser.add_argument("-d", "--dataset", default="dragon",
                        choices=["bunny", "dragon", "happy", "armadillo",
                                 "drill", "lucy", "bunny_npy", "sphere",
                                 "torus"],
                        help="Stanford 3D scanning model name (or procedural)")
    parser.add_argument("-s", "--seed", default=45, type=int, help="Seed")
    parser.add_argument("-c", "--cache", default=True, action="store_false",
                        help="Cache the trained SDF?")
    parser.add_argument("-m", "--model_size", default="small",
                        choices=["small", "medium", "large"], help="Model size")
    parser.add_argument("-e", "--eval", default=False, action="store_true",
                        help="Run evaluation?")
    parser.add_argument("-f", "--force", default=True, action="store_false",
                        help="Force flat assumption to skip curve approximation.")
    parser.add_argument("--gt_res", default=None, type=int,
                        help="Pseudo-GT grid resolution (default 512 as in the "
                             "reference; lower for quick runs)")
    parser.add_argument("--epochs", default=None, type=int,
                        help="Override training epochs")
    parser.add_argument("--extract_every", default=0, type=int,
                        help="Extract the polyhedral complex every N training "
                             "epochs (0 = only at the end); the reference "
                             "draws the evolving complex during training "
                             "(train.py:210-224)")
    return parser.parse_args(argv)


def model_path_for(dataset: str, model_size: str, seed: int) -> str:
    return os.path.join(os.path.dirname(__file__),
                        f"models/{dataset}/{dataset}_sdf_{model_size}_{seed}.pth")


def extract_mesh(net, force: bool):
    """Timed extraction (reference train.py:117-129)."""
    import tropical.extract.subdivide as sp

    t = time.time()
    polygons, vertices, faces_with_indices = sp.subpoly(
        net, DIM, CANVAS_SIZE, force=force)
    our_t = time.time() - t
    print(f" take {our_t:.2f}")
    return polygons, vertices, faces_with_indices, our_t


def evaluate_against_grid_gt(net, our_mesh, our_t, dataset_R, gt_res,
                             out_dir, tag, resolutions=None, method="mc"):
    """CD/AD of the extracted mesh vs grid pseudo-GT at several resolutions,
    printed in the reference table format (train.py:325-355).

    The pseudo-GT (res == gt_res) is ALWAYS marching cubes, matching the
    reference's protocol (train.py:276-293; evaluate.py runs MC for the GT
    resolution even under ``-t mtet``, evaluate.py:253-256); ``method``
    selects the baseline family for the other resolutions."""
    from tropical.utils.chamfer import (angular_distance, chamfer_distance,
                                        get_rays, sample_surface_from_rays)
    from tropical.utils.isosurface import run_marching_tetrahedra
    from tropical.utils.marching_cubes import run_marching_cubes

    import os
    import sys

    trace = os.environ.get("TROPICAL_PROFILE")

    def note(msg):
        if trace:
            print(f"[eval] {msg} t={time.time():.1f}", file=sys.stderr,
                  flush=True)

    rays_o, rays_d = get_rays(100000)
    note("ray-trace ours")
    our_samples, our_normals, our_mask = sample_surface_from_rays(
        rays_o, rays_d, our_mesh, return_normal=True)
    note("ray-trace ours done")

    if resolutions is None:
        resolutions = [gt_res, 16, 24, 32, 40, 48, 56, 64, 128, 192, 224, 256]
        resolutions = [r for i, r in enumerate(resolutions)
                       if i == 0 or r < gt_res]

    gt_samples = gt_normals = gt_mask = None
    print(f"Marching {'Cubes' if method == 'mc' else 'Tetrahedra'} Results:")
    print("#samples, #vertices, CD, AD, time")
    for i in resolutions:
        t = time.time()
        if method == "mc" or i == gt_res:
            mc_mesh = run_marching_cubes(net, i, CANVAS_SIZE, R=dataset_R)
        else:
            mc_mesh = run_marching_tetrahedra(net, i, CANVAS_SIZE, R=dataset_R)
        t = time.time() - t
        note(f"res {i}: mesh done ({mc_mesh.vertices.shape[0]} verts), "
             f"ray-trace")
        try:
            mc_samples, mc_normals, mc_mask = sample_surface_from_rays(
                rays_o, rays_d, mc_mesh, return_normal=True)
            note(f"res {i}: ray-trace done, chamfer")
        except Exception:
            print(f"{i:4d}, {0:5d}, {0:0.6f}, {0:4.1f}, {t:.2f}")
            continue
        if i == gt_res:
            if mc_samples.shape[0] == 0:
                # no ray hits on the pseudo-GT (degenerate/undertrained
                # SDF): every CD/AD in the table is undefined — zero rows,
                # like the per-resolution failure path above
                print(f"Ours, {our_mesh.vertices.shape[0]:5d}, {0:0.6f}, "
                      f"{0:4.1f}, {our_t:.2f}")
                print(f"{i:4d}, {mc_mesh.vertices.shape[0]:5d}, {0:0.6f}, "
                      f"{0:4.1f}, {t:.2f}")
                continue
            # the pseudo-GT is valid even if OUR mesh got no ray hits:
            # keep it so the baseline rows below still score against it
            gt_samples, gt_normals, gt_mask = mc_samples, mc_normals, mc_mask
            if our_samples.shape[0] == 0:
                print(f"Ours, {our_mesh.vertices.shape[0]:5d}, {0:0.6f}, "
                      f"{0:4.1f}, {our_t:.2f}")
            else:
                our_cd = chamfer_distance(our_samples, gt_samples)
                common = our_mask & gt_mask
                our_ad, _ = angular_distance(our_normals[common],
                                             gt_normals[common])
                print(f"Ours, {our_mesh.vertices.shape[0]:5d}, "
                      f"{our_cd:0.6f}, {our_ad:4.1f}, {our_t:.2f}")
            # the GT row scores the pseudo-GT against itself: identically
            # zero (the reference prints literal zeros here too,
            # logs/run_small.log:13) — computing a ~80k x 80k self-chamfer
            # for a known 0 wastes minutes of device time
            print(f"{i:4d}, {mc_mesh.vertices.shape[0]:5d}, {0:0.6f}, "
                  f"{0:4.1f}, {t:.2f}")
            mc_mesh.export(os.path.join(out_dir,
                                        f"{method}{i:03d}_mesh_{tag}.ply"))
            continue

        if gt_samples is None or mc_samples.shape[0] == 0:
            # pseudo-GT unavailable (its row failed above) or this baseline
            # mesh got no ray hits
            print(f"{i:4d}, {mc_mesh.vertices.shape[0]:5d}, {0:0.6f}, "
                  f"{0:4.1f}, {t:.2f}")
            continue

        mc_cd = chamfer_distance(mc_samples, gt_samples)
        common = mc_mask & gt_mask
        mc_ad, _ = angular_distance(mc_normals[common], gt_normals[common])
        print(f"{i:4d}, {mc_mesh.vertices.shape[0]:5d}, {mc_cd:0.6f}, "
              f"{mc_ad:4.1f}, {t:.2f}")
        mc_mesh.export(os.path.join(out_dir, f"{method}{i:03d}_mesh_{tag}.ply"))
    print()


def main(argv=None):
    from tropical.stanford.dataset import StanfordDataset
    from tropical.stanford.model import net_for_size
    from tropical.stanford.training import train
    from tropical.utils import checkpoint as ckpt
    from tropical.utils.ply import Mesh

    args = parse_args(argv)
    print(args)
    seed = args.seed
    np.random.seed(seed)

    epochs = args.epochs
    if epochs is None:
        epochs = 6 if args.dataset == "drill" else 10  # reference train.py:67

    net = net_for_size(args.model_size, args.dataset, seed)
    training_data = StanfordDataset(args.dataset,
                                    rng=np.random.default_rng(seed))

    model_path = model_path_for(args.dataset, args.model_size, seed)
    found = ckpt.find_checkpoint(model_path)
    if args.cache and found:
        ckpt.load_into(net, found)
        print(f"The pretrained model loaded from {found}")
    else:
        if args.cache and not found:
            print("warning: cannot find a pretrained model for seed "
                  f"({seed})! Training from scratch; for reproduction use a "
                  f"cached SDF at {model_path}[.npz].", flush=True)
        def _mid_train_extract(done: int) -> None:
            # extract + render the evolving complex mid-training (the
            # reference draws it on an interactive canvas, train.py:210-224;
            # headless here: one PNG snapshot per extraction).  Runs inside
            # ONE training run via the epoch callback so Adam and the cosine
            # schedule are never restarted.
            if done % args.extract_every != 0:
                return
            print(f"[epoch {done}] intermediate extraction:", end="")
            _, ivs, its, _ = extract_mesh(net, args.force)
            if not ivs.shape[0]:
                return  # undertrained: no zero set in the canvas yet
            try:
                from tropical.stanford.visualize import visualize_mesh
                snap_dir = f"meshes/{args.dataset}"
                os.makedirs(snap_dir, exist_ok=True)
                p = visualize_mesh(
                    Mesh(np.asarray(ivs) / training_data.R, np.asarray(its)),
                    os.path.join(snap_dir,
                                 f"training_{args.model_size}_{seed}"
                                 f"_epoch{done:03d}.png"),
                    args.dataset)
                print(f"[epoch {done}] snapshot: {p}")
            except Exception as e:  # matplotlib absent etc.
                print(f"[epoch {done}] snapshot skipped: {e}")

        train(net, training_data, epochs, BATCH_SIZE,
              epoch_callback=(_mid_train_extract
                              if args.extract_every > 0 else None))
        print("Finished training.", flush=True)
        if args.cache:
            saved = ckpt.save_params(model_path, net.params)
            print(f"Saved {saved}")

    polygons, vertices, faces_with_indices, our_t = extract_mesh(net, args.force)

    # export our mesh (reference train.py:244-269)
    vertices_np = np.asarray(vertices) / training_data.R
    our_mesh = Mesh(vertices_np, np.asarray(faces_with_indices))
    print(f"Ours: {our_mesh.vertices.shape}/{our_mesh.faces.shape}")

    if our_mesh.vertices.shape[0] == 0:
        print("warning: empty extraction (the SDF has no zero level set in "
              "the canvas — likely undertrained); skipping export/eval.")
        return 2

    out_dir = f"meshes/{args.dataset}"
    os.makedirs(out_dir, exist_ok=True)
    tag = f"{args.model_size}_{seed}"
    our_mesh.export(os.path.join(out_dir, f"our_mesh_{tag}.ply"))

    if not args.eval:
        return 0

    gt_res = args.gt_res or 512
    evaluate_against_grid_gt(net, our_mesh, our_t, training_data.R, gt_res,
                             out_dir, tag)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
