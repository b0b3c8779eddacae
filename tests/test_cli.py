"""CLI surface smoke tests (tiny settings, host engine, tmp cwd)."""

import os

import numpy as np
import pytest


@pytest.fixture()
def tmp_cwd(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_train_cli_end_to_end(tmp_cwd, monkeypatch):
    import tropical.stanford.dataset as ds_mod
    import tropical.stanford.train as train_mod
    from tropical.stanford.dataset import StanfordDataset

    # route the eval ladder through the fused device-MC engine (the
    # accelerator default) so the CLI exercises it end-to-end; the host
    # paths stay covered by test_marching_cubes / test_mc_device
    monkeypatch.setenv("TROPICAL_MC_ENGINE", "device")

    # shrink the workload: tiny dataset + tiny eval resolutions
    orig_init = StanfordDataset.__init__

    def small_init(self, name="sphere", rng=None, n_samples=2000):
        orig_init(self, name, rng, n_samples=2000)

    monkeypatch.setattr(ds_mod.StanfordDataset, "__init__", small_init)
    # keep checkpoints inside the tmp dir
    monkeypatch.setattr(train_mod, "model_path_for",
                        lambda d, m, s: os.path.join("models", f"{d}_{m}_{s}.pth"))
    monkeypatch.setattr(train_mod, "BATCH_SIZE", 250)
    # fewer eval rays: 100k x CPU ray-trace would dominate the suite
    import tropical.utils.chamfer as ch

    orig_rays = ch.get_rays
    monkeypatch.setattr(ch, "get_rays",
                        lambda n=100000, rng=None: orig_rays(2000, rng))

    # 25 epochs: at 15 this tiny 2000-sample fixture is marginal — the
    # trained tanh SDF's max grazes zero (+-0.005 depending on benign
    # numeric changes elsewhere, e.g. the tcnn boundary-cell wrap), and an
    # empty extraction fails the smoke test for the wrong reason
    rc = train_mod.main(["-d", "sphere", "-s", "3", "-m", "small",
                         "--epochs", "25", "-e", "--gt_res", "24",
                         "--extract_every", "24"])
    assert rc == 0
    assert os.path.isfile("meshes/sphere/our_mesh_small_3.ply")
    assert os.path.isfile("models/sphere_small_3.pth.npz")
    # the evolving complex was rendered at the intermediate extraction
    # (epoch 24 of 25: late enough that the SDF already has a zero set —
    # earlier-epoch extractions on this tiny fixture are legitimately empty
    # and render nothing).  train.py deliberately degrades to a no-op
    # snapshot without matplotlib, so only assert where it can render.
    try:
        import matplotlib  # noqa: F401

        assert os.path.isfile("meshes/sphere/training_small_3_epoch024.png")
    except ImportError:
        pass

    from tropical.utils.ply import read_ply

    mesh = read_ply("meshes/sphere/our_mesh_small_3.ply")
    assert mesh.vertices.shape[0] > 0
    assert mesh.faces.shape[0] > 0
    assert np.isfinite(mesh.vertices).all()


def test_evaluate_cli_missing_model(tmp_cwd):
    from tropical.stanford.evaluate import main

    assert main(["-d", "sphere", "-m", "large", "-s", "999"]) == 1
