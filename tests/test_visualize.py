"""Visualization smoke tests: single render, comparison, and the gallery.

Reference scope: tropical/stanford/visualize.py (visualize_mesh +
visualize_all sweep over our mesh and each baseline resolution).
"""

import os

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")


def _tetra():
    from tropical.utils.ply import Mesh

    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    f = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int32)
    return Mesh(v, f)


def test_visualize_mesh(tmp_path):
    from tropical.stanford.visualize import visualize_mesh

    out = visualize_mesh(_tetra(), str(tmp_path / "t.png"), "sphere")
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_visualize_all_gallery(tmp_path):
    from tropical.stanford.visualize import main
    from tropical.utils.ply import write_ply

    m = _tetra()
    d = tmp_path / "meshes" / "sphere"
    os.makedirs(d)
    write_ply(str(d / "our_mesh_small_1.ply"), m.vertices, m.faces)
    for r in (16, 32):
        write_ply(str(d / f"mc{r:03d}_mesh_small_1.ply"),
                  m.vertices * (1 + 0.01 * r), m.faces)
    # stray other-seed/size files must be excluded from the sweep
    write_ply(str(d / "our_mesh_small_2.ply"), m.vertices, m.faces)
    write_ply(str(d / "our_mesh_medium_1.ply"), m.vertices, m.faces)

    rc = main(["-d", "sphere", "-m", "small", "-s", "1", "--all",
               "--meshes_root", str(tmp_path / "meshes")])
    assert rc == 0
    out = d / "outputs"
    names = sorted(os.listdir(out))
    assert names == ["small_gallery_1.png", "small_mc016_1.png",
                     "small_mc032_1.png", "small_our_1.png"]
    assert all(os.path.getsize(out / n) > 0 for n in names)
