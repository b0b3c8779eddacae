"""Golden-funnel regression: extraction on the committed checkpoints must
reproduce the recorded vertex/edge/face counts EXACTLY.

This formalizes the reference's golden-log regression record (SURVEY §4.4:
logs/run_small.log holds the expected funnel counts for the blessed configs;
reference subpoly.py:71-84 prints them).  The Stanford PLY data is absent from
this image, so the committed procedural sphere/torus checkpoints stand in;
scripts/golden_regression.py runs the real blessed seed matrix against
tests/golden/reference_logs.json whenever the data/checkpoints exist.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__),
                                     "golden/self_golden.json")))


def _load_net(entry):
    import jax

    from tropical.stanford.model import Net
    from tropical.utils import checkpoint as ckpt

    net = Net(num_layers=3, num_hidden=16, levels=4,
              r_min=entry.get("r_min", 2), r_max=entry.get("r_max", 32),
              T=19, key=jax.random.PRNGKey(1))
    path = os.path.join(os.path.dirname(__file__), "..", entry["checkpoint"])
    found = ckpt.find_checkpoint(path)
    assert found, f"committed checkpoint missing: {path}"
    ckpt.load_into(net, found)
    return net


@pytest.mark.parametrize("name", ["sphere", "torus", "sphere_medium_curved"])
def test_funnel_counts_exact(name):
    from tropical.extract.subdivide import subpoly
    from tropical.extract import stats
    from tropical.utils.chamfer import chamfer_distance
    from tropical.utils.isosurface import run_marching_tetrahedra
    from tropical.core.net import preprocess

    g = GOLDEN[name]
    net = _load_net(g)
    faces, vertices, tris = subpoly(net, 3, 1.2,
                                    force=g.get("force", True),
                                    verbose=False, engine="host")

    assert stats.LAST["pre_v"] == g["pre_v"], stats.LAST
    assert stats.LAST["pre_e"] == g["pre_e"], stats.LAST
    assert stats.LAST["post_v"] == g["post_v"], stats.LAST
    assert stats.LAST["post_e"] == g["post_e"], stats.LAST
    assert tris.shape[0] == g["n_tris"]

    gt = run_marching_tetrahedra(net, 48, 1.2)
    cd = float(chamfer_distance(vertices, np.asarray(gt.vertices, np.float32)))
    assert abs(cd - g["cd_vs_mt48"]) < 0.05 * g["cd_vs_mt48"] + 1e-4, cd

    marks = np.asarray(net.marks)
    xu = np.asarray(preprocess(net.spec, jnp.asarray(vertices)))
    d = np.abs(xu[:, :, None] - marks[None, None, :]).min(-1)
    on_grid = float((d < 1e-4).any(-1).mean())
    assert on_grid >= g["on_grid_frac"] - 0.01, on_grid
