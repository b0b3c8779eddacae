"""Checkpoint IO round-trip and torch .pth import layout."""

import os
import tempfile

import jax
import numpy as np

from tropical.core.net import NetSpec, TropicalNet
from tropical.utils import checkpoint as ckpt


def test_npz_roundtrip():
    spec = NetSpec(num_layers=3, num_hidden=16, levels=2, r_min=2, r_max=4,
                   T=10)
    net = TropicalNet(spec, key=jax.random.PRNGKey(0))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.pth")
        saved = ckpt.save_params(path, net.params)
        assert saved.endswith(".npz")
        assert ckpt.find_checkpoint(path) == saved

        net2 = TropicalNet(spec, key=jax.random.PRNGKey(7))
        ckpt.load_into(net2, saved)
    np.testing.assert_array_equal(np.asarray(net2.params["table"]),
                                  np.asarray(net.params["table"]))
    for w1, w2 in zip(net.params["mlp"]["w"], net2.params["mlp"]["w"]):
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_torch_state_dict_import():
    """Reference .pth layout: enc.module.params flat, fc.i.weight [out,in]."""
    spec = NetSpec(num_layers=3, num_hidden=16, levels=2, r_min=2, r_max=4,
                   T=10)
    net = TropicalNet(spec, key=jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    g = spec.grid
    state = {"enc.module.params":
             rng.normal(size=g.n_entries * g.features).astype(np.float32)}
    for i, (nin, nout) in enumerate(zip(spec.num_nodes[:-1],
                                        spec.num_nodes[1:])):
        state[f"fc.{i}.weight"] = rng.normal(size=(nout, nin)).astype(np.float32)
        state[f"fc.{i}.bias"] = rng.normal(size=nout).astype(np.float32)

    net.load_torch_state_dict(state)
    np.testing.assert_array_equal(
        np.asarray(net.params["table"]).ravel(), state["enc.module.params"])
    # torch Linear stores [out, in]; ours is [in, out]
    np.testing.assert_array_equal(
        np.asarray(net.params["mlp"]["w"][0]), state["fc.0.weight"].T)


def test_find_checkpoint_prefers_pth(tmp_path):
    pth = tmp_path / "m.pth"
    npz = tmp_path / "m.pth.npz"
    npz.write_bytes(b"x")
    assert ckpt.find_checkpoint(str(pth)) == str(npz)
    pth.write_bytes(b"x")
    assert ckpt.find_checkpoint(str(pth)) == str(pth)


def test_profiling_phases():
    from tropical.utils.profiling import Phases, timeit

    ph = Phases(enabled=True)
    with ph("a"):
        pass
    with ph("a"):
        pass
    assert ph.counts["a"] == 2
    assert "a" in ph.summary()

    @timeit
    def f(x):
        return x + 1

    assert f(1) == 2
