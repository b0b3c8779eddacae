"""Checkpoint IO: native .npz params plus reference .pth import.

The reference caches ``state_dict`` at models/{d}/{d}_sdf_{size}_{seed}.pth
(reference train.py:229-231).  We honor that exact path for *loading*
(PyTorch zipfile via CPU torch) and save our own params as a sibling .npz.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


def save_params(path: str, params) -> str:
    """Save a TropicalNet params pytree to ``path`` (forced .npz suffix)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {"table": np.asarray(params["table"])}
    for i, (w, b) in enumerate(zip(params["mlp"]["w"], params["mlp"]["b"])):
        flat[f"w{i}"] = np.asarray(w)
        flat[f"b{i}"] = np.asarray(b)
    np.savez(path, **flat)
    return path


def load_params(path: str):
    data = np.load(path)
    n_layers = sum(1 for k in data.files if k.startswith("w"))
    return {
        "table": jnp.asarray(data["table"]),
        "mlp": {
            "w": [jnp.asarray(data[f"w{i}"]) for i in range(n_layers)],
            "b": [jnp.asarray(data[f"b{i}"]) for i in range(n_layers)],
        },
    }


def find_checkpoint(path_pth: str) -> str | None:
    """Prefer the exact reference .pth path, else our .npz sibling."""
    if os.path.isfile(path_pth):
        return path_pth
    npz = path_pth + ".npz"
    if os.path.isfile(npz):
        return npz
    return None


def load_into(net, path: str):
    if path.endswith(".npz"):
        net.params = load_params(path)
        net.enc.params = net.params["table"]
        return net
    return net.load_torch_checkpoint(path)
