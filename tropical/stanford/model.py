"""SDF network presets for the Stanford workload.

Port of reference tropical/stanford/model.py:18-50: hash encoding (L=4, F=2)
into a [8, 16, 16, 2] ReLU MLP.  ``Net`` here is a thin factory over
:class:`tropical.core.net.TropicalNet`, which implements the full forward /
sdf / region / normal contract the extraction engine consumes.
"""

from __future__ import annotations

import jax

from tropical.core.net import NetSpec, TropicalNet

# model-size -> (r_min, r_max) (reference train.py:70-80)
SIZE_PRESETS = {
    "small": (2, 32),
    "medium": (4, 64),
    "large": (8, 128),
}


def Net(num_layers: int = 3, num_hidden: int = 16, levels: int = 4,
        r_min: int = 2, r_max: int = 32, T: int = 19, eps: float = 1e-4,
        key: jax.Array | None = None) -> TropicalNet:
    spec = NetSpec(num_layers=num_layers, num_hidden=num_hidden, levels=levels,
                   r_min=r_min, r_max=r_max, T=T, eps=eps)
    return TropicalNet(spec, key=key)


def net_for_size(model_size: str, dataset: str = "", seed: int = 0) -> TropicalNet:
    """Build the blessed config for a model size.

    T=21 only for large bunny, else 19 (reference train.py:76-82; the
    reference leaves T unassigned for small/medium — a shipped NameError —
    whose intended default is the model.py:20 value of 19).
    """
    r_min, r_max = SIZE_PRESETS[model_size]
    T = 21 if (model_size == "large" and "bunny" in dataset.lower()) else 19
    return Net(num_layers=3, num_hidden=16, levels=4, r_min=r_min, r_max=r_max,
               T=T, key=jax.random.PRNGKey(seed))
