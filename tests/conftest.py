"""Test config: run on a virtual 8-device CPU mesh (no TPU needed).

The image's sitecustomize pre-imports jax with JAX_PLATFORMS=axon latched, so
setting the env var here is too late — use jax.config instead (the backend is
created lazily, so this works as long as no jax computation ran yet).
XLA_FLAGS is read at backend creation, so it can still be set here.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# keep test runs from polluting the committed TPU-derived caps cache: tests
# memoize caps for fixture nets (sometimes degenerate, e.g. undertrained
# CLI runs) and the persist path defaults to the package file
import tempfile  # noqa: E402

os.environ.setdefault(
    "TROPICAL_CAPS_FILE",
    os.path.join(tempfile.mkdtemp(prefix="tropical-test-caps-"),
                 "caps_cache.json"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def trained_net():
    """A small SDF net trained on the procedural sphere (shared across tests)."""
    from tropical.stanford.dataset import StanfordDataset
    from tropical.stanford.model import Net
    from tropical.stanford.training import train

    net = Net(num_layers=3, num_hidden=16, levels=4, r_min=2, r_max=16,
              T=19, key=jax.random.PRNGKey(1))
    ds = StanfordDataset("sphere", rng=np.random.default_rng(1),
                         n_samples=8000)
    train(net, ds, epochs=15, batch_size=500, verbose=False)
    return net
