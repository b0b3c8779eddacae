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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
