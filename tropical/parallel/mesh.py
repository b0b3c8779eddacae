"""Multi-chip sharding: device mesh, batch/table shardings, parallel train step.

The reference has no distributed code at all (SURVEY §2.4/§5.8) — a single
CUDA device is assumed.  Here every array moves through ``jax.sharding`` so a
multi-chip mode is additive:

- **dp**: the sample/vertex/edge axis shards across chips — training batches,
  extraction forwards and chamfer tiles are all embarrassingly parallel along
  their leading axis, with one gradient ``psum`` per step (inserted by XLA
  from the shardings),
- **mp**: the hash table (the dominant parameter object, up to 2^21 x 2
  floats for large-bunny) shards across the model axis; gathers become
  collective lookups.

Collectives ride ICI: the mesh is a flat device list on one slice; nothing
here assumes DCN.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, shape: Sequence[int] | None = None,
              names: Sequence[str] = ("dp", "mp")) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if len(devices) < n:
        raise ValueError(
            f"make_mesh: requested {n} devices but only {len(devices)} "
            f"available ({[d.platform for d in devices]}); for a virtual "
            "CPU mesh set XLA_FLAGS=--xla_force_host_platform_device_count="
            f"{n} and JAX_PLATFORMS=cpu before jax initializes a backend")
    devices = devices[:n]
    if shape is not None and int(np.prod(shape)) != n:
        raise ValueError(f"make_mesh: shape {tuple(shape)} does not tile "
                         f"{n} devices")
    if shape is None:
        # widest dp axis that divides n; mp gets the rest
        mp = 1
        for cand in (2, 4, 8):
            if n % cand == 0 and n // cand >= cand:
                mp = cand
        shape = (n // mp, mp)
    arr = np.asarray(devices).reshape(*shape)
    return Mesh(arr, tuple(names))


def shard_batch(x, mesh: Mesh):
    """Shard the leading axis over dp, pad to a multiple of the dp size."""
    x = jnp.asarray(x)
    dp = mesh.shape["dp"]
    n = x.shape[0]
    pad = (-n) % dp
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return jax.device_put(x, NamedSharding(mesh, P("dp")))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def table_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the hash table's entry axis over mp (tensor parallelism for the
    dominant parameter object)."""
    return NamedSharding(mesh, P("mp", None))


def shard_params(params, mesh: Mesh):
    """Replicated MLP (tiny), mp-sharded hash table."""
    params = jax.device_put(params, NamedSharding(mesh, P()))
    table = jax.device_put(params["table"], table_sharding(mesh))
    return {**params, "table": table}


def sharded_train_step(spec, tx, batch_size: int, mesh: Mesh):
    """The jitted training step with dp-sharded batch and mp-sharded table.

    XLA inserts the gradient all-reduce over dp and the collective table
    lookups over mp from the shardings alone.
    """
    from tropical.stanford.training import loss_fn

    import optax
    from functools import partial

    batch_sh = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())

    @partial(jax.jit,
             in_shardings=(None, None, batch_sh, batch_sh, None),
             out_shardings=(None, None, repl, repl))
    def _step(params, opt_state, x, y, n_valid):
        (total, l1), grads = jax.value_and_grad(
            partial(loss_fn, spec), has_aux=True)(
                params, x, y, batch_size, n_valid)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, total, l1

    def step(params, opt_state, x, y, n_valid=None):
        # shard_batch zero-pads x/y to a dp multiple; mask padding out of the
        # loss so a ragged batch gives the same gradients as unsharded
        if n_valid is None:
            n_valid = x.shape[0]
        return _step(params, opt_state, x, y, jnp.int32(n_valid))

    return step


def sharded_apply(fn, mesh: Mesh):
    """Wrap a pure (params, x)->y function so x shards over dp.

    Used by the extraction engine to fan the vertex/edge forwards out over all
    chips; the 33 neuron insertions stay sequential (algorithmic dependency),
    but within a step every edge is independent.
    """
    batch_sh = NamedSharding(mesh, P("dp"))
    jitted = jax.jit(fn, in_shardings=(None, batch_sh))

    def apply(params, x):
        n = x.shape[0]
        y = jitted(params, shard_batch(x, mesh))
        # shard_batch pads the leading axis to a dp multiple; drop the
        # phantom rows so callers see exactly len(x) results
        return y[:n]

    return apply
