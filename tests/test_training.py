"""Unit tests for the training loss and optimizer plumbing."""

import jax
import jax.numpy as jnp
import numpy as np

from tropical.core.net import NetSpec, init_net_params, net_sdf
from tropical.stanford.training import (loss_fn, make_optimizer,
                                        make_train_step)


def _tiny():
    spec = NetSpec(num_layers=3, num_hidden=16, levels=2, r_min=2, r_max=4,
                   T=10)
    params = init_net_params(spec, jax.random.PRNGKey(0))
    return spec, params


def test_loss_components():
    spec, params = _tiny()
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (64, 3))
                    .astype(np.float32))
    y = jnp.zeros(64)
    total, l1 = loss_fn(spec, params, x, y, 64)
    assert np.isfinite(float(total)) and np.isfinite(float(l1))
    # the weight-norm and eikonal terms make total > plain l1
    assert float(total) > float(l1)


def test_clamping():
    """Labels beyond +-0.2 are clamped (reference train.py:183-187)."""
    spec, params = _tiny()
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (32, 3))
                    .astype(np.float32))
    _, l1_far = loss_fn(spec, params, x, jnp.full(32, 100.0), 32)
    _, l1_clamp = loss_fn(spec, params, x, jnp.full(32, 0.2), 32)
    np.testing.assert_allclose(float(l1_far), float(l1_clamp), rtol=1e-6)


def test_train_step_reduces_loss():
    spec, params = _tiny()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (256, 3)).astype(np.float32))
    # learnable target: distance to a plane
    y = jnp.asarray((0.3 - np.asarray(x)[:, 0]).astype(np.float32))

    tx, _ = make_optimizer(1e-2, 200)
    opt_state = tx.init(params)
    step = make_train_step(spec, tx, 256)

    first = None
    for i in range(100):
        params, opt_state, total, l1 = step(params, opt_state, x, y)
        if first is None:
            first = float(total)
    assert float(total) < first * 0.7


def test_cosine_schedule_decays():
    _, schedule = make_optimizer(1e-3, 100)
    assert abs(float(schedule(0)) - 1e-3) < 1e-9
    assert float(schedule(50)) < 1e-3
    assert float(schedule(100)) < 1e-8
