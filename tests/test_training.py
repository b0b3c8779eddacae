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


def test_scan_epoch_matches_host_loop():
    """One lax.scan epoch produces the same params/losses as the per-step
    host loop (same batches, same Adam/cosine state threading)."""
    from tropical.stanford.training import make_scan_epoch

    spec, params = _tiny()
    rng = np.random.default_rng(3)
    n_batches, B = 6, 32
    xs = rng.uniform(-1, 1, (n_batches, B, 3)).astype(np.float32)
    ys = rng.uniform(-0.3, 0.3, (n_batches, B)).astype(np.float32)

    tx, _ = make_optimizer(1e-3, n_batches)
    step = make_train_step(spec, tx, B)
    p_loop = params
    s_loop = tx.init(params)
    totals_loop = []
    for i in range(n_batches):
        p_loop, s_loop, total, _ = step(
            p_loop, s_loop, jnp.asarray(xs[i]), jnp.asarray(ys[i]))
        totals_loop.append(float(total))

    tx2, _ = make_optimizer(1e-3, n_batches)
    epoch = make_scan_epoch(spec, tx2, B)
    p_scan, _, totals_scan, _ = epoch(
        params, tx2.init(params), jnp.asarray(xs), jnp.asarray(ys))

    np.testing.assert_allclose(
        np.asarray(totals_scan), np.asarray(totals_loop), rtol=2e-5, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(p_loop),
                    jax.tree_util.tree_leaves(p_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_train_scan_auto_end_to_end():
    """train(scan=None) auto-selects the scan path on an even split and
    still reduces the loss on a small synthetic problem."""
    from tropical.core.net import TropicalNet
    from tropical.stanford.training import train

    spec = NetSpec(num_layers=3, num_hidden=16, levels=2, r_min=2, r_max=4,
                   T=10)
    net = TropicalNet(spec, key=jax.random.PRNGKey(0))

    class _DS:
        def __init__(self):
            # balanced signed distances to a sphere of radius 0.6: radii
            # uniform in [0.1, 1.1] so labels straddle zero (an unbalanced
            # set saturates pred beyond the +-0.2 clamp and flattens L1)
            rng = np.random.default_rng(0)
            d = rng.normal(size=(256, 3)).astype(np.float32)
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            r = rng.uniform(0.1, 1.1, (256, 1)).astype(np.float32)
            self.X = d * r
            self.Y = (0.6 - r[:, 0]).astype(np.float32)

        def __len__(self):
            return 256

        def resample(self):
            pass

        def batches(self, batch_size, shuffle=True):
            for i in range(0, 256, batch_size):
                yield self.X[i:i + batch_size], self.Y[i:i + batch_size]

    ds = _DS()
    # center the init so pred starts inside the +-0.2 clamp window — the
    # clamp has zero gradient outside it (reference train.py semantics), so
    # an off-center init would freeze the L1 term entirely
    from tropical.core.net import net_outputs
    out = np.asarray(net_outputs(spec, net.params, jnp.asarray(ds.X)))[:, -1]
    b = np.asarray(net.params["mlp"]["b"][2]).copy()
    b[1] -= out.mean()
    net.params["mlp"]["b"][2] = jnp.asarray(b)
    # track the L1 SDF-error component (the total is dominated by the
    # weight-norm regularizer at init, which barely moves in a short run)
    e0 = float(loss_fn(spec, net.params, jnp.asarray(ds.X),
                       jnp.asarray(ds.Y), 256)[1])
    train(net, ds, epochs=60, batch_size=64, verbose=False, resample=False)
    e1 = float(loss_fn(spec, net.params, jnp.asarray(ds.X),
                       jnp.asarray(ds.Y), 256)[1])
    assert e1 < e0 * 0.6, (e0, e1)
