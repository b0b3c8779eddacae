"""SDF training: L1 + eikonal + weight-norm loss, Adam with cosine decay.

Port of the reference training loop semantics (tropical/stanford/train.py:
86-205): clamped-L1 on signed distances, an eikonal penalty on the *global*
Frobenius norm of the batch Jacobian (reference quirk at train.py:197), and a
weight-norm regularizer keeping per-neuron weight rows at unit norm
(train.py:199-201).  The whole update is one jitted XLA program.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tropical.core.net import NetSpec, net_sdf

CLAMP = 0.2
EIKONAL_W = 1e-2
WEIGHT_NORM_W = 1e-1


def loss_fn(spec: NetSpec, params, x, y, batch_size: int, n_valid=None):
    """``n_valid`` masks zero-padded rows out of the loss (the sharded path
    pads the batch to a dp multiple; padding must not perturb the loss)."""
    pred = net_sdf(spec, params, x)[:, 0]
    pred_c = jnp.clip(pred, -CLAMP, CLAMP)
    gt = jnp.clip(y, -CLAMP, CLAMP)
    err = jnp.abs(pred_c - gt)
    if n_valid is None:
        l1 = err.mean()
        valid = None
    else:
        valid = jnp.arange(x.shape[0]) < n_valid
        l1 = jnp.where(valid, err, 0.0).sum() / n_valid

    # eikonal on the global batch-Jacobian Frobenius norm (train.py:193-197)
    J = jax.grad(lambda pts: net_sdf(spec, params, pts).sum())(x)
    if valid is not None:
        J = J * valid[:, None].astype(J.dtype)
    eik = EIKONAL_W * (jnp.linalg.norm(J) - 1.0) ** 2 / batch_size

    # per-neuron (output-unit) weight rows at unit norm (train.py:199-201);
    # our weights are [in, out], so rows are columns here
    ws = params["mlp"]["w"]
    wn = sum(((1.0 - jnp.linalg.norm(w, axis=0)) ** 2).mean() for w in ws)
    wn = WEIGHT_NORM_W * wn / len(ws)

    total = l1 + eik + wn
    return total, l1


def make_optimizer(lr: float, total_steps: int):
    schedule = optax.cosine_decay_schedule(lr, total_steps)
    return optax.adam(schedule), schedule


def make_train_step(spec: NetSpec, tx, batch_size: int):
    @jax.jit
    def step(params, opt_state, x, y):
        (total, l1), grads = jax.value_and_grad(
            partial(loss_fn, spec), has_aux=True)(params, x, y, batch_size)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, total, l1

    return step


def make_scan_epoch(spec: NetSpec, tx, batch_size: int):
    """A whole epoch of train steps as ONE jitted ``lax.scan`` dispatch.

    Semantically the per-batch loop of :func:`make_train_step` (same loss,
    same Adam update, same batch order); structurally one XLA program over
    ``xs/ys`` of shape [n_batches, B, ...].  The host loop paid one device
    round-trip per step for the ``float(total)`` loss sync — ~25 ms each on
    a tunneled device, i.e. ~12 s of pure RTT per 500-step epoch; the scan
    returns the full per-step loss trace in a single pull.
    """

    def body(carry, batch):
        params, opt_state = carry
        x, y = batch
        (total, l1), grads = jax.value_and_grad(
            partial(loss_fn, spec), has_aux=True)(params, x, y, batch_size)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), (total, l1)

    @jax.jit
    def epoch(params, opt_state, xs, ys):
        (params, opt_state), (totals, l1s) = jax.lax.scan(
            body, (params, opt_state), (xs, ys))
        return params, opt_state, totals, l1s

    return epoch


def train(net, dataset, epochs: int, batch_size: int = 1000, lr: float = 1e-3,
          verbose: bool = True, resample: bool = True,
          epoch_callback=None, scan: bool | None = None) -> Tuple[dict, float]:
    """Train ``net`` in place; returns (params, final running loss).

    ``epoch_callback(epoch)`` fires after each completed epoch (except the
    last) with ``net`` synced to the current params — used by the train CLI
    to extract/render the evolving complex mid-training WITHOUT splitting
    the run (a split would restart Adam and the cosine schedule per span).

    ``scan=None`` (auto) runs each epoch as one ``lax.scan`` dispatch when
    the dataset length divides evenly into batches (the reference constants
    always do: 50000 % 1000 == 0); ``scan=False`` forces the per-step host
    loop (one dispatch per batch)."""
    total_steps = int(epochs * len(dataset) / batch_size)
    tx, schedule = make_optimizer(lr, total_steps)
    opt_state = tx.init(net.params)
    if scan is None:
        scan = len(dataset) % batch_size == 0
    step = None if scan else make_train_step(net.spec, tx, batch_size)
    epoch_fn = make_scan_epoch(net.spec, tx, batch_size) if scan else None

    params = net.params
    it = 0
    running = 0.0
    for epoch in range(epochs):
        if resample:
            dataset.resample()
        if scan:
            xs, ys = [], []
            for x, y in dataset.batches(batch_size):
                xs.append(x)
                ys.append(y)
            params, opt_state, totals, l1s = epoch_fn(
                params, opt_state, jnp.asarray(np.stack(xs)),
                jnp.asarray(np.stack(ys)))
            totals = np.asarray(totals)
            l1s = np.asarray(l1s)
            for i in range(len(totals)):
                running += float(totals[i])
                it += 1
                if verbose and i % 10 == 9:
                    cur_lr = float(schedule(it))
                    print(f"[{epoch + 1}, {i + 1:5d}] lr: {cur_lr:.4f}, "
                          f"loss: {running / 10:.5f} l1: {float(l1s[i]):.5f}")
                    running = 0.0
        else:
            for i, (x, y) in enumerate(dataset.batches(batch_size)):
                params, opt_state, total, l1 = step(
                    params, opt_state, jnp.asarray(x), jnp.asarray(y))
                running += float(total)
                it += 1
                if verbose and i % 10 == 9:
                    cur_lr = float(schedule(it))
                    print(f"[{epoch + 1}, {i + 1:5d}] lr: {cur_lr:.4f}, "
                          f"loss: {running / 10:.5f} l1: {float(l1):.5f}")
                    running = 0.0
        if epoch_callback is not None and epoch + 1 < epochs:
            net.params = params
            net.enc.params = params["table"]
            epoch_callback(epoch + 1)

    net.params = params
    net.enc.params = params["table"]
    return params, running
