"""Small SDF MLP with pre-activation gathering and grouped-activation modes.

Functional port of the reference ``Net`` forward contract
(tropical/stanford/model.py:52-76):

- a stack of Linear layers with ReLU between them,
- ``gather=True`` collects every hidden layer's *pre-activation* plus the final
  layer's ``x[:,1] - x[:,0]`` into R = (num_layers-1)*num_hidden + 1 "neuron
  distance" columns,
- ``group=k`` replaces ReLU with a pseudo-ReLU whose on/off pattern is shared
  by each consecutive group of k rows, decided by rows 0 and k-1 of the group
  (used for the 8 corner points of an edge's cube so they are evaluated in one
  common linear region; reference model.py:66-70).

Weights are stored [in, out] so the batched matmul maps straight onto the MXU.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def init_mlp_params(key: jax.Array, num_nodes: Sequence[int], dtype=jnp.float32):
    """Kaiming-uniform init matching torch.nn.Linear defaults.

    torch.nn.Linear initializes W ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (weight
    via kaiming_uniform(a=sqrt(5))) and the bias with the same bound; the exact
    distribution only matters for training from scratch, not for extraction.
    """
    ws, bs = [], []
    for i in range(len(num_nodes) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        fan_in = num_nodes[i]
        bound = 1.0 / (fan_in ** 0.5)
        ws.append(jax.random.uniform(
            k1, (num_nodes[i], num_nodes[i + 1]), dtype, -bound, bound))
        bs.append(jax.random.uniform(k2, (num_nodes[i + 1],), dtype, -bound, bound))
    return {"w": ws, "b": bs}


def mlp_forward(
    params,
    feats: jax.Array,
    gather: bool = False,
    group: int = 1,
    eps: float = 1e-4,
) -> Tuple[jax.Array, jax.Array | None]:
    """Forward through the Linear/ReLU stack.

    Args:
        params: {"w": [W_i (in,out)], "b": [b_i]}.
        feats: encoded inputs [B, in_dim].
        gather: also return the R pre-activation columns [B, R].
        group: grouped pseudo-ReLU size (1 = plain ReLU).

    Returns:
        (out [B, out_dim], gathered [B, R] or None)
    """
    ws: List[jax.Array] = params["w"]
    bs: List[jax.Array] = params["b"]
    n = len(ws)
    x = feats
    pre = []
    for i in range(n):
        x = x @ ws[i] + bs[i]
        if i != n - 1:
            if gather:
                pre.append(x)
            if group == 1:
                x = jax.nn.relu(x)
            else:
                # shared activation pattern per group of `group` rows, decided
                # by the first and last row (reference model.py:66-70)
                m = (x[::group] > eps) | (x[group - 1::group] > eps)
                x = x * jnp.repeat(m, group, axis=0).astype(x.dtype)
        else:
            if gather:
                pre.append(x[:, 1:] - x[:, :1])
    if gather:
        return x, jnp.concatenate(pre, axis=-1)
    return x, None
