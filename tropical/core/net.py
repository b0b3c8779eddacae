"""TropicalNet: hash-grid + MLP SDF network with region indicators.

TPU-native equivalent of the reference ``Net`` (tropical/stanford/model.py:18-135).
The network is a pair (spec, params-pytree); every method is a pure function
jitted per shape bucket.  Contract consumed by the extraction engine:

- ``num_layers`` / ``num_hidden`` / ``enc`` attributes,
- ``forward(x, gather, group)`` -> (out [B,2], gathered R=33 columns),
- ``sdf(x)`` = tanh(out1 - out0)                      (model.py:84-88),
- ``region(x, output, eps)`` -> ternary sign vector [B, D+R] prepended with the
  grid on-plane mask, plus per-axis cell offsets       (model.py:90-103),
- ``normal(x, l, h)`` = d sdf / dx (or a chosen neuron) (model.py:105-123),
- ``preprocess``/``preprocess_inverse`` world<->unit-cube maps (model.py:78-82).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property, partial

import jax
import jax.numpy as jnp
import numpy as np

from tropical.core import mlp as mlp_mod
from tropical.core.buffers import padded_apply
from tropical.core.hashgrid import (HashGridSpec, TropicalHashGrid,
                                    encode, encode_lattice, init_params)


@dataclass(frozen=True)
class NetSpec:
    """Static architecture config (reference model.py:19-50 defaults)."""

    num_layers: int = 3
    num_hidden: int = 16
    levels: int = 4
    r_min: int = 2
    r_max: int = 32
    T: int = 19
    eps: float = 1e-4
    features: int = 2
    dim: int = 3
    scale: float = 1.0  # world range is [-scale, scale]^D

    @cached_property
    def grid(self) -> HashGridSpec:
        return HashGridSpec(
            scale=1.0, dim=self.dim, levels=self.levels, features=self.features,
            log2_table=self.T, n_min=self.r_min, n_max=self.r_max, eps=self.eps)

    @cached_property
    def num_nodes(self):
        return ([self.levels * self.features]
                + [self.num_hidden] * (self.num_layers - 1) + [2])

    @property
    def n_neuron_cols(self) -> int:
        """R: hidden pre-activations plus the final difference column."""
        return (self.num_layers - 1) * self.num_hidden + 1


def init_net_params(spec: NetSpec, key: jax.Array):
    k1, k2 = jax.random.split(key)
    return {
        "table": init_params(spec.grid, k1),
        "mlp": mlp_mod.init_mlp_params(k2, spec.num_nodes),
    }


# ---------------------------------------------------------------------------
# pure functions (jit-safe)
# ---------------------------------------------------------------------------

def preprocess(spec: NetSpec, x):
    """World [-scale, scale]^D -> unit cube (model.py:78-79)."""
    return (x + spec.scale) / (spec.scale * 2)


def preprocess_inverse(spec: NetSpec, x):
    return x * (spec.scale * 2) - spec.scale


def net_forward(spec: NetSpec, params, x, gather: bool = False, group: int = 1):
    feats = encode(spec.grid, params["table"], preprocess(spec, x))
    return mlp_mod.mlp_forward(params["mlp"], feats.astype(jnp.float32),
                               gather=gather, group=group, eps=spec.eps)


def net_sdf(spec: NetSpec, params, x):
    out, _ = net_forward(spec, params, x)
    # tanh does not change the zero level set (model.py:84-88)
    return jnp.tanh(out[:, 1:] - out[:, :1])


def net_outputs(spec: NetSpec, params, x, group: int = 1):
    """The R gathered 'neuron distance' columns [B, R]."""
    _, gathered = net_forward(spec, params, x, gather=True, group=group)
    return gathered


def net_outputs_lattice(spec: NetSpec, params, xw, yw, zw, tables=None):
    """R gathered columns over the separable world-coordinate lattice
    {xw} x {yw} x {zw} -> [Nx*Ny*Nz, R], x-major point order — equal (to f32
    rounding) to ``net_outputs`` over the meshgrid, but dense hash-grid
    levels are evaluated with the gather-free factored interpolation of
    :func:`tropical.core.hashgrid.encode_lattice` (the extraction skeleton's
    hot path; reference tropical.py:81-111 evaluates the same lattice
    pointwise on GPU)."""
    feats = encode_lattice(spec.grid, params["table"],
                           preprocess(spec, xw), preprocess(spec, yw),
                           preprocess(spec, zw), tables=tables)
    return mlp_mod.mlp_forward(params["mlp"], feats.astype(jnp.float32),
                               gather=True, eps=spec.eps)[1]


def net_sdf_lattice(spec: NetSpec, params, xw, yw, zw, tables=None):
    """SDF over the separable world-coordinate lattice {xw} x {yw} x {zw} ->
    [Nx*Ny*Nz] f32, x-major point order — equal (to f32 rounding; the
    factored interpolation associates differently) to ``net_sdf`` over the
    meshgrid, but gather-free on dense hash-grid levels via
    :func:`tropical.core.hashgrid.encode_lattice`.  The MC/MT eval ladder's
    grid sweeps are exactly such lattices (reference train.py:276-283
    evaluates them pointwise on GPU)."""
    feats = encode_lattice(spec.grid, params["table"],
                           preprocess(spec, xw), preprocess(spec, yw),
                           preprocess(spec, zw), tables=tables)
    out, _ = mlp_mod.mlp_forward(params["mlp"], feats.astype(jnp.float32))
    return jnp.tanh(out[:, 1] - out[:, 0])


def net_region(spec: NetSpec, params, marks, x, output=None, eps: float | None = None):
    """Ternary region indicator (Def. 3.4) + grid mask/offset.

    Returns (m [B, D+R] int32 in {-1,0,1} with the first D columns the {0,1}
    grid mask, offset [B, D] int32, output [B, R] float32), matching reference
    model.py:90-103 column order.
    """
    eps = spec.eps if eps is None else eps
    if output is None:
        output = net_outputs(spec, params, x)
    m = jnp.where(output > 0, 1, -1).astype(jnp.int32)
    m = jnp.where(jnp.abs(output) <= eps, 0, m)

    xu = preprocess(spec, x)
    offset = jnp.searchsorted(marks, xu + eps) - 1
    wrapped = jnp.where(offset < 0, offset + marks.shape[0], offset)
    mark_at = jnp.take(marks, wrapped, axis=0, mode="clip")
    grid_mask = (jnp.abs(mark_at - xu) > eps).astype(jnp.int32)

    return jnp.concatenate([grid_mask, m], axis=-1), offset.astype(jnp.int32), output


def net_normal(spec: NetSpec, params, x, idx: int | None = None):
    """Per-point gradient of sdf (or of neuron column ``idx``) w.r.t. x."""
    if idx is None:
        f = lambda pts: net_sdf(spec, params, pts).sum()
    else:
        f = lambda pts: net_outputs(spec, params, pts)[:, idx].sum()
    return jax.grad(f)(x)


# ---------------------------------------------------------------------------
# wrapper class with bucketed jit caching
# ---------------------------------------------------------------------------

class TropicalNet:
    """Stateful convenience wrapper bundling spec + params + jitted methods."""

    def __init__(self, spec: NetSpec, params=None, key: jax.Array | None = None,
                 mesh=None):
        self.spec = spec
        if params is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            params = init_net_params(spec, key)
        self.mesh = mesh
        if mesh is not None:
            # replicate params over the mesh (the table is <=16 MB; collective
            # per-lookup gathers from an mp-sharded table would dominate)
            from jax.sharding import NamedSharding, PartitionSpec

            params = jax.device_put(params, NamedSharding(mesh,
                                                          PartitionSpec()))
        self.params = params
        self.enc = TropicalHashGrid(spec.grid, params["table"])
        self.marks = self.enc.marks

        if mesh is None:
            xsh = None
        else:
            # the point/edge axis shards over every mesh axis (dp and mp alike
            # — extraction forwards are embarrassingly parallel per row, so
            # all chips serve the batch dimension)
            from jax.sharding import NamedSharding, PartitionSpec

            xsh = NamedSharding(mesh, PartitionSpec(tuple(mesh.axis_names)))

        def _jit(fn, n_lead: int = 1, **kw):
            """jit with the last array arg sharded over the mesh batch axis."""
            if xsh is None:
                return jax.jit(fn, **kw)
            return jax.jit(fn, in_shardings=(None,) * n_lead + (xsh,), **kw)

        s = spec
        self._fwd_gather = _jit(
            lambda p, x: net_forward(s, p, x, gather=True))
        self._fwd_gather_g8 = _jit(
            lambda p, x: net_forward(s, p, x, gather=True, group=8))
        self._sdf = _jit(lambda p, x: net_sdf(s, p, x))
        self._region = _jit(
            lambda p, mk, x, eps: net_region(s, p, mk, x, eps=eps),
            n_lead=2, static_argnums=(3,))
        self._region_from_out = jax.jit(
            lambda p, mk, x, out, eps: net_region(s, p, mk, x, output=out, eps=eps),
            static_argnums=(4,))
        self._normal = _jit(
            lambda p, x, idx: net_normal(s, p, x, idx),
            static_argnums=(2,))
        self._sdf_and_grad = _jit(
            lambda p, x: (net_sdf(s, p, x),
                          jax.grad(lambda q: net_sdf(s, p, q).sum())(x)))

    def sharded(self, mesh) -> "TropicalNet":
        """A view of this net whose batched forwards shard their point axis
        over ``mesh`` (multi-chip extraction fan-out; the reference is
        single-device, SURVEY §5.8 — this is the additive sharding plan)."""
        return TropicalNet(self.spec, params=self.params, mesh=mesh)

    # --- reference-API surface -------------------------------------------
    @property
    def num_layers(self):
        return self.spec.num_layers

    @property
    def num_hidden(self):
        return self.spec.num_hidden

    @property
    def eps(self):
        return self.spec.eps

    def preprocess(self, x):
        return preprocess(self.spec, x)

    def preprocess_inverse(self, x):
        return preprocess_inverse(self.spec, x)

    def __call__(self, x, gather: bool = False, group: int = 1):
        if group == 1:
            out, g = padded_apply(partial(self._fwd_gather, self.params), x)
        else:
            assert group == 8, "only group=8 (cube corners) is used"
            out, g = padded_apply(partial(self._fwd_gather_g8, self.params), x)
        return (out, g) if gather else out

    def sdf(self, x):
        return padded_apply(partial(self._sdf, self.params), x)

    def sdf_and_grad(self, x):
        return padded_apply(partial(self._sdf_and_grad, self.params), x)

    def outputs(self, x, group: int = 1):
        _, g = self(x, gather=True, group=group)
        return g

    def region(self, x, output=None, eps: float | None = None):
        eps = self.spec.eps if eps is None else float(eps)
        if output is None:
            return padded_apply(
                lambda xx: self._region(self.params, self.marks, xx, eps), x)
        return padded_apply(
            lambda xx, oo: self._region_from_out(self.params, self.marks, xx, oo, eps),
            x, output)

    def normal(self, x, l: int | None = None, h: int | None = None):
        if l is None or h is None or h == self.num_hidden:
            idx = None
        else:
            idx = l * self.num_hidden + h
        return padded_apply(lambda xx: self._normal(self.params, xx, idx), x)

    def check_orthogonality(self):
        """Print per-layer row-orthogonality diagnostics (model.py:125-132)."""
        import numpy as np

        for i, w in enumerate(self.params["mlp"]["w"]):
            wn = np.asarray(w).T  # rows = output units
            wn = wn / np.linalg.norm(wn, axis=-1, keepdims=True)
            loss = np.abs(wn @ wn.T - np.eye(wn.shape[0])).max()
            print(wn.shape)
            print(f"{i} layer orthogonality: {loss:.4f}")

    def device(self):
        return jax.devices()[0]

    # --- checkpoint interop ----------------------------------------------
    def load_torch_state_dict(self, state):
        """Import a reference PyTorch checkpoint (train.py:229-231 format).

        Expects keys ``enc.module.params`` (flat float32 hash table, entries
        x features with feature-fastest layout) and ``fc.{i}.weight``/``bias``
        ([out,in] torch Linear layout -> transposed to our [in,out]).
        """
        import numpy as np

        def as_np(v):
            return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                              np.float32)

        table = as_np(state["enc.module.params"]).reshape(
            self.spec.grid.n_entries, self.spec.grid.features)
        ws, bs = [], []
        for i in range(len(self.spec.num_nodes) - 1):
            ws.append(as_np(state[f"fc.{i}.weight"]).T)
            bs.append(as_np(state[f"fc.{i}.bias"]))
        self.params = {"table": jnp.asarray(table),
                       "mlp": {"w": [jnp.asarray(w) for w in ws],
                               "b": [jnp.asarray(b) for b in bs]}}
        self.enc.params = self.params["table"]
        return self

    def load_torch_checkpoint(self, path: str):
        import torch  # CPU torch is available in the image; used only for IO

        return self.load_torch_state_dict(torch.load(path, map_location="cpu"))
