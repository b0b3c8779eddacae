"""Multiresolution hash-grid encoding (Müller et al. 2022) as pure JAX.

TPU-native replacement for the reference's ``tinycudann`` dependency
(reference: tropical/tropical.py:17,32-47 wraps ``tcnn.Encoding`` with otype
Grid/Hash).  The semantics follow the public instant-ngp / tiny-cuda-nn grid
encoding so that checkpoints exported from the reference (``enc.module.params``)
can be imported:

- per-level scale   ``s_l = N_min * b**l - 1``  with geometric growth
  ``b = exp2(log2(N_max*scale/N_min) / (L-1))``   (reference tropical.py:31,55),
- resolution        ``r_l = ceil(s_l) + 1``,
- sample position   ``pos = x * s_l + 0.5`` (the 0.5-voxel offset of
  Müller et al. Appendix A; reference tropical.py:60-61),
- dense linear index while ``r_l**D`` fits the table, otherwise the spatial
  hash ``xor_d(grid[d] * primes[d]) mod 2^T`` with primes
  (1, 2654435761, 805459861),
- per-level table size ``min(next_multiple(r_l**D, 8), 2^T)``,
- trilinear interpolation over the 2^D cell corners, float32 params.

Everything here is shape-static and jit-friendly: the per-level scales,
resolutions and offsets are Python constants derived from the spec, so XLA
sees a fully unrolled, fusable gather/fma pipeline.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import cached_property
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

PRIMES = (1, 2654435761, 805459861)


def _next_multiple(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class HashGridSpec:
    """Static configuration of a multiresolution hash grid.

    Mirrors the constructor surface of the reference ``TropicalHashGrid``
    (tropical/tropical.py:21-44): scale, D, L, F, T, N_min, N_max, eps.
    """

    scale: float = 1.0
    dim: int = 3
    levels: int = 16
    features: int = 2
    log2_table: int = 19
    n_min: int = 16
    n_max: int = 2048
    eps: float = 1e-4

    @cached_property
    def growth(self) -> float:
        # reference tropical.py:31
        if self.levels == 1:
            return 1.0
        return float(
            np.exp2(np.log2(self.n_max * self.scale / self.n_min) / (self.levels - 1))
        )

    def level_scale(self, l: int) -> float:
        # reference tropical.py:55 (a.k.a. tcnn grid_scale)
        return float(np.exp2(l * np.log2(self.growth)) * self.n_min - 1.0)

    def level_resolution(self, l: int) -> int:
        return int(np.ceil(self.level_scale(l))) + 1

    def level_entries(self, l: int) -> int:
        dense = self.level_resolution(l) ** self.dim
        return min(_next_multiple(dense, 8), 1 << self.log2_table)

    def level_uses_hash(self, l: int) -> bool:
        return self.level_resolution(l) ** self.dim > (1 << self.log2_table)

    @cached_property
    def level_offsets(self) -> Sequence[int]:
        offs = []
        o = 0
        for l in range(self.levels):
            offs.append(o)
            o += self.level_entries(l)
        return tuple(offs)

    @cached_property
    def n_entries(self) -> int:
        return self.level_offsets[-1] + self.level_entries(self.levels - 1)

    @cached_property
    def n_params(self) -> int:
        return self.n_entries * self.features

    @property
    def out_dim(self) -> int:
        return self.levels * self.features


def init_params(spec: HashGridSpec, key: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Hash-table init, uniform in [-1e-4, 1e-4] like tiny-cuda-nn's grid default."""
    return jax.random.uniform(
        key, (spec.n_entries, spec.features), dtype, minval=-1e-4, maxval=1e-4
    )


def _level_indices(spec: HashGridSpec, l: int, grid: jax.Array) -> jax.Array:
    """Table index for integer corner coordinates ``grid`` [..., D] at level l."""
    res = spec.level_resolution(l)
    table = 1 << spec.log2_table
    if spec.level_uses_hash(l):
        h = grid[..., 0].astype(jnp.uint32) * np.uint32(PRIMES[0])
        for d in range(1, spec.dim):
            h = h ^ (grid[..., d].astype(jnp.uint32) * np.uint32(PRIMES[d]))
        return (h & np.uint32(table - 1)).astype(jnp.int32)
    idx = grid[..., 0]
    stride = 1
    for d in range(1, spec.dim):
        stride *= res
        idx = idx + grid[..., d] * stride
    # tcnn's grid_index applies `index % hashmap_size` unconditionally, with
    # hashmap_size = THIS level's (padded) entry count — so a boundary cell
    # whose upper corner coordinate reaches `res` wraps within the level
    # (tiny-cuda-nn grid.h grid_index).  Bit-compatible with real tcnn for
    # every in-cube query, including x = 1.0 on integer-scale levels.
    return jnp.remainder(idx, spec.level_entries(l)).astype(jnp.int32)


def _encode_level(spec: HashGridSpec, params: jax.Array, x: jax.Array,
                  l: int) -> jax.Array:
    """One level's pointwise 8-corner gather encode: [B, D] -> [B, F]."""
    D = spec.dim
    scale = spec.level_scale(l)
    off = spec.level_offsets[l]
    pos = x * scale + 0.5
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    pos_grid = pos_grid.astype(jnp.int32)

    feat = None
    for corner in range(1 << D):
        bits = [(corner >> d) & 1 for d in range(D)]
        cp = pos_grid + jnp.asarray(bits, jnp.int32)
        idx = _level_indices(spec, l, cp)
        w = None
        for d in range(D):
            wd = frac[..., d] if bits[d] else 1.0 - frac[..., d]
            w = wd if w is None else w * wd
        # _level_indices wraps within the level (tcnn's `% hashmap_size`),
        # so off+idx is always in-table; clip only guards pathological
        # out-of-cube queries
        g = jnp.take(params, off + idx, axis=0, mode="clip")  # [B, F]
        term = w[..., None] * g
        feat = term if feat is None else feat + term
    return feat


def encode(spec: HashGridSpec, params: jax.Array, x: jax.Array) -> jax.Array:
    """Encode points ``x`` [B, D] in [0,1]^D -> features [B, L*F] (level-major).

    Pure function of (params, x); safe under jit/grad/vmap.  Gradients w.r.t.
    ``x`` flow through the trilinear weights (floor has zero gradient), matching
    the piecewise-trilinear analytical structure the extraction relies on.
    """
    return jnp.concatenate(
        [_encode_level(spec, params, x, l) for l in range(spec.levels)],
        axis=-1)


def _corner_bins(spec: HashGridSpec, l: int) -> int:
    """Per-axis corner-coordinate bins covering unit-cube queries: pos =
    x*s+0.5 with x <= 1 gives floor(pos)+1 <= s+1 <= res+1, so res+2 bins
    cover every corner without clamping."""
    return spec.level_resolution(l) + 2


def _corner_table(spec: HashGridSpec, params: jax.Array, l: int) -> jax.Array:
    """Level ``l``'s corner-value grid [K, K, K, F] — every table entry the
    separable interpolation can touch, gathered once (exact per-level index
    formula: dense linear or prime hash incl. the unconditional mod —
    _level_indices is the single source)."""
    K = _corner_bins(spec, l)
    ax = jnp.arange(K, dtype=jnp.int32)
    ga, gb, gc = jnp.meshgrid(ax, ax, ax, indexing="ij")
    idx = _level_indices(spec, l, jnp.stack([ga, gb, gc], axis=-1))
    return jnp.take(params, spec.level_offsets[l] + idx.reshape(-1), axis=0,
                    mode="clip").reshape(K, K, K, spec.features)


# jitted corner-grid gathers, keyed by (spec, level set); bounded — each
# entry pins a compiled executable alive, so evict FIFO past a small cap
# (round-4 advisor finding: the unbounded dict grew per distinct spec)
_LATTICE_TABLES_JIT = {}
_LATTICE_TABLES_MAX = 16


def lattice_tables(spec: HashGridSpec, params: jax.Array, n_points: int):
    """Corner-value grids for every level the factored lattice encode will
    take at a total lattice of ``n_points`` (None where pointwise wins).
    Compute ONCE outside any slab loop and pass to :func:`encode_lattice` —
    the grids depend only on params.

    The gathering runs as ONE jitted program per (spec, level set): eager
    per-op execution paid a compile+RTT per tiny index op on the tunneled
    TPU — measured 27 s per eval-ladder sweep before the 20 s of actual
    slab work (inside a jit trace this function is equally fine to call)."""
    take = tuple(
        l for l in range(spec.levels)
        if not (_corner_bins(spec, l) ** 3 > 8 * n_points
                or _corner_bins(spec, l) ** 3 * spec.features * 4 > 2 ** 29))
    tracing = isinstance(params, jax.core.Tracer)
    key = (spec, take)
    fn = None if tracing else _LATTICE_TABLES_JIT.get(key)
    if fn is None:
        def gather(p):
            return tuple(_corner_table(spec, p, l) for l in take)

        fn = gather if tracing else jax.jit(gather)
        if not tracing:
            while len(_LATTICE_TABLES_JIT) >= _LATTICE_TABLES_MAX:
                _LATTICE_TABLES_JIT.pop(next(iter(_LATTICE_TABLES_JIT)))
            _LATTICE_TABLES_JIT[key] = fn
    got = iter(fn(params))
    return [next(got) if l in take else None for l in range(spec.levels)]


def encode_lattice(spec: HashGridSpec, params: jax.Array, xs: jax.Array,
                   ys: jax.Array, zs: jax.Array, tables=None) -> jax.Array:
    """Encode the separable lattice {xs} x {ys} x {zs} (unit-cube axis
    coordinate vectors) -> features [Nx*Ny*Nz, L*F], x-major point order
    (identical to ``encode`` over ``meshgrid(xs, ys, zs, indexing='ij')``).

    Dense (non-hashed) levels factor the trilinear interpolation into three
    per-axis contractions against the level's corner-value grid: per axis the
    interpolation weight matrix W [N, K] has two nonzeros per row, so
    ``feat = Wx . (Wy . (Wz . G))`` — three small einsums on the MXU instead
    of 8 corner gathers per lattice point (the skeleton's 8M-point lattice
    paid ~4 ns per gathered element through XLA's TPU gather emitter; the
    factored form is bandwidth-bound on writing the output).  Values agree
    with ``encode`` to f32 rounding (association differs), which the eps-sign
    lattice (eps ~1e-4, >>ulp) absorbs.  Hash levels keep the pointwise
    gather — their index mixes axes and does not factor.
    """
    D = spec.dim
    assert D == 3, "separable lattice encode is 3-D"
    Nx, Ny, Nz = xs.shape[0], ys.shape[0], zs.shape[0]
    outs = []
    pts = None
    for l in range(spec.levels):
        K = _corner_bins(spec, l)
        # factoring needs the level's full corner-value grid (K^3 gathered
        # entries, incl. HASHED levels — the hash only decides where corner
        # values come from, the interpolation still factors); fall back to
        # the pointwise 8-corner encode when gathering that grid costs more
        # than the 8 gathers per query point it replaces.  Slab sweeps pass
        # precomputed ``tables`` (measured: XLA's loop-invariant code motion
        # did NOT hoist the grid gather out of the slab fori_loop — it cost
        # K^3 gathered entries per slab until hoisted by hand).
        G = tables[l] if tables is not None else None
        if G is None:
            if K ** 3 > 8 * Nx * Ny * Nz \
                    or K ** 3 * spec.features * 4 > 2 ** 29:
                if pts is None:
                    gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing="ij")
                    pts = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, D)
                outs.append(_encode_level(spec, params, pts, l)
                            .reshape(Nx, Ny, Nz, spec.features))
                continue
            G = _corner_table(spec, params, l)
        scale = spec.level_scale(l)
        Ws = []
        for a in (xs, ys, zs):
            pos = a * scale + 0.5
            g = jnp.floor(pos)
            frac = pos - g
            gi = g.astype(jnp.int32)
            Ws.append(jax.nn.one_hot(gi, K, dtype=params.dtype)
                      * (1.0 - frac)[:, None]
                      + jax.nn.one_hot(gi + 1, K, dtype=params.dtype)
                      * frac[:, None])
        t = jnp.einsum("abcf,zc->abzf", G, Ws[2])
        t = jnp.einsum("abzf,yb->ayzf", t, Ws[1])
        t = jnp.einsum("ayzf,xa->xyzf", t, Ws[0])
        outs.append(t)
    return jnp.concatenate(outs, axis=-1).reshape(Nx * Ny * Nz, -1)


def compute_marks(spec: HashGridSpec) -> np.ndarray:
    """Sorted, eps-deduplicated union of all levels' grid-plane coordinates.

    Port of the reference semantics (tropical/tropical.py:49-79): per level the
    breakpoints of ``pos = x*s_l + 0.5`` are ``k/s_l - 0.5/s_l`` for
    ``k*unit < 1.5``; the boundary {0, scale} is appended; neighbours closer
    than eps are merged to their midpoint; result clipped to [0, scale].
    Computed once on host in float64, stored float32.
    """
    vertices = []
    for l in range(spec.levels):
        unit = 1.0 / spec.level_scale(l)
        ks = np.arange(0, math.ceil(1.5 / unit) + 1)
        v = ks * unit
        v = v[v < 1.5] - 0.5 * unit
        vertices.append(v)
    vertices.append(np.array([0.0, spec.scale]))
    marks = np.unique(np.concatenate(vertices))

    keep = np.ones(len(marks), bool)
    marks = marks.copy()
    for i in range(len(marks) - 1):
        if abs(marks[i] - marks[i + 1]) < spec.eps:
            marks[i + 1] = (marks[i] + marks[i + 1]) / 2
            keep[i] = False
    marks = marks[keep]
    marks = marks[(marks >= 0) & (marks <= spec.scale)]
    return marks.astype(np.float32)


class TropicalHashGrid:
    """Analytical wrapper over the hash encoding that knows its grid marks.

    Functional analog of the reference ``TropicalHashGrid`` module
    (tropical/tropical.py:20-239).  Holds the spec, the (mutable) parameter
    array, and the precomputed marks; all compute methods are pure JAX.
    """

    def __init__(self, spec: HashGridSpec, params: jax.Array | None = None,
                 key: jax.Array | None = None):
        self.spec = spec
        if params is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            params = init_params(spec, key)
        self.params = params
        self.marks = jnp.asarray(compute_marks(spec))

    @classmethod
    def create(cls, scale: float = 1.0, D: int = 3, L: int = 16, F: int = 2,
               T: int = 19, N_min: int = 16, N_max: int = 2048, eps: float = 1e-4,
               key: jax.Array | None = None) -> "TropicalHashGrid":
        """Constructor argument order mirrors reference tropical.py:21-22."""
        return cls(HashGridSpec(scale, D, L, F, T, N_min, N_max, eps), key=key)

    def __call__(self, x: jax.Array, params: jax.Array | None = None) -> jax.Array:
        return encode(self.spec, self.params if params is None else params, x)

    # serialized vertex index from per-axis mark indices (reference tropical.py:141-146)
    def p2v(self, indices: jax.Array) -> jax.Array:
        L = len(self.marks)
        D = self.spec.dim
        weights = jnp.asarray([L ** (D - 1 - i) for i in range(D)], indices.dtype)
        return (indices * weights).sum(axis=-1)

    # per-axis mark indices from serialized vertex index (reference tropical.py:149-156)
    def v2p(self, v_idx: jax.Array) -> jax.Array:
        L = len(self.marks)
        D = self.spec.dim
        out = []
        rem = v_idx
        for i in range(D - 1, -1, -1):
            q = rem // (L ** i)
            out.append(q)
            rem = rem - q * (L ** i)
        return jnp.stack(out, axis=-1)

    def skeleton(self, net, unit: int = 128):
        """Initial pruned edge skeleton (reference tropical.py:158-225)."""
        from tropical.extract.skeleton import grid_skeleton

        return grid_skeleton(net, unit)

    def region(self, x: jax.Array, eps: float | None = None):
        """Eps-tolerant per-axis cell index + on-plane mask.

        Port of reference tropical.py:227-236: ``offset = searchsorted(marks,
        x+eps) - 1`` (index -1 wraps to the last mark, as torch indexing does);
        ``mask`` is 1 strictly inside a cell, 0 within eps of a grid plane.
        """
        eps = self.spec.eps if eps is None else eps
        marks = self.marks
        offset = jnp.searchsorted(marks, x + eps) - 1
        wrapped = jnp.where(offset < 0, offset + len(marks), offset)
        mark_at = jnp.take(marks, wrapped, axis=0, mode="clip")
        mask = (jnp.abs(mark_at - x) > eps).astype(jnp.int32)
        return mask, offset.astype(jnp.int32)


def analytical_marks(grid: "TropicalHashGrid", feature: int = 1,
                     dx: float = 1e-3, axis: int = 0):
    """Empirically locate gradient breakpoints of one encoding feature along
    an axis (diagnostic analog of reference tropical.py:291-302).

    Returns the x positions where d(feature)/dx jumps — these should coincide
    with the grid marks."""
    import jax

    spec = grid.spec
    xs = np.arange(dx, 1.0 - dx, dx, dtype=np.float32)

    def f(x):
        pts = jnp.full((3,), 0.505).at[axis].set(x)
        return encode(spec, grid.params, pts[None])[0, feature]

    g = np.asarray(jax.vmap(jax.grad(f))(jnp.asarray(xs)))
    jumps = np.abs(np.diff(g)) > 1e-6
    return xs[1:][jumps]


class Tropical:
    """Generic module wrapper (API parity with reference tropical.py:242-281).

    Wraps any object exposing a ``TropicalHashGrid`` (via ``.enc``) and
    provides the starting skeleton; falls back to a hypercube otherwise.
    """

    def __init__(self, module, dim: int = 3, scale: float = 1.0):
        self.module = module
        self.dim = dim
        self.scale = scale

    def region(self, x):
        raise NotImplementedError

    def grid(self):
        enc = getattr(self.module, "enc", None)
        if isinstance(enc, TropicalHashGrid):
            return enc.skeleton(self.module)
        vertices, edges, _ = self.get_hypercube(self.dim, self.scale / 2)
        return vertices, edges

    @staticmethod
    def get_hypercube(d: int, size: float):
        from tropical.extract.skeleton import get_hypercube

        return get_hypercube(d, size)


if __name__ == "__main__":
    # sanity demo: the analytic tiny-grid fixture of the reference
    # (tropical.py:305-321) — marks are derivable by hand, and the encoding's
    # gradient breakpoints must coincide with them
    import jax

    jax.config.update("jax_platforms", "cpu")
    grid = TropicalHashGrid.create(1.0, 3, L=2, F=1, T=19, N_min=2, N_max=6,
                                   key=jax.random.PRNGKey(0))
    print("marks:", ", ".join(f"{m:.5f}" for m in np.asarray(grid.marks)))
    bp = analytical_marks(grid, feature=1)
    print("gradient breakpoints along x:",
          ", ".join(f"{b:.3f}" for b in bp))
