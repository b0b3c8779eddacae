"""Unit tests for the hash-grid encoding and marks machinery.

The analytic tiny-grid fixture L=2, F=1, N_min=2, N_max=6 mirrors the
reference's executable sanity block (reference tropical/tropical.py:313-321),
whose marks are derivable by hand.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tropical.core.hashgrid import (HashGridSpec, TropicalHashGrid,
                                    compute_marks, encode, init_params)

TINY = HashGridSpec(scale=1.0, dim=3, levels=2, features=1, log2_table=19,
                    n_min=2, n_max=6)
SMALL = HashGridSpec(scale=1.0, dim=3, levels=4, features=2, log2_table=19,
                     n_min=2, n_max=32)


def test_growth_and_scales():
    # b = exp2(log2(6/2)/1) = 3 for the tiny fixture
    assert np.isclose(TINY.growth, 3.0)
    assert np.isclose(TINY.level_scale(0), 1.0)   # 2 - 1
    assert np.isclose(TINY.level_scale(1), 5.0)   # 6 - 1
    assert TINY.level_resolution(0) == 2
    assert TINY.level_resolution(1) == 6


def test_level_entries_and_offsets():
    # dense 2^3=8 -> 8; 6^3=216 -> next multiple of 8 = 216
    assert TINY.level_entries(0) == 8
    assert TINY.level_entries(1) == 216
    assert TINY.level_offsets == (0, 8)
    assert TINY.n_entries == 224


def test_marks_tiny_analytic():
    # level 0: unit=1 -> k*1 - 0.5 for k*1 < 1.5 -> {-0.5, 0.5}
    # level 1: unit=0.2 -> k*0.2 - 0.1 for k*0.2 < 1.5 -> {-0.1,0.1,...,1.3}
    # + boundary {0, 1}; clipped to [0, 1]
    marks = compute_marks(TINY)
    expect = np.array([0.0, 0.1, 0.3, 0.5, 0.7, 0.9, 1.0], np.float32)
    np.testing.assert_allclose(marks, expect, atol=1e-6)


def test_marks_are_gradient_breakpoints():
    """The encoding must be piecewise-trilinear with folds exactly at marks."""
    grid = TropicalHashGrid(SMALL, key=jax.random.PRNGKey(3))
    marks = np.asarray(grid.marks)
    interior = marks[(marks > 1e-3) & (marks < 1 - 1e-3)]

    def f(x):
        pts = jnp.stack([x, jnp.full_like(x, 0.505), jnp.full_like(x, 0.505)], -1)
        return encode(SMALL, grid.params, pts).sum(-1)

    g = jax.vmap(jax.grad(lambda x: f(x[None])[0]))

    eps = 1e-4
    left = np.asarray(g(jnp.asarray(interior - eps)))
    right = np.asarray(g(jnp.asarray(interior + eps)))
    # gradient jumps at (almost) every mark; allow a couple of hash-collision
    # coincidences where the jump is accidentally tiny
    jumps = np.abs(left - right) > 1e-7
    assert jumps.mean() > 0.9

    # and is constant strictly inside cells (sample between consecutive marks)
    mids = (marks[:-1] + marks[1:]) / 2
    a = np.asarray(g(jnp.asarray(mids - 1e-5)))
    b = np.asarray(g(jnp.asarray(mids + 1e-5)))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-8)


def test_encode_matches_manual_trilinear():
    """Dense level: encoding equals manual trilinear interp of table entries."""
    spec = HashGridSpec(scale=1.0, dim=3, levels=1, features=2, log2_table=19,
                        n_min=4, n_max=4)
    key = jax.random.PRNGKey(0)
    params = init_params(spec, key)
    # keep x away from the upper boundary: for x > (res-1.5)/scale the upper
    # corner leaves the dense grid (tcnn reads past the level there; we clip)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), maxval=0.8)
    out = np.asarray(encode(spec, params, x))

    s = spec.level_scale(0)
    res = spec.level_resolution(0)
    pos = np.asarray(x) * s + 0.5
    pg = np.floor(pos).astype(int)
    fr = pos - pg
    table = np.asarray(params)
    ref = np.zeros((64, 2))
    for c in range(8):
        bits = [(c >> d) & 1 for d in range(3)]
        cp = pg + bits
        idx = cp[:, 0] + cp[:, 1] * res + cp[:, 2] * res * res
        w = np.ones(64)
        for d in range(3):
            w *= fr[:, d] if bits[d] else 1 - fr[:, d]
        ref += w[:, None] * table[idx]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-8)


def test_hash_level_indices_use_primes():
    spec = HashGridSpec(scale=1.0, dim=3, levels=1, features=1, log2_table=4,
                        n_min=64, n_max=64)
    assert spec.level_uses_hash(0)
    from tropical.core.hashgrid import _level_indices
    grid = jnp.asarray([[3, 5, 7]], jnp.int32)
    idx = np.asarray(_level_indices(spec, 0, grid))[0]
    expect = ((3 * 1) ^ (5 * 2654435761) ^ (7 * 805459861)) % (1 << 4)
    assert idx == expect


def test_p2v_v2p_roundtrip():
    grid = TropicalHashGrid(TINY)
    L = len(grid.marks)
    idx = jnp.asarray(np.stack(np.meshgrid(*[np.arange(L)] * 3, indexing="ij"), -1)
                      .reshape(-1, 3))
    v = grid.p2v(idx)
    assert len(np.unique(np.asarray(v))) == L ** 3
    back = grid.v2p(v)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(idx))


def test_region_mask_and_offset():
    grid = TropicalHashGrid(TINY)
    # marks = [0, .1, .3, .5, .7, .9, 1]
    x = jnp.asarray([[0.2, 0.3, 0.90005]])
    mask, offset = grid.region(x, eps=1e-3)
    # 0.2 inside cell [.1,.3) -> offset 1, mask 1
    # 0.3 on a mark -> offset 2 (searchsorted(.3+eps)-1), mask 0
    # 0.90005 within eps of mark .9 -> mask 0, offset 5
    np.testing.assert_array_equal(np.asarray(offset), [[1, 2, 5]])
    np.testing.assert_array_equal(np.asarray(mask), [[1, 0, 0]])
