"""Unit equivalence tests for device-engine building blocks.

These pin the fast rewrites to their reference formulations on randomized
inputs: the LUT grid-region lookup vs searchsorted, and the tier-A
base+delta expansion keys vs the general substitution-grid expansion.
"""

import numpy as np
import pytest


def _rand_marks(rng, n):
    m = np.sort(rng.uniform(0, 1, n - 2))
    return np.concatenate([[0.0], m, [1.0]]).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_grid_region_lut_matches_searchsorted(seed):
    import jax.numpy as jnp

    from tropical.extract.device import (LUTN, _grid_region,
                                         _grid_region_lut)

    rng = np.random.default_rng(seed)
    marks = _rand_marks(rng, rng.integers(17, 210))
    lut_k = max(1, int(np.bincount(
        np.clip((marks * LUTN).astype(np.int64), 0, LUTN - 1),
        minlength=LUTN).max()))
    # queries cover in-range, out-of-range, and exactly-on-mark cases
    xu = np.concatenate([
        rng.uniform(-0.05, 1.05, (512, 3)).astype(np.float32),
        np.repeat(marks[rng.integers(0, len(marks), 64)], 3).reshape(-1, 3),
    ])
    mj = jnp.asarray(marks)
    base = jnp.searchsorted(mj, jnp.arange(LUTN, dtype=mj.dtype) / LUTN
                            ).astype(jnp.int32)
    m1, o1 = _grid_region(mj, jnp.asarray(xu), 1e-4)
    m2, o2 = _grid_region_lut(mj, base, jnp.asarray(xu), 1e-4, lut_k)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


@pytest.mark.parametrize("seed", [0, 1])
def test_expand4_matches_general_expansion(seed):
    import jax.numpy as jnp

    from tropical.extract.device import _expand4_keys, _expand_keys

    rng = np.random.default_rng(seed)
    N, C = 257, 36
    cols = rng.choice([-1, 0, 1], (N, C)).astype(np.int32)
    # tier A handles rows with <= 2 zeros: thin the zeros out
    for i in range(N):
        zc = np.nonzero(cols[i] == 0)[0]
        kz_target = rng.integers(0, 3)
        for j in zc[kz_target:]:
            cols[i, j] = rng.choice([-1, 1])
    off = rng.integers(0, 100, (N, 3)).astype(np.int32)
    valid = rng.uniform(size=N) < 0.9
    kz = (cols == 0).sum(1).astype(np.int32)
    zrank = np.cumsum(cols == 0, axis=1).astype(np.int32) - 1
    rows = np.arange(N, dtype=np.int32)

    args = (jnp.asarray(cols), jnp.asarray(off), jnp.asarray(valid),
            jnp.asarray(kz), jnp.asarray(rows))
    g1 = _expand_keys(jnp.asarray(cols), jnp.asarray(zrank),
                      jnp.asarray(off), jnp.asarray(valid), jnp.asarray(kz),
                      4, 2, jnp.asarray(rows))
    g2 = _expand4_keys(*args)
    k1a, k2a, k3a, ra = (np.asarray(x) for x in g1)
    k1b, k2b, k3b, rb = (np.asarray(x) for x in g2)
    np.testing.assert_array_equal(ra, rb)
    np.testing.assert_array_equal(k1a, k1b)
    # k2/k3 of invalid replicas are don't-care (k1 == BIGKEY hides them)
    live = k1a < 2 ** 30
    np.testing.assert_array_equal(k2a[live], k2b[live])
    np.testing.assert_array_equal(k3a[live], k3b[live])


def test_tri_word_pack_roundtrip():
    """2-word packed triangle indices unpack exactly for every 18-bit
    corner case (the mesh index pull rides this packing)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from tropical.extract.device import _pack_tri_words, _unpack_tri_words

    lim = (1 << 18) - 1
    rng = np.random.default_rng(0)
    tri = np.concatenate([
        np.array([[0, 0, 0], [lim, lim, lim], [0, lim, 0], [lim, 0, lim],
                  [1, (1 << 14) - 1, 1 << 14], [(1 << 14), 1 << 17, 3]],
                 np.int64),
        rng.integers(0, lim + 1, size=(1000, 3)),
    ])
    p0, p1 = _pack_tri_words(jnp.asarray(tri[:, 0]), jnp.asarray(tri[:, 1]),
                             jnp.asarray(tri[:, 2]))
    raw = np.stack([np.asarray(p0), np.asarray(p1)], axis=1)
    assert raw.dtype == np.uint32
    np.testing.assert_array_equal(_unpack_tri_words(raw), tri)
