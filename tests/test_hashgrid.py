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


# ---------------------------------------------------------------------------
# tcnn layout contract (reference tropical/tropical.py:32-47): hand-derived
# fixtures pinning every detail a released `.pth` checkpoint depends on.  Each
# constant below was computed by hand/np.float64 from the instant-ngp rules —
# if any of growth, per-level scale, ceil+1 resolution, next_multiple(.,8)
# padding, the 2^T clamp, the dense->hash switch, the prime hash, or the
# feature-fastest flat layout drifted, one of these would fail.
# ---------------------------------------------------------------------------

# reference tcnn default: L=16, F=2, T=19, N_min=16, N_max=2048
NGP = HashGridSpec(scale=1.0, dim=3, levels=16, features=2, log2_table=19,
                   n_min=16, n_max=2048)


def test_tcnn_small_preset_offsets():
    """All 4 levels of the small preset: b=2^(4/3); resolutions 2/6/13/32;
    13^3=2197 pads to 2200 (the only non-multiple-of-8 dense level)."""
    assert np.isclose(SMALL.growth, 2.0 ** (4.0 / 3.0))
    assert [SMALL.level_resolution(l) for l in range(4)] == [2, 6, 13, 32]
    assert [SMALL.level_entries(l) for l in range(4)] == [8, 216, 2200, 32768]
    assert SMALL.level_offsets == (0, 8, 224, 2424)
    assert SMALL.n_entries == 35192
    assert not any(SMALL.level_uses_hash(l) for l in range(4))


def test_tcnn_dense_hash_switch():
    """The dense->hash boundary of the tcnn default config sits between
    levels 4 and 5: res 59 (59^3=205379 -> 205384 padded) is the last dense
    level; res 81 (81^3=531441 > 2^19) is the first hashed one, clamped to
    exactly 2^19 entries."""
    assert np.isclose(NGP.growth, 2.0 ** (7.0 / 15.0))
    assert NGP.level_resolution(4) == 59
    assert not NGP.level_uses_hash(4)
    assert NGP.level_entries(4) == 205384          # next_multiple(59**3, 8)
    assert NGP.level_resolution(5) == 81
    assert NGP.level_uses_hash(5)
    assert NGP.level_entries(5) == 1 << 19
    assert NGP.level_offsets[4] == 125568
    assert NGP.level_offsets[5] == 330952
    # every later level is hashed and 2^19 wide; total table length is fixed
    assert all(NGP.level_uses_hash(l) for l in range(5, 16))
    assert NGP.n_entries == 6098120


def test_tcnn_hash_collision_t19():
    """Two in-range coordinates of hashed level 6 (res 112) that collide at
    T=19: (0,7,81) and (0,8,18) both map to slot 124402 (computed by hand
    from xor_d(grid_d * primes_d) mod 2^19 with primes (1, 2654435761,
    805459861) in uint32 arithmetic)."""
    from tropical.core.hashgrid import _level_indices

    assert NGP.level_resolution(6) == 112 and NGP.level_uses_hash(6)
    grid = jnp.asarray([[0, 7, 81], [0, 8, 18], [0, 7, 82]], jnp.int32)
    idx = np.asarray(_level_indices(NGP, 6, grid))
    assert idx[0] == 124402 and idx[1] == 124402   # the collision pair
    assert idx[2] != 124402                        # control: not everything

    # the collision is observable through the table: a distinctive entry at
    # the shared slot is read back for BOTH corner coordinates
    params = np.zeros((NGP.n_entries, 2), np.float32)
    params[NGP.level_offsets[6] + 124402] = [7.5, -2.5]
    from tropical.core.hashgrid import encode as enc_fn
    # place x exactly on each integer corner so one corner weight is ~1
    s = NGP.level_scale(6)
    for cx, cy, cz in [(0, 7, 81), (0, 8, 18)]:
        x = (np.array([[cx, cy, cz]], np.float32) - 0.5) / s
        out = np.asarray(enc_fn(NGP, jnp.asarray(params), jnp.asarray(x)))
        np.testing.assert_allclose(out[0, 12:14], [7.5, -2.5], atol=1e-4)


def test_tcnn_pth_layout_roundtrip():
    """`.pth` import contract (net.py load_torch_state_dict): the flat tcnn
    param vector is entry-major/feature-fastest (flat[e*F + f] -> table[e,f]),
    and torch Linear weights [out,in] transpose to our [in,out]."""
    from tropical.core.net import NetSpec, TropicalNet, net_forward

    spec = NetSpec(num_layers=3, num_hidden=16, levels=4, r_min=2, r_max=32,
                   T=19)
    n = spec.grid.n_entries
    state = {"enc.module.params": np.arange(n * 2, dtype=np.float32)}
    rng = np.random.default_rng(0)
    for i, (fan_in, fan_out) in enumerate(zip(spec.num_nodes[:-1],
                                              spec.num_nodes[1:])):
        state[f"fc.{i}.weight"] = rng.normal(
            size=(fan_out, fan_in)).astype(np.float32)  # torch [out, in]
        state[f"fc.{i}.bias"] = rng.normal(size=(fan_out,)).astype(np.float32)

    net = TropicalNet(spec).load_torch_state_dict(state)
    table = np.asarray(net.params["table"])
    assert table.shape == (n, 2)
    # feature-fastest: entry e holds flat[2e], flat[2e+1]
    np.testing.assert_array_equal(table[123], [246.0, 247.0])
    np.testing.assert_array_equal(table[n - 1], [2 * n - 2, 2 * n - 1])
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(net.params["mlp"]["w"][i]),
                                      state[f"fc.{i}.weight"].T)
    # and the forward consumes them in that orientation: layer-0 output of a
    # fixed point equals the hand-computed feats @ W0^T + b0
    x = jnp.asarray([[0.25, -0.125, 0.5]])
    feats = np.asarray(encode(spec.grid, net.params["table"],
                              np.asarray((x + 1.0) / 2.0)))
    manual = feats @ state["fc.0.weight"].T + state["fc.0.bias"]
    _, gathered = net_forward(spec, net.params, x, gather=True)
    np.testing.assert_allclose(np.asarray(gathered)[0, :16], manual[0],
                               rtol=1e-5, atol=1e-5)


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


def test_encode_lattice_matches_pointwise():
    """The factored separable-lattice encode (dense levels as three axis
    contractions, hash levels pointwise) agrees with the 8-corner gather
    encode to f32 rounding on every level mix, including boundary coords
    (reference evaluates the skeleton lattice pointwise, tropical.py:81-111;
    the device skeleton routes through encode_lattice)."""
    from tropical.core.hashgrid import encode_lattice

    rng = np.random.default_rng(7)
    for (nmin, nmax, T) in [(2, 8, 19), (16, 256, 19), (16, 512, 15)]:
        spec = HashGridSpec(levels=4, features=2, log2_table=T,
                            n_min=nmin, n_max=nmax)
        params = init_params(spec, jax.random.PRNGKey(0)) * 1000
        xs = jnp.asarray(np.sort(np.concatenate(
            [[0.0, 1.0], rng.uniform(0, 1, 9)])).astype(np.float32))
        ys = jnp.asarray(np.sort(rng.uniform(0, 1, 8)).astype(np.float32))
        zs = jnp.asarray(np.linspace(0, 1, 7).astype(np.float32))
        gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing="ij")
        pts = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)
        a = np.asarray(encode(spec, params, pts))
        b = np.asarray(encode_lattice(spec, params, xs, ys, zs))
        assert np.abs(a - b).max() < 1e-6, (nmin, nmax, T)


def test_encode_lattice_factors_hashed_level():
    """On a lattice dense enough that gathering a hashed level's K^3 corner
    grid beats 8 gathers/point, the factored path must still match the
    pointwise encode (the hash only relocates corner values)."""
    from tropical.core.hashgrid import encode_lattice

    spec = HashGridSpec(levels=2, features=2, log2_table=10,
                        n_min=4, n_max=16)
    assert spec.level_uses_hash(1)          # 16^3 > 2^10
    params = init_params(spec, jax.random.PRNGKey(2)) * 1000
    xs = jnp.asarray(np.linspace(0, 1, 17).astype(np.float32))
    # 8 * 17^3 = 39304 > K^3 = 18^3 = 5832 -> hashed level factorizes
    gx, gy, gz = jnp.meshgrid(xs, xs, xs, indexing="ij")
    pts = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)
    a = np.asarray(encode(spec, params, pts))
    b = np.asarray(encode_lattice(spec, params, xs, xs, xs))
    assert np.abs(a - b).max() < 1e-6


def test_encode_lattice_gradient_matches():
    """jvp axis tangents through encode_lattice equal the pointwise jvp
    (the skeleton's |grad sdf| Lipschitz bound rides this path)."""
    from tropical.core.hashgrid import encode_lattice

    spec = HashGridSpec(levels=3, features=2, log2_table=15,
                        n_min=4, n_max=64)
    params = init_params(spec, jax.random.PRNGKey(1)) * 1000
    xs = jnp.asarray(np.linspace(0.05, 0.95, 5).astype(np.float32))
    gx, gy, gz = jnp.meshgrid(xs, xs, xs, indexing="ij")
    pts = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)
    e = jnp.zeros_like(pts).at[:, 0].set(1.0)
    _, tp = jax.jvp(lambda p: encode(spec, params, p), (pts,), (e,))
    _, tl = jax.jvp(lambda a: encode_lattice(spec, params, a, xs, xs),
                    (xs,), (jnp.ones_like(xs),))
    assert np.abs(np.asarray(tp) - np.asarray(tl)).max() < 1e-4


# ---------------------------------------------------------------------------
# Golden encoding VALUES, hand-derived from the public tiny-cuda-nn grid
# kernel semantics (grid.h: pos = x*scale + 0.5, linear dense index with
# x-fastest stride, coherent-prime hash, unconditional `index % hashmap_size`
# with hashmap_size = the LEVEL's padded entry count, N-linear weights).
# Literals produced by scripts/derive_tcnn_goldens.py — an independent numpy
# restatement of those rules, so a drift in stride order, corner order, the
# per-level wrap, or the 0.5 offset fails these even if the library and its
# unit tests were edited in tandem.  Reference wraps real tcnn at
# tropical/tropical.py:32-47.
# ---------------------------------------------------------------------------

def _golden_table(n_entries: int, F: int = 2) -> np.ndarray:
    """Deterministic f32-exact fill: t[e,f] = ((3e+5f) % 257 - 128) / 64."""
    e = np.arange(n_entries)[:, None]
    f = np.arange(F)[None, :]
    return ((((3 * e + 5 * f) % 257) - 128) / 64.0).astype(np.float32)


def test_tcnn_golden_values_dense_interior():
    """SMALL preset, interior point: full 8-feature output pinned."""
    params = jnp.asarray(_golden_table(SMALL.n_entries))
    x = jnp.asarray([[0.35, 0.60, 0.85]], jnp.float32)
    out = np.asarray(encode(SMALL, params, x))[0]
    golden = [-1.7595312560, -1.6814062560, -1.2559877949, -1.4761360182,
              0.1083649024, 0.1864899024, -0.7585932761, -0.6804682761]
    np.testing.assert_allclose(out, golden, atol=2e-6)


def test_tcnn_golden_values_dense_boundary_wrap():
    """x = (1,1,1): on every SMALL level the cell's upper corner coordinate
    reaches `res`, so the linear index wraps mod the LEVEL's padded entry
    count exactly like tcnn's grid_index — level 2 (res 13, 2197 entries
    padded to 2200) wraps 2209 -> 9, level 3 (res 32) wraps 32768 -> 0.
    A clip-to-last-entry or a mod-2^T implementation fails this."""
    params = jnp.asarray(_golden_table(SMALL.n_entries))
    x = jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32)
    out = np.asarray(encode(SMALL, params, x))[0]
    golden = [-1.8359375000, -1.7578125000, -0.5059488416, -0.4278238416,
              -0.4314318541, -0.3533068541, 0.0742187500, 0.1523437500]
    np.testing.assert_allclose(out, golden, atol=2e-6)

    # the wrapped corner indices themselves (level 2 boundary cell)
    from tropical.core.hashgrid import _level_indices
    cp = jnp.asarray([[12, 12, 12], [13, 12, 12], [13, 13, 13]], jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(_level_indices(SMALL, 2, cp)), [2196, 2197, 179])


def test_tcnn_golden_values_hash_level():
    """NGP default config, level 6 (res 112, hashed at T=19): feature pair
    pinned; the corner slots mix all three primes in uint32 arithmetic."""
    params = jnp.asarray(_golden_table(NGP.n_entries))
    x = jnp.asarray([[0.3217, 0.5861, 0.0523]], jnp.float32)
    out = np.asarray(encode(NGP, params, x))[0, 12:14]
    np.testing.assert_allclose(out, [0.0252026602, 0.1033276602], atol=2e-6)


def test_tcnn_golden_values_all_levels_hashed():
    """Adversarial config where EVERY level hashes (T=14, N_min=26: 26^3 >
    2^14 already at level 0) — exercises the prime-hash + mod-2^T path for
    all four levels at once, including the uint32 wraparound at x=1.
    Literals from scripts/derive_tcnn_goldens.py (round-5 fixtures)."""
    spec = HashGridSpec(scale=1.0, dim=3, levels=4, features=2,
                        log2_table=14, n_min=26, n_max=64)
    assert all(spec.level_uses_hash(l) for l in range(4))
    params = jnp.asarray(_golden_table(spec.n_entries))
    x = jnp.asarray([[0.137, 0.482, 0.911], [1.0, 1.0, 1.0]], jnp.float32)
    out = np.asarray(encode(spec, params, x))
    golden_interior = [-1.1840998232, -1.1059748232, 0.7205577133,
                       0.7986827133, 1.1228247982, 1.2009497982,
                       -0.6544148175, -0.5762898175]
    golden_corner = [-1.1601562500, -1.0820312500, 0.3103833479,
                     0.3885083479, 0.4487427320, 0.5268677320,
                     -0.5000000000, -0.4218750000]
    np.testing.assert_allclose(out[0], golden_interior, atol=2e-6)
    np.testing.assert_allclose(out[1], golden_corner, atol=2e-6)

    from tropical.core.hashgrid import _level_indices
    cp = jnp.asarray([[26, 26, 26]], jnp.int32)  # upper corner of last cell
    # level-0 hash of (26,26,26) mixes all three primes mod 2^14
    assert int(np.asarray(_level_indices(spec, 0, cp))[0]) == 16066


@pytest.mark.parametrize("n_min,golden,idx0", [
    # 80^3 = 512000 <= 2^19: DENSE, linear x-fastest index
    (80, [-0.5827387571, -0.5046137571], 430440),
    # 81^3 = 531441 > 2^19: HASHED, coherent-prime hash mod 2^19
    (81, [0.0890449045, -0.2713348198], 180841),
])
def test_tcnn_dense_hash_switch_boundary(n_min, golden, idx0):
    """Non-power-of-two resolutions bracketing the T=19 dense/hash switch
    (res 80 dense vs res 81 hashed): an implementation that switches at the
    wrong threshold, or hashes dense levels, fails one of the two sides.
    Literals from scripts/derive_tcnn_goldens.py (round-5 fixtures)."""
    spec = HashGridSpec(scale=1.0, dim=3, levels=1, features=2,
                        log2_table=19, n_min=n_min, n_max=n_min)
    assert spec.level_uses_hash(0) == (n_min == 81)
    params = jnp.asarray(_golden_table(spec.n_entries))
    x = jnp.asarray([[0.507, 0.253, 0.851]], jnp.float32)
    out = np.asarray(encode(spec, params, x))[0]
    np.testing.assert_allclose(out, golden, atol=2e-6)

    from tropical.core.hashgrid import _level_indices
    pos = np.floor(np.float32(0.507) * np.float32(spec.level_scale(0))
                   + np.float32(0.5))
    py = np.floor(np.float32(0.253) * np.float32(spec.level_scale(0))
                  + np.float32(0.5))
    pz = np.floor(np.float32(0.851) * np.float32(spec.level_scale(0))
                  + np.float32(0.5))
    cp = jnp.asarray([[int(pos), int(py), int(pz)]], jnp.int32)
    assert int(np.asarray(_level_indices(spec, 0, cp))[0]) == idx0


def test_tcnn_golden_values_on_grid_plane():
    """x = 0.5 sits EXACTLY on a grid plane of SMALL levels 0 (pos = 1.0)
    and 3 (pos = 16.0): the trilinear weight degenerates to a single corner
    row, so any off-by-one in floor/frac or corner ordering shows raw.
    Literals from scripts/derive_tcnn_goldens.py (round-5 fixtures)."""
    params = jnp.asarray(_golden_table(SMALL.n_entries))
    x = jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32)
    out = np.asarray(encode(SMALL, params, x))[0]
    golden = [-1.6718750000, -1.5937500000, -0.5615681708, -0.4834431708,
              -0.0744352415, 0.0036897585, 0.8593750000, 0.9375000000]
    np.testing.assert_allclose(out, golden, atol=2e-6)
    # the degenerate levels reproduce the corner row EXACTLY (weight 1.0)
    pg0 = 1 + 1 * 2 + 1 * 4                     # level 0: pos_grid (1,1,1)
    np.testing.assert_array_equal(
        out[0:2], np.asarray(params)[pg0])
    off3 = SMALL.level_offsets[3]
    pg3 = 16 + 16 * 32 + 16 * 32 * 32           # level 3: pos_grid (16,)*3
    np.testing.assert_array_equal(out[6:8], np.asarray(params)[off3 + pg3])


def test_tcnn_pth_import_end_to_end(tmp_path):
    """A real torch-saved .pth checkpoint (zipfile state_dict with a
    non-trivial table) loads through the reference path
    (find_checkpoint -> load_into -> torch.load) and reproduces the golden
    encoding through the imported table."""
    torch = pytest.importorskip("torch")
    from tropical.core.net import NetSpec, TropicalNet
    from tropical.utils import checkpoint as ckpt

    spec = NetSpec(num_layers=3, num_hidden=16, levels=4, r_min=2, r_max=32,
                   T=19)
    assert spec.grid.n_entries == SMALL.n_entries  # same table layout
    table = _golden_table(spec.grid.n_entries)
    state = {"enc.module.params": torch.tensor(table.reshape(-1))}
    rng = np.random.default_rng(7)
    for i, (fi, fo) in enumerate(zip(spec.num_nodes[:-1], spec.num_nodes[1:])):
        state[f"fc.{i}.weight"] = torch.tensor(
            rng.normal(size=(fo, fi)).astype(np.float32))
        state[f"fc.{i}.bias"] = torch.tensor(
            rng.normal(size=(fo,)).astype(np.float32))
    path = str(tmp_path / "golden_sdf_small_1.pth")
    torch.save(state, path)

    found = ckpt.find_checkpoint(path)
    assert found == path
    net = TropicalNet(spec)
    ckpt.load_into(net, found)
    np.testing.assert_array_equal(np.asarray(net.params["table"]), table)

    out = np.asarray(net.enc(jnp.asarray([[0.35, 0.60, 0.85]], jnp.float32)))[0]
    golden = [-1.7595312560, -1.6814062560, -1.2559877949, -1.4761360182,
              0.1083649024, 0.1864899024, -0.7585932761, -0.6804682761]
    np.testing.assert_allclose(out, golden, atol=2e-6)
    # and the MLP weights arrive transposed to [in, out]
    for i in range(3):
        np.testing.assert_array_equal(
            np.asarray(net.params["mlp"]["w"][i]),
            state[f"fc.{i}.weight"].numpy().T)
