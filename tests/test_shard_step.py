"""Edge-sharded step front half + sharded skeleton forward vs single-chip
(the multi-chip extrapolation experiment, parallel/shard_step.py) on the
virtual 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp


def _pool(vcap=512, ecap=1024, R=33, seed=0):
    rng = np.random.default_rng(seed)
    V = rng.uniform(-1, 1, (vcap, 3)).astype(np.float32)
    OUT = rng.normal(size=(vcap, R)).astype(np.float32)
    E = rng.integers(0, vcap, (ecap, 2)).astype(np.int32)
    aliveE = rng.random(ecap) < 0.7
    EB = rng.integers(0, 2 ** 32, (2, ecap), dtype=np.uint32)
    return (jnp.asarray(V), jnp.asarray(OUT), jnp.asarray(E),
            jnp.asarray(aliveE), jnp.asarray(EB))


def test_front_half_sharded_matches_single():
    from tropical.parallel.mesh import make_mesh
    from tropical.parallel.shard_step import (front_half_sharded,
                                              front_half_single,
                                              shard_edge_pool)

    mesh = make_mesh(8, shape=(8, 1))
    V, OUT, E, aliveE, EB = _pool()
    ccap = 256
    fn = front_half_sharded(mesh, E.shape[0], ccap)
    Es, aliveEs, EBs = shard_edge_pool(E, aliveE, EB, mesh)

    for idx in (0, 7, 31, 32):
        ref = front_half_single(V, OUT, E, aliveE, EB, jnp.int32(idx), ccap)
        got = fn(V, OUT, Es, aliveEs, EBs, jnp.int32(idx))
        rl, rv, rn, r0, r1, rx = (np.asarray(a) for a in ref)
        gl, gv, gn, g0, g1, gx, govf = (np.asarray(a) for a in got)
        # ovf mirrors the single-chip OVF_C semantics: it fires iff the TRUE
        # global split count exceeds ccap (both engines then truncate to the
        # same lowest-pool-id ccap candidates, so equality still holds)
        assert int(govf) == (1 if int(rn) > ccap else 0)
        assert int(rn) == int(gn) and int(rn) > 10
        assert np.array_equal(rv, gv)
        assert np.array_equal(np.where(rv, rl, 0), gl)
        assert np.array_equal(r0, g0) and np.array_equal(r1, g1)
        # the merge machinery (keys, order, counts, d-values) is bitwise;
        # the lerp may compile with/without FMA contraction in the two
        # programs, and wgt = |d0|/|d1-d0| amplifies that ulp noise
        # arbitrarily on the test pool's near-degenerate rows (d0 ~= d1) —
        # compare with conditioning-aware tolerance
        wgt = np.abs(r0) / np.maximum(np.abs(r1 - r0), 1e-30)
        tol = 1e-6 * (1.0 + wgt) * (1.0 + np.abs(rx).max(-1))
        assert (np.abs(rx - gx).max(-1) <= tol).all()


def test_front_half_sharded_overflow_reported():
    from tropical.parallel.mesh import make_mesh
    from tropical.parallel.shard_step import (front_half_sharded,
                                              shard_edge_pool)

    mesh = make_mesh(8, shape=(8, 1))
    V, OUT, E, aliveE, EB = _pool()
    # all edges split on idx=0: per-shard count 1024/8 = 128 > cs=4
    EB = jnp.ones_like(EB)
    aliveE = jnp.ones_like(aliveE)
    fn = front_half_sharded(mesh, E.shape[0], 32)
    Es, aliveEs, EBs = shard_edge_pool(E, aliveE, EB, mesh)
    *_, govf = fn(V, OUT, Es, aliveEs, EBs, jnp.int32(0))
    # 8 shards clipped locally (128 > cs=32) + 1 global (1024 > ccap=32)
    assert int(np.asarray(govf)) == 9


def test_skeleton_forward_sharded_matches():
    from tropical.core import NetSpec, TropicalNet
    from tropical.core.net import net_outputs_lattice
    from tropical.parallel.mesh import make_mesh
    from tropical.parallel.shard_step import skeleton_forward_sharded

    spec = NetSpec(num_layers=3, num_hidden=16, levels=4, r_min=2, r_max=8,
                   T=19)
    net = TropicalNet(spec, key=jax.random.PRNGKey(0))
    mesh = make_mesh(8, shape=(8, 1))
    xw = jnp.linspace(-1.0, 1.0, 16)
    yw = jnp.linspace(-1.0, 1.0, 12)
    zw = jnp.linspace(-1.0, 1.0, 10)
    ref = np.asarray(net_outputs_lattice(spec, net.params, xw, yw, zw))
    fn = skeleton_forward_sharded(spec, mesh)
    got = np.asarray(fn(net.params, xw, yw, zw))
    # per-x-slab evaluation is row-independent, but the per-shard shapes
    # compile with different tilings/contraction — ulp-level agreement
    assert np.allclose(ref, got, rtol=2e-6, atol=2e-6)
    assert np.median(np.abs(ref - got)) < 1e-7
