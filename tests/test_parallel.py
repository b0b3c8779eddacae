"""Parallel layer: mesh construction, shardings, sharded train step parity.

Runs on the 8-device virtual CPU mesh from conftest.  The reference has no
distributed code (SURVEY §2.4/§5.8); these tests pin the additive multi-chip
layer's contract: sharded results must equal single-device results exactly
(same math, collectives inserted by XLA from shardings alone).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tropical.core.net import NetSpec, init_net_params, net_sdf
from tropical.parallel.mesh import (make_mesh, shard_batch, shard_params,
                                    sharded_apply, sharded_train_step,
                                    table_sharding)
from tropical.stanford.training import make_optimizer, make_train_step

SPEC = NetSpec(num_layers=3, num_hidden=16, levels=4, r_min=2, r_max=16, T=19)


@pytest.fixture(scope="module")
def params():
    return init_net_params(SPEC, jax.random.PRNGKey(0))


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert set(mesh.shape) and np.prod(list(mesh.shape.values())) == 8
    mesh2 = make_mesh(8, shape=(8, 1))
    assert dict(mesh2.shape) == {"dp": 8, "mp": 1}


def test_make_mesh_too_many_devices_raises():
    with pytest.raises(ValueError, match="requested"):
        make_mesh(len(jax.devices()) + 1)


def test_make_mesh_bad_shape_raises():
    with pytest.raises(ValueError, match="tile"):
        make_mesh(8, shape=(3, 2))


def test_shard_batch_pads_and_places():
    mesh = make_mesh(8, shape=(8, 1))
    x = jnp.arange(10 * 3, dtype=jnp.float32).reshape(10, 3)
    xs = shard_batch(x, mesh)
    assert xs.shape[0] % 8 == 0 and xs.shape[0] >= 10
    np.testing.assert_array_equal(np.asarray(xs[:10]), np.asarray(x))
    assert np.asarray(xs[10:]).sum() == 0  # zero padding
    assert len(xs.sharding.device_set) == 8


def test_table_sharding_places_shards(params):
    mesh = make_mesh(8, shape=(4, 2))
    sp = shard_params(params, mesh)
    assert sp["table"].sharding == table_sharding(mesh)
    # the entry axis is actually split over mp: each shard holds half
    shard_rows = {s.data.shape[0] for s in sp["table"].addressable_shards}
    assert shard_rows == {params["table"].shape[0] // 2}
    np.testing.assert_array_equal(np.asarray(sp["table"]),
                                  np.asarray(params["table"]))


def test_sharded_apply_matches_unsharded_and_slices_padding(params):
    mesh = make_mesh(8, shape=(4, 2))
    fn = lambda p, x: net_sdf(SPEC, p, x)  # noqa: E731
    apply = sharded_apply(fn, mesh)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (37, 3)),
                    jnp.float32)  # 37 is not a multiple of dp=4
    y = apply(params, x)
    assert y.shape[0] == 37  # phantom padded rows must be sliced off
    y_ref = jax.jit(fn)(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)


@pytest.mark.parametrize("batch", [32, 37])  # divisible and ragged
def test_sharded_train_step_matches_single_device(params, batch):
    mesh = make_mesh(8, shape=(4, 2))
    tx, _ = make_optimizer(1e-3, 10)

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (batch, 3)).astype(np.float32)
    y = rng.uniform(-0.1, 0.1, batch).astype(np.float32)

    # single device reference
    step_1 = make_train_step(SPEC, tx, batch)
    p1, _, total1, l11 = step_1(params, tx.init(params),
                                jnp.asarray(x), jnp.asarray(y))

    # sharded: pad to a dp multiple, mask padding out via n_valid
    sp = shard_params(params, mesh)
    step_n = sharded_train_step(SPEC, tx, batch, mesh)
    pn, _, totaln, l1n = step_n(sp, tx.init(sp), shard_batch(x, mesh),
                                shard_batch(y, mesh), n_valid=batch)

    assert abs(float(total1) - float(totaln)) < 1e-6
    assert abs(float(l11) - float(l1n)) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(pn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sharded_extraction_parity(trained_net):
    """dp=8 host fan-out extraction == single-device extraction,
    bit-identical: the mesh only changes placement of the per-step
    forwards, not the math (subpoly(mesh=..., engine="host") path;
    VERDICT round-1 item 6)."""
    from tropical.extract.subdivide import subpoly

    mesh = make_mesh(8)
    _, v1, t1 = subpoly(trained_net, 3, 1.2, force=True, verbose=False,
                        engine="host")
    _, vn, tn = subpoly(trained_net, 3, 1.2, force=True, verbose=False,
                        mesh=mesh, engine="host")
    assert v1.shape == vn.shape and t1.shape == tn.shape
    np.testing.assert_array_equal(v1, vn)
    np.testing.assert_array_equal(t1, tn)


def test_mesh_extraction_routes_to_fused_engine(trained_net):
    """A >1-device mesh routes the skeleton's lattice forward over the
    mesh's dp axis (round-5: `skeleton_sharded` is the PRODUCT path now,
    not a testbed) while the insertion loop stays single-chip per the
    DESIGN.md crossover analysis.  Funnel COUNTS must match exactly;
    coordinates only to fp tolerance — the shard_map'd forward is a
    different XLA program over different shapes, and XLA guarantees no
    bitwise reproducibility across partitionings, so a small fraction of
    sliver polygons may flip their fan pivot (same quantified contract as
    the device/host faces divergence, tests/test_device_faces.py)."""
    from tropical.extract.subdivide import subpoly

    mesh = make_mesh(8)
    _, v1, t1 = subpoly(trained_net, 3, 1.2, force=True, verbose=False)
    _, vn, tn = subpoly(trained_net, 3, 1.2, force=True, verbose=False,
                        mesh=mesh)
    assert v1.shape == vn.shape and t1.shape == tn.shape
    np.testing.assert_allclose(v1, vn, atol=1e-4)
    flips = int((np.asarray(t1) != np.asarray(tn)).any(axis=1).sum())
    assert flips <= max(1, len(t1) // 100), (
        f"{flips}/{len(t1)} triangle rows diverged (>1%)")


def test_skeleton_sharded_matches_single_chip(trained_net):
    """The dp-sharded skeleton (lattice forward over x-slabs + replicated
    squeeze) returns the single-chip skeleton buffers — identical counts
    and edge topology, coordinates/outputs to fp tolerance (the sharded
    forward is a different XLA program over different shapes; no bitwise
    guarantee across partitionings) — including the x-axis padding to a dp
    multiple (round-5, VERDICT task 5)."""
    from tropical.extract import device as dev
    from tropical.parallel.shard_step import skeleton_sharded

    mesh = make_mesh(8)
    net = trained_net
    M = int(net.marks.shape[0])
    assert M % 8 != 0, "fixture should exercise the padded-slab path"
    dist_k = dev._dist_pool_k(np.asarray(net.marks))
    sc = dev.default_skel_caps(M, "dist")
    fn = dev.make_skeleton_fn(net.spec, sc, M, 1e-4, mode="dist",
                              dist_k=dist_k)
    V1, O1, E1, nv1, ne1, ovf1 = fn(net.params, net.marks)
    Vn, On, En, nvn, nen, ovfn = skeleton_sharded(
        net, mesh, sc, 1e-4, "dist", dist_k)
    assert int(ovf1) == int(ovfn) == 0
    assert int(nv1) == int(nvn) and int(ne1) == int(nen)
    np.testing.assert_array_equal(np.asarray(V1), np.asarray(Vn))
    np.testing.assert_array_equal(np.asarray(E1), np.asarray(En))
    # OUT to 1 ulp: the sharded forward is a different XLA compilation of
    # the same f32 lattice math (fusion-dependent rounding)
    np.testing.assert_allclose(np.asarray(O1), np.asarray(On), atol=1e-6)
