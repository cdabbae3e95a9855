"""Loader.host_batches (NumPy-leaf epoch batches for host stacking) must be
leaf-for-leaf identical to the device __iter__ path — same shuffle stream,
same packing, same tile plans."""
import dataclasses

import jax
import numpy as np
import pytest

from cal_tpu.data.loader import Loader, compute_budgets
from cal_tpu.data.synthetic import generate_synthetic_dataset
from cal_tpu.train.steps import stack_batches_host, to_device


@pytest.fixture(scope="module")
def graphs():
    ds = generate_synthetic_dataset(data_num=6, node_num=4, max_degree=6,
                                    seed=3)
    return [g for ctx in ds.values() for shp in ctx.values() for g in shp]


@pytest.mark.parametrize("layout", ["dense", "sparse"])
def test_host_batches_match_device_iter(graphs, layout):
    budgets = compute_budgets(graphs, 16, layout)
    mk = lambda: Loader(graphs, 16, shuffle=True, layout=layout,
                        budgets=budgets, seed=7)
    dev = list(mk())
    host = list(mk().host_batches())
    assert len(dev) == len(host)
    for d, h in zip(dev, host):
        assert type(d) is type(h)
        d_leaves = jax.tree.leaves(d)
        h_leaves = jax.tree.leaves(h)
        assert len(d_leaves) == len(h_leaves)
        for a, b in zip(d_leaves, h_leaves):
            assert isinstance(b, np.ndarray) or np.ndim(b) == 0
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_host_stack_roundtrip(graphs):
    budgets = compute_budgets(graphs, 16, "dense")
    host = list(Loader(graphs, 16, shuffle=False, layout="dense",
                       budgets=budgets).host_batches())
    stacked = to_device(stack_batches_host(host))
    leaves = jax.tree.leaves(stacked)
    assert all(l.shape[0] == len(host) for l in leaves)
    # first slice equals first batch
    for l, b in zip(leaves, jax.tree.leaves(host[0])):
        np.testing.assert_array_equal(np.asarray(l[0]), np.asarray(b))


def test_partitioned_host_batches_match_device_iter(graphs):
    """PartitionedLoader.host_batches (VERDICT r2 item 6): NumPy leaves,
    leaf-for-leaf identical to the device __iter__ path, and shardable via
    shard_stacked with one transfer per leaf."""
    from jax.sharding import NamedSharding

    from cal_tpu.data.loader import PartitionedLoader
    from cal_tpu.parallel import make_mesh, shard_stacked
    from cal_tpu.parallel.partition import partition_budgets

    mesh = make_mesh(dp=2, edge=2, devices=jax.devices()[:4])
    budgets = partition_budgets(graphs, 16, 2, 2)
    mk = lambda: PartitionedLoader(graphs, 16, mesh, shuffle=True,
                                   budgets=budgets, seed=7, spmm_tiles=True)
    dev = list(mk())
    host = list(mk().host_batches())
    assert len(dev) == len(host)
    for d, h in zip(dev, host):
        assert type(d) is type(h)
        d_leaves, h_leaves = jax.tree.leaves(d), jax.tree.leaves(h)
        assert len(d_leaves) == len(h_leaves)
        for a, b in zip(d_leaves, h_leaves):
            assert isinstance(b, np.ndarray) or np.ndim(b) == 0
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    stacked = shard_stacked(stack_batches_host(host), mesh)
    for leaf in jax.tree.leaves(stacked):
        assert leaf.shape[0] == len(host)
        assert isinstance(leaf.sharding, NamedSharding)


def test_sparse_tiles_host_plans(graphs):
    """host_batches ships SLIM plans (perm + block ids only — the r4 H2D
    retention-leak mitigation); the device __iter__ path builds full plans.
    Device-side hydration of the slim plan must reproduce the full plan
    leaf-for-leaf (steps.hydrate_stacked runs exactly this before the
    epoch scan)."""
    import jax.numpy as jnp

    from cal_tpu.ops.pallas_spmm import hydrate_tiles

    budgets = compute_budgets(graphs, 16, "sparse")
    tl = Loader(graphs, 16, shuffle=False, layout="sparse",
                budgets=budgets, spmm_tiles=True)
    hb = next(iter(tl.host_batches()))
    db = next(iter(tl))
    if hb.tiles is None:
        pytest.skip("native packer unavailable")
    nb = budgets["node_budget"]
    s, r = jnp.asarray(hb.senders), jnp.asarray(hb.receivers)
    em = jnp.asarray(hb.edge_mask)
    # tiles = (fwd plan from (s, r), bwd plan from (r, s)) — hydrate with
    # the same argument order build_tiles was called with
    for slim, full, (a1, a2) in zip(hb.tiles, db.tiles, [(s, r), (r, s)]):
        assert slim.sloc is None and slim.sglb is None
        for leaf in jax.tree.leaves(slim):
            assert isinstance(np.asarray(leaf), np.ndarray)
        hyd = hydrate_tiles(slim, a1, a2, em, nb)
        h_leaves = jax.tree.leaves(hyd)
        f_leaves = jax.tree.leaves(full)
        assert len(h_leaves) == len(f_leaves)
        for a, b in zip(h_leaves, f_leaves):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
