"""Distributed tests on the 8-device CPU mesh (SURVEY.md §4 strategy)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from cal_tpu.data.loader import Loader, compute_budgets
from cal_tpu.graph import batch_graphs
from cal_tpu.models.factory import get_model
from cal_tpu.ops.gat import gat_aggregate_sparse
from cal_tpu.ops.gcn import gcn_aggregate_sparse
from cal_tpu.parallel import (
    allgather_intervention,
    edge_partitioned_gat_aggregate,
    edge_partitioned_gcn_aggregate,
    make_dp_causal_eval_step,
    make_dp_causal_train_step,
    make_mesh,
    ppermute_intervention,
    replicate,
    shard_batch,
    shard_edges,
)
from cal_tpu.train.optim import make_optimizer
from cal_tpu.train.steps import (
    init_state,
    make_causal_eval_step,
    make_causal_train_step,
)
from cal_tpu.utils.config import Config


def _sorted_batch(graphs, n_graphs=8, n_nodes=256, n_edges=1024):
    return batch_graphs(graphs[:n_graphs], n_graphs, n_nodes, n_edges)


def test_mesh_shapes():
    m = make_mesh()
    assert m.devices.size == 8
    m2 = make_mesh(dp=4, edge=2)
    assert m2.shape == {"dp": 4, "edge": 2}


def test_edge_partitioned_gcn_matches_single(graphs, rng):
    b = _sorted_batch(graphs)
    h = 16
    x = jnp.asarray(rng.standard_normal((256, h)).astype(np.float32))
    ew = jnp.asarray(rng.random(1024).astype(np.float32))
    ref = gcn_aggregate_sparse(x, b.senders, b.receivers, b.edge_mask, ew)

    mesh = make_mesh(dp=1, edge=8)
    s, r, m = shard_edges(np.array(b.senders), np.array(b.receivers),
                          np.array(b.edge_mask), 8)
    ews = np.array(ew).reshape(8, -1)

    fn = shard_map(
        lambda xl, ss, rr, mm, ww: edge_partitioned_gcn_aggregate(
            xl, ss[0], rr[0], mm[0], ww[0], axis_name="edge"),
        mesh=mesh,
        in_specs=(P("edge"), P("edge"), P("edge"), P("edge"), P("edge")),
        out_specs=P("edge"),
        check_vma=False,
    )
    out = fn(x, s, r, m, ews)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_edge_partitioned_gat_matches_single(graphs, rng):
    b = _sorted_batch(graphs)
    heads, d = 2, 8
    xh = jnp.asarray(rng.standard_normal((256, heads, d)).astype(np.float32))
    att_dst = jnp.asarray(rng.standard_normal((heads, d)).astype(np.float32))
    att_src = jnp.asarray(rng.standard_normal((heads, d)).astype(np.float32))
    ref = gat_aggregate_sparse(xh, b.senders, b.receivers, b.edge_mask,
                               att_dst, att_src)

    mesh = make_mesh(dp=1, edge=8)
    s, r, m = shard_edges(np.array(b.senders), np.array(b.receivers),
                          np.array(b.edge_mask), 8)
    fn = shard_map(
        lambda xl, ss, rr, mm: edge_partitioned_gat_aggregate(
            xl, ss[0], rr[0], mm[0], att_dst, att_src, axis_name="edge"),
        mesh=mesh,
        in_specs=(P("edge"), P("edge"), P("edge"), P("edge")),
        out_specs=P("edge"),
        check_vma=False,
    )
    out = fn(xh, s, r, m)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


@pytest.mark.parametrize("impl", ["allgather", "ppermute"])
def test_intervention_collective_is_valid_permutation(impl):
    mesh = make_mesh(dp=8, edge=1)
    g_local, h = 4, 6
    G = 8 * g_local
    xc = jnp.arange(G * h, dtype=jnp.float32).reshape(G, h)
    gm = jnp.ones((G,), bool)
    key = jax.random.PRNGKey(3)
    fn = shard_map(
        lambda k, x, m: (allgather_intervention if impl == "allgather"
                         else ppermute_intervention)(k, x, m, axis_name="dp"),
        mesh=mesh,
        in_specs=(P(), P("dp"), P("dp")),
        out_specs=P("dp"),
        check_vma=False,
    )
    out = np.asarray(fn(key, xc, gm))
    # rows are a permutation of the original rows
    orig = {tuple(row) for row in np.asarray(xc)}
    got = [tuple(row) for row in out]
    assert set(got) == orig and len(got) == len(orig)
    # and it actually mixes across shards
    src_shard = np.array([int(r[0] // (h * g_local) // 1) for r in out])
    assert not np.array_equal(src_shard, np.repeat(np.arange(8), g_local))


def test_dp_dense_packed_strips_pallas_adj_budget(graphs):
    """ADVICE r3 (medium): a dp-sharded PackedDenseBatch must not keep
    eg_budget > 0 — the adj-build Pallas kernel reads GLOBAL flat indices
    that don't align with dp shards.  The guard must cover shard_batch,
    shard_stacked (scan-epoch path), and the dp step must still match
    single-device numerics on the XLA-scatter fallback."""
    from cal_tpu.parallel import shard_stacked
    from cal_tpu.train.steps import stack_batches_host, to_device

    cfg = Config(model="CausalGCN", hidden=16, layers=2, layout="dense",
                 batch_size=8, epochs=2)
    budgets = compute_budgets(graphs, cfg.batch_size, "dense")
    assert budgets["edge_per_graph"] > 0
    loader = Loader(graphs, cfg.batch_size, layout="dense", budgets=budgets)
    batch = next(iter(loader))
    assert batch.eg_budget > 0
    mesh = make_mesh(dp=8, edge=1)

    sb = shard_batch(batch, mesh)
    assert sb.eg_budget == 0

    stacked = stack_batches_host(list(loader.host_batches()))
    sst = shard_stacked(stacked, mesh)
    assert sst.eg_budget == 0

    model = get_model(cfg, 0, 3)
    tx = make_optimizer(cfg.lr, cfg.min_lr, cfg.epochs, 1, 0.0)
    rng = jax.random.PRNGKey(0)
    state = init_state(model, tx, batch, rng)
    single_step = make_causal_train_step(model, tx, cfg.c, cfg.o, cfg.co, True)
    s1, m1 = single_step(jax.tree.map(jnp.copy, state), batch, rng)
    dp_step = make_dp_causal_train_step(
        model, tx, cfg.c, cfg.o, cfg.co, True, mesh, state, batch)
    s2, m2 = dp_step(replicate(jax.tree.map(jnp.copy, state), mesh), sb,
                     replicate(rng, mesh))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)


def test_dp_step_matches_single_device(graphs):
    cfg = Config(model="CausalGCN", hidden=16, layers=2, layout="sparse",
                 batch_size=8, epochs=2)
    budgets = compute_budgets(graphs, cfg.batch_size, "sparse")
    loader = Loader(graphs, cfg.batch_size, layout="sparse", budgets=budgets)
    batch = next(iter(loader))
    model = get_model(cfg, 0, 3)
    tx = make_optimizer(cfg.lr, cfg.min_lr, cfg.epochs, 1, 0.0)
    rng = jax.random.PRNGKey(0)
    state = init_state(model, tx, batch, rng)

    single_step = make_causal_train_step(model, tx, cfg.c, cfg.o, cfg.co, True)
    s1, m1 = single_step(
        jax.tree.map(jnp.copy, state), batch, rng
    )

    mesh = make_mesh(dp=8, edge=1)
    dp_step = make_dp_causal_train_step(
        model, tx, cfg.c, cfg.o, cfg.co, True, mesh, state, batch)
    sb = shard_batch(batch, mesh)
    s2, m2 = dp_step(replicate(jax.tree.map(jnp.copy, state), mesh), sb,
                     replicate(rng, mesh))
    # identical program modulo reduction order / collective scheduling
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5),
        s1.params, s2.params,
    )

    ev1 = make_causal_eval_step(model, False)(s1, batch, rng)
    ev2 = make_dp_causal_eval_step(model, False, mesh, state, batch)(
        s2, sb, replicate(rng, mesh))
    assert int(ev1["n"]) == int(ev2["n"])
    assert int(ev1["correct_o"]) == int(ev2["correct_o"])
