"""Edge-partitioned path (PartitionedGraphBatch): planner invariants, halo
aggregates, full-model forward and train-step parity vs the single-device
sparse layout — all on the 8-device CPU mesh (SURVEY.md §4 strategy).

The reference has no counterpart (it scales nothing, SURVEY.md §2.3); the
numeric contract is exact agreement with ops/gcn.py gcn_aggregate_sparse /
ops/gat.py gat_aggregate_sparse, i.e. reference gcn_conv.py:44-70 and
PyG-1.1.0 GATConv.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cal_tpu.data.loader import compute_budgets
from cal_tpu.graph import batch_graphs
from cal_tpu.models.factory import get_model
from cal_tpu.ops.gat import gat_aggregate_sparse
from cal_tpu.ops.gcn import gcn_aggregate_sparse
from cal_tpu.parallel import (
    comms_stats,
    make_mesh,
    partition_batch,
    partition_budgets,
    partitioned_gcn_aggregate,
    partitioned_gat_aggregate,
    replicate,
    shard_batch,
)
from cal_tpu.train.optim import make_optimizer
from cal_tpu.train.steps import (
    init_state,
    make_causal_eval_step,
    make_causal_train_step,
)
from cal_tpu.utils.config import Config


def _make_part(graphs, dp, ne):
    mesh = make_mesh(dp=dp, edge=ne)
    bud = partition_budgets(graphs, len(graphs), dp, ne)
    pb = partition_batch(
        graphs, mesh, bud["num_graphs"], bud["node_budget"],
        bud["edge_budget_per_shard"], bud["halo_budget"],
    )
    return mesh, pb


def _ref_batch(graphs):
    n, e = compute_budgets(graphs, len(graphs), "sparse")["node_budget"], None
    tot_e = max(sum(g.num_edges for g in graphs), 1)
    return batch_graphs(graphs, len(graphs), n, ((tot_e + 127) // 128) * 128)


def _node_map(ref_b, pb):
    """Partition row -> reference row (real rows appear in the same order)."""
    nm_ref = np.asarray(ref_b.node_mask)
    nm_p = np.asarray(pb.node_mask)
    assert nm_ref.sum() == nm_p.sum()
    pos_to_ref = np.full(pb.num_nodes, -1, np.int64)
    pos_to_ref[np.nonzero(nm_p)[0]] = np.nonzero(nm_ref)[0]
    return pos_to_ref


def _scatter_x(x_ref, ref_b, pb):
    xp = np.zeros((pb.num_nodes, x_ref.shape[1]), x_ref.dtype)
    xp[np.asarray(pb.node_mask)] = x_ref[np.asarray(ref_b.node_mask)]
    return xp


def test_planner_invariants(graphs):
    mesh, pb = _make_part(graphs[:8], dp=2, ne=4)
    assert pb.num_graphs == 8
    assert bool(pb.graph_mask.all())
    assert int(pb.node_mask.sum()) == sum(g.num_nodes for g in graphs[:8])
    assert int(pb.edge_mask.sum()) == sum(g.num_edges for g in graphs[:8])
    # every edge is receiver-owned: shard-local receivers in range
    vl = pb.nodes_per_shard
    assert int(pb.receivers.max()) < vl
    # node_graph slots are global and match labels
    ng = np.asarray(pb.node_graph)[np.asarray(pb.node_mask)]
    assert ng.min() >= 0 and ng.max() < 8


@pytest.mark.parametrize("dp,ne", [(1, 8), (2, 4), (4, 2)])
def test_partitioned_gcn_matches_sparse(graphs, rng, dp, ne):
    gs = graphs[:8]
    ref_b = _ref_batch(gs)
    mesh, pb = _make_part(gs, dp, ne)
    h = 16
    x_ref = rng.standard_normal((ref_b.num_nodes, h)).astype(np.float32)
    ref = gcn_aggregate_sparse(
        jnp.asarray(x_ref), ref_b.senders, ref_b.receivers, ref_b.edge_mask)
    xp = jnp.asarray(_scatter_x(x_ref, ref_b, pb))
    out = jax.jit(partitioned_gcn_aggregate)(xp, pb)
    np.testing.assert_allclose(
        np.asarray(out)[np.asarray(pb.node_mask)],
        np.asarray(ref)[np.asarray(ref_b.node_mask)],
        rtol=2e-5, atol=2e-5,
    )


def test_partitioned_gcn_with_edge_weights(graphs, rng):
    gs = graphs[:8]
    ref_b = _ref_batch(gs)
    mesh, pb = _make_part(gs, dp=2, ne=4)
    h = 8
    x_ref = rng.standard_normal((ref_b.num_nodes, h)).astype(np.float32)
    # per-edge weight as a symmetric-free function of the REFERENCE endpoint
    # ids, so both layouts derive the same weight for the same edge.
    wtab = rng.random((ref_b.num_nodes, 2)).astype(np.float32)

    def w_of(s_ref, r_ref):
        return (0.25 + wtab[s_ref, 0] * wtab[r_ref, 1]).astype(np.float32)

    ew_ref = w_of(np.asarray(ref_b.senders), np.asarray(ref_b.receivers))
    ref = gcn_aggregate_sparse(
        jnp.asarray(x_ref), ref_b.senders, ref_b.receivers, ref_b.edge_mask,
        jnp.asarray(ew_ref))

    pos_to_ref = _node_map(ref_b, pb)
    dp_, ne_ = 2, 4
    vg = pb.num_nodes // dp_
    vl = pb.nodes_per_shard
    ep = pb.senders_glb.shape[0] // (dp_ * ne_)
    s_glb = np.asarray(pb.senders_glb).reshape(dp_ * ne_, ep)
    recv = np.asarray(pb.receivers).reshape(dp_ * ne_, ep)
    emask = np.asarray(pb.edge_mask).reshape(dp_ * ne_, ep)
    ew_p = np.zeros((dp_ * ne_, ep), np.float32)
    for gid in range(dp_ * ne_):
        k, es = divmod(gid, ne_)
        live = emask[gid]
        s_pos = k * vg + s_glb[gid][live]
        r_pos = k * vg + es * vl + recv[gid][live]
        ew_p[gid][live] = w_of(pos_to_ref[s_pos], pos_to_ref[r_pos])
    out = jax.jit(partitioned_gcn_aggregate)(
        jnp.asarray(_scatter_x(x_ref, ref_b, pb)), pb,
        jnp.asarray(ew_p.reshape(-1)))
    np.testing.assert_allclose(
        np.asarray(out)[np.asarray(pb.node_mask)],
        np.asarray(ref)[np.asarray(ref_b.node_mask)],
        rtol=2e-5, atol=2e-5,
    )


@pytest.mark.parametrize("dp,ne", [(2, 4), (4, 2)])
def test_partitioned_gat_matches_sparse(graphs, rng, dp, ne):
    gs = graphs[:8]
    ref_b = _ref_batch(gs)
    mesh, pb = _make_part(gs, dp, ne)
    heads, d = 2, 8
    xh_ref = rng.standard_normal(
        (ref_b.num_nodes, heads, d)).astype(np.float32)
    att_dst = jnp.asarray(rng.standard_normal((heads, d)).astype(np.float32))
    att_src = jnp.asarray(rng.standard_normal((heads, d)).astype(np.float32))
    ref = gat_aggregate_sparse(
        jnp.asarray(xh_ref), ref_b.senders, ref_b.receivers, ref_b.edge_mask,
        att_dst, att_src)
    xh_p = np.zeros((pb.num_nodes, heads, d), np.float32)
    xh_p[np.asarray(pb.node_mask)] = xh_ref[np.asarray(ref_b.node_mask)]
    out = jax.jit(
        lambda xh, pb: partitioned_gat_aggregate(xh, pb, att_dst, att_src)
    )(jnp.asarray(xh_p), pb)
    np.testing.assert_allclose(
        np.asarray(out)[np.asarray(pb.node_mask)],
        np.asarray(ref)[np.asarray(ref_b.node_mask)],
        rtol=2e-5, atol=2e-5,
    )


@pytest.mark.parametrize("dp,ne", [(2, 4), (4, 2)])
def test_partitioned_gcn_tiled_matches_sparse(graphs, rng, dp, ne):
    """Per-shard block-COO Pallas tile plans (interpret mode on CPU) under
    the halo-exchange aggregate reproduce the XLA sparse reference — the
    dp-sharded analog of GraphBatch.tiles (VERDICT.md round-1 item 6)."""
    gs = graphs[:8]
    ref_b = _ref_batch(gs)
    mesh = make_mesh(dp=dp, edge=ne)
    bud = partition_budgets(gs, len(gs), dp, ne)
    pb = partition_batch(
        gs, mesh, bud["num_graphs"], bud["node_budget"],
        bud["edge_budget_per_shard"], bud["halo_budget"],
        spmm_tiles=True, node_block=8, tile_edges=8,
    )
    assert pb.tiles is not None
    h = 8
    x_ref = rng.standard_normal((ref_b.num_nodes, h)).astype(np.float32)
    ref = gcn_aggregate_sparse(
        jnp.asarray(x_ref), ref_b.senders, ref_b.receivers, ref_b.edge_mask)
    out = jax.jit(partitioned_gcn_aggregate)(
        jnp.asarray(_scatter_x(x_ref, ref_b, pb)), pb)
    np.testing.assert_allclose(
        np.asarray(out)[np.asarray(pb.node_mask)],
        np.asarray(ref)[np.asarray(ref_b.node_mask)],
        rtol=2e-5, atol=2e-5,
    )
    # gradient parity (custom-VJP kernels + halo all_to_all transpose) vs
    # the tile-free partitioned aggregate
    import dataclasses

    pb_nt = dataclasses.replace(pb, tiles=None)
    ew = jnp.asarray(rng.random(pb.edge_mask.shape[0]).astype(np.float32))
    xp = jnp.asarray(_scatter_x(x_ref, ref_b, pb))
    f = lambda p: lambda x, w: (partitioned_gcn_aggregate(x, p, w) ** 2).sum()
    gx, gw = jax.jit(jax.grad(f(pb), argnums=(0, 1)))(xp, ew)
    rx, rw = jax.jit(jax.grad(f(pb_nt), argnums=(0, 1)))(xp, ew)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=2e-4, atol=2e-4)


def test_comms_stats_beat_allgather(graphs):
    _, pb = _make_part(graphs[:8], dp=2, ne=4)
    st = comms_stats(pb)
    # boundary exchange must ship (much) less than the naive all_gather
    assert st["halo_rows"] < st["allgather_rows"]
    assert st["reduction_vs_allgather"] > 1.0


@pytest.mark.parametrize("model_name", ["CausalGCN", "CausalGIN", "CausalGAT"])
def test_partitioned_model_forward_matches_single(graphs, model_name):
    gs = graphs[:8]
    ref_b = _ref_batch(gs)
    mesh, pb = _make_part(gs, dp=2, ne=4)
    cfg = Config(model=model_name, hidden=16, layers=2, layout="sparse")
    model = get_model(cfg, 0, 3)
    rngs = {"params": jax.random.PRNGKey(0),
            "intervention": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, ref_b, eval_random=False, train=False)
    ref_out = model.apply(variables, ref_b, eval_random=False, train=False)
    # identical graph slots, so per-graph outputs must agree exactly
    pb = pb.__class__(**{
        **{f.name: getattr(pb, f.name)
           for f in pb.__dataclass_fields__.values()},
        "x": jnp.asarray(_scatter_x(np.asarray(ref_b.x), ref_b, pb)),
    })
    part_out = jax.jit(
        lambda v, g: model.apply(v, g, eval_random=False, train=False)
    )(variables, pb)
    for a, b in zip(ref_out, part_out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


@pytest.mark.slow
def test_trainer_partitioned_smoke():
    """The user-facing trainer runs edge-partitioned end to end
    (cfg.mesh_dp=2, cfg.mesh_edge=4) and matches the single-device sparse
    run's final losses (same graphs, same PRNG stream)."""
    from cal_tpu.data.synthetic import (
        dataset_bias_split, generate_synthetic_dataset)
    from cal_tpu.train.causal import train_causal_syn

    ds = generate_synthetic_dataset(data_num=8, node_num=4, max_degree=6,
                                    seed=5)
    train, val, test = dataset_bias_split(ds, bias=0.7, total=8 * 4,
                                          seed=0)[:3]
    base = dict(model="CausalGCN", epochs=3, batch_size=8, hidden=16,
                layers=1, lr=0.01, layout="sparse", use_pallas=False)
    r1 = train_causal_syn(train, val, test, Config(**base), verbose=False)
    r2 = train_causal_syn(
        train, val, test, Config(**base, mesh_dp=2, mesh_edge=4),
        verbose=False)
    assert r2["best_val_acc"] == pytest.approx(r1["best_val_acc"], abs=1e-6)
    assert r2["test_acc_o"] == pytest.approx(r1["test_acc_o"], abs=1e-6)


def test_partitioned_train_matches_single(graphs):
    """Several full causal train steps on the combined (dp=2, edge=4) mesh
    reproduce single-device params (VERDICT.md round-1 item 1)."""
    gs = graphs[:8]
    ref_b = _ref_batch(gs)
    mesh, pb = _make_part(gs, dp=2, ne=4)
    pb = pb.__class__(**{
        **{f.name: getattr(pb, f.name)
           for f in pb.__dataclass_fields__.values()},
        "x": jnp.asarray(_scatter_x(np.asarray(ref_b.x), ref_b, pb)),
    })
    cfg = Config(model="CausalGCN", hidden=16, layers=2, layout="sparse",
                 batch_size=8, epochs=2)
    model = get_model(cfg, 0, 3)
    tx = make_optimizer(cfg.lr, cfg.min_lr, cfg.epochs, 1, 0.0)
    rng = jax.random.PRNGKey(0)
    state1 = init_state(model, tx, ref_b, rng)
    state2 = jax.tree.map(jnp.copy, state1)

    step = make_causal_train_step(model, tx, cfg.c, cfg.o, cfg.co, True)
    pb_s = shard_batch(pb, mesh)
    state2 = replicate(state2, mesh)
    for i in range(3):
        k = jax.random.fold_in(rng, 100 + i)
        state1, m1 = step(state1, ref_b, k)
        state2, m2 = step(state2, pb_s, k)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    assert int(m1["n"]) == int(m2["n"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5),
        state1.params, state2.params,
    )
    ev1 = make_causal_eval_step(model, False)(state1, ref_b, rng)
    ev2 = make_causal_eval_step(model, False)(state2, pb_s, rng)
    assert int(ev1["n"]) == int(ev2["n"])
    assert int(ev1["correct_o"]) == int(ev2["correct_o"])
