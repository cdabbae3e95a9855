"""Budget-packed sparse batching (data/loader.py pack mode) — the
heavy-tailed-dataset layout (REDDIT/DD scale, VERDICT r3 missing #1)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cal_tpu.data.loader import Loader, compute_budgets, compute_packed_budgets
from cal_tpu.models.factory import get_model
from cal_tpu.train.optim import make_optimizer
from cal_tpu.train.steps import (
    init_state,
    make_causal_train_epoch,
    make_causal_train_step,
    stack_batches_host,
    to_device,
)
from cal_tpu.utils.config import Config

from conftest import random_host_graph


@pytest.fixture
def heavy_graphs(rng):
    """Heavy-tailed sizes: mostly small graphs plus a few giants."""
    gs = [random_host_graph(rng, n_min=5, n_max=15) for _ in range(40)]
    gs += [random_host_graph(rng, n_min=60, n_max=90) for _ in range(4)]
    rng.shuffle(gs)
    return gs


def test_packed_budgets_smaller_than_worst_case(heavy_graphs):
    worst = compute_budgets(heavy_graphs, 8, "sparse")
    packed = compute_packed_budgets(heavy_graphs, 8)
    assert packed["pack"] is True
    assert packed["node_budget"] < worst["node_budget"]
    # a single giant graph must still fit
    assert packed["node_budget"] > max(g.num_nodes for g in heavy_graphs)


def test_pack_epoch_covers_every_graph_once(heavy_graphs):
    budgets = compute_packed_budgets(heavy_graphs, 8)
    loader = Loader(heavy_graphs, 8, shuffle=True, layout="sparse",
                    budgets=budgets, seed=3)
    for _ in range(3):  # several shuffles
        chunks = loader._chunks()
        assert len(chunks) == len(loader)
        seen = np.concatenate([c for c in chunks if c.size])
        assert sorted(seen.tolist()) == list(range(len(heavy_graphs)))
        for c in chunks:
            assert c.size <= 8
            assert sum(heavy_graphs[j].num_nodes for j in c) <= (
                budgets["node_budget"])
            assert sum(heavy_graphs[j].num_edges for j in c) <= (
                budgets["edge_budget"])


def test_pack_batches_static_shapes_and_masked_pads(heavy_graphs):
    budgets = compute_packed_budgets(heavy_graphs, 8)
    loader = Loader(heavy_graphs, 8, shuffle=False, layout="sparse",
                    budgets=budgets)
    batches = list(loader.host_batches())
    assert len(batches) == len(loader)
    shapes = {tuple(np.shape(l) for l in jax.tree.leaves(b))
              for b in batches}
    assert len(shapes) == 1
    # the +1 slack batch is fully masked
    assert batches[-1].graph_mask.sum() == 0
    total = sum(int(b.graph_mask.sum()) for b in batches)
    assert total == len(heavy_graphs)


def test_masked_pad_batch_is_training_noop(heavy_graphs):
    """A fully-masked batch must leave params/opt_state/batch_stats/step
    bit-identical (train/steps.py _gate_state)."""
    cfg = Config(model="CausalGCN", hidden=16, layers=2, layout="sparse",
                 batch_size=8)
    budgets = compute_packed_budgets(heavy_graphs, 8)
    loader = Loader(heavy_graphs, 8, shuffle=False, layout="sparse",
                    budgets=budgets)
    batches = list(loader.host_batches())
    pad = to_device(batches[-1])
    assert int(np.asarray(pad.graph_mask).sum()) == 0
    model = get_model(cfg, 0, 3)
    tx = make_optimizer(cfg.lr, cfg.min_lr, 2, loader.schedule_steps, 0.0)
    rng = jax.random.PRNGKey(0)
    state = init_state(model, tx, to_device(batches[0]), rng)
    step = make_causal_train_step(model, tx, cfg.c, cfg.o, cfg.co, True)
    s2, m = step(jax.tree.map(jnp.copy, state), pad, rng)
    assert int(m["n"]) == 0
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        (state.params, state.opt_state, state.batch_stats, state.step),
        (s2.params, s2.opt_state, s2.batch_stats, s2.step),
    )


def test_pack_epoch_matches_epoch_without_pads(heavy_graphs):
    """Scanning the packed epoch (with trailing masked pads) must produce
    exactly the same final state as scanning only the real batches."""
    cfg = Config(model="CausalGCN", hidden=16, layers=2, layout="sparse",
                 batch_size=8)
    budgets = compute_packed_budgets(heavy_graphs, 8)
    loader = Loader(heavy_graphs, 8, shuffle=False, layout="sparse",
                    budgets=budgets)
    batches = list(loader.host_batches())
    real = [b for b in batches if int(b.graph_mask.sum()) > 0]
    assert len(real) < len(batches)
    model = get_model(cfg, 0, 3)
    tx = make_optimizer(cfg.lr, cfg.min_lr, 2, loader.schedule_steps, 0.0)
    rng = jax.random.PRNGKey(0)
    state = init_state(model, tx, to_device(batches[0]), rng)
    # skip_empty=True is the production packed path (pad steps lax.cond'd
    # away); it must match both the gated path and the pad-free stack
    # bit-for-bit.
    finals = []
    for skip in (False, True):
        epoch = make_causal_train_epoch(model, tx, cfg.c, cfg.o, cfg.co,
                                        True, skip_empty=skip)
        sa, ma = epoch(jax.tree.map(jnp.copy, state),
                       to_device(stack_batches_host(batches)), rng)
        assert int(ma["n"]) == len(heavy_graphs)
        finals.append(sa)
    epoch = make_causal_train_epoch(model, tx, cfg.c, cfg.o, cfg.co, True)
    sb, mb = epoch(jax.tree.map(jnp.copy, state),
                   to_device(stack_batches_host(real)), rng)
    assert int(mb["n"]) == len(heavy_graphs)
    for sa in finals:
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            sa.params, sb.params,
        )


def test_pack_trains_end_to_end(heavy_graphs):
    from cal_tpu.train.causal import train_causal_syn

    cfg = Config(model="CausalGCN", hidden=16, layers=2, layout="sparse",
                 batch_size=8, epochs=2, pack_batches="true", num_classes=3)
    out = train_causal_syn(heavy_graphs[:32], heavy_graphs[32:38],
                           heavy_graphs[38:], cfg, verbose=False)
    assert np.isfinite(out["best_val_acc"])


def test_pack_with_tiles_matches_plain(heavy_graphs):
    """Budget-packed batching + block-COO tile plans (the SYNREDDIT
    production combination, r4): forward/losses must match the same
    packed batches without tiles."""
    from cal_tpu.train.steps import make_causal_eval_step

    cfg = Config(model="CausalGCN", hidden=16, layers=2, layout="sparse",
                 batch_size=8)
    budgets = compute_packed_budgets(heavy_graphs, 8)
    l_plain = Loader(heavy_graphs, 8, shuffle=False, layout="sparse",
                     budgets=dict(budgets), spmm_tiles=False)
    l_tiled = Loader(heavy_graphs, 8, shuffle=False, layout="sparse",
                     budgets=dict(budgets), spmm_tiles=True)
    assert l_tiled.spmm_tiles
    assert len(l_plain) == len(l_tiled)
    model = get_model(cfg, 0, 3)
    tx = make_optimizer(cfg.lr, cfg.min_lr, 2, l_plain.schedule_steps, 0.0)
    rng = jax.random.PRNGKey(0)
    b0 = next(iter(l_plain))
    state = init_state(model, tx, b0, rng)
    ev = make_causal_eval_step(model, False)
    for bp, bt in zip(l_plain, l_tiled):
        assert (bt.tiles is not None) or int(
            np.asarray(bt.graph_mask).sum()) >= 0
        mp = ev(state, bp, rng)
        mt = ev(state, bt, rng)
        assert int(mp["n"]) == int(mt["n"])
        assert int(mp["correct_o"]) == int(mt["correct_o"])


def test_pack_eval_skip_empty_matches(heavy_graphs):
    """Eval sweep over a packed stack (with pad batches): skip_empty=True
    must produce the same counts as the gated sweep and as the pad-free
    stack."""
    from cal_tpu.train.steps import make_causal_eval_epoch

    cfg = Config(model="CausalGCN", hidden=16, layers=2, layout="sparse",
                 batch_size=8)
    budgets = compute_packed_budgets(heavy_graphs, 8)
    loader = Loader(heavy_graphs, 8, shuffle=False, layout="sparse",
                    budgets=budgets)
    batches = list(loader.host_batches())
    real = [b for b in batches if int(b.graph_mask.sum()) > 0]
    assert len(real) < len(batches)
    model = get_model(cfg, 0, 3)
    tx = make_optimizer(cfg.lr, cfg.min_lr, 2, loader.schedule_steps, 0.0)
    rng = jax.random.PRNGKey(0)
    state = init_state(model, tx, to_device(batches[0]), rng)
    outs = []
    for skip, stack in ((False, batches), (True, batches), (False, real)):
        sweep = make_causal_eval_epoch(model, False, skip_empty=skip)
        outs.append(sweep(state, to_device(stack_batches_host(stack)), rng))
    for o in outs[1:]:
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            outs[0], o)
