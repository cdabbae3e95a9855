"""Model-level tests: layout agreement, intervention semantics, shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cal_tpu.data.loader import Loader, compute_budgets
from cal_tpu.graph import PackedDenseBatch, to_dense
from cal_tpu.models.causal import CausalGNN, intervention_permutation
from cal_tpu.models.factory import get_model
from cal_tpu.utils.config import Config

MODELS = ["CausalGCN", "CausalGIN", "CausalGAT", "GCN", "GIN", "GAT"]


def _first_batch(graphs, layout, bs=8):
    budgets = compute_budgets(graphs, bs, layout)
    loader = Loader(graphs, bs, layout=layout, budgets=budgets)
    b = next(iter(loader))
    return to_dense(b) if isinstance(b, PackedDenseBatch) else b


@pytest.mark.parametrize("name", MODELS)
@pytest.mark.slow
def test_dense_sparse_agree(name, graphs):
    cfg = Config(model=name, hidden=16, layers=2)
    model = get_model(cfg, 0, 3)
    causal = name.startswith("Causal")
    kwargs = {"eval_random": False} if causal else {}
    outs = []
    for layout in ("dense", "sparse"):
        g = _first_batch(graphs, layout)
        rngs = {"params": jax.random.PRNGKey(0),
                "intervention": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2)}
        variables = model.init(rngs, g, train=False, **kwargs)
        out = model.apply(variables, g, train=False, **kwargs)
        outs.append(out if causal else (out,))
    for a, b in zip(*outs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_intervention_permutation_properties():
    mask = jnp.array([True] * 5 + [False] * 3)
    perms = set()
    for i in range(20):
        p = np.asarray(intervention_permutation(jax.random.PRNGKey(i), mask))
        # real prefix maps onto exactly the real graphs
        assert sorted(p[:5].tolist()) == [0, 1, 2, 3, 4]
        # padded tail maps onto padded slots
        assert sorted(p[5:].tolist()) == [5, 6, 7]
        perms.add(tuple(p[:5].tolist()))
    assert len(perms) > 5  # actually random


def test_eval_random_false_is_identity(graphs):
    """eval default (opts.py:33): co-branch = deterministic f(xc + xo)."""
    cfg = Config(model="CausalGCN", hidden=16, layers=1)
    model = get_model(cfg, 0, 3)
    g = _first_batch(graphs, "dense")
    rngs = {"params": jax.random.PRNGKey(0)}
    variables = model.init({**rngs, "intervention": jax.random.PRNGKey(1)},
                           g, eval_random=False, train=False)
    o1 = model.apply(variables, g, eval_random=False, train=False,
                     rngs={"intervention": jax.random.PRNGKey(10)})
    o2 = model.apply(variables, g, eval_random=False, train=False,
                     rngs={"intervention": jax.random.PRNGKey(99)})
    for a, b in zip(o1, o2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_random_true_shuffles(graphs):
    cfg = Config(model="CausalGCN", hidden=16, layers=1)
    model = get_model(cfg, 0, 3)
    g = _first_batch(graphs, "dense")
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "intervention": jax.random.PRNGKey(1)},
        g, eval_random=True, train=False)
    outs = [
        np.asarray(model.apply(variables, g, eval_random=True, train=False,
                               rngs={"intervention": jax.random.PRNGKey(k)})[2])
        for k in (10, 99)
    ]
    assert np.abs(outs[0] - outs[1]).max() > 1e-6


def test_padding_invariance(graphs):
    """Same graphs under a larger node budget -> identical logits."""
    cfg = Config(model="CausalGCN", hidden=16, layers=2)
    model = get_model(cfg, 0, 3)
    outs = []
    for budget_pad in (0, 13):
        budgets = compute_budgets(graphs, 8, "dense")
        budgets["node_budget"] += budget_pad
        loader = Loader(graphs, 8, layout="dense", budgets=budgets)
        g = to_dense(next(iter(loader)))
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "intervention": jax.random.PRNGKey(1)},
            g, eval_random=False, train=False)
        outs.append(model.apply(variables, g, eval_random=False, train=False))
    for a, b in zip(*outs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_without_attention_ablations(graphs):
    """CausalGCN ablation flags produce constant 0.5 attention — and run on
    any backend (the reference hardcodes .cuda(), model.py:100,107)."""
    g = _first_batch(graphs, "dense")
    for flags in ({"without_edge_attention": True},
                  {"without_node_attention": True}):
        model = CausalGNN(backbone="gcn", hidden=16, num_classes=3,
                          num_layers=1, **flags)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "intervention": jax.random.PRNGKey(1)},
            g, eval_random=False, train=False)
        out = model.apply(variables, g, eval_random=False, train=False)
        assert all(np.isfinite(np.asarray(o)).all() for o in out)


@pytest.mark.parametrize("name", MODELS)
@pytest.mark.slow
def test_bf16_mixed_precision_close_to_f32(name, graphs):
    """cfg.dtype='bfloat16' runs the conv stack in bf16 (f32 BN/pool/readout)
    and stays close to the f32 forward."""
    causal = name.startswith("Causal")
    kwargs = {"eval_random": False} if causal else {}
    g = _first_batch(graphs, "dense")
    rngs = {"params": jax.random.PRNGKey(0),
            "intervention": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    outs = []
    for dtype in ("float32", "bfloat16"):
        cfg = Config(model=name, hidden=16, layers=2, dtype=dtype)
        model = get_model(cfg, 0, 3)
        variables = model.init(rngs, g, train=False, **kwargs)
        out = model.apply(variables, g, train=False, **kwargs)
        outs.append(out if causal else (out,))
    for a, b in zip(*outs):
        assert np.asarray(b).dtype == np.float32  # log-probs stay f32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.1, atol=0.1)


def test_sparse_tiled_factored_matches_plain(graphs):
    """CausalGCN on the sparse layout with block-COO tiles + factored
    sigmoid weights (the r3 tile-order fused masked conv,
    ops/pallas_spmm.py gcn_aggregate_sparse_sigmoid_pallas) must match the
    no-tiles segment path."""
    cfg = Config(model="CausalGCN", hidden=16, layers=2)
    model = get_model(cfg, 0, 3)
    budgets = compute_budgets(graphs, 8, "sparse")
    outs = []
    for tiles in (False, True):
        loader = Loader(graphs, 8, layout="sparse", budgets=dict(budgets),
                        spmm_tiles=tiles)
        g = next(iter(loader))
        if tiles:
            assert g.tiles is not None and g.tiles[0].sglb is not None
        rngs = {"params": jax.random.PRNGKey(0),
                "intervention": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2)}
        variables = model.init(rngs, g, train=False, eval_random=False)
        outs.append(model.apply(variables, g, train=False,
                                eval_random=False))
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_causalgin_irm_return(graphs):
    """train_type='irm' (gin only): o-branch returns (logits, log_probs)
    with log_probs == log_softmax(logits) == the base call's o-branch
    (reference model.py:234,283-291)."""
    cfg = Config(model="CausalGIN", hidden=16, layers=1)
    model = get_model(cfg, 0, 3)
    g = _first_batch(graphs, "dense")
    rngs = {"params": jax.random.PRNGKey(0),
            "intervention": jax.random.PRNGKey(1)}
    variables = model.init(rngs, g, train=False, eval_random=False)
    _, o_base, _ = model.apply(variables, g, train=False, eval_random=False)
    _, o_irm, _ = model.apply(variables, g, train=False, eval_random=False,
                              train_type="irm")
    feats, logis = o_irm
    np.testing.assert_allclose(np.asarray(logis), np.asarray(o_base),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jax.nn.log_softmax(feats, axis=-1)),
        np.asarray(logis), rtol=1e-5, atol=1e-6)
