"""OGB local-directory loader: fixture round-trip + training smoke."""
import gzip
import os

import numpy as np
import pytest

from cal_tpu.data.ogb import get_ogb_dataset, load_ogb_graphs, load_ogb_split


def _write(path, lines, gz=True):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    opener = (lambda p: gzip.open(p + ".gz", "wt")) if gz else (
        lambda p: open(p, "w"))
    with opener(path) as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture
def ogb_root(tmp_path, rng):
    """Tiny ogbg_toy dataset in the official raw CSV layout."""
    root = str(tmp_path)
    raw = os.path.join(root, "ogbg_toy", "raw")
    n_graphs, feat = 10, 4
    n_nodes = rng.integers(3, 8, size=n_graphs)
    graphs_edges, all_feats, edge_lines = [], [], []
    for n in n_nodes:
        # a directed ring: n edges, both valid node ids
        e = [(i, (i + 1) % n) for i in range(n)]
        graphs_edges.append(e)
        all_feats.append(rng.standard_normal((n, feat)))
        edge_lines += [f"{s},{r}" for s, r in e]
    labels = rng.integers(0, 2, size=n_graphs)
    _write(os.path.join(raw, "num-node-list.csv"), [str(n) for n in n_nodes])
    _write(os.path.join(raw, "num-edge-list.csv"),
           [str(len(e)) for e in graphs_edges])
    _write(os.path.join(raw, "edge.csv"), edge_lines)
    _write(os.path.join(raw, "node-feat.csv"),
           [",".join(f"{v:.6f}" for v in row)
            for g in all_feats for row in g], gz=False)  # mix .csv and .csv.gz
    _write(os.path.join(raw, "graph-label.csv"), [str(y) for y in labels])
    idx = rng.permutation(n_graphs)
    sp = os.path.join(root, "ogbg_toy", "split", "scaffold")
    _write(os.path.join(sp, "train.csv"), [str(i) for i in idx[:6]])
    _write(os.path.join(sp, "valid.csv"), [str(i) for i in idx[6:8]])
    _write(os.path.join(sp, "test.csv"), [str(i) for i in idx[8:]])
    return root, n_nodes, labels


def test_roundtrip(ogb_root):
    root, n_nodes, labels = ogb_root
    graphs = load_ogb_graphs(root, "ogbg_toy")
    assert len(graphs) == len(n_nodes)
    for g, n, y in zip(graphs, n_nodes, labels):
        assert g.num_nodes == n and g.num_edges == n and g.y == y
        assert g.x.shape == (n, 4)
        assert g.senders.max() < n and g.receivers.max() < n
    split = load_ogb_split(root, "ogbg_toy")
    all_idx = np.concatenate([split["train"], split["valid"], split["test"]])
    assert sorted(all_idx.tolist()) == list(range(len(n_nodes)))


def test_symmetrize_and_dash_name(ogb_root):
    root, n_nodes, _ = ogb_root
    graphs, split = get_ogb_dataset("ogbg-toy", root=root, symmetrize=True)
    assert graphs[0].num_edges == 2 * n_nodes[0]
    assert len(split["train"]) == 6


def test_trains_end_to_end(ogb_root):
    """CausalGCN trains one epoch on the OGB split via the standard loop."""
    from cal_tpu.train.causal import train_causal_syn
    from cal_tpu.utils.config import Config

    root, _, _ = ogb_root
    graphs, split = get_ogb_dataset("ogbg_toy", root=root, symmetrize=True)
    train = [graphs[i] for i in split["train"]]
    val = [graphs[i] for i in split["valid"]]
    test = [graphs[i] for i in split["test"]]
    cfg = Config(model="CausalGCN", hidden=8, layers=2, epochs=1,
                 batch_size=4, num_classes=2)
    out = train_causal_syn(train, val, test, cfg, verbose=False)
    assert 0.0 <= out["best_val_acc"] <= 1.0


def test_roc_auc_matches_reference_values():
    from cal_tpu.utils.metrics import roc_auc_score

    # hand-checked: pos scores {0.8, 0.4}, neg {0.3, 0.6}
    # pairs: (0.8>0.3), (0.8>0.6), (0.4>0.3), (0.4<0.6) -> 3/4
    assert roc_auc_score([1, 0, 1, 0], [0.8, 0.3, 0.4, 0.6]) == 0.75
    # perfect / inverted / ties
    assert roc_auc_score([0, 0, 1, 1], [0.1, 0.2, 0.8, 0.9]) == 1.0
    assert roc_auc_score([1, 1, 0, 0], [0.1, 0.2, 0.8, 0.9]) == 0.0
    assert roc_auc_score([0, 1], [0.5, 0.5]) == 0.5
    # tie group straddling classes: 0.5 credit per tied pair
    assert roc_auc_score([0, 1, 1, 0], [0.3, 0.3, 0.7, 0.7]) == 0.5
    # degenerate single-class input
    assert np.isnan(roc_auc_score([1, 1], [0.3, 0.7]))
    # monotone-transform invariance (log-probs vs probabilities)
    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, size=50)
    s = rng.random(50)
    assert roc_auc_score(y, s) == roc_auc_score(y, np.log(s))


def test_predict_causal_auc_pipeline(ogb_root):
    """predict_causal + roc_auc_score over the OGB test split (the official
    molhiv metric; VERDICT.md round-1 item 5)."""
    from cal_tpu.data.loader import Loader, compute_budgets
    from cal_tpu.models.factory import get_model
    from cal_tpu.train.causal import predict_causal, train_causal_syn
    from cal_tpu.utils.config import Config
    from cal_tpu.utils.metrics import roc_auc_score

    root, _, _ = ogb_root
    graphs, split = get_ogb_dataset("ogbg_toy", root=root, symmetrize=True)
    train = [graphs[i] for i in split["train"]]
    val = [graphs[i] for i in split["valid"]]
    test = [graphs[i] for i in split["test"]]
    cfg = Config(model="CausalGCN", hidden=8, layers=1, epochs=1,
                 batch_size=4, num_classes=2)
    out = train_causal_syn(train, val, test, cfg, verbose=False)
    model = get_model(cfg, 0, 2)
    budgets = compute_budgets(graphs, cfg.batch_size, cfg.layout)
    loader = Loader(test, cfg.batch_size, layout=cfg.layout, budgets=budgets)
    y, c_logs, o_logs, co_logs = predict_causal(model, out["state"], loader)
    assert y.shape[0] == len(test)
    assert o_logs.shape == (len(test), 2)
    auc = roc_auc_score(y, o_logs[:, 1])
    assert np.isnan(auc) or 0.0 <= auc <= 1.0
