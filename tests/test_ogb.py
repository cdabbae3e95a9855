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
