"""TU parser / FeatureExpander / real-data protocol tests."""
import os

import numpy as np
import pytest

from cal_tpu.data.datasets import create_n_filter_triples, get_dataset, parse_feat_str
from cal_tpu.data.feature_expansion import FeatureExpander
from cal_tpu.data.tu import read_tu_data, split_graphs


def write_toy_tu(root, name="TOY"):
    """6 graphs: 3 triangles (label 7) and 3 paths of 4 nodes (label 9),
    with 2-dim attributes and 1-column node labels."""
    raw = os.path.join(root, name, "raw")
    os.makedirs(raw, exist_ok=True)
    A, gi, nl, na = [], [], [], []
    off = 0
    ys = []
    for g in range(6):
        tri = g < 3
        n = 3 if tri else 4
        edges = ([(0, 1), (1, 2), (2, 0)] if tri else [(0, 1), (1, 2), (2, 3)])
        for u, v in edges:
            A.append((off + u + 1, off + v + 1))
            A.append((off + v + 1, off + u + 1))
        # duplicate first edge to exercise coalesce
        A.append((off + 1, off + 2))
        for i in range(n):
            gi.append(g + 1)
            nl.append(5 if i == 0 else 6)       # labels {5,6} -> one-hot 2
            na.append((float(i), float(g)))
        ys.append(7 if tri else 9)
        off += n
    pre = os.path.join(raw, name + "_")
    with open(pre + "A.txt", "w") as f:
        f.writelines(f"{r}, {c}\n" for r, c in A)
    with open(pre + "graph_indicator.txt", "w") as f:
        f.writelines(f"{v}\n" for v in gi)
    with open(pre + "graph_labels.txt", "w") as f:
        f.writelines(f"{v}\n" for v in ys)
    with open(pre + "node_labels.txt", "w") as f:
        f.writelines(f"{v}\n" for v in nl)
    with open(pre + "node_attributes.txt", "w") as f:
        f.writelines(f"{a}, {b}\n" for a, b in na)
    return raw


def test_read_tu_data(tmp_path):
    raw = write_toy_tu(str(tmp_path))
    d = read_tu_data(raw, "TOY")
    assert d.y.tolist() == [0, 0, 0, 1, 1, 1]          # {7,9} -> {0,1}
    assert d.x.shape == (3 * 3 + 3 * 4, 2 + 2)          # attrs + one-hot
    assert d.num_node_attributes == 2 and d.num_node_labels == 2
    # coalesce removed the duplicated (1,2) edge: 6 per triangle, 6 per path
    assert d.edge_index.shape[1] == 3 * 6 + 3 * 6
    graphs = split_graphs(d)
    assert len(graphs) == 6
    x0, e0, y0 = graphs[0]
    assert x0.shape == (3, 4) and y0 == 0
    assert e0.min() == 0 and e0.max() == 2               # local ids
    x5, e5, y5 = graphs[5]
    assert x5.shape == (4, 4) and y5 == 1 and e5.shape[1] == 6
    # node labels one-hot: first node of each graph is label 5 -> column 2
    assert x0[0, 2] == 1.0 and x0[1, 3] == 1.0
    # use_node_attr=False strips the 2 attribute columns
    assert split_graphs(d, use_node_attr=False)[0][0].shape == (3, 2)


def test_feature_expander_deg_odeg():
    # path 0-1-2: degrees 1,2,1
    e = np.array([[0, 1, 1, 2], [1, 0, 2, 1]])
    fe = FeatureExpander(degree=True, onehot_maxdeg=2, AK=0)
    x, e2, _ = fe.transform(None, e, 3)
    # [ones ‖ deg ‖ onehot(3)]
    np.testing.assert_allclose(x[:, 0], 1.0)
    np.testing.assert_allclose(x[:, 1], [1, 2, 1])
    np.testing.assert_allclose(x[:, 2:], [[0, 1, 0], [0, 0, 1], [0, 1, 0]])
    np.testing.assert_array_equal(e2, e)


def test_feature_expander_akx_norm():
    # single undirected edge 0-1 + diag 1e-8 self loops
    e = np.array([[0, 1], [1, 0]])
    fe = FeatureExpander(degree=False, onehot_maxdeg=None, AK=1)
    x_in = np.array([[1.0], [3.0]], np.float32)
    x, _, _ = fe.transform(x_in, e, 2)
    d = 1.0 + 1e-8
    expect0 = (1 / d) * 3.0 + (1e-8 / d) * 1.0    # from node1 + self
    expect1 = (1 / d) * 1.0 + (1e-8 / d) * 3.0
    np.testing.assert_allclose(x[:, 1], [expect0, expect1], rtol=1e-5)


def test_feature_expander_remove_edges_and_noise():
    e = np.array([[0, 1, 1, 2], [1, 0, 2, 1]])
    fe = FeatureExpander(remove_edges="nonself", AK=0, onehot_maxdeg=None)
    _, e2, _ = fe.transform(None, e, 3)
    np.testing.assert_array_equal(e2, [[0, 1, 2], [0, 1, 2]])
    fe = FeatureExpander(remove_edges="all", AK=0, onehot_maxdeg=None)
    _, e3, _ = fe.transform(None, e, 3)
    assert e3.shape == (2, 0)
    fe = FeatureExpander(edge_noises_delete=0.5, AK=0, onehot_maxdeg=None)
    _, e4, _ = fe.transform(None, e, 3)
    assert e4.shape[1] == 2
    fe = FeatureExpander(edge_noises_add=0.5, AK=0, onehot_maxdeg=None)
    _, e5, _ = fe.transform(None, e, 3)
    assert e5.shape[1] == 6


def test_feature_expander_group_degree():
    # star 0-{1,2,3} plus chain 3-4 plus isolated node 5:
    # degrees 3,1,1,2,1,0
    e = np.array([[0, 1, 0, 2, 0, 3, 3, 4],
                  [1, 0, 2, 0, 3, 0, 4, 3]])
    fe = FeatureExpander(degree=True, onehot_maxdeg=None, AK=0,
                         remove_edges="all", group_degree=2)
    x, e2, xg = fe.transform(None, e, 6)
    assert e2.shape == (2, 0)
    # features pre-grouping are [1, deg]; deg-1 group = nodes {1,2,4},
    # deg-2 group = {3}; survivors deg>2 = {0}; deg-0 node 5 dropped
    np.testing.assert_allclose(x, [[1.0, 3.0]])
    np.testing.assert_allclose(xg, [[3, 1, 1, 1, 1, 2]])

    # group_degree=3 leaves no survivors -> single zero row; group 3 = {0}
    fe = FeatureExpander(degree=True, onehot_maxdeg=None, AK=0,
                         remove_edges="all", group_degree=3)
    x, _, xg = fe.transform(None, e, 6)
    np.testing.assert_allclose(x, [[0.0, 0.0]])
    np.testing.assert_allclose(xg, [[3, 1, 1, 1, 1, 2, 1, 1, 3]])

    # an empty group (no deg-1 nodes) contributes [count=0, zeros]:
    # triangle 0-1-2, all degrees 2
    e1 = np.array([[0, 1, 1, 2, 2, 0], [1, 0, 2, 1, 0, 2]])
    fe = FeatureExpander(degree=True, onehot_maxdeg=None, AK=0,
                         remove_edges="all", group_degree=2)
    x, _, xg = fe.transform(None, e1, 3)
    np.testing.assert_allclose(x, [[0.0, 0.0]])
    np.testing.assert_allclose(xg, [[0, 0, 0, 3, 1, 2]])


def test_parse_feat_str_and_triples():
    f = parse_feat_str("deg+odeg100+ak3+reall")
    assert f["degree"] and f["onehot_maxdeg"] == 100 and f["AK"] == 3
    assert f["remove_edges"] == "all"
    assert parse_feat_str("odeg10+randa0.2")["edge_noises_add"] == 0.2
    t = create_n_filter_triples(["DD"], ["deg+odeg100+ak3"], ["CausalGAT"])
    assert t == [("DD", "deg+odeg10+ak1", "CausalGAT")]
    t = create_n_filter_triples(["REDDIT-BINARY"])
    assert t == [("REDDIT-BINARY", "deg+odeg10", "ResGCN")]


def test_get_dataset_and_causal_real_smoke(tmp_path):
    write_toy_tu(str(tmp_path))
    ds = get_dataset("TOY", feat_str="deg+odeg4", root=str(tmp_path))
    assert ds.num_classes == 2
    assert ds.num_features == 4 + 1 + 5    # raw + deg + onehot(4+1)
    # cache round-trip
    ds2 = get_dataset("TOY", feat_str="deg+odeg4", root=str(tmp_path))
    assert len(ds2) == 6

    from cal_tpu.train.causal import train_causal_real
    from cal_tpu.utils.config import Config

    cfg = Config(model="CausalGAT", hidden=8, layers=1, batch_size=4,
                 epochs=2, folds=3, dataset="TOY", layout="sparse")
    res = train_causal_real(ds, ds.num_classes, cfg, verbose=False)
    assert 0.0 <= res["test_acc_mean"] <= 1.0
    assert res["selected_epoch"] in (1, 2)


def test_group_degree_xg_survives_cache(tmp_path):
    """groupd feat_str: xg is materialized on HostGraph and survives the
    pickle cache round trip (tu.py _CACHE_VERSION 3)."""
    write_toy_tu(str(tmp_path))
    for _ in range(2):  # second pass loads the processed cache
        ds = get_dataset("TOY", feat_str="deg+groupd2+reall",
                         root=str(tmp_path))
        for g in ds:
            assert g.xg is not None
            assert g.xg.shape[0] == 1
            # [count ‖ mean-feats] per degree group, flattened
            assert g.xg.shape[1] % 2 == 0


def test_pruning_percent(tmp_path):
    """pruning_percent drops undirected edge pairs before feature
    expansion, caches under a separate data_*_XX file, and is
    deterministic (reference tu_dataset.py:29-33 intent — the reference's
    own path loads a cache nothing writes; see cal_tpu/data/tu.py)."""
    from cal_tpu.data.tu import TUDataset, prune_edges

    write_toy_tu(str(tmp_path))
    base = get_dataset("TOY", feat_str="deg", root=str(tmp_path))
    pruned = get_dataset("TOY", feat_str="deg", root=str(tmp_path),
                         pruning_percent=0.5)
    e_base = sum(g.senders.shape[0] for g in base)
    e_pruned = sum(g.senders.shape[0] for g in pruned)
    assert 0 < e_pruned < e_base
    # separate cache file, reference suffix convention
    assert os.path.exists(os.path.join(
        str(tmp_path), "TOY", "processed", "data_deg_50.pkl"))
    # deterministic: a reload (cache hit) and a fresh re-process agree
    again = get_dataset("TOY", feat_str="deg", root=str(tmp_path),
                        pruning_percent=0.5)
    for a, b in zip(pruned, again):
        np.testing.assert_array_equal(a.senders, b.senders)
    # mirror-consistency: prune_edges keeps both directions together
    rng = np.random.default_rng(0)
    e = np.array([[0, 1, 1, 2, 2, 3], [1, 0, 2, 1, 3, 2]])
    out = prune_edges(e, 0.5, rng)
    pairs = {tuple(sorted(p)) for p in out.T.tolist()}
    assert out.shape[1] == 2 * len(pairs)  # every kept edge has its mirror
