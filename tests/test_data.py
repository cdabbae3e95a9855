"""Synthetic generator, bias split, k-fold, batchers."""
import numpy as np

from cal_tpu.data.kfold import k_fold, stratified_k_fold
from cal_tpu.data.synthetic import (
    SYN_CLASSES,
    dataset_bias_split,
    degree_onehot,
    generate_synthetic_dataset,
    make_graph,
)
from cal_tpu.graph import batch_graphs, pack_dense, to_dense


def test_generator_shapes_and_features(rng):
    g = make_graph("tree", "house", 0, node_num=15, max_degree=10,
                   noise=0.1, rng=rng)
    # balanced 15-ary tree of height 2 = 241 nodes + house 5 (utils.py:62-63)
    assert g.num_nodes == 246
    assert g.x.shape == (246, 10)
    assert (g.x.sum(1) == 1).all()  # one-hot
    g2 = make_graph("ba", "cycle", 1, node_num=15, max_degree=10,
                    noise=0.1, rng=rng)
    assert g2.num_nodes == 225 + 6

    # both directions present
    pairs = set(zip(g.senders.tolist(), g.receivers.tolist()))
    assert all((v, u) in pairs for u, v in pairs)


def test_bias_split_proportions():
    ds = generate_synthetic_dataset(data_num=100, seed=1)
    train, val, test, _the = dataset_bias_split(ds, bias=0.9, total=400, seed=0)
    # train: 70/10/20 split, 4 balanced-ish classes (utils.py:131-150,
    # int truncation included)
    assert 276 <= len(train) <= 280
    # test is 50/50 per class
    assert len(test) == 4 * 2 * int(20 * 0.5)
    # house graphs in train are ~90% tree context; tree basis graphs have
    # 241 basis nodes vs ba's 225, so context is recoverable by node count.
    house_train = [g for g in train if g.y == 0]
    tree_n = sum(1 for g in house_train if g.num_nodes > 240)
    assert tree_n / len(house_train) > 0.85
    # every test class is exactly balanced across contexts
    for label in range(4):
        cls = [g for g in test if g.y == label]
        tree_c = sum(1 for g in cls if g.num_nodes > 240)
        assert tree_c * 2 == len(cls)


def test_kfold_matches_sklearn():
    from sklearn.model_selection import StratifiedKFold

    labels = np.random.default_rng(3).integers(0, 3, 97)
    ours = stratified_k_fold(labels, 10, seed=12345)
    skf = StratifiedKFold(10, shuffle=True, random_state=12345)
    theirs = [test for _, test in skf.split(np.zeros(len(labels)), labels)]
    for a, b in zip(ours, theirs):
        np.testing.assert_array_equal(np.sort(a), np.sort(b))


def test_kfold_test_max_val_equals_test():
    labels = np.random.default_rng(4).integers(0, 2, 50)
    train_idx, test_idx, val_idx = k_fold(labels, 5, "test_max")
    for t, v, tr in zip(test_idx, val_idx, train_idx):
        np.testing.assert_array_equal(t, v)  # utils.py:25-26
        assert len(set(t) & set(tr)) == 0
        assert len(t) + len(tr) == 50


def test_batchers_agree(graphs):
    packed = pack_dense(graphs, 12, 24, 512)
    dense = to_dense(packed)
    sparse = batch_graphs(graphs, 12, 256, 512)
    # same number of real edges
    assert int(dense.adj.sum()) == int(sparse.edge_mask.sum())
    # node features land in the right slots
    off = 0
    for i, g in enumerate(graphs):
        n = g.num_nodes
        np.testing.assert_array_equal(np.asarray(dense.x[i, :n]), g.x)
        np.testing.assert_array_equal(np.asarray(sparse.x[off:off + n]), g.x)
        off += n
    # graph prefix invariant
    assert np.asarray(dense.graph_mask)[:10].all()
    assert not np.asarray(dense.graph_mask)[10:].any()


def test_degree_onehot_cap(rng):
    import networkx as nx

    g = nx.star_graph(20)  # hub has degree 20
    x = degree_onehot(g, 10)
    assert x[0, 9] == 1  # capped at max_degree-1 (featgen.py:26-28)
    assert x[1, 1] == 1


def test_motif_library_full(rng):
    """Every reference shape constructor (synthetic_structsim.py:12-204) is
    available, with parameterized specs mirroring ["name", *args] lists."""
    from cal_tpu.data.synthetic import _motif_edges

    # clique: K_n is complete; optional random edge removal
    n, edges = _motif_edges(("clique", 5), rng)
    assert n == 5 and len(edges) == 10
    n, edges = _motif_edges(("clique", 5, 3), rng)
    assert len(edges) == 7 and len(set(edges)) == 7
    # cycle: default 6, parameterized length
    assert _motif_edges("cycle")[0] == 6
    n, edges = _motif_edges(("cycle", 9))
    assert n == 9 and len(edges) == 9
    # tree: balanced r-ary of height h
    n, edges = _motif_edges(("tree", 2, 3))
    assert n == 13 and len(edges) == 12  # 1 + 3 + 9 nodes
    # ba: width nodes, connected, random
    n, edges = _motif_edges(("ba", 12, 2), rng)
    assert n == 12 and len(edges) == 10 * 2  # (width - m) * m for BA
    # grid: default 2x3, parameterized dims
    assert _motif_edges("grid") == _motif_edges(("grid", (2, 3)))
    n, edges = _motif_edges(("grid", (3, 4)))
    assert n == 12 and len(edges) == 3 * 3 + 2 * 4
    # house/diamond defaults unchanged
    assert _motif_edges("house")[0] == 5
    assert _motif_edges("diamond") == (6, [(i, (i + 1) % 6) for i in range(6)]
                                       + [(5, 1), (4, 2)])


def test_build_graph_tuple_spec(rng):
    """build_graph accepts parameterized motif specs (dead-path shapes in
    the reference, reachable here)."""
    from cal_tpu.data.synthetic import build_graph

    g = build_graph("ba", ("clique", 4), node_num=5, rng=rng)
    assert g.number_of_nodes() == 25 + 4


def test_feature_dim_const_features(rng):
    """reference utils.py:43-47: --feature_dim >= 0 switches node features
    to a per-graph uniform[0,1) constant vector of that size."""
    from cal_tpu.data.synthetic import make_graph

    g = make_graph("tree", "house", 0, 15, 10, 0.1, rng, feature_dim=8)
    assert g.x.shape == (g.num_nodes, 8)
    # constant across nodes within the graph
    assert np.allclose(g.x, g.x[0])
    assert (g.x >= 0).all() and (g.x < 1).all()
    # a second graph draws a different vector
    g2 = make_graph("tree", "house", 0, 15, 10, 0.1, rng, feature_dim=8)
    assert not np.allclose(g.x[0], g2.x[0])


def test_feature_dim_trains_end_to_end(rng):
    from cal_tpu.data.synthetic import (
        dataset_bias_split, generate_synthetic_dataset)
    from cal_tpu.train.causal import train_causal_syn
    from cal_tpu.utils.config import Config

    cfg = Config(model="CausalGCN", hidden=16, layers=2, epochs=2,
                 batch_size=8, feature_dim=8, data_num=8)
    ds = generate_synthetic_dataset(data_num=8, node_num=5, feature_dim=8)
    train, val, test, _ = dataset_bias_split(ds, bias=0.9, total=32)
    out = train_causal_syn(train, val, test, cfg, verbose=False)
    assert np.isfinite(out["best_val_acc"])
