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
