"""Native C++ packer: build, parity vs NumPy reference, loader integration."""
import numpy as np

from cal_tpu.data.loader import Loader, compute_budgets
from cal_tpu.graph import batch_graphs, pack_dense
from cal_tpu.native import PackedDataset, get_lib


def test_native_lib_builds():
    assert get_lib() is not None, "C++ packer failed to build (g++ present?)"


def test_native_dense_pack_matches_numpy(graphs):
    pd = PackedDataset(graphs)
    idx = np.array([3, 1, 7, 2], np.int32)
    nb, eb = 32, 512
    x_n, ef_n, nn_n, y_n = pd.pack_dense(idx, 8, nb, eb)
    # independent reference: graph.pack_dense on the same chunk
    ref = pack_dense([graphs[i] for i in idx], 8, nb, eb)
    np.testing.assert_array_equal(x_n, np.asarray(ref.x))
    np.testing.assert_array_equal(ef_n, np.asarray(ref.edge_flat))
    np.testing.assert_array_equal(nn_n, np.asarray(ref.n_nodes))
    np.testing.assert_array_equal(y_n, np.asarray(ref.y))


def test_native_sparse_pack_matches_numpy(graphs):
    pd = PackedDataset(graphs)
    idx = np.array([0, 4, 9], np.int32)
    nb, eb = 128, 512
    x, s, r, em, nm, ng, y, gm = pd.pack_sparse(idx, 4, nb, eb)
    ref = batch_graphs([graphs[i] for i in idx], 4, nb, eb)
    np.testing.assert_array_equal(x, np.asarray(ref.x))
    # PackedDataset presorts edges by (recv, send); batch_graphs keeps the
    # original within-receiver order — compare as sorted (recv, send) pairs
    # (order within a receiver is semantically irrelevant to segment ops).
    def pairs(ss, rr, mm):
        real = np.asarray(mm).astype(bool)
        p = np.stack([np.asarray(rr)[real], np.asarray(ss)[real]], 1)
        return p[np.lexsort((p[:, 1], p[:, 0]))]
    np.testing.assert_array_equal(pairs(s, r, em), pairs(ref.senders, ref.receivers, ref.edge_mask))
    assert np.asarray(r)[np.asarray(em).astype(bool)].tolist() == sorted(
        np.asarray(r)[np.asarray(em).astype(bool)].tolist())  # receiver-sorted
    np.testing.assert_array_equal(nm, np.asarray(ref.node_mask))
    np.testing.assert_array_equal(ng, np.asarray(ref.node_graph))
    np.testing.assert_array_equal(y, np.asarray(ref.y))
    np.testing.assert_array_equal(gm, np.asarray(ref.graph_mask))


def test_loader_prefetch_equals_sync(graphs):
    budgets = compute_budgets(graphs, 4, "dense")
    a = list(Loader(graphs, 4, layout="dense", budgets=budgets, prefetch=2))
    b = list(Loader(graphs, 4, layout="dense", budgets=budgets, prefetch=0))
    assert len(a) == len(b) == 3
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(ba.x), np.asarray(bb.x))
        np.testing.assert_array_equal(
            np.asarray(ba.edge_flat), np.asarray(bb.edge_flat))


def test_budget_overflow_raises(graphs):
    pd = PackedDataset(graphs)
    idx = np.arange(10, dtype=np.int32)
    try:
        pd.pack_dense(idx, 10, 4, 64)     # node budget too small
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
