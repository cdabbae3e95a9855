"""GCN aggregation parity: dense == sparse == a literal NumPy transliteration
of the reference norm formula (gcn_conv.py:44-70) with explicit self-loop
edge materialization."""
import jax.numpy as jnp
import numpy as np

from cal_tpu.graph import batch_graphs, pack_dense, to_dense
from cal_tpu.ops.gcn import gcn_aggregate_dense, gcn_aggregate_sparse


def numpy_gcn_reference(x, senders, receivers, edge_weight):
    """Reference semantics, PyG-1.1.0 conventions: edge (u=senders, v=receivers);
    remove self loops; append (n, n) loops w=1; deg over edge_index[0];
    aggregate messages at edge_index[1]."""
    n = x.shape[0]
    keep = senders != receivers
    u, v, w = senders[keep], receivers[keep], edge_weight[keep]
    u = np.concatenate([u, np.arange(n)])
    v = np.concatenate([v, np.arange(n)])
    w = np.concatenate([w, np.ones(n, w.dtype)])
    deg = np.zeros(n, np.float64)
    np.add.at(deg, u, w)
    dis = deg ** -0.5
    norm = dis[u] * w * dis[v]
    out = np.zeros_like(x, dtype=np.float64)
    np.add.at(out, v, norm[:, None] * x[u])
    return out


def test_gcn_sparse_matches_numpy(rng):
    n, e, h = 13, 40, 5
    x = rng.standard_normal((n, h)).astype(np.float32)
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    w = rng.random(e).astype(np.float32)
    ref = numpy_gcn_reference(x, senders, receivers, w)
    # receiver-sort for the kernel invariant
    order = np.argsort(receivers, kind="stable")
    out = gcn_aggregate_sparse(
        jnp.asarray(x),
        jnp.asarray(senders[order]),
        jnp.asarray(receivers[order]),
        jnp.ones(e, bool),
        jnp.asarray(w[order]),
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_gcn_dense_matches_numpy(rng):
    n, e, h = 11, 30, 4
    x = rng.standard_normal((n, h)).astype(np.float32)
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    # dense: duplicate edges share one weight -> build weights per (r, s) pair
    wmat = rng.random((n, n)).astype(np.float32)
    w = wmat[receivers, senders]
    ref = numpy_gcn_reference(x, senders, receivers, w)
    adj = np.zeros((1, n, n), np.float32)
    np.add.at(adj[0], (receivers, senders), 1.0)
    out = gcn_aggregate_dense(
        jnp.asarray(x[None]), jnp.asarray(adj), jnp.asarray(wmat[None])
    )
    np.testing.assert_allclose(np.asarray(out[0]), ref, rtol=1e-5, atol=1e-5)


def test_gcn_dense_vs_sparse_batched(graphs):
    """Whole-batch agreement through both batchers (padding invariance)."""
    h = graphs[0].x.shape[1]
    packed = pack_dense(graphs, 12, 24, 512)
    dense = to_dense(packed)
    out_d = gcn_aggregate_dense(dense.x, dense.adj)

    sparse = batch_graphs(graphs, 12, 256, 512)
    out_s = gcn_aggregate_sparse(
        sparse.x, sparse.senders, sparse.receivers, sparse.edge_mask
    )
    # re-scatter the sparse output into the dense [B, N] layout
    off = 0
    for i, g in enumerate(graphs):
        n = g.num_nodes
        np.testing.assert_allclose(
            np.asarray(out_d[i, :n]),
            np.asarray(out_s[off : off + n]),
            rtol=1e-5,
            atol=1e-5,
        )
        off += n
