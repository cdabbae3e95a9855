"""GAT parity: dense == sparse == literal NumPy PyG-1.1.0 GATConv."""
import jax.numpy as jnp
import numpy as np

from cal_tpu.ops.gat import NEG_SLOPE, gat_aggregate_dense, gat_aggregate_sparse


def leaky(x):
    return np.where(x > 0, x, NEG_SLOPE * x)


def numpy_gat_reference(xh, senders, receivers, att_dst, att_src):
    """xh [n, H, d]; explicit self-loop materialization + grouped softmax."""
    n = xh.shape[0]
    keep = senders != receivers
    u = np.concatenate([senders[keep], np.arange(n)])
    v = np.concatenate([receivers[keep], np.arange(n)])
    # alpha_e = leaky_relu(att_dst . xh_v + att_src . xh_u)
    ti = (xh * att_dst).sum(-1)  # [n, H]
    tj = (xh * att_src).sum(-1)
    score = leaky(ti[v] + tj[u])  # [E, H]
    out = np.zeros_like(xh)
    for node in range(n):
        idx = np.nonzero(v == node)[0]
        s = score[idx]  # [k, H]
        a = np.exp(s - s.max(0)) / np.exp(s - s.max(0)).sum(0)
        out[node] = (a[:, :, None] * xh[u[idx]]).sum(0)
    return out


def test_gat_sparse_matches_numpy(rng):
    n, e, heads, d = 9, 25, 3, 4
    xh = rng.standard_normal((n, heads, d)).astype(np.float32)
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    att_dst = rng.standard_normal((heads, d)).astype(np.float32)
    att_src = rng.standard_normal((heads, d)).astype(np.float32)
    ref = numpy_gat_reference(xh, senders, receivers, att_dst, att_src)
    order = np.argsort(receivers, kind="stable")
    out = gat_aggregate_sparse(
        jnp.asarray(xh),
        jnp.asarray(senders[order]),
        jnp.asarray(receivers[order]),
        jnp.ones(e, bool),
        jnp.asarray(att_dst),
        jnp.asarray(att_src),
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_gat_dense_matches_numpy(rng):
    n, heads, d = 8, 2, 3
    xh = rng.standard_normal((n, heads, d)).astype(np.float32)
    mask = np.triu(rng.random((n, n)) < 0.4, 1)
    us, vs = np.nonzero(mask)
    senders = np.concatenate([us, vs]).astype(np.int32)
    receivers = np.concatenate([vs, us]).astype(np.int32)
    att_dst = rng.standard_normal((heads, d)).astype(np.float32)
    att_src = rng.standard_normal((heads, d)).astype(np.float32)
    ref = numpy_gat_reference(xh, senders, receivers, att_dst, att_src)
    adj = np.zeros((1, n, n), np.float32)
    adj[0, receivers, senders] = 1.0
    out = gat_aggregate_dense(
        jnp.asarray(xh[None]), jnp.asarray(adj),
        jnp.asarray(att_dst), jnp.asarray(att_src),
    )
    np.testing.assert_allclose(np.asarray(out[0]), ref, rtol=1e-4, atol=1e-5)


def test_gat_dense_duplicate_edge_multiplicity(rng):
    """A doubled edge must contribute two exp terms to the softmax."""
    n, heads, d = 4, 1, 2
    xh = rng.standard_normal((n, heads, d)).astype(np.float32)
    att_dst = rng.standard_normal((heads, d)).astype(np.float32)
    att_src = rng.standard_normal((heads, d)).astype(np.float32)
    senders = np.array([1, 1, 2], np.int32)   # edge 1->0 duplicated
    receivers = np.array([0, 0, 0], np.int32)
    ref = numpy_gat_reference(xh, senders, receivers, att_dst, att_src)
    adj = np.zeros((1, n, n), np.float32)
    np.add.at(adj[0], (receivers, senders), 1.0)
    out = gat_aggregate_dense(
        jnp.asarray(xh[None]), jnp.asarray(adj),
        jnp.asarray(att_dst), jnp.asarray(att_src),
    )
    np.testing.assert_allclose(np.asarray(out[0]), ref, rtol=1e-4, atol=1e-5)
