"""Parity + grad tests for the fused dense GCN Pallas kernel
(cal_tpu/ops/pallas_gcn.py) against the XLA reference path
(ops/gcn.py gcn_aggregate_dense).  Runs in interpreter mode on CPU;
hardware parity is checked by benchmarks/parity_tpu.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cal_tpu.ops.gcn import gcn_aggregate_dense
from cal_tpu.ops.pallas_gcn import (
    SigmoidEdgeWeight, fused_gcn_dense, fused_gcn_dense_att)

B, N, H = 3, 16, 8


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    adj = rng.integers(0, 2, (B, N, N)).astype(np.float32)
    adj += (rng.random((B, N, N)) < 0.1)          # duplicate edges
    adj[:, :, N - 4:] = 0.0                        # some zero-degree senders
    adj[0, np.arange(N), np.arange(N)] = 3.0       # self loops (weight dropped)
    adj[B - 1] = 0.0                               # fully padded graph slot
    x = rng.normal(size=(B, N, H)).astype(np.float32)
    x[B - 1] = 0.0
    src = rng.normal(size=(B, N)).astype(np.float32)
    dst = rng.normal(size=(B, N)).astype(np.float32)
    return jnp.asarray(adj), jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst)


def test_unweighted_forward(data):
    adj, x, _, _ = data
    ref = gcn_aggregate_dense(x, adj, None)
    out = fused_gcn_dense(x, adj)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_unweighted_grad(data):
    adj, x, _, _ = data
    cot = jnp.cos(jnp.arange(x.size, dtype=jnp.float32)).reshape(x.shape)
    g_ref = jax.grad(lambda v: jnp.vdot(gcn_aggregate_dense(v, adj, None), cot))(x)
    g_out = jax.grad(lambda v: jnp.vdot(fused_gcn_dense(v, adj), cot))(x)
    np.testing.assert_allclose(g_out, g_ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("negate", [False, True])
def test_weighted_forward(data, negate):
    adj, x, src, dst = data
    w = SigmoidEdgeWeight(src, dst, negate=negate)
    ref = gcn_aggregate_dense(x, adj, w.materialize())
    out = fused_gcn_dense_att(x, adj, src, dst, negate)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("negate", [False, True])
def test_weighted_grads(data, negate):
    adj, x, src, dst = data
    cot = jnp.sin(jnp.arange(x.size, dtype=jnp.float32)).reshape(x.shape)

    def ref_loss(v, s, d):
        w = SigmoidEdgeWeight(s, d, negate=negate).materialize()
        return jnp.vdot(gcn_aggregate_dense(v, adj, w), cot)

    def fused_loss(v, s, d):
        return jnp.vdot(fused_gcn_dense_att(v, adj, s, d, negate), cot)

    ref = jax.grad(ref_loss, argnums=(0, 1, 2))(x, src, dst)
    out = jax.grad(fused_loss, argnums=(0, 1, 2))(x, src, dst)
    for r, o, name in zip(ref, out, ("dx", "dsrc", "ddst")):
        np.testing.assert_allclose(o, r, rtol=2e-5, atol=2e-5, err_msg=name)


def test_constant_half_weight_matches_ablation(data):
    """sigma(0+0) = 0.5: the factored form of the edge-attention ablation."""
    adj, x, _, _ = data
    zeros = jnp.zeros((B, N), jnp.float32)
    ref = gcn_aggregate_dense(x, adj, jnp.full((B, N, N), 0.5, jnp.float32))
    out = fused_gcn_dense_att(x, adj, zeros, zeros, False)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_model_pallas_vs_xla_dense():
    """Full CausalGCN forward: use_pallas=True == use_pallas=False (dense)."""
    from cal_tpu.graph import HostGraph, densify
    from cal_tpu.models.causal import CausalGNN

    rng = np.random.default_rng(1)
    graphs = []
    for i in range(3):
        n = int(rng.integers(5, 12))
        e = int(rng.integers(4, 2 * n))
        graphs.append(HostGraph(
            x=rng.normal(size=(n, 6)).astype(np.float32),
            senders=rng.integers(0, n, e),
            receivers=rng.integers(0, n, e),
            y=int(rng.integers(0, 3)),
        ))
    g = densify(graphs, num_graphs=4, node_budget=12)
    kw = dict(backbone="gcn", hidden=16, num_classes=3, num_layers=2)
    key = jax.random.PRNGKey(0)
    m_p = CausalGNN(use_pallas=True, **kw)
    m_x = CausalGNN(use_pallas=False, **kw)
    vars_p = m_p.init({"params": key, "intervention": key}, g, eval_random=False)
    out_p = m_p.apply(vars_p, g, eval_random=False)
    out_x = m_x.apply(vars_p, g, eval_random=False)
    for a, b in zip(out_p, out_x):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_dual_forward(data):
    from cal_tpu.ops.pallas_gcn import fused_gcn_dense_att_dual

    adj, x, src, dst = data
    xc, xo = x, x[..., ::-1]
    ref_c = gcn_aggregate_dense(
        xc, adj, SigmoidEdgeWeight(src, dst, False).materialize())
    ref_o = gcn_aggregate_dense(
        xo, adj, SigmoidEdgeWeight(src, dst, True).materialize())
    oc, oo = fused_gcn_dense_att_dual(xc, xo, adj, src, dst)
    np.testing.assert_allclose(oc, ref_c, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(oo, ref_o, rtol=1e-5, atol=1e-5)


def test_dual_grads(data):
    from cal_tpu.ops.pallas_gcn import fused_gcn_dense_att_dual

    adj, x, src, dst = data
    xc, xo = x, jnp.tanh(x)
    cot_c = jnp.sin(jnp.arange(x.size, dtype=jnp.float32)).reshape(x.shape)
    cot_o = jnp.cos(jnp.arange(x.size, dtype=jnp.float32)).reshape(x.shape)

    def ref_loss(vc, vo, s, d):
        oc = gcn_aggregate_dense(
            vc, adj, SigmoidEdgeWeight(s, d, False).materialize())
        oo = gcn_aggregate_dense(
            vo, adj, SigmoidEdgeWeight(s, d, True).materialize())
        return jnp.vdot(oc, cot_c) + jnp.vdot(oo, cot_o)

    def fused_loss(vc, vo, s, d):
        oc, oo = fused_gcn_dense_att_dual(vc, vo, adj, s, d)
        return jnp.vdot(oc, cot_c) + jnp.vdot(oo, cot_o)

    ref = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(xc, xo, src, dst)
    out = jax.grad(fused_loss, argnums=(0, 1, 2, 3))(xc, xo, src, dst)
    for r, o, name in zip(ref, out, ("dxc", "dxo", "dsrc", "ddst")):
        np.testing.assert_allclose(o, r, rtol=2e-5, atol=2e-5, err_msg=name)
