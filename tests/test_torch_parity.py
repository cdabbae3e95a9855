"""Numeric goldens: our models vs an independent torch implementation of the
reference semantics (reference model.py / gcn_conv.py; PyG 1.1.0 GATConv
formulation), with identical weights.  CPU, eval mode, identity shuffle.

This is the allclose parity check SURVEY.md §4 calls for — the reference's
own stack (torch 1.4 + PyG 1.1.0) is uninstallable here, so the golden is a
from-scratch torch replica of the documented equations.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax

from cal_tpu.graph import batch_graphs
from cal_tpu.models.causal import CausalGNN
from cal_tpu.train.steps import init_state  # noqa: F401  (import sanity)

@pytest.fixture(autouse=True)
def _torch_f64_default():
    # goldens in f64, compare f32 vs f64 — scoped so the global default
    # doesn't leak into other test modules
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    yield
    torch.set_default_dtype(prev)


def t(a):
    return torch.from_numpy(np.asarray(a, np.float64))


def torch_gcn_conv(x, senders, receivers, W, b, edge_weight=None):
    """Reference GCNConv (gcn_conv.py:44-104): drop self loops+weights,
    re-add weight-1 loops, sender-degree^-1/2 sym norm, scatter-add, +bias
    AFTER aggregation."""
    x = x @ W
    v = x.shape[0]
    ew = torch.ones(len(senders), dtype=x.dtype) if edge_weight is None else edge_weight
    live = torch.as_tensor(senders != receivers)
    ew = torch.where(live, ew, torch.zeros((), dtype=x.dtype))
    deg = torch.zeros(v, dtype=x.dtype).index_add_(0, torch.as_tensor(senders, dtype=torch.long), ew) + 1.0
    dis = deg.rsqrt()
    norm = dis[senders] * ew * dis[receivers]
    msg = norm[:, None] * x[senders]
    out = torch.zeros_like(x).index_add_(0, torch.as_tensor(receivers, dtype=torch.long), msg)
    return out + x / deg[:, None] + b


def torch_bn_eval(x, scale, bias, mean=0.0, var=1.0, eps=1e-5):
    return (x - mean) / np.sqrt(var + eps) * scale + bias


def torch_gat_conv(x, senders, receivers, W, att, b, heads, out_per_head):
    """PyG 1.1.0 GATConv: shared W, att=[heads, 2*out] (receiver-half first),
    LeakyReLU(0.2) scores, softmax over incoming edges incl. one self loop."""
    v = x.shape[0]
    xh = (x @ W).reshape(v, heads, out_per_head)
    att_dst, att_src = att[:, :out_per_head], att[:, out_per_head:]
    ti = (xh * att_dst).sum(-1)     # [v, heads]
    tj = (xh * att_src).sum(-1)
    live = senders != receivers
    s_idx = torch.as_tensor(senders, dtype=torch.long)
    r_idx = torch.as_tensor(receivers, dtype=torch.long)
    score = F.leaky_relu(ti[r_idx] + tj[s_idx], 0.2)
    score = torch.where(torch.as_tensor(live)[:, None], score,
                        torch.full_like(score, -1e30))
    self_score = F.leaky_relu(ti + tj, 0.2)
    m = torch.full((v, heads), -1e30, dtype=x.dtype)
    m = m.index_reduce_(0, r_idx, score, "amax", include_self=True)
    m = torch.maximum(m, self_score)
    num_e = torch.where(torch.as_tensor(live)[:, None],
                        torch.exp(score - m[r_idx]), torch.zeros_like(score))
    num_self = torch.exp(self_score - m)
    denom = torch.zeros((v, heads), dtype=x.dtype).index_add_(0, r_idx, num_e) + num_self
    alpha = num_e / denom[r_idx]
    out = torch.zeros((v, heads, out_per_head), dtype=x.dtype)
    out = out.index_add_(0, r_idx, alpha[..., None] * xh[s_idx])
    out = out + (num_self / denom)[..., None] * xh
    return out.reshape(v, heads * out_per_head) + b


def torch_causal_forward(p, x, senders, receivers, node_graph, num_graphs,
                         backbone, layers, heads=4):
    """Reference CausalGCN/GIN/GAT forward, eval mode, identity shuffle."""
    x = torch_bn_eval(x, t(p["bn_feat"]["scale"]), t(p["bn_feat"]["bias"]))
    x = torch.relu(x @ t(p["conv_feat"]["kernel"]))          # gfn: no bias
    for i in range(layers):
        c = p[f"convs_{i}"]
        if backbone == "gcn":
            bn = p[f"bns_conv_{i}"]
            x = torch_bn_eval(x, t(bn["scale"]), t(bn["bias"]))
            x = torch.relu(torch_gcn_conv(x, senders, receivers,
                                          t(c["kernel"]), t(c["bias"])))
        elif backbone == "gin":
            agg = torch.zeros_like(x).index_add_(
                0, torch.as_tensor(receivers, dtype=torch.long), x[senders])
            h = x + agg                                      # eps=0
            h = h @ t(c["lin1"]["kernel"]) + t(c["lin1"]["bias"])
            h = torch_bn_eval(h, t(c["bn"]["scale"]), t(c["bn"]["bias"]))
            h = torch.relu(h)
            h = h @ t(c["lin2"]["kernel"]) + t(c["lin2"]["bias"])
            x = torch.relu(h)
        else:  # gat
            bn = p[f"bns_conv_{i}"]
            x = torch_bn_eval(x, t(bn["scale"]), t(bn["bias"]))
            opH = t(c["kernel"]).shape[1] // heads
            x = torch.relu(torch_gat_conv(x, senders, receivers,
                                          t(c["kernel"]), t(c["att"]),
                                          t(c["bias"]), heads, opH))
    # edge attention (2-channel softmax over concat-linear)
    ek, eb = t(p["edge_att_kernel"]), t(p["edge_att_bias"])
    H = x.shape[1]
    e_logits = torch.cat([x[senders], x[receivers]], -1) @ ek + eb
    ea = torch.softmax(e_logits, -1)
    na = torch.softmax(x @ t(p["node_att_kernel"]) + t(p["node_att_bias"]), -1)
    xc = na[:, 0:1] * x
    xo = na[:, 1:2] * x
    xc = torch_bn_eval(xc, t(p["bnc"]["scale"]), t(p["bnc"]["bias"]))
    xo = torch_bn_eval(xo, t(p["bno"]["scale"]), t(p["bno"]["bias"]))
    cc, oc = p["context_convs"], p["objects_convs"]
    xc = torch.relu(torch_gcn_conv(xc, senders, receivers, t(cc["kernel"]),
                                   t(cc["bias"]), ea[:, 0]))
    xo = torch.relu(torch_gcn_conv(xo, senders, receivers, t(oc["kernel"]),
                                   t(oc["bias"]), ea[:, 1]))
    g_idx = torch.as_tensor(node_graph, dtype=torch.long)
    pc = torch.zeros((num_graphs, H), dtype=xc.dtype).index_add_(0, g_idx, xc)
    po = torch.zeros((num_graphs, H), dtype=xo.dtype).index_add_(0, g_idx, xo)

    def readout(q, xin):
        h = torch_bn_eval(xin, t(q["bn1"]["scale"]), t(q["bn1"]["bias"]))
        h = torch.relu(h @ t(q["fc1"]["kernel"]) + t(q["fc1"]["bias"]))
        h = torch_bn_eval(h, t(q["bn2"]["scale"]), t(q["bn2"]["bias"]))
        h = h @ t(q["fc2"]["kernel"]) + t(q["fc2"]["bias"])
        return torch.log_softmax(h, -1)

    return (readout(p["context_readout"], pc),
            readout(p["objects_readout"], po),
            readout(p["random_readout"], pc + po))      # identity shuffle


@pytest.mark.parametrize("backbone", ["gcn", "gin", "gat"])
def test_causal_model_matches_torch_golden(graphs, backbone):
    hidden, layers, ncls = 16, 2, 3
    gb = batch_graphs(graphs[:6], 6, 128, 512)
    model = CausalGNN(backbone=backbone, hidden=hidden, num_classes=ncls,
                      num_layers=layers)
    rngs = {"params": jax.random.PRNGKey(0),
            "intervention": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, gb, eval_random=False, train=False)
    c_j, o_j, co_j = model.apply(variables, gb, eval_random=False, train=False)

    p = jax.tree.map(np.asarray, variables["params"])
    # golden over the REAL (unpadded) disjoint union
    n_real = int(np.asarray(gb.node_mask).sum())
    e_real = int(np.asarray(gb.edge_mask).sum())
    x = np.asarray(gb.x)[:n_real]
    em = np.asarray(gb.edge_mask)
    senders = np.asarray(gb.senders)[em]
    receivers = np.asarray(gb.receivers)[em]
    node_graph = np.asarray(gb.node_graph)[:n_real]
    assert len(senders) == e_real
    c_t, o_t, co_t = torch_causal_forward(
        p, t(x), senders, receivers, node_graph, 6, backbone, layers)

    for name, j, tt in (("c", c_j, c_t), ("o", o_j, o_t), ("co", co_j, co_t)):
        np.testing.assert_allclose(
            np.asarray(j[:6]), tt.numpy(), rtol=2e-4, atol=2e-5,
            err_msg=f"{backbone} {name}-branch mismatch vs torch golden",
        )
