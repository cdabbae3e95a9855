"""Reference-equivalent torch hot loop, measured on this host (CPU).

The reference stack (torch 1.4 + PyG 1.1.0, CUDA-less on this machine) can't
be installed here, so this is a faithful torch reimplementation of its
per-step compute — CausalGCN forward (gather/scatter message passing via
``index_add_``, reference gcn_conv.py:44-104), three-branch loss
(train_causal.py:178-183), backward, Adam — on the same synthetic workload
as bench.py.  Writes benchmarks/baseline_perf.json.

Run: python benchmarks/torch_baseline.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

from cal_tpu.data.loader import compute_budgets  # noqa: E402  (unused sizes)
from cal_tpu.data.synthetic import (  # noqa: E402
    dataset_bias_split,
    generate_synthetic_dataset,
)
from cal_tpu.utils.config import Config  # noqa: E402


def scatter_add(src, index, dim_size):
    out = torch.zeros((dim_size,) + src.shape[1:], dtype=src.dtype)
    return out.index_add_(0, index, src)


class GCNConv(nn.Module):
    """Reference GCNConv semantics: drop self loops, re-add with weight 1,
    sender-degree^-1/2 symmetric norm, scatter-add aggregation."""

    def __init__(self, fin, fout):
        super().__init__()
        self.lin = nn.Linear(fin, fout)

    def forward(self, x, senders, receivers, edge_weight=None):
        x = self.lin(x)
        v = x.shape[0]
        ew = torch.ones(senders.shape[0]) if edge_weight is None else edge_weight
        live = senders != receivers
        ew = torch.where(live, ew, torch.zeros(()))
        deg = scatter_add(ew, senders, v) + 1.0
        dis = deg.rsqrt()
        norm = dis[senders] * ew * dis[receivers]
        msg = norm.unsqueeze(1) * x[senders]
        out = scatter_add(msg, receivers, v)
        return out + x / deg.unsqueeze(1)


class GATConv(nn.Module):
    """PyG-1.1.0 GATConv semantics (reference model.py:340): shared weight,
    per-edge LeakyReLU score, segment softmax over incoming edges with the
    analytic self loop, multi-head concat."""

    def __init__(self, fin, out_per_head, heads=4):
        super().__init__()
        self.h, self.d = heads, out_per_head
        self.lin = nn.Linear(fin, heads * out_per_head)
        self.att = nn.Parameter(torch.empty(heads, 2 * out_per_head))
        nn.init.xavier_uniform_(self.att)

    def forward(self, x, senders, receivers):
        v = x.shape[0]
        xh = self.lin(x).view(v, self.h, self.d)
        ti = (xh * self.att[:, : self.d]).sum(-1)       # [V, H] receiver half
        tj = (xh * self.att[:, self.d:]).sum(-1)        # [V, H] sender half
        live = senders != receivers
        s_e = F.leaky_relu(ti[receivers] + tj[senders], 0.2)
        s_e = torch.where(live.unsqueeze(1), s_e, torch.full((), -1e30))
        m = torch.full((v, self.h), -1e30).index_reduce_(
            0, receivers, s_e, "amax")
        self_s = F.leaky_relu(ti + tj, 0.2)
        m = torch.maximum(m, self_s)
        num_e = torch.where(live.unsqueeze(1),
                            torch.exp(s_e - m[receivers]), torch.zeros(()))
        num_self = torch.exp(self_s - m)
        den = scatter_add(num_e, receivers, v) + num_self
        alpha = num_e / den[receivers]
        msg = alpha.unsqueeze(-1) * xh[senders]
        out = scatter_add(msg, receivers, v) + (
            (num_self / den).unsqueeze(-1) * xh)
        return out.reshape(v, self.h * self.d)


class Readout(nn.Module):
    def __init__(self, h, c):
        super().__init__()
        self.bn1, self.fc1 = nn.BatchNorm1d(h), nn.Linear(h, h)
        self.bn2, self.fc2 = nn.BatchNorm1d(h), nn.Linear(h, c)

    def forward(self, x):
        x = F.relu(self.fc1(self.bn1(x)))
        return F.log_softmax(self.fc2(self.bn2(x)), dim=-1)


class CausalGCN(nn.Module):
    def __init__(self, fin, h, c, layers=3, backbone="gcn"):
        super().__init__()
        self.bn_feat = nn.BatchNorm1d(fin)
        self.conv_feat = nn.Linear(fin, h)
        self.bns = nn.ModuleList(nn.BatchNorm1d(h) for _ in range(layers))
        if backbone == "gat":
            self.convs = nn.ModuleList(
                GATConv(h, h // 4, 4) for _ in range(layers))
        else:
            self.convs = nn.ModuleList(GCNConv(h, h) for _ in range(layers))
        self.backbone = backbone
        self.edge_att = nn.Linear(2 * h, 2)
        self.node_att = nn.Linear(h, 2)
        self.bnc, self.bno = nn.BatchNorm1d(h), nn.BatchNorm1d(h)
        self.context_conv = GCNConv(h, h)
        self.objects_conv = GCNConv(h, h)
        self.ro_c, self.ro_o, self.ro_co = Readout(h, c), Readout(h, c), Readout(h, c)

    def forward(self, x, senders, receivers, node_graph, num_graphs):
        x = F.relu(self.conv_feat(self.bn_feat(x)))
        for bn, conv in zip(self.bns, self.convs):
            x = F.relu(conv(bn(x), senders, receivers))
        # (attention dropout omitted: inference-free CPU floor favors torch)
        e = self.edge_att(torch.cat([x[senders], x[receivers]], dim=-1))
        ea = F.softmax(e, dim=-1)
        na = F.softmax(self.node_att(x), dim=-1)
        xc = na[:, 0:1] * x
        xo = na[:, 1:2] * x
        xc = F.relu(self.context_conv(self.bnc(xc), senders, receivers, ea[:, 0]))
        xo = F.relu(self.objects_conv(self.bno(xo), senders, receivers, ea[:, 1]))
        xc = scatter_add(xc, node_graph, num_graphs)
        xo = scatter_add(xo, node_graph, num_graphs)
        perm = torch.randperm(num_graphs)
        return self.ro_c(xc), self.ro_o(xo), self.ro_co(xc[perm] + xo)


def collate(graphs):
    xs, ss, rs, gids, ys, off = [], [], [], [], [], 0
    for i, g in enumerate(graphs):
        xs.append(torch.from_numpy(g.x))
        ss.append(torch.from_numpy(g.senders.astype(np.int64)) + off)
        rs.append(torch.from_numpy(g.receivers.astype(np.int64)) + off)
        gids.append(torch.full((g.num_nodes,), i, dtype=torch.int64))
        ys.append(g.y)
        off += g.num_nodes
    return (torch.cat(xs), torch.cat(ss), torch.cat(rs), torch.cat(gids),
            torch.tensor(ys), len(graphs))


def main():
    torch.manual_seed(666)
    data_num = 64
    cfg = Config(model="CausalGCN", bias=0.9, lr=0.002, min_lr=5e-6)
    dataset = generate_synthetic_dataset(
        data_num=data_num, node_num=cfg.node_num, max_degree=cfg.max_degree,
        noise=cfg.noise, seed=cfg.seed,
        cache_path=os.path.join(os.path.dirname(_HERE), "data",
                                f"bench_syn_{data_num}.pkl"),
    )
    train_set, _, _, _ = dataset_bias_split(
        dataset, bias=cfg.bias, total=data_num * 4, seed=cfg.seed)
    bs = cfg.batch_size
    batches = [collate(train_set[i: i + bs])
               for i in range(0, len(train_set) - bs + 1, bs)]
    edges_per_batch = float(np.mean([b[1].shape[0] for b in batches]))

    model = CausalGCN(cfg.max_degree, cfg.hidden, cfg.num_classes, cfg.layers)
    opt = torch.optim.Adam(model.parameters(), lr=cfg.lr)
    gat_model = CausalGCN(cfg.max_degree, cfg.hidden, cfg.num_classes,
                          cfg.layers, backbone="gat")
    gat_opt = torch.optim.Adam(gat_model.parameters(), lr=cfg.lr)

    def step(batch, model=model, opt=opt):
        x, s, r, gid, y, ng = batch
        opt.zero_grad()
        c_logs, o_logs, co_logs = model(x, s, r, gid, ng)
        u = torch.ones_like(c_logs) / c_logs.shape[-1]
        loss = (0.5 * F.kl_div(c_logs, u, reduction="batchmean")
                + 1.0 * F.nll_loss(o_logs, y)
                + 0.5 * F.nll_loss(co_logs, y))
        loss.backward()
        opt.step()
        return loss

    for b in batches[:2]:
        step(b)
    n_steps, t0 = 0, time.perf_counter()
    while n_steps < 30:
        for b in batches:
            step(b)
            n_steps += 1
    dt = time.perf_counter() - t0
    edges_per_s = n_steps / dt * edges_per_batch

    for b in batches[:2]:
        step(b, gat_model, gat_opt)
    n_steps_g, t0 = 0, time.perf_counter()
    while n_steps_g < 15:
        for b in batches:
            step(b, gat_model, gat_opt)
            n_steps_g += 1
    dt_g = time.perf_counter() - t0
    gat_edges_per_s = n_steps_g / dt_g * edges_per_batch

    out = {
        "train_edges_per_s": round(edges_per_s, 1),
        "gat_train_edges_per_s": round(gat_edges_per_s, 1),
        "steps_per_s": round(n_steps / dt, 3),
        "edges_per_batch": edges_per_batch,
        "hardware": "host CPU (torch {})".format(torch.__version__),
        "workload": "CausalGCN/GAT h128 L3 batch128 synthetic (bench.py twin)",
    }
    with open(os.path.join(_HERE, "baseline_perf.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
