"""Generate a molhiv-scale OGB-format dataset on disk (no network egress
here, so the scale-out OGB protocol — SURVEY.md §7 step 9, reference has no
OGB support — runs on generated data in the exact raw-CSV layout
cal_tpu/data/ogb.py consumes).

SYNHIV mimics ogbg-molhiv's statistics (41,127 graphs, ~25.5 nodes mean,
binary labels at ~3.5% positives, 9 integer node-feature columns) with a
*structural* class signal: every graph is a random tree over feature-labeled
nodes plus noise edges; positives additionally contain a 6-cycle motif,
negatives a 6-path with the SAME feature multiset — feature histograms alone
cannot separate the classes, message passing over structure can.  The heavy
class imbalance is the point: accuracy saturates at ~96.5% by predicting 0,
so only ROC-AUC (the official OGB metric, utils/metrics.py) is informative.

Usage: python -m benchmarks.gen_ogb_synthetic [--root data]
       [--name ogbg_SYNHIV]
then:  python main_real.py --model CausalGAT --dataset ogbg-SYNHIV
Writes {root}/{name}/raw/{num-node-list,num-edge-list,edge,node-feat,
graph-label}.csv and {root}/{name}/split/scaffold/{train,valid,test}.csv
(index split 80/10/10, matching the official split sizes).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def make_graph(rng: np.random.Generator, label: int):
    n_base = int(rng.integers(12, 34))
    edges = [(i, int(rng.integers(0, i))) for i in range(1, n_base)]
    # 9 integer feature columns, small cardinalities (molhiv-like atom feats)
    feat = rng.integers(0, [54, 4, 12, 12, 10, 6, 6, 2, 2],
                        size=(n_base, 9)).astype(np.int64)

    # motif: 6 nodes with a fixed feature multiset, wired as a cycle
    # (positives) or path (negatives), attached at a random tree node
    motif_feat = np.tile(np.array([[5, 1, 3, 4, 2, 1, 0, 0, 1]], np.int64),
                         (6, 1))
    motif_feat[:, 0] = rng.permutation([5, 6, 7, 8, 9, 10])
    m0 = n_base
    feat = np.concatenate([feat, motif_feat], axis=0)
    for k in range(5):
        edges.append((m0 + k, m0 + k + 1))
    if label == 1:
        edges.append((m0 + 5, m0))          # close the cycle
    edges.append((int(rng.integers(0, n_base)), m0))

    n = n_base + 6
    for _ in range(max(1, n // 12)):        # ~8% noise edges
        u, v = rng.integers(0, n, size=2)
        if u != v:
            edges.append((int(u), int(v)))
    return n, edges, feat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data")
    # 'ogbg_' prefix: main_real.py routes ogbg-* names to the OGB branch,
    # and data/ogb.py maps the name to this directory ('-' and '_' both ok)
    ap.add_argument("--name", default="ogbg_SYNHIV")
    ap.add_argument("--graphs", type=int, default=41127)
    ap.add_argument("--pos_rate", type=float, default=0.035)
    ap.add_argument("--seed", type=int, default=12345)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    raw = os.path.join(args.root, args.name, "raw")
    split = os.path.join(args.root, args.name, "split", "scaffold")
    os.makedirs(raw, exist_ok=True)
    os.makedirs(split, exist_ok=True)

    labels = (rng.random(args.graphs) < args.pos_rate).astype(np.int64)
    nn_lines, ne_lines, e_lines, gl_lines = [], [], [], []
    feats = []
    total_nodes = 0
    for g in range(args.graphs):
        n, edges, feat = make_graph(rng, int(labels[g]))
        nn_lines.append(str(n))
        # molecule layout: each undirected edge stored once per direction
        ne_lines.append(str(2 * len(edges)))
        for u, v in edges:
            e_lines.append(f"{u},{v}")
            e_lines.append(f"{v},{u}")
        feats.append(feat)
        gl_lines.append(str(int(labels[g])))
        total_nodes += n

    def write(name, lines):
        with open(os.path.join(raw, name), "w") as f:
            f.write("\n".join(lines) + "\n")

    write("num-node-list.csv", nn_lines)
    write("num-edge-list.csv", ne_lines)
    write("edge.csv", e_lines)
    write("graph-label.csv", gl_lines)
    feat_all = np.concatenate(feats, axis=0)
    with open(os.path.join(raw, "node-feat.csv"), "w") as f:
        for row in feat_all:
            f.write(",".join(str(int(v)) for v in row) + "\n")

    idx = np.arange(args.graphs)
    n_tr = int(0.8 * args.graphs)
    n_va = int(0.1 * args.graphs)
    for name, part in (("train", idx[:n_tr]),
                       ("valid", idx[n_tr:n_tr + n_va]),
                       ("test", idx[n_tr + n_va:])):
        with open(os.path.join(split, name + ".csv"), "w") as f:
            f.write("\n".join(str(i) for i in part) + "\n")
    print(f"wrote {args.graphs} graphs ({labels.sum()} positive, "
          f"{100 * labels.mean():.2f}%), {total_nodes} nodes, "
          f"{len(e_lines)} directed edges -> {raw}")


if __name__ == "__main__":
    main()
