"""Generate an NCI1-scale TU-format dataset on disk (no network egress here,
so the at-scale real-data protocol runs on generated data in the exact TU
text layout the reference's tu_dataset.py consumes).

SYNNCI mimics NCI1's statistics (4110 graphs, 2 balanced classes, ~30 nodes
mean, 37 node-label symbols) with a *structural* class signal: every graph
is a random tree over labeled nodes plus noise edges; class 1 additionally
contains a 5-cycle motif, class 0 a 5-path with the SAME label multiset —
node-label histograms alone cannot separate the classes, message passing
over structure can.

Usage: python -m benchmarks.gen_tu_synthetic [--root data] [--name SYNNCI]
Writes {root}/{name}/raw/{name}_{A,graph_indicator,graph_labels,
node_labels}.txt
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def make_graph(rng: np.random.Generator, label: int, n_labels: int = 37):
    n_base = int(rng.integers(18, 42))
    # random recursive tree
    edges = [(i, int(rng.integers(0, i))) for i in range(1, n_base)]
    labels = rng.integers(0, n_labels, size=n_base).tolist()

    # motif: 5 nodes with a fixed label multiset, wired as cycle (class 1)
    # or path (class 0), attached at a random tree node
    motif_labels = [1, 3, 5, 7, 9]
    rng.shuffle(motif_labels)
    m0 = n_base
    for ml in motif_labels:
        labels.append(int(ml))
    for k in range(4):
        edges.append((m0 + k, m0 + k + 1))
    if label == 1:
        edges.append((m0 + 4, m0))          # close the cycle
    attach = int(rng.integers(0, n_base))
    edges.append((attach, m0))

    n = n_base + 5
    # noise edges (~10%)
    for _ in range(max(1, n // 10)):
        u, v = rng.integers(0, n, size=2)
        if u != v:
            edges.append((int(u), int(v)))
    return n, edges, labels


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data")
    ap.add_argument("--name", default="SYNNCI")
    ap.add_argument("--graphs", type=int, default=4110)
    ap.add_argument("--seed", type=int, default=12345)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    raw = os.path.join(args.root, args.name, "raw")
    os.makedirs(raw, exist_ok=True)

    a_lines, gi_lines, gl_lines, nl_lines = [], [], [], []
    offset = 0
    for g in range(args.graphs):
        label = g % 2
        n, edges, labels = make_graph(rng, label)
        for u, v in edges:
            a_lines.append(f"{offset + u + 1}, {offset + v + 1}")
            a_lines.append(f"{offset + v + 1}, {offset + u + 1}")
        gi_lines.extend([str(g + 1)] * n)
        gl_lines.append(str(label))
        nl_lines.extend(str(l) for l in labels)
        offset += n

    pre = os.path.join(raw, f"{args.name}_")
    for suffix, lines in (("A", a_lines), ("graph_indicator", gi_lines),
                          ("graph_labels", gl_lines),
                          ("node_labels", nl_lines)):
        with open(pre + suffix + ".txt", "w") as f:
            f.write("\n".join(lines) + "\n")
    print(f"wrote {args.graphs} graphs, {offset} nodes, "
          f"{len(a_lines)} directed edges -> {raw}")


if __name__ == "__main__":
    main()
