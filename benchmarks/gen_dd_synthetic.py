"""Generate a D&D-scale TU-format dataset on disk (no network egress here,
so the at-scale protocol runs on generated data in the exact TU text layout
the reference's tu_dataset.py consumes; download scope tu_dataset.py:12-13).

SYNDD mimics DD's statistics (1178 graphs, 2 classes at DD's ~59/41 split,
~284 nodes mean / 5748 max, 89 node-label symbols, ~1.8 undirected edges
per node vs DD's ~2.5) with protein-contact-style structure: every graph is a residue
chain (backbone path) over 89 amino-acid-style labels plus contact edges.
The class signal is the contact *topology*, not the label histogram —
labels are drawn iid from the same distribution for both classes:

* class 1 ("alpha-rich"): helical segments add short-range contacts
  (i, i+3) and (i, i+4) inside each segment;
* class 0 ("beta-rich"): paired strand segments add long-range ladder
  contacts (a+t, b+t) and (a+t, b+t+1) between the pair.

Both classes carry ~2 contacts per covered residue at the same coverage, so
edge counts and degree histograms overlap; what differs is whether contacts
are sequence-local or long-range — exactly the kind of signal message
passing can read and feature histograms cannot.

Usage: python -m benchmarks.gen_dd_synthetic [--root data] [--name SYNDD]
Writes {root}/{name}/raw/{name}_{A,graph_indicator,graph_labels,
node_labels}.txt
"""
from __future__ import annotations

import argparse
import os

import numpy as np

N_LABELS = 89
MAX_NODES = 5748


def _sample_size(rng: np.random.Generator) -> int:
    # body: lognormal around DD's median; ~1.5% giant multi-domain tail
    # (DD's largest graph is 5748 nodes at a 284 mean)
    if rng.random() < 0.015:
        n = int(np.exp(rng.normal(7.6, 0.5)))
        return int(np.clip(n, 2000, MAX_NODES))
    n = int(np.exp(rng.normal(5.42, 0.5)))
    return int(np.clip(n, 30, MAX_NODES))


def make_graph(rng: np.random.Generator, label: int):
    n = _sample_size(rng)
    labels = rng.integers(0, N_LABELS, size=n).tolist()
    edges = [(i, i + 1) for i in range(n - 1)]          # backbone chain

    # secondary-structure segments cover ~75% of residues (tuned so the
    # directed edges/node lands near DD's ~5)
    covered = 0
    target = int(0.75 * n)
    pos = int(rng.integers(0, 5))
    segments = []
    while covered < target and pos < n - 12:
        seg_len = int(rng.integers(8, 14))
        if pos + seg_len >= n:
            break
        segments.append((pos, seg_len))
        covered += seg_len
        pos += seg_len + int(rng.integers(2, 8))        # loop between

    if label == 1:
        # helices: short-range (i, i+3), (i, i+4) contacts in-segment
        for start, seg_len in segments:
            for i in range(start, start + seg_len - 4):
                edges.append((i, i + 3))
                edges.append((i, i + 4))
    else:
        # beta sheets: pair up strand segments with ladder contacts
        rng.shuffle(segments)
        for k in range(0, len(segments) - 1, 2):
            (a, la), (b, lb) = segments[k], segments[k + 1]
            for t in range(min(la, lb) - 1):
                edges.append((a + t, b + t))
                edges.append((a + t, b + t + 1))

    # sparse tertiary noise contacts (~8% of n) for both classes
    for _ in range(max(1, n // 12)):
        u, v = rng.integers(0, n, size=2)
        if u != v:
            edges.append((int(u), int(v)))
    return n, edges, labels


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data")
    ap.add_argument("--name", default="SYNDD")
    ap.add_argument("--graphs", type=int, default=1178)
    ap.add_argument("--seed", type=int, default=12345)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    raw = os.path.join(args.root, args.name, "raw")
    os.makedirs(raw, exist_ok=True)

    a_lines, gi_lines, gl_lines, nl_lines = [], [], [], []
    offset = 0
    sizes = []
    # DD's class split is ~59/41
    labels_seq = (np.arange(args.graphs) % 100 < 59).astype(int)
    for g in range(args.graphs):
        label = int(labels_seq[g])
        n, edges, labels = make_graph(rng, label)
        sizes.append(n)
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
    sizes = np.array(sizes)
    print(f"wrote {args.graphs} graphs, {offset} nodes, "
          f"{len(a_lines)} directed edges -> {raw}")
    print(f"nodes/graph: mean {sizes.mean():.1f} median "
          f"{int(np.median(sizes))} max {sizes.max()} | "
          f"edges/node {len(a_lines) / offset:.2f}")


if __name__ == "__main__":
    main()
