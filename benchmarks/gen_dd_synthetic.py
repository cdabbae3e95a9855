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
  (i, i+3) and (i, i+4) inside each segment — interior residues touch 4
  contacts (degree 6 with the backbone);
* class 0 ("beta-rich"): paired strand segments add long-range ladder
  contacts (a+t, b+t±k) between the pair — interior residues also touch 4
  contacts (degree 6 with the backbone).

Interior contact degrees match by construction, and every graph is then
topped up with random long-range contacts to a per-graph edge/node target
drawn from the SAME distribution for both classes — so neither total edge
count nor mean degree separates the classes (verified at generation time:
the best single edges/node threshold is printed and must sit near 50%).
What differs is whether contacts are sequence-local or long-range — the
kind of signal message passing can read and feature histograms cannot.

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
        # (interior residue: 4 contacts -> degree 6 with the backbone)
        for start, seg_len in segments:
            for i in range(start, start + seg_len - 4):
                edges.append((i, i + 3))
                edges.append((i, i + 4))
    else:
        # beta sheets: pair up strand segments with ladder contacts at
        # offsets 0/+1/-1/+2 (interior residue: 4 contacts -> degree 6,
        # matching the helix interiors)
        rng.shuffle(segments)
        for k in range(0, len(segments) - 1, 2):
            (a, la), (b, lb) = segments[k], segments[k + 1]
            m = min(la, lb)
            for t in range(m - 1):
                edges.append((a + t, b + t))
                edges.append((a + t, b + t + 1))
                edges.append((a + t + 1, b + t))
                if t + 2 < m:
                    edges.append((a + t, b + t + 2))

    # sparse tertiary noise contacts (~8% of n) for both classes
    for _ in range(max(1, n // 12)):
        u, v = rng.integers(0, n, size=2)
        if u != v:
            edges.append((int(u), int(v)))

    # density top-up: both classes draw the same edges/node target, so
    # total edge count / mean degree carries no class signal (the class
    # lives in the contact topology, not the density)
    # (2.6-2.8 sits above both classes' structural density ceilings, so the
    # top-up always engages and the target distribution is shared)
    target = int(n * rng.uniform(2.6, 2.8))
    dedup = {(min(u, v), max(u, v)) for u, v in edges}
    tries = 0
    while len(dedup) < target and tries < 10 * target:
        u, v = rng.integers(0, n, size=2)
        tries += 1
        if u != v:
            dedup.add((min(int(u), int(v)), max(int(u), int(v))))
    return n, sorted(dedup), labels


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
    densities = []
    # DD's class split is ~59/41
    labels_seq = (np.arange(args.graphs) % 100 < 59).astype(int)
    for g in range(args.graphs):
        label = int(labels_seq[g])
        n, edges, labels = make_graph(rng, label)
        sizes.append(n)
        densities.append(len(edges) / n)
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
    # density-leak check: best single edges/node threshold must be ~chance
    dens = np.array(densities)
    ys = labels_seq[: len(dens)]
    order = np.argsort(dens)
    y_sorted = ys[order]
    ones_left = np.concatenate([[0], np.cumsum(y_sorted)])
    total_ones = int(ys.sum())
    accs = []
    for cut in range(len(dens) + 1):
        right_ones = total_ones - ones_left[cut]
        acc = max(ones_left[cut] + (len(dens) - cut) - right_ones,
                  right_ones + cut - ones_left[cut]) / len(dens)
        accs.append(acc)
    maj = max(total_ones, len(dens) - total_ones) / len(dens)
    print(f"density-threshold classifier: best acc {max(accs) * 100:.1f}% "
          f"(majority baseline {maj * 100:.1f}%) — must be ~baseline, or "
          f"edge density leaks the class")


if __name__ == "__main__":
    main()
