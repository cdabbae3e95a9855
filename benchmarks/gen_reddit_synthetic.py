"""Generate a REDDIT-BINARY-scale TU-format dataset on disk (no network
egress here, so the large-graph sparse-layout protocol runs on generated
data in the exact TU text layout the reference's tu_dataset.py consumes;
reference tu_dataset.py:12-13 download scope, opts.py:130-132 REDDIT rules).

SYNREDDIT mimics REDDIT-BINARY's statistics — 2000 graphs, 2 balanced
classes, ~430 nodes mean / ~3800 max (heavy-tailed lognormal sizes),
~1.16 edges/node, and NO node labels (features come entirely from the
``deg+odeg10`` FeatureExpander, as for the real REDDIT datasets) — with
REDDIT-BINARY's actual class structure: question/answer threads (a root
plus 2-4 "expert" hubs each answering a large share of users, shallow)
vs discussion threads (deep reply chains with only moderate hubs).  The
signal is the thread SHAPE — degree tail and depth distribution — which is
what separates the real REDDIT-BINARY too.

These are the graphs the dense [B, N, N] layout cannot represent
(3800^2 x 128 graphs would be ~7 TB of adjacency): the point of the
dataset is to exercise the sparse layout + block-COO tiled SpMM +
heavy-tailed loader budgets end-to-end.

Usage: python -m benchmarks.gen_reddit_synthetic [--root data]
       [--name SYNREDDIT] [--graphs 2000]
Writes {root}/{name}/raw/{name}_{A,graph_indicator,graph_labels}.txt
(no node_labels file — like REDDIT-BINARY).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def sample_size(rng: np.random.Generator) -> int:
    """Heavy-tailed thread size: lognormal matched to REDDIT-BINARY
    (mean ~430, max ~3800)."""
    return int(np.clip(rng.lognormal(mean=np.log(280.0), sigma=0.85),
                       60, 3800))


def make_qa_thread(rng: np.random.Generator, n: int) -> list[tuple[int, int]]:
    """Class 1: question/answer thread — root + expert hubs, shallow.

    Expert count and concentration vary per thread (k=1 weak-hub threads
    overlap the viral-discussion tail of class 0), so the classes are NOT
    separable by degree histograms alone — the residual signal is the
    thread SHAPE (reply depth distribution), which needs message passing."""
    k = int(rng.integers(1, 5))
    p_exp = float(rng.uniform(0.35, 0.85))
    edges = [(0, e) for e in range(1, k + 1)]          # experts answer root
    hubs = list(range(1, k + 1))
    for i in range(k + 1, n):
        u = rng.random()
        if u < 0.15:
            parent = 0                                  # reply to the post
        elif u < 0.15 + p_exp:
            parent = int(rng.choice(hubs))              # reply to an expert
        else:
            parent = int(rng.integers(1, i))            # short side chain
        edges.append((parent, i))
    return edges


def make_discussion_thread(rng: np.random.Generator,
                           n: int) -> list[tuple[int, int]]:
    """Class 0: discussion thread — deep reply chains; ~30% of threads
    also contain one "viral" post collecting a large share of replies
    (overlaps the weak-expert tail of class 1)."""
    viral = -1
    p_viral = 0.0
    if rng.random() < 0.3:
        viral = 0
        p_viral = float(rng.uniform(0.15, 0.45))
    edges = []
    for i in range(1, n):
        u = rng.random()
        if viral >= 0 and u < p_viral and i > viral:
            parent = viral                              # pile-on replies
        elif u < p_viral + 0.2:
            parent = int(rng.integers(0, i))            # random earlier post
        else:
            parent = int(rng.integers(max(0, i - 20), i))  # recent post
        edges.append((parent, i))
    return edges


def make_graph(rng: np.random.Generator, label: int):
    n = sample_size(rng)
    edges = (make_qa_thread(rng, n) if label == 1
             else make_discussion_thread(rng, n))
    # cross-reference noise edges to match REDDIT's ~1.16 edges/node
    n_noise = int(0.16 * n * rng.uniform(0.5, 1.5))
    for _ in range(n_noise):
        u, v = rng.integers(0, n, size=2)
        if u != v:
            edges.append((int(u), int(v)))
    return n, edges


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data")
    ap.add_argument("--name", default="SYNREDDIT")
    ap.add_argument("--graphs", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=12345)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    raw = os.path.join(args.root, args.name, "raw")
    os.makedirs(raw, exist_ok=True)

    a_lines, gi_lines, gl_lines = [], [], []
    offset = 0
    sizes = []
    for g in range(args.graphs):
        label = g % 2
        n, edges = make_graph(rng, label)
        for u, v in edges:
            a_lines.append(f"{offset + u + 1}, {offset + v + 1}")
            a_lines.append(f"{offset + v + 1}, {offset + u + 1}")
        gi_lines.extend([str(g + 1)] * n)
        gl_lines.append(str(label))
        offset += n
        sizes.append(n)

    pre = os.path.join(raw, f"{args.name}_")
    for suffix, lines in (("A", a_lines), ("graph_indicator", gi_lines),
                          ("graph_labels", gl_lines)):
        with open(pre + suffix + ".txt", "w") as f:
            f.write("\n".join(lines) + "\n")
    sizes = np.asarray(sizes)
    print(f"wrote {args.graphs} graphs, {offset} nodes, "
          f"{len(a_lines)} directed edges -> {raw}")
    print(f"nodes/graph: mean {sizes.mean():.1f} median "
          f"{np.median(sizes):.0f} max {sizes.max()} | "
          f"edges/node {len(a_lines) / 2 / offset:.2f}")


if __name__ == "__main__":
    main()
