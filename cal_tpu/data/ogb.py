"""OGB graph-property-prediction datasets from a local directory (scale-out
config, SURVEY.md §7 step 9: "CausalGAT on ogbg-molhiv").

New scope — the reference has no OGB support.  The ``ogb`` package is not
installed and this environment has no network egress, so this loader reads
the standard OGB raw CSV layout directly from disk:

    <root>/<name>/raw/num-node-list.csv.gz      one int per graph
                     /num-edge-list.csv.gz      one int per graph
                     /edge.csv.gz               src,dst per line (graphs
                                                concatenated in order,
                                                node ids local per graph)
                     /node-feat.csv.gz          one feature row per node
                     /graph-label.csv.gz        one int label per graph
    <root>/<name>/split/<split_name>/{train,valid,test}.csv.gz
                                                graph indices, one per line

(That is exactly what ``ogb.io.read_csv_graph_raw`` consumes, so a directory
downloaded elsewhere with the official package drops in unchanged.)  Files
may be plain ``.csv`` instead of ``.csv.gz``.

Molecule datasets store each undirected bond once per direction already;
``symmetrize=True`` adds reverse edges for datasets that store one direction.
"""
from __future__ import annotations

import gzip
import os
from typing import Sequence

import numpy as np

from cal_tpu.graph import HostGraph


def _open(path: str):
    if os.path.exists(path + ".gz"):
        return gzip.open(path + ".gz", "rt")
    if os.path.exists(path):
        return open(path)
    raise FileNotFoundError(
        f"{path}[.gz] not found — this environment has no network egress; "
        "place an OGB-format directory there (see cal_tpu/data/ogb.py "
        "docstring for the expected layout)")


def _read_ints(path: str) -> np.ndarray:
    with _open(path) as f:
        return np.array([int(float(line.split(",")[0]))
                         for line in f if line.strip()], np.int64)


def _read_csv(path: str, dtype) -> np.ndarray:
    with _open(path) as f:
        return np.loadtxt(f, delimiter=",", dtype=dtype, ndmin=2)


def load_ogb_graphs(
    root: str,
    name: str,
    symmetrize: bool = False,
) -> list[HostGraph]:
    """Parse <root>/<name>/raw into HostGraphs (binary/int graph labels)."""
    raw = os.path.join(root, name, "raw")
    n_nodes = _read_ints(os.path.join(raw, "num-node-list.csv"))
    n_edges = _read_ints(os.path.join(raw, "num-edge-list.csv"))
    labels = _read_ints(os.path.join(raw, "graph-label.csv"))
    edges = _read_csv(os.path.join(raw, "edge.csv"), np.int64)
    feats = _read_csv(os.path.join(raw, "node-feat.csv"), np.float32)
    assert len(n_nodes) == len(n_edges) == len(labels)
    assert edges.shape[0] == int(n_edges.sum()), (edges.shape, n_edges.sum())
    assert feats.shape[0] == int(n_nodes.sum()), (feats.shape, n_nodes.sum())

    graphs: list[HostGraph] = []
    n_off = e_off = 0
    for i in range(len(n_nodes)):
        n, e = int(n_nodes[i]), int(n_edges[i])
        s = edges[e_off:e_off + e, 0].astype(np.int32)
        r = edges[e_off:e_off + e, 1].astype(np.int32)
        if symmetrize:
            s, r = np.concatenate([s, r]), np.concatenate([r, s])
        graphs.append(HostGraph(
            x=feats[n_off:n_off + n],
            senders=s,
            receivers=r,
            y=int(labels[i]),
        ))
        n_off += n
        e_off += e
    return graphs


def load_ogb_split(
    root: str, name: str, split_name: str = "scaffold"
) -> dict[str, np.ndarray]:
    """{'train': idx, 'valid': idx, 'test': idx} graph-index arrays."""
    d = os.path.join(root, name, "split", split_name)
    return {k: _read_ints(os.path.join(d, f"{k}.csv"))
            for k in ("train", "valid", "test")}


def get_ogb_dataset(
    name: str,
    root: str | None = None,
    split_name: str = "scaffold",
    symmetrize: bool = False,
) -> tuple[list[HostGraph], dict[str, np.ndarray]]:
    """Dataset + official split, e.g. get_ogb_dataset('ogbg_molhiv').

    OGB names use '-' (ogbg-molhiv) but directories use '_' (ogbg_molhiv);
    both are accepted.
    """
    if not root:
        root = os.path.join(os.path.expanduser("~"), "cal_tpu_data")
    name = name.replace("-", "_")
    graphs = load_ogb_graphs(root, name, symmetrize=symmetrize)
    split = load_ogb_split(root, name, split_name)
    return graphs, split
