"""TU-Dortmund graph-kernel dataset loader.

TPU-native replacement for the reference's ``tu_dataset.py`` (TUDatasetExt,
reference tu_dataset.py:10-91) and PyG's ``read_tu_data``: parses the TU text
format (``{name}_A.txt``, ``graph_indicator``, ``graph_labels``,
``node_labels``, ``node_attributes``) into NumPy arrays, slices into
per-graph :class:`~cal_tpu.graph.HostGraph` records, applies an optional
pre-transform (FeatureExpander), and caches the processed graphs keyed by
``feat_str`` (reference tu_dataset.py:21,44 ``data_%s.pt``).

Latent reference bugs intentionally NOT reproduced: live ``pdb.set_trace()``
(tu_dataset.py:80), undefined ``data_list`` when ``pre_transform is None``
(tu_dataset.py:83-87), and the ``pruning_percent`` dead end — the reference
(tu_dataset.py:29-33) loads a separate ``data_XX.pt`` cache when
``pruning_percent > 0`` but NOTHING in the repo ever writes that file (its
``process()`` saves only the unpruned path), so the flag crashes with
FileNotFoundError unless the cache was produced externally.  Here the
documented intent is implemented: drop ``pruning_percent`` of each graph's
undirected edges (seeded, mirror-consistent) BEFORE feature expansion, and
cache under the reference's ``_{percent*100}`` suffix convention.
"""
from __future__ import annotations

import dataclasses
import os
import pickle
import shutil
import zipfile
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from cal_tpu.graph import HostGraph

# Same source as the reference (tu_dataset.py:12-13).
TU_URL = "https://ls11-www.cs.tu-dortmund.de/people/morris/graphkerneldatasets"

_CACHE_VERSION = 3  # v3: per-graph xg (group_degree super-nodes)


def _read_numeric(path: str, dtype) -> np.ndarray:
    """Parse a TU txt file (comma/space separated numbers) into a 2-D array."""
    with open(path) as f:
        text = f.read()
    rows = [ln for ln in text.splitlines() if ln.strip()]
    ncol = len(rows[0].replace(",", " ").split()) if rows else 1
    flat = np.array(text.replace(",", " ").split(), dtype=dtype)
    return flat.reshape(-1, ncol)


def _one_hot_columns(labels: np.ndarray) -> np.ndarray:
    """One-hot each integer column after shifting it to start at 0
    (matches PyG read_tu_data's node-label handling)."""
    blocks = []
    for c in range(labels.shape[1]):
        col = labels[:, c].astype(np.int64)
        col = col - col.min()
        width = int(col.max()) + 1
        oh = np.zeros((col.shape[0], width), np.float32)
        oh[np.arange(col.shape[0]), col] = 1.0
        blocks.append(oh)
    return np.concatenate(blocks, axis=1)


def _coalesce(edge_index: np.ndarray) -> np.ndarray:
    """Drop self-loops and duplicate directed edges; sort by (row, col)."""
    row, col = edge_index
    keep = row != col
    row, col = row[keep], col[keep]
    # unique over flattened (row, col) pairs
    n = max(int(col.max()) + 1 if col.size else 1, 1)
    flat = row.astype(np.int64) * n + col.astype(np.int64)
    flat = np.unique(flat)
    return np.stack([flat // n, flat % n]).astype(np.int64)


@dataclasses.dataclass
class TUData:
    """Whole-dataset arrays, pre-split (mirrors PyG's collated storage)."""

    x: Optional[np.ndarray]        # [N, num_node_attributes + num_node_labels]
    edge_index: np.ndarray         # [2, E] coalesced, global node ids
    y: np.ndarray                  # [G] int labels remapped to 0..C-1
    node_graph: np.ndarray         # [N] graph id per node
    num_node_attributes: int
    num_node_labels: int


def read_tu_data(raw_dir: str, name: str) -> TUData:
    """Parse the TU text format from ``raw_dir`` (PyG read_tu_data parity)."""
    pre = os.path.join(raw_dir, f"{name}_")

    edge_index = _read_numeric(pre + "A.txt", np.int64).T - 1  # 1-based → 0
    node_graph = _read_numeric(pre + "graph_indicator.txt", np.int64)[:, 0] - 1

    y_raw = _read_numeric(pre + "graph_labels.txt", np.int64)[:, 0]
    _, y = np.unique(y_raw, return_inverse=True)   # sorted-unique remap

    attrs = None
    if os.path.exists(pre + "node_attributes.txt"):
        attrs = _read_numeric(pre + "node_attributes.txt", np.float32)
    labels_oh = None
    if os.path.exists(pre + "node_labels.txt"):
        labels_oh = _one_hot_columns(_read_numeric(pre + "node_labels.txt",
                                                   np.int64))
    parts = [p for p in (attrs, labels_oh) if p is not None]
    x = np.concatenate(parts, axis=1) if parts else None

    return TUData(
        x=x,
        edge_index=_coalesce(edge_index),
        y=y.astype(np.int64),
        node_graph=node_graph,
        num_node_attributes=0 if attrs is None else attrs.shape[1],
        num_node_labels=0 if labels_oh is None else labels_oh.shape[1],
    )


def split_graphs(
    d: TUData, use_node_attr: bool = True
) -> List[Tuple[Optional[np.ndarray], np.ndarray, int]]:
    """Slice whole-dataset arrays into per-graph ``(x, edge_index, y)``.

    ``use_node_attr=False`` strips the leading attribute columns, keeping
    only the one-hot node-label block (reference tu_dataset.py:36-37).
    """
    num_graphs = int(d.node_graph.max()) + 1 if d.node_graph.size else 0
    node_offset = np.zeros(num_graphs + 1, np.int64)
    counts = np.bincount(d.node_graph, minlength=num_graphs)
    node_offset[1:] = np.cumsum(counts)

    x = d.x
    if x is not None and not use_node_attr:
        x = x[:, d.num_node_attributes:]

    # group edges by graph (edges never cross graphs in TU data)
    edge_graph = d.node_graph[d.edge_index[0]]
    order = np.argsort(edge_graph, kind="stable")
    ei = d.edge_index[:, order]
    eg = edge_graph[order]
    e_starts = np.searchsorted(eg, np.arange(num_graphs + 1))

    graphs = []
    for g in range(num_graphs):
        n0, n1 = node_offset[g], node_offset[g + 1]
        e = ei[:, e_starts[g]:e_starts[g + 1]] - n0   # → local node ids
        xg = None if x is None else x[n0:n1]
        graphs.append((xg, e, int(d.y[g])))
    return graphs


def prune_edges(edge_index: np.ndarray, percent: float,
                rng: np.random.Generator) -> np.ndarray:
    """Randomly drop ``percent`` of a graph's UNDIRECTED edges.

    The coalesced edge list stores each undirected edge as two directed
    entries; both directions of a sampled edge are dropped together so the
    graph stays symmetric.  One-directional leftovers (true digraph edges)
    are sampled independently at the same rate.
    """
    if percent <= 0.0 or edge_index.shape[1] == 0:
        return edge_index
    s, r = edge_index
    n = max(int(edge_index.max()) + 1, 1)
    # canonical undirected key: (min, max) pair id
    lo = np.minimum(s, r).astype(np.int64)
    hi = np.maximum(s, r).astype(np.int64)
    key = lo * n + hi
    uniq, inv = np.unique(key, return_inverse=True)
    keep_pair = rng.random(uniq.shape[0]) >= percent
    keep = keep_pair[inv]
    return edge_index[:, keep]


def download_tu(root: str, name: str) -> None:
    """Download and unpack ``{name}.zip`` from the TU collection
    (reference tu_dataset.py:66-71). Requires network access."""
    import urllib.request

    os.makedirs(root, exist_ok=True)
    zip_path = os.path.join(root, f"{name}.zip")
    urllib.request.urlretrieve(f"{TU_URL}/{name}.zip", zip_path)
    with zipfile.ZipFile(zip_path) as z:
        z.extractall(root)
    os.unlink(zip_path)
    raw_dir = os.path.join(root, name, "raw")
    if os.path.isdir(raw_dir):
        shutil.rmtree(raw_dir)
    extracted = os.path.join(root, name)
    tmp = os.path.join(root, f"__{name}_extract")
    os.rename(extracted, tmp)
    os.makedirs(extracted, exist_ok=True)
    os.rename(tmp, raw_dir)


class TUDataset(Sequence):
    """A processed TU dataset: a sequence of :class:`HostGraph`.

    Layout (reference-compatible): ``{root}/{name}/raw/{name}_*.txt`` and a
    processed cache at ``{root}/{name}/processed/data_{feat_str}.pkl``.
    """

    def __init__(
        self,
        root: str,
        name: str,
        pre_transform: Optional[Callable] = None,
        use_node_attr: bool = True,
        feat_str: str = "",
        pruning_percent: float = 0.0,
        pruning_seed: int = 12345,
    ):
        self.root = root
        self.name = name
        self.feat_str = feat_str
        self.pruning_percent = float(pruning_percent)
        self.pruning_seed = pruning_seed
        self.raw_dir = os.path.join(root, name, "raw")
        self.processed_dir = os.path.join(root, name, "processed")
        self._graphs: List[HostGraph] = []
        self.num_classes = 0

        if not self._load_cache():
            if not os.path.exists(
                os.path.join(self.raw_dir, f"{name}_A.txt")
            ):
                download_tu(os.path.join(root), name)
            self._process(pre_transform, use_node_attr)
            self._save_cache()

    # -- processing ---------------------------------------------------------
    def _process(self, pre_transform, use_node_attr) -> None:
        d = read_tu_data(self.raw_dir, self.name)
        self.num_classes = int(d.y.max()) + 1 if d.y.size else 0
        rng = (np.random.default_rng(self.pruning_seed)
               if self.pruning_percent > 0 else None)
        graphs = []
        for x, e, y in split_graphs(d, use_node_attr=use_node_attr):
            if rng is not None:
                e = prune_edges(e, self.pruning_percent, rng)
            n = x.shape[0] if x is not None else (
                int(e.max()) + 1 if e.size else 1)
            xg = None
            if pre_transform is not None:
                x, e, xg = pre_transform(x, e, n)
            elif x is None:
                x = np.ones((n, 1), np.float32)
            graphs.append(HostGraph(
                x=np.asarray(x, np.float32),
                senders=np.asarray(e[0], np.int32),
                receivers=np.asarray(e[1], np.int32),
                y=y,
                xg=xg,
            ))
        self._graphs = graphs

    # -- cache --------------------------------------------------------------
    @property
    def _cache_path(self) -> str:
        tag = self.feat_str or "raw"
        if self.pruning_percent > 0:
            # reference convention: separate cache file suffixed with
            # percent*100 (tu_dataset.py:30 ``data_%s_XX.pt``)
            tag = f"{tag}_{self.pruning_percent * 100:g}"
        return os.path.join(self.processed_dir, f"data_{tag}.pkl")

    def _save_cache(self) -> None:
        os.makedirs(self.processed_dir, exist_ok=True)
        payload = {
            "version": _CACHE_VERSION,
            "name": self.name,
            "feat_str": self.feat_str,
            "pruning_percent": self.pruning_percent,
            "num_classes": self.num_classes,
            "graphs": [(g.x, g.senders, g.receivers, g.y, g.xg)
                       for g in self._graphs],
        }
        with open(self._cache_path, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)

    def _load_cache(self) -> bool:
        path = self._cache_path
        if not os.path.exists(path):
            return False
        try:
            with open(path, "rb") as f:
                payload = pickle.load(f)
        except Exception:
            return False
        if (payload.get("version") != _CACHE_VERSION
                or payload.get("name") != self.name
                or payload.get("feat_str") != self.feat_str
                or payload.get("pruning_percent", 0.0)
                != self.pruning_percent):
            return False
        self.num_classes = payload["num_classes"]
        self._graphs = [HostGraph(x=x, senders=s, receivers=r, y=y, xg=xg)
                        for x, s, r, y, xg in payload["graphs"]]
        return True

    # -- sequence API -------------------------------------------------------
    @property
    def num_features(self) -> int:
        return int(self._graphs[0].x.shape[1]) if self._graphs else 0

    def __len__(self) -> int:
        return len(self._graphs)

    def __getitem__(self, i):
        return self._graphs[i]

    def __iter__(self):
        return iter(self._graphs)

    def __repr__(self) -> str:  # reference tu_dataset.py:90-91
        return f"{self.name}({len(self)})"
