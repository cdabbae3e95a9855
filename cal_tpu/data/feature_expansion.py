"""Feature-expansion pre-transform — reference ``feature_expansion.py``.

Pure-NumPy, host-side (data prep is not device work): augments node features
with degree, one-hot capped degree, normalized A^k x propagation features and
optional networkx centralities; optionally perturbs or removes edges.

Behavioral parity notes (reference file:line):
* feature order is ``[x ‖ deg ‖ deg_onehot ‖ akx ‖ cent]``
  (feature_expansion.py:59);
* edge noise is applied to the *directed* edge list before anything else
  (feature_expansion.py:45-54);
* A^k x uses symmetric deg^-1/2 normalization with self-loop weight
  ``diag_val=1e-8`` (feature_expansion.py:38,129-168);
* ``remove_edges`` replaces the edge list after feature computation:
  ``"nonself"`` keeps only self-loops, ``"all"`` removes everything
  (feature_expansion.py:61-67);
* ``group_degree`` super-nodes (feature_expansion.py:69-92): nodes with
  degree k (k = 1..group_degree) are collapsed into one super-node row
  ``[count ‖ mean(features)]`` each; surviving nodes are those with
  degree > group_degree (degree-0 nodes are dropped — the reference's
  eq/gt filter chain never selects them); ``xg`` is the [1, N*(1+F)]
  flattened super-node block.  Consumed only by the reference's non-CAL
  ResGCN, but materialized here for full grammar parity.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class FeatureExpander:
    """Stateless per-graph transform: ``transform(x, edge_index, n) -> (x, e, xg)``."""

    def __init__(
        self,
        degree: bool = True,
        onehot_maxdeg: Optional[int] = 0,
        AK: int = 1,
        centrality: bool = False,
        remove_edges: Optional[str] = None,
        edge_noises_add: float = 0.0,
        edge_noises_delete: float = 0.0,
        group_degree: int = 0,
        seed: int = 0,
    ):
        remove_edges = remove_edges or "none"
        assert remove_edges in ("none", "nonself", "all"), remove_edges
        self.degree = degree
        self.onehot_maxdeg = onehot_maxdeg
        self.AK = AK or 0
        self.centrality = centrality
        self.remove_edges = remove_edges
        self.edge_noises_add = edge_noises_add
        self.edge_noises_delete = edge_noises_delete
        self.group_degree = group_degree
        self.edge_norm_diag = 1e-8  # feature_expansion.py:38
        self.rng = np.random.default_rng(seed)

    # -- public API -----------------------------------------------------
    def transform(
        self, x: Optional[np.ndarray], edge_index: np.ndarray, num_nodes: int
    ) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
        """Returns ``(x, edge_index, xg)``; ``xg`` is None unless
        ``group_degree > 0`` (then x shrinks to the surviving nodes and xg
        holds the flattened super-node block, reference :69-92)."""
        if x is None:  # feature_expansion.py:41-42
            x = np.ones((num_nodes, 1), np.float32)
        x = np.asarray(x, np.float32)
        edge_index = np.asarray(edge_index, np.int64).reshape(2, -1)

        # edge noise first (feature_expansion.py:44-54)
        if self.edge_noises_delete > 0:
            e = edge_index.shape[1]
            keep = e - int(e * self.edge_noises_delete)
            idx = self.rng.permutation(e)[:keep]
            edge_index = edge_index[:, idx]
        if self.edge_noises_add > 0:
            n_new = int(edge_index.shape[1] * self.edge_noises_add)
            new = self.rng.integers(0, num_nodes, size=(2, n_new))
            edge_index = np.concatenate([edge_index, new], axis=1)

        deg, deg_onehot = self._compute_degree(edge_index, num_nodes)
        akx = self._compute_akx(num_nodes, x, edge_index)
        cent = self._compute_centrality(edge_index, num_nodes)
        x = np.concatenate([x, deg, deg_onehot, akx, cent], axis=1)

        if self.remove_edges != "none":  # feature_expansion.py:61-67
            if self.remove_edges == "all":
                edge_index = np.zeros((2, 0), np.int64)
            else:  # keep only self-loops
                loop = np.arange(num_nodes, dtype=np.int64)
                edge_index = np.stack([loop, loop])

        xg = None
        if self.group_degree > 0:  # feature_expansion.py:69-92
            assert self.remove_edges == "all", "remove all edges"
            x, xg = self._group_by_degree(x, deg.reshape(-1))
        return x.astype(np.float32), edge_index, xg

    # make the instance itself usable as a pre_transform callable
    __call__ = transform

    def _group_by_degree(self, x, deg_base):
        """Collapse degree-k nodes (k=1..group_degree) into mean super-nodes
        (reference feature_expansion.py:69-92).  Quirks kept: degree-0 nodes
        are dropped (the eq/gt filter chain never selects them); an empty
        group contributes ``[count=0 ‖ zeros]``; if no node survives, x
        becomes a single zero row."""
        x_base = x
        super_nodes = []
        zero_row = np.zeros((1, x.shape[1]), np.float32)
        for k in range(1, self.group_degree + 1):
            eq = deg_base == k
            gt = deg_base > k
            x_to_group = x_base[eq]
            x_base = x_base[gt]
            deg_base = deg_base[gt]
            count = np.full((1, 1), x_to_group.shape[0], np.float32)
            if x_to_group.shape[0] == 0:
                super_nodes.append(np.concatenate([count, zero_row], axis=1))
            else:
                super_nodes.append(np.concatenate(
                    [count, x_to_group.mean(0, keepdims=True)], axis=1))
        if x_base.shape[0] == 0:
            x_base = zero_row
        xg = np.concatenate(super_nodes, axis=0).reshape(1, -1)
        return x_base.astype(np.float32), xg.astype(np.float32)

    # -- features ---------------------------------------------------------
    def _compute_degree(self, edge_index, num_nodes):
        row = edge_index[0]
        deg = np.bincount(row, minlength=num_nodes).astype(np.float32)
        deg_col = deg[:, None]

        if self.onehot_maxdeg is not None and self.onehot_maxdeg > 0:
            capped = np.minimum(deg, self.onehot_maxdeg).astype(np.int64)
            onehot = np.zeros((num_nodes, self.onehot_maxdeg + 1), np.float32)
            onehot[np.arange(num_nodes), capped] = 1.0
        else:
            onehot = np.zeros((num_nodes, 0), np.float32)

        if not self.degree:
            deg_col = np.zeros((num_nodes, 0), np.float32)
        return deg_col, onehot

    def _compute_akx(self, num_nodes, x, edge_index):
        """[A_norm x ‖ A_norm² x ‖ …] with diag-1e-8 symmetric norm
        (feature_expansion.py:129-168)."""
        if self.AK <= 0:
            return np.zeros((num_nodes, 0), np.float32)

        row, col = edge_index
        keep = row != col                       # remove_self_loops
        row, col = row[keep], col[keep]
        w = np.ones(row.shape[0], np.float64)
        loop = np.arange(num_nodes, dtype=np.int64)
        row = np.concatenate([row, loop])
        col = np.concatenate([col, loop])
        w = np.concatenate([w, np.full(num_nodes, self.edge_norm_diag)])

        deg = np.zeros(num_nodes, np.float64)
        np.add.at(deg, row, w)
        with np.errstate(divide="ignore"):
            dis = np.where(deg > 0, deg ** -0.5, 0.0)
        norm = dis[row] * w * dis[col]

        xs, cur = [], x.astype(np.float64)
        for _ in range(self.AK):
            out = np.zeros_like(cur)
            # flow source_to_target: aggregate norm·x[source] at target
            np.add.at(out, col, norm[:, None] * cur[row])
            cur = out
            xs.append(cur.astype(np.float32))
        return np.concatenate(xs, axis=1)

    def _compute_centrality(self, edge_index, num_nodes):
        """closeness / betweenness / pagerank (feature_expansion.py:115-127)."""
        if not self.centrality:
            return np.zeros((num_nodes, 0), np.float32)
        import networkx as nx

        g = nx.Graph(edge_index.T.tolist())
        g.add_nodes_from(range(num_nodes))
        closeness = nx.algorithms.closeness_centrality(g)
        betweenness = nx.algorithms.betweenness_centrality(g)
        pagerank = nx.pagerank(g)
        return np.array(
            [[closeness[i], betweenness[i], pagerank[i]]
             for i in range(num_nodes)], np.float32)
