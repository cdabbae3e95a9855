"""Static-shape batching loader (replaces PyG DataLoader, train_causal.py:13-15).

XLA needs static shapes, so budgets are fixed per loader:
* dense layout: node budget N = max graph size rounded up to a multiple of 8
  lanes-friendly size; batches ship as PackedDenseBatch (compact edges).
* sparse layout: node/edge budgets sized for the worst batch (sum of the
  ``batch_size`` largest graphs) so no recompilation ever triggers.

Every epoch yields ceil(len/batch_size) batches; the last one is padded and
masked (the reference's dynamic last batch, handled statically).
"""
from __future__ import annotations

import math
from typing import Iterator, Sequence

import numpy as np

from cal_tpu.graph import (
    GraphBatch,
    HostGraph,
    PackedDenseBatch,
    batch_graphs,
    pack_dense,
    pad_sizes_for,
)


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def compute_budgets(
    graphs: Sequence[HostGraph], batch_size: int, layout: str
) -> dict:
    """Static budgets covering any batch drawn from ``graphs``."""
    if layout == "dense":
        node_budget = _round_up(max(g.num_nodes for g in graphs), 8)
        e_sorted = sorted((g.num_edges for g in graphs), reverse=True)
        edge_budget = _round_up(max(sum(e_sorted[:batch_size]), 1), 128)
        return {"node_budget": node_budget, "edge_budget": edge_budget}
    pad_n, pad_e = pad_sizes_for(graphs, batch_size)
    return {"node_budget": pad_n, "edge_budget": pad_e}


class Loader:
    """Shuffling, padding, static-shape batch iterator."""

    def __init__(
        self,
        graphs: Sequence[HostGraph],
        batch_size: int,
        shuffle: bool = False,
        layout: str = "dense",
        budgets: dict | None = None,
        seed: int = 0,
        drop_remainder: bool = False,
    ):
        assert layout in ("dense", "sparse")
        self.graphs = list(graphs)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.layout = layout
        self.budgets = budgets or compute_budgets(graphs, batch_size, layout)
        self.rng = np.random.default_rng(seed)
        self.drop_remainder = drop_remainder

    def __len__(self) -> int:
        n = len(self.graphs)
        return n // self.batch_size if self.drop_remainder else math.ceil(
            n / self.batch_size
        )

    @property
    def num_graphs(self) -> int:
        return len(self.graphs)

    def __iter__(self) -> Iterator:
        order = np.arange(len(self.graphs))
        if self.shuffle:
            self.rng.shuffle(order)
        bs = self.batch_size
        for i in range(len(self)):
            chunk = [self.graphs[j] for j in order[i * bs : (i + 1) * bs]]
            if self.layout == "dense":
                yield pack_dense(
                    chunk, bs, self.budgets["node_budget"], self.budgets["edge_budget"]
                )
            else:
                yield batch_graphs(
                    chunk, bs, self.budgets["node_budget"], self.budgets["edge_budget"]
                )
