"""Device mesh + batch sharding helpers.

The reference (yongduosui/CAL) is strictly single-process, single-device
(reference train.py:15, train_causal.py:10; no torch.distributed anywhere) —
all parallelism here is new TPU-native scope (SURVEY.md §2.3).

Mesh axes:
  * ``dp``   — data parallelism: the graph dimension of a padded batch is
    sharded; XLA inserts gradient psums and keeps masked-BatchNorm statistics
    *global* (exact single-device numerics — a per-device-BN shard_map design
    would silently change them).
  * ``edge`` — edge partitioning of the batched mega-graph (the context/
    sequence-parallel analog for GNNs): see edge_partition.py.
"""
from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cal_tpu.graph import (
    DenseGraphBatch,
    GraphBatch,
    PackedDenseBatch,
    PartitionedGraphBatch,
)


def make_mesh(dp: int | None = None, edge: int = 1, devices=None) -> Mesh:
    """Mesh over available devices; default puts everything on ``dp``."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // edge
    if dp * edge != n:
        raise ValueError(f"dp({dp}) * edge({edge}) != device count ({n})")
    arr = np.asarray(devices).reshape(dp, edge)
    return Mesh(arr, ("dp", "edge"))


# PartitionSpecs per batch leaf: graph-indexed leaves shard over dp; the flat
# edge arrays of PackedDenseBatch are index lists *into* graph slots — they
# shard over dp too (XLA routes the scatter in graph.to_dense across shards).
_DENSE_SPECS = dict(
    x=P("dp"), adj=P("dp"), node_mask=P("dp"), y=P("dp"), graph_mask=P("dp")
)
_PACKED_SPECS = dict(
    x=P("dp"), edge_flat=P("dp"), n_nodes=P("dp"), y=P("dp"),
)
# Sparse layout: nodes/edges of the disjoint union shard over dp (graph
# boundaries don't align with shard boundaries; segment ops cross shards via
# XLA-inserted collectives — the explicit-collective path is edge_partition.py).
_SPARSE_SPECS = dict(
    x=P("dp"), senders=P("dp"), receivers=P("dp"), edge_mask=P("dp"),
    node_mask=P("dp"), node_graph=P("dp"), y=P("dp"), graph_mask=P("dp"),
)
# Edge-partitioned layout (graph.py PartitionedGraphBatch): node/edge arrays
# shard over BOTH axes (dp-group-major, shard-major rows — the planner's
# layout contract), graph arrays over dp only; per-shard tile plans (leaves
# stacked [n_shards, ...]) shard like the edge arrays.
_PART_SPECS = dict(
    x=P(("dp", "edge")), node_mask=P(("dp", "edge")),
    node_graph=P(("dp", "edge")), senders_tab=P(("dp", "edge")),
    senders_glb=P(("dp", "edge")), receivers=P(("dp", "edge")),
    edge_mask=P(("dp", "edge")),
    send_idx=P(("dp", "edge"), None, None),
    send_mask=P(("dp", "edge"), None, None),
    y=P("dp"), graph_mask=P("dp"), tiles=P(("dp", "edge")),
)


def batch_pspecs(batch):
    if isinstance(batch, DenseGraphBatch):
        specs = _DENSE_SPECS
    elif isinstance(batch, PackedDenseBatch):
        specs = _PACKED_SPECS
    elif isinstance(batch, PartitionedGraphBatch):
        specs = _PART_SPECS
    elif isinstance(batch, GraphBatch):
        specs = _SPARSE_SPECS
    else:
        raise TypeError(type(batch))

    def leaf_spec(path, _leaf):
        return specs[path[0].name]

    return jax.tree_util.tree_map_with_path(leaf_spec, batch)


def normalize_for_mesh(batch):
    """Strip batch plans that don't survive mesh sharding.

    * GraphBatch block-COO tile plans index the *global* node space — under
      dp sharding the convs fall back to XLA segment ops.
    * DenseGraphBatch.edge_flat / PackedDenseBatch.eg_budget > 0 route
      ``to_dense`` through the one-hot adj-build Pallas kernel
      (ops/pallas_adj.py), which reads GLOBAL flat indices — a dp-sharded
      edge_flat slice doesn't align with the device's graph-slot shard, so
      GSPMD would replicate the full [B, N, N] build per device (or fail to
      lower).  Zeroing the budget selects the XLA sorted-scatter path, which
      GSPMD partitions correctly (see _PACKED_SPECS note)."""
    import dataclasses

    if isinstance(batch, GraphBatch) and batch.tiles is not None:
        batch = dataclasses.replace(batch, tiles=None)
    if isinstance(batch, DenseGraphBatch) and batch.edge_flat is not None:
        batch = dataclasses.replace(batch, edge_flat=None, eg_budget=0)
    if isinstance(batch, PackedDenseBatch) and batch.eg_budget > 0:
        batch = dataclasses.replace(batch, eg_budget=0)
    return batch


# back-compat alias used by dp.py
_drop_packed_pallas = normalize_for_mesh


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with dp sharding over the graph dimension
    (plans that don't survive sharding are stripped, ``normalize_for_mesh``)."""
    batch = normalize_for_mesh(batch)
    shardings = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), batch_pspecs(batch)
    )
    return jax.device_put(batch, shardings)


def shard_stacked(stacked, mesh: Mesh):
    """Device-put a ``stack_batches`` result (leading scan axis) — the scan
    axis is replicated, per-batch dims shard as in ``batch_pspecs``."""
    stacked = normalize_for_mesh(stacked)
    shardings = jax.tree.map(
        lambda spec: NamedSharding(mesh, P(None, *spec)),
        batch_pspecs(stacked),
    )
    return jax.device_put(stacked, shardings)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) over the mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)
