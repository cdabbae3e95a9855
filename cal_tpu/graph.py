"""Static-shape graph batch containers for TPU/XLA.

The reference framework (yongduosui/CAL) relies on PyG's dynamic-shape
``Batch`` collation (reference: train_causal.py:13-15).  XLA requires static
shapes, so the TPU-native design uses *padded disjoint-union batches*:

* nodes of all graphs concatenated and padded to ``num_nodes`` rows;
* directed edges concatenated (with node-index offsets) and padded to
  ``num_edges``;
* graphs padded to ``num_graphs`` slots, **valid graphs always form a
  contiguous prefix** (this invariant makes the device-side intervention
  permutation cheap — see models/causal.py).

Padded nodes are assigned to an extra "trash" segment (id == num_graphs) so
segment reductions never pollute real graph readouts.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphBatch:
    """A padded disjoint-union batch of graphs (all leaves fixed-shape).

    Attributes:
      x:          [num_nodes, feat]  node features (padded rows are zero).
      senders:    [num_edges] int32  source node index of each directed edge.
      receivers:  [num_edges] int32  target node index of each directed edge.
      edge_mask:  [num_edges] bool   True for real edges.
      node_mask:  [num_nodes] bool   True for real nodes.
      node_graph: [num_nodes] int32  graph id per node; padded nodes -> G.
      y:          [num_graphs] int32 labels (padded slots are 0).
      graph_mask: [num_graphs] bool  True for real graphs (contiguous prefix).
      tiles:      optional (tiles_fwd, tiles_bwd) block-COO plans
                  (ops/pallas_spmm.py SpmmTiles) — present when the loader
                  was built with ``spmm_tiles=True``; convs then route the
                  gather/scatter through the tiled Pallas kernel.
    """

    x: jax.Array
    senders: jax.Array
    receivers: jax.Array
    edge_mask: jax.Array
    node_mask: jax.Array
    node_graph: jax.Array
    y: jax.Array
    graph_mask: jax.Array
    tiles: tuple | None = None

    @property
    def num_nodes(self) -> int:
        return self.x.shape[0]

    @property
    def num_edges(self) -> int:
        return self.senders.shape[0]

    @property
    def num_graphs(self) -> int:
        return self.y.shape[0]

    @property
    def n_real_graphs(self) -> jax.Array:
        return self.graph_mask.sum()


def pad_sizes_for(
    graphs: Sequence, batch_size: int, multiple: int = 128
) -> tuple[int, int]:
    """Safe static (node, edge) budgets for any ``batch_size``-graph batch.

    Upper bound = sum of the ``batch_size`` largest graphs, rounded up so
    recompilation never triggers across epochs/shuffles.
    """
    n_nodes = sorted((int(g.x.shape[0]) for g in graphs), reverse=True)
    n_edges = sorted((int(g.senders.shape[0]) for g in graphs), reverse=True)
    pad_n = sum(n_nodes[:batch_size]) + 1
    pad_e = max(sum(n_edges[:batch_size]), 1)
    rup = lambda v: ((v + multiple - 1) // multiple) * multiple
    return rup(pad_n), rup(pad_e)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseGraphBatch:
    """Dense padded graph batch — the primary TPU layout.

    CAL-style graph-classification graphs are small (synthetic <=241 nodes,
    reference utils.py:62-63; TU molecules <=~620), so each graph is padded to
    a static node budget N and message passing becomes **batched masked
    matmuls on the MXU** — no gather/scatter at all.  This replaces the
    reference's PyG sparse ``propagate`` (gcn_conv.py:92) for small graphs.

    Attributes:
      x:          [B, N, F]  node features (padded rows zero).
      adj:        [B, N, N]  adjacency; adj[b, r, s] = 1 iff directed edge
                  s -> r ("row=receiver" to mirror reference gcn_conv.py:65-70
                  scatter-to-row).  No self loops (convs add their own,
                  reference gcn_conv.py:56-63).
      node_mask:  [B, N] bool  True for real nodes.
      y:          [B] int32  labels.
      graph_mask: [B] bool  True for real graphs (contiguous prefix).
      edge_flat:  optional [E] sorted flat edge indices (the PackedDenseBatch
                  form, carried through to_dense) — lets the GAT backbone run
                  the edge-formulated attention kernel
                  (ops/pallas_gat_sparse.py) instead of N^2 dense softmax.
      eg_budget:  static — max edges per graph budget for that kernel.
    """

    x: jax.Array
    adj: jax.Array
    node_mask: jax.Array
    y: jax.Array
    graph_mask: jax.Array
    edge_flat: jax.Array | None = None
    eg_budget: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def num_graphs(self) -> int:
        return self.y.shape[0]

    @property
    def node_budget(self) -> int:
        return self.x.shape[1]


def densify(
    graphs: Sequence["HostGraph"],
    num_graphs: int,
    node_budget: int,
    dtype=np.float32,
) -> DenseGraphBatch:
    """Collate host graphs into a DenseGraphBatch (host-side NumPy)."""
    g = len(graphs)
    if g > num_graphs:
        raise ValueError(f"{g} graphs > budget {num_graphs}")
    feat = graphs[0].x.shape[1]
    x = np.zeros((num_graphs, node_budget, feat), dtype)
    adj = np.zeros((num_graphs, node_budget, node_budget), dtype)
    node_mask = np.zeros((num_graphs, node_budget), bool)
    y = np.zeros((num_graphs,), np.int32)
    graph_mask = np.zeros((num_graphs,), bool)
    for i, gr in enumerate(graphs):
        n = gr.num_nodes
        if n > node_budget:
            raise ValueError(f"graph has {n} nodes > node budget {node_budget}")
        x[i, :n] = gr.x
        # receivers index rows (reference scatter-to-row, gcn_conv.py:66).
        # np.add.at keeps duplicate-edge multiplicity (attention weights are a
        # function of endpoint features, so duplicates share one weight and
        # multiplicity-counting reproduces sparse semantics exactly).
        np.add.at(adj[i], (gr.receivers, gr.senders), 1.0)
        node_mask[i, :n] = True
        y[i] = gr.y
        graph_mask[i] = True
    return DenseGraphBatch(
        x=jnp.asarray(x),
        adj=jnp.asarray(adj),
        node_mask=jnp.asarray(node_mask),
        y=jnp.asarray(y),
        graph_mask=jnp.asarray(graph_mask),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedDenseBatch:
    """Compact host->device form of a dense batch.

    Shipping a [B, N, N] adjacency over PCIe every step wastes bandwidth
    (~33 MB/batch at B=128, N=256 fp32); instead the host packs each edge as
    ONE flattened index ``(g*N + receiver)*N + sender`` (sorted ascending,
    padding pushed past B*N*N) and ``to_dense`` rebuilds the adjacency with
    a single sorted 1-D scatter-add inside the jitted step — measured ~50x
    faster on TPU than a 3-index ``.at[g, r, s].add`` scatter.

    Masks are NOT shipped — they are derived on device (node_mask from
    ``n_nodes``, graph_mask = n_nodes > 0, padded edges dropped by their
    out-of-range sentinel index), minimizing host work + PCIe bytes.

    Attributes:
      x:          [B, N, F]  node features.
      edge_flat:  [E] int32/int64  flat adjacency index per edge, sorted;
                  padded edges hold B*N*N (out of range -> scatter-dropped).
      n_nodes:    [B] int32  real node count per slot (0 for padded slots;
                  real graphs form a contiguous prefix).
      y:          [B] int32.
      eg_budget:  static — upper bound on edges per graph (loader budget);
                  > 0 routes ``to_dense`` through the one-hot MXU build
                  kernel (ops/pallas_adj.py, 3.8x the XLA scatter), 0 keeps
                  the XLA scatter path.
    """

    x: jax.Array
    edge_flat: jax.Array
    n_nodes: jax.Array
    y: jax.Array
    eg_budget: int = dataclasses.field(metadata=dict(static=True), default=0)


def pack_dense(
    graphs: Sequence["HostGraph"],
    num_graphs: int,
    node_budget: int,
    edge_budget: int,
    dtype=np.float32,
) -> PackedDenseBatch:
    """Collate host graphs into a PackedDenseBatch (host-side NumPy)."""
    g = len(graphs)
    if g > num_graphs:
        raise ValueError(f"{g} graphs > budget {num_graphs}")
    tot_e = sum(gr.num_edges for gr in graphs)
    if tot_e > edge_budget:
        raise ValueError(f"{tot_e} edges > budget {edge_budget}")
    feat = graphs[0].x.shape[1]
    n2 = node_budget * node_budget
    x = np.zeros((num_graphs, node_budget, feat), dtype)
    # padded slots point one past the last flat cell -> dropped on device
    edge_flat = np.full((edge_budget,), num_graphs * n2, np.int64)
    n_nodes = np.zeros((num_graphs,), np.int32)
    y = np.zeros((num_graphs,), np.int32)
    e_off = 0
    for i, gr in enumerate(graphs):
        n, e = gr.num_nodes, gr.num_edges
        if n > node_budget:
            raise ValueError(f"graph has {n} nodes > node budget {node_budget}")
        x[i, :n] = gr.x
        edge_flat[e_off : e_off + e] = (
            (i * node_budget + gr.receivers.astype(np.int64)) * node_budget
            + gr.senders
        )
        n_nodes[i] = n
        y[i] = gr.y
        e_off += e
    edge_flat[:e_off].sort(kind="stable")          # sorted scatter on device
    eg = max((gr.num_edges for gr in graphs), default=0)
    return pack_from_arrays(x, edge_flat, n_nodes, y, eg_budget=eg)


def pack_from_arrays(x, edge_flat, n_nodes, y,
                     eg_budget: int = 0) -> PackedDenseBatch:
    num_graphs, node_budget = x.shape[0], x.shape[1]
    idx_dtype = (jnp.int32 if num_graphs * node_budget * node_budget < 2**31
                 else jnp.int64)
    return PackedDenseBatch(
        x=jnp.asarray(x),
        edge_flat=jnp.asarray(edge_flat, dtype=idx_dtype),
        n_nodes=jnp.asarray(n_nodes),
        y=jnp.asarray(y),
        eg_budget=int(eg_budget),
    )


def to_dense(p: PackedDenseBatch, dtype=None,
             use_pallas: bool = True) -> DenseGraphBatch:
    """Materialize adjacency + masks on device (jit-friendly).

    Default path: per-graph one-hot MXU contraction (ops/pallas_adj.py,
    exact integer counts, 3.8x the scatter — the scatter was the biggest
    single op in the causal train steps).  Falls back to the sorted 1-D
    XLA scatter-add when the batch carries no per-graph edge budget or
    needs int64 indices."""
    dtype = dtype or p.x.dtype
    b, n, _ = p.x.shape
    if use_pallas and p.eg_budget > 0 and p.edge_flat.dtype == jnp.int32:
        from cal_tpu.ops.pallas_adj import adj_build

        adj = adj_build(p.edge_flat, b, n, p.eg_budget, dtype)
    else:
        adj = (
            jnp.zeros((b * n * n,), dtype)
            .at[p.edge_flat]
            .add(1.0, mode="drop", indices_are_sorted=True)
            .reshape(b, n, n)
        )
    node_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (b, n), 1) < p.n_nodes[:, None]
    )
    return DenseGraphBatch(
        x=p.x.astype(dtype),
        adj=adj,
        node_mask=node_mask,
        y=p.y,
        graph_mask=p.n_nodes > 0,
        edge_flat=(p.edge_flat if p.eg_budget > 0
                   and p.edge_flat.dtype == jnp.int32 else None),
        eg_budget=p.eg_budget,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PartitionedGraphBatch:
    """Edge-partitioned padded batch — the context-parallel analog layout.

    Built by ``parallel/partition.py`` for a ``Mesh(('dp', 'edge'))``; the
    reference has no counterpart (it scales nothing, SURVEY.md §2.3) — the
    scaling dimension of this workload is edges (SURVEY.md §5 long-context).

    Layout invariants (host planner, parallel/partition.py):
      * graphs are assigned to ``dp`` groups in contiguous slot blocks
        (graph slot ids are GLOBAL, so pooling/losses are mesh-agnostic);
      * within a group, nodes are packed contiguously and split into
        ``edge``-many equal blocks of ``Vl`` rows (shard = owner);
      * every edge lives on the shard that owns its RECEIVER, so segment
        reductions and the GAT edge-softmax are fully shard-local;
      * sender features cross shards via a precomputed boundary ("halo")
        exchange: ``send_idx[p, d]`` lists the rows shard ``p`` ships to
        shard ``d`` (one all_to_all of only the boundary rows per layer —
        NOT a full [V, H] all_gather).

    Node/edge leaves are global-shaped and shard as P(('dp', 'edge'));
    graph leaves shard as P('dp').  The per-shard views below are what a
    shard_map body sees.

    Attributes:
      x:           [V, F]   node features (dp-group-major, shard-major rows).
      node_mask:   [V]      True for real nodes.
      node_graph:  [V]      GLOBAL graph slot per node; padding -> G.
      senders_tab: [E]      per-shard-local index into the shard's feature
                            table ``concat([x_local (Vl rows), halo (n*S)])``.
      senders_glb: [E]      dp-group-global sender id (degree psum).
      receivers:   [E]      shard-local receiver id in [0, Vl); sorted
                            non-decreasing within each shard.
      edge_mask:   [E]      True for real edges.
      send_idx:    [n_shards, n_edge, S]  local rows to send to each peer.
      send_mask:   [n_shards, n_edge, S]  True for live send slots.
      y:           [G]      labels; graph_mask [G] True for real graphs
                            (contiguous prefix per dp group, NOT globally).
      tiles:       optional per-shard block-COO plans (SpmmTiles with
                   shard-local indices, leaves stacked [n_shards, ...]) —
                   lets dp/edge-sharded training keep the Pallas SpMM.
      mesh:        static — the ('dp', 'edge') Mesh this plan was built for.
    """

    x: jax.Array
    node_mask: jax.Array
    node_graph: jax.Array
    senders_tab: jax.Array
    senders_glb: jax.Array
    receivers: jax.Array
    edge_mask: jax.Array
    send_idx: jax.Array
    send_mask: jax.Array
    y: jax.Array
    graph_mask: jax.Array
    tiles: tuple | None = None
    mesh: object = dataclasses.field(metadata=dict(static=True), default=None)

    @property
    def num_nodes(self) -> int:
        return self.x.shape[0]

    @property
    def num_graphs(self) -> int:
        return self.y.shape[0]

    @property
    def n_shards(self) -> int:
        return self.send_idx.shape[0]

    @property
    def n_edge_shards(self) -> int:
        return self.send_idx.shape[1]

    @property
    def halo_budget(self) -> int:
        return self.send_idx.shape[2]

    @property
    def nodes_per_shard(self) -> int:
        return self.x.shape[0] // self.n_shards


@dataclasses.dataclass(frozen=True)
class HostGraph:
    """A single un-batched graph on the host (NumPy)."""

    x: np.ndarray          # [n, feat] float32
    senders: np.ndarray    # [e] int (directed; undirected graphs store both dirs)
    receivers: np.ndarray  # [e] int
    y: int
    # degree-grouped super-node features from FeatureExpander's ``groupd<N>``
    # production (reference feature_expansion.py:69-92): [1, N*(1+feat)] or
    # None.  Consumed by the reference's non-CAL ResGCN only — carried for
    # feature parity, no CAL model reads it.
    xg: "np.ndarray | None" = None

    @property
    def num_nodes(self) -> int:
        return self.x.shape[0]

    @property
    def num_edges(self) -> int:
        return self.senders.shape[0]


def batch_graphs(
    graphs: Sequence[HostGraph],
    num_graphs: int,
    num_nodes: int,
    num_edges: int,
    sort_edges_by_receiver: bool = True,
) -> GraphBatch:
    """Collate host graphs into one padded ``GraphBatch`` (NumPy, host-side).

    Mirrors PyG disjoint-union batching (concat + offset edge indices) but
    with static padding.  Edges are optionally sorted by receiver so device
    segment-reductions can use ``indices_are_sorted=True`` and the Pallas
    SpMM kernel can tile contiguous receiver ranges.
    """
    g = len(graphs)
    if g > num_graphs:
        raise ValueError(f"{g} graphs > budget {num_graphs}")
    tot_n = sum(gr.num_nodes for gr in graphs)
    tot_e = sum(gr.num_edges for gr in graphs)
    if tot_n > num_nodes or tot_e > num_edges:
        raise ValueError(
            f"batch needs ({tot_n} nodes, {tot_e} edges) > budget "
            f"({num_nodes}, {num_edges})"
        )
    feat = graphs[0].x.shape[1]
    x = np.zeros((num_nodes, feat), np.float32)
    senders = np.zeros((num_edges,), np.int32)
    receivers = np.zeros((num_edges,), np.int32)
    edge_mask = np.zeros((num_edges,), bool)
    node_mask = np.zeros((num_nodes,), bool)
    # Padded nodes go to trash segment `num_graphs`.
    node_graph = np.full((num_nodes,), num_graphs, np.int32)
    y = np.zeros((num_graphs,), np.int32)
    graph_mask = np.zeros((num_graphs,), bool)

    n_off = e_off = 0
    for i, gr in enumerate(graphs):
        n, e = gr.num_nodes, gr.num_edges
        x[n_off : n_off + n] = gr.x
        senders[e_off : e_off + e] = gr.senders + n_off
        receivers[e_off : e_off + e] = gr.receivers + n_off
        edge_mask[e_off : e_off + e] = True
        node_mask[n_off : n_off + n] = True
        node_graph[n_off : n_off + n] = i
        y[i] = gr.y
        graph_mask[i] = True
        n_off += n
        e_off += e

    # Padded edges point at the last (always-padded if budgets leave room,
    # otherwise harmless since their mask is False) node slot.
    senders[e_off:] = num_nodes - 1
    receivers[e_off:] = num_nodes - 1

    if sort_edges_by_receiver:
        order = np.argsort(receivers, kind="stable")
        senders, receivers, edge_mask = (
            senders[order],
            receivers[order],
            edge_mask[order],
        )

    return GraphBatch(
        x=jnp.asarray(x),
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        edge_mask=jnp.asarray(edge_mask),
        node_mask=jnp.asarray(node_mask),
        node_graph=jnp.asarray(node_graph),
        y=jnp.asarray(y),
        graph_mask=jnp.asarray(graph_mask),
    )
