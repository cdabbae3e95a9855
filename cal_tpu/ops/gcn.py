"""GCN aggregation with edge weights and implicit self loops.

Reproduces the reference ``GCNConv.norm`` semantics (gcn_conv.py:44-70) under
PyG-1.1.0 ``MessagePassing`` conventions, where for an edge
``(u, v) = (edge_index[0], edge_index[1])`` the message ``x_u`` is aggregated
at ``v`` (flow='source_to_target': ``x_j = x[edge_index[0]]``, scatter at
``edge_index[1]``):

1. drop any self loops *and their weights* (gcn_conv.py:56);
2. add one self loop per node with weight 1 (original self-loop weight is
   discarded — a documented reference quirk, gcn_conv.py:57-63);
3. ``deg[n] = sum of weights of edges with sender n`` + 1 (the self loop)
   — note: **sender** degree (scatter over ``row = edge_index[0]``,
   gcn_conv.py:66), which differs from receiver degree when causal/shortcut
   attention weights are asymmetric;
4. edge u->v contributes ``deg[u]^-1/2 * w * deg[v]^-1/2 * x_u`` at v; the
   self loop contributes ``x_v / deg[v]``.

Instead of materializing self-loop edges (dynamic edge count, XLA-hostile),
both layouts treat the self loop analytically — identical numerics, static
shapes.  Dense layout: one batched matmul on the MXU.  Sparse layout:
gather + segment-sum (Pallas kernel for the hot path).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cal_tpu.graph import DenseGraphBatch, GraphBatch, PartitionedGraphBatch
from cal_tpu.ops.segment import segment_sum


def gcn_aggregate_dense(
    x: jax.Array,
    adj: jax.Array,
    edge_weight: jax.Array | None = None,
) -> jax.Array:
    """Normalized GCN aggregation, dense layout.

    Args:
      x:    [B, N, H] node features (already linearly transformed).
      adj:  [B, N, N] adjacency counts with adj[b, r, s] = multiplicity of
            edge s -> r (row = receiver).
      edge_weight: optional [B, N, N] per-edge weights with
            edge_weight[b, r, s] = weight of edge s -> r (e.g. the
            causal/shortcut attention masks); only entries with adj>0 matter.

    Returns: [B, N, H].
    """
    n = adj.shape[-1]
    eye = jnp.eye(n, dtype=adj.dtype)
    offdiag = adj * (1.0 - eye)          # remove_self_loops (gcn_conv.py:56)
    m = offdiag if edge_weight is None else offdiag * edge_weight.astype(adj.dtype)
    # sender degree: sum over receivers (axis -2), +1 self loop (:59-66).
    # Degree reduction always accumulates f32 (exact for bf16 count adj).
    deg = m.sum(axis=-2, dtype=jnp.float32) + 1.0
    dis = jax.lax.rsqrt(deg).astype(m.dtype)  # keep norm in the adj dtype
    # norm[r,s] = deg_s^-1/2 * m[r,s] * deg_r^-1/2   (gcn_conv.py:70)
    norm = dis[..., :, None] * m * dis[..., None, :]
    # MXU accumulates f32 regardless of storage dtype; cast fuses into the
    # einsum epilogue (mixed-precision mode: norm/x bf16 halve HBM traffic).
    out = jnp.einsum("brs,bsh->brh", norm, x,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    # self-loop term at v: deg_v^-1/2 * 1 * deg_v^-1/2 * x_v
    return out + x / deg[..., None].astype(x.dtype)


def gcn_aggregate_sparse(
    x: jax.Array,
    senders: jax.Array,
    receivers: jax.Array,
    edge_mask: jax.Array,
    edge_weight: jax.Array | None = None,
    indices_are_sorted: bool = True,
) -> jax.Array:
    """Normalized GCN aggregation, sparse (padded edge list) layout.

    Args:
      x: [V, H]; senders/receivers/edge_mask: [E] (receiver-sorted).
      edge_weight: optional [E], weight of edge senders[e] -> receivers[e].
      indices_are_sorted: receivers are non-decreasing (batcher guarantees).
    """
    num_nodes = x.shape[0]
    ew = jnp.ones_like(senders, dtype=x.dtype) if edge_weight is None else edge_weight
    # mask out padding and any self loops (their weights are dropped,
    # reference gcn_conv.py:56).
    live = edge_mask & (senders != receivers)
    ew = jnp.where(live, ew, 0.0)
    # sender degree (scatter over edge_index[0], gcn_conv.py:66); sender ids
    # are not sorted even when receivers are.
    deg = segment_sum(ew, senders, num_nodes, indices_are_sorted=False) + 1.0
    dis = jax.lax.rsqrt(deg)
    norm = dis[senders] * ew * dis[receivers]
    msg = norm[:, None] * jnp.take(x, senders, axis=0)
    out = segment_sum(msg, receivers, num_nodes, indices_are_sorted)
    return out + x / deg[:, None]


def gcn_aggregate(x, g, edge_weight=None, use_pallas: bool = True):
    """Layout dispatch (fused Pallas dense / dense MXU / Pallas block-COO
    tiles / XLA segment).  ``edge_weight`` may be a dense [B, N, N] array or
    a factored ``SigmoidEdgeWeight`` (the causal attention weights in
    un-materialized form — the fused kernel rebuilds them in VMEM)."""
    from cal_tpu.ops.pallas_gcn import SigmoidEdgeWeight, fused_gcn_dense_att

    if isinstance(g, DenseGraphBatch):
        if isinstance(edge_weight, SigmoidEdgeWeight):
            if use_pallas:
                return fused_gcn_dense_att(
                    x, g.adj, edge_weight.src, edge_weight.dst,
                    edge_weight.negate)
            edge_weight = edge_weight.materialize()
        # NOTE: the UNWEIGHTED backbone conv deliberately stays on XLA even
        # at use_pallas=True: the fused_gcn_dense Pallas kernel costs ~3M
        # edges/s in the full bf16 model (35.3M vs 38.3M measured on chip)
        # because it breaks XLA's BN/ReLU fusion chain around the conv.  The
        # attention-weighted kernels (fused_gcn_dense_att[_dual]) DO win
        # (~+1.5M) — they avoid materializing the [B, N, N] weights.
        return gcn_aggregate_dense(x, g.adj, edge_weight)
    if isinstance(g, PartitionedGraphBatch):
        # edge-partitioned layout: receiver-owned shards + halo exchange
        # (parallel/edge_partition.py) inside a shard_map over g.mesh.
        from cal_tpu.parallel.edge_partition import partitioned_gcn_aggregate

        return partitioned_gcn_aggregate(x, g, edge_weight)
    assert isinstance(g, GraphBatch)
    if isinstance(edge_weight, SigmoidEdgeWeight):
        if g.tiles is not None and g.tiles[0].sglb is not None:
            from cal_tpu.ops.pallas_spmm import (
                gcn_aggregate_sparse_sigmoid_pallas)

            tf, tb = g.tiles
            return gcn_aggregate_sparse_sigmoid_pallas(
                x, edge_weight.src, edge_weight.dst, tf, tb,
                edge_weight.negate, node_block=tf.node_block)
        # no tile plans: materialize the per-edge weights (sparse analog
        # of SigmoidEdgeWeight.materialize) and fall through
        w = jax.nn.sigmoid(
            jnp.take(edge_weight.src, g.senders, axis=0)
            + jnp.take(edge_weight.dst, g.receivers, axis=0))
        edge_weight = ((1.0 - w) if edge_weight.negate else w).astype(
            x.dtype)
    if g.tiles is not None:
        tf, tb = g.tiles
        if edge_weight is None and tf.sglb is not None:
            # unweighted backbone conv: whole norm chain in tile order — no
            # [E]-order arrays (r5; profile_step attributed 5.3 ms/step to
            # the XLA coef take/degree/dis ops of the generic path)
            from cal_tpu.ops.pallas_spmm import (
                gcn_aggregate_sparse_plain_pallas)

            return gcn_aggregate_sparse_plain_pallas(
                x, tf, tb, node_block=tf.node_block)
        from cal_tpu.ops.pallas_spmm import gcn_aggregate_sparse_pallas

        return gcn_aggregate_sparse_pallas(
            x, g.senders, g.receivers, g.edge_mask, tf, tb, edge_weight,
            node_block=tf.node_block,
        )
    return gcn_aggregate_sparse(
        x, g.senders, g.receivers, g.edge_mask, edge_weight
    )
