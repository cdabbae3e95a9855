"""Causal/shortcut attention splits and graph pooling (layout-specific math).

The causal models score every edge with an MLP over concatenated endpoint
features and softmax over 2 channels (context/object) — reference
model.py:97-104 — and every node likewise (model.py:106-111).  A linear layer
on a concatenation ``[x_u ‖ x_v] @ W`` equals ``x_u @ W_src + x_v @ W_dst``,
which in the dense layout becomes two small matmuls + a broadcast add —
no per-edge gather.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cal_tpu.graph import DenseGraphBatch, GraphBatch, PartitionedGraphBatch
from cal_tpu.ops.segment import segment_sum


def edge_attention(x, g, w_src: jax.Array, w_dst: jax.Array, b: jax.Array,
                   factored: bool = False):
    """Per-edge (context, object) softmax weights.

    Reference model.py:97-104: ``edge_rep = cat([x[row], x[col]])`` with
    row = sender, col = receiver (PyG edge_index order), so ``w_src``
    multiplies sender features (first half of the reference's
    ``edge_att_mlp.weight``) and ``w_dst`` receiver features.

    Returns (edge_weight_c, edge_weight_o):
      dense layout:  each [B, N, N] with [b, r, s] = weight of edge s -> r —
                     or, with ``factored=True``, a pair of un-materialized
                     ``SigmoidEdgeWeight`` factors that the fused Pallas GCN
                     kernel rebuilds in VMEM (never hits HBM);
      sparse layout: each [E].
    """
    w_src, w_dst, b = (w_src.astype(x.dtype), w_dst.astype(x.dtype),
                       b.astype(x.dtype))
    if isinstance(g, DenseGraphBatch):
        # softmax over the 2 channels == sigmoid of the channel difference —
        # identical numerics but materializes ONE [B, N, N] tensor instead of
        # [B, N, N, 2] logits + softmax temps (~4x less HBM traffic; the
        # [B,N,N,2] form measured 1.0 ms vs 0.03 ms for this at bench shapes).
        src = x @ (w_src[:, 0] - w_src[:, 1]) + (b[0] - b[1])   # [B, N]
        dst = x @ (w_dst[:, 0] - w_dst[:, 1])                   # [B, N]
        if factored:
            from cal_tpu.ops.pallas_gcn import SigmoidEdgeWeight

            return (SigmoidEdgeWeight(src, dst, negate=False),
                    SigmoidEdgeWeight(src, dst, negate=True))
        att_c = jax.nn.sigmoid(src[:, None, :] + dst[:, :, None])  # [B, r, s]
        return att_c, 1.0 - att_c
    if isinstance(g, PartitionedGraphBatch):
        from cal_tpu.parallel.edge_partition import partitioned_edge_attention

        return partitioned_edge_attention(x, g, w_src, w_dst, b)
    assert isinstance(g, GraphBatch)
    if factored:
        # same softmax-2 == sigmoid identity as the dense branch, on [V]
        # node vectors; the tile-order fused SpMM rebuilds the per-edge
        # weights from these factors with NO [E]-order array anywhere
        # (ops/pallas_spmm.py gcn_aggregate_sparse_sigmoid_pallas)
        from cal_tpu.ops.pallas_gcn import SigmoidEdgeWeight

        src = x @ (w_src[:, 0] - w_src[:, 1]) + (b[0] - b[1])   # [V]
        dst = x @ (w_dst[:, 0] - w_dst[:, 1])                   # [V]
        return (SigmoidEdgeWeight(src, dst, negate=False),
                SigmoidEdgeWeight(src, dst, negate=True))
    logits = (
        jnp.take(x, g.senders, axis=0) @ w_src
        + jnp.take(x, g.receivers, axis=0) @ w_dst
        + b
    )  # [E, 2]
    att = jax.nn.softmax(logits, axis=-1)
    return att[:, 0], att[:, 1]


def node_attention(x, w: jax.Array, b: jax.Array):
    """Per-node (context, object) softmax weights (model.py:106-111).

    Works on [..., H]; returns (node_att_c, node_att_o) shaped [...]."""
    att = jax.nn.softmax(x @ w.astype(x.dtype) + b.astype(x.dtype), axis=-1)
    return att[..., 0], att[..., 1]


def global_add_pool(x, g):
    """Sum node features per graph (PyG global_add_pool, model.py:115-116).

    dense:  x [B, N, H] -> [B, H] (mask-aware).
    sparse: x [V, H] -> [G, H] via segment sum over ``node_graph`` (padded
            nodes live in trash segment G and are dropped).
    """
    # pooling always accumulates and returns f32 — the readout head runs in
    # full precision even in mixed-precision mode.
    if isinstance(g, DenseGraphBatch):
        return jnp.sum(x * g.node_mask[..., None].astype(x.dtype), axis=1,
                       dtype=jnp.float32)
    if isinstance(g, PartitionedGraphBatch):
        # node_graph holds GLOBAL graph slots but restarts per dp group, so
        # it is not globally sorted; XLA partitions the segment sum (psum
        # over the edge axis) under the mesh-jitted step.
        pooled = segment_sum(
            x.astype(jnp.float32), g.node_graph, g.num_graphs + 1)
        return pooled[: g.num_graphs]
    assert isinstance(g, GraphBatch)
    from cal_tpu.ops.pallas_pool import mxu_pool, pool_supported

    if pool_supported(x.shape[0], x.shape[1]):
        # per-block one-hot MXU matmul instead of the XLA scatter-add,
        # which ran at ~29 GB/s on the packed production step (r5;
        # ops/pallas_pool.py) — same f32 accumulation contract.
        return mxu_pool(x, g.node_graph, g.num_graphs + 1)[: g.num_graphs]
    pooled = segment_sum(
        x.astype(jnp.float32), g.node_graph, g.num_graphs + 1,
        indices_are_sorted=True
    )
    return pooled[: g.num_graphs]
