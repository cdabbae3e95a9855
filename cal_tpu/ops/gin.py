"""GIN neighborhood sum — PyG-1.1.0 ``GINConv`` aggregation (ε = 0, fixed).

Reference usage: ``GINConv(Sequential(Linear, BN, ReLU, Linear, ReLU))``
(model.py:188-194, 531-536).  PyG 1.1.0 GINConv computes
``MLP((1 + eps) * x + sum_{u -> v} x_u)`` with no self-loop manipulation;
the MLP lives in the model layer (nn/layers.py GINMLP), this op is just the
aggregation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cal_tpu.graph import DenseGraphBatch, GraphBatch, PartitionedGraphBatch
from cal_tpu.ops.segment import segment_sum


def gin_aggregate(x: jax.Array, g, eps: float = 0.0) -> jax.Array:
    """(1+eps)*x + neighbor sum, any layout."""
    if isinstance(g, DenseGraphBatch):
        agg = jnp.einsum("brs,bsh->brh", g.adj.astype(x.dtype), x,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        return (1.0 + eps) * x + agg
    if isinstance(g, PartitionedGraphBatch):
        from cal_tpu.parallel.edge_partition import partitioned_gin_aggregate

        return partitioned_gin_aggregate(x, g, eps)
    assert isinstance(g, GraphBatch)
    if g.tiles is not None:
        from cal_tpu.ops.pallas_spmm import coo_spmm

        tf, tb = g.tiles
        # GIN keeps self edges as ordinary edges (no loop manipulation),
        # so the coefficient is just the padding mask.  Always f32: Mosaic's
        # minor-dim insertion on the kernel's scalar operand is 32-bit-only.
        coef = g.edge_mask.astype(jnp.float32)
        coef_ext = jnp.concatenate([coef, jnp.zeros((1,), jnp.float32)])
        agg = coo_spmm(x.astype(jnp.float32), coef_ext, tf, tb,
                       tf.node_block).astype(x.dtype)
        return (1.0 + eps) * x + agg
    msg = jnp.where(
        g.edge_mask[:, None], jnp.take(x, g.senders, axis=0), 0.0
    )
    agg = segment_sum(msg, g.receivers, x.shape[0], indices_are_sorted=True)
    return (1.0 + eps) * x + agg
