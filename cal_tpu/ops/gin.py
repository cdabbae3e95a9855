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

from cal_tpu.graph import DenseGraphBatch, GraphBatch
from cal_tpu.ops.segment import segment_sum


def gin_aggregate(x: jax.Array, g, eps: float = 0.0) -> jax.Array:
    """(1+eps)*x + neighbor sum, either layout."""
    if isinstance(g, DenseGraphBatch):
        agg = jnp.einsum("brs,bsh->brh", g.adj, x, preferred_element_type=x.dtype)
        return (1.0 + eps) * x + agg
    assert isinstance(g, GraphBatch)
    msg = jnp.where(
        g.edge_mask[:, None], jnp.take(x, g.senders, axis=0), 0.0
    )
    agg = segment_sum(msg, g.receivers, x.shape[0], indices_are_sorted=True)
    return (1.0 + eps) * x + agg
