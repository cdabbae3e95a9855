"""Segment reductions — the sparse-compute floor of the framework.

The reference's compute floor is ``torch_scatter.scatter_add`` (C++/CUDA,
used at reference gcn_conv.py:66 and feature_expansion.py:164) plus PyG's
gather/scatter ``MessagePassing.propagate``.  On TPU these become segment
reductions over statically-shaped, receiver-sorted edge lists.  XLA lowers
``jax.ops.segment_sum`` well when ``indices_are_sorted`` is given; the
Pallas SpMM kernel (ops/pallas_spmm.py) replaces the hot path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """scatter-add: out[s] = sum of data rows with segment_ids == s."""
    return jax.ops.segment_sum(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_max(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """scatter-max; empty segments get -inf."""
    return jax.ops.segment_max(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_softmax(
    logits: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Numerically-stable softmax within segments (PyG ``softmax`` analog).

    Used for GAT edge-attention normalization over incoming edges.  Masked
    entries get probability 0.  A two-pass (segment-max, then normalize)
    formulation — the same structure the cross-device edge-partitioned
    softmax uses (segment-max and segment-sum become collectives there).
    """
    if mask is not None:
        mask = mask.reshape(mask.shape + (1,) * (logits.ndim - mask.ndim))
        logits = jnp.where(mask, logits, -jnp.inf)
    seg_max = segment_max(
        logits, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    unnorm = jnp.exp(logits - seg_max[segment_ids])
    if mask is not None:
        unnorm = jnp.where(mask, unnorm, 0.0)
    denom = segment_sum(
        unnorm, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    denom = jnp.where(denom > 0, denom, 1.0)
    return unnorm / denom[segment_ids]
