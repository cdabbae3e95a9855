"""Edge-partitioned message passing — the context-parallel analog for graphs.

The reference scales nothing (single device, SURVEY.md §2.3); the scaling
dimension of this workload is *edges*, not weights.  Design (SURVEY.md §5):
shard the receiver-sorted edge list of the batched mega-graph across the
``edge`` mesh axis; node features are sharded over nodes.  One layer is:

  1. ``all_gather`` node features over ICI ([V, H], bf16-friendly);
  2. local gather-multiply-scatter over this device's edge shard
     (the SpMM hot kernel — Pallas on TPU);
  3. ``psum_scatter`` the partial node sums back to node owners.

GAT's edge softmax needs the two-pass max/sum across partitions (the direct
analog of ring-softmax in ring attention): ``pmax`` of per-node score maxima,
``psum`` of exp sums, then the weighted message pass.

All functions are shard_map bodies: call within
``shard_map(..., mesh, in_specs=..., check_vma=False)`` over ``axis_name``.
Edge shards are balanced contiguous ranges of the sorted edge list, so each
partial scatter touches a narrow receiver range (cache/VMEM friendly).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cal_tpu.ops.segment import segment_max, segment_sum

NEG_SLOPE = 0.2
_BIG_NEG = -1e30


def shard_edges(senders, receivers, edge_mask, n_shards: int):
    """Host-side: split a (receiver-sorted) padded edge list into
    ``n_shards`` equal contiguous chunks -> arrays [n_shards, E/n]."""
    e = len(senders)
    if e % n_shards:
        raise ValueError(f"edge budget {e} not divisible by {n_shards}")
    shp = (n_shards, e // n_shards)
    return (
        np.asarray(senders).reshape(shp),
        np.asarray(receivers).reshape(shp),
        np.asarray(edge_mask).reshape(shp),
    )


def _local_nodes(x_all, axis_name):
    """Slice this device's node rows out of a gathered [V, ...] array."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    v_local = x_all.shape[0] // n
    return jax.lax.dynamic_slice_in_dim(x_all, idx * v_local, v_local)


def edge_partitioned_gcn_aggregate(
    x_local: jax.Array,
    senders: jax.Array,
    receivers: jax.Array,
    edge_mask: jax.Array,
    edge_weight: jax.Array | None = None,
    axis_name: str = "edge",
) -> jax.Array:
    """Edge-partitioned version of ops.gcn.gcn_aggregate_sparse.

    Args (per device): x_local [V/n, H]; senders/receivers/edge_mask [E/n]
    (global node ids).  Returns [V/n, H] for this device's nodes.
    """
    x = jax.lax.all_gather(x_local, axis_name, tiled=True)      # [V, H]
    v = x.shape[0]
    ew = jnp.ones_like(senders, dtype=x.dtype) if edge_weight is None else edge_weight
    live = edge_mask & (senders != receivers)
    ew = jnp.where(live, ew, 0.0)
    # sender degree needs ALL partitions' contributions (psum, [V])
    deg = jax.lax.psum(segment_sum(ew, senders, v), axis_name) + 1.0
    dis = jax.lax.rsqrt(deg)
    norm = dis[senders] * ew * dis[receivers]
    msg = norm[:, None] * jnp.take(x, senders, axis=0)
    partial = segment_sum(msg, receivers, v, indices_are_sorted=True)  # [V, H]
    # reduce partial sums and hand each node to its owner (reduce-scatter)
    out_local = jax.lax.psum_scatter(
        partial, axis_name, scatter_dimension=0, tiled=True
    )  # [V/n, H]
    deg_local = _local_nodes(deg, axis_name)
    return out_local + x_local / deg_local[:, None]


def edge_partitioned_gat_aggregate(
    xh_local: jax.Array,
    senders: jax.Array,
    receivers: jax.Array,
    edge_mask: jax.Array,
    att_dst: jax.Array,
    att_src: jax.Array,
    axis_name: str = "edge",
) -> jax.Array:
    """Edge-partitioned version of ops.gat.gat_aggregate_sparse (no dropout).

    Args (per device): xh_local [V/n, heads, out]; edge arrays [E/n].
    Returns [V/n, heads, out].  Two-pass cross-partition softmax:
    pmax for stability, psum for the denominator (ring-softmax analog).
    """
    xh = jax.lax.all_gather(xh_local, axis_name, tiled=True)    # [V, h, d]
    v = xh.shape[0]
    ti = jnp.einsum("vhd,hd->vh", xh, att_dst)
    tj = jnp.einsum("vhd,hd->vh", xh, att_src)
    live = edge_mask & (senders != receivers)
    score = jax.nn.leaky_relu(ti[receivers] + tj[senders], negative_slope=NEG_SLOPE)
    score = jnp.where(live[:, None], score, _BIG_NEG)
    self_score = jax.nn.leaky_relu(ti + tj, negative_slope=NEG_SLOPE)   # [V, h]
    # pass 1: global per-node max over all edge partitions + self loop
    seg_m = segment_max(score, receivers, v, indices_are_sorted=True)
    seg_m = jnp.where(jnp.isfinite(seg_m), seg_m, _BIG_NEG)
    m = jnp.maximum(jax.lax.pmax(seg_m, axis_name), self_score)
    # pass 2: global exp-sum
    num_e = jnp.where(live[:, None], jnp.exp(score - m[receivers]), 0.0)
    num_self = jnp.exp(self_score - m)
    denom = (
        jax.lax.psum(segment_sum(num_e, receivers, v, indices_are_sorted=True),
                     axis_name)
        + num_self
    )
    alpha_e = num_e / denom[receivers]
    # weighted message pass + owner reduce-scatter
    msg = alpha_e[..., None] * jnp.take(xh, senders, axis=0)    # [E/n, h, d]
    partial = segment_sum(msg, receivers, v, indices_are_sorted=True)   # [V, h, d]
    out_local = jax.lax.psum_scatter(
        partial, axis_name, scatter_dimension=0, tiled=True
    )
    alpha_self_local = _local_nodes(num_self / denom, axis_name)
    return out_local + alpha_self_local[..., None] * xh_local
