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

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from cal_tpu.ops.segment import segment_max, segment_sum

NEG_SLOPE = 0.2
_BIG_NEG = -1e30

# ---------------------------------------------------------------------------
# Production design: receiver-owned shards + boundary (halo) exchange.
#
# The host planner (parallel/partition.py) assigns every edge to the shard
# owning its RECEIVER, so scatter-adds and the GAT edge-softmax are fully
# shard-local — no cross-shard output reduction exists at all.  Only boundary
# SENDER rows move: one all_to_all of the precomputed halo rows per layer
# (≪ the naive [V, H] all_gather; partition.comms_stats quantifies it), and
# the exchange is issued BEFORE the local degree/coefficient math so XLA can
# overlap the collective with compute.  Entry points
# partitioned_{gcn,gat,gin}_aggregate / partitioned_edge_attention take
# GLOBAL-shaped arrays + a PartitionedGraphBatch and wrap shard_map
# internally — the model reaches them through ordinary layout dispatch under
# a jit over the ('dp', 'edge') mesh; everything around them (BN, linears,
# pooling, losses, grads) stays GSPMD with exact single-device numerics.
#
# The all-gather + psum_scatter functions at the bottom of this file are the
# naive baseline generation, kept as the parity reference.
# ---------------------------------------------------------------------------

# PartitionSpecs for PartitionedGraphBatch leaves inside shard_map wrappers.
P_NE = P(("dp", "edge"))                 # node/edge arrays, dim 0
P_PLAN = P(("dp", "edge"), None, None)   # send_idx/send_mask [shard, n, S]
P_REP = P()                              # replicated params/keys


def halo_exchange(x_loc: jax.Array, send_idx: jax.Array,
                  send_mask: jax.Array, axis_name: str = "edge") -> jax.Array:
    """Ship precomputed boundary rows to peers (shard_map body helper).

    Args (per device): x_loc [Vl, F]; send_idx/send_mask [n, S] — rows this
    shard sends to each peer (planner: partition.py).  Returns the halo
    table [n*S, F]: rows RECEIVED, grouped by source shard, zero-padded.
    """
    buf = jnp.take(x_loc, send_idx, axis=0)
    buf = jnp.where(send_mask[..., None], buf, 0)
    recv = jax.lax.all_to_all(buf, axis_name, split_axis=0, concat_axis=0)
    return recv.reshape(-1, x_loc.shape[-1])


def _gcn_halo_body(x_loc, s_tab, s_glb, recv, emask, send_idx, send_mask,
                   ew, axis_name="edge"):
    """Receiver-owned GCN aggregate (numerics: ops/gcn.py
    gcn_aggregate_sparse, i.e. reference gcn_conv.py:44-70)."""
    vl = x_loc.shape[0]
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # halo first: the all_to_all overlaps the degree psum + coefficient math
    halo = halo_exchange(x_loc, send_idx[0], send_mask[0], axis_name)
    r_glb = idx * vl + recv
    live = emask & (s_glb != r_glb)
    ew = jnp.where(live, ew, 0.0)
    # sender degree needs every shard's edges (ref gcn_conv.py:66): [Vg] psum
    deg = jax.lax.psum(segment_sum(ew, s_glb, vl * n), axis_name) + 1.0
    dis = jax.lax.rsqrt(deg)
    dis_loc = jax.lax.dynamic_slice_in_dim(dis, idx * vl, vl)
    deg_loc = jax.lax.dynamic_slice_in_dim(deg, idx * vl, vl)
    norm = dis[s_glb] * ew * dis_loc[recv]
    table = jnp.concatenate([x_loc, halo.astype(x_loc.dtype)], axis=0)
    msg = norm[:, None] * jnp.take(table, s_tab, axis=0)
    out = segment_sum(msg, recv, vl, indices_are_sorted=True)
    return out + x_loc / deg_loc[:, None]


def partitioned_gcn_aggregate(x, pb, edge_weight=None):
    """GCN aggregate on a ``PartitionedGraphBatch`` (global-shaped entry).

    x [V, H] sharded P(('dp','edge')); edge_weight optional [E].  Uses the
    per-shard Pallas block-COO tiles when the planner attached them."""
    ew = (jnp.ones(pb.edge_mask.shape, x.dtype) if edge_weight is None
          else edge_weight.astype(x.dtype))
    if pb.tiles is not None:
        return _partitioned_gcn_tiled(x, pb, ew)
    fn = shard_map(
        _gcn_halo_body, mesh=pb.mesh,
        in_specs=(P_NE, P_NE, P_NE, P_NE, P_NE, P_PLAN, P_PLAN, P_NE),
        out_specs=P_NE, check_vma=False)
    return fn(x, pb.senders_tab, pb.senders_glb, pb.receivers, pb.edge_mask,
              pb.send_idx, pb.send_mask, ew)


def _gcn_tiled_body(x_loc, s_glb, recv, emask, send_idx, send_mask, ew,
                    tiles_fwd, tiles_bwd, axis_name="edge"):
    """Receiver-owned GCN aggregate with the Pallas block-COO SpMM doing the
    gather/scatter over the local feature table (ops/pallas_spmm.py); the
    tile plans use shard-local table indices (planner builds them)."""
    from cal_tpu.ops.pallas_spmm import coo_spmm

    vl = x_loc.shape[0]
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    halo = halo_exchange(x_loc, send_idx[0], send_mask[0], axis_name)
    r_glb = idx * vl + recv
    live = emask & (s_glb != r_glb)
    ew = jnp.where(live, ew.astype(jnp.float32), 0.0)
    deg = jax.lax.psum(segment_sum(ew, s_glb, vl * n), axis_name) + 1.0
    dis = jax.lax.rsqrt(deg)
    dis_loc = jax.lax.dynamic_slice_in_dim(dis, idx * vl, vl)
    deg_loc = jax.lax.dynamic_slice_in_dim(deg, idx * vl, vl)
    coef = dis[s_glb] * ew * dis_loc[recv]
    table = jnp.concatenate(
        [x_loc.astype(jnp.float32), halo.astype(jnp.float32)], axis=0)
    tf = jax.tree.map(lambda a: a[0], tiles_fwd)
    tb = jax.tree.map(lambda a: a[0], tiles_bwd)
    pad = -table.shape[0] % tf.node_block
    table = jnp.pad(table, ((0, pad), (0, 0)))
    coef_ext = jnp.concatenate([coef, jnp.zeros((1,), coef.dtype)])
    out = coo_spmm(table, coef_ext, tf, tb, tf.node_block)[:vl]
    return (out + x_loc.astype(jnp.float32) / deg_loc[:, None]
            ).astype(x_loc.dtype)


def _partitioned_gcn_tiled(x, pb, ew):
    tiles_fwd, tiles_bwd = pb.tiles
    tile_specs = jax.tree.map(lambda _: P(("dp", "edge")), tiles_fwd)
    fn = shard_map(
        _gcn_tiled_body, mesh=pb.mesh,
        in_specs=(P_NE, P_NE, P_NE, P_NE, P_PLAN, P_PLAN, P_NE,
                  tile_specs, tile_specs),
        out_specs=P_NE, check_vma=False)
    return fn(x, pb.senders_glb, pb.receivers, pb.edge_mask,
              pb.send_idx, pb.send_mask, ew, tiles_fwd, tiles_bwd)


def _gat_halo_body(xh_loc, s_tab, s_glb, recv, emask, send_idx, send_mask,
                   att_dst, att_src, rng, dropout_rate: float = 0.0,
                   axis_name: str = "edge"):
    """Receiver-owned GAT aggregate — the edge softmax is fully LOCAL
    because every incoming edge of a node lives on its owner's shard
    (numerics: ops/gat.py gat_aggregate_sparse / PyG-1.1.0 GATConv)."""
    from cal_tpu.ops.gat import _alpha_dropout

    vl, heads, _ = xh_loc.shape
    idx = jax.lax.axis_index(axis_name)
    halo = halo_exchange(
        xh_loc.reshape(vl, -1), send_idx[0], send_mask[0], axis_name
    ).reshape(-1, heads, xh_loc.shape[-1]).astype(xh_loc.dtype)
    table = jnp.concatenate([xh_loc, halo], axis=0)
    ti = jnp.einsum("vhd,hd->vh", xh_loc, att_dst)      # receiver half
    tj = jnp.einsum("vhd,hd->vh", table, att_src)       # sender half
    live = emask & (s_glb != idx * vl + recv)
    score = jax.nn.leaky_relu(ti[recv] + tj[s_tab], negative_slope=NEG_SLOPE)
    score = jnp.where(live[:, None], score, _BIG_NEG)
    self_score = jax.nn.leaky_relu(ti + tj[:vl], negative_slope=NEG_SLOPE)
    seg_m = segment_max(score, recv, vl, indices_are_sorted=True)
    m = jnp.maximum(jnp.where(jnp.isfinite(seg_m), seg_m, _BIG_NEG),
                    self_score)
    num_e = jnp.where(live[:, None], jnp.exp(score - m[recv]), 0.0)
    num_self = jnp.exp(self_score - m)
    denom = segment_sum(num_e, recv, vl, indices_are_sorted=True) + num_self
    alpha_e = num_e / denom[recv]
    alpha_self = num_self / denom
    if rng is not None and dropout_rate > 0.0:
        # independent dropout stream per shard
        shard = idx + jax.lax.axis_size(axis_name) * jax.lax.axis_index("dp")
        k1, k2 = jax.random.split(jax.random.fold_in(rng, shard))
        alpha_e = _alpha_dropout(alpha_e, dropout_rate, k1)
        alpha_self = _alpha_dropout(alpha_self, dropout_rate, k2)
    msg = alpha_e[..., None] * jnp.take(table, s_tab, axis=0)
    out = segment_sum(msg, recv, vl, indices_are_sorted=True)
    return out + alpha_self[..., None] * xh_loc


def partitioned_gat_aggregate(xh, pb, att_dst, att_src,
                              dropout_rate: float = 0.0, dropout_rng=None):
    """GAT aggregate on a ``PartitionedGraphBatch``; xh [V, heads, out]."""
    if dropout_rng is None:
        dropout_rate = 0.0
        dropout_rng = jax.random.PRNGKey(0)  # unused (rate 0), spec filler
    body = functools.partial(_gat_halo_body, dropout_rate=dropout_rate)
    fn = shard_map(
        body, mesh=pb.mesh,
        in_specs=(P_NE, P_NE, P_NE, P_NE, P_NE, P_PLAN, P_PLAN,
                  P_REP, P_REP, P_REP),
        out_specs=P_NE, check_vma=False)
    return fn(xh, pb.senders_tab, pb.senders_glb, pb.receivers, pb.edge_mask,
              pb.send_idx, pb.send_mask, att_dst, att_src, dropout_rng)


def _gin_halo_body(x_loc, s_tab, recv, emask, send_idx, send_mask,
                   axis_name="edge"):
    halo = halo_exchange(x_loc, send_idx[0], send_mask[0], axis_name)
    table = jnp.concatenate([x_loc, halo.astype(x_loc.dtype)], axis=0)
    msg = jnp.where(emask[:, None], jnp.take(table, s_tab, axis=0), 0.0)
    return segment_sum(msg, recv, x_loc.shape[0], indices_are_sorted=True)


def partitioned_gin_aggregate(x, pb, eps: float = 0.0):
    """(1+eps)*x + neighbor sum (PyG GINConv semantics, ops/gin.py)."""
    fn = shard_map(
        _gin_halo_body, mesh=pb.mesh,
        in_specs=(P_NE, P_NE, P_NE, P_NE, P_PLAN, P_PLAN),
        out_specs=P_NE, check_vma=False)
    agg = fn(x, pb.senders_tab, pb.receivers, pb.edge_mask,
             pb.send_idx, pb.send_mask)
    return (1.0 + eps) * x + agg


def _edge_att_body(src_proj, dst_proj, s_tab, recv, send_idx, send_mask,
                   b, axis_name="edge"):
    table = jnp.concatenate(
        [src_proj,
         halo_exchange(src_proj, send_idx[0], send_mask[0], axis_name
                       ).astype(src_proj.dtype)], axis=0)
    logits = jnp.take(table, s_tab, axis=0) + dst_proj[recv] + b
    att = jax.nn.softmax(logits, axis=-1)
    return att[:, 0], att[:, 1]


def partitioned_edge_attention(x, pb, w_src, w_dst, b):
    """Per-edge (context, object) attention weights (reference
    model.py:97-104) on the partitioned layout: project per node FIRST
    ([V, 2] scalars), halo-exchange only those — the per-edge gather then
    never touches the [V, H] features."""
    src_proj = x @ w_src        # [V, 2], sharded like x
    dst_proj = x @ w_dst
    fn = shard_map(
        _edge_att_body, mesh=pb.mesh,
        in_specs=(P_NE, P_NE, P_NE, P_NE, P_PLAN, P_PLAN, P_REP),
        out_specs=(P_NE, P_NE), check_vma=False)
    return fn(src_proj, dst_proj, pb.senders_tab, pb.receivers,
              pb.send_idx, pb.send_mask, b)


# ---------------------------------------------------------------------------
# Naive baseline generation: full all_gather + psum_scatter.
# ---------------------------------------------------------------------------


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
