"""Multi-head GAT aggregation — exact PyG-1.1.0 ``GATConv`` semantics.

Reference usage: ``GATConv(hidden, hidden/head, heads=4, dropout=0.2)``
(model.py:340,596).  PyG 1.1.0 formulation (the *old* one — both endpoint
projections share one weight matrix, one attention vector ``att`` of shape
``[1, heads, 2*out]``):

  1. remove self loops, add plain self loops;
  2. ``xh = x @ W`` reshaped ``[V, heads, out]``;
  3. per edge u->v: ``e = leaky_relu(att_i . xh_v + att_j . xh_u, 0.2)``
     where ``att_i``/``att_j`` are the first/second halves of ``att``
     (x_i = target = v, x_j = source = u under flow source_to_target);
  4. ``alpha = softmax_e over incoming edges of v``; attention-dropout is
     applied **after** normalization (no renormalize), train only;
  5. ``out_v = sum_u alpha * xh_u``, heads concatenated, + bias.

Self loops are treated analytically (static shapes): every node contributes
an ``exp(att_i.xh_v + att_j.xh_v)`` term to its own softmax.

The dense layout is a masked-attention batched matmul (MXU/flash-attention
shaped); the sparse layout is SDDMM + segment-softmax + SpMM.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cal_tpu.ops.segment import segment_max, segment_sum

NEG_SLOPE = 0.2  # PyG 1.1.0 GATConv default negative_slope
_BIG_NEG = -1e30


def _alpha_dropout(alpha: jax.Array, rate: float, rng) -> jax.Array:
    """Inverted dropout on attention coefficients (PyG GATConv message)."""
    if rate <= 0.0 or rng is None:
        return alpha
    keep = jax.random.bernoulli(rng, 1.0 - rate, alpha.shape)
    return jnp.where(keep, alpha / (1.0 - rate), 0.0)


def gat_aggregate_dense(
    xh: jax.Array,
    adj: jax.Array,
    att_dst: jax.Array,
    att_src: jax.Array,
    dropout_rate: float = 0.0,
    dropout_rng=None,
) -> jax.Array:
    """Dense multi-head GAT attention + aggregation.

    Args:
      xh:   [B, N, heads, out] projected node features.
      adj:  [B, N, N] adjacency counts (row = receiver).
      att_dst: [heads, out] attention vector half applied to the receiver.
      att_src: [heads, out] half applied to the sender.
      dropout_rate/rng: attention dropout (train only when rng given).

    Returns: [B, N, heads, out].
    """
    # ti[b,v,h] = att_dst . xh_v ; tj[b,u,h] = att_src . xh_u
    ti = jnp.einsum("bnhd,hd->bnh", xh, att_dst)
    tj = jnp.einsum("bnhd,hd->bnh", xh, att_src)
    # score[b,r,s,h] for edge s -> r
    score = jax.nn.leaky_relu(
        ti[:, :, None, :] + tj[:, None, :, :], negative_slope=NEG_SLOPE
    )
    n = adj.shape[-1]
    eye = jnp.eye(n, dtype=adj.dtype)
    counts = adj * (1.0 - eye) + eye        # self loop has multiplicity 1
    allowed = counts > 0
    masked = jnp.where(allowed[..., None], score, _BIG_NEG)
    m = jnp.max(masked, axis=2, keepdims=True)
    # duplicate edges each contribute one exp term; they share one score, so
    # weight the numerator by multiplicity.
    num = jnp.exp(masked - m) * counts[..., None]
    denom = num.sum(axis=2, keepdims=True)
    alpha = num / denom
    alpha = _alpha_dropout(alpha, dropout_rate, dropout_rng)
    # accumulate f32 like every other aggregate (bf16 sums over N messages
    # would otherwise lose precision in mixed-precision mode).
    return jnp.einsum(
        "brsh,bshd->brhd", alpha, xh, preferred_element_type=jnp.float32
    ).astype(xh.dtype)


def gat_aggregate_sparse(
    xh: jax.Array,
    senders: jax.Array,
    receivers: jax.Array,
    edge_mask: jax.Array,
    att_dst: jax.Array,
    att_src: jax.Array,
    dropout_rate: float = 0.0,
    dropout_rng=None,
    indices_are_sorted: bool = True,
) -> jax.Array:
    """Sparse multi-head GAT: SDDMM edge scores + segment softmax + SpMM.

    Args:
      xh: [V, heads, out]; senders/receivers/edge_mask: [E] (receiver-sorted).
    """
    num_nodes = xh.shape[0]
    ti = jnp.einsum("vhd,hd->vh", xh, att_dst)   # receiver half
    tj = jnp.einsum("vhd,hd->vh", xh, att_src)   # sender half
    # PyG removes original self loops then re-adds one per node; drop any
    # self-loop edges from the list — the analytic self term replaces them.
    live = edge_mask & (senders != receivers)
    score = jax.nn.leaky_relu(
        ti[receivers] + tj[senders], negative_slope=NEG_SLOPE
    )  # [E, heads]
    score = jnp.where(live[:, None], score, _BIG_NEG)
    self_score = jax.nn.leaky_relu(ti + tj, negative_slope=NEG_SLOPE)  # [V, heads]
    seg_m = segment_max(score, receivers, num_nodes, indices_are_sorted)
    m = jnp.maximum(jnp.where(jnp.isfinite(seg_m), seg_m, _BIG_NEG), self_score)
    num_e = jnp.where(live[:, None], jnp.exp(score - m[receivers]), 0.0)
    num_self = jnp.exp(self_score - m)
    denom = segment_sum(num_e, receivers, num_nodes, indices_are_sorted) + num_self
    alpha_e = num_e / denom[receivers]
    alpha_self = num_self / denom
    if dropout_rng is not None and dropout_rate > 0.0:
        k1, k2 = jax.random.split(dropout_rng)
        alpha_e = _alpha_dropout(alpha_e, dropout_rate, k1)
        alpha_self = _alpha_dropout(alpha_self, dropout_rate, k2)
    msg = alpha_e[..., None] * jnp.take(xh, senders, axis=0)
    out = segment_sum(msg, receivers, num_nodes, indices_are_sorted)
    return out + alpha_self[..., None] * xh


def gat_aggregate_sparse_pallas(
    xh: jax.Array,
    senders: jax.Array,
    receivers: jax.Array,
    edge_mask: jax.Array,
    att_dst: jax.Array,
    att_src: jax.Array,
    tiles_fwd,
    tiles_bwd,
    dropout_rate: float = 0.0,
    dropout_rng=None,
    indices_are_sorted: bool = True,
) -> jax.Array:
    """Sparse GAT with the message aggregation in the multi-head tiled
    Pallas kernel (ops/pallas_spmm.py coo_spmm_mh) — same numerics as
    ``gat_aggregate_sparse`` (PyG-1.1.0 GATConv), parity-tested.

    The [E, heads]-scalar score/softmax chain stays in XLA (cheap: E*heads
    scalars); the hot part — gathering xh[senders], weighting per head and
    scatter-adding to receivers, which in XLA materializes an [E, heads, d]
    message tensor — runs in the tiled kernel over the SAME structure plans
    (``GraphBatch.tiles``) the GCN convs use.  Dropout is applied to the
    normalized alphas BEFORE the kernel, so the kernel stays deterministic
    and the custom VJP (SDDMM dcoef) is exact.
    """
    num_nodes, heads, d = xh.shape
    xf = xh.astype(jnp.float32)
    ti = jnp.einsum("vhd,hd->vh", xf, att_dst.astype(jnp.float32))
    tj = jnp.einsum("vhd,hd->vh", xf, att_src.astype(jnp.float32))
    live = edge_mask & (senders != receivers)
    score = jax.nn.leaky_relu(
        ti[receivers] + tj[senders], negative_slope=NEG_SLOPE)
    score = jnp.where(live[:, None], score, _BIG_NEG)
    self_score = jax.nn.leaky_relu(ti + tj, negative_slope=NEG_SLOPE)
    seg_m = segment_max(score, receivers, num_nodes, indices_are_sorted)
    m = jnp.maximum(jnp.where(jnp.isfinite(seg_m), seg_m, _BIG_NEG),
                    self_score)
    num_e = jnp.where(live[:, None], jnp.exp(score - m[receivers]), 0.0)
    num_self = jnp.exp(self_score - m)
    denom = segment_sum(num_e, receivers, num_nodes,
                        indices_are_sorted) + num_self
    alpha_e = num_e / denom[receivers]
    alpha_self = num_self / denom
    if dropout_rng is not None and dropout_rate > 0.0:
        k1, k2 = jax.random.split(dropout_rng)
        alpha_e = _alpha_dropout(alpha_e, dropout_rate, k1)
        alpha_self = _alpha_dropout(alpha_self, dropout_rate, k2)
    from cal_tpu.ops.pallas_spmm import coo_spmm_mh

    coef_ext = jnp.concatenate(
        [alpha_e, jnp.zeros((1, heads), jnp.float32)], axis=0)
    out = coo_spmm_mh(xf.reshape(num_nodes, heads * d), coef_ext,
                      tiles_fwd, tiles_bwd, heads, tiles_fwd.node_block)
    out = out.reshape(num_nodes, heads, d) + alpha_self[..., None] * xf
    return out.astype(xh.dtype)
