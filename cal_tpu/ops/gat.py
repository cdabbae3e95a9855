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

import functools

import jax
import jax.numpy as jnp
import numpy as np

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

# ---------------------------------------------------------------------------
# Tile-order fused sparse GAT chain (r5).
#
# ``gat_aggregate_sparse_pallas`` above keeps the score/softmax chain in XLA
# [E, heads]-order: profiling the packed SYNREDDIT-scale CausalGAT step
# (benchmarks/profile_step, nesting-aware parser) showed 61.3 ms/step with
# ~30+ ms in exactly those ops — the [E]->[slots] coef take (2.9 ms), the
# segment-max (1.1 ms) and the segment-sum scatter-adds (1.2-2.7 ms each),
# times 3 layers, forward AND autodiffed backward.  This function runs the
# WHOLE chain in tile-slot order from the plans' global endpoint columns
# (the sparse-GAT sibling of pallas_spmm.gcn_aggregate_sparse_sigmoid_pallas):
#
#   * SDDMM scores: one tile_gather2 of the per-node halves tj/ti;
#   * segment max:  tile_scatter_max (VMEM-resident receiver plane);
#   * denominator:  tile_scatter2 of exp terms — and the normalizing
#     DIVISION is algebraically folded OUT of the per-edge domain:
#     out_v = (sum_e num_e x_s + num_self_v x_v) / denom[v], so the forward
#     never gathers denom back to slots;
#   * aggregation:  the multi-head tiled SpMM (coo_spmm_mh kernels).
#
# The hand-written VJP differentiates through the UNNORMALIZED weights
# (q = num): dq = mask*SDDMM(x, gout/denom) + dD[r], with dD a plane op on
# the saved output — no [E]-order array exists anywhere in fwd or bwd.
#
# Attention dropout cannot use positional PRNG (the backward recomputes the
# weights in the TRANSPOSED plan's slot order, where the same edge lives at
# a different position): keep bits are a counter-based hash of the EDGE id
# (the plans' ``perm`` column) so both orders draw identical masks.
# Reference semantics: PyG-1.1.0 GATConv (model.py:340), same numerics as
# ``gat_aggregate_sparse`` — parity-tested in tests/test_pallas_spmm.py.
# ---------------------------------------------------------------------------


def _mix32(x, s0, s1):
    """Murmur3-style avalanche finalizer over a uint32 counter + seed.

    Consecutive counters must decorrelate fully: CLAUDE.md records a
    measured ~1-point val-accuracy loss from correlated dropout streams
    when adjacent integers were fed to a counter PRNG unmixed."""
    x = x * np.uint32(0x9E3779B9) + s0
    x = x ^ (x >> 16)
    x = x * np.uint32(0x85EBCA6B)
    x = x ^ (x >> 13) ^ s1
    x = x * np.uint32(0xC2B2AE35)
    return x ^ (x >> 16)


def _keep_mask(ids, seed, rate, salt):
    """Per-id keep mask (1.0/0.0) at probability 1-rate; ids int32>=0."""
    thresh = np.uint32(min((1.0 - rate) * 4294967296.0, 4294967295.0))
    h = _mix32(ids.astype(jnp.uint32), seed[0],
               seed[1] + np.uint32(0x632BE59B) * np.uint32(salt))
    return (h < thresh).astype(jnp.float32)


def _head_ids(base, heads):
    """base [...] int32 edge/node ids -> [..., heads interleaved] ids."""
    hr = jnp.arange(heads, dtype=jnp.int32)
    return base[..., None, :] * heads + hr[:, None] if base.ndim == 2 \
        else base[:, None] * heads + hr[None, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def gat_aggregate_sparse_fused(xh, att_dst, att_src, seed, tiles_fwd,
                               tiles_bwd, rate=0.0, node_block=512):
    """Sparse multi-head GAT aggregate with the whole score/softmax chain
    in tile-slot order (see block comment).  Differentiable in xh, att_dst,
    att_src; ``seed`` is a uint32[2] dropout seed (ignored at rate=0)."""
    out, _ = _gat_fused_fwd(xh, att_dst, att_src, seed, tiles_fwd,
                            tiles_bwd, rate, node_block)
    return out


def _gat_fused_fwd(xh, att_dst, att_src, seed, tf, tb, rate, node_block):
    from cal_tpu.ops.pallas_spmm import (
        _gat_coef_spmm_call, _gat_den_call, _gat_max_call)

    V, h, d = xh.shape
    f32 = jnp.float32
    xf = xh.astype(f32)
    ad, asr = att_dst.astype(f32), att_src.astype(f32)
    ti = jnp.einsum("vhd,hd->vh", xf, ad)    # receiver half
    tj = jnp.einsum("vhd,hd->vh", xf, asr)   # sender half
    self_pre = ti + tj
    self_score = jax.nn.leaky_relu(self_pre, NEG_SLOPE)    # [V, h]
    # per-slot scores/weights live only inside the kernels (r5c): the max,
    # denominator and coef-SpMM passes each recompute them from the
    # [heads, V] row planes — no [n_tiles, heads, T] intermediate exists
    m = _gat_max_call(tj.T, ti.T, tf, V, node_block, NEG_SLOPE)
    m = jnp.maximum(m, self_score.T)                       # [h, V]
    tim = jnp.concatenate([ti.T, m], axis=0)               # [2h, V]
    denP = _gat_den_call(tj.T, tim, tf, V, node_block, NEG_SLOPE)
    q_self = jnp.exp(self_score - m.T)                     # [V, h] in (0,1]
    denom = denP + q_self.T                                # [h, V] > 0
    self_coef = q_self
    if rate > 0.0:
        sids = jnp.arange(V, dtype=jnp.int32)
        self_coef = self_coef * _keep_mask(
            _head_ids(sids, h), seed, rate, 1) / (1.0 - rate)
    agg = _gat_coef_spmm_call(xf.reshape(V, h * d), tj.T, tim, seed, tf,
                              node_block, h, NEG_SLOPE, True, rate)
    agg = agg.reshape(V, h, d) + self_coef[:, :, None] * xf
    out = agg / denom.T[:, :, None]
    res = (xf, ad, asr, seed, ti, tj, m, denom, q_self, out, tf, tb)
    return out.astype(xh.dtype), res


def _gat_fused_bwd(rate, node_block, res, gout):
    from cal_tpu.ops.pallas_spmm import (
        _gat_coef_spmm_call, _gat_sddmm_chain_call)

    (xf, ad, asr, seed, ti, tj, m, denom, q_self, out, tf, tb) = res
    V, h, d = xf.shape
    f32 = jnp.float32
    u = gout.astype(f32)
    w = u / denom.T[:, :, None]                            # [V, h, d]
    wflat, xflat = w.reshape(V, h * d), xf.reshape(V, h * d)
    keep = 1.0 - rate
    self_pre = ti + tj
    tim = jnp.concatenate([ti.T, m], axis=0)               # [2h, V]

    # dx through the message sum: transposed-plan coef-SpMM (q rebuilt
    # in-kernel; tb's sender side carries ti/m, its receiver side tj).
    dx = _gat_coef_spmm_call(wflat, tim, tj.T, seed, tb, node_block, h,
                             NEG_SLOPE, False, rate).reshape(V, h, d)

    # d(q) chain in ONE pass: dqm = mask * SDDMM(x, w); dq = dqm + dD[r];
    # dpre = q * dq * leaky'; scattered into sender/receiver head planes.
    dD = -(jnp.einsum("vhd,vhd->vh", out, u) / denom.T)    # [V, h]
    rext = jnp.concatenate([ti.T, m, dD.T], axis=0)        # [3h, V]
    dtjP, dtiP = _gat_sddmm_chain_call(xflat, wflat, tj.T, rext, seed, tf,
                                       node_block, h, NEG_SLOPE, rate)

    # self term: out_v += self_coef * x_v / denom
    sdot = jnp.einsum("vhd,vhd->vh", xf, w)
    if rate > 0.0:
        sids = jnp.arange(V, dtype=jnp.int32)
        smask = _keep_mask(_head_ids(sids, h), seed, rate, 1) / keep
        dx = dx + (q_self * smask)[:, :, None] * w
        dq_self = smask * sdot + dD
    else:
        dx = dx + q_self[:, :, None] * w
        dq_self = sdot + dD
    dself_pre = (q_self * dq_self) * jnp.where(self_pre > 0, 1.0, NEG_SLOPE)

    dti = dtiP.T + dself_pre                               # [V, h]
    dtj = dtjP.T + dself_pre
    dxh = dx + dti[:, :, None] * ad[None] + dtj[:, :, None] * asr[None]
    datt_dst = jnp.einsum("vh,vhd->hd", dti, xf)
    datt_src = jnp.einsum("vh,vhd->hd", dtj, xf)
    zf0 = lambda t: jax.tree.map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0), t)
    return (dxh, datt_dst, datt_src, zf0(seed), zf0(tf), zf0(tb))


gat_aggregate_sparse_fused.defvjp(_gat_fused_fwd, _gat_fused_bwd)
