"""Layers: mask-aware BatchNorm, torch/PyG-parity linear layers, conv layers.

Initializer parity with the reference stack:
  * torch ``nn.Linear``: weight & bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    (kaiming_uniform(a=sqrt(5)) reduces to that bound).
  * PyG ``glorot``: U(-sqrt(6/(fan_in+fan_out)), +...), bias zeros
    (reference gcn_conv.py:39-41).
  * BatchNorm1d: affine, eps=1e-5, momentum=0.1; the reference re-initializes
    every BN to weight=1, bias=1e-4 (model.py:80-83) — our default.

BatchNorm under padding: statistics must be computed over *real* rows only
(padded nodes/graphs would corrupt them), hence every call takes a mask.
Matches torch semantics: biased variance for normalization, unbiased for the
running-variance update, momentum 0.1.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from cal_tpu.graph import DenseGraphBatch, GraphBatch, PartitionedGraphBatch
from cal_tpu.ops.gcn import gcn_aggregate
from cal_tpu.ops.gat import gat_aggregate_dense, gat_aggregate_sparse
from cal_tpu.ops.gin import gin_aggregate


def torch_linear_init(fan_in: int):
    bound = 1.0 / (fan_in ** 0.5)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def glorot_init(fan_in: int, fan_out: int):
    bound = (6.0 / (fan_in + fan_out)) ** 0.5
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class TorchLinear(nn.Module):
    """nn.Linear with torch default init (used for att MLPs & readout FCs).

    ``dtype`` is the compute/output dtype (params stay f32; matmuls always
    accumulate f32 on the MXU via preferred_element_type)."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        w = self.param("kernel", torch_linear_init(fan_in), (fan_in, self.features))
        y = jnp.dot(x.astype(self.dtype), w.astype(self.dtype),
                    preferred_element_type=jnp.float32)
        if self.use_bias:
            b = self.param("bias", torch_linear_init(fan_in), (self.features,))
            y = y + b
        return y.astype(self.dtype)


class GlorotLinear(nn.Module):
    """Linear with PyG glorot weight + zero bias (GCNConv parameters)."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        w = self.param(
            "kernel", glorot_init(fan_in, self.features), (fan_in, self.features)
        )
        y = jnp.dot(x.astype(self.dtype), w.astype(self.dtype),
                    preferred_element_type=jnp.float32)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b
        return y.astype(self.dtype)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d with masked statistics (torch-parity, padding-safe)."""

    momentum: float = 0.1
    eps: float = 1e-5
    bias_init_value: float = 1e-4  # reference model.py:80-83

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        use_running_average: bool = False,
    ) -> jax.Array:
        # statistics are always f32 (bf16 sums across thousands of rows
        # would corrupt them); output returns in the input dtype.
        in_dtype = x.dtype
        x = x.astype(jnp.float32)
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param(
            "bias",
            lambda k, s: jnp.full(s, self.bias_init_value, jnp.float32),
            (c,),
        )
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            rows = x.reshape(-1, c)
            if mask is None:
                n = jnp.asarray(rows.shape[0], x.dtype)
                mean = rows.mean(axis=0)
                var = ((rows - mean) ** 2).mean(axis=0)
            else:
                m = mask.reshape(-1).astype(x.dtype)
                n = jnp.maximum(m.sum(), 1.0)
                mean = (rows * m[:, None]).sum(axis=0) / n
                var = (((rows - mean) ** 2) * m[:, None]).sum(axis=0) / n
            if not self.is_initializing():
                # torch: running stats use unbiased variance (n/(n-1)).
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                mom = self.momentum
                ra_mean.value = (1 - mom) * ra_mean.value + mom * mean
                ra_var.value = (1 - mom) * ra_var.value + mom * unbiased

        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(in_dtype)


class GCNConvLayer(nn.Module):
    """Reference ``GCNConv`` (gcn_conv.py:10-104): glorot weight, zero bias,
    optional ``gfn`` (pure linear, gcn_conv.py:76-77) and edge weights."""

    features: int
    gfn: bool = False
    edge_norm: bool = True
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = True  # fused dense norm-matmul kernel (ops/pallas_gcn)

    @nn.compact
    def __call__(self, x, g=None, edge_weight=None, transform_only=False):
        fan_in = x.shape[-1]
        w = self.param(
            "kernel", glorot_init(fan_in, self.features), (fan_in, self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        x = jnp.dot(x.astype(self.dtype), w.astype(self.dtype),
                    preferred_element_type=jnp.float32).astype(self.dtype)
        b = b.astype(self.dtype)
        if transform_only:
            # linear part + bias for an externally-fused aggregate (the
            # causal models run both masked convs in ONE dual-branch Pallas
            # kernel — models/causal.py); parameters/init identical.
            return x, b
        if self.gfn:
            return x  # bias NOT added in gfn mode (gcn_conv.py:76-77 returns early)
        if self.edge_norm:
            x = gcn_aggregate(x, g, edge_weight, use_pallas=self.use_pallas)
        else:
            # un-normalized sum aggregation (edge_norm=False path,
            # gcn_conv.py:87-99: message = x_j, no self loops added).
            x = gin_aggregate(x, g, eps=-1.0)
        return x + b


class GATConvLayer(nn.Module):
    """PyG-1.1.0 ``GATConv`` (see ops/gat.py docstring for formulation)."""

    out_per_head: int
    heads: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = True   # fused Pallas kernel on the dense path
                             # (ops/pallas_gat.py; exact same numerics,
                             # parity-tested in tests/test_pallas_gat.py)

    @nn.compact
    def __call__(self, x, g, deterministic: bool = True):
        x = x.astype(self.dtype)
        fan_in = x.shape[-1]
        w = self.param(
            "kernel",
            glorot_init(fan_in, self.heads * self.out_per_head),
            (fan_in, self.heads * self.out_per_head),
        )
        att = self.param(
            "att",
            glorot_init(self.heads, 2 * self.out_per_head),
            (self.heads, 2 * self.out_per_head),
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.heads * self.out_per_head,)
        )
        w = w.astype(self.dtype)
        b = b.astype(self.dtype)
        att = att.astype(self.dtype)
        att_dst = att[:, : self.out_per_head]   # multiplies x_i (receiver)
        att_src = att[:, self.out_per_head :]   # multiplies x_j (sender)
        rng = None
        if not deterministic and self.dropout > 0:
            rng = self.make_rng("dropout")
        if isinstance(g, DenseGraphBatch):
            bsz, n, _ = x.shape
            xh_flat = x @ w
            rate = self.dropout if not deterministic else 0.0
            # crossover between the two fused attention kernels (measured
            # r3, v5e): flash costs ~N^2 x heads of VPU softmax (0.61 ms
            # fwd+bwd at N=128, 0.93 at N=256 per aggregate), the
            # edge-formulated kernel ~Eg' x N of one-hot MXU work (~tied
            # with flash at N=256/Eg'=512, loses below).  Flash wins every
            # measured shape up to N=256; edge's linear-in-N cost takes
            # over for large-N dense batches with sparse edges.
            # PROVENANCE: the N >= 384 / Eg' <= 3N constants encode the
            # v5e crossover (benchmarks/sweep_gat_sparse.py) — re-measure
            # on other TPU generations (bench.py warns off-v5e).  Dropout
            # nuance at the crossover: the edge kernel draws keep bits per
            # duplicate-edge SLOT, the flash kernel per aggregated (r, s)
            # CELL, so on multigraphs the training-time dropout law changes
            # across the switch (eval/replay unaffected; ADVICE r3).
            eg_rows = -(-max(g.eg_budget, 1) // 128) + 2
            if (self.use_flash and g.edge_flat is not None and n >= 384
                    and eg_rows * 128 <= 3 * n):
                from cal_tpu.ops.pallas_gat_sparse import edge_gat_dense

                xh = xh_flat.reshape(bsz, n, self.heads, self.out_per_head)
                out = edge_gat_dense(
                    xh, g.edge_flat, g.eg_budget, att_dst, att_src,
                    rate, rng).astype(self.dtype)
                out = out.reshape(bsz, n, self.heads * self.out_per_head)
            elif self.use_flash:
                from cal_tpu.ops.pallas_gat import flash_gat_dense_flat

                # flat entry: no [B, N, heads, d] relayout round trip
                out = flash_gat_dense_flat(
                    xh_flat, g.adj, att_dst, att_src, rate, rng
                ).astype(self.dtype)
            else:
                xh = xh_flat.reshape(bsz, n, self.heads, self.out_per_head)
                out = gat_aggregate_dense(
                    xh, g.adj, att_dst, att_src, self.dropout, rng
                )
                out = out.reshape(bsz, n, self.heads * self.out_per_head)
        elif isinstance(g, PartitionedGraphBatch):
            from cal_tpu.parallel.edge_partition import (
                partitioned_gat_aggregate)

            v = x.shape[0]
            xh = (x @ w).reshape(v, self.heads, self.out_per_head)
            out = partitioned_gat_aggregate(
                xh, g, att_dst, att_src, self.dropout, rng
            ).reshape(v, self.heads * self.out_per_head)
        else:
            assert isinstance(g, GraphBatch)
            v = x.shape[0]
            xh = (x @ w).reshape(v, self.heads, self.out_per_head)
            if (g.tiles is not None and self.use_flash
                    and g.tiles[0].sglb is not None):
                # whole score/softmax chain in tile order (r5): no
                # [E]-order XLA ops anywhere in fwd or bwd; dropout is a
                # counter-hash of the edge id so the transposed-plan
                # backward draws identical keep bits (ops/gat.py).
                from cal_tpu.ops.gat import gat_aggregate_sparse_fused

                tf, tb = g.tiles
                rate = self.dropout if rng is not None else 0.0
                seed = (jax.random.bits(rng, (2,), dtype=jnp.uint32)
                        if rng is not None
                        else jnp.zeros((2,), jnp.uint32))
                out = gat_aggregate_sparse_fused(
                    xh, att_dst, att_src, seed, tf, tb, rate,
                    tf.node_block)
            elif g.tiles is not None and self.use_flash:
                from cal_tpu.ops.gat import gat_aggregate_sparse_pallas

                tf, tb = g.tiles
                out = gat_aggregate_sparse_pallas(
                    xh, g.senders, g.receivers, g.edge_mask,
                    att_dst, att_src, tf, tb, self.dropout, rng,
                )
            else:
                out = gat_aggregate_sparse(
                    xh, g.senders, g.receivers, g.edge_mask,
                    att_dst, att_src, self.dropout, rng,
                )
            out = out.reshape(v, self.heads * self.out_per_head)
        return out + b


class GINConvLayer(nn.Module):
    """PyG ``GINConv`` with the reference MLP
    Linear->BN->ReLU->Linear->ReLU and fixed eps=0 (model.py:188-194)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, g, node_mask=None, use_running_average: bool = False):
        h = gin_aggregate(x.astype(self.dtype), g, eps=0.0)
        h = TorchLinear(self.features, name="lin1", dtype=self.dtype)(h)
        h = MaskedBatchNorm(name="bn")(h, node_mask, use_running_average)
        h = jax.nn.relu(h)
        h = TorchLinear(self.features, name="lin2", dtype=self.dtype)(h)
        return jax.nn.relu(h)


class ReadoutMLP(nn.Module):
    """BN -> FC -> ReLU -> BN -> FC -> log_softmax (model.py:125-143).

    Shared structure of the context/object/intervention readouts."""

    hidden: int
    num_classes: int

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = False,
                 return_features: bool = False):
        x = MaskedBatchNorm(name="bn1")(x, mask, use_running_average)
        x = TorchLinear(self.hidden, name="fc1")(x)
        x = jax.nn.relu(x)
        x = MaskedBatchNorm(name="bn2")(x, mask, use_running_average)
        x = TorchLinear(self.num_classes, name="fc2")(x)
        logis = jax.nn.log_softmax(x, axis=-1)
        if return_features:
            # CausalGIN's vestigial IRM hook: pre-log_softmax logits plus
            # log-probs (reference model.py:283-291 objects_readout_layer).
            return x, logis
        return logis
