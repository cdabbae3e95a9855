"""Causal attention models: CausalGCN / CausalGIN / CausalGAT.

One module, three backbones — the reference triplicates ~150 lines per model
(model.py:12-450); the only differences are the backbone conv stack and
whether ``with_random`` gates the intervention shuffle:

* shared pattern (reference model.py:85-122): input BN -> linear "gfn"
  projection -> K backbone conv layers -> edge & node (context, object)
  attention -> BN -> masked context/object GCN convs -> global_add_pool ->
  three readout MLPs (context, object, intervention);
* backbone 'gcn': BN -> GCNConv -> ReLU per layer (model.py:93-95); honors
  ``with_random`` and the attention-ablation flags (model.py:99-107,149-151);
* backbone 'gin': GINConv only, no BN/ReLU wrapper (model.py:242-243,185);
  ignores ``with_random`` (model.py:298-299) and ablation flags;
* backbone 'gat': BN -> GATConv(4 heads, attn-dropout 0.2) -> ReLU
  (model.py:388-390); masked convs are still GCNConv (model.py:346-347);
  ignores ``with_random`` and ablation flags (model.py:435-436).

The intervention shuffle (model.py:145-156) — python ``random.shuffle`` on
the host in the reference, forcing a host sync every step — is a device-side
PRNG permutation here: sample uniforms, push padded slots to +inf, argsort.
Real graphs occupy a contiguous prefix (graph.py batcher invariant), so the
argsort yields a uniform random permutation of exactly the real graphs.
Under data parallelism this becomes a cross-device permute
(parallel/intervene.py).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from cal_tpu.graph import DenseGraphBatch, GraphBatch
from cal_tpu.nn.layers import (
    GATConvLayer,
    GCNConvLayer,
    GINConvLayer,
    MaskedBatchNorm,
    ReadoutMLP,
    TorchLinear,
)
from cal_tpu.ops.attention import edge_attention, global_add_pool, node_attention


def intervention_permutation(rng, graph_mask: jax.Array) -> jax.Array:
    """Uniform random permutation of the real graphs (device-side).

    Returns perm [G] s.t. perm[i] is a uniformly random real graph for every
    real slot i, and padded slots map to themselves (masked out of the loss).
    Handles real slots at ANY positions — the single-device batcher puts them
    in a contiguous prefix, but the edge-partitioned layout has one prefix
    PER dp group (graph.py PartitionedGraphBatch)."""
    u = jax.random.uniform(rng, graph_mask.shape)
    u = jnp.where(graph_mask, u, jnp.inf)
    order = jnp.argsort(u)              # random real slots first, padded last
    rank = jnp.cumsum(graph_mask) - 1   # index of each real slot among reals
    return jnp.where(
        graph_mask,
        order[jnp.clip(rank, 0, None)],
        jnp.arange(graph_mask.shape[0]),
    )


class CausalGNN(nn.Module):
    backbone: str                   # 'gcn' | 'gin' | 'gat'
    hidden: int
    num_classes: int
    num_layers: int = 3
    cat_or_add: str = "add"
    with_random: bool = True
    without_node_attention: bool = False
    without_edge_attention: bool = False
    heads: int = 4
    gat_dropout: float = 0.2
    use_pallas: bool = True          # fused kernels (flash-GAT) on by default
    dtype: jnp.dtype = jnp.float32   # compute dtype for the conv stack
                                     # (bf16 halves the HBM-bound traffic;
                                     # BN stats / pooling / readouts stay f32)

    @nn.compact
    def __call__(self, g, eval_random: bool = True, train: bool = False,
                 train_type: str = "base"):
        """Returns (c_log_probs, o_log_probs, co_log_probs), each [G, C].

        ``train_type="irm"`` (honored by the 'gin' backbone only, matching
        the reference — CausalGIN.forward model.py:234,289-291) makes the
        o-branch return ``(pre_log_softmax_logits, log_probs)`` instead of
        log_probs: the vestigial IRM hook, never triggered by the trainers.
        """
        ura = not train  # BN use_running_average
        dense = isinstance(g, DenseGraphBatch)
        if dense and self.dtype != jnp.float32:
            # one cast pass; every [B,N,N]/[B,N,H] read downstream is halved
            g = dataclasses.replace(
                g, x=g.x.astype(self.dtype), adj=g.adj.astype(self.dtype))
        x = g.x.astype(self.dtype)
        node_mask = g.node_mask

        # --- backbone (model.py:90-95 / 239-243 / 385-390) ---
        x = MaskedBatchNorm(name="bn_feat")(x, node_mask, ura)
        x = jax.nn.relu(GCNConvLayer(self.hidden, gfn=True, name="conv_feat", dtype=self.dtype)(x))
        for i in range(self.num_layers):
            if self.backbone == "gcn":
                x = MaskedBatchNorm(name=f"bns_conv_{i}")(x, node_mask, ura)
                x = jax.nn.relu(GCNConvLayer(self.hidden, name=f"convs_{i}", dtype=self.dtype, use_pallas=self.use_pallas)(x, g))
            elif self.backbone == "gin":
                x = GINConvLayer(self.hidden, name=f"convs_{i}", dtype=self.dtype)(
                    x, g, node_mask, ura
                )
            elif self.backbone == "gat":
                x = MaskedBatchNorm(name=f"bns_conv_{i}")(x, node_mask, ura)
                x = jax.nn.relu(
                    GATConvLayer(
                        self.hidden // self.heads,
                        heads=self.heads,
                        dropout=self.gat_dropout,
                        name=f"convs_{i}",
                        dtype=self.dtype,
                        use_flash=self.use_pallas,
                    )(x, g, deterministic=not train)
                )
            else:
                raise ValueError(self.backbone)

        # --- edge attention (model.py:97-104) ---
        ablate = self.backbone == "gcn"  # only CausalGCN has ablation branches
        sparse_tiled = (
            isinstance(g, GraphBatch) and g.tiles is not None
            and g.tiles[0].sglb is not None)
        if ablate and self.without_edge_attention:
            if dense and self.use_pallas:
                # sigma(0 + 0) = 0.5 exactly — the constant-0.5 ablation
                # weights in factored form for the fused kernel.
                from cal_tpu.ops.pallas_gcn import SigmoidEdgeWeight

                zeros = jnp.zeros(x.shape[:-1], x.dtype)
                w_c = SigmoidEdgeWeight(zeros, zeros, negate=False)
                w_o = SigmoidEdgeWeight(zeros, zeros, negate=True)
            else:
                shape = g.adj.shape if dense else g.edge_mask.shape
                w_c = jnp.full(shape, 0.5, x.dtype)
                w_o = jnp.full(shape, 0.5, x.dtype)
        else:
            # one [2H, 2] kernel mirroring the reference ``edge_att_mlp``
            # module exactly; ops/attention.py splits it into sender/receiver
            # halves (a linear on a concat = sum of two linears).
            fan_in = 2 * self.hidden
            kernel = self.param(
                "edge_att_kernel",
                lambda k, s: jax.random.uniform(
                    k, s, jnp.float32, -1.0 / fan_in ** 0.5, 1.0 / fan_in ** 0.5
                ),
                (fan_in, 2),
            )
            bias = self.param(
                "edge_att_bias",
                lambda k, s: jax.random.uniform(
                    k, s, jnp.float32, -1.0 / fan_in ** 0.5, 1.0 / fan_in ** 0.5
                ),
                (2,),
            )
            w_c, w_o = edge_attention(
                x, g, kernel[: self.hidden], kernel[self.hidden :], bias,
                factored=(dense or sparse_tiled) and self.use_pallas,
            )

        # --- node attention (model.py:106-111) ---
        if ablate and self.without_node_attention:
            att_c = jnp.full(x.shape[:-1], 0.5, x.dtype)
            att_o = jnp.full(x.shape[:-1], 0.5, x.dtype)
        else:
            na_kernel = self.param(
                "node_att_kernel",
                lambda k, s: jax.random.uniform(
                    k, s, jnp.float32,
                    -1.0 / self.hidden ** 0.5, 1.0 / self.hidden ** 0.5,
                ),
                (self.hidden, 2),
            )
            na_bias = self.param(
                "node_att_bias",
                lambda k, s: jax.random.uniform(
                    k, s, jnp.float32,
                    -1.0 / self.hidden ** 0.5, 1.0 / self.hidden ** 0.5,
                ),
                (2,),
            )
            att_c, att_o = node_attention(x, na_kernel, na_bias)
        xc = att_c[..., None] * x
        xo = att_o[..., None] * x

        # --- masked context/object convs (model.py:112-113; GCNConv for all
        # backbones, incl. CausalGAT — model.py:346-347) ---
        xc = MaskedBatchNorm(name="bnc")(xc, node_mask, ura)
        xo = MaskedBatchNorm(name="bno")(xo, node_mask, ura)
        ctx_conv = GCNConvLayer(self.hidden, name="context_convs",
                                dtype=self.dtype, use_pallas=self.use_pallas)
        obj_conv = GCNConvLayer(self.hidden, name="objects_convs",
                                dtype=self.dtype, use_pallas=self.use_pallas)
        from cal_tpu.ops.pallas_gcn import (
            SigmoidEdgeWeight, fused_gcn_dense_att_dual)

        shared_factored = (
            self.use_pallas
            and isinstance(w_c, SigmoidEdgeWeight)
            and isinstance(w_o, SigmoidEdgeWeight)
            and w_c.src is w_o.src and w_c.dst is w_o.dst
            and not w_c.negate and w_o.negate
        )
        if dense and shared_factored:
            # both masked convs in ONE dual-branch kernel: the [B, N, N]
            # adjacency (the step's largest tensor) is read once per
            # fwd/bwd instead of twice (ops/pallas_gcn.py dual section).
            xc_t, bc = ctx_conv(xc, transform_only=True)
            xo_t, bo = obj_conv(xo, transform_only=True)
            oc, oo = fused_gcn_dense_att_dual(
                xc_t, xo_t, g.adj, w_c.src, w_c.dst)
            xc = jax.nn.relu(oc + bc)
            xo = jax.nn.relu(oo + bo)
        elif sparse_tiled and shared_factored:
            # sparse analog (r5): one [V, 2H] pair kernel — per-tile
            # one-hot builds and the whole shared coefficient chain are
            # paid once for both convs (ops/pallas_spmm.py pair section)
            from cal_tpu.ops.pallas_spmm import (
                gcn_aggregate_sparse_sigmoid_pair_pallas)

            xc_t, bc = ctx_conv(xc, transform_only=True)
            xo_t, bo = obj_conv(xo, transform_only=True)
            tf, tb = g.tiles
            oc, oo = gcn_aggregate_sparse_sigmoid_pair_pallas(
                xc_t, xo_t, w_c.src, w_c.dst, tf, tb, tf.node_block)
            xc = jax.nn.relu(oc + bc)
            xo = jax.nn.relu(oo + bo)
        else:
            xc = jax.nn.relu(ctx_conv(xc, g, w_c))
            xo = jax.nn.relu(obj_conv(xo, g, w_o))

        # --- readout (model.py:115-122) ---
        xc = global_add_pool(xc, g)
        xo = global_add_pool(xo, g)
        gm = g.graph_mask

        xc_logis = ReadoutMLP(self.hidden, self.num_classes, name="context_readout")(
            xc, gm, ura
        )
        xo_logis = ReadoutMLP(self.hidden, self.num_classes, name="objects_readout")(
            xo, gm, ura,
            return_features=(train_type == "irm" and self.backbone == "gin"),
        )

        # --- intervention branch (model.py:145-164) ---
        shuffle = eval_random if self.backbone != "gcn" else (
            self.with_random and eval_random
        )
        if shuffle:
            perm = intervention_permutation(self.make_rng("intervention"), gm)
            xc_mix = jnp.take(xc, perm, axis=0)
        else:
            xc_mix = xc
        if self.cat_or_add == "cat":
            xco = jnp.concatenate([xc_mix, xo], axis=-1)
        elif self.cat_or_add == "add":
            xco = xc_mix + xo
        else:
            raise ValueError(self.cat_or_add)
        xco_logis = ReadoutMLP(self.hidden, self.num_classes, name="random_readout")(
            xco, gm, ura
        )
        return xc_logis, xo_logis, xco_logis
