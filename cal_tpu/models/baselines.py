"""Baseline models GCNNet / GINNet / GATNet (reference model.py:452-633).

Shared pattern: input BN -> gfn linear projection -> K conv layers ->
global_add_pool -> (num_fc_layers - 1) x (BN -> FC -> ReLU) -> BN ->
[dropout for GAT] -> classifier -> log_softmax.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from cal_tpu.graph import DenseGraphBatch

from cal_tpu.nn.layers import (
    GATConvLayer,
    GCNConvLayer,
    GINConvLayer,
    MaskedBatchNorm,
    TorchLinear,
)
from cal_tpu.ops.attention import global_add_pool


class BaselineGNN(nn.Module):
    backbone: str                   # 'gcn' | 'gin' | 'gat'
    hidden: int
    num_classes: int
    num_layers: int = 3
    num_fc_layers: int = 2
    heads: int = 4
    dropout: float = 0.0            # GATNet uses 0.2 (model.py:580,630-631)
    dtype: jnp.dtype = jnp.float32  # compute dtype (see CausalGNN.dtype)
    use_pallas: bool = True

    @nn.compact
    def __call__(self, g, train: bool = False):
        ura = not train
        if isinstance(g, DenseGraphBatch) and self.dtype != jnp.float32:
            g = dataclasses.replace(
                g, x=g.x.astype(self.dtype), adj=g.adj.astype(self.dtype))
        x = g.x.astype(self.dtype)
        node_mask = g.node_mask

        x = MaskedBatchNorm(name="bn_feat")(x, node_mask, ura)
        x = jax.nn.relu(GCNConvLayer(self.hidden, gfn=True, name="conv_feat", dtype=self.dtype)(x))
        for i in range(self.num_layers):
            if self.backbone == "gcn":
                x = MaskedBatchNorm(name=f"bns_conv_{i}")(x, node_mask, ura)
                x = jax.nn.relu(GCNConvLayer(self.hidden, name=f"convs_{i}", dtype=self.dtype)(x, g))
            elif self.backbone == "gin":
                x = GINConvLayer(self.hidden, name=f"convs_{i}", dtype=self.dtype)(
                    x, g, node_mask, ura
                )
            elif self.backbone == "gat":
                x = MaskedBatchNorm(name=f"bns_conv_{i}")(x, node_mask, ura)
                x = jax.nn.relu(
                    GATConvLayer(
                        self.hidden // self.heads,
                        dtype=self.dtype,
                        use_flash=self.use_pallas,
                        heads=self.heads,
                        dropout=self.dropout,
                        name=f"convs_{i}",
                    )(x, g, deterministic=not train)
                )
            else:
                raise ValueError(self.backbone)

        x = global_add_pool(x, g)
        gm = g.graph_mask
        for i in range(self.num_fc_layers - 1):
            x = MaskedBatchNorm(name=f"bns_fc_{i}")(x, gm, ura)
            x = jax.nn.relu(TorchLinear(self.hidden, name=f"lins_{i}")(x))
        x = MaskedBatchNorm(name="bn_hidden")(x, gm, ura)
        if self.backbone == "gat" and self.dropout > 0 and train:
            x = nn.Dropout(self.dropout, deterministic=False)(
                x, rng=self.make_rng("dropout")
            )
        x = TorchLinear(self.num_classes, name="lin_class")(x)
        return jax.nn.log_softmax(x, axis=-1)
