"""Model factory — reference ``opts.get_model`` (opts.py:85-119)."""
from __future__ import annotations

import jax.numpy as jnp

from cal_tpu.models.baselines import BaselineGNN
from cal_tpu.models.causal import CausalGNN
from cal_tpu.utils.config import Config

_BASELINES = {"GCN": "gcn", "GIN": "gin", "GAT": "gat"}
_CAUSAL = {"CausalGCN": "gcn", "CausalGIN": "gin", "CausalGAT": "gat"}


def get_model(cfg: Config, num_features: int, num_classes: int):
    """Build the model named by cfg.model (num_features is carried by the
    batch, so only num_classes is needed here)."""
    del num_features
    dtype = (jnp.bfloat16 if cfg.dtype in ("bfloat16", "bf16")
             else jnp.float32)
    if cfg.model in _BASELINES:
        bb = _BASELINES[cfg.model]
        return BaselineGNN(
            backbone=bb,
            hidden=cfg.hidden,
            num_classes=num_classes,
            num_layers=cfg.layers,
            dropout=0.2 if bb == "gat" else 0.0,
            dtype=dtype,
            use_pallas=cfg.use_pallas,
        )
    if cfg.model in _CAUSAL:
        return CausalGNN(
            backbone=_CAUSAL[cfg.model],
            hidden=cfg.hidden,
            num_classes=num_classes,
            num_layers=cfg.layers,
            cat_or_add=cfg.cat_or_add,
            with_random=cfg.with_random,
            without_node_attention=cfg.without_node_attention,
            without_edge_attention=cfg.without_edge_attention,
            dtype=dtype,
            use_pallas=cfg.use_pallas,
        )
    raise ValueError(f"unknown model {cfg.model!r}")
