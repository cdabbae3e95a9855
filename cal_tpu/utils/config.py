"""Configuration — dataclass equivalent of the reference argparse namespace.

Mirrors reference opts.py:8-69 flag-for-flag (defaults included) so runs are
comparable; adds TPU-framework knobs (layout, dtype, mesh axes).  Dead
reference flags are kept for CLI compatibility and marked below.
"""
from __future__ import annotations

import dataclasses
from typing import Any


@dataclasses.dataclass
class Config:
    # --- toy/synthetic dataset (reference opts.py:16-24) ---
    data_num: int = 2000
    node_num: int = 15
    max_degree: int = 10
    feature_dim: int = -1          # -1 -> degree one-hot of size max_degree
    noise: float = 0.1
    num_classes: int = 4
    shape_num: int = 1
    bias: float = 0.5

    # --- training (reference opts.py:28-29, 60-64) ---
    epochs: int = 100
    batch_size: int = 128
    lr: float = 0.001
    min_lr: float = 1e-6
    weight_decay: float = 0.0
    seed: int = 666

    # --- causal GNN (reference opts.py:42-47) ---
    layers: int = 3
    c: float = 0.5                 # shortcut-branch (KL to uniform) weight
    o: float = 1.0                 # causal-branch (NLL) weight
    co: float = 0.5                # intervention-branch (NLL) weight
    harf_hidden: float = 0.5       # dead in reference; kept for parity
    cat_or_add: str = "add"
    hidden: int = 128

    # --- behavior flags (reference opts.py:32-38) ---
    with_random: bool = True
    eval_random: bool = False
    without_node_attention: bool = False
    without_edge_attention: bool = False

    # --- real-data protocol (reference opts.py:51-57) ---
    folds: int = 10
    fc_num: str = "222"            # dead in reference; kept for parity
    data_root: str = "data"
    dataset: str = "NCI1"
    epoch_select: str = "test_max"
    model: str = "GCN"             # GCN/GIN/GAT/CausalGCN/CausalGIN/CausalGAT

    # --- dead reference flags, kept for CLI parity (opts.py:13-65) ---
    step_size: float = 0.001
    pretrain: int = 30
    penalty_weight: float = 0.1
    train_type: str = "base"
    the: int = 0
    normalize: bool = False
    save_model: bool = False
    inference: bool = False
    k: int = 3
    num_layers: int = 3
    save_dir: str = "debug"
    lr_decay_factor: float = 0.5
    lr_decay_step_size: int = 500
    global_pool: str = "sum"

    # --- TPU-framework knobs (new scope) ---
    resume: bool = False           # resume from latest checkpoint in save_dir
    metrics_path: str = ""         # jsonl metrics sink ("" = off)
    tb_dir: str = ""               # TensorBoard log dir ("" = off)
    profile_dir: str = ""          # jax profiler trace dir ("" = off)
    layout: str = "dense"          # "dense" (MXU matmul path) | "sparse" (segment path)
    dtype: str = "float32"         # compute dtype for conv stack ("bfloat16" for perf)
    node_budget: int = 0           # 0 -> auto (max graph size rounded up)
    edge_budget: int = 0           # 0 -> auto (sparse layout only)
    mesh_dp: int = 1               # data-parallel mesh size
    mesh_edge: int = 1             # edge-partition mesh size (halo exchange);
                                   # dp*edge > 1 trains on a Mesh(('dp','edge'))
                                   # via the PartitionedGraphBatch layout
    use_pallas: bool = True        # use Pallas kernels where available
    pack_batches: str = "auto"     # "auto"/"true"/"false": budget-packed
                                   # sparse batching (variable graphs/batch
                                   # under fixed node+edge budgets) — auto
                                   # enables it when worst-case padding
                                   # exceeds 1.5x the mean batch (heavy-
                                   # tailed datasets like REDDIT/DD)
    scan_epochs: bool = True       # device-side epoch loop (1 dispatch/epoch)
    fold_parallel: bool = False    # k-fold protocol: train ALL folds at once
                                   # (vmapped epoch; fold axis sharded over
                                   # the dp mesh when mesh_dp > 1)
    log_every: int = 1

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)


def default_config(**kw: Any) -> Config:
    return Config(**kw)


def parse_args(argv: list[str] | None = None) -> Config:
    """argparse front-end with the reference's flag names (opts.py:8-69)."""
    import argparse

    str2bool = lambda x: str(x).lower() == "true"
    p = argparse.ArgumentParser()
    for f in dataclasses.fields(Config):
        t = f.type if isinstance(f.type, type) else type(f.default)
        if t is bool:
            p.add_argument(f"--{f.name}", type=str2bool, default=f.default)
        else:
            p.add_argument(f"--{f.name}", type=t, default=f.default)
    ns = p.parse_args(argv)
    cfg = Config(**vars(ns))
    print_config(cfg)
    return cfg


def print_config(cfg: Config, width: int = 80) -> None:
    """Pretty-print flags like reference opts.py:71-74."""
    for f in dataclasses.fields(cfg):
        val = getattr(cfg, f.name)
        pad = max(1, width - len(f.name) - len(str(val)))
        print(f.name + "." * pad + str(val))
    print()
