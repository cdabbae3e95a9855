"""CausalGAT training throughput: dense layout vs sparse (edge-list) layout.

VERDICT r2 item 1: the dense layout evaluates N^2 softmax cells/graph where
only ~1k edges are real (246x waste at bench density).  The sparse layout
formulates the backbone attention over the edge list (SDDMM + segment
softmax + multi-head tiled SpMM).  This sweep measures the full jitted
train step (fwd + 3-branch loss + bwd + Adam) for both layouts at the
canonical bench shapes (B=128, N~248, ~128k edges/batch).

Run from repo root: python -m benchmarks.sweep_gat_layout
"""
from __future__ import annotations

import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cal_tpu.data.loader import Loader, compute_budgets
from cal_tpu.data.synthetic import dataset_bias_split, generate_synthetic_dataset
from cal_tpu.models.factory import get_model
from cal_tpu.train.optim import make_optimizer
from cal_tpu.train.steps import init_state, make_causal_train_epoch, stack_batches
from cal_tpu.utils.config import Config

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)


def workload(layout: str, dtype: str = "bfloat16", use_pallas: bool = True):
    data_num = 64
    cfg = Config(model="CausalGAT", bias=0.9, lr=0.002, min_lr=5e-6,
                 dtype=dtype, layout=layout, use_pallas=use_pallas)
    dataset = generate_synthetic_dataset(
        data_num=data_num, node_num=cfg.node_num, max_degree=cfg.max_degree,
        noise=cfg.noise, seed=cfg.seed,
        cache_path=os.path.join(_ROOT, "data", f"bench_syn_{data_num}.pkl"),
    )
    train_set, _, _, _ = dataset_bias_split(
        dataset, bias=cfg.bias, total=data_num * 4, seed=cfg.seed)
    budgets = compute_budgets(train_set, cfg.batch_size, layout)
    loader = Loader(train_set, cfg.batch_size, shuffle=True, layout=layout,
                    budgets=budgets, seed=cfg.seed, drop_remainder=True,
                    spmm_tiles="auto" if use_pallas else False)
    batches = list(loader)
    if layout == "dense":
        count = jax.jit(
            lambda b: (b.edge_flat < b.x.shape[0] * b.x.shape[1] ** 2).sum())
    else:
        count = jax.jit(lambda b: b.edge_mask.sum())
    edges_per_batch = float(np.mean([float(count(b)) for b in batches]))
    return cfg, batches, edges_per_batch


def bench(cfg, batches, edges_per_batch, target_steps: int = 200):
    model = get_model(cfg, 0, cfg.num_classes)
    tx = make_optimizer(cfg.lr, cfg.min_lr, cfg.epochs, len(batches))
    rng = jax.random.PRNGKey(cfg.seed)
    state = init_state(model, tx, batches[0], rng)
    epoch_fn = make_causal_train_epoch(model, tx, cfg.c, cfg.o, cfg.co, True)
    stacked = stack_batches(batches)
    n_batches = len(batches)

    n = 0
    while n < max(40, 2 * n_batches):
        state, m = epoch_fn(state, stacked, rng)
        n += n_batches
    _ = float(m["loss"])

    n_steps = 0
    t0 = time.perf_counter()
    while n_steps < target_steps:
        state, m = epoch_fn(state, stacked, rng)
        n_steps += n_batches
    _ = float(m["loss"])
    dt = time.perf_counter() - t0
    return n_steps / dt * edges_per_batch, dt / n_steps


def main():
    rows = []
    for layout in (sys.argv[1:] or ["dense", "sparse"]):
        use_pallas = True
        lk = layout
        if layout.endswith("-xla"):
            lk = layout[:-4]
            use_pallas = False
        cfg, batches, epb = workload(lk, use_pallas=use_pallas)
        eps, spstep = bench(cfg, batches, epb)
        rows.append((layout, eps, spstep, epb))
        print(f"layout={layout:12s} edges/s={eps/1e6:8.2f}M  "
              f"step={spstep*1e3:6.2f}ms  edges/batch={epb:.0f}", flush=True)
    if len(rows) >= 2:
        print(f"sparse/dense speedup: {rows[1][1] / rows[0][1]:.2f}x")


if __name__ == "__main__":
    main()
