"""Headline benchmark: causal-training throughput (edges/s) on one chip.

Workload = the reference's canonical dev loop (main_syn.py defaults:
CausalGCN, hidden=128, layers=3, batch=128, synthetic BA/tree+motif graphs,
SURVEY.md §3.2) — full jitted train step (forward, 3-branch loss, backward,
Adam).  Prints ONE JSON line; ``vs_baseline`` compares against the
reference-equivalent torch hot loop measured on this host's CPU
(benchmarks/torch_baseline.py -> benchmarks/baseline_perf.json).
"""
from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

from cal_tpu.data.loader import Loader, compute_budgets
from cal_tpu.data.synthetic import dataset_bias_split, generate_synthetic_dataset
from cal_tpu.models.factory import get_model
from cal_tpu.train.optim import make_optimizer
from cal_tpu.train.steps import (
    init_state, make_causal_train_epoch, stack_batches)
from cal_tpu.utils.config import Config

_HERE = os.path.dirname(os.path.abspath(__file__))
_BASELINE_PATH = os.path.join(_HERE, "benchmarks", "baseline_perf.json")


def main():
    data_num = 64                      # 64*4*2 = 512 graphs, batch-size 128
    # dtype=bfloat16 is the validated TPU production mode: full canonical
    # 100-epoch accuracy matches f32 (bf16 co:92.44/o:93.00 vs f32
    # co:92.00/o:92.50, BASELINE.md "Measured" table); BN stats, pooling
    # and readouts stay f32 (models/causal.py dtype docstring).
    cfg = Config(model="CausalGCN", bias=0.9, lr=0.002, min_lr=5e-6,
                 dtype="bfloat16")
    dataset = generate_synthetic_dataset(
        data_num=data_num, node_num=cfg.node_num, max_degree=cfg.max_degree,
        noise=cfg.noise, seed=cfg.seed,
        cache_path=os.path.join(_HERE, "data", f"bench_syn_{data_num}.pkl"),
    )
    train_set, _, _, _ = dataset_bias_split(
        dataset, bias=cfg.bias, total=data_num * 4, seed=cfg.seed)
    budgets = compute_budgets(train_set, cfg.batch_size, cfg.layout)
    loader = Loader(train_set, cfg.batch_size, shuffle=True, layout=cfg.layout,
                    budgets=budgets, seed=cfg.seed, drop_remainder=True)

    model = get_model(cfg, 0, cfg.num_classes)
    tx = make_optimizer(cfg.lr, cfg.min_lr, cfg.epochs, len(loader))
    rng = jax.random.PRNGKey(cfg.seed)
    batches = list(loader)
    state = init_state(model, tx, batches[0], rng)
    # production path: device-side epoch loop (train/steps.py
    # make_causal_train_epoch) — one dispatch per epoch, not per step
    epoch_fn = make_causal_train_epoch(model, tx, cfg.c, cfg.o, cfg.co, True)
    stacked = stack_batches(batches)
    n_batches = len(batches)

    # mean real (directed) edges per batch — the throughput denominator.
    # NOTE: never np.asarray() the batch arrays themselves — on the tunneled
    # TPU backend that leaves them host-committed and every later step
    # re-uploads them (~10x slowdown, measured); reduce on device instead.
    count = jax.jit(
        lambda b: (b.edge_flat < b.x.shape[0] * b.x.shape[1] ** 2).sum()
    )
    edges_per_batch = float(np.mean([float(count(b)) for b in batches]))

    # warmup: compile + let the runtime reach steady state.  Iterations
    # chain through `state`, so the device must execute serially; the final
    # host fetch of the loss forces completion (block_until_ready alone is
    # NOT sufficient on the tunneled backend — see benchmarks/sweep_spmm.py).
    n = 0
    while n < 40:
        state, m = epoch_fn(state, stacked, rng)
        n += n_batches
    _ = float(m["loss"])

    # timed region: epochs chain through `state` (serial by construction);
    # ONE host fetch at the end — any mid-loop fetch stalls the pipeline.
    n_steps, t0 = 0, time.perf_counter()
    while n_steps < 400:
        state, m = epoch_fn(state, stacked, rng)
        n_steps += n_batches
    _ = float(m["loss"])
    dt = time.perf_counter() - t0

    steps_per_s = n_steps / dt
    edges_per_s = steps_per_s * edges_per_batch

    baseline = None
    if os.path.exists(_BASELINE_PATH):
        with open(_BASELINE_PATH) as f:
            baseline = json.load(f).get("train_edges_per_s")
    vs = edges_per_s / baseline if baseline else 1.0

    print(json.dumps({
        "metric": "causal_train_edges_per_s",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
