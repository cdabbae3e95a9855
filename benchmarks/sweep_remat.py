"""Remat-policy sweep on the bench workload (full causal train step).

The bf16 step is VPU/HBM-bound; the forward saves [B,N,N]-shaped residuals
(GCN norm chains, the edge-attention sigmoid) to HBM for the backward.
``jax.checkpoint`` policies trade that residual traffic for recompute —
this sweep measures which policy wins on the real chip.

Run: ``python -m benchmarks.sweep_remat`` (TPU; ~3 min).
"""
from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cal_tpu.data.loader import Loader, compute_budgets
from cal_tpu.data.synthetic import dataset_bias_split, generate_synthetic_dataset
from cal_tpu.graph import PackedDenseBatch, to_dense
from cal_tpu.models.factory import get_model
from cal_tpu.train.losses import causal_losses
from cal_tpu.train.optim import make_optimizer
from cal_tpu.train.steps import TrainState, init_state, stack_batches
from cal_tpu.utils.config import Config

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_epoch(model, tx, remat_policy):
    """bench.py's epoch fn with an optional jax.checkpoint policy wrapped
    around the whole forward (loss) computation."""

    def step(state: TrainState, batch, rng):
        g = to_dense(batch) if isinstance(batch, PackedDenseBatch) else batch
        i_rng, d_rng = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            (c_logs, o_logs, co_logs), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                g, eval_random=True, train=True,
                rngs={"intervention": i_rng, "dropout": d_rng},
                mutable=["batch_stats"],
            )
            total, _ = causal_losses(
                c_logs, o_logs, co_logs, g.y, g.graph_mask, 0.5, 1.0, 0.5)
            return total, updates["batch_stats"]

        if remat_policy is not None:
            loss_fn = jax.checkpoint(loss_fn, policy=remat_policy)
        grads, bs = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, batch_stats=bs,
                          opt_state=opt_state, step=state.step + 1), None

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch(state, stacked, rng):
        state, _ = jax.lax.scan(lambda s, b: step(s, b, rng), state, stacked)
        return state

    return epoch


def main():
    data_num = 64
    cfg = Config(model="CausalGCN", bias=0.9, lr=0.002, min_lr=5e-6,
                 dtype="bfloat16")
    dataset = generate_synthetic_dataset(
        data_num=data_num, node_num=cfg.node_num, max_degree=cfg.max_degree,
        noise=cfg.noise, seed=cfg.seed,
        cache_path=os.path.join(_HERE, "data", f"bench_syn_{data_num}.pkl"))
    train_set, _, _, _ = dataset_bias_split(
        dataset, bias=cfg.bias, total=data_num * 4, seed=cfg.seed)
    budgets = compute_budgets(train_set, cfg.batch_size, cfg.layout)
    loader = Loader(train_set, cfg.batch_size, shuffle=True, layout=cfg.layout,
                    budgets=budgets, seed=cfg.seed, drop_remainder=True)
    model = get_model(cfg, 0, cfg.num_classes)
    tx = make_optimizer(cfg.lr, cfg.min_lr, cfg.epochs, len(loader))
    rng = jax.random.PRNGKey(cfg.seed)
    batches = list(loader)
    stacked = stack_batches(batches)
    n_batches = len(batches)
    count = jax.jit(
        lambda b: (b.edge_flat < b.x.shape[0] * b.x.shape[1] ** 2).sum())
    edges_per_batch = float(np.mean([float(count(b)) for b in batches]))

    pols = [
        ("no_remat", None),
        ("dots_saveable", jax.checkpoint_policies.dots_saveable),
        ("nothing_saveable", jax.checkpoint_policies.nothing_saveable),
    ]
    for name, pol in pols:
        state = init_state(model, tx, batches[0], rng)
        epoch_fn = make_epoch(model, tx, pol)
        n = 0
        while n < 40:                       # warmup (chained through state)
            state = epoch_fn(state, stacked, rng)
            n += n_batches
        _ = float(jax.tree.leaves(state.params)[0][0, 0])
        n, t0 = 0, time.perf_counter()
        while n < 400:
            state = epoch_fn(state, stacked, rng)
            n += n_batches
        _ = float(jax.tree.leaves(state.params)[0][0, 0])
        dt = time.perf_counter() - t0
        eps = n / dt * edges_per_batch
        print(f"{name:18s} {dt / n * 1e3:7.3f} ms/step  {eps / 1e6:8.1f} M edges/s")


if __name__ == "__main__":
    main()
