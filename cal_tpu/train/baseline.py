"""Baseline (non-causal) synthetic training — reference train.py:35-117."""
from __future__ import annotations

from typing import Sequence

import jax

from cal_tpu.data.loader import Loader, compute_budgets
from cal_tpu.graph import HostGraph
from cal_tpu.models.factory import get_model
from cal_tpu.train.optim import make_optimizer
from cal_tpu.train.steps import (
    init_state,
    make_baseline_eval_epoch,
    make_baseline_eval_step,
    make_baseline_train_epoch,
    make_baseline_train_step,
    stack_batches,
)
from cal_tpu.utils.config import Config


def _run_epoch(train_step, state, loader, rng):
    tot = {"loss": 0.0, "correct": 0.0, "n": 0.0}
    for batch in loader:
        state, m = train_step(state, batch, rng)
        for k in tot:
            tot[k] += float(m[k])
    n = max(tot["n"], 1.0)
    return state, tot["loss"] / n, tot["correct"] / n


def _eval(eval_step, state, loader):
    correct = n = 0.0
    for batch in loader:
        m = eval_step(state, batch)
        correct += float(m["correct"])
        n += float(m["n"])
    return correct / max(n, 1.0)


def _run_epoch_scan(epoch_fn, state, loader, rng):
    batches = list(loader)
    if not batches:
        return state, 0.0, 0.0
    state, m = epoch_fn(state, stack_batches(batches), rng)
    n = max(float(m["n"]), 1.0)
    return state, float(m["loss"]) / n, float(m["correct"]) / n


def _eval_scan(eval_epoch, state, stacked):
    if stacked is None:
        return 0.0
    m = eval_epoch(state, stacked)
    return float(m["correct"]) / max(float(m["n"]), 1.0)


def _stack_loader(loader):
    batches = list(loader)
    return stack_batches(batches) if batches else None


def train_baseline_syn(
    train_set: Sequence[HostGraph],
    val_set: Sequence[HostGraph],
    test_set: Sequence[HostGraph],
    cfg: Config,
    verbose: bool = True,
):
    budgets = compute_budgets(
        list(train_set) + list(val_set) + list(test_set), cfg.batch_size, cfg.layout
    )
    train_loader = Loader(train_set, cfg.batch_size, shuffle=True,
                          layout=cfg.layout, budgets=budgets, seed=cfg.seed,
                          spmm_tiles="auto" if cfg.use_pallas else False)
    val_loader = Loader(val_set, cfg.batch_size, layout=cfg.layout, budgets=budgets,
                        spmm_tiles="auto" if cfg.use_pallas else False)
    test_loader = Loader(test_set, cfg.batch_size, layout=cfg.layout, budgets=budgets,
                         spmm_tiles="auto" if cfg.use_pallas else False)

    model = get_model(cfg, 0, cfg.num_classes)
    tx = make_optimizer(cfg.lr, cfg.min_lr, cfg.epochs, len(train_loader),
                        cfg.weight_decay)
    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng = jax.random.split(rng)
    state = init_state(model, tx, next(iter(train_loader)), init_rng,
                       causal=False)
    if cfg.scan_epochs:
        epoch_fn = make_baseline_train_epoch(
            model, tx, skip_empty=train_loader.pack)
        eval_epoch = make_baseline_eval_epoch(
            model, skip_empty=val_loader.pack)
        # eval loaders don't shuffle: pack + stack once, reuse every epoch
        val_stacked = _stack_loader(val_loader)
        test_stacked = _stack_loader(test_loader)
    else:
        train_step = make_baseline_train_step(model, tx)
        eval_step = make_baseline_eval_step(model)

    best_val, upd_test, upd_ep = 0.0, 0.0, 0
    for epoch in range(1, cfg.epochs + 1):
        rng, e_rng = jax.random.split(rng)
        if cfg.scan_epochs:
            state, loss, train_acc = _run_epoch_scan(
                epoch_fn, state, train_loader, e_rng)
            val_acc = _eval_scan(eval_epoch, state, val_stacked)
            test_acc = _eval_scan(eval_epoch, state, test_stacked)
        else:
            state, loss, train_acc = _run_epoch(
                train_step, state, train_loader, e_rng)
            val_acc = _eval(eval_step, state, val_loader)
            test_acc = _eval(eval_step, state, test_loader)
        if val_acc > best_val:
            best_val, upd_test, upd_ep = val_acc, test_acc, epoch
        if verbose:
            print(
                "BIAS:[{:.2f}] | Model:[{}] Epoch:[{}/{}] Loss:[{:.4f}] Train:[{:.2f}] "
                "val:[{:.2f}] Test:[{:.2f}] | Best Val:[{:.2f}] Update Test:[{:.2f}] at Epoch:[{}]".format(
                    cfg.bias, cfg.model, epoch, cfg.epochs, loss,
                    train_acc * 100, val_acc * 100, test_acc * 100,
                    best_val * 100, upd_test * 100, upd_ep,
                )
            )
    print(
        "syd: BIAS:[{:.2f}] | Best Val acc:[{:.2f}] Test acc:[{:.2f}] at epoch:[{}]".format(
            cfg.bias, best_val * 100, upd_test * 100, upd_ep
        )
    )
    return {"best_val_acc": best_val, "test_acc": upd_test, "epoch": upd_ep,
            "state": state}
