"""Causal training drivers — reference train_causal.py protocols.

``train_causal_syn`` (train_causal.py:11-61): train/val/test loaders, Adam +
per-epoch cosine LR, select test accuracies at the epoch of best val acc
(o-branch).

``train_causal_real`` (train_causal.py:63-160): k-fold (default 10,
'test_max': val ≡ test), fresh model per fold, post-hoc epoch selection:
co-branch epoch = argmax of mean-over-folds test acc, o-branch epoch chosen
by its own argmax; report mean±std over folds.  Scientifically odd but it is
what the reference numbers mean (SURVEY.md §3.3).
"""
from __future__ import annotations

import os
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cal_tpu.data.loader import Loader, compute_budgets
from cal_tpu.graph import HostGraph
from cal_tpu.models.factory import get_model
from cal_tpu.train.optim import make_optimizer
from cal_tpu.train.steps import (
    init_state,
    make_causal_eval_epoch,
    make_causal_eval_epoch_folds,
    make_causal_eval_step,
    make_causal_train_epoch,
    make_causal_train_epoch_folds,
    make_causal_train_step,
    make_init_fn,
    stack_batches_host,
    stack_folds,
    to_device,
)
from cal_tpu.utils.checkpoint import Checkpointer
from cal_tpu.utils.config import Config
from cal_tpu.utils.logging import MetricsLogger


def _run_epoch(train_step, state, loader, rng, mesh=None):
    tot = {"loss": 0.0, "loss_c": 0.0, "loss_o": 0.0, "loss_co": 0.0,
           "correct_o": 0.0, "n": 0.0}
    for batch in loader:
        if mesh is not None:
            batch = _shard(batch, mesh)
        state, m = train_step(state, batch, rng)
        for k in tot:
            tot[k] += float(m[k])
    n = max(tot["n"], 1.0)
    return state, (tot["loss"] / n, tot["loss_c"] / n, tot["loss_o"] / n,
                   tot["loss_co"] / n, tot["correct_o"] / n)


def _shard(batch, mesh):
    from cal_tpu.parallel import shard_batch

    return shard_batch(batch, mesh)


class _EpochPrefetcher:
    """Pipeline host epoch prep against device execution (r5).

    Attributing the SYNREDDIT 10-fold epoch (BASELINE.md r5): of the
    2.8 s wall, device compute is only ~0.3 s — the rest is the host
    C++-packer/tile-plan pass (~0.8 s), the leaf np.stack (~0.9 s) and
    the 123 MB tunnel H2D (~1.5 s).  A single daemon producer runs
    pack -> stack -> to_device for epoch N+1 while the device executes
    epoch N, itself split in two stages (pack+stack | H2D) so the tunnel
    transfer of epoch N+1 overlaps the packing of N+2 (bounded queues of
    1 — at most two extra epoch stacks of host RAM).
    The pack producer is the ONLY consumer of ``loader.host_batches``, so the
    shuffle stream is drawn in exactly the sequential order; numerics
    are unchanged (tests/test_train_smoke.py scan parity)."""

    def __init__(self, loader, mesh):
        import queue
        import threading

        self._queue_mod = queue
        self._hq = queue.Queue(maxsize=1)   # host stacks (pack+stack)
        self._q = queue.Queue(maxsize=1)    # device stacks (after H2D)
        self.loader, self.mesh = loader, mesh
        self._stop = False
        for fn in (self._produce_host, self._produce_device):
            threading.Thread(target=fn, daemon=True,
                             name=f"epoch-prefetch-{fn.__name__}").start()

    def _put(self, q, item):
        while not self._stop:
            try:
                q.put(item, timeout=0.2)
                return
            except self._queue_mod.Full:
                pass

    def _produce_host(self):
        while not self._stop:
            batches = list(self.loader.host_batches())
            self._put(self._hq, stack_batches_host(batches) if batches
                      else None)

    def _produce_device(self):
        while not self._stop:
            try:
                stacked = self._hq.get(timeout=0.2)
            except self._queue_mod.Empty:
                continue
            if stacked is not None:
                if self.mesh is None:
                    stacked = to_device(stacked)
                else:
                    from cal_tpu.parallel import shard_stacked

                    stacked = shard_stacked(stacked, self.mesh)
            self._put(self._q, stacked)

    def next(self):
        return self._q.get()

    def close(self):
        """Stop the producers and drop the queued epoch stacks — a fold's
        loader would otherwise keep two extra epoch stacks (host RAM +
        one shipped device copy) alive behind blocked daemon threads."""
        self._stop = True
        for q in (self._hq, self._q):
            try:
                q.get_nowait()
            except self._queue_mod.Empty:
                pass


def _close_prefetcher(loader):
    pf = getattr(loader, "_epoch_prefetcher", None)
    if pf is not None:
        pf.close()
        loader._epoch_prefetcher = None


def _run_epoch_scan(epoch_fn, state, loader, rng, mesh=None):
    """Device-side epoch: one dispatch for the whole epoch (steps.py
    make_causal_train_epoch).  Identical numerics to _run_epoch.

    Every layout stacks the epoch on HOST and ships one transfer per leaf
    (Loader/PartitionedLoader host_batches) — per-batch device_put launch
    latency otherwise dominates at small-graph scale; mesh runs shard each
    stacked leaf directly (parallel.shard_stacked).  Epoch prep for N+1
    overlaps device execution of N (_EpochPrefetcher)."""
    pf = getattr(loader, "_epoch_prefetcher", None)
    if pf is None or pf.mesh is not mesh:
        pf = loader._epoch_prefetcher = _EpochPrefetcher(loader, mesh)
    stacked = pf.next()
    if stacked is None:
        return state, (0.0, 0.0, 0.0, 0.0, 0.0)
    state, m = epoch_fn(state, stacked, rng)
    n = max(float(m["n"]), 1.0)
    return state, (float(m["loss"]) / n, float(m["loss_c"]) / n,
                   float(m["loss_o"]) / n, float(m["loss_co"]) / n,
                   float(m["correct_o"]) / n)


def _eval(eval_step, state, loader, rng, mesh=None):
    tot = {"correct_co": 0.0, "correct_c": 0.0, "correct_o": 0.0, "n": 0.0}
    for batch in loader:
        if mesh is not None:
            batch = _shard(batch, mesh)
        m = eval_step(state, batch, rng)
        for k in tot:
            tot[k] += float(m[k])
    n = max(tot["n"], 1.0)
    return tot["correct_co"] / n, tot["correct_c"] / n, tot["correct_o"] / n


def _eval_scan(eval_epoch, state, stacked, rng):
    """One-dispatch eval over pre-stacked batches (steps.py
    make_causal_eval_epoch)."""
    if stacked is None:
        return 0.0, 0.0, 0.0
    m = eval_epoch(state, stacked, rng)
    n = max(float(m["n"]), 1.0)
    return (float(m["correct_co"]) / n, float(m["correct_c"]) / n,
            float(m["correct_o"]) / n)


def _stack_loader(loader, mesh=None):
    batches = list(loader.host_batches())
    if not batches:
        return None
    stacked = stack_batches_host(batches)
    if mesh is None:
        return to_device(stacked)
    from cal_tpu.parallel import shard_stacked

    return shard_stacked(stacked, mesh)


def _make_mesh_and_loaders(cfg: Config, sets, budget_graphs, seeds=None,
                           shuffle_first=True):
    """Build the (mesh | None) + one loader per graph set.

    ``cfg.mesh_dp * cfg.mesh_edge > 1`` switches to the edge-partitioned
    layout (PartitionedGraphBatch over a Mesh(('dp','edge'))); budgets are
    computed over ``budget_graphs`` so every loader shares one compiled
    program."""
    seeds = seeds or [0] * len(sets)
    if cfg.mesh_dp * cfg.mesh_edge > 1:
        from cal_tpu.data.loader import PartitionedLoader
        from cal_tpu.parallel import make_mesh
        from cal_tpu.parallel.partition import partition_budgets

        mesh = make_mesh(dp=cfg.mesh_dp, edge=cfg.mesh_edge)
        budgets = partition_budgets(
            budget_graphs, cfg.batch_size, cfg.mesh_dp, cfg.mesh_edge)
        loaders = [
            PartitionedLoader(s, cfg.batch_size, mesh, shuffle=(i == 0 and shuffle_first),
                              budgets=budgets, seed=seeds[i],
                              spmm_tiles="auto" if cfg.use_pallas else False)
            for i, s in enumerate(sets)
        ]
        return mesh, loaders
    budgets = compute_budgets(budget_graphs, cfg.batch_size, cfg.layout,
                              pack=_want_pack(cfg, budget_graphs))
    tiles = "auto" if cfg.use_pallas else False
    prec = "bf16" if cfg.dtype == "bfloat16" else "f32"
    loaders = [
        Loader(s, cfg.batch_size, shuffle=(i == 0 and shuffle_first), layout=cfg.layout,
               budgets=budgets, seed=seeds[i], spmm_tiles=tiles,
               spmm_precision=prec)
        for i, s in enumerate(sets)
    ]
    return None, loaders


def _want_pack(cfg: Config, graphs) -> bool:
    """Budget-packed sparse batching (data/loader.py compute_packed_budgets):
    on when requested, or in "auto" when the worst-case static budget
    (sum of the batch_size largest graphs) overshoots the mean batch by
    >1.5x — the heavy-tailed regime where fixed-shape padding wastes most
    of the step's compute."""
    if cfg.layout != "sparse" or cfg.pack_batches == "false":
        return False
    if cfg.pack_batches == "true":
        return True
    ns = np.array([g.num_nodes for g in graphs], np.float64)
    k = min(cfg.batch_size, len(ns))
    worst = np.sort(ns)[-k:].sum()
    mean_batch = ns.mean() * k
    pack = bool(worst > 1.5 * mean_batch)
    if pack:
        print(f"pack_batches auto: worst-case batch {worst:.0f} nodes is "
              f"{worst / mean_batch:.1f}x the mean batch — enabling "
              f"budget-packed batching")
    return pack


def train_causal_syn(
    train_set: Sequence[HostGraph],
    val_set: Sequence[HostGraph],
    test_set: Sequence[HostGraph],
    cfg: Config,
    verbose: bool = True,
):
    feature_dim = cfg.max_degree if cfg.feature_dim == -1 else cfg.feature_dim
    del feature_dim  # carried by the batches
    mesh, (train_loader, val_loader, test_loader) = _make_mesh_and_loaders(
        cfg, [train_set, val_set, test_set],
        list(train_set) + list(val_set) + list(test_set),
        seeds=[cfg.seed, 0, 0],
    )

    model = get_model(cfg, 0, cfg.num_classes)
    tx = make_optimizer(cfg.lr, cfg.min_lr, cfg.epochs,
                        train_loader.schedule_steps, cfg.weight_decay)
    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng = jax.random.split(rng)
    state = init_state(model, tx, next(iter(train_loader)), init_rng)
    if mesh is not None:
        from cal_tpu.parallel import replicate

        state = replicate(state, mesh)

    if cfg.scan_epochs:
        epoch_fn = make_causal_train_epoch(model, tx, cfg.c, cfg.o, cfg.co,
                                           cfg.with_random,
                                           skip_empty=train_loader.pack)
        eval_epoch = make_causal_eval_epoch(model, cfg.eval_random,
                                            skip_empty=val_loader.pack)
        # eval loaders don't shuffle: pack + stack them once, reuse forever
        val_stacked = _stack_loader(val_loader, mesh)
        test_stacked = _stack_loader(test_loader, mesh)
    else:
        train_step = make_causal_train_step(model, tx, cfg.c, cfg.o, cfg.co,
                                            cfg.with_random)
        eval_step = make_causal_eval_step(model, cfg.eval_random)

    metrics = MetricsLogger(cfg.metrics_path, cfg.tb_dir)
    ckpt = (Checkpointer(cfg.save_dir) if cfg.save_model else None)

    best_val, upd_co, upd_c, upd_o, upd_ep = 0.0, 0.0, 0.0, 0.0, 0
    val_acc_o = 0.0
    start_epoch = 1
    # crash recovery (new scope; reference persists nothing, SURVEY.md §5):
    # restore the latest checkpoint + trackers and fast-forward the PRNG so
    # the epoch stream continues deterministically.
    if ckpt is not None and cfg.resume and ckpt.latest_step() is not None:
        restored, meta = ckpt.restore(template=state)
        state = jax.device_put(restored)
        best_val = meta.get("val_acc_o", 0.0)
        upd_co = meta.get("test_acc_co", 0.0)
        upd_c = meta.get("test_acc_c", 0.0)
        upd_o = meta.get("test_acc_o", 0.0)
        upd_ep = int(meta.get("epoch", ckpt.latest_step()))
        start_epoch = int(meta.get("epoch", ckpt.latest_step())) + 1
        for _ in range(start_epoch - 1):
            rng, _, _, _ = jax.random.split(rng, 4)
        print(f"resumed from checkpoint at epoch {start_epoch - 1} "
              f"(best val {best_val * 100:.2f})")
    for epoch in range(start_epoch, cfg.epochs + 1):
        # val and test get INDEPENDENT eval keys: sharing one would correlate
        # the intervention shuffles across the two sweeps at --eval_random.
        rng, e_rng, v_rng, t_rng = jax.random.split(rng, 4)
        t0 = time.time()
        if cfg.scan_epochs:
            state, (loss, loss_c, loss_o, loss_co, train_acc) = (
                _run_epoch_scan(epoch_fn, state, train_loader, e_rng, mesh))
            val_co, val_c, val_acc_o = _eval_scan(
                eval_epoch, state, val_stacked, v_rng)
            test_co, test_c, test_o = _eval_scan(
                eval_epoch, state, test_stacked, t_rng)
        else:
            state, (loss, loss_c, loss_o, loss_co, train_acc) = _run_epoch(
                train_step, state, train_loader, e_rng, mesh)
            val_co, val_c, val_acc_o = _eval(
                eval_step, state, val_loader, v_rng, mesh)
            test_co, test_c, test_o = _eval(
                eval_step, state, test_loader, t_rng, mesh)
        if val_acc_o > best_val:
            best_val = val_acc_o
            upd_co, upd_c, upd_o, upd_ep = test_co, test_c, test_o, epoch
            if ckpt is not None:
                ckpt.save(epoch, state, {
                    "val_acc_o": val_acc_o, "test_acc_co": test_co,
                    "test_acc_c": test_c, "test_acc_o": test_o,
                    "epoch": epoch,
                })
        metrics.log(
            "epoch", model=cfg.model, bias=cfg.bias, epoch=epoch, loss=loss,
            loss_c=loss_c, loss_o=loss_o, loss_co=loss_co,
            train_acc=train_acc, val_acc_o=val_acc_o, test_acc_co=test_co,
            test_acc_c=test_c, test_acc_o=test_o,
        )
        if verbose:
            print(
                "BIAS:[{:.2f}] | Model:[{}] Epoch:[{}/{}] Loss:[{:.4f}={:.4f}+{:.4f}+{:.4f}] "
                "Train:[{:.2f}] val:[{:.2f}] Test:[{:.2f}] | Update Test:[co:{:.2f},c:{:.2f},o:{:.2f}] "
                "at Epoch:[{}] | {:.1f}s".format(
                    cfg.bias, cfg.model, epoch, cfg.epochs, loss, loss_c,
                    loss_o, loss_co, train_acc * 100, val_acc_o * 100,
                    test_o * 100, upd_co * 100, upd_c * 100, upd_o * 100,
                    upd_ep, time.time() - t0,
                )
            )
    _close_prefetcher(train_loader)
    print(
        "syd: BIAS:[{:.2f}] | Val acc:[{:.2f}] Test acc:[co:{:.2f},c:{:.2f},o:{:.2f}] at epoch:[{}]".format(
            cfg.bias, val_acc_o * 100, upd_co * 100, upd_c * 100, upd_o * 100, upd_ep
        )
    )
    metrics.log("final", model=cfg.model, bias=cfg.bias, best_val=best_val,
                test_acc_co=upd_co, test_acc_c=upd_c, test_acc_o=upd_o,
                epoch=upd_ep)
    metrics.close()
    return {
        "best_val_acc": best_val,
        "test_acc_co": upd_co,
        "test_acc_c": upd_c,
        "test_acc_o": upd_o,
        "epoch": upd_ep,
        "state": state,
    }


def evaluate_causal(
    test_set: Sequence[HostGraph],
    cfg: Config,
    num_classes: int | None = None,
    num_features: int = 0,
):
    """Inference / serving mode (``--inference``): restore the newest
    checkpoint from ``--save_dir`` and run the 3-branch eval sweep only.

    The reference declares ``--inference`` and ``--save_model`` but consumes
    neither (opts.py:34-35; verified unconsumed, SURVEY.md §5) — here they are
    a live train-once/serve-many path: ``--save_model`` checkpoints the best
    val-epoch state, ``--inference`` serves it."""
    mesh, (loader,) = _make_mesh_and_loaders(
        cfg, [list(test_set)], list(test_set), shuffle_first=False)
    model = get_model(cfg, num_features, num_classes or cfg.num_classes)
    tx = make_optimizer(cfg.lr, cfg.min_lr, cfg.epochs, max(len(loader), 1),
                        cfg.weight_decay)
    rng = jax.random.PRNGKey(cfg.seed)
    state = init_state(model, tx, next(iter(loader)), rng)
    if mesh is not None:
        from cal_tpu.parallel import replicate

        state = replicate(state, mesh)
    ckpt = Checkpointer(cfg.save_dir)
    step = ckpt.latest_step()
    if step is None:
        raise FileNotFoundError(
            f"--inference: no checkpoint found under {cfg.save_dir} "
            "(train with --save_model first)")
    restored, meta = ckpt.restore(template=state)
    state = jax.device_put(restored)
    eval_epoch = make_causal_eval_epoch(model, cfg.eval_random)
    co, c, o = _eval_scan(eval_epoch, state, _stack_loader(loader, mesh), rng)
    print(
        "inference: ckpt epoch:[{}] | Test acc:[co:{:.2f},c:{:.2f},o:{:.2f}] "
        "on {} graphs".format(
            meta.get("epoch", step), co * 100, c * 100, o * 100,
            len(test_set)))
    return {"test_acc_co": co, "test_acc_c": c, "test_acc_o": o,
            "ckpt_step": step}


def predict_causal(model, state, loader, eval_random: bool = False,
                   rng=None, mesh=None):
    """Per-graph log-probs of the three branches over ``loader`` (eval mode).

    Returns (y, c_logs, o_logs, co_logs) as NumPy arrays restricted to real
    graphs — the input to threshold-free metrics like ROC-AUC (the official
    OGB metric for ogbg-molhiv; accuracy is meaningless at its ~3.5%
    positive rate)."""
    from cal_tpu.train.steps import _as_graph, _model_dtype

    rng = jax.random.PRNGKey(0) if rng is None else rng
    dt = _model_dtype(model)

    @jax.jit
    def step(params, batch_stats, batch):
        g = _as_graph(batch, dt)
        c, o, co = model.apply(
            {"params": params, "batch_stats": batch_stats}, g,
            eval_random=eval_random, train=False,
            rngs={"intervention": rng})
        return c, o, co, g.y, g.graph_mask

    ys, cs, os_, cos = [], [], [], []
    for batch in loader:
        if mesh is not None:
            batch = _shard(batch, mesh)
        c, o, co, y, gm = step(state.params, state.batch_stats, batch)
        gm = np.asarray(gm)
        ys.append(np.asarray(y)[gm])
        cs.append(np.asarray(c)[gm])
        os_.append(np.asarray(o)[gm])
        cos.append(np.asarray(co)[gm])
    return (np.concatenate(ys), np.concatenate(cs), np.concatenate(os_),
            np.concatenate(cos))


def _masked_eval_copy(batch):
    """A copy of ``batch`` with every graph masked out — safe as an eval-only
    pad (no grads, no BN batch-stat updates at eval; correct counts and n
    are graph_mask-gated, so a masked batch contributes exactly zero)."""
    import dataclasses as _dc

    from cal_tpu.graph import PackedDenseBatch

    if isinstance(batch, PackedDenseBatch):
        # graph_mask is derived on device as n_nodes > 0
        z = (np.zeros_like if isinstance(batch.n_nodes, np.ndarray)
             else jnp.zeros_like)
        return _dc.replace(batch, n_nodes=z(batch.n_nodes))
    z = (np.zeros_like if isinstance(batch.graph_mask, np.ndarray)
         else jnp.zeros_like)
    return _dc.replace(batch, graph_mask=z(batch.graph_mask))


def train_causal_real_folds(dataset, num_classes: int, cfg: Config,
                            verbose: bool = True):
    """Fold-PARALLEL k-fold protocol — all ``cfg.folds`` folds advance one
    epoch per dispatch (steps.py make_causal_train_epoch_folds: vmap of the
    scanned epoch over a leading fold axis).

    The reference trains folds sequentially (train_causal.py:63-160 —
    10 independent runs); folds are embarrassingly parallel, so this runs the
    whole protocol in ~one fold's wall time.  On one chip the vmap batches
    every fold's matmuls (better MXU utilization at GNN-sized hiddens); with
    ``--mesh_dp N`` (folds % N == 0) the fold axis is sharded over the
    mesh — XLA partitions the program with zero collectives.  Per-fold PRNG
    streams and numerics are identical to the sequential path
    (tests/test_fold_parallel.py asserts parity).
    """
    from cal_tpu.data.kfold import k_fold

    # r2 carried a workaround here disabling the fused Pallas kernels for
    # fold-parallel bf16 CausalGCN/GIN (the vmapped program stalled >15 min
    # in backend compilation).  r3 could NOT reproduce the stall — neither
    # in the bisection harness (benchmarks/repro_bf16_vmap_stall.py: every
    # {vmap, bf16, dual-kernel} combination compiles, with high variance
    # 3-175 s that points at the remote-compile service, not the program)
    # nor in the real config (SYNMINI fold-parallel bf16 + fused kernels
    # compiles and trains) — likely fixed by the r3 kernel restructuring
    # (the XLA adjacency scatter is gone; flash-GAT v2).  Workaround
    # removed; if a stall recurs, run the bisection harness first.

    graphs = list(dataset)
    labels = np.array([g.y for g in graphs])
    folds = cfg.folds
    test_accs = np.zeros((folds, cfg.epochs))
    test_accs_c = np.zeros((folds, cfg.epochs))
    test_accs_o = np.zeros((folds, cfg.epochs))
    train_accs = np.zeros((folds, cfg.epochs))
    random_guess = 1.0 / num_classes

    model = get_model(cfg, 0, num_classes)
    fold_indices = k_fold(labels, folds, cfg.epoch_select)

    # budget-packed batching composes with the vmapped fold axis (r5,
    # VERDICT r4 item 5): every fold's packed epoch is already a
    # fixed-step-count scanned stack (loader pads with fully-masked
    # batches, gated to no-ops in train/steps.py) — equalizing the step
    # and tile budgets to the max over folds makes all fold stacks one
    # static shape, so vmap applies unchanged.
    pack = _want_pack(cfg, graphs)
    if pack:
        from cal_tpu.data.loader import compute_packed_budgets

        budgets = compute_packed_budgets(graphs, cfg.batch_size)
    else:
        budgets = compute_budgets(graphs, cfg.batch_size, cfg.layout)
    tiles = "auto" if cfg.use_pallas else False
    prec = "bf16" if cfg.dtype == "bfloat16" else "f32"
    if tiles == "auto" and pack:
        # resolve the data-driven tile decision ONCE on the full dataset —
        # per-fold "auto" could diverge and break the shared fold stack
        tiles = Loader(graphs, cfg.batch_size, shuffle=False,
                       layout=cfg.layout, budgets=dict(budgets),
                       spmm_tiles="auto", spmm_precision=prec).spmm_tiles

    train_loaders, test_loaders = [], []
    for train_idx, test_idx, _val_idx in zip(*fold_indices):
        train_set = [graphs[i] for i in train_idx]
        test_set = [graphs[i] for i in test_idx]
        train_loaders.append(Loader(
            train_set, cfg.batch_size, shuffle=True, layout=cfg.layout,
            budgets=budgets, seed=cfg.seed + len(train_loaders),
            spmm_tiles=tiles, spmm_precision=prec))
        test_loaders.append(Loader(
            test_set, cfg.batch_size, shuffle=False, layout=cfg.layout,
            budgets=budgets, seed=0, spmm_tiles=tiles, spmm_precision=prec))
    if pack:
        for group in (train_loaders, test_loaders):
            steps = max(tl._steps_budget for tl in group)
            for tl in group:
                tl._steps_budget = steps
            if any(tl.spmm_tiles for tl in group):
                tbud = max(tl._tile_budget for tl in group)
                for tl in group:
                    tl._tile_budget = tbud

    tx = make_optimizer(cfg.lr, cfg.min_lr, cfg.epochs,
                        train_loaders[0].schedule_steps, cfg.weight_decay)
    epoch_folds = make_causal_train_epoch_folds(
        model, tx, cfg.c, cfg.o, cfg.co, cfg.with_random)
    eval_folds = make_causal_eval_epoch_folds(model, cfg.eval_random)
    init_fn = make_init_fn(model, causal=True)

    test_stacks, states, host_rngs = [], [], []
    for fold, (tl, te) in enumerate(zip(train_loaders, test_loaders)):
        test_stacks.append(list(te.host_batches()))
        rng = jax.random.PRNGKey(cfg.seed + fold)
        rng, init_rng = jax.random.split(rng)
        host_rngs.append(rng)
        states.append(init_state(model, tx, next(iter(tl)), init_rng,
                                 init_fn=init_fn))

    steps_per_epoch = len(train_loaders[0])
    counts = {len(tl) for tl in train_loaders}
    if len(counts) != 1:
        raise ValueError(
            f"fold_parallel requires equal train batch counts per fold, got "
            f"{sorted(counts)} — run with --fold_parallel false (stratified "
            f"fold sizes differing across a batch boundary)")
    # HBM-footprint guard: this protocol stages [folds, steps, ...] whole
    # epochs on device (k x one fold's footprint); a larger dataset would
    # otherwise die in the allocator with an opaque OOM mid-run.
    # (_make_batch_host directly: host_batches() would advance the loader's
    # shuffle RNG and desync the epoch stream from the sequential protocol)
    tl0 = train_loaders[0]
    b0 = tl0._make_batch_host(
        tl0._sim_chunkings[0][0] if pack else
        np.arange(min(cfg.batch_size, tl0.num_graphs)))
    batch_bytes = sum(a.nbytes for a in jax.tree.leaves(b0))
    sharded_folds = folds // max(cfg.mesh_dp, 1)
    need = batch_bytes * steps_per_epoch * sharded_folds * 2  # train + eval
    budget = int(float(os.environ.get("CAL_TPU_FOLD_STACK_BYTES", 8e9)))
    if need > budget:
        raise ValueError(
            f"fold_parallel would stage ~{need / 1e9:.1f} GB of stacked "
            f"epoch batches per device (> {budget / 1e9:.1f} GB budget, "
            f"CAL_TPU_FOLD_STACK_BYTES) — run with --fold_parallel false "
            f"or shard folds over more devices (--mesh_dp)")
    # equalize eval batch counts with fully-masked pads
    emax = max(len(b) for b in test_stacks)
    test_stacks = [b + [_masked_eval_copy(b[0])] * (emax - len(b))
                   for b in test_stacks]
    states = stack_folds(states)

    sh = None
    put = lambda t: t
    if cfg.mesh_dp > 1:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from cal_tpu.parallel import make_mesh

        if folds % cfg.mesh_dp:
            raise ValueError(
                f"folds={folds} not divisible by mesh_dp={cfg.mesh_dp}")
        mesh = make_mesh(dp=cfg.mesh_dp, edge=1,
                         devices=jax.devices()[: cfg.mesh_dp])
        sh = NamedSharding(mesh, P(("dp", "edge")))
        put = lambda t: jax.tree.map(lambda a: jax.device_put(a, sh), t)
    # host-stack [folds, steps, ...] then ONE transfer per leaf (per-batch
    # device_puts cost ~ms launch latency each on the tunneled backend —
    # at small-graph scale they dominated the whole fold-parallel epoch)
    _host_fold_stack = lambda stacks: to_device(
        jax.tree.map(lambda *xs: np.stack(xs), *stacks), sh)
    states = put(states)
    test_stacked = _host_fold_stack(
        [stack_batches_host(b) for b in test_stacks])

    best = np.zeros(folds)
    best_ep = np.zeros(folds, np.int64)
    best_c = np.zeros(folds)
    best_o = np.zeros(folds)
    for epoch in range(1, cfg.epochs + 1):
        e_rngs, v_rngs = [], []
        for f in range(folds):
            host_rngs[f], e_rng, v_rng = jax.random.split(host_rngs[f], 3)
            e_rngs.append(e_rng)
            v_rngs.append(v_rng)
        stacked = _host_fold_stack(
            [stack_batches_host(list(tl.host_batches()))
             for tl in train_loaders])
        states, m = epoch_folds(states, stacked, put(jnp.stack(e_rngs)))
        em = eval_folds(states, test_stacked, put(jnp.stack(v_rngs)))
        m = jax.tree.map(np.asarray, m)
        em = jax.tree.map(np.asarray, em)
        n = np.maximum(m["n"], 1.0)
        en = np.maximum(em["n"], 1.0)
        train_acc = m["correct_o"] / n
        t_co, t_c, t_o = (em["correct_co"] / en, em["correct_c"] / en,
                          em["correct_o"] / en)
        train_accs[:, epoch - 1] = train_acc
        test_accs[:, epoch - 1] = t_co
        test_accs_c[:, epoch - 1] = t_c
        test_accs_o[:, epoch - 1] = t_o
        improved = t_co > best
        best_ep = np.where(improved, epoch, best_ep)
        best_c = np.where(improved, t_c, best_c)
        best_o = np.where(improved, t_o, best_o)
        best = np.where(improved, t_co, best)
        if verbose:
            for f in range(folds):
                print(
                    "Causal | dataset:[{}] fold:[{}] | Epoch:[{}/{}] Loss:[{:.4f}={:.4f}+{:.4f}+{:.4f}] "
                    "Train:[{:.4f}] Test:[{:.2f}] Test_o:[{:.2f}] Test_c:[{:.2f}] (RG:{:.2f}) | "
                    "Best Test:[{:.2f}] at Epoch:[{}]".format(
                        cfg.dataset, f, epoch, cfg.epochs,
                        m["loss"][f] / n[f], m["loss_c"][f] / n[f],
                        m["loss_o"][f] / n[f], m["loss_co"][f] / n[f],
                        train_acc[f] * 100, t_co[f] * 100, t_o[f] * 100,
                        t_c[f] * 100, random_guess * 100, best[f] * 100,
                        int(best_ep[f]),
                    )
                )
    for f in range(folds):
        print(
            "syd: Causal fold:[{}] | Dataset:[{}] Model:[{}] | Best Test:[{:.2f}] at epoch [{}] | "
            "Test_o:[{:.2f}] Test_c:[{:.2f}] (RG:{:.2f})".format(
                f, cfg.dataset, cfg.model, best[f] * 100, int(best_ep[f]),
                best_o[f] * 100, best_c[f] * 100, random_guess * 100,
            )
        )
    return _finish_real_protocol(cfg, folds, random_guess, test_accs,
                                 test_accs_c, test_accs_o, train_accs)


def train_causal_real(dataset, num_classes: int, cfg: Config, verbose: bool = True):
    """k-fold protocol on a real (TU) dataset — train_causal.py:63-160.

    ``dataset``: sequence of HostGraph."""
    from cal_tpu.data.kfold import k_fold

    if cfg.folds < 2:
        # test_max makes val==test = one fold's slice; folds=1 leaves an
        # EMPTY train split (crashes deep in the pack loader otherwise)
        raise ValueError(
            f"--folds must be >= 2 under the k-fold test_max protocol "
            f"(got {cfg.folds}): with one fold the train split is empty")
    if cfg.fold_parallel:
        if cfg.mesh_edge > 1:
            # Deliberate non-composition, not a TODO: fold-parallelism
            # exists to FILL an underutilized chip with many small-dataset
            # folds (BASELINE.md: a single SYNNCI fold already saturates
            # one chip, so fold-vmap pays off only when folds shard over
            # spare devices), while edge partitioning exists for batches
            # too big for one chip.  The regimes are mutually exclusive:
            # a workload that needs edge shards has no spare capacity for
            # stacked folds (k x the epoch footprint, see the HBM guard in
            # train_causal_real_folds), and one that fits k folds per
            # device gains nothing from splitting its edges.
            raise NotImplementedError(
                "fold_parallel composes with --mesh_dp (fold axis over the "
                "mesh) but not with edge partitioning; set --mesh_edge 1")
        if not cfg.scan_epochs:
            raise ValueError("fold_parallel requires scan_epochs")
        # validate BEFORE any loader/state setup: stratified folds whose
        # train sizes straddle a batch_size boundary can't share one scanned
        # epoch program — fall back to the sequential protocol.
        _labels = np.array([g.y for g in dataset])
        _train_idx = k_fold(_labels, cfg.folds, cfg.epoch_select)[0]
        _counts = {-(-len(t) // cfg.batch_size) for t in _train_idx}
        if len(_counts) == 1:
            return train_causal_real_folds(dataset, num_classes, cfg, verbose)
        print(f"fold_parallel: unequal train batch counts across folds "
              f"{sorted(_counts)} — falling back to the sequential protocol")

    graphs = list(dataset)
    labels = np.array([g.y for g in graphs])
    folds = cfg.folds
    test_accs = np.zeros((folds, cfg.epochs))
    test_accs_c = np.zeros((folds, cfg.epochs))
    test_accs_o = np.zeros((folds, cfg.epochs))
    train_accs = np.zeros((folds, cfg.epochs))
    random_guess = 1.0 / num_classes

    # Model/optimizer/step functions are fold-independent (only params
    # differ) — build them ONCE so every fold after the first reuses the
    # compiled XLA programs instead of paying a full recompile.
    model = get_model(cfg, 0, num_classes)
    fold_indices = k_fold(labels, folds, cfg.epoch_select)
    init_fn = make_init_fn(model, causal=True)
    tx = None

    for fold, (train_idx, test_idx, _val_idx) in enumerate(
        zip(*fold_indices)
    ):
        train_set = [graphs[i] for i in train_idx]
        test_set = [graphs[i] for i in test_idx]
        mesh, (train_loader, test_loader) = _make_mesh_and_loaders(
            cfg, [train_set, test_set], graphs,
            seeds=[cfg.seed + fold, 0])
        if tx is None:
            # cosine schedule epoch boundary: use fold 0's real step count
            # (fold sizes differ by <1 batch; the schedule is stepped
            # per-epoch as in the reference, train_causal.py:29).  Built
            # AFTER the fold-0 loader so budget-packed epochs (pack mode)
            # count only real optimizer steps.
            tx = make_optimizer(cfg.lr, cfg.min_lr, cfg.epochs,
                                train_loader.schedule_steps,
                                cfg.weight_decay)
            if cfg.scan_epochs:
                epoch_fn = make_causal_train_epoch(
                    model, tx, cfg.c, cfg.o, cfg.co, cfg.with_random,
                    skip_empty=train_loader.pack)
                eval_epoch = make_causal_eval_epoch(
                    model, cfg.eval_random, skip_empty=test_loader.pack)
            else:
                train_step = make_causal_train_step(
                    model, tx, cfg.c, cfg.o, cfg.co, cfg.with_random)
                eval_step = make_causal_eval_step(model, cfg.eval_random)
        if cfg.scan_epochs:
            # test loader doesn't shuffle: pack + stack once per fold
            test_stacked = _stack_loader(test_loader, mesh)

        rng = jax.random.PRNGKey(cfg.seed + fold)
        rng, init_rng = jax.random.split(rng)
        state = init_state(model, tx, next(iter(train_loader)), init_rng,
                           init_fn=init_fn)
        if mesh is not None:
            from cal_tpu.parallel import replicate

            state = replicate(state, mesh)

        best_test, best_ep, best_c, best_o = 0.0, 0, 0.0, 0.0
        for epoch in range(1, cfg.epochs + 1):
            rng, e_rng, v_rng = jax.random.split(rng, 3)
            if cfg.scan_epochs:
                state, (loss, loss_c, loss_o, loss_co, train_acc) = (
                    _run_epoch_scan(epoch_fn, state, train_loader, e_rng,
                                    mesh))
                t_co, t_c, t_o = _eval_scan(
                    eval_epoch, state, test_stacked, v_rng)
            else:
                state, (loss, loss_c, loss_o, loss_co, train_acc) = _run_epoch(
                    train_step, state, train_loader, e_rng, mesh)
                t_co, t_c, t_o = _eval(eval_step, state, test_loader, v_rng,
                                       mesh)
            train_accs[fold, epoch - 1] = train_acc
            test_accs[fold, epoch - 1] = t_co
            test_accs_c[fold, epoch - 1] = t_c
            test_accs_o[fold, epoch - 1] = t_o
            if t_co > best_test:
                best_test, best_ep, best_c, best_o = t_co, epoch, t_c, t_o
            if verbose:
                print(
                    "Causal | dataset:[{}] fold:[{}] | Epoch:[{}/{}] Loss:[{:.4f}={:.4f}+{:.4f}+{:.4f}] "
                    "Train:[{:.4f}] Test:[{:.2f}] Test_o:[{:.2f}] Test_c:[{:.2f}] (RG:{:.2f}) | "
                    "Best Test:[{:.2f}] at Epoch:[{}]".format(
                        cfg.dataset, fold, epoch, cfg.epochs, loss, loss_c,
                        loss_o, loss_co, train_acc * 100, t_co * 100,
                        t_o * 100, t_c * 100, random_guess * 100,
                        best_test * 100, best_ep,
                    )
                )
        print(
            "syd: Causal fold:[{}] | Dataset:[{}] Model:[{}] | Best Test:[{:.2f}] at epoch [{}] | "
            "Test_o:[{:.2f}] Test_c:[{:.2f}] (RG:{:.2f})".format(
                fold, cfg.dataset, cfg.model, best_test * 100, best_ep,
                best_o * 100, best_c * 100, random_guess * 100,
            )
        )
        _close_prefetcher(train_loader)

    return _finish_real_protocol(cfg, folds, random_guess, test_accs,
                                 test_accs_c, test_accs_o, train_accs)


def _finish_real_protocol(cfg, folds, random_guess, test_accs, test_accs_c,
                          test_accs_o, train_accs):
    # post-hoc epoch selection (train_causal.py:124-132)
    sel = int(test_accs.mean(axis=0).argmax())
    sel_o = int(test_accs_o.mean(axis=0).argmax())
    acc = test_accs[:, sel]
    acc_c = test_accs_c[:, sel]
    acc_o = test_accs_o[:, sel_o]
    result = {
        "test_acc_mean": float(acc.mean()),
        "test_acc_std": float(acc.std(ddof=1)) if folds > 1 else 0.0,
        "test_acc_c_mean": float(acc_c.mean()),
        "test_acc_c_std": float(acc_c.std(ddof=1)) if folds > 1 else 0.0,
        "test_acc_o_mean": float(acc_o.mean()),
        "test_acc_o_std": float(acc_o.std(ddof=1)) if folds > 1 else 0.0,
        "train_acc_mean": float(train_accs[:, -1].mean()),
        "selected_epoch": sel + 1,
    }
    print("=" * 150)
    print(
        "sydall Final: Causal | Dataset:[{}] Model:[{}] seed:[{}]| Test Acc: {:.2f}±{:.2f} | "
        "OTest: {:.2f}±{:.2f}, CTest: {:.2f}±{:.2f} (RG:{:.2f}) | [Settings] co:{},c:{},o:{},harf:{},dim:{},fc:{}".format(
            cfg.dataset, cfg.model, cfg.seed,
            result["test_acc_mean"] * 100, result["test_acc_std"] * 100,
            result["test_acc_o_mean"] * 100, result["test_acc_o_std"] * 100,
            result["test_acc_c_mean"] * 100, result["test_acc_c_std"] * 100,
            random_guess * 100, cfg.co, cfg.c, cfg.o, cfg.harf_hidden,
            cfg.hidden, cfg.fc_num,
        )
    )
    print("=" * 150)
    return result
