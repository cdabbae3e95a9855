"""Host-RSS stress test for scan-epoch training beyond SYNREDDIT scale
(VERDICT r4 item 7).

The tunneled TPU client permanently retains a host copy of every H2D
transfer (CLAUDE.md r4 rule; measured +128 MB RSS per 128 MB device_put,
survives gc/delete/donation), so a long scan-epoch run leaks
RSS = (epoch-stack bytes) x (total epochs shipped).  The r4 mitigation
ships SLIM tile plans hydrated on device.  This script validates the
budget math at ~2.5x the SYNREDDIT bench scale: 640 heavy-tailed thread
graphs (vs 256) at batch_size 256 (vs 128), run through the EXACT
production epoch path (Loader.host_batches -> stack_batches_host ->
to_device -> scanned epoch), sampling VmRSS per epoch.

Pass criterion: per-epoch RSS growth ~= measured epoch-stack bytes (no
superlinear term), and the projected canonical budget (folds x epochs)
fits host RAM.

Usage:  python -m benchmarks.stress_rss [epochs]
"""
from __future__ import annotations

import sys
import time

import jax
import numpy as np

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 12


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def tree_bytes(tree) -> int:
    return sum(a.size * a.dtype.itemsize
               for a in jax.tree.leaves(tree) if hasattr(a, "size"))


def main():
    from benchmarks.gen_reddit_synthetic import make_graph
    from cal_tpu.data.feature_expansion import FeatureExpander
    from cal_tpu.data.loader import Loader, compute_packed_budgets
    from cal_tpu.graph import HostGraph
    from cal_tpu.models.factory import get_model
    from cal_tpu.train.optim import make_optimizer
    from cal_tpu.train.steps import (
        init_state, make_causal_train_epoch, stack_batches_host, to_device)
    from cal_tpu.utils.config import Config

    n_graphs, batch_size = 640, 256          # ~2.5x the bench workload
    fx = FeatureExpander(degree=True, onehot_maxdeg=10)
    rng_np = np.random.default_rng(7)
    graphs = []
    for g in range(n_graphs):
        n, edges = make_graph(rng_np, g % 2)
        e = np.asarray(edges, np.int64).T
        e = np.concatenate([e, e[::-1]], axis=1)
        x, e, _ = fx(None, e, n)
        graphs.append(HostGraph(
            x=np.asarray(x, np.float32),
            senders=np.asarray(e[0], np.int32),
            receivers=np.asarray(e[1], np.int32), y=g % 2))

    cfg = Config(model="CausalGCN", dtype="bfloat16", layout="sparse",
                 batch_size=batch_size)
    budgets = compute_packed_budgets(graphs, batch_size)
    loader = Loader(graphs, batch_size, shuffle=True, layout="sparse",
                    budgets=budgets, seed=0, spmm_tiles="auto",
                    spmm_precision="bf16")
    print(f"graphs={n_graphs} batch={batch_size} budgets={loader.budgets} "
          f"steps/epoch={loader.schedule_steps} "
          f"tiles={'on' if loader.spmm_tiles else 'off'}")
    model = get_model(cfg, 0, 2)
    tx = make_optimizer(cfg.lr, cfg.min_lr, cfg.epochs,
                        loader.schedule_steps)
    first = next(iter(loader))
    state = init_state(model, tx, first, jax.random.PRNGKey(0))
    epoch_fn = make_causal_train_epoch(model, tx, cfg.c, cfg.o, cfg.co,
                                       True, skip_empty=True)
    rng = jax.random.PRNGKey(0)

    base = rss_mb()
    print(f"RSS after init: {base:.0f} MB")
    samples, stack_mb = [], None
    for ep in range(EPOCHS):
        t0 = time.perf_counter()
        batches = list(loader.host_batches())
        stacked = stack_batches_host(batches)
        if stack_mb is None:
            stack_mb = tree_bytes(stacked) / 1e6
        stacked = to_device(stacked)
        state, m = epoch_fn(state, stacked, jax.random.fold_in(rng, ep))
        loss = float(np.asarray(m["loss"]).ravel()[-1])
        del stacked, batches
        r = rss_mb()
        samples.append(r)
        print(f"epoch {ep:2d}: {time.perf_counter()-t0:6.1f}s "
              f"loss={loss:9.3f} RSS={r:7.0f} MB")
    # slope over the steady tail (skip compile epoch 0)
    tail = np.asarray(samples[1:])
    slope = float(np.polyfit(np.arange(tail.size), tail, 1)[0])
    import re
    total_mb = int(re.search(r"MemTotal:\s+(\d+)",
                             open("/proc/meminfo").read()).group(1)) / 1024
    canon = 10 * 100                          # 10-fold x 100 epochs
    proj = samples[-1] + slope * canon
    print(f"\nepoch-stack bytes shipped: {stack_mb:.0f} MB/epoch")
    print(f"steady RSS growth: {slope:.0f} MB/epoch "
          f"(retention ratio {slope / max(stack_mb, 1e-9):.2f})")
    print(f"projected canonical 10-fold x 100-epoch RSS: {proj / 1024:.1f} GB"
          f" of {total_mb / 1024:.0f} GB host RAM -> "
          f"{'OK' if proj < 0.8 * total_mb else 'OVER BUDGET'}")


if __name__ == "__main__":
    main()
