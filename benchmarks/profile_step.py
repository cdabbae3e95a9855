"""Per-op attribution of the full causal train step (VERDICT r3 weak #1:
"Attribution of step time, not aggregate time, is what would prove (or
disprove) the ceiling").

Traces a scanned multi-step dispatch of the production config with the JAX
profiler, parses the Chrome-trace export, and prints a ms/step table of the
top device ops.  Usage:

    python -m benchmarks.profile_step [CausalGAT] [bfloat16]

The scan runs STEPS identical train steps inside one dispatch, so per-step
numbers are honest (no dispatch/fetch round-trip inflation — CLAUDE.md
timing rules; the fixed ~26 ms tunnel RTT amortizes over the whole trace
and the while-loop total is read device-side)."""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import tempfile

import jax
import numpy as np

STEPS = 30


def build_epoch(model_name: str, dtype: str):
    from cal_tpu.data.loader import Loader, compute_budgets
    from cal_tpu.data.synthetic import (
        dataset_bias_split, generate_synthetic_dataset)
    from cal_tpu.models.factory import get_model
    from cal_tpu.train.optim import make_optimizer
    from cal_tpu.train.steps import (
        init_state, make_causal_train_epoch, stack_batches)
    from cal_tpu.utils.config import Config

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config(model=model_name, bias=0.9, lr=0.002, min_lr=5e-6,
                 dtype=dtype)
    dataset = generate_synthetic_dataset(
        data_num=64, node_num=cfg.node_num, max_degree=cfg.max_degree,
        noise=cfg.noise, seed=cfg.seed,
        cache_path=os.path.join(here, "data", "bench_syn_64.pkl"))
    train_set, _, _, _ = dataset_bias_split(dataset, bias=cfg.bias,
                                            total=64 * 4, seed=cfg.seed)
    budgets = compute_budgets(train_set, cfg.batch_size, cfg.layout)
    loader = Loader(train_set, cfg.batch_size, shuffle=True,
                    layout=cfg.layout, budgets=budgets, seed=cfg.seed,
                    drop_remainder=True)
    batches = list(loader)
    reps = -(-STEPS // len(batches))
    stacked = stack_batches(batches * reps)
    model = get_model(cfg, 0, cfg.num_classes)
    tx = make_optimizer(cfg.lr, cfg.min_lr, cfg.epochs, len(batches), 0.0)
    rng = jax.random.PRNGKey(0)
    state = init_state(model, tx, batches[0], rng)
    epoch_fn = make_causal_train_epoch(model, tx, cfg.c, cfg.o, cfg.co,
                                       cfg.with_random)
    count = jax.jit(
        lambda b: (b.edge_flat < b.x.shape[0] * b.x.shape[1] ** 2).sum())
    edges = float(np.mean([float(count(b)) for b in batches]))
    return epoch_fn, state, stacked, rng, edges


def parse_trace(log_dir: str, n_steps: int):
    """ms/step per device op, from the profiler's Chrome-trace export.

    Aggregates EXCLUSIVE (self) time: Chrome-trace device spans nest — a
    ``conditional`` wrapper (e.g. the `_skip_if_empty` pad-step gate) spans
    its branch's leaf ops, so summing raw durations double-counts every
    nested region (r4 saw op-sum 41 ms vs 20.5 ms wall).  A per-track
    interval stack charges each span only for time not covered by its
    children, so the op-sum is BOUNDED by the wall total (wrapper
    self-time — jit_/while/conditional scheduling gaps — is dropped by
    ``emit`` and reported separately as the op-sum/wall gap)."""
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {log_dir}"
    d = json.load(gzip.open(sorted(paths)[-1]))
    ev = d["traceEvents"]
    device_pids = {
        e["pid"] for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in e["args"].get("name", "")
    }
    tracks = collections.defaultdict(list)
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            if e["name"].startswith("while"):
                total = max(total, e["dur"])
            tracks[(e["pid"], e.get("tid"))].append(e)
    agg, cnt = collections.Counter(), collections.Counter()

    def emit(name, self_us):
        # wrapper spans (dispatch containers) are accounted via their
        # children; their own self time is scheduling overhead — drop it
        if is_wrapper(name):
            return
        agg[name] += self_us
        cnt[name] += 1

    def is_wrapper(name):
        return name.startswith(("jit_", "while", "conditional")) or name == "0"

    for evs in tracks.values():
        # ties on (ts, dur) — a zero-overhead wrapper exactly spanning its
        # sole child — must put the WRAPPER first, or the leaf becomes the
        # "parent" and its self-time is zeroed by the wrapper "child"
        # (advisor r4): known wrapper names sort before leaves at equal
        # extent.
        evs.sort(key=lambda e: (e["ts"], -e["dur"], not is_wrapper(e["name"])))
        stack = []  # [end_ts, name, dur, child_dur]
        for e in evs:
            ts, dur, name = e["ts"], e["dur"], e["name"]
            while stack and ts >= stack[-1][0]:
                _, n2, d2, child = stack.pop()
                emit(n2, max(d2 - child, 0.0))
                if stack:
                    stack[-1][3] += d2
            stack.append([ts + dur, name, dur, 0.0])
        while stack:
            _, n2, d2, child = stack.pop()
            emit(n2, max(d2 - child, 0.0))
            if stack:
                stack[-1][3] += d2
    rows = [(t / 1e3 / n_steps, cnt[n], n) for n, t in agg.most_common()]
    return rows, total / 1e3 / n_steps


def build_epoch_sparse(model_name: str, dtype: str):
    """SYNREDDIT-regime workload: budget-packed sparse batches
    (bench.py _sparse_pack_workload distribution)."""
    import bench as bench_mod
    from cal_tpu.data.loader import Loader, compute_packed_budgets
    from cal_tpu.models.factory import get_model
    from cal_tpu.train.optim import make_optimizer
    from cal_tpu.train.steps import (
        init_state, make_causal_train_epoch, stack_batches)
    from cal_tpu.utils.config import Config

    cfg = Config(model=model_name, dtype=dtype, layout="sparse")
    graphs = bench_mod._sparse_pack_workload()
    budgets = compute_packed_budgets(graphs, cfg.batch_size)
    loader = Loader(graphs, cfg.batch_size, shuffle=False, layout="sparse",
                    budgets=budgets, seed=0, spmm_tiles="auto",
                    spmm_precision="bf16" if dtype == "bfloat16" else "f32")
    batches = list(loader)
    stacked = stack_batches(batches)
    model = get_model(cfg, 0, 2)
    tx = make_optimizer(cfg.lr, cfg.min_lr, cfg.epochs, len(batches), 0.0)
    state = init_state(model, tx, batches[0], jax.random.PRNGKey(0))
    epoch_fn = make_causal_train_epoch(model, tx, cfg.c, cfg.o, cfg.co, True,
                                       skip_empty=True)
    live = jax.jit(lambda b: b.edge_mask.sum())
    edges = float(np.mean([float(live(b)) for b in batches]))
    return epoch_fn, state, stacked, jax.random.PRNGKey(0), edges


def main():
    model_name = sys.argv[1] if len(sys.argv) > 1 else "CausalGAT"
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    if len(sys.argv) > 3 and sys.argv[3] == "sparse":
        epoch_fn, state, stacked, rng, edges = build_epoch_sparse(
            model_name, dtype)
    else:
        epoch_fn, state, stacked, rng, edges = build_epoch(model_name, dtype)
    # warm up / compile outside the trace
    state, m = epoch_fn(state, stacked, rng)
    float(m["loss"])
    log_dir = tempfile.mkdtemp(prefix="profile_step_")
    jax.profiler.start_trace(log_dir)
    state, m = epoch_fn(state, stacked, rng)
    float(m["loss"])
    jax.profiler.stop_trace()
    n_steps = stacked.y.shape[0]
    rows, step_ms = parse_trace(log_dir, n_steps)
    top = rows[:25]
    accounted = sum(r[0] for r in rows)
    print(f"\n{model_name} {dtype}: {step_ms:.3f} ms/step "
          f"({edges / (step_ms * 1e-3) / 1e6:.1f}M edges/s), "
          f"op-sum {accounted:.3f} ms/step over {len(rows)} ops")
    print(f"{'ms/step':>9}  {'count':>5}  op")
    for ms, c, name in top:
        print(f"{ms:9.4f}  {c:5d}  {name[:100]}")
    print(f"\ntrace: {log_dir}")


if __name__ == "__main__":
    main()
