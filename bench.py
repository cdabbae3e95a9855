"""Headline benchmarks: causal-training throughput (edges/s) on one chip.

Four tracked configs, one JSON line each (headline first):

1. ``causal_train_edges_per_s`` — the reference's canonical dev loop
   (main_syn.py defaults: CausalGCN, hidden=128, layers=3, batch=128,
   synthetic BA/tree+motif graphs, SURVEY.md §3.2) — full jitted train step
   (forward, 3-branch loss, backward, Adam) in the bf16 production config.
2. ``causal_gat_train_edges_per_s`` — same loop with the CausalGAT backbone,
   exercising the fused flash-GAT Pallas kernel (ops/pallas_gat.py).
3. ``sparse_pack_train_edges_per_s`` — the large-graph flagship: the
   budget-packed sparse layout at REDDIT scale through the r5 fused-chain
   kernels (pair conv + in-kernel coefficient chains), vs the worst-case
   padded loader on the same workload.
4. ``spmm_tiled_edges_per_s`` — the block-COO tiled Pallas SpMM
   (ops/pallas_spmm.py) at DD/REDDIT scale (V=8192, E=131072, H=128), the
   large-graph sparse hot kernel.

``vs_baseline`` compares config 1 against the reference-equivalent torch hot
loop measured on this host's CPU (benchmarks/torch_baseline.py ->
benchmarks/baseline_perf.json).  ``pct_hbm_roofline`` is the honest on-chip
number: XLA's bytes-accessed estimate (compiled cost analysis) over the
measured time, as a fraction of peak HBM bandwidth (utils/profiling.py
HW_PEAKS); for config 3 it is ``pct_mxu_floor`` instead (the kernelized
step is compute-bound and XLA cost analysis is blind to Pallas-internal
traffic — see _gcn_sparse_mxu_floor_ms and BASELINE.md); for config 4 it
is the kernel's algorithmic byte floor (utils/profiling.py spmm_roofline).
"""
from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from cal_tpu.data.loader import Loader, compute_budgets
from cal_tpu.data.synthetic import dataset_bias_split, generate_synthetic_dataset
from cal_tpu.models.factory import get_model
from cal_tpu.train.optim import make_optimizer
from cal_tpu.train.steps import (
    init_state, make_causal_train_epoch, stack_batches)
from cal_tpu.utils.config import Config
from cal_tpu.utils.profiling import HW_PEAKS, spmm_roofline, tpu_generation

_HERE = os.path.dirname(os.path.abspath(__file__))
_BASELINE_PATH = os.path.join(_HERE, "benchmarks", "baseline_perf.json")


def _train_workload():
    data_num = 64                      # 64*4*2 = 512 graphs, batch-size 128
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
    batches = list(loader)

    # mean real (directed) edges per batch — the throughput denominator.
    # NOTE: never np.asarray() the batch arrays themselves — on the tunneled
    # TPU backend that leaves them host-committed and every later step
    # re-uploads them (~10x slowdown, measured); reduce on device instead.
    count = jax.jit(
        lambda b: (b.edge_flat < b.x.shape[0] * b.x.shape[1] ** 2).sum()
    )
    edges_per_batch = float(np.mean([float(count(b)) for b in batches]))
    return cfg, batches, edges_per_batch


def bench_causal_train(model_name: str, cfg, batches, edges_per_batch,
                       target_steps: int = 400,
                       skip_empty: bool = False) -> dict:
    """Time the device-side epoch loop (production path: one dispatch per
    epoch, train/steps.py make_causal_train_epoch).

    dtype=bfloat16 is the validated TPU production mode: full canonical
    100-epoch accuracy matches f32 (BASELINE.md "Measured" table); BN stats,
    pooling and readouts stay f32 (models/causal.py dtype docstring)."""
    cfg = cfg.replace(model=model_name)
    model = get_model(cfg, 0, cfg.num_classes)
    tx = make_optimizer(cfg.lr, cfg.min_lr, cfg.epochs, len(batches))
    rng = jax.random.PRNGKey(cfg.seed)
    state = init_state(model, tx, batches[0], rng)
    epoch_fn = make_causal_train_epoch(model, tx, cfg.c, cfg.o, cfg.co, True,
                                       skip_empty=skip_empty)
    stacked = stack_batches(batches)
    n_batches = len(batches)

    # The tunneled backend costs ~15 ms of host/tunnel turnaround PER
    # dispatch (measured r3 via profiler trace: the 3-batch epoch dispatch
    # reads 7.6 ms wall but only 2.4 ms device time) — scan EPOCHS_PER_CALL
    # epochs inside one jitted dispatch so the tracked number measures the
    # device, as a production-size epoch would.
    epochs_per_call = max(1, 30 // n_batches)

    @jax.jit
    def superstep(state, stacked, rng):
        def body(st, i):
            return epoch_fn(st, stacked, jax.random.fold_in(rng, i))

        return jax.lax.scan(body, state, jnp.arange(epochs_per_call))

    # XLA's own HBM-traffic estimate (the honest roofline numerator —
    # counts actual buffer reads/writes at fusion boundaries).  Cost
    # analysis counts a scan BODY once regardless of trip count, so lower
    # the single-epoch function (its per-batch scan body = one step when
    # n_batches covers the epoch) and scale by executed steps.
    try:
        cost = epoch_fn.lower(state, stacked, rng).compile().cost_analysis()
        bytes_per_step = float(cost.get("bytes accessed", 0.0))
    except Exception:
        bytes_per_step = 0.0

    # warmup: compile + let the runtime reach steady state.  Iterations
    # chain through `state`, so the device must execute serially; the final
    # host fetch of the loss forces completion (block_until_ready alone is
    # NOT sufficient on the tunneled backend — see benchmarks/sweep_spmm.py).
    steps_per_call = epochs_per_call * n_batches
    n = 0
    while n < max(40, 2 * steps_per_call):
        state, m = superstep(state, stacked, rng)
        n += steps_per_call
    _ = float(m["loss"][-1])

    # timed region: supersteps chain through `state` (serial by
    # construction); ONE host fetch at the end — any mid-loop fetch stalls
    # the pipeline.
    n_steps = n_calls = 0
    t0 = time.perf_counter()
    while n_steps < target_steps:
        state, m = superstep(state, stacked, rng)
        n_steps += steps_per_call
        n_calls += 1
    _ = float(m["loss"][-1])
    dt = time.perf_counter() - t0

    edges_per_s = n_steps / dt * edges_per_batch
    out = {"edges_per_s": edges_per_s}
    if bytes_per_step:
        gbps = bytes_per_step * n_steps / dt / 1e9
        out["pct_hbm_roofline"] = round(
            100.0 * gbps / HW_PEAKS[tpu_generation()]["hbm_gbps"], 1)
    return out


def _sparse_pack_workload(n_graphs: int = 256):
    """REDDIT-scale sparse workload (heavy-tailed thread graphs, no node
    labels — benchmarks/gen_reddit_synthetic.py distribution) with the
    deg+odeg10 feature expansion the real REDDIT protocol uses."""
    from benchmarks.gen_reddit_synthetic import make_graph
    from cal_tpu.data.feature_expansion import FeatureExpander
    from cal_tpu.graph import HostGraph

    fx = FeatureExpander(degree=True, onehot_maxdeg=10)
    rng = np.random.default_rng(0)
    graphs = []
    for g in range(n_graphs):
        n, edges = make_graph(rng, g % 2)
        e = np.asarray(edges, np.int64).T
        e = np.concatenate([e, e[::-1]], axis=1)
        x, e, _ = fx(None, e, n)
        graphs.append(HostGraph(
            x=np.asarray(x, np.float32),
            senders=np.asarray(e[0], np.int32),
            receivers=np.asarray(e[1], np.int32), y=g % 2))
    return graphs


def _gcn_sparse_mxu_floor_ms(n_tiles: int, t: int, nb: int, h: int) -> float:
    """Analytic MXU floor of one packed-sparse CausalGCN live step.

    After the r5 chain fusion the step is ~90% inside the tiled Pallas
    kernels (benchmarks/profile_step family table, BASELINE.md), which are
    COMPUTE-bound, not HBM-bound: XLA's bytes-accessed estimate sees none
    of the kernel-internal traffic, and the kernels' actual HBM traffic is
    a few % of roofline by design (block reuse).  The honest denominator
    is the step's MXU work at peak: per tile each pass runs 2 matmuls of
    [T, NB] x [NB, W] (4*T*NB*W flops).  Composition: 3 backbone convs x
    fwd+bwd at W=H (6 passes), the pair conv's fwd + transposed-bwd SpMM
    at W=2H, and its SDDMM-chain pass at W=2H.  Row-plane gathers, stats
    and dpre passes are excluded (floor).  The gap to this floor is the
    measured in-kernel one-hot build cost (~0.54 us/tile VPU) plus grid
    and XLA-glue overhead — per-tile decomposition in BASELINE.md."""
    flops = float(n_tiles) * t * nb * h * (6 * 4 + 2 * 8 + 8)
    peak = HW_PEAKS[tpu_generation()]["bf16_tflops"] * 1e12
    return flops / peak * 1e3


def bench_sparse_pack(cfg) -> dict:
    """Sparse-layout causal train step at REDDIT scale — the large-graph
    production path (budget-packed batching; dense [B, N, N] is impossible
    at 3800-node graphs).  vs_baseline compares against the SAME workload
    under the worst-case static budgets (pad_sizes_for), i.e. what the
    loader shipped before pack mode.  ``pct_mxu_floor`` replaces the HBM
    roofline figure (see _gcn_sparse_mxu_floor_ms — the kernelized step
    is compute-bound and XLA cost analysis cannot see Pallas traffic)."""
    from cal_tpu.data.loader import compute_packed_budgets

    graphs = _sparse_pack_workload()
    cfg = cfg.replace(layout="sparse")
    results = {}
    live_counts = n_tiles = None
    for tag, budgets in (
        ("packed", compute_packed_budgets(graphs, cfg.batch_size)),
        ("worst", compute_budgets(graphs, cfg.batch_size, "sparse")),
    ):
        # mirror the production loader config (_make_mesh_and_loaders):
        # fill-rule tile plans + bf16 tile precision under mixed precision
        loader = Loader(graphs, cfg.batch_size, shuffle=False,
                        layout="sparse", budgets=budgets, seed=0,
                        spmm_tiles="auto",
                        spmm_precision="bf16" if cfg.dtype == "bfloat16"
                        else "f32")
        batches = list(loader)
        live = jax.jit(lambda b: b.edge_mask.sum())
        counts = [float(live(b)) for b in batches]
        edges_per_batch = float(np.sum(counts)) / len(batches)
        if tag == "packed":
            live_counts = counts
            if batches[0].tiles is not None:
                n_tiles = int(batches[0].tiles[0].iblk.shape[0])
        results[tag] = bench_causal_train(
            "CausalGCN", cfg, batches, edges_per_batch, target_steps=60,
            skip_empty=(tag == "packed"))
    out = dict(results["packed"])
    out.pop("pct_hbm_roofline", None)   # blind to Pallas traffic — see above
    out["speedup_vs_worst_case_padding"] = (
        results["packed"]["edges_per_s"] / results["worst"]["edges_per_s"])
    if n_tiles:
        from cal_tpu.ops.pallas_spmm import NODE_BLOCK, TILE_EDGES

        n_live = sum(1 for c in live_counts if c > 0)
        floor_ms = _gcn_sparse_mxu_floor_ms(
            n_tiles, TILE_EDGES, NODE_BLOCK, 128)
        measured_epoch_ms = (
            float(np.sum(live_counts)) / out["edges_per_s"] * 1e3)
        out["pct_mxu_floor"] = round(
            100.0 * (n_live * floor_ms) / measured_epoch_ms, 1)
    return out


def bench_spmm_tiled(v: int = 8192, e: int = 131072, h: int = 128) -> dict:
    """Block-COO tiled Pallas SpMM at large-graph scale, on the
    TRAINING-relevant basis: fwd + full backward of the sigmoid-weighted
    aggregate (the causal masked conv: w_e = sigma(src[s]+dst[r])) — what
    the kernel actually runs per step on the sparse layout.  Tiled side:
    the tile-order fused chain (gcn_aggregate_sparse_sigmoid_pallas, r3 —
    no [E]-order coef gather/scatter) with bf16 tiles (the production
    mixed-precision config); XLA side: the same math with materialized
    per-edge weights over segment ops.

    The roofline denominator stays the forward byte floor (one gathered
    read + one scattered write of H-wide rows per edge) scaled by the three
    kernel invocations of a fwd+bwd (fwd SpMM, transposed SpMM for dx,
    SDDMM for dcoef)."""
    from cal_tpu.ops.pallas_spmm import (
        NODE_BLOCK, TILE_EDGES, build_tiles,
        gcn_aggregate_sparse_sigmoid_pallas, tile_budget_for)

    rng = np.random.default_rng(0)
    senders = rng.integers(0, v, size=e)
    receivers = np.sort(rng.integers(0, v, size=e))
    edge_mask = np.arange(e) < int(e * 0.9)           # 10% padding tail
    live_edges = float(edge_mask.sum())
    x = jnp.asarray(rng.standard_normal((v, h)).astype(np.float32))
    src = jnp.asarray(rng.standard_normal(v).astype(np.float32))
    dst = jnp.asarray(rng.standard_normal(v).astype(np.float32))
    budget = tile_budget_for(e, v, NODE_BLOCK, TILE_EDGES)
    tf = build_tiles(senders, receivers, v, tile_budget=budget,
                     precision="bf16", edge_mask=edge_mask)
    tb = build_tiles(receivers, senders, v, tile_budget=budget,
                     precision="bf16", edge_mask=edge_mask)
    s_j, r_j, m_j = (jnp.asarray(senders, jnp.int32),
                     jnp.asarray(receivers, jnp.int32),
                     jnp.asarray(edge_mask))

    def agg(xv, srcv, dstv):
        return gcn_aggregate_sparse_sigmoid_pallas(xv, srcv, dstv, tf, tb)

    def agg_xla(xv, srcv, dstv):
        from cal_tpu.ops.gcn import gcn_aggregate_sparse

        w = jax.nn.sigmoid(srcv[s_j] + dstv[r_j])
        return gcn_aggregate_sparse(xv, s_j, r_j, m_j, w)

    iters = 50

    def timeit(fn):
        # fwd+bwd: differentiate w.r.t. x AND the weight factors (both
        # grads are live in training: dx feeds the conv stack, dsrc/ddst
        # feed the attention MLP).
        def loss(xv, srcv, dstv):
            return jnp.sum(fn(xv, srcv, dstv) ** 2)

        gfn = jax.grad(loss, argnums=(0, 1, 2))

        def chain(xv):
            def body(c, _):
                dx, dsrc, ddst = gfn(c, src, dst)
                return (c + 1e-9 * dx
                        + 1e-12 * (jnp.sum(dsrc) + jnp.sum(ddst))), None

            return jax.lax.scan(body, xv, None, length=iters)[0]

        run = jax.jit(chain)
        r = run(x)
        _ = float(r[0, 0])        # compile + completion fence
        t0 = time.perf_counter()
        r = run(x)
        _ = float(r[0, 0])
        return (time.perf_counter() - t0) / iters

    dt = timeit(agg)
    dt_xla = timeit(agg_xla)

    n_tiles = int(tf.iblk.shape[0])
    # one fwd+bwd = 3 kernel passes (fwd SpMM, dx SpMM, dcoef SDDMM), each
    # visiting every edge once with the same 2*E*H byte floor and the same
    # 2-matmuls-per-tile MXU work — scale the single-pass cost model by the
    # pass count so edges/s stays per-logical-fwd+bwd-edge.
    passes = 3.0
    rl = spmm_roofline(live_edges * passes, h, dt, n_tiles=n_tiles * passes,
                       tile_edges=TILE_EDGES, node_block=NODE_BLOCK)
    return {
        "edges_per_s": rl["edges_per_s"] / passes,
        "speedup_vs_xla": dt_xla / dt,
        "pct_hbm_roofline": round(rl["pct_hbm_floor"], 1),
        "pct_mxu_peak": round(rl["pct_mxu_peak"], 1),
    }


def main():
    if tpu_generation() != "v5e":
        # the GAT kernel crossover constants (nn/layers.py) and the tile
        # geometry encode v5e measurements — numbers on other generations
        # are valid but the dispatch heuristics may be stale
        print(f"# WARNING: kernel crossover constants were measured on "
              f"v5e; this is {tpu_generation()}", flush=True)
    cfg, batches, edges_per_batch = _train_workload()

    lines = []
    r = bench_causal_train("CausalGCN", cfg, batches, edges_per_batch, 400)
    baseline = None
    if os.path.exists(_BASELINE_PATH):
        with open(_BASELINE_PATH) as f:
            baseline = json.load(f).get("train_edges_per_s")
    line = {
        "metric": "causal_train_edges_per_s",
        "value": round(r["edges_per_s"], 1),
        "unit": "edges/s",
        "vs_baseline": round(r["edges_per_s"] / baseline, 2) if baseline
        else 1.0,
    }
    if "pct_hbm_roofline" in r:
        line["pct_hbm_roofline"] = r["pct_hbm_roofline"]
    lines.append(line)

    r = bench_causal_train("CausalGAT", cfg, batches, edges_per_batch, 200)
    gat_baseline = None
    if os.path.exists(_BASELINE_PATH):
        with open(_BASELINE_PATH) as f:
            gat_baseline = json.load(f).get("gat_train_edges_per_s")
    line = {
        "metric": "causal_gat_train_edges_per_s",
        "value": round(r["edges_per_s"], 1),
        "unit": "edges/s",
        # GAT-specific torch-CPU denominator (benchmarks/torch_baseline.py
        # CausalGAT twin)
        "vs_baseline": round(r["edges_per_s"] / gat_baseline, 2)
        if gat_baseline else 1.0,
    }
    if "pct_hbm_roofline" in r:
        line["pct_hbm_roofline"] = r["pct_hbm_roofline"]
    lines.append(line)

    r = bench_sparse_pack(cfg)
    line = {
        "metric": "sparse_pack_train_edges_per_s",
        "value": round(r["edges_per_s"], 1),
        "unit": "edges/s",
        # vs the worst-case-padded loader on the same REDDIT-scale workload
        "vs_baseline": round(r["speedup_vs_worst_case_padding"], 2),
    }
    if "pct_mxu_floor" in r:
        line["pct_mxu_floor"] = r["pct_mxu_floor"]
    lines.append(line)

    r = bench_spmm_tiled()
    lines.append({
        "metric": "spmm_tiled_edges_per_s",
        "value": round(r["edges_per_s"], 1),
        "unit": "edges/s",
        # the in-run XLA segment-sum forward of the same aggregate
        "vs_baseline": round(r["speedup_vs_xla"], 2),
        "pct_hbm_roofline": r["pct_hbm_roofline"],
        "pct_mxu_peak": r["pct_mxu_peak"],
    })

    for line in lines:
        print(json.dumps(line))


if __name__ == "__main__":
    main()
