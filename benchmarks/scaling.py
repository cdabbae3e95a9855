"""Scaling harness: dp causal-training sharding overhead at 1..N devices.

BASELINE.md north-star: ">80% edges/s scaling at 1 chip, 1 host, N>=2 hosts".
Only one real TPU chip is reachable here, and a forced N-device CPU mesh
shares the host's physical cores, so classic weak-scaling efficiency is not
measurable (N virtual devices have no extra silicon).  What IS measurable —
and is the controllable half of scaling efficiency — is **sharding
overhead**: the dp-sharded program (psum'd grads, replicated-state updates,
cross-shard BN stats) vs a single-device program on the *identical global
batch*.  overhead = t_dp / t_single; on real hardware, scaling efficiency
= 1 / (overhead + ICI collective time share), so overhead ~1.0x here is a
prerequisite for >80% on a pod slice.  The program is the same
pjit/NamedSharding one that runs over ICI (cal_tpu/parallel/mesh.py,
multihost.py); only mesh construction changes on hardware.

Usage: python -m benchmarks.scaling [--devices 8] [--steps 20]
Prints one JSON line per mesh size.
"""
from __future__ import annotations

import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--per_dev_batch", type=int, default=32)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from cal_tpu.data.loader import Loader, compute_budgets
    from cal_tpu.data.synthetic import (
        dataset_bias_split, generate_synthetic_dataset)
    from cal_tpu.models.factory import get_model
    from cal_tpu.parallel import (
        make_dp_causal_train_step, make_mesh, replicate, shard_batch)
    from cal_tpu.train.optim import make_optimizer
    from cal_tpu.train.steps import init_state
    from cal_tpu.utils.config import Config

    cfg = Config(model="CausalGCN", hidden=64, layers=3, node_num=8)
    data_num = 96
    nested = generate_synthetic_dataset(
        data_num=data_num, node_num=cfg.node_num, max_degree=cfg.max_degree,
        noise=cfg.noise, seed=cfg.seed, cache_path=None)
    dataset, _, _, _ = dataset_bias_split(
        nested, bias=0.9, total=data_num * 4, seed=cfg.seed)

    def measure(n, bs):
        """edges/s of the dp train step on an n-device mesh, global batch bs."""
        budgets = compute_budgets(dataset, bs, "dense")
        # edge budget must divide evenly across dp shards
        budgets["edge_budget"] = -(-budgets["edge_budget"] // (128 * n)) * 128 * n
        loader = Loader(dataset, bs, shuffle=True, layout="dense",
                        budgets=budgets, seed=cfg.seed, drop_remainder=False)
        batch = next(iter(loader))
        mesh = make_mesh(dp=n, edge=1, devices=jax.devices()[:n])
        model = get_model(cfg, 0, cfg.num_classes)
        tx = make_optimizer(cfg.lr, cfg.min_lr, cfg.epochs, 1, 0.0)
        rng = jax.random.PRNGKey(cfg.seed)
        state = init_state(model, tx, batch, rng)
        step = make_dp_causal_train_step(
            model, tx, cfg.c, cfg.o, cfg.co, True, mesh, state, batch)
        b = shard_batch(batch, mesh)
        st, r = replicate(state, mesh), replicate(rng, mesh)

        # edges per global batch (device-side reduce; see bench.py note)
        count = jax.jit(
            lambda bb: (bb.edge_flat
                        < bb.x.shape[0] * bb.x.shape[1] ** 2).sum())
        edges = float(count(b))

        st, m = step(st, b, r)  # compile + warmup
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            st, m = step(st, b, r)  # state chains -> serial, valid timing
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / args.steps
        return edges / dt

    sizes = [n for n in (1, 2, 4, 8) if n <= args.devices]
    for n in sizes:
        bs = args.per_dev_batch * n
        eps_dp = measure(n, bs)
        eps_single = measure(1, bs) if n > 1 else eps_dp
        overhead = eps_single / eps_dp if eps_dp else float("inf")
        print(json.dumps({
            "metric": "dp_sharding_overhead", "devices": n,
            "global_batch": bs,
            "dp_edges_per_s": round(eps_dp, 1),
            "single_dev_edges_per_s": round(eps_single, 1),
            "overhead_x": round(overhead, 3),
        }))

    # --- edge axis: edge-partitioned train step vs single-device sparse ---
    # (the context-parallel analog; comms columns quantify the halo design:
    # halo_rows = boundary rows actually exchanged per layer vs the
    # (n-1)*V rows a naive all_gather would ship — SURVEY.md §5)
    from cal_tpu.graph import batch_graphs, pad_sizes_for
    from cal_tpu.parallel import (
        comms_stats, partition_batch, partition_budgets, replicate as _rep,
        shard_batch as _shard)
    from cal_tpu.train.steps import make_causal_train_step

    bs = args.per_dev_batch * args.devices
    chunk = dataset[:bs]
    model = get_model(cfg, 0, cfg.num_classes)
    tx = make_optimizer(cfg.lr, cfg.min_lr, cfg.epochs, 1, 0.0)
    rng = jax.random.PRNGKey(cfg.seed)
    step = make_causal_train_step(model, tx, cfg.c, cfg.o, cfg.co, True)

    def measure_sparse():
        pn, pe = pad_sizes_for(chunk, bs)
        b = batch_graphs(chunk, bs, pn, pe)
        st = init_state(model, tx, b, rng)
        st, m = step(st, b, rng)
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            st, m = step(st, b, rng)
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / args.steps
        return sum(g.num_edges for g in chunk) / dt

    def measure_edge(ne):
        mesh = make_mesh(dp=1, edge=ne, devices=jax.devices()[:ne])
        bud = partition_budgets(chunk, bs, 1, ne)
        pb = partition_batch(chunk, mesh, bud["num_graphs"],
                             bud["node_budget"],
                             bud["edge_budget_per_shard"],
                             bud["halo_budget"])
        st = _rep(init_state(model, tx, pb, rng), mesh)
        sb = _shard(pb, mesh)
        st, m = step(st, sb, rng)
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            st, m = step(st, sb, rng)
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / args.steps
        return sum(g.num_edges for g in chunk) / dt, comms_stats(pb)

    eps_sp = measure_sparse()
    for n in sizes:
        eps_e, comms = measure_edge(n)
        print(json.dumps({
            "metric": "edge_sharding_overhead", "edge_shards": n,
            "global_batch": bs,
            "edge_part_edges_per_s": round(eps_e, 1),
            "single_sparse_edges_per_s": round(eps_sp, 1),
            "overhead_x": round(eps_sp / eps_e if eps_e else float("inf"), 3),
            "halo_rows_per_layer": comms["halo_rows"],
            "reduction_vs_allgather": round(
                comms["reduction_vs_allgather"], 2),
        }))


if __name__ == "__main__":
    main()
