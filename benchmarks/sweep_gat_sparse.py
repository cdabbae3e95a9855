"""Microbench: sparse GAT aggregate — XLA segment ops vs the multi-head
tiled Pallas kernel (ops/pallas_spmm.py coo_spmm_mh) on the real chip.

Workload: DD/REDDIT-scale padded batch (V=8192, E=131072, heads=4, d=32),
forward+backward of a 3-layer GAT stack — the sparse-layout hot path that
SURVEY.md §2.2 (GATConv row) calls for.  Run: python -m
benchmarks.sweep_gat_sparse
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from cal_tpu.ops.gat import gat_aggregate_sparse, gat_aggregate_sparse_pallas
from cal_tpu.ops.pallas_spmm import (
    NODE_BLOCK, TILE_EDGES, build_tiles, tile_budget_for)

V, E, HEADS, D = 8192, 131072, 4, 32


def make_workload(seed=0):
    rng = np.random.default_rng(seed)
    senders = rng.integers(0, V, size=E).astype(np.int32)
    receivers = np.sort(rng.integers(0, V, size=E)).astype(np.int32)
    edge_mask = np.arange(E) < int(E * 0.9)
    xh = rng.standard_normal((V, HEADS, D)).astype(np.float32)
    att = rng.standard_normal((2, HEADS, D)).astype(np.float32) * 0.1
    return (jnp.asarray(xh), jnp.asarray(senders), jnp.asarray(receivers),
            jnp.asarray(edge_mask), jnp.asarray(att[0]), jnp.asarray(att[1]))


def stack(agg, xh, *rest):
    for _ in range(3):
        xh = jax.nn.relu(agg(xh, *rest))
    return jnp.sum(xh ** 2)


def timeit(f, args, iters=30):
    """Chained-scan timing (see benchmarks/sweep_spmm.py: block_until_ready
    is NOT a completion fence on the tunneled backend)."""
    x0, rest = args[0], args[1:]

    def step(xv, _):
        g = jax.grad(functools.partial(stack, f))(xv, *rest)
        return xv + 1e-6 * g, None

    run = jax.jit(lambda xv: jax.lax.scan(step, xv, None, length=iters)[0])
    r = run(x0)
    _ = float(r[0, 0, 0])
    t0 = time.perf_counter()
    r = run(x0)
    _ = float(r[0, 0, 0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    args = make_workload()
    xh, senders, receivers, edge_mask, att_dst, att_src = args
    budget = tile_budget_for(E, V, NODE_BLOCK, TILE_EDGES)
    tf = build_tiles(np.asarray(senders), np.asarray(receivers), V,
                     tile_budget=budget)
    tb = build_tiles(np.asarray(receivers), np.asarray(senders), V,
                     tile_budget=budget)

    def pallas_fn(xh, s, r, m, ad, asr):
        return gat_aggregate_sparse_pallas(xh, s, r, m, ad, asr, tf, tb)

    live = E * 0.9
    for name, f in (("xla_segment", gat_aggregate_sparse),
                    ("pallas_mh_tiled", pallas_fn)):
        ms = timeit(f, args)
        eps = live * 3 / (ms / 1e3)
        print(f"{name:16s} {ms:8.3f} ms/step  {eps / 1e6:8.1f} M edges/s")


if __name__ == "__main__":
    main()
