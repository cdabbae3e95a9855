"""Race the sparse-GAT chain formulations on the real chip (r5).

Three implementations of the PyG-1.1.0 GAT aggregate over a padded edge
list (reference model.py:340 at sparse scale):

  * xla      — gat_aggregate_sparse: everything in XLA [E]-order segment ops;
  * mh-tiled — gat_aggregate_sparse_pallas: XLA [E]-order score/softmax
               chain + the multi-head tiled SpMM kernel (r3);
  * fused    — gat_aggregate_sparse_fused: the WHOLE chain in tile-slot
               order (r5; ops/gat.py block comment).

Basis: fwd + full backward (dxh) of one aggregate, bf16 tile precision
(production config), with and without attention dropout.  Timing follows
the CLAUDE.md rules: chained scan through the input, one scalar fetched,
and the fixed ~26 ms dispatch RTT cancelled by differencing two iteration
counts.  Run: ``python -m benchmarks.sweep_gat_chain`` (TPU).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from cal_tpu.ops.gat import (
    gat_aggregate_sparse, gat_aggregate_sparse_fused,
    gat_aggregate_sparse_pallas)
from cal_tpu.ops.pallas_spmm import (
    NODE_BLOCK, TILE_EDGES, build_tiles, tile_budget_for)

HEADS, D = 4, 32


def make_workload(v, e, graph_nodes=512, seed=0):
    """Disjoint-union-like batch: edges stay within contiguous per-graph
    node windows (the loader's invariant — without it the block-pair tile
    budget explodes to nb^2 at REDDIT scale and no production plan looks
    like that)."""
    rng = np.random.default_rng(seed)
    n_graphs = v // graph_nodes
    eg = e // n_graphs
    senders, receivers = [], []
    for g in range(n_graphs):
        base = g * graph_nodes
        senders.append(base + rng.integers(0, graph_nodes, size=eg))
        receivers.append(base + np.sort(rng.integers(0, graph_nodes,
                                                     size=eg)))
    senders = np.concatenate(senders)[:e]
    receivers = np.concatenate(receivers)[:e]
    edge_mask = (np.arange(e) % eg) < int(eg * 0.9)
    xh = rng.standard_normal((v, HEADS, D)).astype(np.float32)
    att = rng.standard_normal((2, HEADS, D)).astype(np.float32) * 0.1
    budget = tile_budget_for(e, v, NODE_BLOCK, TILE_EDGES,
                             max_graph_nodes=graph_nodes)
    tf = build_tiles(senders, receivers, v, tile_budget=budget,
                     precision="bf16", edge_mask=edge_mask)
    tb = build_tiles(receivers, senders, v, tile_budget=budget,
                     precision="bf16", edge_mask=edge_mask)
    return (jnp.asarray(xh), jnp.asarray(senders, jnp.int32),
            jnp.asarray(receivers, jnp.int32), jnp.asarray(edge_mask),
            jnp.asarray(att[0]), jnp.asarray(att[1]), tf, tb)


def chain_time(f, xh, iters):
    """fwd+bwd chained through xh; returns wall seconds for the dispatch."""

    def step(xv, _):
        g = jax.grad(lambda x: jnp.sum(f(x) ** 2))(xv)
        return xv + 1e-6 * g, None

    run = jax.jit(lambda xv: jax.lax.scan(step, xv, None, length=iters)[0])
    r = run(xh)
    _ = float(r[0, 0, 0])                    # compile + warmup
    t0 = time.perf_counter()
    _ = float(run(xh)[0, 0, 0])
    return time.perf_counter() - t0


def diff_time(f, xh, lo=10, hi=60):
    """Two-point differenced ms/iter (cancels the fixed dispatch RTT)."""
    tl = chain_time(f, xh, lo)
    th = chain_time(f, xh, hi)
    return (th - tl) / (hi - lo) * 1e3


def main():
    print(f"backend: {jax.default_backend()}")
    for v, e, tag in ((8192, 131072, "bench-shape"),
                      (65536, 151552, "SYNREDDIT-shape")):
        xh, s, r, m, ad, asr, tf, tb = make_workload(v, e)
        seed = jnp.asarray([11, 22], jnp.uint32)
        key = jax.random.PRNGKey(0)
        cases = {
            "xla": lambda x: gat_aggregate_sparse(x, s, r, m, ad, asr),
            "mh-tiled": lambda x: gat_aggregate_sparse_pallas(
                x, s, r, m, ad, asr, tf, tb),
            "fused": lambda x: gat_aggregate_sparse_fused(
                x, ad, asr, seed, tf, tb, 0.0),
            "xla+drop": lambda x: gat_aggregate_sparse(
                x, s, r, m, ad, asr, 0.2, key),
            "fused+drop": lambda x: gat_aggregate_sparse_fused(
                x, ad, asr, seed, tf, tb, 0.2),
        }
        print(f"[{tag}] V={v} E={e} heads={HEADS} d={D} "
              f"(fwd+bwd per aggregate, bf16 tiles, ms):")
        for name, f in cases.items():
            ms = diff_time(f, xh)
            print(f"  {name:10s} {ms:7.3f} ms  "
                  f"({e / ms / 1e3:.1f}M edges/s)")


if __name__ == "__main__":
    main()
