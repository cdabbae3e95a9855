"""Microbench: sparse GCN aggregate formulations on the real chip.

The sparse (padded edge-list) layout is the production path for large-graph
TU datasets (DD max 5748 nodes, REDDIT-BINARY max ~3782) where a dense
[B, N, N] adjacency is infeasible.  This sweep times forward+backward of a
5-conv stack (the causal model's conv budget) for each candidate SpMM
formulation so the production choice is made with data (SURVEY.md §7 step 7:
"swap segment_sum SpMM for Pallas; benchmark edges/s vs step-2 baseline").

Workload: one padded batch at DD-like scale — V nodes, E directed edges,
receiver-sorted with padding, H=128 hidden.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

V, E, H = 8192, 131072, 128


def _norm(senders, receivers, live, ew, num_nodes, dtype):
    ew = jnp.where(live, ew, 0.0)
    deg = jax.ops.segment_sum(ew, senders, num_segments=num_nodes) + 1.0
    dis = jax.lax.rsqrt(deg)
    return dis[senders] * ew * dis[receivers], deg


def xla_sorted(x, senders, receivers, edge_mask, edge_weight):
    """Production implementation: gather + sorted segment_sum."""
    live = edge_mask & (senders != receivers)
    norm, deg = _norm(senders, receivers, live,
                      edge_weight, x.shape[0], x.dtype)
    msg = norm[:, None] * jnp.take(x, senders, axis=0)
    out = jax.ops.segment_sum(msg, receivers, num_segments=x.shape[0],
                              indices_are_sorted=True)
    return out + x / deg[:, None]


def xla_unsorted(x, senders, receivers, edge_mask, edge_weight):
    """Same but without the sortedness hint (what a naive port would do)."""
    live = edge_mask & (senders != receivers)
    norm, deg = _norm(senders, receivers, live,
                      edge_weight, x.shape[0], x.dtype)
    msg = norm[:, None] * jnp.take(x, senders, axis=0)
    out = jax.ops.segment_sum(msg, receivers, num_segments=x.shape[0])
    return out + x / deg[:, None]


def onehot_matmul(x, senders, receivers, edge_mask, edge_weight, blk=512):
    """Gather/scatter as one-hot matmuls on the MXU (the dense-path trick).

    FLOPs scale as O(E * V * H / blk-efficiency) — expected to lose badly at
    this V; included to document the crossover argument, not to win.
    """
    live = edge_mask & (senders != receivers)
    norm, deg = _norm(senders, receivers, live,
                      edge_weight, x.shape[0], x.dtype)
    nblk = x.shape[0] // blk
    out = jnp.zeros_like(x)
    col = jnp.arange(blk)

    def gather_blk(i, acc):
        base = i * blk
        # onehot[e, n] = 1[senders[e] == base + n]; gather as MXU matmul
        g = (senders[:, None] == base + col[None, :]).astype(x.dtype)
        return acc + g @ jax.lax.dynamic_slice_in_dim(x, base, blk)

    msg = jax.lax.fori_loop(0, nblk, gather_blk, jnp.zeros((E, H), x.dtype))
    msg = norm[:, None] * msg
    s = jax.lax.fori_loop(
        0, nblk,
        lambda i, o: jax.lax.dynamic_update_slice_in_dim(
            o,
            jax.lax.dynamic_slice_in_dim(o, i * blk, blk)
            + ((receivers[:, None] == i * blk + col[None, :])
               .astype(x.dtype).T @ msg),
            i * blk, axis=0),
        out)
    return s + x / deg[:, None]


def stack(agg, x, senders, receivers, edge_mask, w):
    for _ in range(3):
        x = jax.nn.relu(agg(x, senders, receivers, edge_mask,
                            jnp.ones_like(w)))
    a = jax.nn.relu(agg(x, senders, receivers, edge_mask, w))
    b = jax.nn.relu(agg(x, senders, receivers, edge_mask, 1.0 - w))
    return a.sum() + b.sum()


def timeit(f, args, iters=30, fwd_only=False):
    """Chained-scan timing: iteration i+1 consumes iteration i's output and a
    scalar is fetched to host at the end.  Timing independent repeated calls
    with ``block_until_ready`` is BOGUS on the tunneled axon backend (it
    acks before execution completes — measured 0.035 ms for work whose HBM
    traffic alone needs >1.5 ms); data dependencies can't be faked out."""
    x0, rest = args[0], args[1:]

    def step(xv, _):
        if fwd_only:
            v = stack(f, xv, *rest)
            return xv + 1e-9 * v, None
        g = jax.grad(functools.partial(stack, f))(xv, *rest)
        return xv + 1e-6 * g, None

    run = jax.jit(lambda xv: jax.lax.scan(step, xv, None, length=iters)[0])
    r = run(x0)
    _ = float(r[0, 0])  # warmup + compile; fetch forces completion
    t0 = time.perf_counter()
    r = run(x0)
    _ = float(r[0, 0])
    return (time.perf_counter() - t0) / iters * 1e3


def make_workload(seed=0):
    rng = np.random.default_rng(seed)
    senders = rng.integers(0, V, size=E)
    receivers = np.sort(rng.integers(0, V, size=E))
    edge_mask = np.arange(E) < int(E * 0.9)           # 10% padding tail
    x = rng.standard_normal((V, H)).astype(np.float32)
    w = rng.random(E).astype(np.float32)
    return (jnp.asarray(x), jnp.asarray(senders, jnp.int32),
            jnp.asarray(receivers, jnp.int32), jnp.asarray(edge_mask),
            jnp.asarray(w))


def main():
    args = make_workload()
    # (name, fn, fwd_only) — onehot saves [E, blk] one-hots under autodiff
    # and OOMs HBM, so it is timed forward-only (already enough to rule out)
    candidates = [("xla_sorted", xla_sorted, False),
                  ("xla_unsorted", xla_unsorted, False),
                  ("onehot_matmul(fwd)", onehot_matmul, True)]
    from cal_tpu.ops.pallas_spmm import (
        NODE_BLOCK, TILE_EDGES, build_tiles, gcn_aggregate_sparse_pallas,
        tile_budget_for)
    senders, receivers = np.asarray(args[1]), np.asarray(args[2])
    budget = tile_budget_for(E, V, NODE_BLOCK, TILE_EDGES)
    tf = build_tiles(senders, receivers, V, tile_budget=budget)
    tb = build_tiles(receivers, senders, V, tile_budget=budget)

    def pallas_tiled(x, senders, receivers, edge_mask, edge_weight):
        return gcn_aggregate_sparse_pallas(
            x, senders, receivers, edge_mask, tf, tb, edge_weight)

    candidates.append(("pallas_tiled", pallas_tiled, False))

    import dataclasses as _dc
    tf16 = _dc.replace(tf, precision="bf16")
    tb16 = _dc.replace(tb, precision="bf16")

    def pallas_bf16(x, senders, receivers, edge_mask, edge_weight):
        return gcn_aggregate_sparse_pallas(
            x, senders, receivers, edge_mask, tf16, tb16, edge_weight)

    candidates.append(("pallas_bf16", pallas_bf16, False))

    ref = None
    for name, f, fwd_only in candidates:
        ms = timeit(f, args, fwd_only=fwd_only)
        eps = E * 0.9 * 5 / (ms / 1e3)
        v = jax.jit(functools.partial(stack, f))(*args)
        if ref is None:
            ref = float(v)
        rel = abs(float(v) - ref) / abs(ref)
        print(f"{name:16s} {ms:8.3f} ms/step  {eps/1e6:8.1f} M edges/s"
              f"  rel_err {rel:.2e}")


if __name__ == "__main__":
    main()


# Measured on TPU v5e (2026-08-18), chained-scan timing, 5-conv fwd+bwd:
#   xla_sorted     13.4 ms   44 M edges/s   (XLA gather + sorted segment_sum)
#   pallas_tiled    8.2 ms   72 M edges/s   (f32, production choice: 1.64x)
#   pallas_bf16     8.7 ms   68 M edges/s   (bf16 matmuls do NOT help ->
#                                            kernel is not MXU-throughput-
#                                            bound; f32 stays the default)
