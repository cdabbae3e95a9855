"""Microbench: dense GAT aggregate — fused flash-GAT Pallas kernel vs the
XLA masked-softmax path, at bench.py's CausalGAT shapes.

The CausalGAT headline (bench.py config 2) runs ~2.6x below the CausalGCN
headline; this sweep isolates where the GAT step's extra time goes: the
attention aggregate itself (this file), or the XLA graph around it.
fwd-only and fwd+bwd are timed separately (the custom VJP's backward kernel
re-computes alpha), with and without in-kernel attention dropout (the PRNG
is VPU work that XLA's path pays differently).

Usage: python -m benchmarks.sweep_gat_dense  (real chip; chained-scan timing
per the repo timing rule — never block_until_ready on repeated dispatches)
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from cal_tpu.ops.gat import gat_aggregate_dense
from cal_tpu.ops.pallas_gat import flash_gat_dense

B, N, HEADS, D = 128, 248, 4, 32
EDGES_PER_GRAPH = 1000


def timeit(f, xh0, fwd_only=False, lo=100, hi=500):
    """Two-point differenced chained-scan timing: the tunneled backend has a
    ~26 ms FIXED dispatch+fetch round trip (CLAUDE.md r3 rule), so per-iter
    time is (T(hi) - T(lo)) / (hi - lo) — the fixed cost cancels."""
    def step(xv, _):
        if fwd_only:
            v = f(xv)
            return xv + 1e-9 * v, None
        g = jax.grad(lambda x: f(x).sum())(xv)
        return xv + 1e-6 * g, None

    def total(iters):
        run = jax.jit(
            lambda xv: jax.lax.scan(step, xv, None, length=iters)[0])
        r = run(xh0)
        _ = float(r[0, 0, 0, 0])
        t0 = time.perf_counter()
        r = run(xh0)
        _ = float(r[0, 0, 0, 0])
        return time.perf_counter() - t0

    return (total(hi) - total(lo)) / (hi - lo) * 1e3


def main():
    rng = np.random.default_rng(0)
    xh = jnp.asarray(rng.standard_normal((B, N, HEADS, D)), jnp.float32)
    adj = np.zeros((B, N, N), np.float32)
    for b in range(B):
        s = rng.integers(0, N, EDGES_PER_GRAPH)
        r = rng.integers(0, N, EDGES_PER_GRAPH)
        np.add.at(adj, (b, r, s), 1.0)
    adj = jnp.asarray(adj)
    att_dst = jnp.asarray(rng.standard_normal((HEADS, D)), jnp.float32) * 0.1
    att_src = jnp.asarray(rng.standard_normal((HEADS, D)), jnp.float32) * 0.1
    drng = jax.random.PRNGKey(0)

    cases = {
        "xla_nodrop": lambda x: gat_aggregate_dense(x, adj, att_dst, att_src),
        "flash_nodrop": lambda x: flash_gat_dense(x, adj, att_dst, att_src),
        "xla_drop": lambda x: gat_aggregate_dense(
            x, adj, att_dst, att_src, 0.2, drng),
        "flash_drop": lambda x: flash_gat_dense(
            x, adj, att_dst, att_src, 0.2, drng),
    }
    e_total = B * EDGES_PER_GRAPH
    for name, f in cases.items():
        t_f = timeit(f, xh, fwd_only=True)
        t_fb = timeit(f, xh)
        print(f"{name:>14}: fwd {t_f:7.3f} ms  fwd+bwd {t_fb:7.3f} ms  "
              f"({e_total / t_fb * 1e3 / 1e6:.1f}M edges/s fwd+bwd)")


if __name__ == "__main__":
    main()
