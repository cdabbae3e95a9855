"""Tile-geometry sweep for the packed-sparse flagship step (r5).

The nesting-aware per-op attribution (benchmarks/profile_step, r5) puts
~87% of the packed SYNREDDIT-scale CausalGCN step inside the three tiled
conv families, and the shipped tile plans run at only ~45% slot occupancy
(618 tiles x 512 slots for ~118k live edges): kernel time scales with
n_tiles x T x NB, so geometry — not more fusion — is the lever.  This
sweep builds plans for the REAL packed batch structure (bench.py
_sparse_pack_workload) at several (NODE_BLOCK, TILE_EDGES) points and
races the two production aggregates (plain fwd+bwd = backbone conv,
sigmoid fwd+bwd = masked causal conv) with chained-scan timing
(CLAUDE.md rules: >= 500 iterations, one fetch at the end).

Usage:  python -m benchmarks.sweep_pack_tiles [iters]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 500


def main():
    import bench as bench_mod
    from cal_tpu.data.loader import Loader, compute_packed_budgets
    from cal_tpu.ops.pallas_spmm import (
        build_tiles, gcn_aggregate_sparse_plain_pallas,
        gcn_aggregate_sparse_sigmoid_pallas)
    from cal_tpu.utils.config import Config

    cfg = Config(model="CausalGCN", dtype="bfloat16", layout="sparse")
    graphs = bench_mod._sparse_pack_workload()
    budgets = compute_packed_budgets(graphs, cfg.batch_size)
    loader = Loader(graphs, cfg.batch_size, shuffle=False, layout="sparse",
                    budgets=budgets, seed=0, spmm_precision="bf16")
    b = next(iter(loader))
    s = np.asarray(jax.device_get(b.senders))
    r = np.asarray(jax.device_get(b.receivers))
    em = np.asarray(jax.device_get(b.edge_mask))
    V0 = b.x.shape[0]
    H = 128
    live = int(em.sum())
    rng = np.random.default_rng(0)

    def timeit(fn, xv, iters):
        def chain(c):
            def body(c, _):
                return c + 1e-9 * fn(c), None

            return jax.lax.scan(body, c, None, length=iters)[0]

        run = jax.jit(chain)
        _ = float(run(xv)[0, 0])                      # compile + fence
        t0 = time.perf_counter()
        _ = float(run(xv)[0, 0])
        return (time.perf_counter() - t0) / iters

    print(f"V={V0} live_edges={live}  iters={ITERS}")
    print(f"{'NB':>5} {'T':>5} {'tiles':>6} {'occ':>5} "
          f"{'plain ms':>9} {'sig ms':>8} {'Medges/s(sig)':>13}")
    for nb_, t_ in [(512, 512), (512, 256), (512, 128), (1024, 512),
                    (1024, 256), (1024, 128), (2048, 256), (256, 128)]:
        V = -(-V0 // nb_) * nb_                       # round up per geometry
        x = jnp.asarray(rng.standard_normal((V, H)).astype(np.float32))
        src = jnp.asarray(rng.standard_normal(V).astype(np.float32))
        dst = jnp.asarray(rng.standard_normal(V).astype(np.float32))
        tf = build_tiles(s, r, V, node_block=nb_, tile_edges=t_,
                         precision="bf16", edge_mask=em)
        tb = build_tiles(r, s, V, node_block=nb_, tile_edges=t_,
                         precision="bf16", edge_mask=em)
        n_tiles = int(tf.iblk.shape[0])

        def plain_fb(xv):
            y = gcn_aggregate_sparse_plain_pallas(xv, tf, tb, nb_)
            return jax.grad(lambda c: jnp.sum(
                gcn_aggregate_sparse_plain_pallas(c, tf, tb, nb_) ** 2))(xv)

        def sig_fb(xv):
            return jax.grad(lambda c: jnp.sum(
                gcn_aggregate_sparse_sigmoid_pallas(
                    c, src, dst, tf, tb, False, nb_) ** 2))(xv)

        dt_p = timeit(jax.jit(plain_fb), x, ITERS)
        dt_s = timeit(jax.jit(sig_fb), x, ITERS)
        occ = live / (n_tiles * t_)
        print(f"{nb_:>5} {t_:>5} {n_tiles:>6} {occ:5.2f} "
              f"{dt_p * 1e3:9.3f} {dt_s * 1e3:8.3f} "
              f"{live / dt_s / 1e6:13.1f}")


if __name__ == "__main__":
    main()
