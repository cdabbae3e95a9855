"""Precision-mode sweep for the tiled SpMM's MXU dots (real chip).

Mosaic's DEFAULT f32 dot rounds operands to bf16 (1 MXU pass).  The one-hot
operand is *exact* in bf16, so only the feature operand's rounding matters —
per-operand precision should buy exactness at ~bf16x3 cost instead of
HIGHEST's 6 passes.  Run: ``python -m benchmarks.sweep_spmm_precision``.
"""
import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

import cal_tpu.ops.pallas_spmm as ps

V, E, H = 8192, 262144, 128


def main():
    rng = np.random.default_rng(0)
    senders = rng.integers(0, V, size=E).astype(np.int32)
    receivers = np.sort(rng.integers(0, V, size=E)).astype(np.int32)
    mask = np.arange(E) < int(E * 0.9)
    x = jnp.asarray(rng.standard_normal((V, H)), jnp.float32)
    w = jnp.asarray(rng.random(E), jnp.float32)
    budget = ps.tile_budget_for(E, V, ps.NODE_BLOCK, ps.TILE_EDGES)
    tf = ps.build_tiles(senders, receivers, V, tile_budget=budget)
    tb = ps.build_tiles(receivers, senders, V, tile_budget=budget)
    s, r, m = (jnp.asarray(senders), jnp.asarray(receivers), jnp.asarray(mask))

    from cal_tpu.ops.gcn import gcn_aggregate_sparse
    ref = jax.jit(lambda x: gcn_aggregate_sparse(x, s, r, m, w))(x)
    refn = np.asarray(ref)

    P = jax.lax.Precision
    modes = [
        ("bf16_default", "bf16", None),
        ("f32_onepass", "f32", P.DEFAULT),
        ("f32_highest", "f32", P.HIGHEST),
        ("f32_peroperand", "f32", (P.DEFAULT, P.HIGHEST)),
    ]
    orig = ps._mm_precision
    for name, tprec, prec in modes:
        if prec is None:
            ps._mm_precision = orig
        else:
            ps._mm_precision = lambda _dt, _p=prec: _p
        tfx = dataclasses.replace(tf, precision=tprec)
        tbx = dataclasses.replace(tb, precision=tprec)

        def f(xv):
            return ps.gcn_aggregate_sparse_pallas(xv, s, r, m, tfx, tbx, w)

        err = float(np.max(np.abs(np.asarray(jax.jit(f)(x)) - refn))
                    / np.max(np.abs(refn)))

        def step(xv, _):
            g = jax.grad(lambda xv: jnp.sum(f(xv) ** 2))(xv)
            return xv + 1e-6 * g, None

        run = jax.jit(lambda xv: jax.lax.scan(step, xv, None, length=20)[0])
        out = run(x)
        _ = float(out[0, 0])
        t0 = time.perf_counter()
        out = run(x)
        _ = float(out[0, 0])
        ms = (time.perf_counter() - t0) / 20 * 1e3
        eps = E * 0.9 / (ms / 1e3)
        print(f"{name:16s} {ms:8.3f} ms/fwdbwd  {eps/1e6:7.1f} M edges/s"
              f"  rel-max-err {err:.2e}")
    ps._mm_precision = orig


if __name__ == "__main__":
    main()
