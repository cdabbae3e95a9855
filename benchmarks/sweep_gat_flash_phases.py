"""Phase isolation for the flash-GAT fwd kernel + backend timing probes.

This sweep drove the r3 flash-GAT v2 redesign.  Findings it produced:
  * the tunneled backend has a ~26 ms FIXED dispatch+fetch round trip —
    every chained-scan microbench at k iterations reads +26/k ms per iter
    (xla_bw_probe + the varying-iteration probes; now a CLAUDE.md rule);
  * real achievable HBM bandwidth is ~500-600 GB/s (large-array probes);
  * the per-head ``tj[:, h:h+1].T`` transpose relayout cost ~30% of the
    kernel (score_pret vs score_only) -> v2 passes tjt pre-transposed;
  * N=248 (non-128-multiple lanes) tripled the block-DMA floor vs N=256
    -> the loader now lane-aligns dense node budgets;
  * gb graphs per grid step shave per-program overhead (gb8 variant).

Phase variants time stripped copies of the kernel (noop = DMA floor only,
mask/score/softmax/matmul = cumulative math stages, *_pret = transposed
sender operand, gbK = K graphs per block).

Usage: python -m benchmarks.sweep_gat_flash_phases
NOTE: per-iteration numbers below ~1 ms still carry the +26/iters RTT
bias (iters=50); compare variants, not absolutes.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N, HEADS, D = 128, 256, 4, 32
EDGES_PER_GRAPH = 1000
NEG_SLOPE = 0.2
_BIG_NEG = -1e30


def _leaky(x):
    return jnp.where(x >= 0, x, NEG_SLOPE * x)


def _eye(n, dtype):
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (row == col)


def _kernel(ti_ref, tj_ref, tjt_ref, counts_ref, xh_ref, o_ref, m_ref,
            den_ref, *, heads, d, phase):
    counts = counts_ref[0]
    n = counts.shape[0]
    if phase == "noop":
        o_ref[0] = jnp.zeros_like(o_ref[0])
        return
    eye = _eye(n, counts.dtype)
    ceff = jnp.where(eye, 1.0, counts)
    allowed = ceff > 0
    if phase == "mask_only":
        o_ref[0] = ceff[:, :heads * d] + 0.0
        return
    ti = ti_ref[0]
    tj = tj_ref[0]
    tjt = tjt_ref[0]          # [heads, N] pre-transposed sender half
    for h in range(heads):
        if phase in ("score_pret", "softmax_pret", "full_pret"):
            pre = ti[:, h:h + 1] + tjt[h:h + 1, :]
        else:
            pre = ti[:, h:h + 1] + tj[:, h:h + 1].T
        if phase.startswith("score"):
            o_ref[0, :, h * d:(h + 1) * d] = pre[:, :d]
            continue
        s = jnp.where(allowed, _leaky(pre), _BIG_NEG)
        mh = jnp.max(s, axis=1, keepdims=True)
        num = jnp.exp(s - mh) * ceff
        den = jnp.sum(num, axis=1, keepdims=True)
        alpha = num / den
        if phase.startswith("softmax"):
            o_ref[0, :, h * d:(h + 1) * d] = alpha[:, :d]
            continue
        xh_h = xh_ref[0][:, h * d:(h + 1) * d]
        o_ref[0, :, h * d:(h + 1) * d] = jnp.dot(
            alpha, xh_h, preferred_element_type=jnp.float32)
        if phase.startswith("full"):
            m_ref[0, :, h:h + 1] = mh
            den_ref[0, :, h:h + 1] = den


def _gb_kernel(ti_ref, tjt_ref, counts_ref, xh_ref, o_ref, m_ref, den_ref,
               *, heads, d, gb):
    """full_pret math over a [gb, N, N] block of graphs per program."""
    n = counts_ref.shape[1]
    eye = _eye(n, jnp.float32)
    for b in range(gb):
        counts = counts_ref[b].astype(jnp.float32)
        ceff = jnp.where(eye, 1.0, counts)
        allowed = ceff > 0
        ti = ti_ref[b]
        tjt = tjt_ref[b]
        for h in range(heads):
            pre = ti[:, h:h + 1] + tjt[h:h + 1, :]
            s = jnp.where(allowed, _leaky(pre), _BIG_NEG)
            mh = jnp.max(s, axis=1, keepdims=True)
            num = jnp.exp(s - mh) * ceff
            den = jnp.sum(num, axis=1, keepdims=True)
            alpha = num / den
            xh_h = xh_ref[b][:, h * d:(h + 1) * d]
            o_ref[b, :, h * d:(h + 1) * d] = jnp.dot(
                alpha, xh_h, preferred_element_type=jnp.float32)
            m_ref[b, :, h:h + 1] = mh
            den_ref[b, :, h:h + 1] = den


def _call_gb(gb, ti, tj, counts, xh_flat):
    n = ti.shape[1]
    heads = ti.shape[2]
    hd = xh_flat.shape[-1]
    d = hd // heads
    tjt = jnp.swapaxes(tj, 1, 2)
    blk = lambda shape: pl.BlockSpec(
        shape, lambda b: (b,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    kern = functools.partial(_gb_kernel, heads=heads, d=d, gb=gb)
    out, m, den = pl.pallas_call(
        kern,
        grid=(ti.shape[0] // gb,),
        in_specs=[blk((gb, n, heads)), blk((gb, heads, n)),
                  blk((gb, n, n)), blk((gb, n, hd))],
        out_specs=[blk((gb, n, hd)), blk((gb, n, heads)),
                   blk((gb, n, heads))],
        out_shape=[
            jax.ShapeDtypeStruct(xh_flat.shape, jnp.float32),
            jax.ShapeDtypeStruct(ti.shape, jnp.float32),
            jax.ShapeDtypeStruct(ti.shape, jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(ti, tjt, counts, xh_flat)
    return out


def _call(phase, ti, tj, counts, xh_flat):
    if phase.startswith("gb"):
        return _call_gb(int(phase[2:]), ti, tj, counts, xh_flat)
    n = ti.shape[1]
    heads = ti.shape[2]
    hd = xh_flat.shape[-1]
    d = hd // heads
    tjt = jnp.swapaxes(tj, 1, 2)   # [B, heads, N] (XLA-side transpose)
    blk = lambda shape: pl.BlockSpec(
        shape, lambda b: (b,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, heads=heads, d=d, phase=phase)
    out, m, den = pl.pallas_call(
        kern,
        grid=(ti.shape[0],),
        in_specs=[blk((1, n, heads)), blk((1, n, heads)),
                  blk((1, heads, n)), blk((1, n, n)), blk((1, n, hd))],
        out_specs=[blk((1, n, hd)), blk((1, n, heads)), blk((1, n, heads))],
        out_shape=[
            jax.ShapeDtypeStruct(xh_flat.shape, jnp.float32),
            jax.ShapeDtypeStruct(ti.shape, jnp.float32),
            jax.ShapeDtypeStruct(ti.shape, jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(ti, tj, tjt, counts, xh_flat)
    return out


def timeit(f, x0, iters=50):
    def step(xv, _):
        return xv + 1e-9 * f(xv), None

    run = jax.jit(lambda xv: jax.lax.scan(step, xv, None, length=iters)[0])
    r = run(x0)
    _ = float(r.ravel()[0])
    t0 = time.perf_counter()
    r = run(x0)
    _ = float(r.ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    xh = jnp.asarray(
        rng.standard_normal((B, N, HEADS * D)).astype(np.float32))
    ti = jnp.asarray(rng.standard_normal((B, N, HEADS)).astype(np.float32))
    tj = jnp.asarray(rng.standard_normal((B, N, HEADS)).astype(np.float32))
    adj = np.zeros((B, N, N), np.float32)
    for b in range(B):
        s = rng.integers(0, N, EDGES_PER_GRAPH)
        r = rng.integers(0, N, EDGES_PER_GRAPH)
        np.add.at(adj, (b, r, s), 1.0)
    adj = jnp.asarray(adj)

    xla_bw_probe()
    for phase in ("noop", "mask_only", "score_only", "score_pret",
                  "softmax_only", "softmax_pret", "matmul", "full",
                  "full_pret", "gb2", "gb4", "gb8"):
        t = timeit(lambda x, p=phase: _call(p, ti, tj, adj, x), xh)
        print(f"{phase:>14}: fwd {t:7.3f} ms", flush=True)


def xla_bw_probe():
    """Plain XLA elementwise pass over the same bytes — device bandwidth."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((B, N, N)).astype(np.float32))

    def f(x):
        return x * 1.0000001

    t = timeit(f, a)
    gb = 2 * a.nbytes / 1e9
    print(f"  xla_copy[B,N,N]: {t:7.3f} ms  ({gb / (t / 1e3):.0f} GB/s)")


if __name__ == "__main__":
    main()
