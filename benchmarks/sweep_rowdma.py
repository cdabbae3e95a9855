"""Row-DMA gather experiment (r4; VERDICT r3 next-round #3).

The block-COO SpMM does its gather as an MXU one-hot matmul; the r3
BASELINE dismissed the alternative — issuing per-row DMAs from HBM — by
citing XLA's measured 78 GB/s gather rate, without building the kernel.
This sweep BUILDS it: a Pallas kernel that walks a tile of row indices and
issues one async HBM->VMEM copy per row (the DMAs queue up and overlap;
the implicit output-block writeback double-buffers across tiles), then
races it against jnp.take and the one-hot-matmul gather on the same
[V=8192, H=128] x [E=131072] workload.

Timing follows CLAUDE.md rules: iterations chained through data, one
scalar fetched at the end, two iteration counts differenced to cancel the
fixed dispatch+fetch round trip.

Usage: python -m benchmarks.sweep_rowdma
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V, E, H = 8192, 131072, 128
T = 512  # rows gathered per grid step


def _rowdma_kernel(idx_ref, x_ref, out_ref, sem):
    """Gather T rows of x (HBM) into the VMEM out block via row DMAs."""
    t = pl.program_id(0)

    def start(k, _):
        pltpu.make_async_copy(
            x_ref.at[idx_ref[t, k]], out_ref.at[k], sem).start()
        return 0

    jax.lax.fori_loop(0, T, start, 0)

    def wait(k, _):
        pltpu.make_async_copy(
            x_ref.at[idx_ref[t, 0]], out_ref.at[0], sem).wait()
        return 0

    jax.lax.fori_loop(0, T, wait, 0)


def rowdma_gather(x, idx):
    """out[e] = x[idx[e]] — per-row DMA design. idx: [E] int32."""
    n_tiles = idx.shape[0] // T
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((T, x.shape[1]), lambda t, i: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _rowdma_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((idx.shape[0], x.shape[1]),
                                       x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(idx.reshape(n_tiles, T), x)


def _onehot(loc, n, dtype):
    iota = jax.lax.broadcasted_iota(jnp.int32, (loc.shape[0], n), 1)
    return (loc[:, None] == iota).astype(dtype)


def _onehot_kernel(loc_ref, x_ref, out_ref, *, nb):
    blk = loc_ref[0, 0, :] // nb   # NOTE: bench indices are block-local
    oh = _onehot(loc_ref[0, 0, :] % nb, nb, jnp.float32)
    del blk
    out_ref[:] = jnp.dot(oh, x_ref[:], preferred_element_type=jnp.float32)


def onehot_gather(x, idx, nb=512):
    """The SpMM design's gather phase in isolation: block-local one-hot
    matmuls (indices pre-sorted into blocks host-side, like build_tiles)."""
    n_tiles = idx.shape[0] // T
    # host: sort each tile's indices into one block (bench uses sorted idx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, T), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, x.shape[1]), lambda t: (t % (V // nb), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, x.shape[1]), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_onehot_kernel, nb=nb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((idx.shape[0], x.shape[1]),
                                       jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(idx.reshape(n_tiles, 1, T) % nb, x)


def timed(fn, x, idx, iters):
    """Chained timing: each iteration feeds a reduction of the previous
    output back into x's first row (serializes; one fetch at the end)."""

    @jax.jit
    def chain(x, idx):
        def body(x, _):
            out = fn(x, idx)
            x = x.at[0, 0].add(out.sum() * 1e-20)
            return x, 0.0

        x, _ = jax.lax.scan(body, x, None, length=iters)
        return x[0, 0]

    r = chain(x, idx)
    float(r)  # compile + warm
    t0 = time.perf_counter()
    r = chain(x, idx)
    float(r)
    return time.perf_counter() - t0


def rate(fn, x, idx, label, iters=(100, 500)):
    t_small = timed(fn, x, idx, iters[0])
    t_big = timed(fn, x, idx, iters[1])
    per_iter = (t_big - t_small) / (iters[1] - iters[0])
    gb = E * H * 4 / 1e9
    print(f"{label:>24}: {per_iter * 1e3:7.3f} ms/gather  "
          f"{gb / per_iter:7.1f} GB/s useful")
    return gb / per_iter


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((V, H)).astype(np.float32))
    idx = jnp.asarray(np.sort(rng.integers(0, V, E)).astype(np.int32))
    ref = jnp.take(x, idx, axis=0)
    got = rowdma_gather(x, idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0,
                               atol=0)
    print("row-DMA gather parity OK")
    rate(lambda x, i: jnp.take(x, i, axis=0), x, idx, "XLA take")
    rate(rowdma_gather, x, idx, "row-DMA kernel")
    rate(onehot_gather, x, idx, "one-hot MXU (local idx)")
    print(f"{'speed of light':>24}: {'':7} ms/gather  {819.0:7.1f} GB/s "
          f"(v5e HBM peak; floor = read rows once)")


if __name__ == "__main__":
    main()
