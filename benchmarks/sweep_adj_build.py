"""Dense-adjacency build: XLA sorted 1-D scatter vs Pallas one-hot matmul.

The r3 GAT/GCN step trace showed the per-step ``to_dense`` scatter
(fusion.658) at 1.13 ms — the single biggest op in BOTH causal headline
steps (the [B, N, N] adjacency is rebuilt from the compact edge_flat list
every step).  A one-hot contraction on the MXU should do the same build in
~0.1-0.2 ms: per graph, adj = sum_e onehot_r[e] x onehot_s[e].

Usage: python -m benchmarks.sweep_adj_build
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N = 128, 256
EDGES_PER_GRAPH = 1000
E_BUDGET = 126 * 1024


def _adj_build_kernel(starts_ref, ef_ref, o_ref, *, n, rb, gb):
    """adj[g] = sum over edges of onehot(r) (x) onehot(s).

    ef_ref: [rows, 128] int32 — edge_flat reshaped 2-D (sorted); per graph
    we load ``rb`` rows starting at the row containing the graph's first
    edge and mask out-of-range edges by their flat-index value."""
    p = pl.program_id(0)
    for b in range(gb):
        g = p * gb + b
        start = starts_ref[g]
        row0 = jnp.minimum(start // 128, ef_ref.shape[0] - rb)
        sl = ef_ref[pl.ds(row0, rb), :]                     # [rb, 128]
        local = sl - g * (n * n)
        valid = (local >= 0) & (local < n * n)
        local = jnp.where(valid, local, 0)
        r = local // n
        s = local - r * n
        # fold validity into r: out-of-range edges get r = n, which no iota
        # lane matches -> all-zero one-hot row (3-D bool broadcasts don't
        # lower in Mosaic)
        r = jnp.where(valid, r, n)
        iota = jax.lax.broadcasted_iota(jnp.int32, (rb, 128, n), 2)
        oh_r = (r[:, :, None] == iota).astype(jnp.bfloat16).reshape(
            rb * 128, n)
        oh_s = (s[:, :, None] == iota).astype(jnp.bfloat16).reshape(
            rb * 128, n)
        o_ref[b] = jax.lax.dot_general(
            oh_r, oh_s, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def adj_build_pallas(edge_flat, b, n, eg_budget, dtype, gb=4):
    """edge_flat [E] sorted int32 (padding = b*n*n) -> adj [b, n, n]."""
    e = edge_flat.shape[0]
    rb = eg_budget // 128 + 2
    rows = (e + 127) // 128 + rb
    ef2 = jnp.full((rows * 128,), b * n * n, edge_flat.dtype)
    ef2 = ef2.at[:e].set(edge_flat).reshape(rows, 128)
    bounds = jnp.arange(b, dtype=edge_flat.dtype) * (n * n)
    starts = jnp.searchsorted(edge_flat, bounds).astype(jnp.int32)
    kern = functools.partial(_adj_build_kernel, n=n, rb=rb, gb=gb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // gb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((gb, n, n),
                               lambda p, starts: (p, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, n), dtype),
        interpret=jax.default_backend() != "tpu",
    )(starts, ef2)


def adj_build_xla(edge_flat, b, n, dtype):
    return (jnp.zeros((b * n * n,), dtype)
            .at[edge_flat]
            .add(1.0, mode="drop", indices_are_sorted=True)
            .reshape(b, n, n))


def timeit(f, x0, lo=100, hi=400):
    def total(iters):
        def step(c, _):
            # thread the carry through the edge list so XLA cannot hoist
            # the (otherwise loop-invariant) build out of the scan
            return c + f(c).astype(c.dtype)[0, 0, :1], None

        run = jax.jit(
            lambda xv: jax.lax.scan(step, xv, None, length=iters)[0])
        r = run(x0)
        _ = float(r.ravel()[0])
        t0 = time.perf_counter()
        r = run(x0)
        _ = float(r.ravel()[0])
        return time.perf_counter() - t0

    return (total(hi) - total(lo)) / (hi - lo) * 1e3


def main():
    rng = np.random.default_rng(0)
    flat = []
    for g in range(B):
        r = rng.integers(0, N, EDGES_PER_GRAPH)
        s = rng.integers(0, N, EDGES_PER_GRAPH)
        flat.append((g * N + r) * N + s)
    flat = np.sort(np.concatenate(flat))
    ef = np.full(E_BUDGET, B * N * N, np.int32)
    ef[:len(flat)] = flat
    ef = jnp.asarray(ef)
    eg_budget = 1152

    a_x = adj_build_xla(ef, B, N, jnp.float32)
    a_p = adj_build_pallas(ef, B, N, eg_budget, jnp.float32)
    err = float(jnp.max(jnp.abs(a_x - a_p)))
    print(f"max abs err pallas vs xla: {err}")
    assert err == 0.0, err

    # dummy carry: a [1] f32 vector folded back in to chain iterations
    x0 = jnp.zeros((1,), jnp.float32)
    dep = lambda c: ef + (c[0] * 0.0).astype(ef.dtype)
    for name, fn, dt in (
        ("xla_scatter_f32", lambda c: adj_build_xla(dep(c), B, N, jnp.float32), None),
        ("xla_scatter_bf16", lambda c: adj_build_xla(dep(c), B, N, jnp.bfloat16), None),
        ("pallas_onehot_f32", lambda c: adj_build_pallas(dep(c), B, N, eg_budget, jnp.float32), None),
        ("pallas_onehot_bf16", lambda c: adj_build_pallas(dep(c), B, N, eg_budget, jnp.bfloat16), None),
    ):
        t = timeit(fn, x0)
        print(f"{name:>20}: {t:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
