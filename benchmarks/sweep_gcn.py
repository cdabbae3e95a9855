"""Microbench: dense GCN aggregate variants on the real chip.

Times forward+backward of a 5-conv stack (the causal model's conv budget)
over the bench workload shapes for each formulation, to pick the production
implementation with data instead of guesswork.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

B, N, H = 128, 232, 128


def norm_materialized(x, adj, edge_weight=None):
    n = adj.shape[-1]
    eye = jnp.eye(n, dtype=adj.dtype)
    offdiag = adj * (1.0 - eye)
    m = offdiag if edge_weight is None else offdiag * edge_weight
    deg = m.sum(axis=-2) + 1.0
    dis = jax.lax.rsqrt(deg)
    norm = dis[..., :, None] * m * dis[..., None, :]
    out = jnp.einsum("brs,bsh->brh", norm, x, preferred_element_type=x.dtype)
    return out + x / deg[..., None]


def diag_scaled(x, adj, edge_weight=None):
    n = adj.shape[-1]
    eye = jnp.eye(n, dtype=adj.dtype)
    offdiag = adj * (1.0 - eye)
    m = offdiag if edge_weight is None else offdiag * edge_weight
    deg = m.sum(axis=-2) + 1.0
    dis = jax.lax.rsqrt(deg)
    out = jnp.einsum("brs,bsh->brh", m, dis[..., None] * x,
                     preferred_element_type=x.dtype)
    return dis[..., None] * out + x / deg[..., None]


def diag_scaled_bf16(x, adj, edge_weight=None):
    n = adj.shape[-1]
    eye = jnp.eye(n, dtype=adj.dtype)
    offdiag = adj * (1.0 - eye)
    m = offdiag if edge_weight is None else offdiag * edge_weight
    deg = m.sum(axis=-2) + 1.0
    dis = jax.lax.rsqrt(deg)
    out = jnp.einsum("brs,bsh->brh", m.astype(jnp.bfloat16),
                     (dis[..., None] * x).astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return dis[..., None] * out + x / deg[..., None]


def norm_bf16(x, adj, edge_weight=None):
    n = adj.shape[-1]
    eye = jnp.eye(n, dtype=adj.dtype)
    offdiag = adj * (1.0 - eye)
    m = offdiag if edge_weight is None else offdiag * edge_weight
    deg = m.sum(axis=-2) + 1.0
    dis = jax.lax.rsqrt(deg)
    norm = (dis[..., :, None] * m * dis[..., None, :]).astype(jnp.bfloat16)
    out = jnp.einsum("brs,bsh->brh", norm, x.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return out + x / deg[..., None]


def stack(agg, x, adj, w):
    # 3 unweighted backbone convs + 2 weighted masked convs, like the model
    for _ in range(3):
        x = jax.nn.relu(agg(x, adj))
    a = jax.nn.relu(agg(x, adj, w))
    b = jax.nn.relu(agg(x, adj, 1.0 - w))
    return (a.sum() + b.sum())


def timeit(f, *args, iters=50):
    g = jax.jit(jax.grad(functools.partial(stack, f)))
    out = g(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, H)), jnp.float32)
    adj_np = (rng.random((B, N, N)) < 0.02).astype(np.float32)
    adj = jnp.asarray(adj_np + np.transpose(adj_np, (0, 2, 1)))
    w = jnp.asarray(rng.random((B, N, N)), jnp.float32)

    for name, f in [
        ("norm_materialized(f32)", norm_materialized),
        ("diag_scaled(f32)", diag_scaled),
        ("norm_bf16", norm_bf16),
        ("diag_scaled_bf16", diag_scaled_bf16),
    ]:
        ms = timeit(f, x, adj, w)
        print(f"{name:26s} {ms:7.3f} ms/step(5-conv fwd+bwd)")

    # numeric deltas vs f32 reference
    ref = jax.jit(functools.partial(stack, norm_materialized))(x, adj, w)
    for name, f in [("diag_scaled", diag_scaled),
                    ("norm_bf16", norm_bf16),
                    ("diag_scaled_bf16", diag_scaled_bf16)]:
        v = jax.jit(functools.partial(stack, f))(x, adj, w)
        print(f"rel err {name:18s} {abs(float(v - ref)) / abs(float(ref)):.2e}")


if __name__ == "__main__":
    main()


# Measured on TPU v5e (2026-08-18), full bench.py workload:
#   norm_materialized(f32)  -> 33.6M edges/s  (production choice)
#   diag_scaled(f32)        -> 30.2M edges/s  (consistently ~10% slower in
#                              the full model despite touching less HBM in
#                              isolation — XLA fuses the materialized-norm
#                              elementwise chain into the einsum, while the
#                              post-matmul diagonal scaling breaks fusion
#                              with the downstream BN+ReLU)
# Microbench deltas between variants are within dispatch noise; the full
# model is the only meaningful arbiter. Keeping the materialized form.
