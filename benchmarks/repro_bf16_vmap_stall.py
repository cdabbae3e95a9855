"""Minimal repro for the bf16 fold-vmap compile stall (r2 weak item 5 /
r3 verdict item 8).

Symptom: the fold-parallel trainer's vmapped program stalls in backend
compilation (>15 min vs ~3 min) when it combines the fused dual
masked-conv Pallas kernel with a bf16 XLA-visible backbone
(train/causal.py workaround).  This script bisects the triad
{vmap, bf16 backbone, dual kernel} on small shapes with a per-variant
compile timer, so the failing combination is pinned by ONE run:

    python -m benchmarks.repro_bf16_vmap_stall [timeout_s]

Each variant compiles fwd+bwd of: backbone matmul chain (XLA, dtype under
test) -> fused_gcn_dense_att_dual (Pallas) -> readout sum, over a leading
fold axis when vmapped.  Wall compile times are printed; a variant that
exceeds the timeout is reported as STALLED (the script moves on).
"""
import multiprocessing as mp
import sys
import time


def _compile_variant(q, use_vmap, dtype_name, use_kernel):
    import jax
    import jax.numpy as jnp
    import numpy as np

    dt = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    B, N, H, FOLDS = 16, 64, 64, 2
    rng = np.random.default_rng(0)
    adj = jnp.asarray((rng.random((B, N, N)) < 0.05).astype(np.float32), dt)
    x0 = jnp.asarray(rng.standard_normal((B, N, H)), dt)
    src = jnp.asarray(rng.standard_normal((B, N)), dt)
    dst = jnp.asarray(rng.standard_normal((B, N)), dt)
    w1 = jnp.asarray(rng.standard_normal((H, H)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((H, H)) * 0.1, jnp.float32)

    def fwd(params, x):
        w1, w2 = params
        # bf16 XLA-visible backbone chain (matmul + relu twice)
        h = jnp.maximum(jnp.dot(x, w1.astype(dt),
                                preferred_element_type=jnp.float32), 0.0)
        h = h.astype(dt)
        h = jnp.maximum(jnp.dot(h, w2.astype(dt),
                                preferred_element_type=jnp.float32), 0.0)
        h = h.astype(dt)
        if use_kernel:
            from cal_tpu.ops.pallas_gcn import fused_gcn_dense_att_dual

            oc, oo = fused_gcn_dense_att_dual(h, h, adj, src, dst)
        else:
            oc, oo = h * 2.0, h * 3.0
        return jnp.sum(oc.astype(jnp.float32)) + jnp.sum(
            oo.astype(jnp.float32))

    def loss(params, x):
        return fwd(params, x)

    grad = jax.grad(loss)
    if use_vmap:
        xs = jnp.stack([x0] * FOLDS)
        ps = jax.tree.map(lambda a: jnp.stack([a] * FOLDS), (w1, w2))
        f = jax.jit(jax.vmap(grad))
        args = (ps, xs)
    else:
        f = jax.jit(grad)
        args = ((w1, w2), x0)
    t0 = time.perf_counter()
    f.lower(*args).compile()
    q.put(time.perf_counter() - t0)


def main():
    timeout = float(sys.argv[1]) if len(sys.argv) > 1 else 300.0
    results = []
    for use_vmap in (False, True):
        for dtype_name in ("f32", "bf16"):
            for use_kernel in (False, True):
                tag = (f"{'vmap' if use_vmap else 'plain'}"
                       f"+{dtype_name}+{'kernel' if use_kernel else 'xla'}")
                q = mp.Queue()
                p = mp.Process(target=_compile_variant,
                               args=(q, use_vmap, dtype_name, use_kernel))
                p.start()
                p.join(timeout)
                if p.is_alive():
                    p.terminate()
                    p.join()
                    print(f"{tag:>22}: STALLED (> {timeout:.0f} s)",
                          flush=True)
                    results.append((tag, None))
                else:
                    dt = q.get() if not q.empty() else float("nan")
                    print(f"{tag:>22}: compiled in {dt:6.1f} s", flush=True)
                    results.append((tag, dt))
    stalled = [t for t, d in results if d is None]
    print("\nstalled variants:", stalled or "none")


if __name__ == "__main__":
    main()
