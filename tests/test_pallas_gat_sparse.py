"""Edge-formulated dense-layout GAT kernel (ops/pallas_gat_sparse.py) vs the
XLA dense reference (ops/gat.py gat_aggregate_dense) — fwd + grads, in
interpreter mode on CPU (hardware parity: benchmarks/parity_tpu.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cal_tpu.ops.gat import gat_aggregate_dense
from cal_tpu.ops.pallas_gat_sparse import edge_gat_dense

B, N, HEADS, D = 4, 24, 4, 8
EG = 64


def _mk(seed=0, dup=True, empty_last=True):
    rng = np.random.default_rng(seed)
    flat = []
    for g in range(B - (1 if empty_last else 0)):
        e = rng.integers(4, EG - 8)
        r = rng.integers(0, N - 2, e)
        s = rng.integers(0, N - 2, e)
        if dup:            # duplicate + self edges (self must be dropped)
            r = np.concatenate([r, r[:2], [3]])
            s = np.concatenate([s, s[:2], [3]])
        flat.append((g * N + r) * N + s)
    flat = np.sort(np.concatenate(flat))
    ef = np.full(B * EG, B * N * N, np.int64)
    ef[: len(flat)] = flat
    xh = rng.standard_normal((B, N, HEADS, D)).astype(np.float32)
    xh[:, N - 2:] = 0.0                        # padded node rows
    att_dst = (rng.standard_normal((HEADS, D)) * 0.3).astype(np.float32)
    att_src = (rng.standard_normal((HEADS, D)) * 0.3).astype(np.float32)
    adj = np.zeros((B * N * N,), np.float32)
    np.add.at(adj, ef[ef < B * N * N], 1.0)
    adj = adj.reshape(B, N, N)
    return (jnp.asarray(ef, jnp.int32), jnp.asarray(xh),
            jnp.asarray(att_dst), jnp.asarray(att_src), jnp.asarray(adj))


def test_fwd_matches_dense():
    ef, xh, ad, asr, adj = _mk()
    want = gat_aggregate_dense(xh, adj, ad, asr)
    got = edge_gat_dense(xh, ef, EG, ad, asr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_grads_match_dense():
    ef, xh, ad, asr, adj = _mk(seed=3)

    def loss_ref(xh, ad, asr):
        return jnp.sum(gat_aggregate_dense(xh, adj, ad, asr) ** 2)

    def loss_got(xh, ad, asr):
        return jnp.sum(edge_gat_dense(xh, ef, EG, ad, asr) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(xh, ad, asr)
    gg = jax.grad(loss_got, argnums=(0, 1, 2))(xh, ad, asr)
    for a, b in zip(gg, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


def test_bf16_mode_close():
    ef, xh, ad, asr, adj = _mk(seed=5)
    want = gat_aggregate_dense(xh, adj, ad, asr)
    got = edge_gat_dense(xh.astype(jnp.bfloat16), ef, EG, ad.astype(
        jnp.bfloat16), asr.astype(jnp.bfloat16))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.05, atol=0.05)


def test_vmap_compiles():
    ef, xh, ad, asr, adj = _mk(seed=7)
    efs = jnp.stack([ef, ef])
    xhs = jnp.stack([xh, xh * 0.5])
    out = jax.vmap(lambda e, x: edge_gat_dense(x, e, EG, ad, asr))(efs, xhs)
    want0 = gat_aggregate_dense(xh, adj, ad, asr)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(want0),
                               rtol=2e-5, atol=2e-5)


def test_large_score_spread_stays_finite():
    """Same regression class as flash-GAT's (r3 SYNHIV NaN): huge score
    spreads must not underflow the softmax denominator."""
    rng = np.random.default_rng(1)
    ef, xh, _, _, adj = _mk(seed=11)
    att_dst = (rng.standard_normal((HEADS, D)) * 40).astype(np.float32)
    att_src = (rng.standard_normal((HEADS, D)) * 40).astype(np.float32)
    out = edge_gat_dense(xh, ef, EG, jnp.asarray(att_dst),
                         jnp.asarray(att_src))
    assert bool(jnp.isfinite(out).all())
    ref = gat_aggregate_dense(xh, adj, jnp.asarray(att_dst),
                              jnp.asarray(att_src))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)
    g = jax.grad(lambda x: jnp.sum(edge_gat_dense(
        x, ef, EG, jnp.asarray(att_dst), jnp.asarray(att_src))))(xh)
    assert bool(jnp.isfinite(g).all())
