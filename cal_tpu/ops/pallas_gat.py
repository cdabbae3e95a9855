"""Fused flash-style GAT attention kernel (Pallas / Mosaic TPU) — v2.

The XLA dense GAT path (ops/gat.py gat_aggregate_dense) materializes
score/exp/alpha tensors of shape [B, N, N, heads] in HBM; this kernel
processes a block of graphs per grid step entirely in VMEM: scores, softmax
(with duplicate-edge multiplicity and the analytic self loop), attention
dropout, and the alpha @ xh matmuls (MXU) — one HBM read of
(ti, tj, counts, xh) and one write of out.

v2 redesign (r3), driven by benchmarks/sweep_gat_flash_phases.py:
  * the sender score half arrives PRE-TRANSPOSED as ``tjt`` [B, heads, N]
    so the kernel never transposes an [N, 1] column per head (the v1
    ``tj[:, h:h+1].T`` relayout cost ~30% of the kernel);
  * softmax max over allowed cells only (an unmasked max underflows the
    denominator once score spread exceeds f32 exp range — observed as a
    mid-training NaN on SYNHIV); the multiplicity factor ``ceff`` still
    zeroes disallowed numerator terms exactly;
  * ``gb`` graphs per grid step amortize per-program overheads;
  * counts/xh stream in their model dtype (bf16 halves the dominant
    [B, N, N] DMA; counts are small integers, exact in bf16) and are
    widened in VMEM; all accumulation stays f32;
  * gradient outputs for the sender half come out in the transposed
    [B, heads, N] layout (a row store instead of a per-head column
    transpose); XLA fuses the outer transpose for free.

Differentiation: pallas_call has no autodiff — a custom VJP recomputes
alpha in the backward kernel from saved (rowmax, denom) [B, N, h] residuals
(flash-attention structure).  Attention dropout replays bit-identically in
the backward via the same per-graph PRNG seeding and generation order.

Numerics match gat_aggregate_dense (same masking via multiplicity, same
self-loop treatment; max differs by a shift so results agree to float
tolerance, not bit-exactly); parity + grad tests in
tests/test_pallas_gat.py run the kernel in interpreter mode on CPU, and
benchmarks/parity_tpu.py re-checks fwd+grad on real hardware (Mosaic's
PRNG and MXU behave differently there — CLAUDE.md kernel rule).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_SLOPE = 0.2
_BIG_NEG = -1e30


def _leaky(x):
    # max(x, 0.2x) == leaky_relu(x) for slope<1: one mul + one max on the
    # VPU instead of cmp+mul+select — every op here runs over N^2 cells
    return jnp.maximum(x, NEG_SLOPE * x)


def _eye(n):
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return row == col


def _mix_seed(s):
    """Integer hash (xorshift-multiply) before ``prng_seed``: per-graph
    seeds are CONSECUTIVE integers, and a counter-based PRNG seeded with
    adjacent values can emit correlated streams — observed r3 as a ~1-pt
    val-accuracy drop of the in-kernel-dropout path vs the XLA-dropout
    control on the canonical CausalGAT run.  Mixing decorrelates the
    per-graph streams; the backward re-derives the identical seed, so
    replay is unaffected."""
    s = s * jnp.int32(-1640531527)            # 2654435769 as int32 (Knuth)
    s = s ^ (s >> 15)
    s = s * jnp.int32(-2048144789)            # murmur3 fmix constant
    return s ^ (s >> 13)


def _dropout_keep(shape, rate):
    """Keep-mask from the already-seeded kernel PRNG (uint32 threshold).

    Mosaic's ``prng_random_bits`` yields *int32*-typed bits on real TPU
    (interpret mode yields uint32) — compared signed against a uint32
    threshold, the keep rate silently became ~(0.5 - rate/2) instead of
    (1 - rate), which wrecked training (measured: CausalGAT val 52% vs 90%).
    Bitcast to uint32 so the threshold compare is unsigned on both paths."""
    bits = pltpu.prng_random_bits(shape)
    bits = jax.lax.bitcast_convert_type(bits, jnp.uint32)
    thresh = jnp.uint32(int(rate * float(2**32)))
    return bits >= thresh


def _fwd_kernel(seed_ref, ti_ref, tjt_ref, counts_ref, xh_ref,
                o_ref, m_ref, den_ref, *, heads, d, dropout, gb):
    n = counts_ref.shape[1]
    eye = _eye(n)
    p = pl.program_id(0)
    for b in range(gb):
        counts = counts_ref[b].astype(jnp.float32)
        ceff = jnp.where(eye, 1.0, counts)      # self loop multiplicity 1
        if dropout > 0.0:
            pltpu.prng_seed(_mix_seed(seed_ref[0, 0] + p * gb + b))
        allowed = ceff > 0
        ti = ti_ref[b].astype(jnp.float32)      # [N, heads]
        tjt = tjt_ref[b].astype(jnp.float32)    # [heads, N]
        for h in range(heads):
            # the max MUST be over allowed cells only: an unmasked max can
            # land on a non-edge far above every edge score, underflowing
            # the denominator to 0 -> NaN (observed mid-training on SYNHIV
            # once score spread exceeded exp's f32 range).
            pre = _leaky(ti[:, h:h + 1] + tjt[h:h + 1, :])     # [N, N]
            s = jnp.where(allowed, pre, _BIG_NEG)
            mh = jnp.max(s, axis=1, keepdims=True)             # [N, 1]
            num = jnp.exp(s - mh) * ceff
            den = jnp.sum(num, axis=1, keepdims=True)          # [N, 1]
            # reciprocal-multiply: an [N, N] divide is a multi-pass VPU op.
            # (Folding 1/den out of the matmul operand entirely — num @ xh
            # then a row scale — was tried r4 and REVERTED: the MXU rounds
            # operands to bf16 at default precision, and the unnormalized
            # num operand measured 6x worse f32 parity, 3.2e-3 vs 5.7e-4.)
            alpha = num * (1.0 / den)
            if dropout > 0.0:
                # dropout keeps a bare SELECT in the N^2 domain; the
                # keep-scale 1/(1-p) is scalar and rides the output scale
                keep = _dropout_keep((n, n), dropout)
                alpha = jnp.where(keep, alpha, 0.0)
                scale = 1.0 / (1.0 - dropout)
            else:
                scale = None
            xh_h = xh_ref[b][:, h * d:(h + 1) * d].astype(jnp.float32)
            acc = jnp.dot(alpha, xh_h, preferred_element_type=jnp.float32)
            o_ref[b, :, h * d:(h + 1) * d] = (
                acc if scale is None else scale * acc)
            m_ref[b, :, h:h + 1] = mh
            den_ref[b, :, h:h + 1] = den


def _bwd_kernel(seed_ref, ti_ref, tjt_ref, counts_ref, xh_ref, m_ref,
                den_ref, g_ref, dti_ref, dtjt_ref, dxh_ref,
                *, heads, d, dropout, gb):
    n = counts_ref.shape[1]
    eye = _eye(n)
    p = pl.program_id(0)
    for b in range(gb):
        counts = counts_ref[b].astype(jnp.float32)
        ceff = jnp.where(eye, 1.0, counts)
        if dropout > 0.0:
            pltpu.prng_seed(_mix_seed(seed_ref[0, 0] + p * gb + b))
        allowed = ceff > 0
        ti = ti_ref[b].astype(jnp.float32)
        tjt = tjt_ref[b].astype(jnp.float32)
        # the dropout keep-scale 1/(1-p) is a SCALAR factor: every grad
        # below is linear in it, so it is factored out of the N^2 domain
        # and applied to the [N, d] / [N, heads] outputs instead (the
        # select keeps the bare keep-mask — saves two N^2 VPU passes)
        c = 1.0 / (1.0 - dropout) if dropout > 0.0 else 1.0
        for h in range(heads):
            pre = ti[:, h:h + 1] + tjt[h:h + 1, :]
            lpre = jnp.where(allowed, _leaky(pre), _BIG_NEG)   # masked (see
            mh = m_ref[b, :, h:h + 1]                          # fwd kernel)
            den = den_ref[b, :, h:h + 1]
            alpha = jnp.exp(lpre - mh) * (ceff * (1.0 / den))  # pre-dropout
            if dropout > 0.0:
                keep = _dropout_keep((n, n), dropout)          # fwd's bits
                alpha_drop = jnp.where(keep, alpha, 0.0)
            else:
                keep = None
                alpha_drop = alpha
            xh_h = xh_ref[b][:, h * d:(h + 1) * d].astype(jnp.float32)
            g_h = g_ref[b][:, h * d:(h + 1) * d]
            # dXh from the message matmul: c * alpha_drop^T @ g
            dxh = jax.lax.dot_general(
                alpha_drop, g_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dxh_ref[b, :, h * d:(h + 1) * d] = c * dxh if c != 1.0 else dxh
            # dAlpha_drop (un-scaled) = keep-masked g @ xh^T
            dalpha = jax.lax.dot_general(
                g_h, xh_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if keep is not None:
                dalpha = jnp.where(keep, dalpha, 0.0)
            # softmax backward (rows): dS = alpha*(dalpha - sum dalpha*alpha)
            t_sum = jnp.sum(dalpha * alpha, axis=1, keepdims=True)
            ds = alpha * (dalpha - t_sum)      # 0 wherever ceff == 0
            dpre = jnp.where(pre >= 0, ds, NEG_SLOPE * ds)
            dti = jnp.sum(dpre, axis=1, keepdims=True)
            dti_ref[b, :, h:h + 1] = c * dti if c != 1.0 else dti
            # sender-half grad in TRANSPOSED layout: a row store, no .T
            dtjt = jnp.sum(dpre, axis=0, keepdims=True)
            dtjt_ref[b, h:h + 1, :] = c * dtjt if c != 1.0 else dtjt


def _graphs_per_block(batch: int, n: int) -> int:
    """Largest divisor of ``batch`` in {8,4,2,1} whose [gb, N, N] counts
    block keeps the working set comfortably inside VMEM (double-buffered)."""
    cap = max(1, (4 * 1024 * 1024) // max(n * n * 4, 1))
    for g in (8, 4, 2, 1):
        if g <= cap and batch % g == 0:
            return g
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _flash_core(ti, tjt, counts, xh_flat, seed, dropout):
    out, _, _ = _flash_fwd_call(ti, tjt, counts, xh_flat, seed, dropout)
    return out


def _block(spec_shape):
    return pl.BlockSpec(spec_shape, lambda b: (b,) + (0,) * (len(spec_shape) - 1),
                        memory_space=pltpu.VMEM)


def _flash_fwd_call(ti, tjt, counts, xh_flat, seed, dropout):
    B, n, heads = ti.shape
    hd = xh_flat.shape[-1]
    d = hd // heads
    gb = _graphs_per_block(B, n)
    kern = functools.partial(_fwd_kernel, heads=heads, d=d, dropout=dropout,
                             gb=gb)
    out, m, den = pl.pallas_call(
        kern,
        grid=(B // gb,),
        in_specs=[
            # seed rides as a [1, 128] SMEM row (not a scalar [1]): vmap's
            # pallas batching rule must be able to block the batched array
            # [F, 1, 128] as (1, 1, 128) — Mosaic requires the last two
            # block dims to equal the array dims, which a rank-1 scalar
            # operand can't satisfy (fold-parallel training vmaps this call)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _block((gb, n, heads)),
            _block((gb, heads, n)),
            _block((gb, n, n)),
            _block((gb, n, hd)),
        ],
        out_specs=[
            _block((gb, n, hd)),
            _block((gb, n, heads)),
            _block((gb, n, heads)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n, hd), jnp.float32),
            jax.ShapeDtypeStruct((B, n, heads), jnp.float32),
            jax.ShapeDtypeStruct((B, n, heads), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(seed, ti, tjt, counts, xh_flat)
    return out, m, den


def _flash_fwd(ti, tjt, counts, xh_flat, seed, dropout):
    out, m, den = _flash_fwd_call(ti, tjt, counts, xh_flat, seed, dropout)
    return out, (ti, tjt, counts, xh_flat, seed, m, den)


def _flash_bwd(dropout, res, g):
    ti, tjt, counts, xh_flat, seed, m, den = res
    B, n, heads = ti.shape
    hd = xh_flat.shape[-1]
    d = hd // heads
    gb = _graphs_per_block(B, n)
    kern = functools.partial(_bwd_kernel, heads=heads, d=d, dropout=dropout,
                             gb=gb)
    dti, dtjt, dxh = pl.pallas_call(
        kern,
        grid=(B // gb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _block((gb, n, heads)),
            _block((gb, heads, n)),
            _block((gb, n, n)),
            _block((gb, n, hd)),
            _block((gb, n, heads)),
            _block((gb, n, heads)),
            _block((gb, n, hd)),
        ],
        out_specs=[
            _block((gb, n, heads)),
            _block((gb, heads, n)),
            _block((gb, n, hd)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n, heads), jnp.float32),
            jax.ShapeDtypeStruct((B, heads, n), jnp.float32),
            jax.ShapeDtypeStruct((B, n, hd), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(seed, ti, tjt, counts, xh_flat, m, den, g.astype(jnp.float32))
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return (dti.astype(ti.dtype), dtjt.astype(tjt.dtype),
            jnp.zeros_like(counts), dxh.astype(xh_flat.dtype), dseed)


_flash_core.defvjp(_flash_fwd, _flash_bwd)


def flash_gat_dense(
    xh: jax.Array,
    adj: jax.Array,
    att_dst: jax.Array,
    att_src: jax.Array,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
) -> jax.Array:
    """Drop-in replacement for ops.gat.gat_aggregate_dense.

    Args: xh [B, N, heads, d]; adj [B, N, N] (row=receiver, counts; any
    float dtype — streamed to the kernel unconverted, bf16 counts are
    exact for < 256 duplicate edges); att_dst/att_src [heads, d].
    Returns [B, N, heads, d] in xh's dtype.
    """
    B, n, heads, d = xh.shape
    if (dropout_rng is not None and dropout_rate > 0.0
            and jax.default_backend() != "tpu"):
        # interpreter mode cannot lower the TPU PRNG primitives the
        # in-kernel dropout uses — fall back to the XLA reference (CPU CI /
        # smoke runs only; same attention semantics, different dropout bits)
        from cal_tpu.ops.gat import gat_aggregate_dense

        return gat_aggregate_dense(xh, adj, att_dst, att_src,
                                   dropout_rate, dropout_rng)
    ti = jnp.einsum("bnhd,hd->bnh", xh, att_dst).astype(jnp.float32)
    tjt = jnp.einsum("bnhd,hd->bhn", xh, att_src).astype(jnp.float32)
    xh_flat = xh.reshape(B, n, heads * d)
    if dropout_rng is not None and dropout_rate > 0.0:
        seed = jnp.broadcast_to(jax.random.randint(
            dropout_rng, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32),
            (1, 128))
        rate = float(dropout_rate)
    else:
        seed = jnp.zeros((1, 128), jnp.int32)
        rate = 0.0
    out = _flash_core(ti, tjt, adj, xh_flat, seed, rate)
    return out.reshape(B, n, heads, d).astype(xh.dtype)


def flash_gat_dense_flat(
    xh_flat: jax.Array,
    adj: jax.Array,
    att_dst: jax.Array,
    att_src: jax.Array,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
) -> jax.Array:
    """``flash_gat_dense`` without ever materializing the [B, N, heads, d]
    view: the per-head score halves fold into [hd, heads] matrices
    (A[j, h] = att[h, j % d] iff j is in head h's block), so the layer can
    keep xh in its natural [B, N, heads*d] layout end to end — the 4-D
    reshape round trip is a real lane relayout (~0.15 ms/step fwd+bwd at
    bench shapes).  Returns [B, N, heads*d] in xh's dtype."""
    B, n, hd = xh_flat.shape
    heads, d = att_dst.shape
    if (dropout_rng is not None and dropout_rate > 0.0
            and jax.default_backend() != "tpu"):
        from cal_tpu.ops.gat import gat_aggregate_dense

        out = gat_aggregate_dense(
            xh_flat.reshape(B, n, heads, d), adj, att_dst, att_src,
            dropout_rate, dropout_rng)
        return out.reshape(B, n, hd)
    col = jax.lax.broadcasted_iota(jnp.int32, (hd, heads), 0)
    row = jax.lax.broadcasted_iota(jnp.int32, (hd, heads), 1)
    blk = (col // d == row).astype(xh_flat.dtype)          # [hd, heads]
    a_dst = blk * att_dst.reshape(-1)[:, None].astype(xh_flat.dtype)
    a_src = blk * att_src.reshape(-1)[:, None].astype(xh_flat.dtype)
    ti = jnp.dot(xh_flat, a_dst,
                 preferred_element_type=jnp.float32)        # [B, N, heads]
    tjt = jnp.swapaxes(
        jnp.dot(xh_flat, a_src, preferred_element_type=jnp.float32), 1, 2)
    if dropout_rng is not None and dropout_rate > 0.0:
        seed = jnp.broadcast_to(jax.random.randint(
            dropout_rng, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32),
            (1, 128))
        rate = float(dropout_rate)
    else:
        seed = jnp.zeros((1, 128), jnp.int32)
        rate = 0.0
    out = _flash_core(ti, tjt, adj, xh_flat, seed, rate)
    return out.astype(xh_flat.dtype)
