"""Fused dense GCN aggregation kernel (Pallas / Mosaic TPU).

The XLA dense path (ops/gcn.py ``gcn_aggregate_dense``) materializes the
normalized adjacency ``norm = D^-1/2 (A*W) D^-1/2`` as a [B, N, N] HBM tensor
per conv (write + read), and the causal models additionally materialize the
per-edge attention weights ``sigma(src_s + dst_r)`` as another [B, N, N]
tensor (ops/attention.py).  After the bf16 conversion the train step is
HBM/VPU-bound on exactly these tensors (CLAUDE.md perf notes), so fusing them
away is the remaining headroom.

This kernel processes one graph per grid step entirely in VMEM: it reads the
raw adjacency block ONCE, rebuilds the attention weight from two [N] factor
vectors (a linear on a concat splits into sender+receiver halves — see
ops/attention.py), computes degrees / rsqrt norms on the fly, and runs the
normalized matmul on the MXU.  HBM traffic per conv drops from
~6x [N,N] + 2x [N,H] to 1x [N,N] + 2x [N,H].

Semantics replicated exactly (reference gcn_conv.py:44-70):
  * self loops dropped and re-added with weight 1 (so self weight ignored);
  * ``deg[s] = 1 + sum_r A[r,s] * w[r,s]`` — SENDER degree (gcn_conv.py:66);
  * edge s->r contributes ``deg_r^-1/2 * A_rs * w_rs * deg_s^-1/2 * x_s``;
  * self loop contributes ``x_r / deg_r``.

Differentiation: pallas_call has no autodiff.
  * unweighted / constant-weight case: the op is LINEAR in x with a constant
    (x-independent) norm, so the VJP is the same kernel with the adjacency
    transposed (sender degree stays on the same side);
  * attention-weighted case: a full backward kernel recomputes w/deg from
    (adj, src, dst) and produces dx, dsrc, ddst (the [N,N] intermediate
    gradients never leave VMEM).  Derivation in _att_bwd_kernel.

Parity + grad tests vs the XLA path: tests/test_pallas_gcn.py (interpreter
mode on CPU).  Hardware parity: ``python -m benchmarks.parity_tpu``.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SigmoidEdgeWeight:
    """Factored per-edge weight ``w[b, r, s] = sigma(src[b, s] + dst[b, r])``
    (or ``1 - sigma`` when ``negate``) — the causal edge-attention weights in
    un-materialized form (reference model.py:97-104; softmax over 2 channels
    == sigmoid of the channel difference).  ``src``/``dst``: [B, N]."""

    src: jax.Array
    dst: jax.Array
    negate: bool = dataclasses.field(metadata=dict(static=True), default=False)

    def materialize(self) -> jax.Array:
        """Dense [B, N, N] weights (XLA fallback path)."""
        att = jax.nn.sigmoid(
            self.src[:, None, :].astype(jnp.float32)
            + self.dst[:, :, None].astype(jnp.float32)
        )
        return (1.0 - att if self.negate else att).astype(self.src.dtype)


def _offdiag(n: int) -> jax.Array:
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return row != col


def _norm_fields(m: jax.Array):
    """deg/dis/invdeg from the (masked, weighted) f32 adjacency m[r, s]."""
    deg_row = jnp.sum(m, axis=0, keepdims=True) + 1.0     # [1, N] sender deg
    dis_row = jax.lax.rsqrt(deg_row)                      # [1, N]
    dis_col = dis_row.T                                   # [N, 1]
    invdeg_col = (1.0 / deg_row).T                        # [N, 1]
    return dis_row, dis_col, invdeg_col


def _mm_kernel(adj_ref, x_ref, o_ref, *, cdt, transpose):
    """Unweighted fused norm-matmul: o = D^-.5 M D^-.5 x + x/deg.

    ``transpose`` applies M^T instead (the VJP of the forward), with the
    degree still taken over M's rows (sender side)."""
    a = adj_ref[0].astype(jnp.float32)
    n = a.shape[0]
    m = jnp.where(_offdiag(n), a, 0.0)
    dis_row, dis_col, invdeg_col = _norm_fields(m)
    norm = (m * dis_row) * dis_col
    x = x_ref[0].astype(jnp.float32)
    if transpose:
        y = jax.lax.dot_general(
            norm.astype(cdt), x.astype(cdt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        y = jnp.dot(norm.astype(cdt), x.astype(cdt),
                    preferred_element_type=jnp.float32)
    o_ref[0] = (y + x * invdeg_col).astype(o_ref.dtype)


def _att_weight(a, src_ref, dst_ref, negate):
    src = src_ref[0].astype(jnp.float32)                  # [1, N]
    dst = dst_ref[0].astype(jnp.float32)                  # [N, 1]
    sig = jax.nn.sigmoid(src + dst)                       # [N, N] w[r, s]
    w = 1.0 - sig if negate else sig
    n = a.shape[0]
    m = jnp.where(_offdiag(n), a * w, 0.0)
    return sig, m


def _att_fwd_kernel(adj_ref, x_ref, src_ref, dst_ref, o_ref, *, cdt, negate):
    a = adj_ref[0].astype(jnp.float32)
    _, m = _att_weight(a, src_ref, dst_ref, negate)
    dis_row, dis_col, invdeg_col = _norm_fields(m)
    norm = (m * dis_row) * dis_col
    x = x_ref[0].astype(jnp.float32)
    y = jnp.dot(norm.astype(cdt), x.astype(cdt),
                preferred_element_type=jnp.float32)
    o_ref[0] = (y + x * invdeg_col).astype(o_ref.dtype)


def _att_bwd_kernel(adj_ref, x_ref, src_ref, dst_ref, g_ref,
                    dx_ref, dsrc_ref, ddst_ref, *, cdt, negate):
    """VJP of _att_fwd_kernel.

    With m = A*w (off-diagonal), deg_s = 1 + sum_r m_rs, dis = deg^-1/2:
      out_r = dis_r * u_r + x_r/deg_r,   u_r = sum_s m_rs dis_s x_s
      dx_s   = dis_s * p_s + g_s/deg_s,  p_s = sum_r m_rs dis_r g_r
      dL/ddeg_n = -.5 dis_n^3 (g_n.u_n + p_n.x_n) - (g_n.x_n)/deg_n^2
      dL/dm_rs  = dis_r dis_s (g_r.x_s) + dL/ddeg_s
      dL/dw     = A_offdiag * dL/dm;  dsigma = +/- w'(= sig(1-sig))
      dsrc_s = sum_r dL/dw_rs * dsigma;  ddst_r = sum_s (same).
    All [N, N] intermediates stay in VMEM."""
    a = adj_ref[0].astype(jnp.float32)
    n = a.shape[0]
    sig, m = _att_weight(a, src_ref, dst_ref, negate)
    dis_row, dis_col, invdeg_col = _norm_fields(m)
    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    mc = m.astype(cdt)
    # p = m^T (dis*g): rows indexed by sender s
    p = jax.lax.dot_general(
        mc, (g * dis_col).astype(cdt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx_ref[0] = (p * dis_col + g * invdeg_col).astype(dx_ref.dtype)
    # u = m (dis*x): rows indexed by receiver r (forward recompute)
    u = jnp.dot(mc, (x * dis_col).astype(cdt),
                preferred_element_type=jnp.float32)
    gu = jnp.sum(g * u, axis=1, keepdims=True)            # [N, 1]
    px = jnp.sum(p * x, axis=1, keepdims=True)            # [N, 1]
    gx = jnp.sum(g * x, axis=1, keepdims=True)            # [N, 1]
    t_col = -0.5 * (gu + px) * dis_col * dis_col * dis_col \
        - gx * invdeg_col * invdeg_col                    # dL/ddeg_n [N, 1]
    # G[r, s] = g_r . x_s  (SDDMM on the MXU)
    G = jax.lax.dot_general(
        g.astype(cdt), x.astype(cdt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dm = (G * dis_row) * dis_col + t_col.T                # + dL/ddeg_s
    dw = jnp.where(_offdiag(n), a * dm, 0.0)
    dpre = dw * (sig * (1.0 - sig))
    if negate:
        dpre = -dpre
    dsrc_ref[0] = jnp.sum(dpre, axis=0, keepdims=True).astype(dsrc_ref.dtype)
    ddst_ref[0] = jnp.sum(dpre, axis=1, keepdims=True).astype(ddst_ref.dtype)


def _block(shape):
    return pl.BlockSpec(shape, lambda b: (b,) + (0,) * (len(shape) - 1),
                        memory_space=pltpu.VMEM)


def _interpret():
    return jax.default_backend() != "tpu"


def _mm_call(adj, x, transpose):
    B, n, _ = adj.shape
    h = x.shape[-1]
    kern = functools.partial(_mm_kernel, cdt=x.dtype, transpose=transpose)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[_block((1, n, n)), _block((1, n, h))],
        out_specs=_block((1, n, h)),
        out_shape=jax.ShapeDtypeStruct((B, n, h), x.dtype),
        interpret=_interpret(),
    )(adj, x)


@jax.custom_vjp
def fused_gcn_dense(x, adj):
    """Unweighted normalized GCN aggregate, fused (== gcn_aggregate_dense
    with edge_weight=None).  x: [B, N, H]; adj: [B, N, N] (row=receiver)."""
    return _mm_call(adj, x, transpose=False)


def _mm_fwd(x, adj):
    return _mm_call(adj, x, transpose=False), (adj,)


def _mm_bwd(res, g):
    (adj,) = res
    return _mm_call(adj, g, transpose=True), jnp.zeros_like(adj)


fused_gcn_dense.defvjp(_mm_fwd, _mm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_gcn_dense_att(x, adj, src, dst, negate):
    """Attention-weighted normalized GCN aggregate, fused.

    Weight of edge s->r is ``sigma(src[b,s] + dst[b,r])`` (``1 - sigma`` when
    ``negate``).  == gcn_aggregate_dense(x, adj, SigmoidEdgeWeight(...)
    .materialize()).  Differentiable in x, src, dst."""
    out, _ = _att_fwd(x, adj, src, dst, negate)
    return out


def _att_fwd(x, adj, src, dst, negate):
    B, n, _ = adj.shape
    h = x.shape[-1]
    kern = functools.partial(_att_fwd_kernel, cdt=x.dtype, negate=negate)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[_block((1, n, n)), _block((1, n, h)),
                  _block((1, 1, n)), _block((1, n, 1))],
        out_specs=_block((1, n, h)),
        out_shape=jax.ShapeDtypeStruct((B, n, h), x.dtype),
        interpret=_interpret(),
    )(adj, x, src[:, None, :], dst[:, :, None])
    return out, (x, adj, src, dst)


def _att_bwd(negate, res, g):
    x, adj, src, dst = res
    B, n, _ = adj.shape
    h = x.shape[-1]
    kern = functools.partial(_att_bwd_kernel, cdt=x.dtype, negate=negate)
    dx, dsrc, ddst = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[_block((1, n, n)), _block((1, n, h)),
                  _block((1, 1, n)), _block((1, n, 1)), _block((1, n, h))],
        out_specs=[_block((1, n, h)), _block((1, 1, n)), _block((1, n, 1))],
        out_shape=[
            jax.ShapeDtypeStruct((B, n, h), x.dtype),
            jax.ShapeDtypeStruct((B, 1, n), src.dtype),
            jax.ShapeDtypeStruct((B, n, 1), dst.dtype),
        ],
        interpret=_interpret(),
    )(adj, x, src[:, None, :], dst[:, :, None], g)
    return dx, jnp.zeros_like(adj), dsrc[:, 0, :], ddst[:, :, 0]


fused_gcn_dense_att.defvjp(
    lambda x, adj, src, dst, negate: _att_fwd(x, adj, src, dst, negate),
    _att_bwd,
)


# ---------------------------------------------------------------------------
# Dual-branch kernel: the causal models' context/object masked convs
# (model.py:112-113) share the SAME adjacency and complementary attention
# weights w_c = sigma(src+dst), w_o = 1 - w_c.  Fusing both branches into one
# kernel reads the [N, N] adjacency block from HBM ONCE per (fwd|bwd) instead
# of twice and computes the sigmoid once — the adjacency is the largest
# tensor in the step, so this is a direct HBM-roofline win.
# ---------------------------------------------------------------------------


def _branch_fwd(m, x, cdt):
    dis_row, dis_col, invdeg_col = _norm_fields(m)
    norm = (m * dis_row) * dis_col
    y = jnp.dot(norm.astype(cdt), x.astype(cdt),
                preferred_element_type=jnp.float32)
    return y + x * invdeg_col


def _att_dual_fwd_kernel(adj_ref, xc_ref, xo_ref, src_ref, dst_ref,
                         oc_ref, oo_ref, *, cdt, gb):
    n = adj_ref.shape[1]
    off = _offdiag(n)
    for b in range(gb):
        a = adj_ref[b].astype(jnp.float32)
        src = src_ref[b].astype(jnp.float32)
        dst = dst_ref[b].astype(jnp.float32)
        sig = jax.nn.sigmoid(src + dst)
        a_off = jnp.where(off, a, 0.0)
        mc = a_off * sig
        mo = a_off - mc                  # a_off * (1 - sig)
        oc_ref[b] = _branch_fwd(mc, xc_ref[b].astype(jnp.float32),
                                cdt).astype(oc_ref.dtype)
        oo_ref[b] = _branch_fwd(mo, xo_ref[b].astype(jnp.float32),
                                cdt).astype(oo_ref.dtype)


def _branch_bwd(m, x, g, cdt):
    """Shared per-branch backward algebra (see _att_bwd_kernel docstring).
    Returns (dx, dm) with dm = dL/dm_rs over the off-diagonal support."""
    dis_row, dis_col, invdeg_col = _norm_fields(m)
    mc = m.astype(cdt)
    p = jax.lax.dot_general(
        mc, (g * dis_col).astype(cdt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx = p * dis_col + g * invdeg_col
    u = jnp.dot(mc, (x * dis_col).astype(cdt),
                preferred_element_type=jnp.float32)
    gu = jnp.sum(g * u, axis=1, keepdims=True)
    px = jnp.sum(p * x, axis=1, keepdims=True)
    gx = jnp.sum(g * x, axis=1, keepdims=True)
    t_col = -0.5 * (gu + px) * dis_col * dis_col * dis_col \
        - gx * invdeg_col * invdeg_col
    G = jax.lax.dot_general(
        g.astype(cdt), x.astype(cdt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dm = (G * dis_row) * dis_col + t_col.T
    return dx, dm


def _att_dual_bwd_kernel(adj_ref, xc_ref, xo_ref, src_ref, dst_ref,
                         gc_ref, go_ref,
                         dxc_ref, dxo_ref, dsrc_ref, ddst_ref, *, cdt, gb):
    n = adj_ref.shape[1]
    off = _offdiag(n)
    for b in range(gb):
        a = adj_ref[b].astype(jnp.float32)
        src = src_ref[b].astype(jnp.float32)
        dst = dst_ref[b].astype(jnp.float32)
        sig = jax.nn.sigmoid(src + dst)
        a_off = jnp.where(off, a, 0.0)
        mc = a_off * sig
        mo = a_off - mc
        dxc, dmc = _branch_bwd(mc, xc_ref[b].astype(jnp.float32),
                               gc_ref[b].astype(jnp.float32), cdt)
        dxo, dmo = _branch_bwd(mo, xo_ref[b].astype(jnp.float32),
                               go_ref[b].astype(jnp.float32), cdt)
        dxc_ref[b] = dxc.astype(dxc_ref.dtype)
        dxo_ref[b] = dxo.astype(dxo_ref.dtype)
        # dw_c = a*dmc, dw_o = a*dmo; w_c = sig, w_o = 1-sig =>
        # dpre = (dmc - dmo) * a_off * sig' with sig' = sig*(1-sig)
        dpre = (dmc - dmo) * a_off * (sig * (1.0 - sig))
        dsrc_ref[b] = jnp.sum(dpre, axis=0, keepdims=True).astype(
            dsrc_ref.dtype)
        ddst_ref[b] = jnp.sum(dpre, axis=1, keepdims=True).astype(
            ddst_ref.dtype)


@jax.custom_vjp
def fused_gcn_dense_att_dual(xc, xo, adj, src, dst):
    """Both causal masked convs in one fused kernel.

    == (fused_gcn_dense_att(xc, adj, src, dst, negate=False),
        fused_gcn_dense_att(xo, adj, src, dst, negate=True))
    but the adjacency is read once and the sigmoid computed once.
    xc/xo: [B, N, H]; adj: [B, N, N]; src/dst: [B, N].
    Differentiable in xc, xo, src, dst."""
    out, _ = _att_dual_fwd(xc, xo, adj, src, dst)
    return out


def _dual_gb(batch: int, n: int) -> int:
    """gb=2 measured 15% faster than per-graph at bench shapes (r3); cap
    by the [gb, N, N] block's VMEM footprint like the other kernels."""
    cap = max(1, (2 * 1024 * 1024) // max(n * n * 4, 1))
    for g in (2, 1):
        if g <= cap and batch % g == 0:
            return g
    return 1


def _att_dual_fwd(xc, xo, adj, src, dst):
    B, n, _ = adj.shape
    h = xc.shape[-1]
    gb = _dual_gb(B, n)
    kern = functools.partial(_att_dual_fwd_kernel, cdt=xc.dtype, gb=gb)
    oc, oo = pl.pallas_call(
        kern,
        grid=(B // gb,),
        in_specs=[_block((gb, n, n)), _block((gb, n, h)), _block((gb, n, h)),
                  _block((gb, 1, n)), _block((gb, n, 1))],
        out_specs=[_block((gb, n, h)), _block((gb, n, h))],
        out_shape=[jax.ShapeDtypeStruct((B, n, h), xc.dtype),
                   jax.ShapeDtypeStruct((B, n, h), xo.dtype)],
        interpret=_interpret(),
    )(adj, xc, xo, src[:, None, :], dst[:, :, None])
    return (oc, oo), (xc, xo, adj, src, dst)


def _att_dual_bwd(res, grads):
    xc, xo, adj, src, dst = res
    gc, go = grads
    B, n, _ = adj.shape
    h = xc.shape[-1]
    gb = _dual_gb(B, n)
    kern = functools.partial(_att_dual_bwd_kernel, cdt=xc.dtype, gb=gb)
    dxc, dxo, dsrc, ddst = pl.pallas_call(
        kern,
        grid=(B // gb,),
        in_specs=[_block((gb, n, n)), _block((gb, n, h)), _block((gb, n, h)),
                  _block((gb, 1, n)), _block((gb, n, 1)),
                  _block((gb, n, h)), _block((gb, n, h))],
        out_specs=[_block((gb, n, h)), _block((gb, n, h)),
                   _block((gb, 1, n)), _block((gb, n, 1))],
        out_shape=[
            jax.ShapeDtypeStruct((B, n, h), xc.dtype),
            jax.ShapeDtypeStruct((B, n, h), xo.dtype),
            jax.ShapeDtypeStruct((B, 1, n), src.dtype),
            jax.ShapeDtypeStruct((B, n, 1), dst.dtype),
        ],
        interpret=_interpret(),
    )(adj, xc, xo, src[:, None, :], dst[:, :, None], gc, go)
    return dxc, dxo, jnp.zeros_like(adj), dsrc[:, 0, :], ddst[:, :, 0]


fused_gcn_dense_att_dual.defvjp(
    lambda xc, xo, adj, src, dst: _att_dual_fwd(xc, xo, adj, src, dst),
    _att_dual_bwd,
)
