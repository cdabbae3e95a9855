"""On-TPU (Mosaic-compiled) parity for the Pallas kernels vs XLA paths.

The CI test suite runs the kernels in *interpreter* mode on the CPU mesh,
which can hide hardware-only divergences (e.g. Mosaic's prng_random_bits
yielding signed int32 — a bug interpret-mode tests could never catch; see
cal_tpu/ops/pallas_gat.py ``_dropout_keep``).  Run this module on the real
chip after touching any kernel: ``python -m benchmarks.parity_tpu``.

Checks forward + full gradients with max-abs tolerances:
  * flash-GAT (ops/pallas_gat.py) vs gat_aggregate_dense, incl. dropout
    statistics (keep-rate / mean preservation, replay determinism);
  * block-COO tiled SpMM (ops/pallas_spmm.py) vs gcn_aggregate_sparse,
    incl. the SDDMM edge-weight gradient.
"""
import jax
import jax.numpy as jnp
import numpy as np

from cal_tpu.ops.gat import gat_aggregate_dense
from cal_tpu.ops.gcn import gcn_aggregate_sparse
from cal_tpu.ops.pallas_gat import flash_gat_dense
from cal_tpu.ops.pallas_spmm import (
    NODE_BLOCK, TILE_EDGES, build_tiles, gcn_aggregate_sparse_pallas,
    tile_budget_for)

FAILS = []


def check(name, got, want, tol):
    got, want = np.asarray(got), np.asarray(want)
    err = float(np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-12))
    status = "ok" if err <= tol else "FAIL"
    if err > tol:
        FAILS.append(name)
    print(f"  {name:28s} rel-max-err {err:.2e}  ({status}, tol {tol:g})")


def gat_parity():
    print("flash-GAT vs gat_aggregate_dense (f32):")
    rng = np.random.default_rng(0)
    B, N, heads, d = 8, 232, 4, 32
    xh = jnp.asarray(rng.standard_normal((B, N, heads, d)), jnp.float32)
    adj_np = (rng.random((B, N, N)) < 0.02).astype(np.float32)
    adj = jnp.asarray(adj_np + adj_np.transpose(0, 2, 1))
    att_dst = jnp.asarray(rng.standard_normal((heads, d)), jnp.float32) * 0.1
    att_src = jnp.asarray(rng.standard_normal((heads, d)), jnp.float32) * 0.1

    ref = jax.jit(gat_aggregate_dense)(xh, adj, att_dst, att_src)
    got = jax.jit(flash_gat_dense)(xh, adj, att_dst, att_src)
    check("fwd", got, ref, 2e-3)

    lr = lambda xh, ad, as_: jnp.sum(gat_aggregate_dense(xh, adj, ad, as_) ** 2)
    lf = lambda xh, ad, as_: jnp.sum(flash_gat_dense(xh, adj, ad, as_) ** 2)
    gr = jax.jit(jax.grad(lr, argnums=(0, 1, 2)))(xh, att_dst, att_src)
    gf = jax.jit(jax.grad(lf, argnums=(0, 1, 2)))(xh, att_dst, att_src)
    for nm, a, b in zip(("grad dxh", "grad datt_dst", "grad datt_src"), gr, gf):
        check(nm, b, a, 2e-3)

    # dropout statistics (rate 0.2 -> keep 0.8, inverted scaling keeps mean)
    k = jax.random.PRNGKey(3)
    gotd = jax.jit(lambda *a: flash_gat_dense(*a, 0.2, k))(
        xh, adj, att_dst, att_src)
    ratio = float(jnp.sum(gotd) / jnp.sum(ref))
    ok = 0.9 < ratio < 1.1
    if not ok:
        FAILS.append("dropout mean ratio")
    print(f"  {'dropout mean ratio':28s} {ratio:.4f}  "
          f"({'ok' if ok else 'FAIL'}, want ~1)")
    ld = lambda xh: jnp.sum(flash_gat_dense(xh, adj, att_dst, att_src, 0.2, k) ** 2)
    g1 = jax.jit(jax.grad(ld))(xh)
    g2 = jax.jit(jax.grad(ld))(xh)
    check("dropout grad replay", g2, g1, 0.0)


def gcn_dense_parity():
    print("fused dense GCN vs gcn_aggregate_dense (f32 + bf16):")
    from cal_tpu.ops.gcn import gcn_aggregate_dense
    from cal_tpu.ops.pallas_gcn import (
        SigmoidEdgeWeight, fused_gcn_dense, fused_gcn_dense_att)

    rng = np.random.default_rng(2)
    B, N, H = 8, 248, 128
    adj_np = (rng.random((B, N, N)) < 0.02).astype(np.float32)
    adj_np += (rng.random((B, N, N)) < 0.002)       # duplicate edges
    adj_np[B - 1] = 0.0                             # padded graph slot
    adj = jnp.asarray(adj_np)
    x = jnp.asarray(rng.standard_normal((B, N, H)), jnp.float32)
    src = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
    dst = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)

    check("unweighted fwd", jax.jit(fused_gcn_dense)(x, adj),
          jax.jit(lambda x: gcn_aggregate_dense(x, adj))(x), 1e-5)
    gr = jax.jit(jax.grad(lambda x: jnp.sum(gcn_aggregate_dense(x, adj) ** 2)))(x)
    gf = jax.jit(jax.grad(lambda x: jnp.sum(fused_gcn_dense(x, adj) ** 2)))(x)
    check("unweighted grad dx", gf, gr, 1e-5)

    for negate in (False, True):
        tag = "1-sig" if negate else "sig"
        lr = lambda x, s, d: jnp.sum(gcn_aggregate_dense(
            x, adj, SigmoidEdgeWeight(s, d, negate=negate).materialize()) ** 2)
        lf = lambda x, s, d: jnp.sum(
            fused_gcn_dense_att(x, adj, s, d, negate) ** 2)
        check(f"att({tag}) fwd",
              jax.jit(lambda x, s, d: fused_gcn_dense_att(x, adj, s, d, negate))(x, src, dst),
              jax.jit(lambda x, s, d: gcn_aggregate_dense(
                  x, adj, SigmoidEdgeWeight(s, d, negate=negate).materialize()))(x, src, dst),
              1e-5)
        gr = jax.jit(jax.grad(lr, argnums=(0, 1, 2)))(x, src, dst)
        gf = jax.jit(jax.grad(lf, argnums=(0, 1, 2)))(x, src, dst)
        # Gradient tolerance on HARDWARE is 1e-2, not the interpret-mode
        # 2e-5 (tests/test_pallas_gcn.py): TPU f32 matmuls run the MXU at
        # default (reduced per-pass) precision, and the kernel's backward
        # contracts in a different grouping than XLA autodiff, so the two
        # agree only to ~3e-3 rel-max.  Forward stays at 1e-5 (identical
        # contraction).  Measured 2026-08-19: 2.6e-3 .. 3.7e-3.
        for nm, a, b in zip((f"att({tag}) dx", f"att({tag}) dsrc",
                             f"att({tag}) ddst"), gr, gf):
            check(nm, b, a, 1e-2)

    # dual-branch kernel (both masked convs fused; ops/pallas_gcn.py)
    from cal_tpu.ops.pallas_gcn import fused_gcn_dense_att_dual

    xo = jnp.tanh(x)
    ref_c = jax.jit(lambda x, s, d: gcn_aggregate_dense(
        x, adj, SigmoidEdgeWeight(s, d, False).materialize()))(x, src, dst)
    ref_o = jax.jit(lambda x, s, d: gcn_aggregate_dense(
        x, adj, SigmoidEdgeWeight(s, d, True).materialize()))(xo, src, dst)
    oc, oo = jax.jit(lambda *a: fused_gcn_dense_att_dual(*a))(
        x, xo, adj, src, dst)
    check("dual fwd (c)", oc, ref_c, 1e-5)
    check("dual fwd (o)", oo, ref_o, 1e-5)
    lrd = lambda xc, xo, s, d: (
        jnp.sum(gcn_aggregate_dense(
            xc, adj, SigmoidEdgeWeight(s, d, False).materialize()) ** 2)
        + jnp.sum(gcn_aggregate_dense(
            xo, adj, SigmoidEdgeWeight(s, d, True).materialize()) ** 2))
    lfd = lambda xc, xo, s, d: (
        jnp.sum(fused_gcn_dense_att_dual(xc, xo, adj, s, d)[0] ** 2)
        + jnp.sum(fused_gcn_dense_att_dual(xc, xo, adj, s, d)[1] ** 2))
    grd = jax.jit(jax.grad(lrd, argnums=(0, 1, 2, 3)))(x, xo, src, dst)
    gfd = jax.jit(jax.grad(lfd, argnums=(0, 1, 2, 3)))(x, xo, src, dst)
    for nm, a, b in zip(("dual dxc", "dual dxo", "dual dsrc", "dual ddst"),
                        grd, gfd):
        check(nm, b, a, 1e-2)   # hardware f32-matmul precision; see above

    # bf16 storage mode (production config): tolerance at bf16 resolution
    xb, ab = x.astype(jnp.bfloat16), adj.astype(jnp.bfloat16)
    ref16 = jax.jit(lambda x: gcn_aggregate_dense(x, ab))(xb)
    got16 = jax.jit(fused_gcn_dense)(xb, ab)
    check("unweighted fwd bf16", got16.astype(np.float32),
          ref16.astype(np.float32), 2e-2)


def spmm_parity():
    print("tiled SpMM vs gcn_aggregate_sparse (f32):")
    rng = np.random.default_rng(1)
    V, E, H = 4096, 65536, 128
    senders = rng.integers(0, V, size=E).astype(np.int32)
    receivers = np.sort(rng.integers(0, V, size=E)).astype(np.int32)
    edge_mask = np.arange(E) < int(E * 0.9)
    x = jnp.asarray(rng.standard_normal((V, H)), jnp.float32)
    w = jnp.asarray(rng.random(E), jnp.float32)
    budget = tile_budget_for(E, V, NODE_BLOCK, TILE_EDGES)
    tf = build_tiles(senders, receivers, V, tile_budget=budget)
    tb = build_tiles(receivers, senders, V, tile_budget=budget)
    s, r, m = (jnp.asarray(senders), jnp.asarray(receivers),
               jnp.asarray(edge_mask))

    ref_fn = lambda x, w: gcn_aggregate_sparse(x, s, r, m, w)
    got_fn = lambda x, w: gcn_aggregate_sparse_pallas(x, s, r, m, tf, tb, w)
    check("fwd", jax.jit(got_fn)(x, w), jax.jit(ref_fn)(x, w), 1e-4)

    lr = lambda x, w: jnp.sum(ref_fn(x, w) ** 2)
    lf = lambda x, w: jnp.sum(got_fn(x, w) ** 2)
    gr = jax.jit(jax.grad(lr, argnums=(0, 1)))(x, w)
    gf = jax.jit(jax.grad(lf, argnums=(0, 1)))(x, w)
    check("grad dx", gf[0], gr[0], 1e-4)
    check("grad dw (SDDMM)", gf[1], gr[1], 1e-4)


def gat_sparse_parity():
    print("multi-head tiled SpMM (sparse GAT) vs gat_aggregate_sparse (f32):")
    from cal_tpu.ops.gat import gat_aggregate_sparse, gat_aggregate_sparse_pallas

    rng = np.random.default_rng(4)
    V, E, heads, d = 4096, 65536, 4, 32
    senders = rng.integers(0, V, size=E).astype(np.int32)
    receivers = np.sort(rng.integers(0, V, size=E)).astype(np.int32)
    edge_mask = np.arange(E) < int(E * 0.9)
    xh = jnp.asarray(rng.standard_normal((V, heads, d)), jnp.float32)
    att_dst = jnp.asarray(rng.standard_normal((heads, d)), jnp.float32) * 0.1
    att_src = jnp.asarray(rng.standard_normal((heads, d)), jnp.float32) * 0.1
    budget = tile_budget_for(E, V, NODE_BLOCK, TILE_EDGES)
    tf = build_tiles(senders, receivers, V, tile_budget=budget)
    tb = build_tiles(receivers, senders, V, tile_budget=budget)
    s, r, m = (jnp.asarray(senders), jnp.asarray(receivers),
               jnp.asarray(edge_mask))

    ref_fn = lambda xh: gat_aggregate_sparse(xh, s, r, m, att_dst, att_src)
    got_fn = lambda xh: gat_aggregate_sparse_pallas(
        xh, s, r, m, att_dst, att_src, tf, tb)
    check("fwd", jax.jit(got_fn)(xh), jax.jit(ref_fn)(xh), 1e-4)

    gr = jax.jit(jax.grad(lambda xh: jnp.sum(ref_fn(xh) ** 2)))(xh)
    gf = jax.jit(jax.grad(lambda xh: jnp.sum(got_fn(xh) ** 2)))(xh)
    # grad flows through the mh-SDDMM dcoef -> softmax -> scores chain;
    # hardware f32 MXU precision tolerance as for the other kernels
    check("grad dxh", gf, gr, 1e-2)

    k = jax.random.PRNGKey(9)
    refd = jax.jit(lambda xh: gat_aggregate_sparse(
        xh, s, r, m, att_dst, att_src, 0.2, k))(xh)
    gotd = jax.jit(lambda xh: gat_aggregate_sparse_pallas(
        xh, s, r, m, att_dst, att_src, tf, tb, 0.2, k))(xh)
    check("dropout fwd (same key)", gotd, refd, 1e-4)


def adj_build_parity():
    """One-hot MXU adjacency build (ops/pallas_adj.py) vs the XLA sorted
    scatter — integer counts must match EXACTLY (tol 0)."""
    print("adj_build vs XLA scatter:")
    from cal_tpu.ops.pallas_adj import adj_build

    B, N, EG = 128, 256, 1152
    rng = np.random.default_rng(5)
    flat = []
    for g in range(B - 1):                      # last slot padded (empty)
        e = rng.integers(1, EG - 1)
        r = rng.integers(0, N, e)
        s = rng.integers(0, N, e)
        flat.append((g * N + r) * N + s)
    flat = np.sort(np.concatenate(flat))
    ef = np.full(128 * 1024, B * N * N, np.int32)
    ef[:len(flat)] = flat
    ef = jnp.asarray(ef)
    want = (jnp.zeros((B * N * N,), jnp.float32).at[ef]
            .add(1.0, mode="drop", indices_are_sorted=True).reshape(B, N, N))
    got = jax.jit(lambda e: adj_build(e, B, N, EG, jnp.float32))(ef)
    check("counts f32 (exact)", got, want, 0.0)
    got16 = jax.jit(lambda e: adj_build(e, B, N, EG, jnp.bfloat16))(ef)
    check("counts bf16 (exact)", np.asarray(got16, np.float32), want, 0.0)


def edge_gat_parity():
    """Edge-formulated dense-layout GAT (ops/pallas_gat_sparse.py) vs the
    XLA dense reference — fwd + grads + in-kernel dropout statistics."""
    print("edge-GAT (edge-formulated dense) vs gat_aggregate_dense:")
    from cal_tpu.ops.pallas_gat_sparse import edge_gat_dense

    B, N, H, D, EG = 64, 128, 4, 32, 256
    rng = np.random.default_rng(11)
    flat = []
    for g in range(B - 1):
        e = rng.integers(8, EG - 16)
        r = rng.integers(0, N - 4, e)
        s = rng.integers(0, N - 4, e)
        flat.append((g * N + r) * N + s)
    flat = np.sort(np.concatenate(flat))
    ef = np.full(B * EG, B * N * N, np.int32)
    ef[:len(flat)] = flat
    adj = np.zeros((B * N * N,), np.float32)
    np.add.at(adj, ef[ef < B * N * N], 1.0)
    adj = jnp.asarray(adj.reshape(B, N, N))
    ef = jnp.asarray(ef)
    xh = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    att_dst = jnp.asarray(rng.standard_normal((H, D)) * 0.3, jnp.float32)
    att_src = jnp.asarray(rng.standard_normal((H, D)) * 0.3, jnp.float32)

    # NOTE on tolerance: the XLA reference itself runs its f32 einsums at
    # the MXU's DEFAULT (bf16-rounded) precision on hardware, so even an
    # exact kernel only agrees to ~3e-3 rel-max (same story as the fused
    # GCN grads above; interpret-mode pytest holds 2e-5).
    ref = jax.jit(lambda x: gat_aggregate_dense(x, adj, att_dst, att_src))
    got = jax.jit(lambda x: edge_gat_dense(x, ef, EG, att_dst, att_src))
    check("fwd f32", got(xh), ref(xh), 1e-2)
    gr = jax.jit(jax.grad(lambda x: jnp.sum(ref(x) ** 2)))(xh)
    gf = jax.jit(jax.grad(lambda x: jnp.sum(got(x) ** 2)))(xh)
    check("grad dxh f32", gf, gr, 1e-2)
    got16 = jax.jit(lambda x: edge_gat_dense(
        x.astype(jnp.bfloat16), ef, EG, att_dst.astype(jnp.bfloat16),
        att_src.astype(jnp.bfloat16)))
    check("fwd bf16", np.asarray(got16(xh), np.float32), ref(xh), 0.05)
    k = jax.random.PRNGKey(3)
    gotd = jax.jit(lambda x: edge_gat_dense(
        x, ef, EG, att_dst, att_src, 0.2, k))(xh)
    ratio = float(np.mean(np.abs(gotd)) / np.mean(np.abs(got(xh))))
    ok = 0.8 < ratio < 1.25
    if not ok:
        FAILS.append("edge-gat dropout mean")
    print(f"  {'dropout mean ratio':28s} {ratio:.4f}  "
          f"({'ok' if ok else 'FAIL'}, want ~1)")
    gd1 = jax.jit(jax.grad(lambda x: jnp.sum(edge_gat_dense(
        x, ef, EG, att_dst, att_src, 0.2, k) ** 2)))(xh)
    gd2 = jax.jit(jax.grad(lambda x: jnp.sum(edge_gat_dense(
        x, ef, EG, att_dst, att_src, 0.2, k) ** 2)))(xh)
    check("dropout grad replay", gd1, gd2, 0.0)


def spmm_sigmoid_fused_parity():
    """Tile-order fused sigmoid aggregate (r3) vs materialized-weight
    segment path — fwd + grads in x/src/dst, f32 and bf16 tile modes."""
    print("tile-order fused sigmoid SpMM vs gcn_aggregate_sparse:")
    from cal_tpu.ops.pallas_spmm import (
        NODE_BLOCK, TILE_EDGES, build_tiles,
        gcn_aggregate_sparse_sigmoid_pallas, tile_budget_for)

    v, e, h = 2048, 8192, 128
    rng = np.random.default_rng(7)
    senders = rng.integers(0, v, size=e)
    receivers = np.sort(rng.integers(0, v, size=e))
    edge_mask = np.arange(e) < int(e * 0.9)
    x = jnp.asarray(rng.standard_normal((v, h)), jnp.float32)
    src = jnp.asarray(rng.standard_normal(v), jnp.float32)
    dst = jnp.asarray(rng.standard_normal(v), jnp.float32)
    s_j, r_j, m_j = (jnp.asarray(senders, jnp.int32),
                     jnp.asarray(receivers, jnp.int32),
                     jnp.asarray(edge_mask))
    budget = tile_budget_for(e, v, NODE_BLOCK, TILE_EDGES)

    def ref_fn(x, src, dst):
        w = jax.nn.sigmoid(src[s_j] + dst[r_j])
        return gcn_aggregate_sparse(x, s_j, r_j, m_j, w)

    for prec, ftol, gtol in (("f32", 1e-4, 1e-2), ("bf16", 2e-2, 5e-2)):
        tf = build_tiles(senders, receivers, v, tile_budget=budget,
                         precision=prec, edge_mask=edge_mask)
        tb = build_tiles(receivers, senders, v, tile_budget=budget,
                         precision=prec, edge_mask=edge_mask)

        def got_fn(x, src, dst):
            return gcn_aggregate_sparse_sigmoid_pallas(x, src, dst, tf, tb)

        check(f"fwd [{prec}]", jax.jit(got_fn)(x, src, dst),
              jax.jit(ref_fn)(x, src, dst), ftol)
        gr = jax.jit(jax.grad(lambda *a: jnp.sum(ref_fn(*a) ** 2),
                              argnums=(0, 1, 2)))(x, src, dst)
        gg = jax.jit(jax.grad(lambda *a: jnp.sum(got_fn(*a) ** 2),
                              argnums=(0, 1, 2)))(x, src, dst)
        for name, a, b in zip(("dx", "dsrc", "ddst"), gg, gr):
            check(f"grad {name} [{prec}]", a, b, gtol)


def plain_fused_parity():
    """Tile-order fused UNWEIGHTED aggregate (r5, backbone convs) vs the
    segment path — fwd + grad, f32 and bf16 tile modes."""
    print("tile-order fused plain SpMM vs gcn_aggregate_sparse:")
    from cal_tpu.ops.pallas_spmm import (
        NODE_BLOCK, TILE_EDGES, build_tiles,
        gcn_aggregate_sparse_plain_pallas, tile_budget_for)

    v, e, h = 2048, 8192, 128
    rng = np.random.default_rng(13)
    senders = rng.integers(0, v, size=e)
    receivers = np.sort(rng.integers(0, v, size=e))
    edge_mask = np.arange(e) < int(e * 0.9)
    x = jnp.asarray(rng.standard_normal((v, h)), jnp.float32)
    s_j, r_j, m_j = (jnp.asarray(senders, jnp.int32),
                     jnp.asarray(receivers, jnp.int32),
                     jnp.asarray(edge_mask))
    budget = tile_budget_for(e, v, NODE_BLOCK, TILE_EDGES)
    ref_fn = lambda x: gcn_aggregate_sparse(x, s_j, r_j, m_j, None)
    for prec, ftol, gtol in (("f32", 1e-4, 1e-2), ("bf16", 2e-2, 5e-2)):
        tf = build_tiles(senders, receivers, v, tile_budget=budget,
                         precision=prec, edge_mask=edge_mask)
        tb = build_tiles(receivers, senders, v, tile_budget=budget,
                         precision=prec, edge_mask=edge_mask)
        got_fn = lambda x: gcn_aggregate_sparse_plain_pallas(x, tf, tb)
        check(f"fwd [{prec}]", jax.jit(got_fn)(x), jax.jit(ref_fn)(x), ftol)
        gr = jax.jit(jax.grad(lambda a: jnp.sum(ref_fn(a) ** 2)))(x)
        gg = jax.jit(jax.grad(lambda a: jnp.sum(got_fn(a) ** 2)))(x)
        check(f"grad dx [{prec}]", gg, gr, gtol)


def gat_fused_chain_parity():
    """Tile-order fused GAT chain (r5) vs the pure-XLA sparse reference —
    fwd + grads (xh, att halves), f32 and bf16 tile modes, plus
    counter-hash dropout statistics and replay determinism."""
    print("tile-order fused GAT chain vs gat_aggregate_sparse:")
    from cal_tpu.ops.gat import gat_aggregate_sparse, gat_aggregate_sparse_fused
    from cal_tpu.ops.pallas_spmm import (
        NODE_BLOCK, TILE_EDGES, build_tiles, tile_budget_for)

    v, e, heads, d = 4096, 65536, 4, 32
    rng = np.random.default_rng(17)
    senders = rng.integers(0, v, size=e)
    receivers = np.sort(rng.integers(0, v, size=e))
    edge_mask = np.arange(e) < int(e * 0.9)
    xh = jnp.asarray(rng.standard_normal((v, heads, d)), jnp.float32)
    att_dst = jnp.asarray(rng.standard_normal((heads, d)), jnp.float32) * 0.1
    att_src = jnp.asarray(rng.standard_normal((heads, d)), jnp.float32) * 0.1
    s_j, r_j, m_j = (jnp.asarray(senders, jnp.int32),
                     jnp.asarray(receivers, jnp.int32),
                     jnp.asarray(edge_mask))
    seed = jnp.asarray([111, 222], jnp.uint32)
    budget = tile_budget_for(e, v, NODE_BLOCK, TILE_EDGES)
    ref_fn = lambda xh, ad, asr: gat_aggregate_sparse(
        xh, s_j, r_j, m_j, ad, asr)
    for prec, ftol, gtol in (("f32", 1e-4, 1e-2), ("bf16", 2e-2, 5e-2)):
        tf = build_tiles(senders, receivers, v, tile_budget=budget,
                         precision=prec, edge_mask=edge_mask)
        tb = build_tiles(receivers, senders, v, tile_budget=budget,
                         precision=prec, edge_mask=edge_mask)
        got_fn = lambda xh, ad, asr: gat_aggregate_sparse_fused(
            xh, ad, asr, seed, tf, tb, 0.0)
        check(f"fwd [{prec}]", jax.jit(got_fn)(xh, att_dst, att_src),
              jax.jit(ref_fn)(xh, att_dst, att_src), ftol)
        gr = jax.jit(jax.grad(lambda *a: jnp.sum(ref_fn(*a) ** 2),
                              argnums=(0, 1, 2)))(xh, att_dst, att_src)
        gg = jax.jit(jax.grad(lambda *a: jnp.sum(got_fn(*a) ** 2),
                              argnums=(0, 1, 2)))(xh, att_dst, att_src)
        for name, a, b in zip(("dxh", "datt_dst", "datt_src"), gg, gr):
            check(f"grad {name} [{prec}]", a, b, gtol)
        if prec == "f32":
            dfn = jax.jit(lambda xh: gat_aggregate_sparse_fused(
                xh, att_dst, att_src, seed, tf, tb, 0.2))
            ratio = float(jnp.sum(dfn(xh))
                          / jnp.sum(jax.jit(got_fn)(xh, att_dst, att_src)))
            ok = 0.9 < ratio < 1.1
            if not ok:
                FAILS.append("fused-gat dropout mean")
            print(f"  {'dropout mean ratio':28s} {ratio:.4f}  "
                  f"({'ok' if ok else 'FAIL'}, want ~1)")
            gd = jax.jit(jax.grad(lambda xh: jnp.sum(dfn(xh) ** 2)))
            check("dropout grad replay", gd(xh), gd(xh), 0.0)


def mxu_pool_parity():
    """One-hot MXU pooling (r5) vs segment_sum — fwd + grad, f32/bf16."""
    print("MXU pool vs segment_sum:")
    from cal_tpu.ops.pallas_pool import _BLOCK, mxu_pool

    v, h, g = 16 * _BLOCK, 128, 129
    rng = np.random.default_rng(19)
    ng_np = np.sort(rng.integers(0, g, size=v)).astype(np.int32)
    ng_np[-_BLOCK:] = g                        # padded nodes -> trash row
    ng = jnp.asarray(ng_np)
    for dtype, ftol, gtol in ((jnp.float32, 1e-6, 1e-5),
                              (jnp.bfloat16, 1e-2, 5e-2)):
        x = jnp.asarray(rng.standard_normal((v, h)), jnp.float32
                        ).astype(dtype)
        ref_fn = lambda x: jax.ops.segment_sum(
            x.astype(jnp.float32), ng, num_segments=g + 1,
            indices_are_sorted=True)[:g]
        got_fn = lambda x: mxu_pool(x, ng, g + 1)[:g]
        tag = "bf16" if dtype == jnp.bfloat16 else "f32"
        check(f"fwd [{tag}]", jax.jit(got_fn)(x), jax.jit(ref_fn)(x), ftol)
        gr = jax.jit(jax.grad(lambda a: jnp.sum(ref_fn(a) ** 2)))(x)
        gg = jax.jit(jax.grad(lambda a: jnp.sum(got_fn(a) ** 2)))(x)
        check(f"grad dx [{tag}]", np.asarray(gg, np.float32),
              np.asarray(gr, np.float32), gtol)


def spmm_sigmoid_pair_parity():
    """Dual-branch pair aggregate (r5) vs two single sigmoid aggregates —
    fwd + grads in xc/xo/src/dst, f32 and bf16 tile modes."""
    print("pair sigmoid SpMM vs two singles:")
    from cal_tpu.ops.pallas_spmm import (
        NODE_BLOCK, TILE_EDGES, build_tiles,
        gcn_aggregate_sparse_sigmoid_pair_pallas,
        gcn_aggregate_sparse_sigmoid_pallas, tile_budget_for)

    v, e, h = 2048, 8192, 128
    rng = np.random.default_rng(23)
    senders = rng.integers(0, v, size=e)
    receivers = np.sort(rng.integers(0, v, size=e))
    edge_mask = np.arange(e) < int(e * 0.9)
    xc = jnp.asarray(rng.standard_normal((v, h)), jnp.float32)
    xo = jnp.asarray(rng.standard_normal((v, h)), jnp.float32)
    src = jnp.asarray(rng.standard_normal(v), jnp.float32)
    dst = jnp.asarray(rng.standard_normal(v), jnp.float32)
    budget = tile_budget_for(e, v, NODE_BLOCK, TILE_EDGES)
    for prec, ftol, gtol in (("f32", 1e-4, 1e-2), ("bf16", 2e-2, 5e-2)):
        tf = build_tiles(senders, receivers, v, tile_budget=budget,
                         precision=prec, edge_mask=edge_mask)
        tb = build_tiles(receivers, senders, v, tile_budget=budget,
                         precision=prec, edge_mask=edge_mask)

        def pair_loss(xc_, xo_, s_, d_):
            oc, oo = gcn_aggregate_sparse_sigmoid_pair_pallas(
                xc_, xo_, s_, d_, tf, tb)
            return jnp.sum(oc ** 2) + 3.0 * jnp.sum(oo ** 2)

        def single_loss(xc_, xo_, s_, d_):
            oc = gcn_aggregate_sparse_sigmoid_pallas(
                xc_, s_, d_, tf, tb, False)
            oo = gcn_aggregate_sparse_sigmoid_pallas(
                xo_, s_, d_, tf, tb, True)
            return jnp.sum(oc ** 2) + 3.0 * jnp.sum(oo ** 2)

        got = jax.jit(lambda *a: gcn_aggregate_sparse_sigmoid_pair_pallas(
            *a, tf, tb))(xc, xo, src, dst)
        ref = (jax.jit(lambda *a: gcn_aggregate_sparse_sigmoid_pallas(
                   a[0], a[2], a[3], tf, tb, False))(xc, xo, src, dst),
               jax.jit(lambda *a: gcn_aggregate_sparse_sigmoid_pallas(
                   a[1], a[2], a[3], tf, tb, True))(xc, xo, src, dst))
        check(f"fwd c [{prec}]", got[0], ref[0], ftol)
        check(f"fwd o [{prec}]", got[1], ref[1], ftol)
        gg = jax.jit(jax.grad(pair_loss, argnums=(0, 1, 2, 3)))(
            xc, xo, src, dst)
        gr = jax.jit(jax.grad(single_loss, argnums=(0, 1, 2, 3)))(
            xc, xo, src, dst)
        for name, a, b in zip(("dxc", "dxo", "dsrc", "ddst"), gg, gr):
            check(f"grad {name} [{prec}]", a, b, gtol)


def main():
    print(f"backend: {jax.default_backend()}")
    gat_parity()
    edge_gat_parity()
    gcn_dense_parity()
    adj_build_parity()
    spmm_parity()
    spmm_sigmoid_fused_parity()
    spmm_sigmoid_pair_parity()
    plain_fused_parity()
    gat_sparse_parity()
    gat_fused_chain_parity()
    mxu_pool_parity()
    if FAILS:
        raise SystemExit(f"PARITY FAILURES: {FAILS}")
    print("all on-TPU kernel parities OK")


if __name__ == "__main__":
    main()
