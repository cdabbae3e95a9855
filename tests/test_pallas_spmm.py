"""Block-COO tiled SpMM kernel: forward/grad parity vs the XLA sparse
reference (interpreter mode on the CPU test backend)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cal_tpu.ops.gcn import gcn_aggregate_sparse
from cal_tpu.ops.pallas_spmm import (
    SpmmTiles,
    build_tiles,
    coo_spmm,
    gcn_aggregate_sparse_pallas,
    tile_budget_for,
)

NB = 64  # small node block for interpreter-mode tests
T = 32


def _workload(rng, V=256, E=600, H=16, pad_frac=0.15, self_loops=True):
    senders = rng.integers(0, V, size=E).astype(np.int32)
    receivers = np.sort(rng.integers(0, V, size=E)).astype(np.int32)
    if self_loops:  # a few self loops — their weights must be dropped
        idx = rng.choice(E, size=E // 20, replace=False)
        senders[idx] = receivers[idx]
    edge_mask = np.arange(E) < int(E * (1 - pad_frac))
    x = rng.standard_normal((V, H)).astype(np.float32)
    w = rng.random(E).astype(np.float32)
    return (jnp.asarray(x), jnp.asarray(senders), jnp.asarray(receivers),
            jnp.asarray(edge_mask), jnp.asarray(w))


def _tiles(senders, receivers, V, budget=None):
    tf = build_tiles(np.asarray(senders), np.asarray(receivers), V,
                     node_block=NB, tile_edges=T, tile_budget=budget)
    tb = build_tiles(np.asarray(receivers), np.asarray(senders), V,
                     node_block=NB, tile_edges=T, tile_budget=budget)
    return tf, tb


def test_coo_spmm_matches_segment_sum(rng):
    x, senders, receivers, edge_mask, w = _workload(rng)
    V = x.shape[0]
    coef = jnp.where(edge_mask, w, 0.0)
    ref = jax.ops.segment_sum(coef[:, None] * jnp.take(x, senders, axis=0),
                              receivers, num_segments=V)
    tf, tb = _tiles(senders, receivers, V)
    coef_ext = jnp.concatenate([coef, jnp.zeros(1)])
    out = coo_spmm(x, coef_ext, tf, tb, NB)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_coo_spmm_grads_match(rng):
    x, senders, receivers, edge_mask, w = _workload(rng, V=128, E=300)
    V = x.shape[0]
    coef = jnp.where(edge_mask, w, 0.0)
    tf, tb = _tiles(senders, receivers, V)

    def loss_ref(x, coef):
        m = coef[:, None] * jnp.take(x, senders, axis=0)
        out = jax.ops.segment_sum(m, receivers, num_segments=V)
        return (out ** 2).sum()

    def loss_pl(x, coef):
        coef_ext = jnp.concatenate([coef, jnp.zeros(1)])
        return (coo_spmm(x, coef_ext, tf, tb, NB) ** 2).sum()

    gx_ref, gc_ref = jax.grad(loss_ref, argnums=(0, 1))(x, coef)
    gx_pl, gc_pl = jax.grad(loss_pl, argnums=(0, 1))(x, coef)
    np.testing.assert_allclose(np.asarray(gx_pl), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)
    # padding-edge coef grads are junk in the reference too (masked later);
    # compare live edges only
    live = np.asarray(edge_mask)
    np.testing.assert_allclose(np.asarray(gc_pl)[live],
                               np.asarray(gc_ref)[live],
                               rtol=1e-4, atol=1e-4)


def test_gcn_aggregate_pallas_matches_sparse(rng):
    x, senders, receivers, edge_mask, w = _workload(rng)
    V = x.shape[0]
    tf, tb = _tiles(senders, receivers, V)
    ref = gcn_aggregate_sparse(x, senders, receivers, edge_mask, w)
    out = gcn_aggregate_sparse_pallas(x, senders, receivers, edge_mask,
                                      tf, tb, w, node_block=NB)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gcn_aggregate_pallas_grads(rng):
    x, senders, receivers, edge_mask, w = _workload(rng, V=128, E=300)
    V = x.shape[0]
    tf, tb = _tiles(senders, receivers, V)

    def loss_ref(x, w):
        return (gcn_aggregate_sparse(x, senders, receivers,
                                     edge_mask, w) ** 2).sum()

    def loss_pl(x, w):
        return (gcn_aggregate_sparse_pallas(
            x, senders, receivers, edge_mask, tf, tb, w,
            node_block=NB) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    g_pl = jax.grad(loss_pl, argnums=(0, 1))(x, w)
    live = np.asarray(edge_mask)
    np.testing.assert_allclose(np.asarray(g_pl[0]), np.asarray(g_ref[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_pl[1])[live],
                               np.asarray(g_ref[1])[live],
                               rtol=1e-4, atol=1e-4)


def test_no_edges_at_all(rng):
    """Every out block must still be zero-initialised (empty-tile rule)."""
    V, E, H = 128, 16, 8
    x = jnp.asarray(rng.standard_normal((V, H)).astype(np.float32))
    senders = jnp.zeros(E, jnp.int32)
    receivers = jnp.zeros(E, jnp.int32)
    mask = jnp.zeros(E, bool)
    tf, tb = _tiles(senders, receivers, V)
    coef_ext = jnp.zeros(E + 1)
    out = coo_spmm(x, coef_ext, tf, tb, NB)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_tile_budget_padding(rng):
    """Same numerics when the plan is padded to a larger static budget."""
    x, senders, receivers, edge_mask, w = _workload(rng, V=128, E=200)
    V = x.shape[0]
    coef = jnp.where(edge_mask, w, 0.0)
    coef_ext = jnp.concatenate([coef, jnp.zeros(1)])
    tf0, tb0 = _tiles(senders, receivers, V)
    budget = tile_budget_for(200, V, NB, T)
    assert budget >= tf0.iblk.shape[0]
    tf1, tb1 = _tiles(senders, receivers, V, budget=budget)
    out0 = coo_spmm(x, coef_ext, tf0, tb0, NB)
    out1 = coo_spmm(x, coef_ext, tf1, tb1, NB)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=1e-6, atol=1e-6)


def test_tiles_are_jittable_pytree(rng):
    x, senders, receivers, edge_mask, w = _workload(rng, V=128, E=200)
    V = x.shape[0]
    tf, tb = _tiles(senders, receivers, V)
    coef = jnp.where(edge_mask, w, 0.0)
    coef_ext = jnp.concatenate([coef, jnp.zeros(1)])
    f = jax.jit(lambda x, c, tf, tb: coo_spmm(x, c, tf, tb, NB))
    out = f(x, coef_ext, tf, tb)
    assert out.shape == x.shape
    assert isinstance(tf, SpmmTiles)


@pytest.mark.parametrize("name", ["CausalGCN", "CausalGIN", "GCN", "GIN"])
def test_model_with_tiled_loader_matches_plain(name, graphs):
    """End-to-end: sparse loader with spmm_tiles routes convs through the
    tiled kernel and reproduces the plain sparse path."""
    from cal_tpu.data.loader import Loader, compute_budgets
    from cal_tpu.models.factory import get_model
    from cal_tpu.utils.config import Config

    bs = 8
    budgets = compute_budgets(graphs, bs, "sparse")
    plain = next(iter(Loader(graphs, bs, layout="sparse", budgets=budgets)))
    tiled = next(iter(Loader(graphs, bs, layout="sparse",
                             budgets=dict(budgets), spmm_tiles=True)))
    assert tiled.tiles is not None

    cfg = Config(model=name, hidden=16, layers=2)
    model = get_model(cfg, 0, 3)
    causal = name.startswith("Causal")
    kwargs = {"eval_random": False} if causal else {}
    rngs = {"params": jax.random.PRNGKey(0),
            "intervention": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, plain, train=False, **kwargs)
    ref = model.apply(variables, plain, train=False, **kwargs)
    out = model.apply(variables, tiled, train=False, **kwargs)
    ref = ref if causal else (ref,)
    out = out if causal else (out,)
    for a, b in zip(out, ref):
        # node budgets differ (tiled rounds to the node block) but graph-level
        # outputs must agree
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_bf16_precision_close(rng):
    x, senders, receivers, edge_mask, w = _workload(rng)
    V = x.shape[0]
    ref = gcn_aggregate_sparse(x, senders, receivers, edge_mask, w)
    tf = build_tiles(np.asarray(senders), np.asarray(receivers), V,
                     node_block=NB, tile_edges=T, precision="bf16")
    tb = build_tiles(np.asarray(receivers), np.asarray(senders), V,
                     node_block=NB, tile_edges=T, precision="bf16")
    out = gcn_aggregate_sparse_pallas(x, senders, receivers, edge_mask,
                                      tf, tb, w, node_block=NB)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)
    # and grads still flow
    g = jax.grad(lambda xx: (gcn_aggregate_sparse_pallas(
        xx, senders, receivers, edge_mask, tf, tb, w,
        node_block=NB) ** 2).sum())(x)
    gr = jax.grad(lambda xx: (gcn_aggregate_sparse(
        xx, senders, receivers, edge_mask, w) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=5e-2, atol=5e-2)


# ---------------------------------------------------------------------------
# Multi-head kernel (sparse GAT message aggregation)
# ---------------------------------------------------------------------------


def test_coo_spmm_mh_matches_per_head(rng):
    from cal_tpu.ops.pallas_spmm import coo_spmm_mh

    x, senders, receivers, edge_mask, _ = _workload(rng, V=256, E=600, H=32)
    V, heads, d = x.shape[0], 4, 8
    alpha = jnp.asarray(
        rng.random((600, heads)).astype(np.float32)) * edge_mask[:, None]
    tf, tb = _tiles(senders, receivers, V)
    coef_ext = jnp.concatenate([alpha, jnp.zeros((1, heads))], axis=0)
    out = coo_spmm_mh(x, coef_ext, tf, tb, heads, NB)
    xh = x.reshape(V, heads, d)
    ref = jax.ops.segment_sum(
        alpha[..., None] * jnp.take(xh, senders, axis=0),
        receivers, num_segments=V).reshape(V, heads * d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_coo_spmm_mh_grads_match(rng):
    from cal_tpu.ops.pallas_spmm import coo_spmm_mh

    x, senders, receivers, edge_mask, _ = _workload(rng, V=128, E=300, H=32)
    V, heads, d = x.shape[0], 4, 8
    alpha = jnp.asarray(
        rng.random((300, heads)).astype(np.float32)) * edge_mask[:, None]
    tf, tb = _tiles(senders, receivers, V)
    coef_ext = jnp.concatenate([alpha, jnp.zeros((1, heads))], axis=0)

    def f_kernel(xv, cv):
        return (coo_spmm_mh(xv, cv, tf, tb, heads, NB) ** 2).sum()

    def f_ref(xv, cv):
        xh = xv.reshape(V, heads, d)
        out = jax.ops.segment_sum(
            cv[:-1, :, None] * jnp.take(xh, senders, axis=0),
            receivers, num_segments=V)
        return (out ** 2).sum()

    gx1, gc1 = jax.grad(f_kernel, argnums=(0, 1))(x, coef_ext)
    gx2, gc2 = jax.grad(f_ref, argnums=(0, 1))(x, coef_ext)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gc1)[:-1], np.asarray(gc2)[:-1],
                               rtol=1e-4, atol=1e-4)


def test_gat_sparse_pallas_matches_xla(rng):
    from cal_tpu.ops.gat import (
        gat_aggregate_sparse, gat_aggregate_sparse_pallas)

    x, senders, receivers, edge_mask, _ = _workload(rng, V=256, E=600, H=32)
    V, heads, d = x.shape[0], 4, 8
    xh = x.reshape(V, heads, d)
    att_dst = jnp.asarray(rng.standard_normal((heads, d)).astype(np.float32))
    att_src = jnp.asarray(rng.standard_normal((heads, d)).astype(np.float32))
    tf, tb = _tiles(senders, receivers, V)
    ref = gat_aggregate_sparse(xh, senders, receivers, edge_mask,
                               att_dst, att_src)
    out = gat_aggregate_sparse_pallas(xh, senders, receivers, edge_mask,
                                      att_dst, att_src, tf, tb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # full gradient through scores + softmax + kernel vs pure XLA
    def loss(fn):
        def f(xhv):
            return (fn(xhv) ** 2).sum()
        return f

    g1 = jax.grad(loss(lambda xv: gat_aggregate_sparse_pallas(
        xv, senders, receivers, edge_mask, att_dst, att_src, tf, tb)))(xh)
    g2 = jax.grad(loss(lambda xv: gat_aggregate_sparse(
        xv, senders, receivers, edge_mask, att_dst, att_src)))(xh)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


def test_gat_sparse_pallas_dropout_matches_xla(rng):
    """Same PRNG key => identical dropout masks in both implementations
    (the masks are drawn on the same-[E,h]/[V,h] alpha shapes)."""
    from cal_tpu.ops.gat import (
        gat_aggregate_sparse, gat_aggregate_sparse_pallas)

    x, senders, receivers, edge_mask, _ = _workload(rng, V=128, E=300, H=32)
    V, heads, d = x.shape[0], 4, 8
    xh = x.reshape(V, heads, d)
    att_dst = jnp.asarray(rng.standard_normal((heads, d)).astype(np.float32))
    att_src = jnp.asarray(rng.standard_normal((heads, d)).astype(np.float32))
    tf, tb = _tiles(senders, receivers, V)
    key = jax.random.PRNGKey(7)
    ref = gat_aggregate_sparse(xh, senders, receivers, edge_mask,
                               att_dst, att_src, 0.3, key)
    out = gat_aggregate_sparse_pallas(xh, senders, receivers, edge_mask,
                                      att_dst, att_src, tf, tb, 0.3, key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _gat_fused_setup(rng, V=256, E=600):
    x, senders, receivers, edge_mask, _ = _workload(rng, V=V, E=E, H=32)
    heads, d = 4, 8
    xh = x.reshape(V, heads, d)
    att_dst = jnp.asarray(rng.standard_normal((heads, d)).astype(np.float32))
    att_src = jnp.asarray(rng.standard_normal((heads, d)).astype(np.float32))
    tf = build_tiles(np.asarray(senders), np.asarray(receivers), V,
                     node_block=NB, tile_edges=T,
                     edge_mask=np.asarray(edge_mask))
    tb = build_tiles(np.asarray(receivers), np.asarray(senders), V,
                     node_block=NB, tile_edges=T,
                     edge_mask=np.asarray(edge_mask))
    return xh, senders, receivers, edge_mask, att_dst, att_src, tf, tb


def test_gat_fused_matches_xla(rng):
    """Tile-order fused GAT chain (r5) vs the pure-XLA sparse reference:
    fwd + grads in xh, att_dst, att_src (no dropout)."""
    from cal_tpu.ops.gat import (
        gat_aggregate_sparse, gat_aggregate_sparse_fused)

    (xh, senders, receivers, edge_mask, att_dst, att_src,
     tf, tb) = _gat_fused_setup(rng)
    seed = jnp.zeros((2,), jnp.uint32)

    def ref_fn(xh, ad, asr):
        return gat_aggregate_sparse(xh, senders, receivers, edge_mask,
                                    ad, asr)

    def got_fn(xh, ad, asr):
        return gat_aggregate_sparse_fused(xh, ad, asr, seed, tf, tb,
                                          0.0, NB)

    ref = ref_fn(xh, att_dst, att_src)
    got = got_fn(xh, att_dst, att_src)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    gr = jax.grad(lambda *a: jnp.sum(ref_fn(*a) ** 2),
                  argnums=(0, 1, 2))(xh, att_dst, att_src)
    gg = jax.grad(lambda *a: jnp.sum(got_fn(*a) ** 2),
                  argnums=(0, 1, 2))(xh, att_dst, att_src)
    for a, b in zip(gg, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_gat_fused_dropout_matches_hash_reference(rng):
    """Dropout parity INCLUDING gradients: the [E]-order XLA reference is
    given the SAME counter-hash keep masks the fused chain derives from
    the edge ids, so fwd and grads must agree exactly — this also proves
    the transposed-plan backward recomputes identical masks."""
    from cal_tpu.ops.gat import (
        _head_ids, _keep_mask, gat_aggregate_sparse_fused, segment_sum,
        segment_max, NEG_SLOPE, _BIG_NEG)

    (xh, senders, receivers, edge_mask, att_dst, att_src,
     tf, tb) = _gat_fused_setup(rng, V=128, E=300)
    V, heads, d = xh.shape
    rate = 0.3
    seed = jnp.asarray([123456789, 987654321], jnp.uint32)
    # [E]-order masks from the same hash (edge id = position in the list)
    eids = jnp.arange(senders.shape[0], dtype=jnp.int32)
    emask = _keep_mask(_head_ids(eids, heads), seed, rate, 0) / (1 - rate)
    smask = _keep_mask(
        _head_ids(jnp.arange(V, dtype=jnp.int32), heads), seed, rate,
        1) / (1 - rate)

    def ref_fn(xh, ad, asr):
        ti = jnp.einsum("vhd,hd->vh", xh, ad)
        tj = jnp.einsum("vhd,hd->vh", xh, asr)
        live = edge_mask & (senders != receivers)
        score = jax.nn.leaky_relu(ti[receivers] + tj[senders], NEG_SLOPE)
        score = jnp.where(live[:, None], score, _BIG_NEG)
        self_score = jax.nn.leaky_relu(ti + tj, NEG_SLOPE)
        seg_m = segment_max(score, receivers, V, True)
        m = jnp.maximum(jnp.where(jnp.isfinite(seg_m), seg_m, _BIG_NEG),
                        self_score)
        num_e = jnp.where(live[:, None],
                          jnp.exp(score - m[receivers]), 0.0)
        num_self = jnp.exp(self_score - m)
        denom = segment_sum(num_e, receivers, V, True) + num_self
        alpha_e = num_e / denom[receivers] * emask
        alpha_self = num_self / denom * smask
        msg = alpha_e[..., None] * jnp.take(xh, senders, axis=0)
        return segment_sum(msg, receivers, V, True) \
            + alpha_self[..., None] * xh

    def got_fn(xh, ad, asr):
        return gat_aggregate_sparse_fused(xh, ad, asr, seed, tf, tb,
                                          rate, NB)

    ref = ref_fn(xh, att_dst, att_src)
    got = got_fn(xh, att_dst, att_src)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    gr = jax.grad(lambda *a: jnp.sum(ref_fn(*a) ** 2),
                  argnums=(0, 1, 2))(xh, att_dst, att_src)
    gg = jax.grad(lambda *a: jnp.sum(got_fn(*a) ** 2),
                  argnums=(0, 1, 2))(xh, att_dst, att_src)
    for a, b in zip(gg, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_tile_scatter_max(rng):
    """tile_scatter_max reproduces np maximum.at over live slots; dead
    receivers keep the -1e30 init."""
    from cal_tpu.ops.pallas_spmm import tile_scatter_max

    x, senders, receivers, edge_mask, _ = _workload(rng)
    V = x.shape[0]
    tf = build_tiles(np.asarray(senders), np.asarray(receivers), V,
                     node_block=NB, tile_edges=T,
                     edge_mask=np.asarray(edge_mask))
    k = 3
    live = np.asarray(tf.sglb) < V
    vals = rng.standard_normal((tf.sloc.shape[0], k,
                                tf.sloc.shape[1])).astype(np.float32)
    vals = np.where(live[:, None, :], vals, -1e30)
    got = tile_scatter_max(jnp.asarray(vals), tf, V, node_block=NB)
    want = np.full((k, V), -1e30, np.float32)
    for kk in range(k):
        np.maximum.at(want[kk], np.asarray(tf.rglb)[live],
                      vals[:, kk, :][live])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_sigmoid_fused_matches_materialized(rng):
    """Tile-order fused sigmoid aggregate (r3) vs gcn_aggregate_sparse with
    the weights materialized per edge — fwd + grads in x, src, dst."""
    from cal_tpu.ops.pallas_spmm import gcn_aggregate_sparse_sigmoid_pallas

    x, senders, receivers, edge_mask, _ = _workload(rng)
    V = x.shape[0]
    src = jnp.asarray(rng.standard_normal(V).astype(np.float32))
    dst = jnp.asarray(rng.standard_normal(V).astype(np.float32))
    tf = build_tiles(np.asarray(senders), np.asarray(receivers), V,
                     node_block=NB, tile_edges=T,
                     edge_mask=np.asarray(edge_mask))
    tb = build_tiles(np.asarray(receivers), np.asarray(senders), V,
                     node_block=NB, tile_edges=T,
                     edge_mask=np.asarray(edge_mask))

    for negate in (False, True):
        def ref_fn(x, src, dst):
            w = jax.nn.sigmoid(src[senders] + dst[receivers])
            w = (1.0 - w) if negate else w
            return gcn_aggregate_sparse(x, senders, receivers, edge_mask, w)

        def got_fn(x, src, dst):
            return gcn_aggregate_sparse_sigmoid_pallas(
                x, src, dst, tf, tb, negate, node_block=NB)

        ref = ref_fn(x, src, dst)
        got = got_fn(x, src, dst)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        gr = jax.grad(lambda *a: jnp.sum(ref_fn(*a) ** 2),
                      argnums=(0, 1, 2))(x, src, dst)
        gg = jax.grad(lambda *a: jnp.sum(got_fn(*a) ** 2),
                      argnums=(0, 1, 2))(x, src, dst)
        for a, b in zip(gg, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-5, atol=5e-5)


def test_plain_fused_matches_sparse(rng):
    """Tile-order fused UNWEIGHTED aggregate (r5, backbone convs) vs
    gcn_aggregate_sparse with edge_weight=None — fwd + grad in x."""
    from cal_tpu.ops.pallas_spmm import gcn_aggregate_sparse_plain_pallas

    x, senders, receivers, edge_mask, _ = _workload(rng)
    V = x.shape[0]
    tf = build_tiles(np.asarray(senders), np.asarray(receivers), V,
                     node_block=NB, tile_edges=T,
                     edge_mask=np.asarray(edge_mask))
    tb = build_tiles(np.asarray(receivers), np.asarray(senders), V,
                     node_block=NB, tile_edges=T,
                     edge_mask=np.asarray(edge_mask))

    def ref_fn(x):
        return gcn_aggregate_sparse(x, senders, receivers, edge_mask, None)

    def got_fn(x):
        return gcn_aggregate_sparse_plain_pallas(x, tf, tb, node_block=NB)

    np.testing.assert_allclose(np.asarray(got_fn(x)), np.asarray(ref_fn(x)),
                               rtol=2e-5, atol=2e-5)
    gr = jax.grad(lambda a: jnp.sum(ref_fn(a) ** 2))(x)
    gg = jax.grad(lambda a: jnp.sum(got_fn(a) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gr),
                               rtol=5e-5, atol=5e-5)


def test_tile_gather_scatter_roundtrip(rng):
    """Unit coverage for the tile-plan scalar-plane kernels (r3):
    tile_gather2 fetches per-slot values from both endpoint row-planes;
    tile_scatter2 accumulates per-slot values back into both planes —
    together they must reproduce plain take / scatter-add semantics."""
    from cal_tpu.ops.pallas_spmm import tile_gather2, tile_scatter2

    x, senders, receivers, edge_mask, _ = _workload(rng)
    V = x.shape[0]
    tf = build_tiles(np.asarray(senders), np.asarray(receivers), V,
                     node_block=NB, tile_edges=T,
                     edge_mask=np.asarray(edge_mask))
    a = jnp.asarray(rng.standard_normal((1, V)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((1, V)).astype(np.float32))
    g = tile_gather2(a, b, tf, node_block=NB)          # [n, 2, T]
    live = np.asarray(tf.sglb) < V
    want_a = np.asarray(a)[0][np.minimum(np.asarray(tf.sglb), V - 1)]
    want_b = np.asarray(b)[0][np.minimum(np.asarray(tf.rglb), V - 1)]
    np.testing.assert_allclose(np.asarray(g[:, 0, :])[live], want_a[live],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g[:, 1, :])[live], want_b[live],
                               rtol=1e-6)
    vals = jnp.asarray(
        (rng.standard_normal(tf.sloc.shape) * live).astype(np.float32))
    outa, outb = tile_scatter2(vals[:, None, :], (2.0 * vals)[:, None, :],
                               tf, V, node_block=NB)
    want_sa = np.zeros(V, np.float32)
    np.add.at(want_sa, np.asarray(tf.sglb)[live], np.asarray(vals)[live])
    want_sb = np.zeros(V, np.float32)
    np.add.at(want_sb, np.asarray(tf.rglb)[live],
              2.0 * np.asarray(vals)[live])
    np.testing.assert_allclose(np.asarray(outa)[0], want_sa,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(outb)[0], want_sb,
                               rtol=1e-5, atol=1e-5)


def test_resident_matches_streaming(rng, monkeypatch):
    """The VMEM-resident SpMM/SDDMM variants (r4: whole x pinned in VMEM,
    sender blocks dynamic-sliced) must match the streaming path exactly."""
    from cal_tpu.ops import pallas_spmm as ps

    x, senders, receivers, edge_mask, w = _workload(rng)
    V = x.shape[0]
    coef = jnp.where(edge_mask, w, 0.0)
    tf, tb = _tiles(senders, receivers, V)
    coef_ext = jnp.concatenate([coef, jnp.zeros(1)])
    assert ps._resident_ok(V, x.shape[1], jnp.float32)
    f = lambda x, c: (coo_spmm(x, c, tf, tb, NB) ** 2).sum()
    out_res = coo_spmm(x, coef_ext, tf, tb, NB)
    g_res = jax.grad(f, argnums=(0, 1))(x, coef_ext)
    monkeypatch.setattr(ps, "_RESIDENT_VMEM_BYTES", 0)
    assert not ps._resident_ok(V, x.shape[1], jnp.float32)
    out_str = coo_spmm(x, coef_ext, tf, tb, NB)
    g_str = jax.grad(f, argnums=(0, 1))(x, coef_ext)
    np.testing.assert_allclose(np.asarray(out_res), np.asarray(out_str),
                               rtol=1e-6, atol=1e-6)
    for a, b in zip(g_res, g_str):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_slim_hydrate_matches_eager(rng):
    """build_tiles(slim=True) + hydrate_tiles must reproduce the eager
    plan bit-for-bit (sloc/rloc/sglb/rglb), including masked edges,
    budget-pad slots and budget-pad tiles."""
    from cal_tpu.ops.pallas_spmm import hydrate_tiles

    V, E = 256, 600
    senders = rng.integers(0, V, size=E).astype(np.int32)
    receivers = np.sort(rng.integers(0, V, size=E)).astype(np.int32)
    edge_mask = np.arange(E) < int(E * 0.85)
    budget = tile_budget_for(E, V, NB, T) + 3   # force budget-pad tiles
    for s_arr, r_arr in ((senders, receivers), (receivers, senders)):
        eager = build_tiles(s_arr, r_arr, V, node_block=NB, tile_edges=T,
                            tile_budget=budget, edge_mask=edge_mask)
        slim = build_tiles(s_arr, r_arr, V, node_block=NB, tile_edges=T,
                           tile_budget=budget, edge_mask=edge_mask,
                           slim=True)
        assert slim.sloc is None and slim.sglb is None
        np.testing.assert_array_equal(np.asarray(slim.perm),
                                      np.asarray(eager.perm))
        hyd = hydrate_tiles(slim, jnp.asarray(s_arr), jnp.asarray(r_arr),
                            jnp.asarray(edge_mask), V)
        for f in ("sloc", "rloc", "sglb", "rglb", "iblk", "jblk", "first"):
            np.testing.assert_array_equal(
                np.asarray(getattr(hyd, f)), np.asarray(getattr(eager, f)),
                err_msg=f)


def test_mxu_pool_matches_segment_sum(rng):
    """One-hot MXU pooling (r5, ops/pallas_pool.py) vs segment_sum —
    fwd + grad, trash row sliced, f32 and bf16 inputs."""
    from cal_tpu.ops.pallas_pool import _BLOCK, mxu_pool, pool_supported

    V, H, G = 2 * _BLOCK, 128, 7
    assert pool_supported(V, H)
    bounds = np.sort(rng.choice(np.arange(1, V - 1), G - 1, replace=False))
    ng = np.searchsorted(bounds, np.arange(V), side="right")
    ng[-_BLOCK // 2:] = G                        # padded nodes -> trash row
    ng = jnp.asarray(np.minimum(ng, G).astype(np.int32))
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.standard_normal((V, H)).astype(np.float32)
                        ).astype(dtype)
        ref_fn = lambda x: jax.ops.segment_sum(
            x.astype(jnp.float32), ng, num_segments=G + 1,
            indices_are_sorted=True)[:G]
        got_fn = lambda x: mxu_pool(x, ng, G + 1)[:G]
        tol = 1e-6 if dtype == jnp.float32 else 1e-2
        np.testing.assert_allclose(np.asarray(got_fn(x)),
                                   np.asarray(ref_fn(x)),
                                   rtol=tol, atol=tol)
        gr = jax.grad(lambda a: jnp.sum(ref_fn(a) ** 2))(x)
        gg = jax.grad(lambda a: jnp.sum(got_fn(a) ** 2))(x)
        np.testing.assert_allclose(
            np.asarray(gg, np.float32), np.asarray(gr, np.float32),
            rtol=tol * 10, atol=tol * 10)


def test_sigmoid_pair_matches_two_singles(rng):
    from cal_tpu.ops.pallas_spmm import (
        gcn_aggregate_sparse_sigmoid_pair_pallas,
        gcn_aggregate_sparse_sigmoid_pallas)

    x, senders, receivers, edge_mask, _ = _workload(rng)
    V, H = x.shape
    xo = jnp.asarray(np.asarray(x)[::-1].copy())
    src = jnp.asarray(rng.standard_normal(V).astype(np.float32))
    dst = jnp.asarray(rng.standard_normal(V).astype(np.float32))
    tf = build_tiles(np.asarray(senders), np.asarray(receivers), V,
                     node_block=NB, tile_edges=T,
                     edge_mask=np.asarray(edge_mask))
    tb = build_tiles(np.asarray(receivers), np.asarray(senders), V,
                     node_block=NB, tile_edges=T,
                     edge_mask=np.asarray(edge_mask))
    oc, oo = gcn_aggregate_sparse_sigmoid_pair_pallas(
        x, xo, src, dst, tf, tb, NB)
    ref_c = gcn_aggregate_sparse_sigmoid_pallas(x, src, dst, tf, tb,
                                                False, NB)
    ref_o = gcn_aggregate_sparse_sigmoid_pallas(xo, src, dst, tf, tb,
                                                True, NB)
    np.testing.assert_allclose(np.asarray(oc), np.asarray(ref_c),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(oo), np.asarray(ref_o),
                               rtol=1e-5, atol=1e-5)


def test_sigmoid_pair_grads_match_two_singles(rng):
    from cal_tpu.ops.pallas_spmm import (
        gcn_aggregate_sparse_sigmoid_pair_pallas,
        gcn_aggregate_sparse_sigmoid_pallas)

    x, senders, receivers, edge_mask, _ = _workload(rng, V=128, E=300)
    V, H = x.shape
    xo = jnp.asarray(np.asarray(x)[::-1].copy() * 0.5)
    src = jnp.asarray(rng.standard_normal(V).astype(np.float32))
    dst = jnp.asarray(rng.standard_normal(V).astype(np.float32))
    tf = build_tiles(np.asarray(senders), np.asarray(receivers), V,
                     node_block=NB, tile_edges=T,
                     edge_mask=np.asarray(edge_mask))
    tb = build_tiles(np.asarray(receivers), np.asarray(senders), V,
                     node_block=NB, tile_edges=T,
                     edge_mask=np.asarray(edge_mask))
    # distinct cotangents per branch via asymmetric loss weights
    def loss_pair(xc_, xo_, s_, d_):
        oc, oo = gcn_aggregate_sparse_sigmoid_pair_pallas(
            xc_, xo_, s_, d_, tf, tb, NB)
        return jnp.sum(oc ** 2) + 3.0 * jnp.sum(jnp.abs(oo))

    def loss_single(xc_, xo_, s_, d_):
        oc = gcn_aggregate_sparse_sigmoid_pallas(xc_, s_, d_, tf, tb,
                                                 False, NB)
        oo = gcn_aggregate_sparse_sigmoid_pallas(xo_, s_, d_, tf, tb,
                                                 True, NB)
        return jnp.sum(oc ** 2) + 3.0 * jnp.sum(jnp.abs(oo))

    gp = jax.grad(loss_pair, argnums=(0, 1, 2, 3))(x, xo, src, dst)
    gs = jax.grad(loss_single, argnums=(0, 1, 2, 3))(x, xo, src, dst)
    for a, b, name in zip(gp, gs, ("dxc", "dxo", "dsrc", "ddst")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5, err_msg=name)
