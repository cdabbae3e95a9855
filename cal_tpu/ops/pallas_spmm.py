"""Block-COO tiled SpMM kernel (Pallas / Mosaic TPU) — the sparse hot path.

Computes ``out[r] += coef[e] * x[s]`` over a padded edge list — the compute
floor of sparse message passing (reference gcn_conv.py:66 ``scatter_add`` /
PyG ``propagate``) for graphs too large for the dense [B, N, N] layout
(DD max 5748 nodes, REDDIT-BINARY max ~3782).

Why not XLA gather + segment_sum?  Measured on TPU v5e (see
benchmarks/sweep_spmm.py), XLA's row gather runs at ~78 GB/s and the sorted
scatter-add at ~43 GB/s — both >10x off HBM speed-of-light, because each is
a latency-bound stream of 512-byte row DMAs.

TPU-native design: turn BOTH the gather and the scatter into MXU matmuls.
Edges are host-sorted by (receiver-block, sender-block) and packed into
fixed-size tiles of T edges.  Within a tile every sender lives in one
node block j and every receiver in one node block i, so

    gather:  msg  = onehot_send[T, NB] @ x_block[NB, H]      (MXU)
    scatter: out += onehot_recv.T[NB, T] @ (coef * msg)[T, H] (MXU)

where the one-hots are built in-kernel from local indices with a
broadcasted-iota compare (VPU, no HBM traffic).  The grid walks tiles
sorted by i, so the out block is accumulated in VMEM and written back once
per receiver block.  Scalar-prefetched (i, j) arrays drive the x/out block
DMAs (``PrefetchScalarGridSpec``).

Differentiation: pallas_call has no autodiff — a custom VJP runs
  * dx    = same kernel over the *transposed* tiling (roles of sender and
            receiver swapped; host precomputes both tilings), and
  * dcoef = an SDDMM kernel: per tile, rowsum((oh_r @ dout_i) * (oh_s @ x_j)).

Padding protocol (all static shapes):
  * tile slots beyond a tile's live edges have sloc = rloc = 0 and
    perm = E (which indexes an appended zero in ``coef_ext``), so they
    gather/scatter exact zeros;
  * every receiver block gets at least one (possibly empty) tile so its out
    block is initialised; budget-padding tiles target the last block with
    ``first = 0`` and contribute zero.

Numerics match ops/gcn.py gcn_aggregate_sparse exactly; parity + grad tests
in tests/test_pallas_spmm.py run the kernel in interpreter mode on CPU.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Production tile geometry (TPU): 512-node blocks, 512-edge tiles — both
# MXU-friendly.  Tests override with smaller values in interpreter mode.
NODE_BLOCK = 512
TILE_EDGES = 512


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SpmmTiles:
    """Static-shape tile plan for one (senders, receivers) edge structure.

    Attributes (n_tiles = static tile budget, T = edges per tile):
      iblk:  [n_tiles] int32  receiver node-block of each tile (sorted).
      jblk:  [n_tiles] int32  sender node-block of each tile.
      first: [n_tiles] int32  1 iff first tile of its receiver block
                              (kernel zero-initialises the out block).
      sloc:  [n_tiles, T] int32  sender index local to block jblk.
      rloc:  [n_tiles, T] int32  receiver index local to block iblk.
      perm:  [n_tiles, T] int32  edge id of each slot; padding slots = E
                              (index of the appended zero in coef_ext).
      node_block: static — the node-block size this plan was built for.
      precision: static — "f32" (exact, HIGHEST-precision matmuls) or
                 "bf16" (one-hots are exact in bf16; value rounding gives
                 ~1e-3 rel error at 2.8x the measured kernel rate — the
                 production mixed-precision choice).
    """

    iblk: jax.Array
    jblk: jax.Array
    first: jax.Array
    sloc: jax.Array
    rloc: jax.Array
    perm: jax.Array
    node_block: int = dataclasses.field(
        metadata=dict(static=True), default=NODE_BLOCK)
    precision: str = dataclasses.field(
        metadata=dict(static=True), default="f32")
    # optional tile-order GLOBAL endpoint columns (r3): sglb/rglb [n_tiles,T]
    # hold the global sender/receiver id of each slot (padding -> V).  They
    # let the per-edge coefficient chain run directly in tile-slot order, so
    # the fused sigmoid-weighted aggregate never pays the [E]-order
    # coef-permutation gather or the dcoef scatter (measured 1.9 + 2.3 ms
    # of XLA scalar gather/scatter at the V=8192/E=131k bench shape).
    sglb: jax.Array | None = None
    rglb: jax.Array | None = None


def _tile_structure(senders, receivers, num_nodes, node_block, tile_edges):
    """Shared (vectorized) tile-geometry computation.

    Returns (order, rblk, sblk, tile_of_edge, slot_of_edge, tile_i,
    tile_j, tile_first, n_real) where tiles are numbered in the final plan
    order: runs sorted by (receiver-block, sender-block), split into
    ceil(run/T) tiles, with one empty tile inserted for every receiver
    block that has no edges (it zero-initialises the out block)."""
    E = senders.shape[0]
    nb = num_nodes // node_block
    rblk = receivers // node_block
    sblk = senders // node_block
    order = np.lexsort((sblk, rblk))
    key = rblk[order] * np.int64(nb) + sblk[order]
    if E:
        starts = np.concatenate(
            [[0], np.flatnonzero(np.diff(key)) + 1])       # run starts
    else:
        starts = np.zeros((0,), np.int64)
    run_len = np.diff(np.concatenate([starts, [E]]))
    run_i = (key[starts] // nb).astype(np.int64)
    run_j = (key[starts] % nb).astype(np.int64)
    run_tiles = -(-run_len // tile_edges)                  # ceil, >= 1

    # receiver blocks with no runs get one empty tile each
    tiles_per_i = np.bincount(run_i, weights=run_tiles, minlength=nb
                              ).astype(np.int64)
    empty_i = tiles_per_i == 0
    tiles_per_i[empty_i] = 1
    i_base = np.concatenate([[0], np.cumsum(tiles_per_i)])  # per-i tile base
    n_real = int(i_base[-1])

    # global tile index of each run's first tile: i_base[i] + within-i offset
    within = np.zeros_like(run_tiles)
    if run_i.size:
        # runs are sorted by i: cumulative tiles within each i
        cum = np.cumsum(run_tiles) - run_tiles
        i_first_run = np.searchsorted(run_i, run_i)         # first run of i
        within = cum - cum[i_first_run]
    run_tile_base = i_base[run_i] + within

    # per-edge (ordered) tile + slot
    edge_run = np.repeat(np.arange(run_len.size), run_len)
    pos = np.arange(E) - np.repeat(starts, run_len)
    tile_of_edge = run_tile_base[edge_run] + pos // tile_edges
    slot_of_edge = pos % tile_edges

    tile_i = np.zeros(n_real, np.int64)
    tile_j = np.zeros(n_real, np.int64)
    tile_first = np.zeros(n_real, np.int64)
    tile_first[i_base[:-1]] = 1                             # first per i
    tile_i[:] = np.repeat(np.arange(nb), tiles_per_i)
    # sender block per tile: scatter from runs (empty tiles keep j=0)
    rt = np.repeat(run_tile_base, run_tiles) + np.concatenate(
        [np.arange(t) for t in run_tiles]) if run_tiles.size else (
        np.zeros(0, np.int64))
    tile_j[rt] = np.repeat(run_j, run_tiles)
    return (order, rblk, sblk, tile_of_edge, slot_of_edge, tile_i, tile_j,
            tile_first, n_real)


def build_tiles(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    node_block: int = NODE_BLOCK,
    tile_edges: int = TILE_EDGES,
    tile_budget: int | None = None,
    precision: str = "f32",
    device: bool = True,
    edge_mask=None,
    slim: bool = False,
) -> SpmmTiles:
    """Host-side (numpy, fully vectorized — r4: the per-tile python loop
    cost seconds per REDDIT-scale epoch) tile packing.  Structure-only:
    weights/masks enter per-step through ``coef`` so one plan serves every
    step on a batch.  ``device=False`` keeps the plan as NumPy (for
    host-stacked epoch batches that are shipped with one transfer per
    leaf).  ``edge_mask`` (optional [E] bool) marks dead/padding edges:
    their slots keep zero-contributing local indices but get the sentinel
    global id, so the tile-order coefficient chain
    (gcn_aggregate_sparse_sigmoid_pallas) zeroes them without ever
    consulting an [E]-order mask."""
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    E = senders.shape[0]
    mask = (np.ones(E, bool) if edge_mask is None
            else np.asarray(edge_mask, bool))
    assert num_nodes % node_block == 0, (num_nodes, node_block)
    nb = num_nodes // node_block

    (order, rblk, sblk, tile_of_edge, slot_of_edge, tile_i, tile_j,
     tile_first, n_real) = _tile_structure(
        senders, receivers, num_nodes, node_block, tile_edges)

    if tile_budget is None:
        tile_budget = n_real
    assert n_real <= tile_budget, (
        f"tile plan needs {n_real} tiles > budget {tile_budget}")
    n = tile_budget
    T = tile_edges

    iblk = np.full(n, nb - 1, np.int32)        # budget-pad tiles: last block
    jblk = np.zeros(n, np.int32)
    first = np.zeros(n, np.int32)
    iblk[:n_real] = tile_i
    jblk[:n_real] = tile_j
    first[:n_real] = tile_first

    if slim:
        # SLIM plan: ship only perm + per-tile block ids; the [n, T] slot
        # arrays (sloc/rloc/sglb/rglb) are derived ON DEVICE from
        # (perm, jblk/iblk, senders, receivers, edge_mask) by
        # ``hydrate_tiles`` — 5x fewer host->device bytes per epoch.  This
        # matters doubly on the tunneled TPU backend, whose client
        # permanently retains one host copy of every transferred buffer
        # (measured r4: 128 MB RSS growth per 128 MB device_put; a packed
        # SYNREDDIT GAT run leaked ~300 MB/epoch and OOM-killed the host
        # at fold 8).
        perm = np.full((n, T), E, np.int32)
        if E:
            flat = tile_of_edge * T + slot_of_edge
            perm.reshape(-1)[flat] = order
        conv = jnp.asarray if device else np.asarray
        return SpmmTiles(
            iblk=conv(iblk), jblk=conv(jblk), first=conv(first),
            sloc=None, rloc=None, perm=conv(perm),
            node_block=node_block, precision=precision,
            sglb=None, rglb=None)

    sloc = np.zeros((n, T), np.int32)
    rloc = np.zeros((n, T), np.int32)
    perm = np.full((n, T), E, np.int32)
    sglb = np.full((n, T), num_nodes, np.int32)
    rglb = np.full((n, T), num_nodes, np.int32)
    if E:
        flat = tile_of_edge * T + slot_of_edge
        se, re_ = senders[order], receivers[order]
        live = mask[order]
        sloc.reshape(-1)[flat] = se - sblk[order] * node_block
        rloc.reshape(-1)[flat] = re_ - rblk[order] * node_block
        perm.reshape(-1)[flat] = order
        sglb.reshape(-1)[flat] = np.where(live, se, num_nodes)
        rglb.reshape(-1)[flat] = np.where(live, re_, num_nodes)

    conv = jnp.asarray if device else np.asarray
    return SpmmTiles(
        iblk=conv(iblk),
        jblk=conv(jblk),
        first=conv(first),
        sloc=conv(sloc),
        rloc=conv(rloc),
        perm=conv(perm),
        node_block=node_block,
        precision=precision,
        sglb=conv(sglb),
        rglb=conv(rglb),
    )


def hydrate_tiles(t: SpmmTiles, s_arr, r_arr, edge_mask,
                  num_nodes: int) -> SpmmTiles:
    """Device-side completion of a SLIM plan (``build_tiles(slim=True)``).

    Recomputes the [n, T] slot arrays from the shipped ``perm`` and the
    batch's own edge arrays — three [n*T] gathers + cheap arithmetic, run
    ONCE per epoch (pre-scan) rather than shipped per epoch:

      sloc = senders[perm] - jblk*node_block   (0 on budget-pad slots)
      rloc = receivers[perm] - iblk*node_block
      sglb = senders[perm]  where live else V  (V also on pad slots)
      rglb = receivers[perm] likewise

    ``s_arr``/``r_arr`` are the arrays the plan was BUILT from — for the
    transposed (backward) plan pass them swapped, exactly as build_tiles
    was called.  Bit-identical to the eager arrays (tests/test_pallas_spmm
    ::test_slim_hydrate_matches_eager)."""
    E = s_arr.shape[0]
    n, T = t.perm.shape
    v = jnp.asarray(num_nodes, jnp.int32)
    idx = t.perm.reshape(-1)
    safe = jnp.clip(idx, 0, max(E - 1, 0))
    real = (idx < E).reshape(n, T)
    se = jnp.take(s_arr.astype(jnp.int32), safe).reshape(n, T)
    re_ = jnp.take(r_arr.astype(jnp.int32), safe).reshape(n, T)
    live = real & jnp.take(edge_mask, safe).reshape(n, T)
    nbk = t.node_block
    return dataclasses.replace(
        t,
        sloc=jnp.where(real, se - t.jblk[:, None] * nbk, 0),
        rloc=jnp.where(real, re_ - t.iblk[:, None] * nbk, 0),
        sglb=jnp.where(live, se, v),
        rglb=jnp.where(live, re_, v),
    )


def count_tiles(senders, receivers, num_nodes,
                node_block: int = NODE_BLOCK,
                tile_edges: int = TILE_EDGES) -> int:
    """Real tile count of a plan WITHOUT building it (cheap: one lexsort).
    Used by the loader to size data-driven tile budgets in pack mode."""
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    nb = num_nodes // node_block
    rblk = receivers // node_block
    sblk = senders // node_block
    key = np.sort(rblk * np.int64(nb) + sblk)
    if key.size == 0:
        return nb
    starts = np.concatenate([[0], np.flatnonzero(np.diff(key)) + 1])
    run_len = np.diff(np.concatenate([starts, [key.size]]))
    run_i = key[starts] // nb
    tiles = int(np.sum(-(-run_len // tile_edges)))
    # + one empty tile per receiver block with no edges
    return tiles + nb - int(np.unique(run_i).size)


def tile_budget_for(num_edges: int, num_nodes: int,
                    node_block: int = NODE_BLOCK,
                    tile_edges: int = TILE_EDGES,
                    max_graph_nodes: int | None = None) -> int:
    """Worst-case tile count for any edge structure with these budgets:
    every (i, j) block pair can leave one partially-filled tile, plus the
    full tiles, plus the one-empty-tile-per-receiver-block guarantee.

    ``max_graph_nodes`` exploits the disjoint-union batch layout: graphs
    are packed contiguously (graph.py batch_graphs), so both endpoints of
    any edge lie within one graph and ``|s - r| < max_graph_nodes`` —
    block pairs form a diagonal BAND.  Without it, the nb^2 all-pairs term
    explodes at REDDIT scale (V=70k -> 19k tiles, 236 MB of plan arrays
    per batch; r4 measured the flagship run host-bound for >20 min)."""
    nb = num_nodes // node_block
    if max_graph_nodes is not None:
        band = -(-(max_graph_nodes - 1) // node_block)  # ceil
        pairs = nb * min(2 * band + 2, nb)
    else:
        pairs = nb * nb
    return int(num_edges // tile_edges + pairs + nb)


def _onehot(loc, n, dtype):
    # loc: [T] int32 -> [T, n] one-hot via broadcasted-iota compare (VPU).
    iota = jax.lax.broadcasted_iota(jnp.int32, (loc.shape[0], n), 1)
    return (loc[:, None] == iota).astype(dtype)


def _mm_precision(mm_dtype):
    """f32 mode must be exact: Mosaic's DEFAULT dot precision rounds f32
    operands to bf16 on the MXU (1 pass, ~1e-3 rel error — measured on HW;
    interpret mode computes true f32 and hides it).  HIGHEST multi-pass
    splitting restores exact f32 at ~3x the MXU passes — r3 remeasured
    (clean differenced timing) bf16 tiles 2.8x faster than f32-HIGHEST at
    bench shapes, so production bf16 training uses bf16 tile precision
    (loader spmm_precision) and f32 mode is the exact-parity path."""
    return (jax.lax.Precision.HIGHEST if mm_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _spmm_kernel(iarr, jarr, first, sloc_ref, rloc_ref, coef_ref,
                 x_ref, out_ref, *, mm_dtype):
    del jarr
    t = pl.program_id(0)
    nb = out_ref.shape[0]
    prec = _mm_precision(mm_dtype)
    oh_s = _onehot(sloc_ref[0, 0], x_ref.shape[0], mm_dtype)
    msg = jnp.dot(oh_s, x_ref[:].astype(mm_dtype),
                  preferred_element_type=jnp.float32, precision=prec)
    msg = msg * coef_ref[0, 0][:, None]
    oh_r = _onehot(rloc_ref[0, 0], nb, mm_dtype)
    upd = jax.lax.dot_general(
        oh_r, msg.astype(mm_dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)

    @pl.when(first[t] == 1)
    def _():
        out_ref[:] = upd

    @pl.when(first[t] == 0)
    def _():
        out_ref[:] = out_ref[:] + upd


def _sddmm_kernel(iarr, jarr, sloc_ref, rloc_ref, x_ref, g_ref, dcoef_ref,
                  *, mm_dtype):
    del iarr, jarr
    prec = _mm_precision(mm_dtype)
    a = jnp.dot(_onehot(rloc_ref[0, 0], g_ref.shape[0], mm_dtype),
                g_ref[:].astype(mm_dtype), preferred_element_type=jnp.float32,
                precision=prec)
    b = jnp.dot(_onehot(sloc_ref[0, 0], x_ref.shape[0], mm_dtype),
                x_ref[:].astype(mm_dtype), preferred_element_type=jnp.float32,
                precision=prec)
    dcoef_ref[0, 0] = jnp.sum(a * b, axis=1)


def _interpret():
    return jax.default_backend() != "tpu"


# VMEM budget for the resident variants: whole-operand buffers must fit
# next to the per-tile one-hots (VMEM ~16 MB/core, pallas guide).
_RESIDENT_VMEM_BYTES = 10 << 20


def _mm_bytes(mm_dtype):
    return 2 if mm_dtype == jnp.bfloat16 else 4


def _resident_ok(v: int, h: int, mm_dtype, n_operands: int = 1) -> bool:
    """True when the whole [V, H] operand(s) + f32 out fit in VMEM.

    Profiling the streaming kernel (r4) showed its HBM traffic is
    n_tiles x [NB, H] x-block DMAs — ~34x the useful bytes at the bench
    shape (528 tiles x 256 KB vs a 4 MB x array), which is exactly the
    measured 7%-of-byte-floor.  When x fits in VMEM, load it ONCE and
    dynamic-slice the sender block per tile instead."""
    per = v * h * _mm_bytes(mm_dtype)
    return per * n_operands + v * h * 4 <= _RESIDENT_VMEM_BYTES


def _spmm_kernel_res(iarr, jarr, first, sloc_ref, rloc_ref, coef_ref,
                     x_ref, out_ref, *, mm_dtype, node_block):
    del first
    t = pl.program_id(0)
    prec = _mm_precision(mm_dtype)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    oh_s = _onehot(sloc_ref[0, 0], node_block, mm_dtype)
    xb = x_ref[pl.ds(jarr[t] * node_block, node_block), :]
    msg = jnp.dot(oh_s, xb.astype(mm_dtype),
                  preferred_element_type=jnp.float32, precision=prec)
    msg = msg * coef_ref[0, 0][:, None]
    oh_r = _onehot(rloc_ref[0, 0], node_block, mm_dtype)
    upd = jax.lax.dot_general(
        oh_r, msg.astype(mm_dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    i0 = iarr[t] * node_block
    out_ref[pl.ds(i0, node_block), :] += upd


def _spmm_call(x, coef_t, tiles, node_block):
    """out[r] += coef * x[s] for the edge structure in ``tiles``."""
    n_tiles, T = tiles.sloc.shape
    H = x.shape[1]
    V = x.shape[0]
    # Mosaic needs the last two block dims to be (mult-of-8, mult-of-128) or
    # equal to the array dims — lift per-tile vectors to [n_tiles, 1, T].
    lift = lambda a: a.reshape(n_tiles, 1, T)
    vec_spec = pl.BlockSpec((1, 1, T), lambda t, i, j, f: (t, 0, 0),
                            memory_space=pltpu.VMEM)
    mm_dtype = jnp.bfloat16 if tiles.precision == "bf16" else jnp.float32
    if _resident_ok(V, H, mm_dtype):
        # whole x pinned in VMEM (pre-cast to the matmul dtype so the
        # resident buffer is half-size in bf16 mode), whole out accumulated
        # in VMEM — HBM traffic drops to one read + one write of [V, H]
        full = lambda: pl.BlockSpec((V, H), lambda t, i, j, f: (0, 0),
                                    memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_tiles,),
            in_specs=[vec_spec, vec_spec, vec_spec, full()],
            out_specs=full(),
        )
        return pl.pallas_call(
            functools.partial(_spmm_kernel_res, mm_dtype=mm_dtype,
                              node_block=node_block),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
            interpret=_interpret(),
        )(tiles.iblk, tiles.jblk, tiles.first,
          lift(tiles.sloc), lift(tiles.rloc), lift(coef_t),
          x.astype(mm_dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            vec_spec,
            vec_spec,
            vec_spec,
            pl.BlockSpec((node_block, H), lambda t, i, j, f: (j[t], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((node_block, H), lambda t, i, j, f: (i[t], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_spmm_kernel, mm_dtype=mm_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        interpret=_interpret(),
    )(tiles.iblk, tiles.jblk, tiles.first,
      lift(tiles.sloc), lift(tiles.rloc), lift(coef_t), x)


def _sddmm_kernel_res(iarr, jarr, sloc_ref, rloc_ref, x_ref, g_ref,
                      dcoef_ref, *, mm_dtype, node_block):
    t = pl.program_id(0)
    prec = _mm_precision(mm_dtype)
    gb = g_ref[pl.ds(iarr[t] * node_block, node_block), :]
    xb = x_ref[pl.ds(jarr[t] * node_block, node_block), :]
    a = jnp.dot(_onehot(rloc_ref[0, 0], node_block, mm_dtype),
                gb.astype(mm_dtype), preferred_element_type=jnp.float32,
                precision=prec)
    b = jnp.dot(_onehot(sloc_ref[0, 0], node_block, mm_dtype),
                xb.astype(mm_dtype), preferred_element_type=jnp.float32,
                precision=prec)
    dcoef_ref[0, 0] = jnp.sum(a * b, axis=1)


def _sddmm_call(x, g, tiles, node_block):
    """dcoef[t, k] = dot(g[recv], x[send]) per tile slot."""
    n_tiles, T = tiles.sloc.shape
    H = x.shape[1]
    V = x.shape[0]
    lift = lambda a: a.reshape(n_tiles, 1, T)
    vec_spec = pl.BlockSpec((1, 1, T), lambda t, i, j: (t, 0, 0),
                            memory_space=pltpu.VMEM)
    mm_dtype = jnp.bfloat16 if tiles.precision == "bf16" else jnp.float32
    if _resident_ok(V, H, mm_dtype, n_operands=2):
        full = lambda: pl.BlockSpec((V, H), lambda t, i, j: (0, 0),
                                    memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[vec_spec, vec_spec, full(), full()],
            out_specs=vec_spec,
        )
        out = pl.pallas_call(
            functools.partial(_sddmm_kernel_res, mm_dtype=mm_dtype,
                              node_block=node_block),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_tiles, 1, T), jnp.float32),
            interpret=_interpret(),
        )(tiles.iblk, tiles.jblk, lift(tiles.sloc), lift(tiles.rloc),
          x.astype(mm_dtype), g.astype(mm_dtype))
        return out.reshape(n_tiles, T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            vec_spec,
            vec_spec,
            pl.BlockSpec((node_block, H), lambda t, i, j: (j[t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((node_block, H), lambda t, i, j: (i[t], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=vec_spec,
    )
    out = pl.pallas_call(
        functools.partial(_sddmm_kernel, mm_dtype=mm_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 1, T), jnp.float32),
        interpret=_interpret(),
    )(tiles.iblk, tiles.jblk, lift(tiles.sloc), lift(tiles.rloc), x, g)
    return out.reshape(n_tiles, T)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def coo_spmm(x, coef_ext, tiles_fwd, tiles_bwd, node_block=NODE_BLOCK):
    """out[r] = sum_e coef[e] * x[s_e] — differentiable tiled SpMM.

    Args:
      x:         [V, H] f32, V a multiple of ``node_block``.
      coef_ext:  [E + 1] per-edge coefficients with a trailing 0.0 (the
                 target of padding-slot perm entries).  Dead/self-loop
                 edges must already be zeroed by the caller.
      tiles_fwd: plan from build_tiles(senders, receivers, V).
      tiles_bwd: plan from build_tiles(receivers, senders, V) — the
                 transposed structure, used for dx.
    """
    out, _ = _coo_fwd(x, coef_ext, tiles_fwd, tiles_bwd, node_block)
    return out


def _coo_fwd(x, coef_ext, tiles_fwd, tiles_bwd, node_block):
    coef_t = jnp.take(coef_ext, tiles_fwd.perm, axis=0)
    out = _spmm_call(x, coef_t, tiles_fwd, node_block)
    return out, (x, coef_ext, tiles_fwd, tiles_bwd)


def _coo_bwd(node_block, res, g):
    x, coef_ext, tiles_fwd, tiles_bwd = res
    g = g.astype(jnp.float32)
    # dx[s] = sum_e coef[e] * g[r_e]: same kernel, transposed structure.
    coef_tb = jnp.take(coef_ext, tiles_bwd.perm, axis=0)
    dx = _spmm_call(g, coef_tb, tiles_bwd, node_block)
    # dcoef[e] = dot(g[r_e], x[s_e]) (SDDMM), scattered back to edge order.
    dcoef_t = _sddmm_call(x, g, tiles_fwd, node_block)
    dcoef = jnp.zeros_like(coef_ext).at[tiles_fwd.perm.ravel()].add(
        dcoef_t.ravel())
    dcoef = dcoef.at[-1].set(0.0)  # padding-slot garbage lands here
    zeros_like_tiles = lambda t: jax.tree.map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0), t)
    return dx, dcoef, zeros_like_tiles(tiles_fwd), zeros_like_tiles(tiles_bwd)


coo_spmm.defvjp(_coo_fwd, _coo_bwd)


# ---------------------------------------------------------------------------
# Multi-head variant (sparse GAT): per-edge coefficients differ PER HEAD.
#
# x arrives as [V, heads*d] (heads concatenated on the lane dim); coef is
# [E, heads] (the attention weights alpha).  In-kernel the [T, heads]
# coefficient tile expands to [T, heads*d] with one extra MXU matmul against
# a constant 0/1 block-broadcast matrix — so the kernel never materializes
# the [E, heads, d] message tensor that makes the XLA sparse-GAT path
# HBM-bound (ops/gat.py gat_aggregate_sparse msg = alpha[..., None] * xh).
# Reference semantics: PyG-1.1.0 GATConv aggregation (SURVEY.md §2.2 GATConv
# row calls for exactly this SDDMM+segment-softmax+SpMM kernel family).
# ---------------------------------------------------------------------------


def _bcast_matrix(heads: int, width: int, dtype):
    """bcast[h, j] = 1 iff column j belongs to head h (j // (width/heads))."""
    d = width // heads
    row = jax.lax.broadcasted_iota(jnp.int32, (heads, width), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (heads, width), 1)
    return (col // d == row).astype(dtype)


def _spmm_mh_kernel(iarr, jarr, first, sloc_ref, rloc_ref, coef_ref,
                    x_ref, out_ref, *, mm_dtype, heads):
    del jarr
    t = pl.program_id(0)
    nb = out_ref.shape[0]
    prec = _mm_precision(mm_dtype)
    oh_s = _onehot(sloc_ref[0, 0], x_ref.shape[0], mm_dtype)
    msg = jnp.dot(oh_s, x_ref[:].astype(mm_dtype),
                  preferred_element_type=jnp.float32, precision=prec)
    bc = _bcast_matrix(heads, x_ref.shape[1], jnp.float32)
    cexp = jnp.dot(coef_ref[0], bc, preferred_element_type=jnp.float32,
                   precision=_mm_precision(jnp.float32))
    msg = msg * cexp
    oh_r = _onehot(rloc_ref[0, 0], nb, mm_dtype)
    upd = jax.lax.dot_general(
        oh_r, msg.astype(mm_dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)

    @pl.when(first[t] == 1)
    def _():
        out_ref[:] = upd

    @pl.when(first[t] == 0)
    def _():
        out_ref[:] = out_ref[:] + upd


def _sddmm_mh_kernel(iarr, jarr, sloc_ref, rloc_ref, x_ref, g_ref,
                     dcoef_ref, *, mm_dtype, heads):
    del iarr, jarr
    prec = _mm_precision(mm_dtype)
    a = jnp.dot(_onehot(rloc_ref[0, 0], g_ref.shape[0], mm_dtype),
                g_ref[:].astype(mm_dtype), preferred_element_type=jnp.float32,
                precision=prec)
    b = jnp.dot(_onehot(sloc_ref[0, 0], x_ref.shape[0], mm_dtype),
                x_ref[:].astype(mm_dtype), preferred_element_type=jnp.float32,
                precision=prec)
    # per-head row sums of a*b: [T, heads*d] @ bcast^T -> [T, heads]
    bc = _bcast_matrix(heads, x_ref.shape[1], jnp.float32)
    dcoef_ref[0] = jax.lax.dot_general(
        a * b, bc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mm_precision(jnp.float32))


def _spmm_mh_kernel_res(iarr, jarr, first, sloc_ref, rloc_ref, coef_ref,
                        x_ref, out_ref, *, mm_dtype, heads, node_block):
    del first
    t = pl.program_id(0)
    prec = _mm_precision(mm_dtype)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    oh_s = _onehot(sloc_ref[0, 0], node_block, mm_dtype)
    xb = x_ref[pl.ds(jarr[t] * node_block, node_block), :]
    msg = jnp.dot(oh_s, xb.astype(mm_dtype),
                  preferred_element_type=jnp.float32, precision=prec)
    bc = _bcast_matrix(heads, x_ref.shape[1], jnp.float32)
    cexp = jnp.dot(coef_ref[0], bc, preferred_element_type=jnp.float32,
                   precision=_mm_precision(jnp.float32))
    msg = msg * cexp
    oh_r = _onehot(rloc_ref[0, 0], node_block, mm_dtype)
    upd = jax.lax.dot_general(
        oh_r, msg.astype(mm_dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    out_ref[pl.ds(iarr[t] * node_block, node_block), :] += upd


def _spmm_mh_call(x, coef_t, tiles, node_block, heads):
    n_tiles, T = tiles.sloc.shape
    H = x.shape[1]
    V = x.shape[0]
    lift = lambda a: a.reshape(n_tiles, 1, T)
    vec_spec = pl.BlockSpec((1, 1, T), lambda t, i, j, f: (t, 0, 0),
                            memory_space=pltpu.VMEM)
    coef_spec = pl.BlockSpec((1, T, heads), lambda t, i, j, f: (t, 0, 0),
                             memory_space=pltpu.VMEM)
    mm_dtype = jnp.bfloat16 if tiles.precision == "bf16" else jnp.float32
    if _resident_ok(V, H, mm_dtype):
        full = lambda: pl.BlockSpec((V, H), lambda t, i, j, f: (0, 0),
                                    memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_tiles,),
            in_specs=[vec_spec, vec_spec, coef_spec, full()],
            out_specs=full(),
        )
        return pl.pallas_call(
            functools.partial(_spmm_mh_kernel_res, mm_dtype=mm_dtype,
                              heads=heads, node_block=node_block),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
            interpret=_interpret(),
        )(tiles.iblk, tiles.jblk, tiles.first,
          lift(tiles.sloc), lift(tiles.rloc), coef_t, x.astype(mm_dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            vec_spec,
            vec_spec,
            coef_spec,
            pl.BlockSpec((node_block, H), lambda t, i, j, f: (j[t], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((node_block, H), lambda t, i, j, f: (i[t], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_spmm_mh_kernel, mm_dtype=mm_dtype, heads=heads),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        interpret=_interpret(),
    )(tiles.iblk, tiles.jblk, tiles.first,
      lift(tiles.sloc), lift(tiles.rloc), coef_t, x)


def _sddmm_mh_call(x, g, tiles, node_block, heads):
    n_tiles, T = tiles.sloc.shape
    H = x.shape[1]
    lift = lambda a: a.reshape(n_tiles, 1, T)
    vec_spec = pl.BlockSpec((1, 1, T), lambda t, i, j: (t, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            vec_spec,
            vec_spec,
            pl.BlockSpec((node_block, H), lambda t, i, j: (j[t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((node_block, H), lambda t, i, j: (i[t], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, heads), lambda t, i, j: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    mm_dtype = jnp.bfloat16 if tiles.precision == "bf16" else jnp.float32
    out = pl.pallas_call(
        functools.partial(_sddmm_mh_kernel, mm_dtype=mm_dtype, heads=heads),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, T, heads), jnp.float32),
        interpret=_interpret(),
    )(tiles.iblk, tiles.jblk, lift(tiles.sloc), lift(tiles.rloc), x, g)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def coo_spmm_mh(x, coef_ext, tiles_fwd, tiles_bwd, heads,
                node_block=NODE_BLOCK):
    """out[r, h*d:(h+1)*d] = sum_e coef[e, h] * x[s_e, h*d:(h+1)*d] —
    differentiable multi-head tiled SpMM (the GAT message aggregation).

    Args:
      x:         [V, heads*d] f32, V a multiple of ``node_block``.
      coef_ext:  [E + 1, heads] per-edge-per-head coefficients with a
                 trailing zero row (the target of padding-slot perm
                 entries).  Dead/self-loop edges must already be zeroed.
      tiles_fwd/tiles_bwd: the SAME structure plans as coo_spmm (they are
                 weight-free, so one plan serves GCN and GAT on a batch).
    """
    out, _ = _coo_mh_fwd(x, coef_ext, tiles_fwd, tiles_bwd, heads, node_block)
    return out


def _coo_mh_fwd(x, coef_ext, tiles_fwd, tiles_bwd, heads, node_block):
    coef_t = jnp.take(coef_ext, tiles_fwd.perm, axis=0)   # [n_tiles, T, h]
    out = _spmm_mh_call(x, coef_t, tiles_fwd, node_block, heads)
    return out, (x, coef_ext, tiles_fwd, tiles_bwd)


def _coo_mh_bwd(heads, node_block, res, g):
    x, coef_ext, tiles_fwd, tiles_bwd = res
    g = g.astype(jnp.float32)
    coef_tb = jnp.take(coef_ext, tiles_bwd.perm, axis=0)
    dx = _spmm_mh_call(g, coef_tb, tiles_bwd, node_block, heads)
    dcoef_t = _sddmm_mh_call(x, g, tiles_fwd, node_block, heads)
    dcoef = jnp.zeros_like(coef_ext).at[tiles_fwd.perm.ravel()].add(
        dcoef_t.reshape(-1, heads))
    dcoef = dcoef.at[-1].set(0.0)  # padding-slot garbage lands here
    zeros_like_tiles = lambda t: jax.tree.map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0), t)
    return dx, dcoef, zeros_like_tiles(tiles_fwd), zeros_like_tiles(tiles_bwd)


coo_spmm_mh.defvjp(_coo_mh_fwd, _coo_mh_bwd)


def gcn_aggregate_sparse_pallas(
    x: jax.Array,
    senders: jax.Array,
    receivers: jax.Array,
    edge_mask: jax.Array,
    tiles_fwd: SpmmTiles,
    tiles_bwd: SpmmTiles,
    edge_weight: jax.Array | None = None,
    node_block: int = NODE_BLOCK,
) -> jax.Array:
    """Drop-in replacement for ops.gcn.gcn_aggregate_sparse (same numerics:
    reference GCNConv.norm semantics, gcn_conv.py:44-70).  The O(E)-scalar
    degree/normalisation stays in XLA; the O(E*H) gather/scatter runs in the
    tiled kernel."""
    num_nodes = x.shape[0]
    # the per-edge coefficient chain is always f32: [E] scalars are free
    # traffic-wise, and Mosaic's minor-dim insertion (coef[:, None] in the
    # kernel) only supports 32-bit types — a bf16 model dtype must not leak
    # into the kernel's scalar operands.
    ew = (jnp.ones(senders.shape, jnp.float32)
          if edge_weight is None else edge_weight.astype(jnp.float32))
    live = edge_mask & (senders != receivers)
    ew = jnp.where(live, ew, 0.0)
    deg = jax.ops.segment_sum(ew, senders, num_segments=num_nodes) + 1.0
    dis = jax.lax.rsqrt(deg)
    coef = dis[senders] * ew * dis[receivers]
    coef_ext = jnp.concatenate([coef, jnp.zeros((1,), coef.dtype)])
    out = coo_spmm(x.astype(jnp.float32), coef_ext, tiles_fwd, tiles_bwd,
                   node_block)
    return (out + x.astype(jnp.float32) / deg[:, None]).astype(x.dtype)


# ---------------------------------------------------------------------------
# Tile-order fused sigmoid-weighted aggregate (r3).
#
# The generic ``coo_spmm`` contract takes per-edge coefficients in EDGE
# order, which costs an XLA scalar gather (coef -> tile slots, 1.9 ms at the
# V=8192/E=131k bench shape) in the forward and a scalar scatter (tile-order
# dcoef -> edge order, 2.3 ms) in the backward — together they made the
# tiled kernel LOSE to XLA segment ops on the training-relevant fwd+bwd
# basis.  The causal models' edge weights are factored node sigmoids
# (w_e = sigma(src[s] + dst[r]), ops/pallas_gcn.py SigmoidEdgeWeight), so
# the whole coefficient chain can run directly in TILE-SLOT order from the
# plans' global endpoint columns (sglb/rglb) — no [E]-order array ever
# exists, and d(src)/d(dst) flow through plain segment-sum transposes.
# ---------------------------------------------------------------------------


def _live_f32(tiles, num_nodes):
    return ((tiles.sglb != tiles.rglb)
            & (tiles.sglb < num_nodes)).astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def gcn_aggregate_sparse_sigmoid_pallas(x, src, dst, tiles_fwd, tiles_bwd,
                                        negate=False,
                                        node_block=NODE_BLOCK):
    """Sigmoid-edge-weighted GCN aggregate (reference gcn_conv.py:44-70
    norm with w_e = sigma(src[s]+dst[r]), or 1-sigma when ``negate``) with
    the WHOLE per-edge chain in tile-slot order — the sparse-layout analog
    of ops/pallas_gcn.py ``fused_gcn_dense_att``.

    Every [slots]-per-edge gather/scatter runs through the tile-plan MXU
    kernels (tile_gather2 / tile_scatter2): profiling showed each XLA
    scalar gather/scatter of the slot arrays costing 1.4-1.7 ms at bench
    shapes — they, not the SpMM itself, made the tiled fwd+bwd lose to
    segment ops.  Hand-written VJP (exact; derivation in ``_sig_bwd``).
    Differentiable in x, src, dst."""
    out, _ = _sig_fwd(x, src, dst, tiles_fwd, tiles_bwd, negate, node_block)
    return out


def _sig_fwd(x, src, dst, tiles_fwd, tiles_bwd, negate, node_block):
    num_nodes = x.shape[0]
    f32 = jnp.float32
    x32 = x.astype(f32)
    row = lambda v: v.astype(f32)[None, :]                 # [1, V] row-plane
    slot = lambda v: v[:, None, :]                         # [n, T]->[n,1,T]
    g1 = tile_gather2(row(src), row(dst), tiles_fwd, node_block)
    live = _live_f32(tiles_fwd, num_nodes)                 # [n_tiles, T]
    sig = jax.nn.sigmoid(g1[:, 0, :] + g1[:, 1, :])
    w = ((1.0 - sig) if negate else sig) * live
    degA, _ = tile_scatter2(slot(w), slot(jnp.zeros_like(w)),
                            tiles_fwd, num_nodes, node_block)
    deg = degA[0] + 1.0                                    # [V]
    dis = jax.lax.rsqrt(deg)
    g2 = tile_gather2(dis[None, :], dis[None, :], tiles_fwd, node_block)
    dis_s, dis_r = g2[:, 0, :], g2[:, 1, :]
    coef_f = dis_s * w * dis_r
    out = _spmm_call(x32, coef_f, tiles_fwd, node_block)
    out = out + x32 / deg[:, None]
    # tile plans ride in the residuals (NOT nondiff_argnums: they contain
    # arrays, which arrive as tracers when the batch flows through jit/scan)
    res = (x32, src, dst, w, dis_s, dis_r, deg, dis, tiles_fwd, tiles_bwd)
    return out.astype(x.dtype), res


def _sig_bwd(negate, node_block, res, gout):
    x32, src, dst, w, dis_s, dis_r, deg, dis, tiles_fwd, tiles_bwd = res
    num_nodes = x32.shape[0]
    f32 = jnp.float32
    g32 = gout.astype(f32)
    row = lambda v: v.astype(f32)[None, :]
    slot = lambda v: v[:, None, :]
    invdeg = 1.0 / deg
    # self term x/deg
    dx = g32 * invdeg[:, None]
    ddeg = -jnp.sum(g32 * x32, axis=1) * invdeg * invdeg
    # dx through the message sum: transposed-plan SpMM with the SAME
    # coefficients rebuilt in tiles_bwd slot order (tb was built with
    # swapped endpoint args, so its gathers come back (dst[r], src[s]))
    h1 = tile_gather2(row(dst), row(src), tiles_bwd, node_block)
    live_b = _live_f32(tiles_bwd, num_nodes)
    sig_b = jax.nn.sigmoid(h1[:, 0, :] + h1[:, 1, :])
    w_b = ((1.0 - sig_b) if negate else sig_b) * live_b
    h2 = tile_gather2(dis[None, :], dis[None, :], tiles_bwd, node_block)
    coef_b = h2[:, 0, :] * w_b * h2[:, 1, :]
    dx = dx + _spmm_call(g32, coef_b, tiles_bwd, node_block)
    # chain backward:
    #   coef = dis_s * w * dis_r;  deg = 1 + sum_sender w;  dis = deg^-1/2
    dcoef = _sddmm_call(x32, g32, tiles_fwd, node_block)   # [n_tiles, T]
    ddisA, ddisB = tile_scatter2(slot(dcoef * w * dis_r),
                                 slot(dcoef * w * dis_s),
                                 tiles_fwd, num_nodes, node_block)
    ddis = ddisA[0] + ddisB[0]
    ddeg = ddeg + ddis * (-0.5) * dis * invdeg             # d(deg^-1/2)
    gd = tile_gather2(ddeg[None, :], jnp.zeros((1, num_nodes), f32),
                      tiles_fwd, node_block)[:, 0, :]      # ddeg[sender]
    dwv = dcoef * dis_s * dis_r + gd
    # sigma' = sigma(1-sigma) = w(1-w) in BOTH modes (w = 1-sigma when
    # negate); dead slots have w = 0, zeroing the gather garbage in gd
    dpre = dwv * (w * (1.0 - w))
    if negate:
        dpre = -dpre
    dsrcP, ddstP = tile_scatter2(slot(dpre), slot(dpre),
                                 tiles_fwd, num_nodes, node_block)
    zeros_like_tiles = lambda t: jax.tree.map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0), t)
    return (dx.astype(x32.dtype), dsrcP[0].astype(src.dtype),
            ddstP[0].astype(dst.dtype),
            zeros_like_tiles(tiles_fwd), zeros_like_tiles(tiles_bwd))


gcn_aggregate_sparse_sigmoid_pallas.defvjp(_sig_fwd, _sig_bwd)


# ---------------------------------------------------------------------------
# Tile-order fused PLAIN (unweighted) aggregate (r5).
#
# The backbone convs (edge_weight=None) went through the generic
# ``gcn_aggregate_sparse_pallas`` wrapper, which leaves the whole
# coefficient chain in XLA [E]-order: profiling the packed SYNREDDIT-scale
# CausalGCN step (benchmarks/profile_step, nesting-aware parser) attributed
# 5.3 ms of the 20.5 ms step to exactly four ops — the fwd/bwd
# ``take(coef_ext, perm)`` permutations (1.5 ms each), the sender-degree
# ``segment_sum`` (0.8 ms) and the two ``dis[senders]``/``dis[receivers]``
# gathers (0.7 ms each; all CSE'd across the three layers).  Running the
# chain in tile-slot order from the plans' global endpoint columns removes
# every [E]-order array; the unweighted coefficients carry no gradient, so
# the VJP needs no SDDMM/dcoef at all — just the transposed-plan SpMM.
# Reference semantics: gcn_conv.py:44-70 norm with edge_weight None.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gcn_aggregate_sparse_plain_pallas(x, tiles_fwd, tiles_bwd,
                                      node_block=NODE_BLOCK):
    """Unweighted GCN aggregate (reference gcn_conv.py:44-70 norm with
    w_e = 1) with the whole per-edge chain in tile-slot order — the
    backbone-conv sibling of ``gcn_aggregate_sparse_sigmoid_pallas``.
    Differentiable in x only (the norm is structure-only)."""
    out, _ = _plain_fwd(x, tiles_fwd, tiles_bwd, node_block)
    return out


def _plain_coef(dis, tiles, num_nodes, node_block):
    live = _live_f32(tiles, num_nodes)
    g2 = tile_gather2(dis[None, :], dis[None, :], tiles, node_block)
    return g2[:, 0, :] * live * g2[:, 1, :]


def _plain_coef_spmm_kernel(iarr, jarr, first, sglb_ref, rglb_ref, sloc_ref,
                            rloc_ref, srow_ref, rrow_ref, x_ref, out_ref, *,
                            mm_dtype, num_nodes, node_block):
    """Plain SpMM with the norm chain in-kernel: coef = dis[s]*live*dis[r]
    from [1, V] row planes gathered with the pass's own one-hots."""
    del jarr
    t = pl.program_id(0)
    nb = out_ref.shape[0]
    prec = _mm_precision(mm_dtype)
    oh_s = _onehot(sloc_ref[0, 0], x_ref.shape[0], mm_dtype)
    oh_r = _onehot(rloc_ref[0, 0], nb, mm_dtype)
    gs = jax.lax.dot_general(
        srow_ref[:].astype(mm_dtype), oh_s, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)[0]   # [T]
    gr = jax.lax.dot_general(
        rrow_ref[:].astype(mm_dtype), oh_r, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)[0]
    live = _live_slot(sglb_ref[0, 0], rglb_ref[0, 0], num_nodes)
    coef = gs * live * gr
    msg = jnp.dot(oh_s, x_ref[:].astype(mm_dtype),
                  preferred_element_type=jnp.float32, precision=prec)
    msg = msg * coef[:, None]
    upd = jax.lax.dot_general(
        oh_r, msg.astype(mm_dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)

    @pl.when(first[t] == 1)
    def _():
        out_ref[:] = upd

    @pl.when(first[t] == 0)
    def _():
        out_ref[:] = out_ref[:] + upd


def _plain_coef_spmm_call(x, dis, tiles, node_block):
    n_tiles, T = tiles.sloc.shape
    V, H = x.shape
    lift = lambda a: a.reshape(n_tiles, 1, T)
    vec = pl.BlockSpec((1, 1, T), lambda t, i, j, f: (t, 0, 0),
                       memory_space=pltpu.VMEM)
    mm_dtype = jnp.bfloat16 if tiles.precision == "bf16" else jnp.float32
    row = dis.astype(jnp.float32)[None, :]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            vec, vec, vec, vec,
            pl.BlockSpec((1, node_block), lambda t, i, j, f: (0, j[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, node_block), lambda t, i, j, f: (0, i[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((node_block, H), lambda t, i, j, f: (j[t], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((node_block, H), lambda t, i, j, f: (i[t], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_plain_coef_spmm_kernel, mm_dtype=mm_dtype,
                          num_nodes=V, node_block=node_block),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((V, H), jnp.float32),
        interpret=_interpret(),
    )(tiles.iblk, tiles.jblk, tiles.first,
      lift(tiles.sglb), lift(tiles.rglb), lift(tiles.sloc), lift(tiles.rloc),
      row, row, x.astype(mm_dtype))


def _plain_fwd(x, tiles_fwd, tiles_bwd, node_block):
    num_nodes = x.shape[0]
    x32 = x.astype(jnp.float32)
    # live sender degree via the pair stats kernel at zero logits:
    # sigma(0) = 0.5 exactly, so each plane accumulates live/2 and the
    # doubling is exact binary scaling (bit-identical to summing live)
    zeros = jnp.zeros((num_nodes,), jnp.float32)
    degs = _pair_stats_call(zeros, zeros, tiles_fwd, num_nodes, node_block)
    deg = 2.0 * degs[0] + 1.0                              # sender degree
    dis = jax.lax.rsqrt(deg)
    out = _plain_coef_spmm_call(x32, dis, tiles_fwd, node_block)
    out = out + x32 * (1.0 / deg)[:, None]
    return out.astype(x.dtype), (deg, dis, tiles_fwd, tiles_bwd)


def _plain_bwd(node_block, res, gout):
    deg, dis, tiles_fwd, tiles_bwd = res
    g32 = gout.astype(jnp.float32)
    dx = _plain_coef_spmm_call(g32, dis, tiles_bwd, node_block)
    dx = dx + g32 * (1.0 / deg)[:, None]
    zeros_like_tiles = lambda t: jax.tree.map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0), t)
    return (dx.astype(gout.dtype), zeros_like_tiles(tiles_fwd),
            zeros_like_tiles(tiles_bwd))


gcn_aggregate_sparse_plain_pallas.defvjp(_plain_fwd, _plain_bwd)


# ---------------------------------------------------------------------------
# Tile-plan scalar gather/scatter kernels (r3).
#
# Profiling the tile-order sigmoid chain showed EVERY [V]-indexed XLA
# gather/scatter of the [n_tiles*T] slot arrays costing 1.4-1.7 ms at the
# bench shape (11 of them in fwd+bwd = ~18 ms — they, not the SpMM, are why
# the tiled aggregate lost to XLA segment ops on the fwd+bwd basis).  These
# kernels move those scalar ops onto the MXU with the same in-register
# one-hots the SpMM uses: a gather pass fetches per-slot values from BOTH
# endpoint planes at once; a scatter pass accumulates per-slot values into
# both [V, K] planes, kept VMEM-resident across the whole grid (32 KB).
# ---------------------------------------------------------------------------


def _tile_gather2_kernel(iarr, jarr, sloc_ref, rloc_ref, a_ref, b_ref,
                         out_ref, *, ka, kb, mm_dtype):
    del iarr, jarr
    prec = _mm_precision(mm_dtype)
    oh_s = _onehot(sloc_ref[0, 0], a_ref.shape[1], mm_dtype)   # [T, NB]
    oh_r = _onehot(rloc_ref[0, 0], b_ref.shape[1], mm_dtype)
    # row-plane form: ga[k, t] = a[k, sloc[t]] via a_row @ oh^T (all arrays
    # keep T/V on the LANE dim — no single-lane layouts anywhere)
    ga = jax.lax.dot_general(
        a_ref[:].astype(mm_dtype), oh_s, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)     # [Ka, T]
    gb = jax.lax.dot_general(
        b_ref[:].astype(mm_dtype), oh_r, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)     # [Kb, T]
    out_ref[0] = jnp.concatenate([ga, gb], axis=0)


def tile_gather2(a, b, tiles: SpmmTiles, node_block: int = NODE_BLOCK):
    """Per-slot gather from a sender-indexed row-plane ``a`` [Ka, V] AND a
    receiver-indexed row-plane ``b`` [Kb, V] -> [n_tiles, Ka+Kb, T] f32.
    Dead slots fetch garbage rows — mask with the slot liveness
    (tiles.sglb < V) downstream."""
    n_tiles, T = tiles.sloc.shape
    ka, kb = a.shape[0], b.shape[0]
    lift = lambda arr: arr.reshape(n_tiles, 1, T)
    vec_spec = pl.BlockSpec((1, 1, T), lambda t, i, j: (t, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            vec_spec,
            vec_spec,
            pl.BlockSpec((ka, node_block), lambda t, i, j: (0, j[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, node_block), lambda t, i, j: (0, i[t]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ka + kb, T), lambda t, i, j: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    mm_dtype = jnp.bfloat16 if tiles.precision == "bf16" else jnp.float32
    return pl.pallas_call(
        functools.partial(_tile_gather2_kernel, ka=ka, kb=kb,
                          mm_dtype=mm_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, ka + kb, T), jnp.float32),
        interpret=_interpret(),
    )(tiles.iblk, tiles.jblk, lift(tiles.sloc), lift(tiles.rloc),
      a.astype(jnp.float32), b.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Dual-branch ("pair") sigmoid aggregate (r5).
#
# The causal models run TWO masked convs per step over the SAME edge
# structure with complementary weights: w_c = sigma(src[s]+dst[r]) and
# w_o = 1 - w_c (models/causal.py:198-224; the dense layout already fuses
# them — ops/pallas_gcn.py fused_gcn_dense_att_dual).  The r5 sweep
# (benchmarks/sweep_pack_tiles) showed the sparse kernels are dominated by
# PER-TILE fixed cost (in-kernel one-hot builds + grid overhead: ~1.6 us/tile
# vs the 0.68 us bf16 MXU floor), so running the two convs as one kernel
# with a [V, 2H] feature block amortizes every one-hot build, slot-array
# load and grid step over twice the MXU work — and the whole coefficient
# chain (endpoint gather, sigmoid, degree scatter, rsqrt gather) is shared
# instead of computed once per conv.
# ---------------------------------------------------------------------------


# --- fully-fused pair kernels (r5b) ----------------------------------------
# Step profiling after the first pair cut still showed ~0.46 ms PER LAUNCH
# for every tile_gather2/tile_scatter2 chain kernel (8 launches/step): each
# walks the whole tile grid rebuilding one-hots for a few tiny matmuls.
# These kernels fold the per-slot coefficient chain INTO the main passes:
# endpoint/dis values ride as [K, V] row planes gathered with the SAME
# in-register one-hots the SpMM already builds, and liveness is recomputed
# from the plans' global endpoint columns (sglb/rglb) with a [T] compare.
# Launch count for the pair fwd+bwd drops from 9-10 to 5.


def _live_slot(sglb, rglb, num_nodes):
    # [T] f32 liveness from global endpoint ids (padding -> num_nodes)
    return jnp.where((sglb != rglb) & (sglb < num_nodes), 1.0, 0.0)


def _pair_stats_kernel(iarr, jarr, first, sglb_ref, rglb_ref, sloc_ref,
                       rloc_ref, src_ref, dst_ref, deg_ref, *,
                       node_block, mm_dtype, num_nodes):
    """deg planes: deg[0/1, v] += sum over slots with sender v of w_c/w_o."""
    t = pl.program_id(0)
    del first

    @pl.when(t == 0)
    def _():
        deg_ref[:] = jnp.zeros_like(deg_ref)

    prec = _mm_precision(mm_dtype)
    oh_s = _onehot(sloc_ref[0, 0], node_block, mm_dtype)   # [T, NB]
    oh_r = _onehot(rloc_ref[0, 0], node_block, mm_dtype)
    gs = jax.lax.dot_general(
        src_ref[:].astype(mm_dtype), oh_s, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)[0]   # [T]
    gr = jax.lax.dot_general(
        dst_ref[:].astype(mm_dtype), oh_r, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)[0]
    live = _live_slot(sglb_ref[0, 0], rglb_ref[0, 0], num_nodes)
    sig = jax.nn.sigmoid(gs + gr)
    w2 = jnp.stack([sig * live, (1.0 - sig) * live])       # [2, T]
    upd = jnp.dot(w2.astype(mm_dtype), oh_s,
                  preferred_element_type=jnp.float32, precision=prec)
    deg_ref[:, pl.ds(jarr[t] * node_block, node_block)] += upd


def _pair_stats_call(src, dst, tiles, num_nodes, node_block):
    n_tiles, T = tiles.sloc.shape
    lift = lambda a: a.reshape(n_tiles, 1, T)
    vec = pl.BlockSpec((1, 1, T), lambda t, i, j, f: (t, 0, 0),
                       memory_space=pltpu.VMEM)
    mm_dtype = jnp.bfloat16 if tiles.precision == "bf16" else jnp.float32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            vec, vec, vec, vec,
            pl.BlockSpec((1, node_block), lambda t, i, j, f: (0, j[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, node_block), lambda t, i, j, f: (0, i[t]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, num_nodes), lambda t, i, j, f: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_pair_stats_kernel, node_block=node_block,
                          mm_dtype=mm_dtype, num_nodes=num_nodes),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, num_nodes), jnp.float32),
        interpret=_interpret(),
    )(tiles.iblk, tiles.jblk, tiles.first,
      lift(tiles.sglb), lift(tiles.rglb), lift(tiles.sloc), lift(tiles.rloc),
      src.astype(jnp.float32)[None, :], dst.astype(jnp.float32)[None, :])


def _pair_coef_spmm_kernel(iarr, jarr, first, sglb_ref, rglb_ref, sloc_ref,
                           rloc_ref, srow_ref, rrow_ref, x_ref, out_ref, *,
                           mm_dtype, h, num_nodes, node_block):
    """Pair SpMM with the coefficient chain in-kernel.

    srow/rrow: [3, V] row planes (logit, dis_c, dis_o) indexed by the
    plan's sender/receiver block.  coef_k = dis_k[s] * w_k * dis_k[r] with
    w_c = sigma(logit_s + logit_r) * live, w_o = (1 - sigma) * live."""
    t = pl.program_id(0)
    nb = out_ref.shape[0]
    prec = _mm_precision(mm_dtype)
    oh_s = _onehot(sloc_ref[0, 0], x_ref.shape[0], mm_dtype)
    oh_r = _onehot(rloc_ref[0, 0], nb, mm_dtype)
    gs = jax.lax.dot_general(
        srow_ref[:].astype(mm_dtype), oh_s, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)   # [3, T]
    gr = jax.lax.dot_general(
        rrow_ref[:].astype(mm_dtype), oh_r, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    live = _live_slot(sglb_ref[0, 0], rglb_ref[0, 0], num_nodes)
    sig = jax.nn.sigmoid(gs[0] + gr[0])
    coef_c = gs[1] * (sig * live) * gr[1]
    coef_o = gs[2] * ((1.0 - sig) * live) * gr[2]
    msg = jnp.dot(oh_s, x_ref[:].astype(mm_dtype),
                  preferred_element_type=jnp.float32, precision=prec)
    lane = jax.lax.broadcasted_iota(jnp.int32, msg.shape, 1)
    msg = msg * jnp.where(lane < h, coef_c[:, None], coef_o[:, None])
    upd = jax.lax.dot_general(
        oh_r, msg.astype(mm_dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)

    @pl.when(first[t] == 1)
    def _():
        out_ref[:] = upd

    @pl.when(first[t] == 0)
    def _():
        out_ref[:] = out_ref[:] + upd


def _pair_coef_spmm_call(x2, logit_s, logit_r, dis, tiles, node_block, h):
    """x2: [V, 2h]; logit_s/logit_r: [V]; dis: [2, V] per-branch rsqrt(deg).

    For the forward plan pass (logit_s, logit_r) = (src, dst); for the
    transposed plan pass them swapped — the sigmoid argument and the
    symmetric dis product are orientation-invariant per edge."""
    n_tiles, T = tiles.sloc.shape
    V, H2 = x2.shape
    lift = lambda a: a.reshape(n_tiles, 1, T)
    vec = pl.BlockSpec((1, 1, T), lambda t, i, j, f: (t, 0, 0),
                       memory_space=pltpu.VMEM)
    mm_dtype = jnp.bfloat16 if tiles.precision == "bf16" else jnp.float32
    srow = jnp.concatenate([logit_s.astype(jnp.float32)[None, :], dis], 0)
    rrow = jnp.concatenate([logit_r.astype(jnp.float32)[None, :], dis], 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            vec, vec, vec, vec,
            pl.BlockSpec((3, node_block), lambda t, i, j, f: (0, j[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, node_block), lambda t, i, j, f: (0, i[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((node_block, H2), lambda t, i, j, f: (j[t], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((node_block, H2), lambda t, i, j, f: (i[t], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_pair_coef_spmm_kernel, mm_dtype=mm_dtype, h=h,
                          num_nodes=V, node_block=node_block),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((V, H2), jnp.float32),
        interpret=_interpret(),
    )(tiles.iblk, tiles.jblk, tiles.first,
      lift(tiles.sglb), lift(tiles.rglb), lift(tiles.sloc), lift(tiles.rloc),
      srow, rrow, x2.astype(mm_dtype))


def _pair_sddmm_chain_kernel(iarr, jarr, sglb_ref, rglb_ref, sloc_ref,
                             rloc_ref, srow_ref, rrow_ref, x_ref, g_ref,
                             vec_ref, ddis_s_ref, ddis_r_ref, *,
                             mm_dtype, h, num_nodes, node_block):
    """dcoef chain head: per-slot dcoef_k = dot(g_k[r], x_k[s]); emits
    dwv-partials + sfac per slot and accumulates both ddis row planes."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        ddis_s_ref[:] = jnp.zeros_like(ddis_s_ref)
        ddis_r_ref[:] = jnp.zeros_like(ddis_r_ref)

    prec = _mm_precision(mm_dtype)
    oh_s = _onehot(sloc_ref[0, 0], x_ref.shape[0], mm_dtype)
    oh_r = _onehot(rloc_ref[0, 0], g_ref.shape[0], mm_dtype)
    a = jnp.dot(oh_r, g_ref[:].astype(mm_dtype),
                preferred_element_type=jnp.float32, precision=prec)
    b = jnp.dot(oh_s, x_ref[:].astype(mm_dtype),
                preferred_element_type=jnp.float32, precision=prec)
    prod = a * b
    lane = jax.lax.broadcasted_iota(jnp.int32, prod.shape, 1)
    dc_c = jnp.sum(jnp.where(lane < h, prod, 0.0), axis=1)
    dc_o = jnp.sum(jnp.where(lane >= h, prod, 0.0), axis=1)
    gs = jax.lax.dot_general(
        srow_ref[:].astype(mm_dtype), oh_s, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)   # [3, T]
    gr = jax.lax.dot_general(
        rrow_ref[:].astype(mm_dtype), oh_r, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    live = _live_slot(sglb_ref[0, 0], rglb_ref[0, 0], num_nodes)
    sig = jax.nn.sigmoid(gs[0] + gr[0])
    w_c = sig * live
    w_o = (1.0 - sig) * live
    vec_ref[0, 0] = dc_c * gs[1] * gr[1]                   # dwv partial c
    vec_ref[0, 1] = dc_o * gs[2] * gr[2]                   # dwv partial o
    vec_ref[0, 2] = w_c * w_o                              # sig(1-sig)*live
    vs = jnp.stack([dc_c * w_c * gr[1], dc_o * w_o * gr[2]])   # [2, T]
    vr = jnp.stack([dc_c * w_c * gs[1], dc_o * w_o * gs[2]])
    ddis_s_ref[:, pl.ds(jarr[t] * node_block, node_block)] += jnp.dot(
        vs.astype(mm_dtype), oh_s, preferred_element_type=jnp.float32,
        precision=prec)
    ddis_r_ref[:, pl.ds(iarr[t] * node_block, node_block)] += jnp.dot(
        vr.astype(mm_dtype), oh_r, preferred_element_type=jnp.float32,
        precision=prec)


def _pair_sddmm_chain_call(x2, g2, src, dst, dis, tiles, node_block, h):
    n_tiles, T = tiles.sloc.shape
    V, H2 = x2.shape
    lift = lambda a: a.reshape(n_tiles, 1, T)
    vec = pl.BlockSpec((1, 1, T), lambda t, i, j: (t, 0, 0),
                       memory_space=pltpu.VMEM)
    mm_dtype = jnp.bfloat16 if tiles.precision == "bf16" else jnp.float32
    srow = jnp.concatenate([src.astype(jnp.float32)[None, :], dis], 0)
    rrow = jnp.concatenate([dst.astype(jnp.float32)[None, :], dis], 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            vec, vec, vec, vec,
            pl.BlockSpec((3, node_block), lambda t, i, j: (0, j[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, node_block), lambda t, i, j: (0, i[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((node_block, H2), lambda t, i, j: (j[t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((node_block, H2), lambda t, i, j: (i[t], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, T), lambda t, i, j: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, V), lambda t, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, V), lambda t, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        functools.partial(_pair_sddmm_chain_kernel, mm_dtype=mm_dtype, h=h,
                          num_nodes=V, node_block=node_block),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_tiles, 3, T), jnp.float32),
                   jax.ShapeDtypeStruct((2, V), jnp.float32),
                   jax.ShapeDtypeStruct((2, V), jnp.float32)],
        interpret=_interpret(),
    )(tiles.iblk, tiles.jblk,
      lift(tiles.sglb), lift(tiles.rglb), lift(tiles.sloc), lift(tiles.rloc),
      srow, rrow, x2.astype(mm_dtype), g2.astype(mm_dtype))


def _pair_dpre_kernel(iarr, jarr, first, sloc_ref, rloc_ref, vec_ref,
                      ddeg_ref, dsrc_ref, ddst_ref, *, mm_dtype, node_block):
    """Chain tail: dpre = (dwvp_c + ddeg_c[s] - dwvp_o - ddeg_o[s]) * sfac,
    scattered into dsrc (by sender) and ddst (by receiver) planes."""
    t = pl.program_id(0)
    del first

    @pl.when(t == 0)
    def _():
        dsrc_ref[:] = jnp.zeros_like(dsrc_ref)
        ddst_ref[:] = jnp.zeros_like(ddst_ref)

    prec = _mm_precision(mm_dtype)
    oh_s = _onehot(sloc_ref[0, 0], node_block, mm_dtype)
    oh_r = _onehot(rloc_ref[0, 0], node_block, mm_dtype)
    gd = jax.lax.dot_general(
        ddeg_ref[:].astype(mm_dtype), oh_s, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)   # [2, T]
    dpre = ((vec_ref[0, 0] + gd[0] - vec_ref[0, 1] - gd[1])
            * vec_ref[0, 2])[None, :]                      # [1, T]
    dsrc_ref[:, pl.ds(jarr[t] * node_block, node_block)] += jnp.dot(
        dpre.astype(mm_dtype), oh_s, preferred_element_type=jnp.float32,
        precision=prec)
    ddst_ref[:, pl.ds(iarr[t] * node_block, node_block)] += jnp.dot(
        dpre.astype(mm_dtype), oh_r, preferred_element_type=jnp.float32,
        precision=prec)


def _pair_dpre_call(vecs, ddeg, tiles, num_nodes, node_block):
    n_tiles, T = tiles.sloc.shape
    lift = lambda a: a.reshape(n_tiles, 1, T)
    vec = pl.BlockSpec((1, 1, T), lambda t, i, j, f: (t, 0, 0),
                       memory_space=pltpu.VMEM)
    mm_dtype = jnp.bfloat16 if tiles.precision == "bf16" else jnp.float32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            vec, vec,
            pl.BlockSpec((1, 3, T), lambda t, i, j, f: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, node_block), lambda t, i, j, f: (0, j[t]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, num_nodes), lambda t, i, j, f: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_nodes), lambda t, i, j, f: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        functools.partial(_pair_dpre_kernel, mm_dtype=mm_dtype,
                          node_block=node_block),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, num_nodes), jnp.float32),
                   jax.ShapeDtypeStruct((1, num_nodes), jnp.float32)],
        interpret=_interpret(),
    )(tiles.iblk, tiles.jblk, tiles.first,
      lift(tiles.sloc), lift(tiles.rloc), vecs, ddeg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def gcn_aggregate_sparse_sigmoid_pair_pallas(xc, xo, src, dst, tiles_fwd,
                                             tiles_bwd,
                                             node_block=NODE_BLOCK):
    """BOTH masked causal convs in one pass: returns (out_c, out_o) where
    out_c is the sigmoid-weighted aggregate of ``xc`` (w_c = sigma) and
    out_o the complementary aggregate of ``xo`` (w_o = 1 - sigma), for the
    shared attention logits src/dst — reference model.py:112-113, both
    convs over the same edge_index with softmax-complementary weights.

    Numerically identical to two ``gcn_aggregate_sparse_sigmoid_pallas``
    calls (negate=False / True); parity-tested.  Differentiable in
    xc, xo, src, dst."""
    (oc, oo), _ = _pair_fwd(xc, xo, src, dst, tiles_fwd, tiles_bwd,
                            node_block)
    return oc, oo


def _pair_fwd(xc, xo, src, dst, tiles_fwd, tiles_bwd, node_block):
    num_nodes, h = xc.shape
    f32 = jnp.float32
    xc32, xo32 = xc.astype(f32), xo.astype(f32)
    degs = _pair_stats_call(src, dst, tiles_fwd, num_nodes, node_block)
    deg = degs + 1.0                                       # [2, V]
    dis = jax.lax.rsqrt(deg)
    x2 = jnp.concatenate([xc32, xo32], axis=1)
    out2 = _pair_coef_spmm_call(x2, src, dst, dis, tiles_fwd, node_block, h)
    oc = out2[:, :h] + xc32 / deg[0][:, None]
    oo = out2[:, h:] + xo32 / deg[1][:, None]
    res = (xc32, xo32, src, dst, deg, dis, tiles_fwd, tiles_bwd)
    return (oc.astype(xc.dtype), oo.astype(xo.dtype)), res


def _pair_bwd(node_block, res, gouts):
    xc32, xo32, src, dst, deg, dis, tiles_fwd, tiles_bwd = res
    gc, go = gouts
    num_nodes, h = xc32.shape
    f32 = jnp.float32
    gc32, go32 = gc.astype(f32), go.astype(f32)
    inv = 1.0 / deg                                        # [2, V]
    # self terms x_k / deg_k
    dxc = gc32 * inv[0][:, None]
    dxo = go32 * inv[1][:, None]
    ddeg = jnp.stack([
        -jnp.sum(gc32 * xc32, axis=1) * inv[0] * inv[0],
        -jnp.sum(go32 * xo32, axis=1) * inv[1] * inv[1],
    ])
    # dx through the message sums: transposed-plan pass with the logits
    # swapped (tb's sender is the original receiver — the sigmoid argument
    # and the symmetric dis product come out identical per edge)
    gx2 = jnp.concatenate([gc32, go32], axis=1)
    dx2 = _pair_coef_spmm_call(gx2, dst, src, dis, tiles_bwd, node_block, h)
    dxc = dxc + dx2[:, :h]
    dxo = dxo + dx2[:, h:]
    # chain backward per branch k (one fused SDDMM pass):
    #   coef_k = dis_k[s] * w_k * dis_k[r];  deg_k = 1 + sum_sender w_k;
    #   dis_k = deg_k^-1/2
    x2 = jnp.concatenate([xc32, xo32], axis=1)
    vecs, ddis_s, ddis_r = _pair_sddmm_chain_call(
        x2, gx2, src, dst, dis, tiles_fwd, node_block, h)
    ddis = ddis_s + ddis_r                                 # [2, V]
    ddeg = ddeg + ddis * (-0.5) * dis * inv                # d(deg^-1/2)
    # chain tail: dpre = (dwvp_c + ddeg_c[s] - dwvp_o - ddeg_o[s]) * sfac
    # where sfac = sig(1-sig)*live (== w_c*w_o) zeroes every dead-slot
    # garbage term (ddeg gathers, dcoef) in one multiply
    dsrcP, ddstP = _pair_dpre_call(vecs, ddeg, tiles_fwd, num_nodes,
                                   node_block)
    zeros_like_tiles = lambda t: jax.tree.map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0), t)
    return (dxc.astype(xc32.dtype), dxo.astype(xo32.dtype),
            dsrcP[0].astype(src.dtype), ddstP[0].astype(dst.dtype),
            zeros_like_tiles(tiles_fwd), zeros_like_tiles(tiles_bwd))


gcn_aggregate_sparse_sigmoid_pair_pallas.defvjp(_pair_fwd, _pair_bwd)


# ---------------------------------------------------------------------------
# Fused multi-head GAT chain kernels (r5c).
#
# The r5 tile-order GAT chain (ops/gat.py gat_aggregate_sparse_fused) still
# paid ~10 chain launches per layer fwd+bwd (tile_gather2 / tile_scatter2 /
# tile_scatter_max) plus big [n_tiles, heads, T] intermediates that show up
# as 3.6 ms/step of device copies in the packed-sparse CausalGAT profile.
# These kernels recompute the per-slot attention weights IN the main
# passes from [heads, V] row planes (ti/tj/m), mirroring the pair-GCN
# treatment: fwd = max pass + denom pass + coef-SpMM; bwd = coef-SpMM on
# the transposed plan + one SDDMM-chain pass.  In-kernel attention dropout
# uses the same Murmur-style counter hash of the plans' edge ids as the
# XLA chain (ops/gat.py _mix32/_keep_mask), so fwd (tf order) and bwd
# (tb order) draw identical masks.
# ---------------------------------------------------------------------------


def _hash_keep(ids_u32, s0, s1, rate, salt):
    """[.., T] uint32 ids -> f32 keep mask at probability 1-rate (in-kernel
    twin of ops/gat.py _keep_mask; same constants, same streams)."""
    thresh = np.uint32(min((1.0 - rate) * 4294967296.0, 4294967295.0))
    x = ids_u32 * np.uint32(0x9E3779B9) + s0
    x = x ^ (x >> 16)
    x = x * np.uint32(0x85EBCA6B)
    x = x ^ (x >> 13) ^ (s1 + np.uint32(0x632BE59B) * np.uint32(salt))
    x = x * np.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return (x < thresh).astype(jnp.float32)


def _gat_rows_spec(k, node_block, side):
    idx = ((lambda t, i, j, f: (0, j[t])) if side == "s"
           else (lambda t, i, j, f: (0, i[t])))
    return pl.BlockSpec((k, node_block), idx, memory_space=pltpu.VMEM)


def _gat_slot_q(gs, gr, gm, sglb, rglb, num_nodes, neg_slope):
    """Per-slot unnormalized weights q = live * exp(leakyrelu(pre) - m)."""
    live = (sglb != rglb) & (sglb < num_nodes)
    pre = gs + gr
    score = jnp.where(pre >= 0, pre, pre * neg_slope)
    return jnp.where(live[None, :], jnp.exp(score - gm), 0.0)


def _gat_max_kernel(iarr, jarr, first, sglb_ref, rglb_ref, sloc_ref,
                    rloc_ref, tj_ref, ti_ref, m_ref, *,
                    mm_dtype, heads, num_nodes, node_block, neg_slope):
    del first
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)

    prec = _mm_precision(mm_dtype)
    oh_s = _onehot(sloc_ref[0, 0], node_block, mm_dtype)
    oh_rb = rloc_ref[0, 0][:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (rloc_ref[0, 0].shape[0], node_block), 1)   # [T, NB] bool
    gs = jax.lax.dot_general(
        tj_ref[:].astype(mm_dtype), oh_s, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)     # [h, T]
    gr = jax.lax.dot_general(
        ti_ref[:].astype(mm_dtype), oh_rb.astype(mm_dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    live = (sglb_ref[0, 0] != rglb_ref[0, 0]) & (sglb_ref[0, 0] < num_nodes)
    pre = gs + gr
    score = jnp.where(pre >= 0, pre, pre * neg_slope)
    score = jnp.where(live[None, :], score, -1e30)
    i0 = iarr[t] * node_block
    for k in range(heads):
        upd = jnp.max(jnp.where(oh_rb, score[k][:, None], -1e30), axis=0)
        cur = m_ref[k, pl.ds(i0, node_block)]
        m_ref[k, pl.ds(i0, node_block)] = jnp.maximum(cur, upd)


def _gat_max_call(tj_rows, ti_rows, tiles, num_nodes, node_block,
                  neg_slope):
    """Receiver-plane max of the live edge scores: -> [heads, V] f32."""
    n_tiles, T = tiles.sloc.shape
    heads = tj_rows.shape[0]
    lift = lambda a: a.reshape(n_tiles, 1, T)
    vec = pl.BlockSpec((1, 1, T), lambda t, i, j, f: (t, 0, 0),
                       memory_space=pltpu.VMEM)
    mm_dtype = jnp.bfloat16 if tiles.precision == "bf16" else jnp.float32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[vec, vec, vec, vec,
                  _gat_rows_spec(heads, node_block, "s"),
                  _gat_rows_spec(heads, node_block, "r")],
        out_specs=pl.BlockSpec((heads, num_nodes), lambda t, i, j, f: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_gat_max_kernel, mm_dtype=mm_dtype, heads=heads,
                          num_nodes=num_nodes, node_block=node_block,
                          neg_slope=neg_slope),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((heads, num_nodes), jnp.float32),
        interpret=_interpret(),
    )(tiles.iblk, tiles.jblk, tiles.first,
      lift(tiles.sglb), lift(tiles.rglb), lift(tiles.sloc), lift(tiles.rloc),
      tj_rows.astype(jnp.float32), ti_rows.astype(jnp.float32))


def _gat_den_kernel(iarr, jarr, first, sglb_ref, rglb_ref, sloc_ref,
                    rloc_ref, tj_ref, tim_ref, den_ref, *,
                    mm_dtype, heads, num_nodes, node_block, neg_slope):
    del first
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        den_ref[:] = jnp.zeros_like(den_ref)

    prec = _mm_precision(mm_dtype)
    oh_s = _onehot(sloc_ref[0, 0], node_block, mm_dtype)
    oh_r = _onehot(rloc_ref[0, 0], node_block, mm_dtype)
    gs = jax.lax.dot_general(
        tj_ref[:].astype(mm_dtype), oh_s, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)     # [h, T]
    grm = jax.lax.dot_general(
        tim_ref[:].astype(mm_dtype), oh_r, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)     # [2h, T]
    q = _gat_slot_q(gs, grm[:heads], grm[heads:], sglb_ref[0, 0],
                    rglb_ref[0, 0], num_nodes, neg_slope)
    den_ref[:, pl.ds(iarr[t] * node_block, node_block)] += jnp.dot(
        q.astype(mm_dtype), oh_r, preferred_element_type=jnp.float32,
        precision=prec)


def _gat_den_call(tj_rows, tim_rows, tiles, num_nodes, node_block,
                  neg_slope):
    """Receiver-plane sum of the unnormalized weights: -> [heads, V]."""
    n_tiles, T = tiles.sloc.shape
    heads = tj_rows.shape[0]
    lift = lambda a: a.reshape(n_tiles, 1, T)
    vec = pl.BlockSpec((1, 1, T), lambda t, i, j, f: (t, 0, 0),
                       memory_space=pltpu.VMEM)
    mm_dtype = jnp.bfloat16 if tiles.precision == "bf16" else jnp.float32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[vec, vec, vec, vec,
                  _gat_rows_spec(heads, node_block, "s"),
                  _gat_rows_spec(2 * heads, node_block, "r")],
        out_specs=pl.BlockSpec((heads, num_nodes), lambda t, i, j, f: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_gat_den_kernel, mm_dtype=mm_dtype, heads=heads,
                          num_nodes=num_nodes, node_block=node_block,
                          neg_slope=neg_slope),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((heads, num_nodes), jnp.float32),
        interpret=_interpret(),
    )(tiles.iblk, tiles.jblk, tiles.first,
      lift(tiles.sglb), lift(tiles.rglb), lift(tiles.sloc), lift(tiles.rloc),
      tj_rows.astype(jnp.float32), tim_rows.astype(jnp.float32))


def _gat_coef_spmm_kernel(iarr, jarr, first, seed_ref, perm_ref, sglb_ref,
                          rglb_ref, sloc_ref, rloc_ref, srow_ref, rrow_ref,
                          x_ref, out_ref, *, mm_dtype, heads, num_nodes,
                          node_block, neg_slope, m_on_receiver, rate):
    t = pl.program_id(0)
    prec = _mm_precision(mm_dtype)
    oh_s = _onehot(sloc_ref[0, 0], node_block, mm_dtype)
    oh_r = _onehot(rloc_ref[0, 0], node_block, mm_dtype)
    gsr = jax.lax.dot_general(
        srow_ref[:].astype(mm_dtype), oh_s, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    grr = jax.lax.dot_general(
        rrow_ref[:].astype(mm_dtype), oh_r, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    if m_on_receiver:        # fwd: srow = tj [h], rrow = (ti, m) [2h]
        gs, gr, gm = gsr, grr[:heads], grr[heads:]
    else:                    # bwd/tb: srow = (ti, m) [2h], rrow = tj [h]
        gs, gr, gm = grr, gsr[:heads], gsr[heads:]
    q = _gat_slot_q(gs, gr, gm, sglb_ref[0, 0], rglb_ref[0, 0],
                    num_nodes, neg_slope)                       # [h, T]
    if rate > 0.0:
        hids = (perm_ref[0, 0].astype(jnp.uint32)[None, :]
                * np.uint32(heads)
                + jax.lax.broadcasted_iota(jnp.uint32, q.shape, 0))
        q = q * _hash_keep(hids, seed_ref[0], seed_ref[1], rate, 0) / (
            1.0 - rate)
    msg = jnp.dot(oh_s, x_ref[:].astype(mm_dtype),
                  preferred_element_type=jnp.float32, precision=prec)
    bc = _bcast_matrix(heads, x_ref.shape[1], jnp.float32)
    scale = jax.lax.dot_general(
        q, bc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mm_precision(jnp.float32))                   # [T, H]
    msg = msg * scale
    upd = jax.lax.dot_general(
        oh_r, msg.astype(mm_dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)

    @pl.when(first[t] == 1)
    def _():
        out_ref[:] = upd

    @pl.when(first[t] == 0)
    def _():
        out_ref[:] = out_ref[:] + upd


def _gat_coef_spmm_call(x, srow, rrow, seed, tiles, node_block, heads,
                        neg_slope, m_on_receiver, rate):
    n_tiles, T = tiles.sloc.shape
    V, H = x.shape
    lift = lambda a: a.reshape(n_tiles, 1, T)
    vec = pl.BlockSpec((1, 1, T), lambda t, i, j, f, s: (t, 0, 0),
                       memory_space=pltpu.VMEM)
    mm_dtype = jnp.bfloat16 if tiles.precision == "bf16" else jnp.float32
    ks, kr = srow.shape[0], rrow.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=[
            vec, vec, vec, vec, vec,
            pl.BlockSpec((ks, node_block), lambda t, i, j, f, s: (0, j[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kr, node_block), lambda t, i, j, f, s: (0, i[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((node_block, H), lambda t, i, j, f, s: (j[t], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((node_block, H),
                               lambda t, i, j, f, s: (i[t], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_gat_coef_spmm_kernel, mm_dtype=mm_dtype,
                          heads=heads, num_nodes=V, node_block=node_block,
                          neg_slope=neg_slope, m_on_receiver=m_on_receiver,
                          rate=rate),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((V, H), jnp.float32),
        interpret=_interpret(),
    )(tiles.iblk, tiles.jblk, tiles.first, seed.astype(jnp.uint32),
      lift(tiles.perm), lift(tiles.sglb), lift(tiles.rglb),
      lift(tiles.sloc), lift(tiles.rloc),
      srow.astype(jnp.float32), rrow.astype(jnp.float32),
      x.astype(mm_dtype))


def _gat_sddmm_chain_kernel(iarr, jarr, seed_ref, perm_ref, sglb_ref,
                            rglb_ref, sloc_ref, rloc_ref, tj_ref, rext_ref,
                            x_ref, w_ref, dtj_ref, dti_ref, *, mm_dtype,
                            heads, num_nodes, node_block, neg_slope, rate):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dtj_ref[:] = jnp.zeros_like(dtj_ref)
        dti_ref[:] = jnp.zeros_like(dti_ref)

    prec = _mm_precision(mm_dtype)
    oh_s = _onehot(sloc_ref[0, 0], node_block, mm_dtype)
    oh_r = _onehot(rloc_ref[0, 0], node_block, mm_dtype)
    a = jnp.dot(oh_r, w_ref[:].astype(mm_dtype),
                preferred_element_type=jnp.float32, precision=prec)
    b = jnp.dot(oh_s, x_ref[:].astype(mm_dtype),
                preferred_element_type=jnp.float32, precision=prec)
    bc = _bcast_matrix(heads, x_ref.shape[1], jnp.float32)
    dqm = jax.lax.dot_general(
        bc, a * b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mm_precision(jnp.float32))                   # [h, T]
    gs = jax.lax.dot_general(
        tj_ref[:].astype(mm_dtype), oh_s, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)     # [h, T]
    grx = jax.lax.dot_general(
        rext_ref[:].astype(mm_dtype), oh_r, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)     # [3h, T]
    gr, gm, gdD = grx[:heads], grx[heads:2 * heads], grx[2 * heads:]
    live = (sglb_ref[0, 0] != rglb_ref[0, 0]) & (
        sglb_ref[0, 0] < num_nodes)
    pre = gs + gr
    score = jnp.where(pre >= 0, pre, pre * neg_slope)
    q = jnp.where(live[None, :], jnp.exp(score - gm), 0.0)
    if rate > 0.0:
        hids = (perm_ref[0, 0].astype(jnp.uint32)[None, :]
                * np.uint32(heads)
                + jax.lax.broadcasted_iota(jnp.uint32, q.shape, 0))
        dqm = dqm * _hash_keep(hids, seed_ref[0], seed_ref[1], rate, 0) / (
            1.0 - rate)
    dq = dqm + gdD
    dscore = q * dq
    dpre = dscore * jnp.where(pre > 0, 1.0, neg_slope)
    dtj_ref[:, pl.ds(jarr[t] * node_block, node_block)] += jnp.dot(
        dpre.astype(mm_dtype), oh_s, preferred_element_type=jnp.float32,
        precision=prec)
    dti_ref[:, pl.ds(iarr[t] * node_block, node_block)] += jnp.dot(
        dpre.astype(mm_dtype), oh_r, preferred_element_type=jnp.float32,
        precision=prec)


def _gat_sddmm_chain_call(x, w, tj_rows, rext_rows, seed, tiles,
                          node_block, heads, neg_slope, rate):
    """One pass: dqm = per-head SDDMM(x, w) (dropout-masked), q recomputed
    in-kernel, dq = dqm + dD[r], dpre = q*dq*leaky', scattered into the
    sender (dtj) and receiver (dti) [heads, V] planes."""
    n_tiles, T = tiles.sloc.shape
    V, H = x.shape
    lift = lambda a: a.reshape(n_tiles, 1, T)
    vec = pl.BlockSpec((1, 1, T), lambda t, i, j, s: (t, 0, 0),
                       memory_space=pltpu.VMEM)
    mm_dtype = jnp.bfloat16 if tiles.precision == "bf16" else jnp.float32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            vec, vec, vec, vec, vec,
            _gat_rows_spec2(heads, node_block, "s"),
            _gat_rows_spec2(3 * heads, node_block, "r"),
            pl.BlockSpec((node_block, H), lambda t, i, j, s: (j[t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((node_block, H), lambda t, i, j, s: (i[t], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((heads, V), lambda t, i, j, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, V), lambda t, i, j, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        functools.partial(_gat_sddmm_chain_kernel, mm_dtype=mm_dtype,
                          heads=heads, num_nodes=V, node_block=node_block,
                          neg_slope=neg_slope, rate=rate),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((heads, V), jnp.float32),
                   jax.ShapeDtypeStruct((heads, V), jnp.float32)],
        interpret=_interpret(),
    )(tiles.iblk, tiles.jblk, seed.astype(jnp.uint32),
      lift(tiles.perm), lift(tiles.sglb), lift(tiles.rglb),
      lift(tiles.sloc), lift(tiles.rloc),
      tj_rows.astype(jnp.float32), rext_rows.astype(jnp.float32),
      x.astype(mm_dtype), w.astype(mm_dtype))


def _gat_rows_spec2(k, node_block, side):
    idx = ((lambda t, i, j, s: (0, j[t])) if side == "s"
           else (lambda t, i, j, s: (0, i[t])))
    return pl.BlockSpec((k, node_block), idx, memory_space=pltpu.VMEM)


def _tile_scatter_max_kernel(iarr, jarr, rloc_ref, val_ref, out_ref, *,
                             node_block, k):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, -1e30)

    # max is not a matmul: per head, broadcast the [T] slot values against
    # the [T, NB] receiver one-hot and reduce-max over slots (VPU).  K is a
    # small static head count, so the python loop unrolls.
    iota = jax.lax.broadcasted_iota(jnp.int32, rloc_ref[0, 0].shape
                                    + (node_block,), 1)
    oh = rloc_ref[0, 0][:, None] == iota                   # [T, NB] bool
    i0 = iarr[t] * node_block
    for kk in range(k):
        v = val_ref[0, kk]                                 # [T]
        upd = jnp.max(jnp.where(oh, v[:, None], -1e30), axis=0)
        cur = out_ref[kk, pl.ds(i0, node_block)]
        out_ref[kk, pl.ds(i0, node_block)] = jnp.maximum(cur, upd)


def tile_scatter_max(vals, tiles: SpmmTiles, num_nodes: int,
                     node_block: int = NODE_BLOCK):
    """Per-receiver max of per-slot values: [n_tiles, K, T] -> [K, V] f32,
    initialised to -1e30 (receivers with no live slots keep it).  Dead
    slots MUST already carry -1e30.  The output plane stays VMEM-resident
    across the grid (the GAT segment-softmax max pass)."""
    n_tiles, T = tiles.rloc.shape
    k = vals.shape[1]
    lift = lambda arr: arr.reshape(n_tiles, 1, T)
    vec_spec = pl.BlockSpec((1, 1, T), lambda t, i, j: (t, 0, 0),
                            memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, k, T), lambda t, i, j: (t, 0, 0),
                         memory_space=pltpu.VMEM)
    full = pl.BlockSpec((k, num_nodes), lambda t, i, j: (0, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[vec_spec, vspec],
        out_specs=full,
    )
    return pl.pallas_call(
        functools.partial(_tile_scatter_max_kernel, node_block=node_block,
                          k=k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, num_nodes), jnp.float32),
        interpret=_interpret(),
    )(tiles.iblk, tiles.jblk, lift(tiles.rloc), vals.astype(jnp.float32))


def _tile_scatter2_kernel(iarr, jarr, sloc_ref, rloc_ref, va_ref, vb_ref,
                          outa_ref, outb_ref, *, node_block, mm_dtype):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        outa_ref[:] = jnp.zeros_like(outa_ref)
        outb_ref[:] = jnp.zeros_like(outb_ref)

    prec = _mm_precision(mm_dtype)
    oh_s = _onehot(sloc_ref[0, 0], node_block, mm_dtype)   # [T, NB]
    oh_r = _onehot(rloc_ref[0, 0], node_block, mm_dtype)
    # ua[k, nb] = sum_t va[k, t] * oh_s[t, nb]
    ua = jnp.dot(va_ref[0].astype(mm_dtype), oh_s,
                 preferred_element_type=jnp.float32, precision=prec)
    ub = jnp.dot(vb_ref[0].astype(mm_dtype), oh_r,
                 preferred_element_type=jnp.float32, precision=prec)
    ja = jarr[t] * node_block
    ia = iarr[t] * node_block
    outa_ref[:, pl.ds(ja, node_block)] += ua
    outb_ref[:, pl.ds(ia, node_block)] += ub


def tile_scatter2(vals_a, vals_b, tiles: SpmmTiles, num_nodes: int,
                  node_block: int = NODE_BLOCK):
    """Accumulate per-slot values into a sender-indexed row-plane (vals_a
    [n_tiles, Ka, T] -> [Ka, V]) and a receiver-indexed row-plane (vals_b
    -> [Kb, V]) in one pass.  Both output planes stay VMEM-resident across
    the grid (constant out index, 32 KB at V=8192).  Dead slots MUST carry
    zeros."""
    n_tiles, T = tiles.sloc.shape
    ka, kb = vals_a.shape[1], vals_b.shape[1]
    lift = lambda arr: arr.reshape(n_tiles, 1, T)
    vec_spec = pl.BlockSpec((1, 1, T), lambda t, i, j: (t, 0, 0),
                            memory_space=pltpu.VMEM)
    vspec = lambda k: pl.BlockSpec((1, k, T), lambda t, i, j: (t, 0, 0),
                                   memory_space=pltpu.VMEM)
    full = lambda k: pl.BlockSpec((k, num_nodes), lambda t, i, j: (0, 0),
                                  memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[vec_spec, vec_spec, vspec(ka), vspec(kb)],
        out_specs=[full(ka), full(kb)],
    )
    mm_dtype = jnp.bfloat16 if tiles.precision == "bf16" else jnp.float32
    return pl.pallas_call(
        functools.partial(_tile_scatter2_kernel, node_block=node_block,
                          mm_dtype=mm_dtype),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ka, num_nodes), jnp.float32),
                   jax.ShapeDtypeStruct((kb, num_nodes), jnp.float32)],
        interpret=_interpret(),
    )(tiles.iblk, tiles.jblk, lift(tiles.sloc), lift(tiles.rloc),
      vals_a.astype(jnp.float32), vals_b.astype(jnp.float32))
