"""Host-side edge-partition planner for ``PartitionedGraphBatch``.

The reference framework scales nothing (single device, SURVEY.md §2.3); this
module is the build's context-parallel analog (SURVEY.md §5 "long-context"):
it partitions the batched disjoint-union mega-graph across a
``Mesh(('dp', 'edge'))`` so that

  * each ``dp`` group is an independent sub-batch (whole graphs only — no
    edge ever crosses a dp boundary);
  * within a group, nodes split into ``edge`` contiguous blocks and every
    edge is owned by its RECEIVER's shard, so scatter-adds and the GAT
    edge-softmax are shard-local (no cross-shard output reduction at all);
  * only boundary SENDER rows cross shards, via a precomputed halo plan:
    ``send_idx[p, d]`` = the rows shard ``p`` ships to shard ``d``.  Because
    graphs are small and packed contiguously, only graphs straddling a block
    boundary need halo rows — measured orders of magnitude below the naive
    per-layer [V, H] all_gather (see ``comms_stats``).

Device-side consumers live in parallel/edge_partition.py (halo_exchange +
partitioned aggregates, called from the model via layout dispatch).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cal_tpu.graph import HostGraph, PartitionedGraphBatch


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def partition_budgets(
    graphs: Sequence[HostGraph],
    batch_size: int,
    dp: int,
    n_edge: int,
    node_multiple: int = 8,
) -> dict:
    """Static budgets covering any ``batch_size``-graph batch drawn from
    ``graphs`` under sequential-block assignment of graphs to dp groups.

    Returns dict(num_graphs, node_budget, edge_budget_per_shard, halo_budget).
    """
    g_budget = _round_up(batch_size, dp)
    gg = g_budget // dp
    n_sorted = sorted((g.num_nodes for g in graphs), reverse=True)
    e_sorted = sorted((g.num_edges for g in graphs), reverse=True)
    # worst-case group: the gg largest graphs land in one group
    vg_need = sum(n_sorted[:gg]) + 1
    vl = _round_up(-(-vg_need // n_edge), node_multiple)
    node_budget = vl * n_edge * dp
    # worst-case shard: all of a group's edges target one block
    ep = _round_up(max(sum(e_sorted[:gg]), 1), 128)
    # a shard needs at most min(Vl, nodes of graphs straddling the boundary)
    # rows from any one peer; graphs <= Vl touch only adjacent blocks.
    halo = min(vl, _round_up(max(n_sorted[0], 1), 8))
    return {
        "num_graphs": g_budget,
        "node_budget": node_budget,
        "edge_budget_per_shard": ep,
        "halo_budget": halo,
    }


def partition_batch(
    graphs: Sequence[HostGraph],
    mesh,
    num_graphs: int,
    node_budget: int,
    edge_budget_per_shard: int,
    halo_budget: int,
    spmm_tiles: bool = False,
    node_block: int | None = None,
    tile_edges: int | None = None,
    device: bool = True,
) -> PartitionedGraphBatch:
    """Collate host graphs into a ``PartitionedGraphBatch`` for ``mesh``.

    ``device=False`` keeps every leaf a NumPy array (tile plans included) —
    the scan-epoch staging path stacks a whole epoch of host batches and
    ships ONE sharded transfer per leaf (parallel.shard_stacked), the same
    launch-latency fix the unsharded ``Loader.host_batches`` provides.

    Graph slot assignment is sequential-block: group k gets graphs
    [k*G/dp, (k+1)*G/dp) — slot ids equal input order, so single-device and
    partitioned runs see the SAME intervention permutation stream.

    ``spmm_tiles=True`` additionally builds PER-SHARD block-COO tile plans
    (ops/pallas_spmm.py) over each shard's local feature table
    ``[x_local (Vl rows); halo (n*S rows)]`` so dp/edge-sharded training
    keeps the Pallas SpMM — the plans use shard-local table indices, which
    is what the single-device ``GraphBatch.tiles`` (global indices) cannot
    give a sharded run.
    """
    dp, ne = mesh.shape["dp"], mesh.shape["edge"]
    n_shards = dp * ne
    big_g, ep, s_bud = num_graphs, edge_budget_per_shard, halo_budget
    if big_g % dp:
        raise ValueError(f"graph budget {big_g} not divisible by dp={dp}")
    if node_budget % n_shards:
        raise ValueError(
            f"node budget {node_budget} not divisible by {n_shards} shards")
    gg = big_g // dp
    vg = node_budget // dp
    vl = vg // ne
    if len(graphs) > big_g:
        raise ValueError(f"{len(graphs)} graphs > budget {big_g}")
    feat = graphs[0].x.shape[1]

    x = np.zeros((node_budget, feat), np.float32)
    node_mask = np.zeros(node_budget, bool)
    node_graph = np.full(node_budget, big_g, np.int32)
    y = np.zeros(big_g, np.int32)
    graph_mask = np.zeros(big_g, bool)

    senders_tab = np.zeros((n_shards, ep), np.int32)
    senders_glb = np.zeros((n_shards, ep), np.int32)
    receivers = np.full((n_shards, ep), vl - 1, np.int32)
    edge_mask = np.zeros((n_shards, ep), bool)
    send_idx = np.zeros((n_shards, ne, s_bud), np.int32)
    send_mask = np.zeros((n_shards, ne, s_bud), bool)

    for k in range(dp):
        chunk = graphs[k * gg : (k + 1) * gg]
        n_off = 0
        s_parts, r_parts = [], []
        for j, gr in enumerate(chunk):
            n = gr.num_nodes
            if n_off + n > vg:
                raise ValueError(
                    f"dp group {k} needs >{vg} nodes — raise node_budget")
            slot = k * gg + j
            rows = slice(k * vg + n_off, k * vg + n_off + n)
            x[rows] = gr.x
            node_mask[rows] = True
            node_graph[rows] = slot
            s_parts.append(np.asarray(gr.senders, np.int64) + n_off)
            r_parts.append(np.asarray(gr.receivers, np.int64) + n_off)
            y[slot] = gr.y
            graph_mask[slot] = True
            n_off += n
        s = np.concatenate(s_parts) if s_parts else np.zeros(0, np.int64)
        r = np.concatenate(r_parts) if r_parts else np.zeros(0, np.int64)
        order = np.argsort(r, kind="stable")
        s, r = s[order], r[order]
        s_owner_all = s // vl
        r_owner = r // vl
        for es in range(ne):
            gid = k * ne + es
            sel = r_owner == es
            e_s, e_r = s[sel], r[sel]
            if len(e_s) > ep:
                raise ValueError(
                    f"shard ({k},{es}) owns {len(e_s)} edges > budget {ep}")
            s_owner = s_owner_all[sel]
            tab = np.zeros(len(e_s), np.int32)
            local = s_owner == es
            tab[local] = (e_s[local] - es * vl).astype(np.int32)
            for p in range(ne):
                if p == es:
                    continue
                selp = s_owner == p
                if not selp.any():
                    continue
                uniq = np.unique(e_s[selp])
                if len(uniq) > s_bud:
                    raise ValueError(
                        f"shard ({k},{es}) needs {len(uniq)} halo rows from "
                        f"shard {p} > halo budget {s_bud}")
                src_gid = k * ne + p
                send_idx[src_gid, es, : len(uniq)] = (
                    uniq - p * vl).astype(np.int32)
                send_mask[src_gid, es, : len(uniq)] = True
                pos = np.searchsorted(uniq, e_s[selp])
                tab[selp] = (vl + p * s_bud + pos).astype(np.int32)
            senders_tab[gid, : len(e_s)] = tab
            senders_glb[gid, : len(e_s)] = e_s.astype(np.int32)
            receivers[gid, : len(e_s)] = (e_r - es * vl).astype(np.int32)
            edge_mask[gid, : len(e_s)] = True

    tiles = None
    if spmm_tiles:
        from cal_tpu.ops import pallas_spmm as _ps

        nb_blk = node_block or _ps.NODE_BLOCK
        te = tile_edges or _ps.TILE_EDGES
        # plans index the shard's feature table [x_local; halo], padded to a
        # node-block boundary (edge_partition._gcn_tiled_body pads to match)
        table_pad = _round_up(vl + ne * s_bud, nb_blk)
        budget = _ps.tile_budget_for(ep, table_pad, nb_blk, te)
        plans_f, plans_b = [], []
        for gid in range(n_shards):
            s_tab, recv = senders_tab[gid], receivers[gid]
            plans_f.append(_ps.build_tiles(
                s_tab, recv, table_pad, nb_blk, te, budget, device=device))
            plans_b.append(_ps.build_tiles(
                recv, s_tab, table_pad, nb_blk, te, budget, device=device))
        _stk = jnp.stack if device else np.stack
        stack = lambda plans: jax.tree.map(lambda *xs: _stk(xs), *plans)
        tiles = (stack(plans_f), stack(plans_b))

    put = jnp.asarray if device else np.asarray
    return PartitionedGraphBatch(
        x=put(x),
        node_mask=put(node_mask),
        node_graph=put(node_graph),
        senders_tab=put(senders_tab.reshape(-1)),
        senders_glb=put(senders_glb.reshape(-1)),
        receivers=put(receivers.reshape(-1)),
        edge_mask=put(edge_mask.reshape(-1)),
        send_idx=put(send_idx),
        send_mask=put(send_mask),
        y=put(y),
        graph_mask=put(graph_mask),
        tiles=tiles,
        mesh=mesh,
    )


def comms_stats(pb: PartitionedGraphBatch, feat_bytes: int = 4) -> dict:
    """Per-layer boundary-exchange traffic vs the naive all_gather.

    ``halo_rows`` counts real (masked-in) rows actually shipped across all
    shards for ONE halo exchange of an H-wide feature array;
    ``allgather_rows`` is what the naive design ships ((n-1) * V rows).
    """
    n_edge = pb.n_edge_shards
    halo_rows = int(np.asarray(pb.send_mask).sum())
    v = pb.num_nodes
    return {
        "halo_rows": halo_rows,
        "halo_bytes_per_feat_col": halo_rows * feat_bytes,
        "allgather_rows": (n_edge - 1) * v,
        "reduction_vs_allgather": (
            ((n_edge - 1) * v) / max(halo_rows, 1)),
    }
