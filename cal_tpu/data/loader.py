"""Static-shape batching loader (replaces PyG DataLoader, train_causal.py:13-15).

XLA needs static shapes, so budgets are fixed per loader:
* dense layout: node budget N = max graph size rounded up to a multiple of 8
  lanes-friendly size; batches ship as PackedDenseBatch (compact edges).
* sparse layout: node/edge budgets sized for the worst batch (sum of the
  ``batch_size`` largest graphs) so no recompilation ever triggers.

Every epoch yields ceil(len/batch_size) batches; the last one is padded and
masked (the reference's dynamic last batch, handled statically).
"""
from __future__ import annotations

import dataclasses
import math
import queue
import threading
from typing import Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cal_tpu.graph import (
    GraphBatch,
    HostGraph,
    PackedDenseBatch,
    batch_graphs,
    pack_dense,
    pack_from_arrays,
    pad_sizes_for,
)
from cal_tpu.native import PackedDataset, get_lib


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def compute_packed_budgets(
    graphs: Sequence[HostGraph], batch_size: int, headroom: float = 1.25
) -> dict:
    """Budgets for budget-PACKED sparse batching (heavy-tailed datasets).

    The worst-case budget (``pad_sizes_for``: sum of the ``batch_size``
    largest graphs) is the right contract for near-uniform graph sizes, but
    on a heavy-tailed distribution like REDDIT it pads every batch to ~4x
    the mean batch — 4x wasted compute on masked rows.  The TPU-native
    answer is the same as token-budget sequence packing in LLM training:
    fix node/edge budgets near the MEAN batch (x ``headroom``) and let the
    loader close a batch early when the next graph would overflow, so
    ``batch_size`` becomes an upper bound on graphs per batch.  Epochs are
    padded to a fixed step count with fully-masked batches (gated to
    no-ops in train/steps.py) so one XLA program serves every epoch."""
    ns = np.array([g.num_nodes for g in graphs], np.int64)
    es = np.array([g.num_edges for g in graphs], np.int64)
    node_budget = int(max(headroom * batch_size * ns.mean(), ns.max() + 1))
    edge_budget = int(max(headroom * batch_size * es.mean(), es.max(), 1))
    return {
        "node_budget": _round_up(node_budget, 128),
        "edge_budget": _round_up(edge_budget, 128),
        "pack": True,
        "max_graph_nodes": int(ns.max()),
    }


def compute_budgets(
    graphs: Sequence[HostGraph], batch_size: int, layout: str,
    pack: bool = False,
) -> dict:
    """Static budgets covering any batch drawn from ``graphs``."""
    if pack:
        if layout != "sparse":
            raise ValueError("budget-packed batching is sparse-layout only")
        return compute_packed_budgets(graphs, batch_size)
    if layout == "dense":
        node_budget = _round_up(max(g.num_nodes for g in graphs), 8)
        # lane alignment: a 128-multiple N makes every [B, N, N] Pallas
        # block DMA contiguous full lanes (measured 3x the flash-GAT DMA
        # floor at N=248 vs 256, benchmarks/sweep_gat_flash_phases.py);
        # only take it when the padding waste stays small.
        aligned = _round_up(node_budget, 128)
        if aligned <= 1.15 * node_budget:
            node_budget = aligned
        e_sorted = sorted((g.num_edges for g in graphs), reverse=True)
        edge_budget = _round_up(max(sum(e_sorted[:batch_size]), 1), 128)
        return {"node_budget": node_budget, "edge_budget": edge_budget,
                "edge_per_graph": max(e_sorted[0], 1)}
    pad_n, pad_e = pad_sizes_for(graphs, batch_size)
    return {"node_budget": pad_n, "edge_budget": pad_e,
            "max_graph_nodes": max(g.num_nodes for g in graphs)}


_DONE = object()


class Loader:
    """Shuffling, padding, static-shape batch iterator.

    Collation runs through the native C++ packer (cal_tpu/native/pack.cpp,
    NumPy fallback) over whole-dataset concatenated arrays, and a background
    prefetch thread overlaps host packing + H2D transfer with device compute
    — the analog of the reference's torch DataLoader workers (which it left
    at the num_workers=0 default, reference train_causal.py:13-15).
    """

    def __init__(
        self,
        graphs: Sequence[HostGraph],
        batch_size: int,
        shuffle: bool = False,
        layout: str = "dense",
        budgets: dict | None = None,
        seed: int = 0,
        drop_remainder: bool = False,
        prefetch: int = 2,
        spmm_tiles: bool | str = False,
        spmm_precision: str = "f32",
    ):
        assert layout in ("dense", "sparse")
        assert spmm_tiles in (True, False, "auto")
        assert spmm_precision in ("f32", "bf16")
        self.graphs = list(graphs)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.layout = layout
        self.budgets = dict(
            budgets or compute_budgets(graphs, batch_size, layout))
        self.rng = np.random.default_rng(seed)
        self.drop_remainder = drop_remainder
        self.prefetch = prefetch
        self.spmm_precision = spmm_precision
        self._packed: PackedDataset | None = None
        self.pack = bool(self.budgets.get("pack", False))
        if self.pack:
            if layout != "sparse":
                raise ValueError("pack budgets require layout='sparse'")
            if drop_remainder:
                raise ValueError("pack mode keeps every graph per epoch")
            self._sizes_n = np.array([g.num_nodes for g in self.graphs],
                                     np.int64)
            self._sizes_e = np.array([g.num_edges for g in self.graphs],
                                     np.int64)
            # Fixed step count per epoch (one compiled scan program): max of
            # the identity order + 16 simulated shuffles, +1 slack.  _chunks
            # re-draws the permutation in the rare tail where a shuffle packs
            # worse than every simulation.
            sim = np.random.default_rng(seed ^ 0x5EED)
            self._sim_chunkings = [
                self._pack_chunks(np.arange(len(self.graphs)))]
            for _ in range(16):
                self._sim_chunkings.append(self._pack_chunks(
                    sim.permutation(len(self.graphs))))
            counts = [len(c) for c in self._sim_chunkings]
            self._steps_budget = max(counts) + 1
            # pad batches are optimizer no-ops (train/steps.py _gate_state):
            # LR schedules should count REAL steps, not the padded budget
            self._sched_steps = max(int(round(float(np.mean(counts)))), 1)
        if spmm_tiles == "auto":
            # The tiled kernel wins when its slots run reasonably full
            # (each slot costs fixed MXU work); on small batches XLA's
            # segment ops are already cheap.  Pack mode measures the REAL
            # tile count on simulated epochs (count_tiles — the worst-case
            # banded bound is far too pessimistic for graph-contiguous
            # batches, r4); the non-pack estimate keeps the worst-case
            # bound.  Threshold 0.25: SYNREDDIT measures ~0.34 real fill
            # and the XLA sparse step there is 51 ms of scalar gathers
            # (benchmarks/profile_step ... sparse), so moderately-filled
            # tiles win big; the near-empty regime stays off.
            if self.budgets["node_budget"] < 2048:
                spmm_tiles = False
            elif self.pack:
                spmm_tiles = self._sim_tile_fill() >= 0.25
            else:
                spmm_tiles = self._tile_fill_estimate() >= 0.35
        self.spmm_tiles = bool(spmm_tiles) and layout == "sparse"
        if self.spmm_tiles:
            # Block-COO plans need the node budget on a node-block boundary
            # and a static tile budget so no batch ever recompiles.
            from cal_tpu.ops import pallas_spmm as _ps

            self._node_block = _ps.NODE_BLOCK
            self._tile_edges = _ps.TILE_EDGES
            self.budgets["node_budget"] = _round_up(
                self.budgets["node_budget"], self._node_block)
            if self.pack:
                # data-driven budget: max real tiles over the simulated
                # chunkings (+slack); _chunks() re-draws the shuffle in
                # the rare tail where an epoch packs worse
                self._tile_budget = self._sim_tile_budget() + 16
            else:
                self._tile_budget = _ps.tile_budget_for(
                    self.budgets["edge_budget"], self.budgets["node_budget"],
                    self._node_block, self._tile_edges,
                    max_graph_nodes=self.budgets.get("max_graph_nodes"))

    def _chunk_tile_count(self, idx: np.ndarray) -> int:
        """Real tile count of one packed chunk's edge structure (incl. the
        padded-edge run that targets the last node slot)."""
        from cal_tpu.ops import pallas_spmm as _ps

        nbud = _round_up(self.budgets["node_budget"], _ps.NODE_BLOCK)
        if idx.size:
            ns = self._sizes_n[idx]
            offs = np.concatenate([[0], np.cumsum(ns[:-1])])
            s = np.concatenate([self.graphs[j].senders + o
                                for j, o in zip(idx, offs)])
            r = np.concatenate([self.graphs[j].receivers + o
                                for j, o in zip(idx, offs)])
        else:
            s = r = np.zeros((0,), np.int64)
        pad = self.budgets["edge_budget"] - s.shape[0]
        n_pad_tiles = -(-pad // _ps.TILE_EDGES) + 1 if pad > 0 else 0
        return _ps.count_tiles(s, r, nbud) + n_pad_tiles

    def _sim_tile_budget(self) -> int:
        """Max real tile count over the simulated pack chunkings."""
        if not hasattr(self, "_sim_tiles_max"):
            # default=1 covers an empty dataset (e.g. a degenerate k-fold
            # split): one all-padding tile per plan instead of a bare
            # max()-of-nothing crash
            self._sim_tiles_max = max(
                (self._chunk_tile_count(c)
                 for chunks in self._sim_chunkings[:6] for c in chunks),
                default=1)
        return self._sim_tiles_max

    def _sim_tile_fill(self) -> float:
        """Expected live-edge slot fill from the SIMULATED tile counts."""
        from cal_tpu.ops import pallas_spmm as _ps

        mean_live = (sum(int(self._sizes_e[c].sum())
                         for c in self._sim_chunkings[0])
                     / max(len(self._sim_chunkings[0]), 1))
        return mean_live / (self._sim_tile_budget() * _ps.TILE_EDGES)

    def _tile_fill_estimate(self) -> float:
        """Expected live-edge fraction of the block-COO tile slots."""
        from cal_tpu.ops import pallas_spmm as _ps

        nb = _round_up(self.budgets["node_budget"], _ps.NODE_BLOCK)
        budget = _ps.tile_budget_for(
            self.budgets["edge_budget"], nb, _ps.NODE_BLOCK, _ps.TILE_EDGES,
            max_graph_nodes=self.budgets.get("max_graph_nodes"))
        return self.budgets["edge_budget"] / (budget * _ps.TILE_EDGES)

    def _build_tiles(self, senders: np.ndarray, receivers: np.ndarray,
                     edge_mask: np.ndarray | None = None):
        from cal_tpu.ops import pallas_spmm as _ps

        nb = self.budgets["node_budget"]
        kw = dict(node_block=self._node_block, tile_edges=self._tile_edges,
                  tile_budget=self._tile_budget, edge_mask=edge_mask,
                  precision=self.spmm_precision)
        return (_ps.build_tiles(senders, receivers, nb, **kw),
                _ps.build_tiles(receivers, senders, nb, **kw))

    def __len__(self) -> int:
        if self.pack:
            return self._steps_budget
        n = len(self.graphs)
        return n // self.batch_size if self.drop_remainder else math.ceil(
            n / self.batch_size
        )

    def _pack_chunks(self, order: np.ndarray) -> list:
        """Greedy budget packing: close a batch when the next graph would
        overflow the node/edge budget or the graph-count cap."""
        nb, eb = self.budgets["node_budget"], self.budgets["edge_budget"]
        bs = self.batch_size
        chunks, cur, cn, ce = [], [], 0, 0
        for j in order:
            n, e = int(self._sizes_n[j]), int(self._sizes_e[j])
            if cur and (cn + n > nb or ce + e > eb or len(cur) == bs):
                chunks.append(np.asarray(cur))
                cur, cn, ce = [], 0, 0
            cur.append(int(j))
            cn += n
            ce += e
        if cur:
            chunks.append(np.asarray(cur))
        return chunks

    @property
    def num_graphs(self) -> int:
        return len(self.graphs)

    @property
    def schedule_steps(self) -> int:
        """Optimizer steps per epoch (excludes pack-mode pad batches)."""
        return self._sched_steps if self.pack else len(self)

    @property
    def packed(self) -> PackedDataset:
        if self._packed is None:
            self._packed = PackedDataset(self.graphs)
        return self._packed

    def _make_batch(self, idx: np.ndarray):
        bs = self.batch_size
        nb, eb = self.budgets["node_budget"], self.budgets["edge_budget"]
        if self.layout == "dense":
            x, edge_flat, n_nodes, y = self.packed.pack_dense(idx, bs, nb, eb)
            return pack_from_arrays(x, edge_flat, n_nodes, y,
                                    eg_budget=self.budgets.get(
                                        "edge_per_graph", 0))
        if get_lib() is not None:
            (x, s, r, em, nm, ng, y, gm) = self.packed.pack_sparse(
                idx, bs, nb, eb)
            tiles = self._build_tiles(s, r, em) if self.spmm_tiles else None
            return GraphBatch(
                x=jnp.asarray(x), senders=jnp.asarray(s),
                receivers=jnp.asarray(r), edge_mask=jnp.asarray(em),
                node_mask=jnp.asarray(nm), node_graph=jnp.asarray(ng),
                y=jnp.asarray(y), graph_mask=jnp.asarray(gm), tiles=tiles,
            )
        chunk = [self.graphs[j] for j in idx]
        batch = batch_graphs(chunk, bs, nb, eb)
        if self.spmm_tiles:
            tiles = self._build_tiles(jax.device_get(batch.senders),
                                      jax.device_get(batch.receivers),
                                      jax.device_get(batch.edge_mask))
            batch = dataclasses.replace(batch, tiles=tiles)
        return batch

    def _make_batch_host(self, idx: np.ndarray):
        """One batch with NumPy leaves (no per-leaf H2D transfer).

        The scan-epoch paths stack a whole epoch of these on host and ship
        ONE array per leaf: on the tunneled TPU backend each device_put has
        ~ms fixed latency, so an epoch of B batches x L leaves as individual
        transfers (the ``__iter__`` path) costs seconds of pure launch
        overhead at small-graph scale — measured 10x the device compute on
        the SYNNCI fold-parallel run."""
        bs = self.batch_size
        nb, eb = self.budgets["node_budget"], self.budgets["edge_budget"]
        if self.layout == "dense":
            x, edge_flat, n_nodes, y = self.packed.pack_dense(idx, bs, nb, eb)
            idx_dtype = (np.int32 if bs * nb * nb < 2**31 else np.int64)
            return PackedDenseBatch(
                x=x, edge_flat=np.asarray(edge_flat, idx_dtype),
                n_nodes=n_nodes, y=y,
                eg_budget=self.budgets.get("edge_per_graph", 0))
        if get_lib() is not None:
            (x, s, r, em, nm, ng, y, gm) = self.packed.pack_sparse(
                idx, bs, nb, eb)
            tiles = None
            if self.spmm_tiles:
                from cal_tpu.ops import pallas_spmm as _ps

                # SLIM plans: only perm + block ids cross the host->device
                # boundary; the [n, T] slot arrays are derived on device
                # (steps.hydrate_stacked) — 5x fewer epoch-stack tile
                # bytes, and the tunneled backend retains one host copy
                # of every transferred buffer (build_tiles docstring).
                kw = dict(node_block=self._node_block,
                          tile_edges=self._tile_edges,
                          tile_budget=self._tile_budget, device=False,
                          edge_mask=em, precision=self.spmm_precision,
                          slim=True)
                tiles = (_ps.build_tiles(s, r, nb, **kw),
                         _ps.build_tiles(r, s, nb, **kw))
            return GraphBatch(x=x, senders=s, receivers=r, edge_mask=em,
                              node_mask=nm, node_graph=ng, y=y,
                              graph_mask=gm, tiles=tiles)
        # no native packer: reuse the device path, pull back to host once
        return jax.tree.map(np.asarray, self._make_batch(idx))

    def host_batches(self) -> Iterator:
        """One epoch of NumPy-leaf batches (same shuffle stream as
        ``__iter__``); pair with steps.stack_batches_host + to_device."""
        for idx in self._chunks():
            yield self._make_batch_host(idx)

    def _chunks(self):
        order = np.arange(len(self.graphs))
        if self.pack:
            for _ in range(32):
                if self.shuffle:
                    order = self.rng.permutation(len(self.graphs))
                chunks = self._pack_chunks(order)
                ok = len(chunks) <= self._steps_budget
                if ok and self.spmm_tiles:
                    ok = all(self._chunk_tile_count(c) <= self._tile_budget
                             for c in chunks)
                if ok:
                    break
                if not self.shuffle:  # identity order is in the simulation
                    raise AssertionError("unreachable: identity pack grew")
            else:
                raise RuntimeError(
                    "budget packing exceeded steps/tile budget 32 shuffles "
                    "in a row — budgets too tight for this dataset")
            pad = self._steps_budget - len(chunks)
            return chunks + [np.empty((0,), np.int64)] * pad
        if self.shuffle:
            self.rng.shuffle(order)
        bs = self.batch_size
        return [order[i * bs : (i + 1) * bs] for i in range(len(self))]

    def __iter__(self) -> Iterator:
        chunks = self._chunks()
        if not self.prefetch:
            for idx in chunks:
                yield self._make_batch(idx)
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)

        def producer():
            try:
                for idx in chunks:
                    q.put(self._make_batch(idx))
                q.put(_DONE)
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _DONE:
                break
            if isinstance(item, BaseException):
                raise item
            yield item


class PartitionedLoader(Loader):
    """Loader yielding ``PartitionedGraphBatch`` for a ``Mesh(('dp','edge'))``.

    The host planner (parallel/partition.py) runs in the prefetch thread, so
    edge-partition planning overlaps device compute exactly like packing does
    for the single-device layouts.  Batches come out unsharded; the trainer
    device-puts them with ``parallel.mesh.shard_batch`` (or stacks them and
    uses ``shard_stacked`` for the scan-epoch path).
    """

    def __init__(
        self,
        graphs: Sequence[HostGraph],
        batch_size: int,
        mesh,
        shuffle: bool = False,
        budgets: dict | None = None,
        seed: int = 0,
        drop_remainder: bool = False,
        prefetch: int = 2,
        spmm_tiles: bool | str = False,
    ):
        from cal_tpu.parallel.partition import partition_budgets

        assert spmm_tiles in (True, False, "auto")
        self.graphs = list(graphs)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.layout = "partitioned"
        self.mesh = mesh
        dp, ne = mesh.shape["dp"], mesh.shape["edge"]
        self.budgets = dict(
            budgets or partition_budgets(self.graphs, batch_size, dp, ne))
        self.rng = np.random.default_rng(seed)
        self.drop_remainder = drop_remainder
        self.prefetch = prefetch
        self._packed = None
        self.pack = False  # budget packing is single-device-layout only
        if spmm_tiles == "auto":
            # same crossover as the single-device loader, at PER-SHARD scale
            # (Vl rows per shard own the scatter ranges)
            vl = self.budgets["node_budget"] // (dp * ne)
            spmm_tiles = vl >= 2048
        self.spmm_tiles = bool(spmm_tiles)

    def _make_batch_host(self, idx: np.ndarray):
        """NumPy-leaf partitioned batch — pair with steps.stack_batches_host
        + parallel.shard_stacked: the scan-epoch path stacks a whole epoch on
        host and ships one sharded transfer per leaf, the same fix for
        per-batch device_put launch latency the unsharded Loader has."""
        return self._partition(idx, device=False)

    def _make_batch(self, idx: np.ndarray):
        return self._partition(idx, device=True)

    def _partition(self, idx: np.ndarray, device: bool):
        from cal_tpu.parallel.partition import partition_batch

        chunk = [self.graphs[j] for j in idx]
        b = self.budgets
        return partition_batch(
            chunk, self.mesh, b["num_graphs"], b["node_budget"],
            b["edge_budget_per_shard"], b["halo_budget"],
            spmm_tiles=self.spmm_tiles, device=device,
        )
