"""Native (C++) host-runtime components, loaded via ctypes.

The compute path is JAX/XLA/Pallas; the host runtime around it (batch
collation here) is native C++ — the analog of the reference's PyG/torch
native collation stack.  The library is built lazily with g++ on first use
and cached next to this file; everything degrades to the NumPy reference
implementation if no toolchain is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "pack.cpp")
_LIB = os.path.join(_HERE, "libcalpack.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded ctypes library, or None (NumPy fallback)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.pack_dense_batch.restype = ctypes.c_int
        lib.pack_dense_batch.argtypes = [
            f32p, i64p, i32p, i32p, i64p, i32p, i32p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, i64p, i32p, i32p,
        ]
        lib.pack_sparse_batch.restype = ctypes.c_int
        lib.pack_sparse_batch.argtypes = [
            f32p, i64p, i32p, i32p, i64p, i32p, i32p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, i32p, i32p, u8p, u8p, i32p, i32p, u8p,
        ]
        _lib = lib
    return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


class PackedDataset:
    """Whole-dataset concatenated arrays, built once for fast native packing.

    Edges are presorted by (receiver, sender) *within each graph* here, so a
    batch — whose per-slot flat-index bases increase monotonically — is a
    concatenation of sorted runs and needs NO per-batch sort (the sort was
    ~75% of packing cost)."""

    def __init__(self, graphs):
        self.n = len(graphs)
        self.feat = graphs[0].x.shape[1]
        self.node_off = np.zeros(self.n + 1, np.int64)
        self.edge_off = np.zeros(self.n + 1, np.int64)
        for i, g in enumerate(graphs):
            self.node_off[i + 1] = self.node_off[i] + g.num_nodes
            self.edge_off[i + 1] = self.edge_off[i] + g.num_edges
        self.all_x = np.ascontiguousarray(
            np.concatenate([g.x for g in graphs], axis=0), np.float32)
        recv = np.concatenate([g.receivers for g in graphs]).astype(np.int64)
        send = np.concatenate([g.senders for g in graphs]).astype(np.int64)
        gid = np.repeat(np.arange(self.n), np.diff(self.edge_off))
        order = np.lexsort((send, recv, gid))   # per-graph (recv, send) sort
        self.all_recv = np.ascontiguousarray(recv[order], np.int32)
        self.all_send = np.ascontiguousarray(send[order], np.int32)
        self.all_y = np.asarray([g.y for g in graphs], np.int32)

    def pack_dense(self, idx: np.ndarray, num_graphs: int, node_budget: int,
                   edge_budget: int):
        """-> (x, edge_flat_sorted, n_nodes, y) NumPy arrays."""
        lib = get_lib()
        idx = np.ascontiguousarray(idx, np.int32)
        bs = len(idx)
        x = np.empty((num_graphs, node_budget, self.feat), np.float32)
        edge_flat = np.empty(edge_budget, np.int64)
        n_nodes = np.empty(num_graphs, np.int32)
        y = np.empty(num_graphs, np.int32)
        if lib is not None:
            rc = lib.pack_dense_batch(
                _ptr(self.all_x, ctypes.c_float),
                _ptr(self.node_off, ctypes.c_int64),
                _ptr(self.all_recv, ctypes.c_int32),
                _ptr(self.all_send, ctypes.c_int32),
                _ptr(self.edge_off, ctypes.c_int64),
                _ptr(self.all_y, ctypes.c_int32),
                _ptr(idx, ctypes.c_int32), bs,
                self.feat, node_budget, edge_budget, num_graphs,
                _ptr(x, ctypes.c_float),
                _ptr(edge_flat, ctypes.c_int64),
                _ptr(n_nodes, ctypes.c_int32),
                _ptr(y, ctypes.c_int32),
            )
            if rc == -1:
                raise ValueError("graph exceeds node budget")
            if rc == -2:
                raise ValueError("batch exceeds edge budget")
            return x, edge_flat, n_nodes, y
        # NumPy fallback (same outputs)
        nb = node_budget
        sent = num_graphs * nb * nb
        x[:] = 0.0
        edge_flat[:] = sent
        n_nodes[:] = 0
        y[:] = 0
        e_off = 0
        for i, g in enumerate(idx):
            n0, n1 = self.node_off[g], self.node_off[g + 1]
            e0, e1 = self.edge_off[g], self.edge_off[g + 1]
            n, e = int(n1 - n0), int(e1 - e0)
            if n > nb:
                raise ValueError("graph exceeds node budget")
            if e_off + e > edge_budget:
                raise ValueError("batch exceeds edge budget")
            x[i, :n] = self.all_x[n0:n1]
            edge_flat[e_off:e_off + e] = (
                i * nb + self.all_recv[e0:e1].astype(np.int64)
            ) * nb + self.all_send[e0:e1]
            n_nodes[i] = n
            y[i] = self.all_y[g]
            e_off += e
        # already sorted: per-graph presorted runs with increasing bases
        return x, edge_flat, n_nodes, y

    def pack_sparse(self, idx: np.ndarray, num_graphs: int, num_nodes: int,
                    num_edges: int):
        """-> (x, senders, receivers, edge_mask, node_mask, node_graph, y,
        graph_mask) NumPy arrays (receiver-sorted edges)."""
        lib = get_lib()
        idx = np.ascontiguousarray(idx, np.int32)
        bs = len(idx)
        x = np.empty((num_nodes, self.feat), np.float32)
        senders = np.empty(num_edges, np.int32)
        receivers = np.empty(num_edges, np.int32)
        edge_mask = np.empty(num_edges, np.uint8)
        node_mask = np.empty(num_nodes, np.uint8)
        node_graph = np.empty(num_nodes, np.int32)
        y = np.empty(num_graphs, np.int32)
        graph_mask = np.empty(num_graphs, np.uint8)
        if lib is None:
            raise RuntimeError("native lib unavailable")  # caller falls back
        rc = lib.pack_sparse_batch(
            _ptr(self.all_x, ctypes.c_float),
            _ptr(self.node_off, ctypes.c_int64),
            _ptr(self.all_recv, ctypes.c_int32),
            _ptr(self.all_send, ctypes.c_int32),
            _ptr(self.edge_off, ctypes.c_int64),
            _ptr(self.all_y, ctypes.c_int32),
            _ptr(idx, ctypes.c_int32), bs,
            self.feat, num_nodes, num_edges, num_graphs,
            _ptr(x, ctypes.c_float),
            _ptr(senders, ctypes.c_int32),
            _ptr(receivers, ctypes.c_int32),
            _ptr(edge_mask, ctypes.c_uint8),
            _ptr(node_mask, ctypes.c_uint8),
            _ptr(node_graph, ctypes.c_int32),
            _ptr(y, ctypes.c_int32),
            _ptr(graph_mask, ctypes.c_uint8),
        )
        if rc != 0:
            raise ValueError("batch exceeds budgets")
        return (x, senders, receivers, edge_mask.astype(bool),
                node_mask.astype(bool), node_graph, y, graph_mask.astype(bool))
