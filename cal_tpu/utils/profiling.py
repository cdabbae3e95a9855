"""Tracing / profiling hooks — new scope (reference has none, SURVEY.md §5).

* ``trace(dir)``: JAX profiler trace (XPlane; view in TensorBoard /
  xprof) around a code region.
* ``StepTimer``: lightweight rolling step timer + edges/s meter, usable in
  any training loop without device syncs (reads are explicit).
"""
from __future__ import annotations

import contextlib
import time
from collections import deque

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling throughput meter (host wall clock; call mark() per step)."""

    def __init__(self, window: int = 50):
        self.times = deque(maxlen=window)
        self._last = None

    def mark(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    @property
    def mean_step_s(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    def throughput(self, items_per_step: float) -> float:
        s = self.mean_step_s
        return items_per_step / s if s == s and s > 0 else float("nan")


# Per-generation hardware peaks for roofline accounting (per chip).
# v5e: 197 bf16 TFLOP/s MXU (f32 ~1/4 of bf16 on the MXU), 819 GB/s HBM.
HW_PEAKS = {
    "v5e": {"hbm_gbps": 819.0, "bf16_tflops": 197.0, "f32_tflops": 49.0},
    "v4": {"hbm_gbps": 1228.0, "bf16_tflops": 275.0, "f32_tflops": 68.0},
}


def tpu_generation(default: str = "v5e") -> str:
    import os

    return os.environ.get("PALLAS_AXON_TPU_GEN", default)


def spmm_roofline(
    num_live_edges: float,
    hidden: int,
    seconds: float,
    n_tiles: int | None = None,
    tile_edges: int | None = None,
    node_block: int | None = None,
    dtype: str = "f32",
    gen: str | None = None,
) -> dict:
    """Roofline accounting for one tiled-SpMM invocation (SURVEY.md §5:
    per-kernel counters; edges/s is the north-star metric).

    The tiled kernel's MXU work is 2 matmuls of [T, NB] x [NB, H] per tile
    (gather + scatter one-hots); its algorithmic HBM floor is one read of the
    gathered rows and one write of the output rows (~2 * E * H * 4 bytes).
    """
    peaks = HW_PEAKS[gen or tpu_generation()]
    out = {"edges_per_s": num_live_edges / seconds}
    if n_tiles and tile_edges and node_block:
        flops = 4.0 * n_tiles * tile_edges * node_block * hidden
        tflops = flops / seconds / 1e12
        peak = peaks[f"{dtype}_tflops"]
        out.update(mxu_tflops=tflops, pct_mxu_peak=100.0 * tflops / peak)
    bytes_floor = 2.0 * num_live_edges * hidden * 4.0
    gbps_floor = bytes_floor / seconds / 1e9
    out.update(hbm_gbps_floor=gbps_floor,
               pct_hbm_floor=100.0 * gbps_floor / peaks["hbm_gbps"])
    return out
