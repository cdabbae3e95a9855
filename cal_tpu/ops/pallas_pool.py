"""One-hot MXU graph pooling (Pallas / Mosaic TPU).

``global_add_pool`` (PyG, reference model.py:115-116) is a segment-sum of
node features by graph id.  XLA lowers it to a scatter-add that ran at
~29 GB/s on the packed SYNREDDIT-scale step (0.58 ms per pool at
[V=65536, H=128] bf16, benchmarks/profile_step r5) — the same
latency-bound row-DMA failure mode the SpMM kernels exist to avoid.  Since
``node_graph`` is sorted and graphs are contiguous, the pool is a tiny
matmul per node block:

    out[G1, H] += onehot(node_graph_block)[NB, G1]^T @ x_block[NB, H]

with the one-hot built in-register (broadcasted-iota compare) and the
[G1, H] f32 output VMEM-resident across the whole grid.  The backward is
the transposed product per block: dx_block = onehot @ dpooled, with
dpooled resident.  HBM traffic collapses to one read of x (fwd) / one
write of dx (bwd).

Padded nodes carry ``node_graph == num_graphs`` and land in the trash row
``G1 - 1``, which the caller slices off — identical contract to the
segment-sum path (ops/attention.py global_add_pool).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cal_tpu.ops.pallas_spmm import _interpret, _mm_precision

_BLOCK = 512


def _onehot_g(ng, g1, dtype):
    iota = jax.lax.broadcasted_iota(jnp.int32, (ng.shape[0], g1), 1)
    return (ng[:, None] == iota).astype(dtype)


def _pool_fwd_kernel(ng_ref, x_ref, out_ref, *, g1, mm_dtype):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    oh = _onehot_g(ng_ref[0, 0], g1, mm_dtype)             # [NB, G1]
    out_ref[:] += jax.lax.dot_general(
        oh, x_ref[:].astype(mm_dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mm_precision(mm_dtype))


def _pool_bwd_kernel(ng_ref, gp_ref, dx_ref, *, g1, mm_dtype):
    oh = _onehot_g(ng_ref[0, 0], g1, mm_dtype)
    dx_ref[:] = jnp.dot(oh, gp_ref[:].astype(mm_dtype),
                        preferred_element_type=jnp.float32,
                        precision=_mm_precision(mm_dtype))


def pool_supported(v: int, h: int) -> bool:
    """Static dispatch guard: node count must tile into MXU-friendly
    blocks and the feature dim must fill the lanes."""
    return v % _BLOCK == 0 and h % 128 == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def mxu_pool(x, node_graph, num_segments):
    """segment_sum(x, node_graph, num_segments) as per-block one-hot MXU
    matmuls — [V, H] -> [num_segments, H] f32.  Requires
    ``pool_supported(V, H)``."""
    out, _ = _mxu_pool_fwd(x, node_graph, num_segments)
    return out


def _pool_call(x, node_graph, g1, mm_dtype):
    v, h = x.shape
    n = v // _BLOCK
    ng = node_graph.astype(jnp.int32).reshape(n, 1, _BLOCK)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1, _BLOCK), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK, h), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g1, h), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_pool_fwd_kernel, g1=g1, mm_dtype=mm_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g1, h), jnp.float32),
        interpret=_interpret(),
    )(ng, x.astype(mm_dtype))


def _mxu_pool_fwd(x, node_graph, num_segments):
    mm_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    out = _pool_call(x, node_graph, num_segments, mm_dtype)
    # residuals must be arrays: a zero-size sentinel carries x's dtype
    return out, (node_graph, jnp.zeros((0,), x.dtype))


def _mxu_pool_bwd(num_segments, res, gout):
    node_graph, dt = res
    xdtype = dt.dtype
    mm_dtype = jnp.bfloat16 if xdtype == jnp.bfloat16 else jnp.float32
    v, h = node_graph.shape[0], gout.shape[1]
    n = v // _BLOCK
    ng = node_graph.astype(jnp.int32).reshape(n, 1, _BLOCK)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1, _BLOCK), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_segments, h), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK, h), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
    )
    dx = pl.pallas_call(
        functools.partial(_pool_bwd_kernel, g1=num_segments,
                          mm_dtype=mm_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v, h), jnp.float32),
        interpret=_interpret(),
    )(ng, gout.astype(jnp.float32))
    return (dx.astype(xdtype),
            np.zeros(node_graph.shape, jax.dtypes.float0))


mxu_pool.defvjp(_mxu_pool_fwd, _mxu_pool_bwd)
