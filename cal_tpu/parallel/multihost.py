"""Multi-host runtime — SPMD across hosts of a TPU pod slice (new scope;
the reference is single-process, SURVEY.md §2.3).

Usage on every host of the slice:

    from cal_tpu.parallel import multihost
    multihost.initialize()                      # jax.distributed handshake
    mesh = make_mesh()                          # global mesh over all chips
    shard = multihost.host_batch_slice(len(graphs))   # this host's data range

Each host feeds only its slice of every global batch;
``jax.make_array_from_process_local_data`` (used by ``global_batch``)
assembles the logically-global sharded batch that jit consumes.  Collectives
then ride ICI within the slice and DCN across slices — no NCCL/MPI analog.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cal_tpu.parallel.mesh import batch_pspecs


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize with TPU auto-detection defaults.

    No-op when the runtime is already initialized or single-process."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        pass  # already initialized / single-process local run


def host_batch_slice(global_batch_size: int) -> slice:
    """The contiguous range of graph slots this host must feed."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch_size // n
    if per * n != global_batch_size:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by {n} hosts")
    return slice(i * per, (i + 1) * per)


def global_batch(local_batch, mesh: Mesh):
    """Assemble a logically-global dp-sharded batch from this host's local
    shard (each host passes its own ``local_batch`` with identical shapes)."""
    specs = batch_pspecs(local_batch)

    def assemble(x, spec):
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x)
        )

    return jax.tree.map(assemble, local_batch, specs)


def global_stacked(stacked, mesh: Mesh):
    """Assemble a logically-global dp-sharded packed epoch stack
    (``train.steps.stack_batches_host`` result: leading scan axis,
    per-batch dims as in ``batch_pspecs``).

    The packed-epoch contract is that the pack plan is a pure function of
    (dataset, seed), so EVERY host builds the same full stacked epoch and
    contributes only its contiguous dp slice of each sharded axis here —
    the multi-host analog of ``parallel.shard_stacked`` (at
    ``process_count == 1`` the two produce identical arrays;
    tests/test_multihost.py).  Plans that don't survive dp sharding (block-
    COO tile plans index the global node space) are stripped exactly as in
    the single-process path (``mesh.normalize_for_mesh``)."""
    from cal_tpu.parallel.mesh import normalize_for_mesh

    stacked = normalize_for_mesh(stacked)
    specs = batch_pspecs(stacked)
    n, i = jax.process_count(), jax.process_index()

    def assemble(x, spec):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P(None, *spec))
        if len(spec) and spec[0] is not None:   # axis 0 is the scan axis
            per, rem = divmod(x.shape[1], n)
            if rem:
                raise ValueError(
                    f"sharded dim {x.shape[1]} not divisible by {n} hosts")
            x = x[:, i * per:(i + 1) * per]
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(assemble, stacked, specs)
