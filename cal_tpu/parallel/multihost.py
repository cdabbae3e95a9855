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
