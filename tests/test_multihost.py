"""Multi-host runtime helpers (parallel/multihost.py) — single-process
semantics on the 8-device CPU mesh.

True multi-process behavior needs N hosts; what CAN be validated here is the
host-side contract every process relies on: slice arithmetic, the
``global_batch`` assembly path (``jax.make_array_from_process_local_data``
degenerates to a plain sharded device_put at process_count=1), and that the
assembled batch is consumable by the dp train step unchanged.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cal_tpu.data.loader import Loader, compute_budgets
from cal_tpu.parallel import make_mesh
from cal_tpu.parallel import multihost
from cal_tpu.parallel.mesh import batch_pspecs


def test_initialize_is_noop_single_process():
    # jax.distributed.initialize raises on single-process CPU; the wrapper
    # must swallow it (every-host call pattern, multihost.py docstring).
    multihost.initialize()
    assert jax.process_count() == 1


def test_host_batch_slice_single_process():
    assert multihost.host_batch_slice(16) == slice(0, 16)


def test_host_batch_slice_multi_process(monkeypatch):
    # emulate a 4-host slice: each host owns a contiguous quarter
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    assert multihost.host_batch_slice(16) == slice(8, 12)
    with pytest.raises(ValueError):
        multihost.host_batch_slice(10)  # not divisible by 4 hosts


def _batch(graphs, layout):
    budgets = compute_budgets(graphs, 8, layout)
    loader = Loader(graphs, 8, layout=layout, budgets=budgets)
    return next(iter(loader))


@pytest.mark.parametrize("layout", ["dense", "sparse"])
def test_global_batch_assembles_dp_sharded_arrays(graphs, layout):
    mesh = make_mesh(dp=8, edge=1)
    local = _batch(graphs, layout)
    gb = multihost.global_batch(local, mesh)

    from jax.sharding import PartitionSpec

    specs = batch_pspecs(local)
    for name in vars(specs):
        spec = getattr(specs, name)
        if not isinstance(spec, PartitionSpec):
            continue          # static metadata fields (e.g. eg_budget)
        arr = getattr(gb, name)
        host = np.asarray(getattr(local, name))
        # at process_count=1 the global array == the local shard, dp-sharded
        assert arr.shape == host.shape
        np.testing.assert_array_equal(np.asarray(arr), host)
        assert arr.sharding.spec == spec
