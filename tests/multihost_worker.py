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


def main(proc_id: int, port: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from cal_tpu.parallel import make_mesh, multihost, replicate

    # the handshake must happen before any backend/device use
    multihost.initialize(f"localhost:{port}", num_processes=N_PROCS,
                         process_id=proc_id)
    assert jax.process_count() == N_PROCS, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

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
    main(int(sys.argv[1]), sys.argv[2])
