"""End-to-end smoke: tiny causal + baseline training runs learn something."""
import numpy as np
import pytest

from cal_tpu.data.synthetic import dataset_bias_split, generate_synthetic_dataset
from cal_tpu.train.baseline import train_baseline_syn
from cal_tpu.train.causal import train_causal_syn
from cal_tpu.utils.config import Config


@pytest.fixture(scope="module")
def tiny_split():
    ds = generate_synthetic_dataset(data_num=30, node_num=4, max_degree=6,
                                    seed=5)
    return dataset_bias_split(ds, bias=0.7, total=30 * 4, seed=0)[:3]


def test_causal_smoke(tiny_split):
    train, val, test = tiny_split
    cfg = Config(model="CausalGCN", epochs=10, batch_size=32, hidden=16,
                 layers=1, lr=0.01)
    res = train_causal_syn(train, val, test, cfg, verbose=False)
    assert res["best_val_acc"] > 0.25  # beats random guessing on val


def test_baseline_smoke(tiny_split):
    train, val, test = tiny_split
    cfg = Config(model="GCN", epochs=8, batch_size=32, hidden=16,
                 layers=1, lr=0.01)
    res = train_baseline_syn(train, val, test, cfg, verbose=False)
    assert res["best_val_acc"] > 0.25


def test_scan_epoch_matches_per_step_loop(graphs):
    """Device-side epoch scan reproduces the per-step loop bit-for-bit
    (same fold_in PRNG stream, same op order)."""
    import jax
    import numpy as np
    from cal_tpu.data.loader import Loader, compute_budgets
    from cal_tpu.models.factory import get_model
    from cal_tpu.train.optim import make_optimizer
    from cal_tpu.train.steps import (
        init_state, make_causal_train_epoch, make_causal_train_step,
        stack_batches)
    from cal_tpu.utils.config import Config

    cfg = Config(model="CausalGCN", hidden=8, layers=2, batch_size=4)
    budgets = compute_budgets(graphs, cfg.batch_size, "dense")
    loader = Loader(graphs, cfg.batch_size, layout="dense", budgets=budgets)
    batches = list(loader)
    model = get_model(cfg, 0, 3)
    tx = make_optimizer(cfg.lr, cfg.min_lr, 2, len(batches))
    rng = jax.random.PRNGKey(0)
    s0 = init_state(model, tx, batches[0], rng)

    step = make_causal_train_step(model, tx, cfg.c, cfg.o, cfg.co, True)
    s_loop = s0
    tot = None
    for b in batches:
        s_loop, m = step(s_loop, b, rng)
        tot = m if tot is None else jax.tree.map(lambda a, c: a + c, tot, m)

    epoch = make_causal_train_epoch(model, tx, cfg.c, cfg.o, cfg.co, True)
    s1 = init_state(model, tx, batches[0], jax.random.PRNGKey(0))
    s_scan, m_scan = epoch(s1, stack_batches(batches), rng)

    for a, b in zip(jax.tree.leaves(s_loop.params),
                    jax.tree.leaves(s_scan.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(m_scan["loss"]), float(tot["loss"]),
                               rtol=1e-5)
    assert float(m_scan["n"]) == float(tot["n"])


def test_inference_serving_roundtrip(tiny_split, tmp_path):
    """--save_model checkpoints the best-val state; --inference restores it
    and reproduces the exact test accuracies recorded at save time."""
    from cal_tpu.train.causal import evaluate_causal

    train, val, test = tiny_split
    cfg = Config(model="CausalGCN", epochs=4, batch_size=32, hidden=16,
                 layers=1, lr=0.01, save_model=True,
                 save_dir=str(tmp_path / "ckpt"))
    res = train_causal_syn(train, val, test, cfg, verbose=False)
    out = evaluate_causal(test, cfg)
    assert out["test_acc_co"] == pytest.approx(res["test_acc_co"], abs=1e-6)
    assert out["test_acc_c"] == pytest.approx(res["test_acc_c"], abs=1e-6)
    assert out["test_acc_o"] == pytest.approx(res["test_acc_o"], abs=1e-6)


def test_epoch_prefetcher_teardown(tiny_split):
    """r5: the scan-epoch prefetcher's producer threads must stop at the
    end of a training run (close()), or every fold leaks two blocked
    daemon threads pinning epoch stacks of host + device memory."""
    import threading
    import time

    from cal_tpu.train.causal import _EpochPrefetcher

    train, val, test = tiny_split
    cfg = Config(model="CausalGCN", epochs=3, batch_size=32, hidden=16,
                 layers=1, lr=0.01)
    before = {t.ident for t in threading.enumerate()}
    train_causal_syn(train, val, test, cfg, verbose=False)
    deadline = time.time() + 5.0
    while time.time() < deadline:
        leaked = [t for t in threading.enumerate()
                  if t.ident not in before and t.is_alive()
                  and t.name.startswith("epoch-prefetch-")]
        if not leaked:
            break
        time.sleep(0.2)
    # the producers poll their stop flag at 0.2 s — give them a beat, then
    # require every prefetcher thread spawned by the run to have exited
    assert not leaked, f"prefetcher threads still alive: {leaked}"

    # direct close(): queued stacks are dropped and next() never blocks
    # a closed prefetcher's consumer forever via a full queue
    from cal_tpu.data.loader import Loader, compute_budgets

    budgets = compute_budgets(train, 32, "dense")
    loader = Loader(train, 32, layout="dense", budgets=budgets)
    pf = _EpochPrefetcher(loader, None)
    assert pf.next() is not None
    pf.close()
    t0 = time.time()
    while time.time() - t0 < 3.0 and any(
            t.is_alive() for t in threading.enumerate()
            if getattr(t, "_target", None) in (pf._produce_host,
                                               pf._produce_device)):
        time.sleep(0.1)
