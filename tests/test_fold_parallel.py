"""Fold-parallel k-fold trainer (train/causal.py train_causal_real_folds)
matches the sequential protocol (reference train_causal.py:63-160) exactly:
same per-fold PRNG streams, same loader streams, same numerics."""
import numpy as np
import pytest

from cal_tpu.data.synthetic import generate_synthetic_dataset
from cal_tpu.train.causal import train_causal_real, train_causal_real_folds
from cal_tpu.utils.config import Config


@pytest.fixture(scope="module")
def toy_dataset():
    # 4*4*2 = 32 graphs, 4 classes; folds=2 -> train 16 = 2 batches of 8
    ds = generate_synthetic_dataset(
        data_num=4, node_num=6, max_degree=10, noise=0.1, seed=0)
    return [g for ctx in ds.values() for shp in ctx.values() for g in shp]


def _cfg(**kw):
    return Config(model="CausalGCN", hidden=8, layers=2, batch_size=8,
                  epochs=2, folds=2, data_num=4, node_num=6,
                  dataset="toy", **kw)


KEYS = ("test_acc_mean", "test_acc_std", "test_acc_c_mean",
        "test_acc_o_mean", "train_acc_mean", "selected_epoch")


@pytest.mark.slow
def test_fold_parallel_matches_sequential(toy_dataset, capsys):
    seq = train_causal_real(toy_dataset, 4, _cfg(), verbose=False)
    par = train_causal_real_folds(toy_dataset, 4, _cfg(fold_parallel=True),
                                  verbose=False)
    for k in KEYS:
        assert np.isclose(seq[k], par[k], atol=1e-6), (k, seq[k], par[k])


@pytest.mark.slow
def test_fold_parallel_sharded_over_mesh(toy_dataset):
    # fold axis sharded over the dp mesh axis: numerics unchanged
    par = train_causal_real_folds(toy_dataset, 4, _cfg(fold_parallel=True),
                                  verbose=False)
    shd = train_causal_real_folds(
        toy_dataset, 4, _cfg(fold_parallel=True, mesh_dp=2), verbose=False)
    for k in KEYS:
        assert np.isclose(par[k], shd[k], atol=1e-6), (k, par[k], shd[k])


def test_fold_parallel_dispatch_flag(toy_dataset):
    out = train_causal_real(toy_dataset, 4, _cfg(fold_parallel=True),
                            verbose=False)
    assert 0.0 <= out["test_acc_mean"] <= 1.0


def test_fold_parallel_uneven_eval_batches(toy_dataset):
    # batch 12: test sets of 16 -> 2 batches; train 16 -> 2 batches per fold
    # (equal); masked-pad path exercised when eval counts differ is covered
    # by construction in sparse layout below
    cfg = _cfg(fold_parallel=True, layout="sparse")
    out = train_causal_real_folds(toy_dataset, 4, cfg, verbose=False)
    assert 0.0 <= out["test_acc_mean"] <= 1.0


@pytest.fixture(scope="module")
def tailed_dataset():
    """Heavy-tailed graph sizes so _want_pack(auto) turns packing ON."""
    from cal_tpu.graph import HostGraph

    rng = np.random.default_rng(5)
    graphs = []
    for i in range(32):
        n = 40 if i % 8 == 0 else int(rng.integers(4, 8))
        mask = np.triu(rng.random((n, n)) < 0.4, 1)
        us, vs = np.nonzero(mask)
        graphs.append(HostGraph(
            x=rng.standard_normal((n, 6)).astype(np.float32),
            senders=np.concatenate([us, vs]).astype(np.int32),
            receivers=np.concatenate([vs, us]).astype(np.int32),
            y=int(i % 4),
        ))
    return graphs


@pytest.mark.slow
def test_fold_parallel_composes_with_packing(tailed_dataset, capsys):
    """r5 (VERDICT r4 item 5): --fold_parallel with budget-packed sparse
    batching — fold stacks equalized to the max fold's step/tile budget,
    pad batches no-ops — matches the sequential packed protocol."""
    cfg = _cfg(fold_parallel=True, layout="sparse")
    assert cfg.pack_batches == "auto"
    par = train_causal_real_folds(tailed_dataset, 4, cfg, verbose=False)
    out = capsys.readouterr().out
    assert "pack_batches auto" in out          # packing actually engaged
    assert "not supported" not in out
    seq = train_causal_real(tailed_dataset, 4, _cfg(layout="sparse"),
                            verbose=False)
    for k in KEYS:
        assert np.isclose(seq[k], par[k], atol=1e-6), (k, seq[k], par[k])
