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
