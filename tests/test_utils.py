"""Checkpoint / metrics / profiling utility tests."""
import json
import os

import jax.numpy as jnp
import numpy as np

from cal_tpu.utils.checkpoint import Checkpointer
from cal_tpu.utils.logging import MetricsLogger
from cal_tpu.utils.profiling import StepTimer


def _state():
    return {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
            "step": jnp.asarray(7)}


def test_checkpoint_roundtrip(tmp_path):
    ck = Checkpointer(str(tmp_path / "ck"), max_to_keep=2)
    assert ck.latest_step() is None
    for s in (1, 2, 3):
        ck.save(s, _state(), {"val": 0.5 * s})
    assert ck.latest_step() == 3
    state, meta = ck.restore(template=_state())
    np.testing.assert_array_equal(np.asarray(state["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    assert meta["val"] == 1.5
    state2, _ = ck.restore(step=2, template=_state())
    assert int(state2["step"]) == 7


def test_checkpoint_pickle_fallback(tmp_path, monkeypatch):
    ck = Checkpointer(str(tmp_path / "ckp"), max_to_keep=2)
    ck._mgr = None    # force pickle path
    for s in (1, 2, 3):
        ck.save(s, _state())
    assert sorted(ck._pickle_steps()) == [2, 3]   # gc kept last 2
    state, _ = ck.restore()
    assert int(state["step"]) == 7


def test_metrics_logger(tmp_path):
    p = str(tmp_path / "m.jsonl")
    m = MetricsLogger(p)
    m.log("epoch", loss=1.5, acc=0.7)
    m.log("final", acc=0.9)
    m.close()
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]["event"] == "epoch" and lines[0]["loss"] == 1.5
    assert lines[1]["acc"] == 0.9
    MetricsLogger(None).log("noop", x=1)   # no-op path


def test_step_timer():
    t = StepTimer(window=4)
    for _ in range(5):
        t.mark()
    assert t.mean_step_s >= 0.0
    assert t.throughput(100) > 0


def test_metrics_logger_tensorboard(tmp_path):
    """TB mirror writes event files and survives non-scalar fields."""
    from cal_tpu.utils.logging import MetricsLogger

    m = MetricsLogger(path=str(tmp_path / "m.jsonl"), tb_dir=str(tmp_path / "tb"))
    m.log("epoch", epoch=1, loss=0.5, acc=0.9, note="skip-me")
    m.log("epoch", epoch=2, loss=0.4, acc=0.95)
    m.close()
    import os
    files = os.listdir(tmp_path / "tb")
    assert any(f.startswith("events") for f in files)
    assert (tmp_path / "m.jsonl").read_text().count("\n") == 2
