"""Data-parallel train/eval steps: jit + NamedSharding over the ``dp`` axis.

Design (SURVEY.md §2.3): the padded graph batch is sharded over ``dp``;
params/opt-state are replicated.  ``jax.jit`` partitions the step — XLA
inserts the gradient psum, the cross-shard segment-op collectives, and keeps
masked-BatchNorm statistics global, so N-chip numerics equal 1-chip numerics
bit-for-bit (modulo reduction order).  The intervention shuffle's global
argsort (models/causal.py) likewise compiles to cross-device collectives;
an explicit shard_map/ppermute variant lives in intervene.py.

No NCCL/MPI analog is needed: collectives ride ICI via XLA (multi-host via
``jax.distributed.initialize`` + the same mesh spanning hosts).
"""
from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cal_tpu.parallel.mesh import _drop_packed_pallas, batch_pspecs
from cal_tpu.train.steps import (
    make_causal_eval_step,
    make_causal_train_step,
)


def _shardings(mesh, batch_example, state_example):
    rep = NamedSharding(mesh, P())
    # shard_batch strips mesh-incompatible static plans (Pallas adj-build
    # budget, tile plans); the example must match that structure.
    batch_example = _drop_packed_pallas(batch_example)
    b = jax.tree.map(lambda s: NamedSharding(mesh, s), batch_pspecs(batch_example))
    st = jax.tree.map(lambda _: rep, state_example)
    return st, b, rep


def make_dp_causal_train_step(
    model, tx, c_w, o_w, co_w, with_random: bool, mesh: Mesh,
    state_example, batch_example,
):
    """DP version of train.steps.make_causal_train_step.

    Constrains inputs (replicated state, dp-sharded batch) and keeps the
    output state replicated; the inner computation is identical."""
    inner = make_causal_train_step(model, tx, c_w, o_w, co_w, with_random)
    st, b, rep = _shardings(mesh, batch_example, state_example)

    @partial(
        jax.jit,
        in_shardings=(st, b, rep),
        out_shardings=(st, rep),
        donate_argnums=(0,),
    )
    def step(state, batch, rng):
        return inner.__wrapped__(state, batch, rng)

    return step


def make_dp_causal_eval_step(model, eval_random: bool, mesh: Mesh,
                             state_example, batch_example):
    inner = make_causal_eval_step(model, eval_random)
    st, b, rep = _shardings(mesh, batch_example, state_example)

    @partial(jax.jit, in_shardings=(st, b, rep), out_shardings=rep)
    def step(state, batch, rng):
        return inner.__wrapped__(state, batch, rng)

    return step
