"""Jitted train/eval steps.

The whole hot loop of the reference (train_causal.py:162-200: forward, three
losses, backward, Adam) compiles to ONE XLA program per step here.  Batches
arrive as PackedDenseBatch (dense layout; adjacency materialized on device)
or GraphBatch (sparse layout) — both static-shape, so each loader compiles
exactly once.

Data parallelism: pass a ``jax.sharding.Mesh``-sharded batch; ``jax.jit``
partitions the step (gradients psum over the mesh automatically).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cal_tpu.graph import PackedDenseBatch, to_dense
from cal_tpu.train.losses import causal_losses, correct_count, nll_loss


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def _as_graph(batch, dtype=None, use_pallas: bool = True):
    """Materialize the device graph; ``dtype`` (the model's compute dtype)
    lets the adjacency build directly into bf16 instead of f32 + a cast —
    one fewer [B, N, N] HBM round trip per step in mixed-precision mode.
    ``use_pallas`` gates the one-hot MXU adjacency kernel (the model's
    flag, so --use_pallas false disables every custom kernel at once)."""
    if isinstance(batch, PackedDenseBatch):
        return to_dense(batch, dtype, use_pallas=use_pallas)
    return _hydrate_tiles(batch)


def _hydrate_tiles(g):
    """Complete SLIM tile plans device-side (pallas_spmm.hydrate_tiles —
    the host loader ships only ``perm`` + block ids; see build_tiles(slim)
    for why).  No-op for full plans and non-tiled batches."""
    tiles = getattr(g, "tiles", None)
    if tiles is None or tiles[0].sloc is not None:
        return g
    import dataclasses

    from cal_tpu.ops.pallas_spmm import hydrate_tiles

    v = g.x.shape[-2]
    tf = hydrate_tiles(tiles[0], g.senders, g.receivers, g.edge_mask, v)
    tb = hydrate_tiles(tiles[1], g.receivers, g.senders, g.edge_mask, v)
    return dataclasses.replace(g, tiles=(tf, tb))


def hydrate_stacked(stacked):
    """Pre-scan tile hydration for a [steps, ...]-stacked epoch: one
    batched gather pass instead of per-step gathers inside the scan."""
    tiles = getattr(stacked, "tiles", None)
    if tiles is None or tiles[0].sloc is not None:
        return stacked
    return jax.vmap(_hydrate_tiles)(stacked)


def _model_dtype(model):
    dt = getattr(model, "dtype", None)
    return None if dt is None or dt == jnp.float32 else dt


def _model_use_pallas(model) -> bool:
    return bool(getattr(model, "use_pallas", True))


def make_init_fn(model, causal: bool = True):
    """Jitted variable-init, reusable across k-fold re-inits (each fresh
    ``model.init`` call would otherwise retrace + recompile per fold)."""
    kwargs = {"eval_random": False} if causal else {}

    @jax.jit
    def f(rngs, g):
        return model.init(rngs, g, train=False, **kwargs)

    return f


def init_state(
    model, tx, sample_batch, rng, causal: bool = True, init_fn=None
) -> TrainState:
    g = _as_graph(sample_batch, _model_dtype(model),
                  _model_use_pallas(model))
    p_rng, i_rng, d_rng = jax.random.split(rng, 3)
    rngs = {"params": p_rng, "intervention": i_rng, "dropout": d_rng}
    kwargs = {"eval_random": False} if causal else {}
    if init_fn is not None:
        variables = init_fn(rngs, g)
    else:
        variables = model.init(rngs, g, train=False, **kwargs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def _gate_state(new_state: "TrainState", old_state: "TrainState",
                valid) -> "TrainState":
    """Select ``new_state`` where ``valid`` (a scalar bool), else keep
    ``old_state`` unchanged.

    Budget-packed epochs (data/loader.py pack mode) pad the scanned batch
    stack with fully-masked batches so every epoch compiles to one static
    shape; a masked batch must be a true no-op — without the gate, Adam's
    moment decay still moves parameters at zero gradient and the masked-BN
    running stats get pulled toward the guard value."""
    sel = lambda a, b: jnp.where(valid, a, b)
    return TrainState(
        params=jax.tree.map(sel, new_state.params, old_state.params),
        batch_stats=jax.tree.map(sel, new_state.batch_stats,
                                 old_state.batch_stats),
        opt_state=jax.tree.map(sel, new_state.opt_state,
                               old_state.opt_state),
        # the PRNG stream is fold_in(rng, step): pad batches must not
        # advance it, or packed and unpacked runs would diverge.
        step=jnp.where(valid, new_state.step, old_state.step),
    )


def _skip_if_empty(step, has_state: bool = True):
    """Wrap a step fn so fully-masked pad batches skip the compute.

    ``_gate_state`` makes pad steps numerically inert but still pays the
    full fwd+bwd; under ``lax.cond`` XLA executes only the taken branch, so
    a pad step costs ~nothing (measured: the r4 packed-sparse bench ran 3
    scanned steps of which 1 was padding — 0.89x the unpacked loader with
    the gate alone, 1.3x with the cond skip).  Under vmap (fold-parallel)
    cond lowers to a select and both branches run — exactly the gated
    behavior, still correct.  ``has_state=False`` is the eval-step shape
    ``(state, batch, rng) -> aux``."""

    def wrapped(state, batch, rng):
        valid = batch.graph_mask.sum() > 0
        run = lambda st: step(st, batch, rng)
        out_shape = jax.eval_shape(run, state)
        aux_shape = out_shape[1] if has_state else out_shape
        zero_aux = lambda: jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), aux_shape)
        if has_state:
            return jax.lax.cond(
                valid, run, lambda st: (st, zero_aux()), state)
        return jax.lax.cond(valid, run, lambda st: zero_aux(), state)

    return wrapped


def _causal_step_fn(model, tx, c_w, o_w, co_w, with_random: bool):
    """Un-jitted single-step body shared by the per-step and the
    device-side epoch-scan entry points."""

    dt = _model_dtype(model)
    up = _model_use_pallas(model)

    def step(state: TrainState, batch, rng):
        g = _as_graph(batch, dt, up)
        i_rng, d_rng = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            (c_logs, o_logs, co_logs), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                g,
                eval_random=with_random,  # train_causal.py:177
                train=True,
                rngs={"intervention": i_rng, "dropout": d_rng},
                mutable=["batch_stats"],
            )
            total, (c_l, o_l, co_l) = causal_losses(
                c_logs, o_logs, co_logs, g.y, g.graph_mask, c_w, o_w, co_w
            )
            n = g.graph_mask.sum()
            aux = {
                "loss": total * n,
                "loss_c": c_l * n,
                "loss_o": o_l * n,
                "loss_co": co_l * n,
                "correct_o": correct_count(o_logs, g.y, g.graph_mask),
                "n": n,
                "batch_stats": updates["batch_stats"],
            }
            return total, aux

        grads, aux = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params,
            batch_stats=aux.pop("batch_stats"),
            opt_state=opt_state,
            step=state.step + 1,
        )
        return _gate_state(new_state, state, aux["n"] > 0), aux

    return step


def make_causal_train_step(model, tx, c_w, o_w, co_w, with_random: bool):
    """Returns jit fn(state, batch, rng) -> (state, metrics).

    metrics = dict of per-batch sums: loss/loss_c/loss_o/loss_co (each
    already scaled by the real-graph count, mirroring
    ``loss.item() * num_graphs(data)`` at train_causal.py:188-191),
    correct_o, and n (real graphs)."""
    inner = _causal_step_fn(model, tx, c_w, o_w, co_w, with_random)
    return partial(jax.jit, donate_argnums=(0,))(inner)


def make_causal_train_epoch(model, tx, c_w, o_w, co_w, with_random: bool,
                            skip_empty: bool = False):
    """Device-side epoch loop: ONE dispatch per epoch instead of one per
    step (``lax.scan`` over batches stacked on a leading axis).

    Per-step dispatch through the runtime costs ~1.3 ms on the tunneled
    backend vs a 2.5 ms step — the scan path removes it entirely.  Step
    numerics are identical to the per-step path (same fold_in(rng, step)
    PRNG stream, same op order); tests/test_train_smoke.py asserts the two
    produce the same params.

    ``skip_empty=True`` (budget-packed loaders) conds each scanned step on
    the batch holding any real graph, so the stack's pad batches skip their
    fwd+bwd instead of computing and discarding it (``_skip_if_empty``).

    Returns jit fn(state, stacked_batches, rng) -> (state, summed_metrics).
    """
    inner = _causal_step_fn(model, tx, c_w, o_w, co_w, with_random)
    if skip_empty:
        inner = _skip_if_empty(inner)

    @partial(jax.jit, donate_argnums=(0,))
    def epoch(state: TrainState, stacked, rng):
        stacked = hydrate_stacked(stacked)
        state, auxes = jax.lax.scan(
            lambda s, b: inner(s, b, rng), state, stacked)
        return state, jax.tree.map(lambda a: a.sum(0), auxes)

    return epoch


def stack_batches(batches):
    """Stack same-shape batch pytrees on a new leading axis for scan."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)


def stack_batches_host(batches):
    """NumPy-leaf variant of ``stack_batches`` (use with Loader.host_batches
    + ``to_device``): the whole epoch is stacked on host and shipped as ONE
    H2D transfer per leaf, instead of batches x leaves small transfers whose
    fixed launch latency dominates at small-graph scale."""
    return jax.tree.map(lambda *xs: np.stack(xs), *batches)


def to_device(tree, sharding=None):
    """One device_put per leaf (optionally with a NamedSharding)."""
    if sharding is not None:
        return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
    return jax.tree.map(jnp.asarray, tree)


def make_causal_eval_step(model, eval_random: bool):
    """Returns jit fn(state, batch, rng) -> dict of correct counts + n.

    eval_random default False (opts.py:33): the intervention is identity at
    eval, co-branch = deterministic xc+xo (train_causal.py:202-223)."""

    dt = _model_dtype(model)
    up = _model_use_pallas(model)

    @jax.jit
    def step(state: TrainState, batch, rng):
        g = _as_graph(batch, dt, up)
        c_logs, o_logs, co_logs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            g,
            eval_random=eval_random,
            train=False,
            rngs={"intervention": rng},
        )
        return {
            "correct_co": correct_count(co_logs, g.y, g.graph_mask),
            "correct_c": correct_count(c_logs, g.y, g.graph_mask),
            "correct_o": correct_count(o_logs, g.y, g.graph_mask),
            "n": g.graph_mask.sum(),
        }

    return step


def make_causal_eval_epoch(model, eval_random: bool,
                           skip_empty: bool = False):
    """Device-side eval sweep: scan the eval step over pre-stacked batches
    (eval loaders don't shuffle, so the stack is built ONCE and reused every
    epoch — no per-epoch host repacking or per-batch dispatch).

    Returns jit fn(state, stacked_batches, rng) -> summed count dict."""
    step = make_causal_eval_step(model, eval_random).__wrapped__
    if skip_empty:
        step = _skip_if_empty(step, has_state=False)

    @jax.jit
    def sweep(state: TrainState, stacked, rng):
        stacked = hydrate_stacked(stacked)
        _, outs = jax.lax.scan(
            lambda carry, b: (carry, step(state, b, rng)), 0, stacked)
        return jax.tree.map(lambda a: a.sum(0), outs)

    return sweep


def make_causal_train_epoch_folds(model, tx, c_w, o_w, co_w,
                                  with_random: bool):
    """Fold-parallel epoch: vmap the device-side epoch scan over a leading
    FOLD axis, so the whole k-fold protocol (reference train_causal.py:63-160
    trains folds sequentially) advances one epoch for every fold in a single
    dispatch.  Folds are independent — vmap batches their matmuls (better MXU
    utilization at small hidden sizes), and when the stacked inputs are
    device_put with the fold axis sharded over the mesh's ``dp`` axis, XLA
    partitions the program with zero collectives (embarrassingly parallel).

    Returns jit fn(states, stacked, rngs) -> (states, metrics) where every
    arg/result has a leading [folds] axis; numerics per fold are identical to
    make_causal_train_epoch (tests/test_fold_parallel.py).
    """
    inner = _causal_step_fn(model, tx, c_w, o_w, co_w, with_random)

    def one(state, stacked, rng):
        stacked = hydrate_stacked(stacked)
        state, auxes = jax.lax.scan(
            lambda s, b: inner(s, b, rng), state, stacked)
        return state, jax.tree.map(lambda a: a.sum(0), auxes)

    return partial(jax.jit, donate_argnums=(0,))(jax.vmap(one))


def make_causal_eval_epoch_folds(model, eval_random: bool):
    """Fold-parallel eval sweep: vmap of make_causal_eval_epoch's scan over a
    leading [folds] axis (states, stacked test batches, rngs)."""
    step = make_causal_eval_step(model, eval_random).__wrapped__

    def sweep(state: TrainState, stacked, rng):
        stacked = hydrate_stacked(stacked)
        _, outs = jax.lax.scan(
            lambda carry, b: (carry, step(state, b, rng)), 0, stacked)
        return jax.tree.map(lambda a: a.sum(0), outs)

    return jax.jit(jax.vmap(sweep))


def stack_folds(trees):
    """Stack per-fold pytrees (states or pre-stacked batch stacks) on a new
    leading [folds] axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _baseline_step_fn(model, tx):
    """Un-jitted NLL step body (train.py:88-106), shared by the per-step and
    epoch-scan entry points."""

    dt = _model_dtype(model)
    up = _model_use_pallas(model)

    def step(state: TrainState, batch, rng):
        g = _as_graph(batch, dt, up)
        d_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                g,
                train=True,
                rngs={"dropout": d_rng},
                mutable=["batch_stats"],
            )
            mask = g.graph_mask.astype(out.dtype)
            loss = nll_loss(out, g.y, mask)
            n = g.graph_mask.sum()
            return loss, {
                "loss": loss * n,
                "correct": correct_count(out, g.y, g.graph_mask),
                "n": n,
                "batch_stats": updates["batch_stats"],
            }

        grads, aux = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params,
            batch_stats=aux.pop("batch_stats"),
            opt_state=opt_state,
            step=state.step + 1,
        )
        return _gate_state(new_state, state, aux["n"] > 0), aux

    return step


def make_baseline_train_step(model, tx):
    """jit fn(state, batch, rng) -> (state, {loss, correct, n} sums)."""
    return partial(jax.jit, donate_argnums=(0,))(_baseline_step_fn(model, tx))


def make_baseline_train_epoch(model, tx, skip_empty: bool = False):
    """Device-side epoch loop for baselines (see make_causal_train_epoch)."""
    inner = _baseline_step_fn(model, tx)
    if skip_empty:
        inner = _skip_if_empty(inner)

    @partial(jax.jit, donate_argnums=(0,))
    def epoch(state: TrainState, stacked, rng):
        stacked = hydrate_stacked(stacked)
        state, auxes = jax.lax.scan(
            lambda s, b: inner(s, b, rng), state, stacked)
        return state, jax.tree.map(lambda a: a.sum(0), auxes)

    return epoch


def make_baseline_eval_epoch(model, skip_empty: bool = False):
    """Device-side eval sweep for baselines (see make_causal_eval_epoch)."""
    step = make_baseline_eval_step(model).__wrapped__
    if skip_empty:
        raw = step
        base = _skip_if_empty(
            lambda st, b, rng: raw(st, b), has_state=False)
        step = lambda st, b: base(st, b, None)

    @jax.jit
    def sweep(state: TrainState, stacked):
        stacked = hydrate_stacked(stacked)
        _, outs = jax.lax.scan(
            lambda carry, b: (carry, step(state, b)), 0, stacked)
        return jax.tree.map(lambda a: a.sum(0), outs)

    return sweep


def make_baseline_eval_step(model):
    dt = _model_dtype(model)
    up = _model_use_pallas(model)

    @jax.jit
    def step(state: TrainState, batch):
        g = _as_graph(batch, dt, up)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            g,
            train=False,
        )
        return {
            "correct": correct_count(out, g.y, g.graph_mask),
            "n": g.graph_mask.sum(),
        }

    return step
