"""Cross-device backdoor-adjustment intervention (shard_map collectives).

The reference's intervention is a host-side ``random.shuffle`` of graph
indices inside ``forward`` (reference model.py:145-156) — a host sync every
step.  Device-side replacements, for a context readout ``xc`` sharded over
the ``dp`` axis:

* ``allgather_intervention`` — exact parity with the single-device
  formulation (models/causal.py intervention_permutation): all_gather the
  per-graph uniforms, every device computes the same global argsort, then
  all_gather ``xc`` (tiny: [G, hidden]) and take the local rows.  One
  all_gather over ICI; uniform global permutation.

* ``ppermute_intervention`` — bandwidth-optimal variant: a static shard
  rotation via ``lax.ppermute`` (one ICI hop, [G/n, hidden] payload)
  composed with an independent per-device local shuffle.  Each graph is
  paired with a uniformly random graph of the rotated shard — not a uniform
  *global* permutation (block structure), which is statistically equivalent
  for the backdoor adjustment (any exchangeable random pairing of contexts
  to objects) but not bit-identical to the reference; use the all_gather
  variant when parity matters.

Both assume every shard's real graphs form a contiguous prefix and shards
are fully real except possibly the last — guaranteed by the dp loader
sharding of full batches (padded tail lives on the last shard).

STATUS (r3): library primitives, deliberately unwired from the trainers.
Production dp training relies on GSPMD of the global argsort
(models/causal.py::intervention_permutation): the shuffled payload is the
pooled readout — [G, hidden] ~ 64 KB/step at canonical sizes, under a
microsecond of ICI either way — so the bandwidth-optimal variant has no
measurable payoff regime at CAL scale (it would matter only for readouts
orders of magnitude wider).  Kept as tested building blocks
(tests/test_parallel.py) for workloads where that regime exists.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def allgather_intervention(
    key: jax.Array, xc: jax.Array, graph_mask: jax.Array, axis_name: str = "dp"
):
    """Uniform global permutation of real-graph rows; returns permuted xc
    rows for this shard.  Call inside shard_map over ``axis_name``."""
    g_local = graph_mask.shape[0]
    idx = jax.lax.axis_index(axis_name)
    # identical key on all devices -> identical global uniforms/argsort
    u = jax.random.uniform(key, (g_local * jax.lax.axis_size(axis_name),))
    mask_all = jax.lax.all_gather(graph_mask, axis_name, tiled=True)
    u = jnp.where(mask_all, u, jnp.inf)
    perm = jnp.argsort(u)                     # real rows first, random order
    xc_all = jax.lax.all_gather(xc, axis_name, tiled=True)
    local = jax.lax.dynamic_slice_in_dim(perm, idx * g_local, g_local)
    return jnp.take(xc_all, local, axis=0)


def ppermute_intervention(
    key: jax.Array,
    xc: jax.Array,
    graph_mask: jax.Array,
    axis_name: str = "dp",
    rotation: int = 1,
):
    """Static shard rotation (ppermute) + per-device local shuffle."""
    idx = jax.lax.axis_index(axis_name)
    # rotate shards: device d receives from d - rotation (static ring perm)
    if rotation:
        nd = jax.lax.axis_size(axis_name)
        perm_pairs = [(i, (i + rotation) % nd) for i in range(nd)]
        xc_rot = jax.lax.ppermute(xc, axis_name, perm_pairs)
        mask_rot = jax.lax.ppermute(graph_mask, axis_name, perm_pairs)
    else:
        xc_rot, mask_rot = xc, graph_mask
    # independent local shuffle of the real prefix (device-folded key)
    k = jax.random.fold_in(key, idx)
    u = jax.random.uniform(k, graph_mask.shape)
    u = jnp.where(mask_rot, u, jnp.inf)
    local_perm = jnp.argsort(u)
    return jnp.take(xc_rot, local_perm, axis=0)
