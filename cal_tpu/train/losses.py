"""Loss library — pure JAX, mask-aware (padded graphs excluded).

Reference three-branch loss (train_causal.py:178-183):
  c_loss  = KL(uniform ‖ ·) via torch ``kl_div(c_logs, uniform, 'batchmean')``
  o_loss  = NLL(o_logs, y)
  co_loss = NLL(co_logs, y)
  loss    = c*c_loss + o*o_loss + co*co_loss   (weights opts.py:43-45)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def nll_loss(log_probs: jax.Array, y: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean negative log-likelihood over real graphs (F.nll_loss)."""
    n = jnp.maximum(mask.sum(), 1)
    picked = jnp.take_along_axis(log_probs, y[:, None], axis=-1)[:, 0]
    return -(picked * mask).sum() / n


def kl_to_uniform(log_probs: jax.Array, mask: jax.Array) -> jax.Array:
    """torch F.kl_div(log_probs, uniform, reduction='batchmean'):
    sum_g sum_k u * (log u - log_probs) / num_graphs."""
    k = log_probs.shape[-1]
    u = 1.0 / k
    n = jnp.maximum(mask.sum(), 1)
    per_graph = (u * (jnp.log(u) - log_probs)).sum(axis=-1)
    return (per_graph * mask).sum() / n


def causal_losses(
    c_logs, o_logs, co_logs, y, graph_mask, c_w: float, o_w: float, co_w: float
):
    mask = graph_mask.astype(c_logs.dtype)
    c_loss = kl_to_uniform(c_logs, mask)
    o_loss = nll_loss(o_logs, y, mask)
    co_loss = nll_loss(co_logs, y, mask)
    total = c_w * c_loss + o_w * o_loss + co_w * co_loss
    return total, (c_loss, o_loss, co_loss)


def correct_count(log_probs: jax.Array, y: jax.Array, graph_mask) -> jax.Array:
    pred = jnp.argmax(log_probs, axis=-1)
    return ((pred == y) & graph_mask).sum()
