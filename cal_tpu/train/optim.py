"""Optimizer factory: torch-parity Adam + per-epoch cosine annealing.

Reference: ``Adam(lr, weight_decay)`` + ``CosineAnnealingLR(T_max=epochs,
eta_min=min_lr)`` stepped once per epoch (train_causal.py:21-22,29).
torch Adam's weight_decay is L2-to-gradient *before* the moment updates —
``add_decayed_weights`` placed before ``scale_by_adam`` reproduces it.
"""
from __future__ import annotations

import math

import optax


def cosine_lr(lr: float, min_lr: float, epochs: int, steps_per_epoch: int):
    """Per-step schedule equal to torch CosineAnnealingLR stepped per epoch."""

    def schedule(count):
        import jax.numpy as jnp

        epoch = jnp.minimum(count // steps_per_epoch, epochs)
        return min_lr + (lr - min_lr) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * epoch / epochs)
        )

    return schedule


def make_optimizer(
    lr: float,
    min_lr: float,
    epochs: int,
    steps_per_epoch: int,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    schedule = cosine_lr(lr, min_lr, epochs, steps_per_epoch)
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts += [
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(schedule),
    ]
    # flatten: run the update on ONE raveled vector instead of ~60 small
    # leaves — collapses dozens of tiny TPU kernels into a handful
    # (measured 0.96 ms -> ~0.1 ms for the Adam update at CausalGCN size).
    return optax.flatten(optax.chain(*parts))
