"""Loss parity with torch F.kl_div / F.nll_loss (train_causal.py:178-183)."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from cal_tpu.train.losses import causal_losses, kl_to_uniform, nll_loss


def test_nll_matches_torch(rng):
    logits = rng.standard_normal((12, 4)).astype(np.float32)
    logp = torch.log_softmax(torch.tensor(logits), -1)
    y = rng.integers(0, 4, 12)
    ref = F.nll_loss(logp, torch.tensor(y)).item()
    out = nll_loss(
        jnp.asarray(logp.numpy()), jnp.asarray(y.astype(np.int32)),
        jnp.ones(12, np.float32),
    )
    np.testing.assert_allclose(float(out), ref, rtol=1e-5)


def test_kl_uniform_matches_torch(rng):
    logits = rng.standard_normal((9, 4)).astype(np.float32)
    logp = torch.log_softmax(torch.tensor(logits), -1)
    uniform = torch.ones(9, 4) / 4
    ref = F.kl_div(logp, uniform, reduction="batchmean").item()
    out = kl_to_uniform(jnp.asarray(logp.numpy()), jnp.ones(9, np.float32))
    np.testing.assert_allclose(float(out), ref, rtol=1e-5)


def test_masked_matches_unmasked_subset(rng):
    logits = rng.standard_normal((8, 4)).astype(np.float32)
    y = rng.integers(0, 4, 8).astype(np.int32)
    mask = np.array([1, 1, 1, 1, 1, 0, 0, 0], np.float32)
    total, parts = causal_losses(
        jnp.asarray(logits), jnp.asarray(logits), jnp.asarray(logits),
        jnp.asarray(y), jnp.asarray(mask), 0.5, 1.0, 0.5,
    )
    total2, parts2 = causal_losses(
        jnp.asarray(logits[:5]), jnp.asarray(logits[:5]), jnp.asarray(logits[:5]),
        jnp.asarray(y[:5]), jnp.ones(5, np.float32), 0.5, 1.0, 0.5,
    )
    np.testing.assert_allclose(float(total), float(total2), rtol=1e-6)
