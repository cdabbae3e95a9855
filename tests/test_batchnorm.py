"""MaskedBatchNorm parity with torch.nn.BatchNorm1d (running stats included)
and mask-correctness under padding."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from cal_tpu.nn.layers import MaskedBatchNorm


def _torch_bn(c):
    bn = torch.nn.BatchNorm1d(c)
    torch.nn.init.constant_(bn.weight, 1.0)
    torch.nn.init.constant_(bn.bias, 1e-4)  # reference model.py:80-83
    return bn


def test_train_and_eval_match_torch(rng):
    c = 7
    bn_t = _torch_bn(c)
    bn_j = MaskedBatchNorm()
    x0 = rng.standard_normal((20, c)).astype(np.float32)
    variables = bn_j.init(jax.random.PRNGKey(0), jnp.asarray(x0))

    bn_t.train()
    for _ in range(3):
        x = rng.standard_normal((20, c)).astype(np.float32) * 2 + 1
        out_t = bn_t(torch.tensor(x)).detach().numpy()
        out_j, updates = bn_j.apply(
            variables, jnp.asarray(x), None, False, mutable=["batch_stats"]
        )
        variables = {"params": variables["params"], **updates}
        np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=1e-4, atol=1e-5)

    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]),
        bn_t.running_mean.numpy(), rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]),
        bn_t.running_var.numpy(), rtol=1e-4, atol=1e-6,
    )

    bn_t.eval()
    x = rng.standard_normal((8, c)).astype(np.float32)
    out_t = bn_t(torch.tensor(x)).detach().numpy()
    out_j = bn_j.apply(variables, jnp.asarray(x), None, True)
    np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=1e-4, atol=1e-5)


def test_padding_does_not_pollute_stats(rng):
    c = 5
    bn = MaskedBatchNorm()
    real = rng.standard_normal((10, c)).astype(np.float32)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(real))
    out_ref, upd_ref = bn.apply(
        variables, jnp.asarray(real), jnp.ones(10, bool), False,
        mutable=["batch_stats"],
    )
    # same rows + 6 rows of huge garbage, masked out
    padded = np.concatenate([real, 1e6 * np.ones((6, c), np.float32)])
    mask = np.concatenate([np.ones(10, bool), np.zeros(6, bool)])
    out_pad, upd_pad = bn.apply(
        variables, jnp.asarray(padded), jnp.asarray(mask), False,
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(out_pad[:10]), np.asarray(out_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(upd_pad["batch_stats"]["mean"]),
        np.asarray(upd_ref["batch_stats"]["mean"]), rtol=1e-6,
    )
