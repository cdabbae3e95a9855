import jax.numpy as jnp
import numpy as np

from cal_tpu.ops.segment import segment_max, segment_softmax, segment_sum


def test_segment_sum_matches_numpy(rng):
    data = rng.standard_normal((50, 4)).astype(np.float32)
    ids = np.sort(rng.integers(0, 7, 50)).astype(np.int32)
    out = segment_sum(jnp.asarray(data), jnp.asarray(ids), 8, True)
    ref = np.zeros((8, 4), np.float32)
    np.add.at(ref, ids, data)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)


def test_segment_softmax_masked(rng):
    logits = rng.standard_normal(30).astype(np.float32)
    ids = np.sort(rng.integers(0, 5, 30)).astype(np.int32)
    mask = rng.random(30) > 0.3
    out = np.asarray(
        segment_softmax(jnp.asarray(logits), jnp.asarray(ids), 5,
                        jnp.asarray(mask), True)
    )
    # masked entries are exactly zero
    assert (out[~mask] == 0).all()
    # each non-empty segment sums to 1
    sums = np.zeros(5)
    np.add.at(sums, ids, out)
    for s in range(5):
        if mask[ids == s].any():
            np.testing.assert_allclose(sums[s], 1.0, rtol=1e-5)


def test_segment_max_empty_segments(rng):
    data = rng.standard_normal(10).astype(np.float32)
    ids = np.zeros(10, np.int32)
    out = np.asarray(segment_max(jnp.asarray(data), jnp.asarray(ids), 3))
    np.testing.assert_allclose(out[0], data.max(), rtol=1e-6)
    assert not np.isfinite(out[1:]).any() or (out[1:] < -1e30).all()
