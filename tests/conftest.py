"""Test config: force an 8-device CPU mesh (SURVEY.md §4 distributed-test
strategy). NOTE: the JAX_PLATFORMS env var is overridden by the axon TPU
plugin in this image; jax.config.update is authoritative."""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from cal_tpu.graph import HostGraph


def random_host_graph(rng: np.random.Generator, n_min=5, n_max=20, feat=6,
                      p=0.3, num_classes=3) -> HostGraph:
    """Random undirected simple graph with both-direction edge list."""
    n = int(rng.integers(n_min, n_max + 1))
    mask = rng.random((n, n)) < p
    mask = np.triu(mask, 1)
    us, vs = np.nonzero(mask)
    senders = np.concatenate([us, vs]).astype(np.int32)
    receivers = np.concatenate([vs, us]).astype(np.int32)
    x = rng.standard_normal((n, feat)).astype(np.float32)
    return HostGraph(x=x, senders=senders, receivers=receivers,
                     y=int(rng.integers(num_classes)))


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def graphs(rng):
    return [random_host_graph(rng) for _ in range(10)]
