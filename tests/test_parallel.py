"""Sharded search/kmeans tests on the virtual 8-device CPU mesh
(SURVEY.md §7.2 stage 7)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vecgo_tpu.model import Metric
from vecgo_tpu.parallel import mesh as pm
from vecgo_tpu.utils import testutil as tu


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8
    return pm.make_mesh(shard=4, dp=2)


def test_sharded_flat_exact(mesh8):
    x = tu.gaussian_vectors(5000, 32, seed=71)  # not divisible by 4: padding path
    q = tu.gaussian_vectors(16, 32, seed=72)
    sf = pm.ShardedFlat(x, mesh8, block_rows=512)
    d, i = sf.search(q, 10)
    _, true_ids = tu.brute_force_knn(q, x, 10, "l2")
    assert tu.recall_at_k(np.asarray(i), true_ids) > 0.999
    assert (np.asarray(i) < 5000).all()


def test_sharded_flat_cosine(mesh8):
    x = tu.gaussian_vectors(2048, 16, seed=73)
    q = tu.gaussian_vectors(8, 16, seed=74)
    sf = pm.ShardedFlat(x, mesh8, metric=Metric.COSINE, block_rows=512)
    d, i = sf.search(q, 5)
    _, true_ids = tu.brute_force_knn(q, x, 5, "cosine")
    assert tu.recall_at_k(np.asarray(i), true_ids) > 0.999


def test_sharded_kmeans_matches_single_device(mesh8):
    from jax.sharding import NamedSharding, PartitionSpec as P

    x, _ = tu.clustered_vectors(4096, 16, n_clusters=8, spread=0.05, seed=75)
    centers0 = x[:8].copy()
    step = pm.sharded_kmeans_step(mesh8)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh8, P(("dp", "shard"), None)))
    c = jnp.asarray(centers0)
    for _ in range(5):
        c, inertia = step(xs, c)
    # single-device reference
    from vecgo_tpu.quantization.kmeans import _lloyd

    c_ref, _ = _lloyd(jnp.asarray(x), jnp.asarray(centers0), 5, 4096)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), rtol=1e-3, atol=1e-4)
