"""Pallas kernel equivalence tests (interpret mode on CPU — the analogue of
the reference's VECGO_SIMD=generic SIMD-equivalence CI job, SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vecgo_tpu.ops import pallas_scan
from vecgo_tpu.utils import testutil as tu


def test_merge_network_sorts():
    r = np.random.default_rng(1)
    d = jnp.asarray(r.standard_normal((16, 20)).astype(np.float32))
    i = jnp.asarray(r.integers(0, 1000, (16, 20)), jnp.int32)
    md, mi = pallas_scan._merge_sorted_2k(d, i, 10)
    want = np.sort(np.asarray(d), axis=1)[:, :10]
    np.testing.assert_allclose(np.asarray(md), want, rtol=1e-6)
    # ids track their distances
    dn = np.asarray(d)
    for b in range(16):
        for j in range(10):
            col = int(np.where(dn[b] == float(md[b, j]))[0][0])
            assert dn[b, col] == float(md[b, j])


def test_pallas_l2_topk_matches_bruteforce():
    x = tu.gaussian_vectors(3000, 64, seed=101)
    q = tu.gaussian_vectors(32, 64, seed=102)
    d, i = pallas_scan.l2_topk(
        jnp.asarray(q), jnp.asarray(x), k=10, tile_b=16, tile_n=512
    )
    _, true_ids = tu.brute_force_knn(q, x, 10, "l2")
    assert tu.recall_at_k(np.asarray(i), true_ids) > 0.999
    d_true, _ = tu.brute_force_knn(q, x, 10, "l2")
    np.testing.assert_allclose(np.sort(np.asarray(d), 1), d_true, rtol=1e-3, atol=1e-3)


def test_pallas_l2_topk_padding():
    # Non-multiple sizes exercise both pad paths.
    x = tu.gaussian_vectors(777, 32, seed=103)
    q = tu.gaussian_vectors(13, 32, seed=104)
    d, i = pallas_scan.l2_topk(
        jnp.asarray(q), jnp.asarray(x), k=5, tile_b=8, tile_n=256
    )
    assert (np.asarray(i) < 777).all()
    _, true_ids = tu.brute_force_knn(q, x, 5, "l2")
    assert tu.recall_at_k(np.asarray(i), true_ids) > 0.999
