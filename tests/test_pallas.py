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


def test_pallas_coded_scan_matches_xla():
    """Fused coded group scan (interpret mode) == XLA ivf_scan results."""
    import jax.numpy as jnp
    import numpy as np

    from vecgo_tpu.ops import ivf
    from vecgo_tpu.utils import testutil as tu

    x, _ = tu.clustered_vectors(5000, 16, n_clusters=16, seed=3)
    rng = np.random.default_rng(4)
    q = (x[rng.choice(len(x), 24, replace=False)]
         + 0.02 * rng.standard_normal((24, 16))).astype(np.float32)
    _, members = ivf.build_ivf_table(x, capacity=256, seed=5)
    table = ivf.device_table_coded(members, jnp.asarray(x), group=4)

    d_ref, r_ref = ivf.ivf_scan(
        jnp.asarray(q), table, n_probe=4, kk=8, qcap=24, group=4
    )
    d_f, r_f = ivf.ivf_scan_fused(
        jnp.asarray(q), table, n_probe=4, kk=8, qcap=24, group=4,
        interpret=True,
    )
    d_ref, r_ref = np.asarray(d_ref), np.asarray(r_ref)
    d_f, r_f = np.asarray(d_f), np.asarray(r_f)
    # Same candidate sets with matching distances (order within ties may vary).
    for b in range(len(q)):
        ref = {(int(r), round(float(dd), 3)) for r, dd in zip(r_ref[b], d_ref[b]) if r >= 0}
        got = {(int(r), round(float(dd), 3)) for r, dd in zip(r_f[b], d_f[b]) if r >= 0}
        assert ref == got, (b, ref ^ got)

    # masked variant
    mask = np.zeros(len(x), bool)
    mask[::2] = True
    mflat = ivf.slot_mask_from_rows(table, jnp.asarray(mask))
    _, r_m = ivf.ivf_scan_fused(
        jnp.asarray(q), table, n_probe=4, kk=8, qcap=24, group=4,
        mask_flat=mflat, interpret=True,
    )
    r_m = np.asarray(r_m)
    assert (r_m[r_m >= 0] % 2 == 0).all()
