"""Sharded search/kmeans tests on the virtual 8-device CPU mesh
(SURVEY.md §7.2 stage 7).

PROCESS ISOLATION: in a full-suite run these tests execute in a fresh
interpreter (see test_parallel_module_isolated below). Round 3 found an
order-dependent livelock: after the whole prior suite had run in-process,
the mesh-collective build test deadlocked forever (all threads in
futex_wait) — the jax-0.9.0 executable-reuse bug (utils/devbug.py) striking
one mesh participant leaves the other devices blocked at a collective
barrier, and nothing ever raises. The identical test passes in isolation.
A fresh process sidesteps the poisoned runtime state; the conftest watchdog
(VECGO_TEST_TIMEOUT_S) guarantees termination if any future regression
reintroduces a hang."""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vecgo_tpu.model import Metric
from vecgo_tpu.parallel import mesh as pm
from vecgo_tpu.utils import testutil as tu

_ISOLATED = os.environ.get("VECGO_PARALLEL_ISOLATED") == "1"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

if not _ISOLATED:

    def test_parallel_module_isolated():
        """Run ALL of this module's mesh tests in a fresh interpreter."""
        env = dict(os.environ, VECGO_PARALLEL_ISOLATED="1")
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-x",
             os.path.join(_REPO, "tests", "test_parallel.py")],
            cwd=_REPO, env=env, capture_output=True, text=True, timeout=1800,
        )
        sys.stderr.write(r.stdout[-4000:] + r.stderr[-4000:])
        assert r.returncode == 0, (
            f"isolated parallel-module run failed (rc={r.returncode})"
        )


@pytest.fixture(autouse=True)
def _fresh_executables(request):
    """Skip the mesh tests in-process during a full-suite run (they execute
    via the isolated wrapper above); when they do run, clear jit caches
    first: the executable-reuse bug (utils/devbug.py) poisons RE-EXECUTION
    of cached executables — fresh executables always run correctly, and the
    persistent compile cache keeps the recompiles cheap."""
    if request.node.name == "test_parallel_module_isolated":
        yield
        return
    if not _ISOLATED:
        pytest.skip(
            "runs in a fresh interpreter via test_parallel_module_isolated "
            "(jax-0.9.0 executable-reuse bug can livelock mesh collectives "
            "after a long in-process history; see module docstring)"
        )
    jax.clear_caches()
    yield


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


def test_sharded_snapshot_searcher(mesh8):
    """Engine-level sharded search: committed segments row-sharded over the
    mesh, tombstones respected, global ids returned."""
    import numpy as np

    from vecgo_tpu.blobstore import MemoryStore
    from vecgo_tpu.engine import Engine, EngineOptions
    from vecgo_tpu.parallel.engine_shard import ShardedSnapshotSearcher
    from vecgo_tpu.utils import testutil as tu

    eng = Engine.open(
        MemoryStore(),
        EngineOptions(dim=16, flush_threshold=10**9, graph_threshold=10**9,
                      compaction_threshold=10**9),
        create=True,
    )
    x = tu.gaussian_vectors(600, 16, seed=90)
    ids = eng.insert_batch(x[:300]); eng.commit()
    ids2 = eng.insert_batch(x[300:]); eng.commit()
    eng.delete(ids[5])
    snap = eng.snapshot()
    try:
        s = ShardedSnapshotSearcher(snap, mesh8, eng.options.metric)
        q = x[4:12]
        got, dist = s.search(q, k=5)
    finally:
        snap.release()
    all_ids = ids + ids2
    _, ti = tu.brute_force_knn(q, x, 6, "l2")
    for bi in range(8):
        want = [all_ids[j] for j in ti[bi] if all_ids[j] != ids[5]][:5]
        assert list(got[bi]) == want


def test_sharded_engine_full_plane(mesh8):
    """FULL sharded serving plane (VERDICT r4 #5): coded vamana segment
    (its OWN SQ8 table sharded — no f32 re-upload) + flat segment + memtable
    rows + deletes in both + an update, served via ShardedEngineSearcher
    with dp-parallel coded graph refinement; results must equal exact brute
    force over the engine's VISIBLE rows (the reference fan-out contract,
    engine/search.go:790-909)."""
    import numpy as np

    from vecgo_tpu.blobstore import MemoryStore
    from vecgo_tpu.engine import Engine, EngineOptions
    from vecgo_tpu.parallel.engine_shard import (
        ShardedEngineSearcher, _brute_visible,
    )
    from vecgo_tpu.utils import testutil as tu

    eng = Engine.open(
        MemoryStore(),
        EngineOptions(dim=16, flush_threshold=10**9, graph_threshold=64,
                      compaction_threshold=10**9, serve_ivf_min_n=64),
        create=True,
    )
    x = tu.gaussian_vectors(480, 16, seed=91)
    ids = eng.insert_batch(x[:256])
    eng.commit()
    ids_b = eng.insert_batch(x[256:320])
    ids += ids_b
    eng.commit()
    eng.compact([h.seg_id for h in eng._segments])  # -> coded vamana seg
    ids_f = eng.insert_batch(x[320:400])
    eng.commit()  # second (flat) segment
    ids_m = eng.insert_batch(x[400:440])  # memtable rows
    eng.delete(ids[7])       # vamana tombstone
    eng.delete(ids_f[3])     # flat tombstone
    eng.delete(ids_m[2])     # memtable tombstone
    eng.insert(x[440], id=ids[9])  # update -> dirty id, stale coded row
    assert any(
        getattr(h.segment, "ivf_members", None) is not None
        for h in eng._segments
    )
    snap = eng.snapshot()
    try:
        ses = ShardedEngineSearcher(snap, mesh8, eng.options.metric, eng.pk)
        q = x[:8]
        got, gd = ses.search(q, k=5, n_probe_local=8, kk=32, refine_steps=2,
                             ef=48)
    finally:
        snap.release()
    want, wd = _brute_visible(eng, q, 5)
    assert (got == want).all(), (got, want)
    np.testing.assert_allclose(gd, wd, rtol=1e-4, atol=1e-4)
    # deleted/stale rows never surface
    flat = set(got.reshape(-1).tolist())
    assert ids[7] not in flat and ids_f[3] not in flat and ids_m[2] not in flat
    eng.close()


def test_sharded_cluster_knn_matches_local(mesh8):
    import numpy as np
    import jax, jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vecgo_tpu.index.build_fast import _cluster_knn
    from vecgo_tpu.parallel.engine_shard import sharded_cluster_knn
    from vecgo_tpu.utils import testutil as tu

    n, d = 512, 16
    x = tu.gaussian_vectors(n, d, seed=91)
    rn_np = np.einsum("nd,nd->n", x, x, dtype=np.float64).astype(np.float32)
    members = np.arange(n, dtype=np.int32).reshape(8, 64)
    slots = np.zeros((8, 64), np.int32)
    import ml_dtypes

    rep = NamedSharding(mesh8, P())
    x16 = jax.device_put(x.astype(ml_dtypes.bfloat16), rep)
    rn = jax.device_put(rn_np, rep)
    got = np.asarray(
        sharded_cluster_knn(x16, rn, members, slots, 8, 1, n, 1, mesh8)
    )
    want = np.asarray(
        _cluster_knn(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(rn_np),
            jnp.asarray(members), jnp.asarray(slots), 8, 1, n, 1,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_build_graph_clustered_on_mesh(mesh8):
    """Full fast build with the cluster-KNN stage sharded over the mesh
    (mesh must live on the default platform)."""
    import numpy as np

    from vecgo_tpu.index.build_fast import build_graph_clustered
    from vecgo_tpu.utils import testutil as tu

    n, d = 6000, 24
    x, _ = tu.clustered_vectors(n, d, n_clusters=24, seed=92)
    g_mesh, medoid, ecent, enodes = build_graph_clustered(
        x, r=16, cluster_size=512, seed=42, mesh=mesh8
    )
    assert g_mesh.shape == (n, 16)
    deg = (g_mesh >= 0).sum(1)
    assert deg.mean() > 4
    # Searchable with decent recall (same harness as test_build_fast).
    from tests.test_build_fast import _search_recall

    q = x[:64] + np.random.default_rng(93).standard_normal((64, d)).astype(np.float32) * 0.01
    _, ti = tu.brute_force_knn(q, x, 10, "l2")
    rec = _search_recall(x, g_mesh, medoid, ecent, enodes, q, ti)
    assert rec >= 0.9, f"mesh-built graph recall {rec}"


def test_sharded_ivf_matches_single_device():
    """VERDICT r2 #7: the blocked-IVF serving table sharded over the mesh —
    cluster-axis shards, per-shard scan, all_gather merge — returns the same
    top-k as the single-device two-stage path."""
    import jax.numpy as jnp

    from vecgo_tpu.index.build_fast import build_graph_clustered
    from vecgo_tpu.ops import ivf
    from vecgo_tpu.parallel.mesh import ShardedIVF, make_mesh

    x, _ = tu.clustered_vectors(20_000, 32, n_clusters=64, seed=7)
    rng = np.random.default_rng(11)
    q = (
        x[rng.choice(len(x), 32, replace=False)]
        + 0.02 * rng.standard_normal((32, 32))
    ).astype(np.float32)

    _, _, _, _, members = build_graph_clustered(
        x, r=16, cluster_size=256, return_membership=True
    )
    table = ivf.device_table_coded(members, jnp.asarray(x))

    # Single-device reference: coded scan, cut to k by coded distance.
    sd, srows = ivf.ivf_scan(jnp.asarray(q), table, n_probe=8, kk=16)
    from vecgo_tpu.ops.beam import _dedup_topk

    ref_d, ref_rows = _dedup_topk(sd, srows, 10)
    ref_rows = np.asarray(ref_rows)

    mesh = make_mesh(shard=4, dp=2)
    siv = ShardedIVF(table, mesh)
    # Per-shard quota 8 probes: superset of the single-device probe set.
    d, rows = siv.search(q, n_probe_local=8, kk=16)
    got = rows[:, :10]
    agree = np.mean([
        len(set(got[b].tolist()) & set(ref_rows[b].tolist())) / 10
        for b in range(len(q))
    ])
    assert agree >= 0.95, agree
    # distances sorted ascending and finite at the head
    assert np.isfinite(d[:, 0]).all()
    assert (np.diff(d[:, :10], axis=1) >= -1e-3).all()


def test_sharded_build_full_pipeline():
    """Mesh-sharded clustered build end-to-end (cluster-KNN + prune + reverse
    all sharded): graph quality matches the single-device build."""
    import jax
    import jax.numpy as jnp

    from vecgo_tpu.index.build_fast import build_graph_clustered
    from vecgo_tpu.parallel.mesh import make_mesh

    x, _ = tu.clustered_vectors(8192, 24, n_clusters=32, seed=13)
    mesh = make_mesh(shard=4, dp=2)
    g_sh, medoid, _, _ = build_graph_clustered(
        x, r=16, cluster_size=256, mesh=mesh
    )
    g_ref, _, _, _ = build_graph_clustered(x, r=16, cluster_size=256)
    assert g_sh.shape == g_ref.shape == (len(x), 16)
    # no self-loops, valid ids (the sharded prune must use GLOBAL row ids)
    rows = np.arange(len(x))[:, None]
    assert not (g_sh == rows).any()
    assert g_sh.max() < len(x)
    deg = (g_sh >= 0).sum(1)
    assert deg.mean() >= 0.8 * (g_ref >= 0).sum(1).mean()

    # search quality parity: beam recall over both graphs
    from vecgo_tpu.ops import beam as beam_ops

    rng = np.random.default_rng(3)
    q = x[rng.choice(len(x), 64, replace=False)]
    xd = jnp.asarray(x, jnp.bfloat16)
    rn = jnp.asarray(
        np.einsum("nd,nd->n", x, x, dtype=np.float64).astype(np.float32)
    )
    d = ((q[:, None, :] - x[None]) ** 2).sum(-1)
    gt = np.argsort(d, axis=1)[:, :10]

    def rec(g):
        _, ids = beam_ops.beam_search(
            jnp.asarray(q), xd, rn, jnp.asarray(g),
            jnp.asarray([int(medoid)], jnp.int32), ef=64, k=10, beam_width=4,
        )
        ids = np.asarray(ids)
        return np.mean([
            len(set(ids[b].tolist()) & set(gt[b].tolist())) / 10
            for b in range(len(q))
        ])

    r_sh, r_ref = rec(g_sh), rec(g_ref)
    assert r_sh >= r_ref - 0.05, (r_sh, r_ref)
