"""Cross-package E2E (reference: integration_test/ — mixed segments, edge
cases, quantization recall through the engine)."""

import numpy as np
import pytest

from vecgo_tpu.blobstore import MemoryStore
from vecgo_tpu.engine import Engine, EngineOptions
from vecgo_tpu.index.vamana import VamanaSegment
from vecgo_tpu.index.flat import FlatSegment
from vecgo_tpu.metadata import eq
from vecgo_tpu.utils import testutil as tu

D = 24


def test_mixed_flat_and_vamana_segments():
    """reference: integration_test/mixed_test.go:20 — search across memtable +
    flat + graph segments must merge correctly."""
    eng = Engine.open(
        MemoryStore(),
        EngineOptions(
            dim=D,
            flush_threshold=10**9,
            graph_threshold=800,  # compactions of >=800 rows become vamana
            compaction_threshold=100,  # no auto compaction
            graph_r=16,
            graph_l_build=32,
        ),
        create=True,
    )
    x = tu.gaussian_vectors(2000, D, seed=111)
    ids1 = eng.insert_batch(x[:1000], [{"part": "a"} for _ in range(1000)])
    eng.commit()
    eng.compact([h.seg_id for h in eng._segments])  # -> vamana segment
    assert isinstance(eng._segments[0].segment, VamanaSegment)
    ids2 = eng.insert_batch(x[1000:1500], [{"part": "b"} for _ in range(500)])
    eng.commit()  # -> flat segment
    kinds = {type(h.segment) for h in eng._segments}
    assert kinds == {VamanaSegment, FlatSegment}
    ids3 = eng.insert_batch(x[1500:], [{"part": "c"} for _ in range(500)])  # memtable

    all_ids = np.asarray(ids1 + ids2 + ids3)
    q = tu.gaussian_vectors(8, D, seed=112)
    _, ti = tu.brute_force_knn(q, x, 10, "l2")
    got = [[c.id for c in r] for r in eng.search_batch(q, k=10, ef=96)]
    want = [[int(all_ids[j]) for j in row] for row in ti]
    rec = tu.recall_at_k(np.asarray(got), np.asarray(want))
    assert rec >= 0.9, rec
    # filtered across all three sources
    res = eng.search(q[0], k=5, filter=eq("part", "c"))
    assert all(c.metadata["part"] == "c" for c in res)


@pytest.mark.parametrize("quantizer,qparams", [("sq8", {}), ("pq", {"m": 6})])
def test_quantized_engine_recall(quantizer, qparams):
    """reference: integration_test/quantization_recall_test.go:17 — recall
    floors through the full engine with rerank."""
    eng = Engine.open(
        MemoryStore(),
        EngineOptions(
            dim=D, flush_threshold=10**9, graph_threshold=1 << 40,
            quantizer=quantizer, qparams=qparams,
        ),
        create=True,
    )
    x, _ = tu.clustered_vectors(3000, D, n_clusters=16, spread=0.1, seed=113)
    ids = eng.insert_batch(x)
    eng.commit()
    q = x[:16] + 0.02 * np.random.default_rng(114).standard_normal((16, D)).astype(np.float32)
    _, ti = tu.brute_force_knn(q, x, 10, "l2")
    got = [[c.id for c in r] for r in eng.search_batch(q, k=10, refine_factor=5)]
    want = [[ids[j] for j in row] for row in ti]
    rec = tu.recall_at_k(np.asarray(got), np.asarray(want))
    assert rec >= 0.9, f"{quantizer}: {rec}"


def test_edge_cases():
    """reference: integration_test/edge_case_test.go — zero vectors, duplicate
    vectors, k > corpus, empty search."""
    eng = Engine.open(
        MemoryStore(), EngineOptions(dim=D, flush_threshold=10**9), create=True
    )
    # empty db search
    res = eng.search(np.ones(D, np.float32), k=5)
    assert len(res) == 0
    # zero vector is valid
    zid = eng.insert(np.zeros(D, np.float32))
    # duplicates are all returned
    v = np.ones(D, np.float32)
    dup_ids = eng.insert_batch(np.stack([v, v, v]))
    res = eng.search(v, k=10)
    assert len(res) == 4  # 3 dups + zero vector
    assert {c.id for c in res[:3]} == set(dup_ids)
    # k > live rows clamps
    res = eng.search(np.zeros(D, np.float32), k=100)
    assert len(res) == 4 and res[0].id == zid
    # max-ish dimension roundtrip
    eng2 = Engine.open(
        MemoryStore(), EngineOptions(dim=4096, flush_threshold=10**9), create=True
    )
    big = np.random.default_rng(1).standard_normal((3, 4096)).astype(np.float32)
    ids = eng2.insert_batch(big)
    eng2.commit()
    assert eng2.search(big[1], k=1)[0].id == ids[1]


def test_compaction_to_vamana_preserves_payloads_metadata():
    eng = Engine.open(
        MemoryStore(),
        EngineOptions(
            dim=D, flush_threshold=10**9, graph_threshold=500,
            compaction_threshold=100, graph_r=12, graph_l_build=24,
        ),
        create=True,
    )
    x = tu.gaussian_vectors(600, D, seed=115)
    ids = eng.insert_batch(
        x,
        [{"i": i} for i in range(600)],
        [f"pl-{i}".encode() for i in range(600)],
    )
    eng.commit()
    eng.compact([h.seg_id for h in eng._segments])
    assert isinstance(eng._segments[0].segment, VamanaSegment)
    c = eng.get(ids[123])
    assert c.metadata == {"i": 123}
    assert c.payload == b"pl-123"
    res = eng.search(x[77], k=1, ef=64)
    assert res[0].id == ids[77] and res[0].payload == b"pl-77"
