"""Engine pipelined-throughput phase probe (ROADMAP #2).

Builds one graph segment (default 200k x 128d clustered), then times
search_snapshot directly with stats enabled at several batch sizes,
printing the planning / scoring / rerank(drain) / materialize split —
the levers for the >=50k QPS @ B=1024 target.

Usage: python scripts/probe_engine_phases.py [N] [B ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
BATCHES = [int(a) for a in sys.argv[2:]] or [1024, 4096, 16384]
D = 128

from vecgo_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from vecgo_tpu.blobstore import MemoryStore
from vecgo_tpu.engine import Engine, EngineOptions
from vecgo_tpu.engine import search as search_mod
from vecgo_tpu.model import SearchOptions


def log(m):
    print(m, file=sys.stderr, flush=True)


rng = np.random.default_rng(42)
centers = rng.standard_normal((1024, D)).astype(np.float32)
x = centers[rng.integers(0, 1024, N)] + 0.35 * rng.standard_normal(
    (N, D)
).astype(np.float32)

log(f"ingest+commit {N} rows...")
eng = Engine.open(
    MemoryStore(), EngineOptions(dim=D, flush_threshold=10**9), create=True
)
eng.insert_batch(x)
t0 = time.perf_counter()
eng.commit()
log(f"commit (flat flush) {time.perf_counter()-t0:.1f}s")
# Graphs come from COMPACTION (reference: flat on flush, DiskANN at merge,
# compaction.go:102-113) — compact so the probe measures the graph path.
# PROBE_COMPACT=0 keeps the flat segment (the engine-suite serving shape;
# also dodges the compact-then-search tunnel bug documented in PERF.md).
if os.environ.get("PROBE_COMPACT", "1") != "0":
    t0 = time.perf_counter()
    eng.compact([h.seg_id for h in eng._segments])
    log(f"compact (graph build) {time.perf_counter()-t0:.1f}s")
_snap0 = eng.snapshot()
seg_kind = next(h.segment for h in _snap0.segments).__class__.__name__
_snap0.release()
log(f"serving segment: {seg_kind}")

# Post-compaction device health probe: the full build sequence can poison
# subsequent dispatch on the tunnel (devbug). Check eager ops immediately.
import jax.numpy as jnp

for attempt in range(3):
    try:
        v = jnp.arange(8)[2:5] + 1
        jax.block_until_ready(v)
        log(f"device health after compact: OK (attempt {attempt})")
        break
    except Exception as e:  # noqa: BLE001
        log(f"device health after compact: FAIL {type(e).__name__} (attempt {attempt})")
        jax.clear_caches()
        time.sleep(2)

qs = x[rng.integers(0, N, max(BATCHES))] + 0.05 * rng.standard_normal(
    (max(BATCHES), D)
).astype(np.float32)
# Host queries (the public-API shape): search_snapshot uploads per call, and
# the INVALID_ARGUMENT retry ladder can re-upload after clearing device state
# — slicing a DEVICE array here instead makes the ladder's own q demotion
# dispatch D2H on the poisoned backend and die (observed 2026-08-18).
qd_all = np.asarray(qs, np.float32)

snap = eng.snapshot()
for b in BATCHES:
    for profile in ("exact", "fast"):
        chunk = int(os.environ.get("PROBE_CHUNK", "1024"))
        search_mod.CHUNK_B = chunk
        qd = qd_all[:b]
        opts = SearchOptions(k=10, with_stats=True)
        if profile == "fast":
            opts.graph_refine = 0
            opts.graph_rescore = False
            opts.nprobes = 6
            opts.graph_qcap_factor = 1.5
        # warm (compile); need_locations=False = the search_arrays hot path
        search_mod.search_snapshot(snap, eng.pk, qd, opts, eng.options,
                                   device_budget=eng._device_budget,
                                   need_locations=False)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            ids, dists, _, st = search_mod.search_snapshot(
                snap, eng.pk, qd, opts, eng.options,
                device_budget=eng._device_budget,
                need_locations=False,
            )
        dt = (time.perf_counter() - t0) / reps
        log(
            f"B={b:6d} {profile:5s}  {dt*1e3:8.1f} ms  {b/dt:10.0f} qps   "
            f"plan {st.planning_time_s*1e3:6.1f}  score {st.scoring_time_s*1e3:7.1f}  "
            f"drain {st.rerank_time_s*1e3:7.1f}  finish {st.materialize_time_s*1e3:7.1f}"
        )

# Streaming serving (inter-batch pipelining): B=1024 batches, depth in flight.
sb = 1024
n_stream = max(8, max(BATCHES) // sb)
stream_q = [qd_all[(i * sb) % len(qd_all):][:sb] for i in range(n_stream)]
stream_q = [q_ for q_ in stream_q if q_.shape[0] == sb]
opts = SearchOptions(k=10)
for depth in (1, 2, 3, 4):
    for _ in search_mod.search_snapshot_stream(
        snap, eng.pk, stream_q[:2], opts, eng.options,
        device_budget=eng._device_budget, depth=depth,
    ):
        pass  # warm
    t0 = time.perf_counter()
    n_got = 0
    for ids, _, _, _ in search_mod.search_snapshot_stream(
        snap, eng.pk, stream_q, opts, eng.options,
        device_budget=eng._device_budget, depth=depth,
    ):
        n_got += ids.shape[0]
    dt = time.perf_counter() - t0
    log(f"stream B={sb} depth={depth}: {n_got/dt:10.0f} qps  ({dt*1e3:.1f} ms / {n_got} queries)")
# ---- micro-decomposition: device compute vs merge vs D2H (B=4096) ----
qd = qd_all[:4096]
opts = SearchOptions(k=10)
plan = search_mod._plan_snapshot(snap, opts, eng.options, eng._device_budget)
fetch_k = opts.k * opts.refine_factor


def timed(name, fn, reps=3):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out) if hasattr(out, "block_until_ready") or isinstance(out, (list, tuple)) else None
    dt = (time.perf_counter() - t0) / reps
    log(f"  {name:36s} {dt*1e3:8.1f} ms")
    return dt


def dispatch_only():
    outs = []
    for ci in range(4):
        rr, _, _ = search_mod._dispatch_chunk(
            plan, qd[ci * 1024 : (ci + 1) * 1024], opts, eng.options
        )
        outs.extend(d for _, d, _ in rr)
    jax.block_until_ready(outs)
    return outs


def dispatch_merge():
    packed = []
    for ci in range(4):
        rr, _, _ = search_mod._dispatch_chunk(
            plan, qd[ci * 1024 : (ci + 1) * 1024], opts, eng.options
        )
        p, _ = search_mod._merge_device(rr, fetch_k)
        packed.append(p)
    jax.block_until_ready(packed)
    return packed


def full_with_transfer():
    packed = dispatch_merge()
    import jax.numpy as jnp

    return np.asarray(jnp.stack(packed))


log("micro-decomposition (B=4096, 4 chunks):")
timed("dispatch only (device compute)", dispatch_only)
timed("dispatch + merge", dispatch_merge)
timed("dispatch + merge + D2H", full_with_transfer)

# ---- inside one chunk: seg.search vs seg.rerank (B=1024) ----
seg = next(h.segment for h in snap.segments)
q1 = qd_all[:1024]


_is_flat = seg.__class__.__name__ == "FlatSegment"


def seg_search_exact():
    if _is_flat:
        d, rows = seg.search(q1, 20)
    else:
        d, rows = seg.search(q1, 20, ef=48, beam_width=4)
    jax.block_until_ready(rows)
    return rows


def seg_search_fast():
    if _is_flat:
        d, rows = seg.search(q1, 20, nprobes=6)
    else:
        d, rows = seg.search(
            q1, 20, ef=48, beam_width=4, refine_steps=0, rescore=False,
            n_probe=6, qcap_factor=1.5,
        )
    jax.block_until_ready(rows)
    return rows


rows_w = seg_search_exact()


def seg_rerank():
    d = seg.rerank(q1, rows_w)
    jax.block_until_ready(d)
    return d


log("single-chunk bisect (B=1024):")
timed("seg.search exact", seg_search_exact)
timed("seg.search fast", seg_search_fast)
timed("seg.rerank", seg_rerank)

snap.release()
eng.close()
