"""Profile the engine-level serving path vs the raw flat kernel on one chip.

Round-4 driver bench measured engine_flat 25.6k QPS vs flat_rr 142.7k at
1M x 128d (160 ms vs 29 ms per 4096 batch) — this script breaks the ~130 ms
of engine overhead down by phase (plan / score dispatch / drain / host
finish) and sweeps VECGO_CHUNK_B.

Usage: [CHUNKS=1024,2048,4096] [N=1000000] python scripts/probe_engine_serving.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("N", 1_000_000))
    d = int(os.environ.get("D", 128))
    batch = int(os.environ.get("BATCH", 4096))
    chunks = [int(c) for c in os.environ.get("CHUNKS", "1024,2048,4096").split(",")]

    import jax
    import jax.numpy as jnp

    from vecgo_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    rng = np.random.default_rng(42)
    centers = rng.standard_normal((1024, d)).astype(np.float32)
    assign = rng.integers(0, 1024, size=n)
    x = centers[assign] + 0.35 * rng.standard_normal((n, d)).astype(np.float32)
    q = centers[rng.integers(0, 1024, size=batch)] + 0.35 * rng.standard_normal(
        (batch, d)
    ).astype(np.float32)

    from vecgo_tpu.blobstore import MemoryStore
    from vecgo_tpu.engine import Engine, EngineOptions

    log("ingest + commit...")
    eng = Engine.open(
        MemoryStore(), EngineOptions(dim=d, flush_threshold=2**62), create=True
    )
    eng.insert_batch(x)
    t0 = time.perf_counter()
    eng.commit()
    log(f"commit_s={time.perf_counter() - t0:.1f}")

    seg = eng._segments[-1].segment
    qd = jnp.asarray(q)

    # raw kernel number (FlatSegment.search, the engine's own scorer)
    def kern():
        return seg.search(qd, 10)[1]

    jax.block_until_ready(kern())
    t0 = time.perf_counter()
    for _ in range(5):
        out = kern()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 5
    log(f"kernel: {batch / dt:,.0f} qps ({dt * 1e3:.1f} ms/batch)")

    # engine path with per-phase stats, per chunk size
    from vecgo_tpu.engine import search as sm
    from vecgo_tpu.model import SearchOptions

    for cb in chunks:
        sm.CHUNK_B = cb
        snap = eng.snapshot()
        try:
            opts = SearchOptions(k=10, with_stats=True)
            # warm
            sm.search_snapshot(snap, eng.pk, qd, opts, eng.options,
                               need_locations=False)
            t0 = time.perf_counter()
            reps = 5
            for _ in range(reps):
                ids, dists, _, stats = sm.search_snapshot(
                    snap, eng.pk, qd, opts, eng.options, need_locations=False
                )
            dt = (time.perf_counter() - t0) / reps
            log(
                f"CHUNK_B={cb}: {batch / dt:,.0f} qps ({dt * 1e3:.1f} ms) | "
                f"plan={stats.planning_time_s * 1e3:.1f} "
                f"score={stats.scoring_time_s * 1e3:.1f} "
                f"rerank={stats.rerank_time_s * 1e3:.1f} "
                f"mat={stats.materialize_time_s * 1e3:.1f} "
                f"total={stats.total_time_s * 1e3:.1f}"
            )
        finally:
            snap.release()

    # search_arrays end-to-end (the bench's engine number)
    sm.CHUNK_B = 1024
    eng.search_arrays(qd, k=10)
    t0 = time.perf_counter()
    for _ in range(5):
        eng.search_arrays(qd, k=10)
    dt = (time.perf_counter() - t0) / 5
    log(f"search_arrays: {batch / dt:,.0f} qps ({dt * 1e3:.1f} ms/batch)")
    eng.close()


if __name__ == "__main__":
    main()
