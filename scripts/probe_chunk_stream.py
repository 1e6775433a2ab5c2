"""Sweep VECGO_CHUNK_B for the pipelined engine stream (the serving mode).

The sync probe (probe_engine_serving.py) showed per-call drain = device
sweeps + ~40 ms tunnel RTT; the stream hides the RTT, so the chunk size that
minimizes pure device time per 4096-query batch wins. Measured sweep costs
(1M x 128, stored-bf16 scan table): 1024-chunk ~10.5 ms, 2048 ~10 ms,
4096 ~31 ms (fusion/VMEM boundary above 2048).

Usage: [CHUNKS=1024,2048,4096] [N=1000000] python scripts/probe_chunk_stream.py
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
    n_stream = int(os.environ.get("NSTREAM", 8))
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
    from vecgo_tpu.engine import search as sm

    log("ingest + commit...")
    eng = Engine.open(
        MemoryStore(), EngineOptions(dim=d, flush_threshold=2**62), create=True
    )
    eng.insert_batch(x)
    t0 = time.perf_counter()
    eng.commit()
    log(f"commit_s={time.perf_counter() - t0:.1f}")

    qd = jnp.asarray(q)
    batches = [qd] * n_stream

    for cb in chunks:
        sm.CHUNK_B = cb

        def stream_all():
            for _ in eng.search_arrays_stream(iter(batches), k=10, depth=3):
                pass

        stream_all()  # warm/compile
        t0 = time.perf_counter()
        stream_all()
        dt = time.perf_counter() - t0
        log(
            f"CHUNK_B={cb}: stream {n_stream * batch / dt:,.0f} qps "
            f"({dt / n_stream * 1e3:.1f} ms/batch)"
        )
        # sync for contrast
        eng.search_arrays(qd, k=10)
        t0 = time.perf_counter()
        for _ in range(5):
            eng.search_arrays(qd, k=10)
        dt = (time.perf_counter() - t0) / 5
        log(f"CHUNK_B={cb}: sync   {batch / dt:,.0f} qps ({dt * 1e3:.1f} ms/batch)")
    eng.close()


if __name__ == "__main__":
    main()
