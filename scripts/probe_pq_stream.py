"""Probe: PQ transport selection quality at 1M (stream_pq recall triage).

BENCH_FULL r5 measured stream_pq_recall = 0.46 at pool=4k (k=10, m=d/4):
the PQ coded ordering at 1M is far coarser than the CPU-scale tests
suggested. This probe screens (m, pool) on the real corpus to find the
cheapest configuration whose exact rerank recovers recall >= 0.95 — or to
establish that PQ transport needs m=d/2 (2x the SQ8 savings instead of
3.6x) to be shippable.

Selection quality only: codes are device-resident here (transfer economics
are the stream wrapper's job; selection quality is independent of where the
codes live).

Usage: python scripts/probe_pq_stream.py [N]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
D, K, NQ = 128, 10, 256


def main():
    import jax
    import jax.numpy as jnp

    from vecgo_tpu import quantization as Q
    from vecgo_tpu.model import Metric
    from vecgo_tpu.ops import topk as T
    from vecgo_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    cache = os.path.join(
        os.environ.get("BENCH_CACHE", "/tmp/vecgo_bench_cache"), f"{N}x{D}"
    )
    x = np.asarray(np.load(os.path.join(cache, "x.npy"), mmap_mode="r"))
    q = np.asarray(np.load(os.path.join(cache, "q.npy")))[:NQ]
    gt = np.asarray(np.load(os.path.join(cache, "gt.npy")))[:NQ]
    qd = jnp.asarray(q)
    rn_host = np.einsum("nd,nd->n", x, x, dtype=np.float64).astype(np.float32)

    def recall(ids):
        return sum(
            len(set(map(int, ids[b])) & set(map(int, gt[b][:K])))
            for b in range(NQ)
        ) / (NQ * K)

    for m in (D // 4, D // 2):
        t0 = time.perf_counter()
        pq = Q.create("pq", dim=D, m=m)
        pq.train(x[:: max(1, N // 65536)])
        enc = pq.encode(x)
        enc_dev = {k_: jnp.asarray(v) for k_, v in enc.items()}
        t_enc = time.perf_counter() - t0

        def score_fn(qq, extra, blk, pq=pq):
            return pq.score(qq, blk, Metric.L2)

        for pool in (4 * K, 128, 512):
            _, rows = T.blockwise_topk_scored(
                qd, enc_dev, N, pool, score_fn, block_rows=131072
            )
            rows = np.asarray(rows)
            # raw coded recall (how many true top-10 are in the pool at all)
            pool_rec = sum(
                len(set(map(int, rows[b])) & set(map(int, gt[b][:K])))
                for b in range(NQ)
            ) / (NQ * K)
            # exact host-numpy rerank of the pool (zero H2D)
            safe = np.maximum(rows, 0)
            v = x[safe]  # [B, pool, d]
            prod = np.einsum("bcd,bd->bc", v, q, dtype=np.float64)
            qn = np.einsum("bd,bd->b", q, q, dtype=np.float64)
            dd = qn[:, None] + rn_host[safe] - 2.0 * prod
            dd = np.where(rows >= 0, dd, np.inf)
            top = np.take_along_axis(
                rows, np.argsort(dd, axis=1)[:, :K], axis=1
            )
            print(
                f"m={m:<3} pool={pool:<4} pool_recall={pool_rec:.4f} "
                f"reranked_recall={recall(top):.4f} "
                f"bytes/row={m + 4} (enc {t_enc:.0f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
