"""Probe: flat-scan selector variants at bench geometry (1M x 128, B=4096).

Round-5 question: the >=0.999 flat operating point (flat_rr = bf16 scan over
a k+8 pool + exact f32 rerank, fused) costs ~2x the raw bf16 scan, and the
delta is approx_min_k's pool width, not dispatch (fusion bought only +3%).
Two candidate levers, both measured here on the real chip:

1. Pool width: approx_min_k cost grows ~linearly with k (docs/PERF.md:
   k=20 ~ 1.8x k=10). Screen pool in {k+2, k+4, k+8}: the smallest pool
   whose exact rerank still holds recall >= 0.999 is the right default.
2. The round-1 Pallas fused exact scan (ops/pallas_scan.pallas_l2_topk,
   f32, in-VMEM running top-k) never got real-chip timing ("pending",
   docs/PERF.md round-1). If it lands near the bf16 scan it replaces the
   pool+rerank entirely (exact selection, exact scores, k=10).

Usage: python scripts/probe_flat_selectors.py [N]  (default 1_000_000; reads
the bench corpus cache when present, else generates the same fixture).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
D, K, B, NQ = 128, 10, 4096, 1024


def main():
    import jax
    import jax.numpy as jnp

    from vecgo_tpu.model import Metric
    from vecgo_tpu.ops import topk as T
    from vecgo_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    cache = os.path.join(
        os.environ.get("BENCH_CACHE", "/tmp/vecgo_bench_cache"), f"{N}x{D}"
    )
    if os.path.exists(os.path.join(cache, "gt.npy")):
        x = np.load(os.path.join(cache, "x.npy"), mmap_mode="r")
        q = np.asarray(np.load(os.path.join(cache, "q.npy")))
        gt = np.asarray(np.load(os.path.join(cache, "gt.npy")))
        assert x.shape == (N, D) and gt.shape[0] >= NQ and gt.shape[1] >= K
        x = np.asarray(x)
    else:
        from vecgo_tpu.utils import testutil as tu

        x, _ = tu.clustered_vectors(N, D, n_clusters=1024, seed=42)
        q = tu.gaussian_vectors(NQ, D, seed=43)
        xd_ = jnp.asarray(x)
        rn_ = jnp.sum(xd_ * xd_, axis=1)
        _, gt = T.blockwise_topk_search(
            jnp.asarray(q), xd_, K, metric=Metric.L2, x_norms_sq=rn_,
            block_rows=131072, exact=True,
        )
        gt = np.asarray(gt)

    xd = jnp.asarray(x)
    rn = jnp.sum(xd * xd, axis=1)
    xb16 = xd.astype(jnp.bfloat16)
    qd = jnp.asarray(q[:NQ])
    qb = jnp.asarray(np.tile(q[:NQ], (max(1, B // NQ), 1))[:B])

    def recall(ids):
        return sum(
            len(set(map(int, ids[b])) & set(map(int, gt[b][:K])))
            for b in range(NQ)
        ) / (NQ * K)

    def timed(fn, reps=5):
        jax.block_until_ready(fn())  # warm + compile
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    # ---- baseline: raw bf16 approx scan at k ----
    def bf16_scan(queries):
        return T.blockwise_topk_search(
            queries, xb16, K, metric=Metric.L2, x_norms_sq=rn,
            block_rows=131072, compute_dtype=jnp.bfloat16,
        )

    ids0 = np.asarray(bf16_scan(qd)[1])
    dt0 = timed(lambda: bf16_scan(qb)[1])
    print(
        f"flat_bf16        k={K}   {B / dt0:>9.0f} qps  {dt0 * 1e3:6.1f} ms "
        f"recall={recall(ids0):.4f}",
        flush=True,
    )

    # ---- pooled fused scan+rerank at several pool widths ----
    def make_rr(pool):
        @jax.jit
        def _rr(queries, xb16, xd, rn):
            _, rows = T.blockwise_topk_search(
                queries, xb16, pool, metric=Metric.L2, x_norms_sq=rn,
                block_rows=131072, compute_dtype=jnp.bfloat16,
            )
            safe = jnp.maximum(rows, 0)
            v = jnp.take(xd, safe, axis=0)
            qf = queries.astype(jnp.float32)
            prod = jnp.einsum(
                "bcd,bd->bc", v, qf, precision=jax.lax.Precision.HIGHEST
            )
            qn = jnp.sum(qf * qf, axis=-1, keepdims=True)
            dd = qn + jnp.take(rn, safe) - 2.0 * prod
            dd = jnp.where(rows >= 0, jnp.maximum(dd, 0.0), jnp.inf)
            return T.topk_smallest_with_ids(dd, rows, K)

        return lambda queries: _rr(queries, xb16, xd, rn)

    for pool in (K + 2, K + 4, K + 8):
        fn = make_rr(pool)
        ids = np.asarray(fn(qd)[1])
        dt = timed(lambda fn=fn: fn(qb)[1])
        print(
            f"flat_rr pool={pool:<3}      {B / dt:>9.0f} qps  {dt * 1e3:6.1f} ms "
            f"recall={recall(ids):.4f}",
            flush=True,
        )

    # ---- Pallas fused exact f32 scan+topk ----
    try:
        from vecgo_tpu.ops.pallas_scan import pallas_l2_topk

        for tile_n in (2048, 8192):
            def pf(queries, tile_n=tile_n):
                return pallas_l2_topk(
                    queries, xd, rn, k=K, tile_b=512, tile_n=tile_n
                )

            ids = np.asarray(pf(qd)[1])
            dt = timed(lambda pf=pf: pf(qb)[1])
            print(
                f"pallas_f32 tn={tile_n:<5}  {B / dt:>9.0f} qps  "
                f"{dt * 1e3:6.1f} ms recall={recall(ids):.4f}",
                flush=True,
            )
    except Exception as e:  # noqa: BLE001
        print(f"pallas probe failed: {e!r}", flush=True)


if __name__ == "__main__":
    main()
