"""Probe: does widening the per-cluster winners cap (ivf_scan kk) lift the
coded graph path's recall plateau?

BENCH_r04 screening showed vamana recall pinned at ~0.959 across
p=4..24 / ef=48..96 / refine 0-1 — immune to every knob EXCEPT kk, which the
auto rule caps at 16 (`kk = max(8, min(16, 2*ef/p))`, index/vamana.py:863).
At 1M the table holds ~8192 rows/cluster and a query's true top-10 rows mostly
fall into its home cell, so the int8-coded in-cluster top-16 cut is the one
stage whose losses no downstream rescore/refine can recover. This probe decomposes
recall by kk at bench-faithful geometry (8192-row clusters).

Usage: python scripts/probe_kk_recall.py [N]   (default 100000; reads the
bench corpus cache if present, else generates the bench's clustered corpus)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
D = 128
NQ = 1024
K = 10


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from vecgo_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    cd = os.path.join(
        os.environ.get("BENCH_CACHE", "/tmp/vecgo_bench_cache"), f"{N}x{D}"
    )
    cached = None
    if os.path.exists(os.path.join(cd, "ready.json")):
        x = np.load(os.path.join(cd, "x.npy"))
        q = np.load(os.path.join(cd, "q.npy"))[:NQ]
        gt = np.load(os.path.join(cd, "gt.npy"))[:NQ]
        # A cache built with different geometry/K would silently skew recall.
        if (
            x.shape == (N, D)
            and q.shape == (NQ, D)
            and gt.shape[0] == NQ
            and gt.shape[1] >= K
        ):
            cached = True
            log(f"using bench cache {cd}")
        else:
            log(f"bench cache {cd} has mismatched shapes; regenerating")
    if not cached:
        rng = np.random.default_rng(42)
        centers = rng.standard_normal((1024, D)).astype(np.float32)
        assign = rng.integers(0, 1024, size=N)
        x = centers[assign] + 0.35 * rng.standard_normal((N, D)).astype(
            np.float32
        )
        q = centers[rng.integers(0, 1024, size=NQ)] + 0.35 * (
            rng.standard_normal((NQ, D)).astype(np.float32)
        )
        from vecgo_tpu.model import Metric
        from vecgo_tpu.ops import topk as T

        xd = jnp.asarray(x)
        rn = jnp.sum(xd * xd, axis=1)
        _, gt = T.blockwise_topk_search(
            jnp.asarray(q), xd, K, metric=Metric.L2, x_norms_sq=rn,
            block_rows=min(131072, N), exact=True,
        )
        gt = np.asarray(gt)

    from vecgo_tpu.index.build_fast import build_graph_clustered
    from vecgo_tpu.ops import beam as beam_ops
    from vecgo_tpu.ops import ivf as ivf_ops

    xd16 = jnp.asarray(x, jnp.bfloat16)
    t0 = time.perf_counter()
    graph_dev, medoid, bc, be, members = build_graph_clustered(
        xd16, r=32, alpha=1.5, refine_rounds=0, return_device=True,
        return_membership="device",
    )
    log(f"build: {time.perf_counter() - t0:.1f}s")
    table = ivf_ops.device_table_coded(members, xd16, refine=jnp.asarray(x))
    kt, st, _ = table.codes.shape
    log(f"table: k={kt} slots/cluster={st}")

    qd = jnp.asarray(q)

    import functools

    @functools.lru_cache(maxsize=1)
    def _rr16():
        from vecgo_tpu.ops.ivf import RSCALE_RATIO

        @functools.partial(jax.jit, static_argnames=("s",))
        def f(q, rows, rcodes, scale, slot_of_row, cents, *, s):
            b, c = rows.shape
            safe = jnp.maximum(rows, 0)
            cl = jnp.take(slot_of_row, safe) // s
            cv = jnp.take(rcodes, safe.reshape(-1), axis=0).reshape(
                b, c, -1
            ).astype(jnp.float32)
            rs = jnp.take(scale, cl) * RSCALE_RATIO
            xhat = (
                jnp.take(cents, cl.reshape(-1), axis=0).reshape(b, c, -1)
                + cv * rs[:, :, None]
            )
            qn = jnp.sum(q * q, axis=1)
            # HIGHEST precision + 0-clamp: this probe must rank with the EXACT
            # serving rescore (vecgo_tpu/index/vamana.py _rrq16) — default TPU
            # f32 matmul precision is reduced and could reorder near-ties.
            dd = (
                qn[:, None]
                + jnp.sum(xhat * xhat, axis=-1)
                - 2.0 * jnp.einsum(
                    "bd,bcd->bc", q, xhat,
                    precision=jax.lax.Precision.HIGHEST,
                )
            )
            return jnp.where(rows >= 0, jnp.maximum(dd, 0.0), jnp.inf)

        return f

    def recall_of(ids):
        return np.mean(
            [len(set(map(int, ids[b])) & set(map(int, gt[b]))) for b in
             range(NQ)]
        ) / K

    def run_config(p, kk, ef, rs):
        """One full config pass, synced at the end. Returns (ids, pool_np)."""
        sd, srows = ivf_ops.ivf_scan(qd, table, n_probe=p, kk=kk)
        cd, crows = beam_ops._dedup_topk(sd, srows, max(ef, K))
        pool = jnp.where(jnp.isfinite(cd), crows, -1)
        if rs:
            rd = _rr16()(
                qd, pool, table.rcodes, table.scale,
                table.slot_of_row, table.centroids,
                s=int(table.rows.shape[1]),
            )
            _, si = jax.lax.sort((rd, pool.astype(jnp.int32)), num_keys=1)
            ids_dev = si[:, :K]
        else:
            ids_dev = pool[:, :K]
        jax.block_until_ready((pool, ids_dev))
        return np.asarray(ids_dev), np.asarray(pool)

    for p in (4, 8):
        for kk in (16, 32, 48):
            for ef in (48, 96):
                for rs in (0, 1):
                    if rs == 0 and kk > 16:
                        continue
                    # First pass pays jit compile; the second is steady-state.
                    # Report both so configs are comparable.
                    t0 = time.perf_counter()
                    ids, pool_np = run_config(p, kk, ef, rs)
                    t_cold = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    ids, pool_np = run_config(p, kk, ef, rs)
                    t_warm = time.perf_counter() - t0
                    pcov = np.mean(
                        [np.isin(gt[b], pool_np[b]).mean() for b in range(NQ)]
                    )
                    rec = recall_of(ids)
                    log(
                        f"p={p} kk={kk} ef={ef} rs={rs}: pool_cov={pcov:.4f} "
                        f"recall={rec:.4f} (cold {t_cold:.1f}s incl compile, "
                        f"warm {t_warm:.2f}s)"
                    )


if __name__ == "__main__":
    main()
