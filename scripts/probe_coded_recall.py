"""Decompose the coded graph path's recall ceiling (~0.9596 at 1M in BENCH_r04
no matter ef/probes/refine/rescore).

Hypotheses, measured independently at bench-like corpus statistics:
  H1  probe coverage: GT rows outside the probed clusters        (coverage@p)
  H2  kk truncation: GT rows inside probed clusters but cut by the
      per-(query,cluster) top-kk                                  (pool cov)
  H3  coding error: bf16 ENCODE INPUT (device_state feeds bf16-rounded
      vectors into _coded_build, permanently baking flat-bf16-grade error
      into x-hat) + per-cluster SCALAR SQ8 scale                  (recall f32enc)
  H4  scan matmul precision: bf16(qr) . codes                     (recall exactpool)

Run on CPU (conftest-free: pins platform itself).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

N = 200_000
D = 128
N_CLUSTERS = 64  # bench uses N/5208 ~ 192 at 1M; keep density similar
NQ = 512
K = 10


def log(*a):
    print(*a, flush=True)


def main():
    rng = np.random.default_rng(42)
    centers = rng.standard_normal((N_CLUSTERS, D)).astype(np.float32)
    assign = rng.integers(0, N_CLUSTERS, size=N)
    x = centers[assign] + 0.35 * rng.standard_normal((N, D)).astype(np.float32)
    q = centers[rng.integers(0, N_CLUSTERS, size=NQ)] + 0.35 * (
        rng.standard_normal((NQ, D)).astype(np.float32)
    )

    from vecgo_tpu.utils import testutil as tu

    _, gt = tu.brute_force_knn(q, x, K)
    gt = np.asarray(gt)

    from vecgo_tpu.ops import ivf as ivf_ops

    capacity = 512
    cents, members = ivf_ops.build_ivf_table(x, capacity=capacity, seed=7)
    kt = cents.shape[0]
    log(f"table: k={kt} capacity={capacity}")

    # row -> set of clusters that carry it
    row_clusters = [[] for _ in range(N)]
    for c in range(kt):
        for r_ in members[c]:
            if r_ >= 0:
                row_clusters[r_].append(c)

    qd = jnp.asarray(q)

    def _dedup(dists, rows):
        """Keep the best distance per unique row (overlap membership can
        surface a row from several clusters — production uses _dedup_topk)."""
        out_d = np.full_like(dists, np.inf)
        out_r = np.full_like(rows, -1)
        for i in range(rows.shape[0]):
            seen = {}
            for j in np.argsort(dists[i]):
                r_ = rows[i, j]
                if r_ >= 0 and r_ not in seen:
                    seen[r_] = dists[i, j]
            rr = np.fromiter(seen.keys(), np.int64, len(seen))
            dd = np.fromiter(seen.values(), np.float64, len(seen))
            out_r[i, : len(rr)] = rr
            out_d[i, : len(dd)] = dd
        return out_d, out_r

    def eval_recall(table, n_probe, kk, tag, rerank_rows=None):
        sd, srows = ivf_ops.ivf_scan(qd, table, n_probe=n_probe, kk=kk)
        sd, srows = _dedup(np.asarray(sd), np.asarray(srows))
        srows_np = np.asarray(srows)
        # pool coverage: GT rows present in the scan output (pre top-k cut)
        pool_cov = np.mean(
            [np.isin(gt[i], srows_np[i]).mean() for i in range(NQ)]
        )
        order = np.argsort(np.asarray(sd), axis=1)
        top = np.take_along_axis(srows_np, order[:, :K], axis=1)
        rec = np.mean([np.isin(gt[i], top[i]).mean() for i in range(NQ)])
        extra = ""
        if rerank_rows is not None:
            # exact f32 rerank of the full scan pool against TRUE rows
            pool = srows_np
            pr = np.where(pool >= 0, pool, 0)
            vv = rerank_rows[pr]  # [B, P, d]
            dd = ((q[:, None, :].astype(np.float64) - vv) ** 2).sum(-1)
            dd = np.where(pool >= 0, dd, np.inf)
            o2 = np.argsort(dd, axis=1)
            top2 = np.take_along_axis(pool, o2[:, :K], axis=1)
            rec2 = np.mean([np.isin(gt[i], top2[i]).mean() for i in range(NQ)])
            extra = f" recall_exact_rerank={rec2:.4f}"
        log(
            f"{tag:28s} p={n_probe:3d} kk={kk:3d} pool_cov={pool_cov:.4f} "
            f"recall@10={rec:.4f}{extra}"
        )
        return rec

    # --- probe coverage (H1): is GT's cluster among the query's top-p probes?
    qn = (q.astype(np.float64) ** 2).sum(1)
    cn = (cents.astype(np.float64) ** 2).sum(1)
    cd = qn[:, None] + cn[None, :] - 2.0 * q.astype(np.float64) @ cents.T.astype(np.float64)
    probe_order = np.argsort(cd, axis=1)
    for p in (4, 8, 16):
        probes = probe_order[:, :p]
        cov = np.mean([
            np.mean([
                bool(set(row_clusters[r_]) & set(probes[i]))
                for r_ in gt[i]
            ])
            for i in range(NQ)
        ])
        log(f"probe coverage (GT in probed clusters) p={p}: {cov:.4f}")

    x16 = jnp.asarray(x, jnp.bfloat16)  # today's encode input
    xf = jnp.asarray(x)  # f32 encode input (fix candidate)

    t_bf16 = ivf_ops.device_table_coded(members, x16)
    t_f32 = ivf_ops.device_table_coded(members, xf)

    for p, kk in ((4, 16), (8, 16), (16, 16), (16, 32)):
        eval_recall(t_bf16, p, kk, "coded(bf16-encode)", rerank_rows=x)
    log("")
    for p, kk in ((4, 16), (8, 16), (16, 16), (16, 32)):
        eval_recall(t_f32, p, kk, "coded(f32-encode)", rerank_rows=x)


if __name__ == "__main__":
    main()
