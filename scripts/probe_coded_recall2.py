"""Probe 2: bench-faithful serving table (build_graph_clustered membership ->
device_table_coded), decomposing the 1M recall ceiling (0.9596 flat across
p4..p24 in BENCH_r04) at 200k scale.

Measures, per n_probe:
  containment  GT rows carried by ANY probed cluster (membership+probe bound)
  pool_cov     GT rows in the ivf_scan output pool
  recall       production no-rescore cut (dedup + top-k)
  recall_rr    exact f32 rerank of the deduped ef-pool (upper bound given pool)
  recall_ref   +1 graph-refinement step (beam_search_coded) then coded rescore
And the global membership containment bound: GT rows present in the table at
all, and GT rows carried by one of their OWN top-m nearest clusters.
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
N_CLUSTERS = 64
NQ = 512
K = 10
EF = 48


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

    from vecgo_tpu.index.build_fast import build_graph_clustered
    from vecgo_tpu.ops import beam as beam_ops
    from vecgo_tpu.ops import ivf as ivf_ops

    xd = jnp.asarray(x, jnp.bfloat16)
    graph_dev, medoid, bc, be, members = build_graph_clustered(
        xd, r=32, alpha=1.5, refine_rounds=0, return_device=True,
        return_membership="device",
    )
    members_np = np.asarray(members)
    kt, cap = members_np.shape
    log(f"membership: k={kt} cap={cap} slots={kt*cap} ({kt*cap/N:.2f}x rows)")

    table = ivf_ops.device_table_coded(members, xd)
    cents = np.asarray(table.centroids)

    # row -> clusters carrying it
    carried = np.zeros(N, bool)
    row_clusters = [[] for _ in range(N)]
    for c in range(kt):
        for r_ in members_np[c]:
            if r_ >= 0:
                carried[r_] = True
                row_clusters[r_].append(c)
    log(f"rows carried at all: {carried.mean():.4f}")

    # membership quality: is the row in one of its own top-m nearest clusters?
    xn = (x.astype(np.float64) ** 2).sum(1)
    cn = (cents.astype(np.float64) ** 2).sum(1)
    gtr = np.unique(gt.reshape(-1))
    dd = (
        xn[gtr][:, None] + cn[None, :]
        - 2.0 * x[gtr].astype(np.float64) @ cents.T.astype(np.float64)
    )
    own_order = np.argsort(dd, axis=1)
    for m in (1, 2, 4, 8):
        hit = np.mean([
            bool(set(row_clusters[r_]) & set(own_order[i, :m]))
            for i, r_ in enumerate(gtr)
        ])
        log(f"GT row carried by one of its own top-{m} clusters: {hit:.4f}")

    qn = (q.astype(np.float64) ** 2).sum(1)
    qc = qn[:, None] + cn[None, :] - 2.0 * q.astype(np.float64) @ cents.T.astype(np.float64)
    probe_order = np.argsort(qc, axis=1)

    qd = jnp.asarray(q)
    qcen = jnp.einsum("bd,kd->bk", qd.astype(jnp.float32), table.centroids)

    # Decoded rows x-hat (what a codes-only rescore can see): slot_of_row maps
    # row -> slot; x_hat = centroid + codes*scale.
    slot_of_row = np.asarray(table.slot_of_row)
    codes_flat = np.asarray(table.codes).reshape(-1, D).astype(np.float64)
    scale_rep = np.repeat(np.asarray(table.scale).astype(np.float64), cap)
    cent_rep = np.repeat(cents.astype(np.float64), cap, axis=0)

    def _rr(pool, rows64):
        pr = np.where(pool >= 0, pool, 0)
        vv = rows64[pr]
        dd = ((q[:, None, :].astype(np.float64) - vv) ** 2).sum(-1)
        dd = np.where(pool >= 0, dd, np.inf)
        o2 = np.argsort(dd, axis=1)
        top2 = np.take_along_axis(pool, o2[:, :K], axis=1)
        return np.mean([np.isin(gt[i], top2[i]).mean() for i in range(NQ)])

    xhat = cent_rep[slot_of_row] + (
        codes_flat[slot_of_row] * scale_rep[slot_of_row][:, None]
    )
    x64 = x.astype(np.float64)

    def exact_rr(pool):
        return _rr(pool, x64)

    def xhat_rr(pool):
        return _rr(pool, xhat)

    for p in (4, 8, 16, 24):
        cont = np.mean([
            np.mean([
                bool(set(row_clusters[r_]) & set(probe_order[i, :p]))
                for r_ in gt[i]
            ])
            for i in range(NQ)
        ])
        kk = max(8, min(16, -(-2 * EF // p)))
        sd, srows = ivf_ops.ivf_scan(qd, table, n_probe=p, kk=kk)
        cd, crows = beam_ops._dedup_topk(sd, srows, EF)
        pool = np.asarray(jnp.where(jnp.isfinite(cd), crows, -1))
        pool_cov = np.mean([np.isin(gt[i], pool[i]).mean() for i in range(NQ)])
        top = pool[:, :K]
        rec = np.mean([np.isin(gt[i], top[i]).mean() for i in range(NQ)])
        rec_rr = exact_rr(pool)
        rec_xh = xhat_rr(pool)

        # +1 refinement step (coded beam), coded rescore, then exact rerank
        _, pool2 = beam_ops.beam_search_coded(
            qd, table, graph_dev, jnp.asarray(pool), qcen,
            ef=EF, k=EF, beam_width=4, max_steps=1,
        )
        pool2 = np.asarray(pool2)
        ref_cov = np.mean([np.isin(gt[i], pool2[i]).mean() for i in range(NQ)])
        rec_ref_rr = exact_rr(pool2)
        log(
            f"p={p:3d} containment={cont:.4f} pool_cov={pool_cov:.4f} "
            f"recall={rec:.4f} recall_xhat_rr={rec_xh:.4f} "
            f"recall_rr={rec_rr:.4f} | refine: "
            f"pool_cov={ref_cov:.4f} recall_rr={rec_ref_rr:.4f}"
        )


if __name__ == "__main__":
    main()
