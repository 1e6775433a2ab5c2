"""Stage-by-stage profiler for the clustered Vamana build (build_fast.py).

Replays build_graph_clustered's exact stage sequence with block_until_ready
between stages, printing wall time per stage (warm — run twice, report 2nd).

Usage: python scripts/profile_build.py [N] [D] [R]
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
D = int(sys.argv[2]) if len(sys.argv) > 2 else 128
R = int(sys.argv[3]) if len(sys.argv) > 3 else 32
ALPHA = 1.5
SEED = 42

import jax
import jax.numpy as jnp
import ml_dtypes

from vecgo_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

from vecgo_tpu.index import build_fast as bf
from vecgo_tpu.utils.devbug import call_compiled
from vecgo_tpu.quantization import kmeans as km


def gen_corpus(n, d, seed=42):
    rng = np.random.default_rng(seed)
    n_clusters = 1024
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    assign = rng.integers(0, n_clusters, size=n)
    return centers[assign] + 0.35 * rng.standard_normal((n, d)).astype(np.float32)


def main():
    print(f"profiling clustered build: n={N} d={D} r={R}", file=sys.stderr)
    x = gen_corpus(N, D)

    for run in range(2):
        t_all = time.perf_counter()
        times = {}

        def tick(name, t0, *arrs):
            for a in arrs:
                jax.block_until_ready(a)
            dt = time.perf_counter() - t0
            times[name] = times.get(name, 0.0) + dt
            return time.perf_counter()

        # ---- mirror build_graph_clustered(x, r=R, alpha=1.5, refine_rounds=0) ----
        n, d = x.shape
        rng = np.random.default_rng(SEED)
        knn = max(R, 24)
        rev_cap = R
        overlap = 2
        prune_block = 8192
        cluster_size = 1024
        kmeans_iters = 5
        refine_rounds = 0
        n_rand = 8
        restarts = 1
        hop2 = 64

        t0 = time.perf_counter()
        n_full = bf._bucket_rows(n, prune_block)
        xb = x.astype(ml_dtypes.bfloat16)
        if n_full > n:
            xb = np.concatenate([xb, np.zeros((n_full - n, d), ml_dtypes.bfloat16)])
        rn_host = np.full(n_full, np.inf, np.float32)
        rn_host[:n] = np.einsum("nd,nd->n", x, x, dtype=np.float64).astype(np.float32)
        t0 = tick("host_prep(bf16+norms)", t0)

        x16 = jnp.asarray(xb)
        rnorm2 = jnp.asarray(rn_host)
        mean16 = jnp.asarray(x.mean(0, dtype=np.float64).astype(ml_dtypes.bfloat16))
        medoid_dev = jnp.argmin(rnorm2 - 2.0 * (x16 @ mean16).astype(jnp.float32))
        t0 = tick("upload+medoid", t0, x16, rnorm2, medoid_dev)

        pdim = min(bf.OCC_DIM, d)
        projs = [
            jnp.asarray(
                (rng.standard_normal((d, pdim)) / math.sqrt(pdim)).astype(
                    ml_dtypes.bfloat16
                )
            )
        ]
        x_occ = (x16 @ projs[0]).astype(jnp.float32)
        rn_occ = jnp.sum(x_occ * x_occ, axis=1)
        t0 = tick("jl_project", t0, x_occ, rn_occ)

        block = min(prune_block, n_full)
        pad_n = n_full

        def _padded(tbl, fill=-1):
            if tbl.shape[0] < pad_n:
                tbl = jnp.concatenate(
                    [tbl, jnp.full((pad_n - tbl.shape[0], tbl.shape[1]), fill, tbl.dtype)]
                )
            return tbl

        z, zn = x_occ, rn_occ
        cmax = min(cluster_size, n)
        g_batch = max(1, min(64, 65536 // cmax))
        ov_t = overlap
        k_clusters = max(2, math.ceil(n * ov_t * 1.4 / cmax))
        n_sample = min(n, max(32768, 12 * k_clusters))
        idx = rng.choice(n, n_sample, replace=False)
        z_sample = np.asarray(z[jnp.asarray(idx)])
        t0 = tick("kmeans_sample_D2H", t0)
        centers, _ = km.train_kmeans(
            z_sample, k_clusters, iters=kmeans_iters, seed=SEED, sample=n_sample
        )
        t0 = tick("kmeans_train", t0, centers if hasattr(centers, "block_until_ready") else jnp.zeros(1))

        a_dev, d_dev = call_compiled(bf._assign_topk,
            _padded(z, 0.0), _padded(zn[:, None], 0.0)[:, 0],
            jnp.asarray(centers), ov_t, block,
        )
        t0 = tick("assign_topk", t0, a_dev, d_dev)

        k_pad = ((k_clusters + g_batch - 1) // g_batch) * g_batch
        row_valid = jax.lax.broadcasted_iota(jnp.int32, (pad_n, 1), 0) < n
        a_dev = jnp.where(row_valid, a_dev, k_pad)
        members, mem_slot, enodes_t, covered = call_compiled(bf._membership_dev,
            a_dev, d_dev, k_pad + 1, cmax
        )
        members, mem_slot = members[:k_pad], mem_slot[:k_pad]
        t0 = tick("membership", t0, members, mem_slot)

        knn_eff = min(knn, min(cmax, n) - 1)
        cand_t = call_compiled(bf._cluster_knn,
            x16, rnorm2, members, mem_slot, knn_eff, ov_t, pad_n, g_batch
        )
        cand = cand_t[:pad_n].reshape(pad_n, ov_t * knn_eff)
        t0 = tick("cluster_knn", t0, cand)

        kw = max(2 * R, 48)
        hop_a, hop_b = min(16, kw), max(1, hop2 // 16)
        w_d, w_i = call_compiled(bf._descend,
            _padded(cand), x16, rnorm2, refine_rounds, kw, block, hop_a, hop_b, rev_cap
        )
        t0 = tick("descend(initial merge)", t0, w_d, w_i)

        cand_final = w_i
        randc = _padded(jnp.asarray(
            rng.integers(0, n, size=(n, n_rand), dtype=np.int64).astype(np.int32)
        ))
        cand_final = jnp.concatenate([cand_final, randc], axis=1)
        t0 = tick("rand_cand_host", t0, cand_final)

        graph = call_compiled(bf._prune_all,cand_final, x16, rnorm2, x_occ, rn_occ, R, ALPHA, block)
        t0 = tick("prune_all", t0, graph)

        graph = call_compiled(bf._prune_with_reverse,
            graph, x16, rnorm2, x_occ, rn_occ, R, ALPHA, block, rev_cap
        )
        t0 = tick("prune_reverse", t0, graph)

        total = time.perf_counter() - t_all
        tag = "WARM" if run else "cold"
        print(f"--- {tag} total {total:.2f}s  ({N/total:,.0f} vps) ---")
        for k_, v in sorted(times.items(), key=lambda kv: -kv[1]):
            print(f"  {k_:28s} {v*1e3:9.1f} ms  ({100*v/total:4.1f}%)")


if __name__ == "__main__":
    main()
