"""Build-throughput ablation: cold+warm 1M build + serving-recall screen.

Runs build_graph_clustered twice (cold = compiles, warm = steady state),
derives the coded serving table from the build membership, and screens
recall@10 at the headline serving config (ef=48, p=4, no-rescore) plus a
refine=1 config (graph-quality signal). Knobs come from the environment so
each variant runs in a fresh process (they change traced shapes):

  BUILD_PRUNE_OCC_DIM=0   share the 32-dim partition projection (pre-ablation)
  BUILD_ONE_PASS=0        two-pass prune + reverse re-prune (pre-ablation)
  BUILD_PROFILE=1         per-stage device-synced timings

Measured 2026-08-17 (1M×128d, warm, single v5e): baseline 15.3 s; occ16
12.9 s; one-pass 12.1 s; both (now the DEFAULTS) 11.3 s = 88.7k rows/s —
recall 0.9589/0.9594/0.9549 on the three screens, identical to baseline.

Usage: python scripts/bench_build_exp.py [N]  (default 1M)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from vecgo_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

from vecgo_tpu.index.build_fast import build_graph_clustered
from vecgo_tpu.model import Metric
from vecgo_tpu.ops import beam as beam_ops
from vecgo_tpu.ops import ivf as ivf_ops
from vecgo_tpu.ops import topk as T

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
D = 128
B = 4096
NQ = 1024
K_AT = 10

print(
    f"variant: occ_p={os.environ.get('BUILD_PRUNE_OCC_DIM', '-')}"
    f" one_pass={os.environ.get('BUILD_ONE_PASS', '-')}",
    flush=True,
)
rng = np.random.default_rng(42)
centers = rng.standard_normal((1024, D)).astype(np.float32)
assign = rng.integers(0, 1024, size=N)
x = centers[assign] + 0.35 * rng.standard_normal((N, D)).astype(np.float32)
q = centers[rng.integers(0, 1024, NQ)] + 0.35 * rng.standard_normal(
    (NQ, D)
).astype(np.float32)
xd = jax.block_until_ready(jnp.asarray(x, jnp.bfloat16))
qd = jnp.asarray(q)

# Cache key covers every corpus/GT parameter (seed 42, 1024 centers, 0.35
# noise, NQ queries, K_AT) — editing the generator invalidates the cache.
_gt_cache = f"/tmp/bench_gt_{N}_{D}_s42_c1024_n035_q{NQ}_k{K_AT}.npy"
if os.path.exists(_gt_cache):
    gt_i = np.load(_gt_cache)
else:
    rn = jnp.asarray(
        np.einsum("nd,nd->n", x, x, dtype=np.float64).astype(np.float32)
    )
    _, gt_i = T.blockwise_topk_search(
        qd, jnp.asarray(x), K_AT, metric=Metric.L2, x_norms_sq=rn,
        block_rows=131072, exact=True,
    )
    gt_i = np.asarray(gt_i)
    np.save(_gt_cache, gt_i)
print("ground truth ready", flush=True)


_KNN = int(os.environ.get("EXP_KNN", "0"))
_NRAND = int(os.environ.get("EXP_NRAND", "8"))
_REVCAP = int(os.environ.get("EXP_REVCAP", "0"))


def one_build():
    t0 = time.perf_counter()
    g, medoid, bc, be, members = build_graph_clustered(
        xd, r=32, alpha=1.5, refine_rounds=0, return_device=True,
        return_membership=True, knn=_KNN, n_rand=_NRAND, rev_cap=_REVCAP,
    )
    jax.block_until_ready(g)
    return time.perf_counter() - t0, g, members


cold_s, graph_dev, members = one_build()
print(f"build cold: {cold_s:.1f}s", flush=True)
try:
    warm_s, graph_dev, members = one_build()
    print(f"build warm: {warm_s:.1f}s ({N/warm_s:,.0f} vps)", flush=True)
except Exception as e:  # noqa: BLE001 — dispatch-bug flake: cold is the bound
    print(f"warm build failed ({type(e).__name__}); cold is the bound", flush=True)
    warm_s = cold_s

t0 = time.perf_counter()
table = ivf_ops.device_table_coded(members, xd)
jax.block_until_ready(table.codes)
print(f"table: {time.perf_counter()-t0:.1f}s", flush=True)
k_pad = table.bnorm2.shape[0]


def recall_at(ef, p, refine, qf):
    qcap = max(32, (int(qf * NQ * p / k_pad) + 31) // 32 * 32) if qf else 0
    sd, srows = ivf_ops.ivf_scan(qd, table, n_probe=p, kk=16, qcap=qcap)
    cd, crows = beam_ops._dedup_topk(sd, srows, ef)
    pool = jnp.where(jnp.isfinite(cd), crows, -1)
    if refine:
        qc = jnp.einsum("bd,kd->bk", qd.astype(jnp.float32), table.centroids)
        _, pool = beam_ops.beam_search_coded(
            qd, table, graph_dev, pool, qc, ef=ef, k=ef, beam_width=4,
            max_steps=refine,
        )
    ids = np.asarray(pool[:, :K_AT])
    return sum(
        len(set(map(int, ids[b])) & set(map(int, gt_i[b]))) for b in range(NQ)
    ) / (NQ * K_AT)


for ef, p, refine, qf in ((48, 4, 0, 1.5), (48, 6, 0, 1.5), (48, 4, 1, 0)):
    rec = recall_at(ef, p, refine, qf)
    print(f"recall ef={ef} p={p} r={refine} qf={qf}: {rec:.4f}", flush=True)
print(
    f"SUMMARY warm_build_s={warm_s:.1f} vps={N/warm_s:,.0f}", flush=True
)
