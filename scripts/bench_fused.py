"""Microbench: XLA coded IVF scan vs the fused Pallas kernel (real TPU).

Serving-shape comparison at N=1M, S=1024 (the build-derived table): times
`ivf_scan` (lax.scan + lax.top_k, distance tiles round-trip HBM) against
`ivf_scan_fused` (pallas_coded_group_scan, tiles stay in VMEM) across probe
configs, and reports per-config ms/batch + QPS.

Usage: python scripts/bench_fused.py [N] (default 1M). Env: IVF_CAP (1024).
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

from vecgo_tpu.ops import ivf as ivf_ops

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
D = 128
B = int(os.environ.get("IVF_B", 4096))
CAP = int(os.environ.get("IVF_CAP", 1024))

print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
rng = np.random.default_rng(42)
centers = rng.standard_normal((1024, D)).astype(np.float32)
assign = rng.integers(0, 1024, size=N)
x = centers[assign] + 0.35 * rng.standard_normal((N, D)).astype(np.float32)
q = centers[rng.integers(0, 1024, B)] + 0.35 * rng.standard_normal((B, D)).astype(
    np.float32
)

xd = jnp.asarray(x, jnp.bfloat16)
t0 = time.perf_counter()
_mcache = f"/tmp/bench_members_{N}_{D}.npy"
_gcache = f"/tmp/bench_graph_{N}_{D}.npy"
if os.path.exists(_mcache):
    members = np.load(_mcache)
    graph_dev = jnp.asarray(np.load(_gcache)) if os.path.exists(_gcache) else None
    print(f"loaded cached membership {members.shape}", flush=True)
elif os.environ.get("IVF_FROM_BUILD", "1") == "1":
    # The serving path: membership comes from the graph build's own partition
    # (bench.py does the same; build_ivf_table's standalone k-means+assign is
    # the flat-segment path and is much slower).
    from vecgo_tpu.index.build_fast import build_graph_clustered

    graph_dev, _, _, _, members = build_graph_clustered(
        xd, r=32, alpha=1.5, refine_rounds=0, return_device=True,
        return_membership=True,
    )
    print(
        f"build membership: {time.perf_counter()-t0:.1f}s K={members.shape[0]}"
        f" S={members.shape[1]}",
        flush=True,
    )
    np.save(_mcache, np.asarray(members))
    np.save(_gcache, np.asarray(graph_dev))
else:
    graph_dev = None
    cents, members = ivf_ops.build_ivf_table(x, capacity=CAP, overlap=2)
    print(
        f"build_ivf_table: {time.perf_counter()-t0:.1f}s K={cents.shape[0]} S={CAP}",
        flush=True,
    )
t0 = time.perf_counter()
table = ivf_ops.device_table_coded(members, xd)
jax.block_until_ready(table.codes)
print(f"device_table_coded: {time.perf_counter()-t0:.1f}s", flush=True)
qd = jnp.asarray(q)
k_pad, s = table.bnorm2.shape
print(f"k_pad={k_pad} S={s}", flush=True)


def timed(name, fn, reps=5):
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(
        f"{name:44s} {dt*1e3:8.1f} ms  ({B/dt:10,.0f} qps)  [warm {warm:.1f}s]",
        flush=True,
    )
    return dt


_cfgs = ((4, 16, 1.25), (4, 16, 0), (6, 16, 1.5), (8, 16, 0))
if os.environ.get("IVF_SWEEP", "1") == "0":
    _cfgs = ()
for p, kk, qf in _cfgs:
    qcap = 0
    if qf:
        qcap = max(32, (int(qf * B * p / k_pad) + 31) // 32 * 32)
    timed(
        f"ivf_scan      p={p} kk={kk} qcap={qcap or 'auto'}",
        lambda p=p, kk=kk, qcap=qcap: ivf_ops.ivf_scan(
            qd, table, n_probe=p, kk=kk, qcap=qcap
        )[1],
    )
    for group in (1, 4, 8):
        try:
            timed(
                f"ivf_scan_fused p={p} kk={kk} qcap={qcap or 'auto'} g={group}",
                lambda p=p, kk=kk, qcap=qcap, group=group: ivf_ops.ivf_scan_fused(
                    qd, table, n_probe=p, kk=kk, qcap=qcap, group=group
                )[1],
            )
        except Exception as e:  # noqa: BLE001
            print(f"  fused g={group} FAILED: {type(e).__name__}: {e}", flush=True)

# agreement check (small batch)
sd, sr = ivf_ops.ivf_scan(qd[:256], table, n_probe=4, kk=16, fused=False)
fd, fr = ivf_ops.ivf_scan_fused(qd[:256], table, n_probe=4, kk=16, group=4)
sset = [set(map(int, r[r >= 0])) for r in np.asarray(sr)]
fset = [set(map(int, r[r >= 0])) for r in np.asarray(fr)]
ov = np.mean([len(a & b) / max(1, len(a)) for a, b in zip(sset, fset)])
print(f"fused-vs-scan row overlap: {ov:.4f}", flush=True)

# ---------------- full serving pipeline (scan + dedup + refine + rescore) ----
if os.environ.get("IVF_FULL", "1") == "1":
    import functools

    from vecgo_tpu.model import Metric
    from vecgo_tpu.ops import beam as beam_ops
    from vecgo_tpu.ops import topk as T

    K_AT = 10
    NQ_GT = 1024
    print("computing exact ground truth...", flush=True)
    rn = jnp.asarray(np.einsum("nd,nd->n", x, x, dtype=np.float64).astype(np.float32))
    _, gt_i = T.blockwise_topk_search(
        qd[:NQ_GT], jnp.asarray(x), K_AT, metric=Metric.L2, x_norms_sq=rn,
        block_rows=131072, exact=True,
    )
    gt_i = np.asarray(gt_i)

    @jax.jit
    def _rrq(q, rows, codes, scale, xnorm2, slot_of_row, cents):
        k_pad_, s_, d_ = codes.shape
        b_, c_ = rows.shape
        safe = jnp.maximum(rows, 0)
        slot = jnp.take(slot_of_row, safe)
        cl = slot // s_
        cv = jnp.take(codes.reshape(-1, d_), slot.reshape(-1), axis=0).reshape(
            b_, c_, d_
        ).astype(jnp.float32)
        sc = jnp.take(scale, cl)
        xhat = jnp.take(cents, cl.reshape(-1), axis=0).reshape(b_, c_, d_) + cv * sc[:, :, None]
        qf = q.astype(jnp.float32)
        prod = jnp.einsum("bcd,bd->bc", xhat, qf, precision=jax.lax.Precision.HIGHEST)
        dd = jnp.sum(qf * qf, -1, keepdims=True) + jnp.take(xnorm2.reshape(-1), slot) - 2.0 * prod
        return jnp.where(rows >= 0, jnp.maximum(dd, 0.0), jnp.inf)

    def full_run(queries, ef, n_probe, refine, qcap, rescore=True):
        sd, srows = ivf_ops.ivf_scan(
            queries, table, n_probe=n_probe, kk=16, qcap=qcap
        )
        cd, crows = beam_ops._dedup_topk(sd, srows, ef)
        pool = jnp.where(jnp.isfinite(cd), crows, -1)
        if refine:
            qc = jnp.einsum("bd,kd->bk", queries.astype(jnp.float32), table.centroids)
            _, pool = beam_ops.beam_search_coded(
                queries, table, graph_dev, pool, qc, ef=ef, k=ef,
                beam_width=4, max_steps=refine,
            )
        if not rescore:
            return cd[:, :K_AT], pool[:, :K_AT]
        rd = _rrq(queries, pool, table.codes, table.scale, table.xnorm2,
                  table.slot_of_row, table.centroids)
        sd2, si2 = jax.lax.sort((rd, pool.astype(jnp.int32)), num_keys=1)
        return sd2[:, :K_AT], si2[:, :K_AT]

    # Stage decomposition at the headline config (where do the ms go?).
    def stage_scan():
        return ivf_ops.ivf_scan(qd, table, n_probe=6, kk=16, qcap=32)[1]

    def stage_dedup():
        sd, srows = ivf_ops.ivf_scan(qd, table, n_probe=6, kk=16, qcap=32)
        return beam_ops._dedup_topk(sd, srows, 48)[1]

    timed("stage scan            p=6 qcap=32", stage_scan)
    timed("stage scan+dedup      p=6 qcap=32", stage_dedup)
    timed(
        "stage scan+dedup+rrq  p=6 qcap=32",
        lambda: full_run(qd, 48, 6, 0, 32)[1],
    )
    timed(
        "stage no-rescore      p=6 qcap=32",
        lambda: full_run(qd, 48, 6, 0, 32, rescore=False)[1],
    )
    _, ids_nr = full_run(qd[:NQ_GT], 48, 6, 0, 32, rescore=False)
    ids_nr = np.asarray(ids_nr)
    rec_nr = sum(
        len(set(map(int, ids_nr[b])) & set(map(int, gt_i[b])))
        for b in range(NQ_GT)
    ) / (NQ_GT * K_AT)
    print(f"no-rescore recall p=6 qcap=32: {rec_nr:.4f}", flush=True)

    for ef, p, refine, qf in (
        (48, 4, 0, 1.25), (48, 4, 0, 3.0), (48, 6, 0, 1.5), (48, 4, 1, 1.25),
        (48, 8, 0, 3.0), (64, 8, 1, 3.0),
    ):
        if refine and graph_dev is None:
            continue
        qcap = max(32, (int(qf * B * p / k_pad) + 31) // 32 * 32)
        _, ids = full_run(qd[:NQ_GT], ef, p, refine, qcap)
        ids = np.asarray(ids)
        rec = sum(
            len(set(map(int, ids[b])) & set(map(int, gt_i[b])))
            for b in range(NQ_GT)
        ) / (NQ_GT * K_AT)
        dt = timed(
            f"full ef={ef} p={p} r={refine} qcap={qcap} rec={rec:.4f}",
            lambda ef=ef, p=p, refine=refine, qcap=qcap: full_run(
                qd, ef, p, refine, qcap
            )[1],
        )
