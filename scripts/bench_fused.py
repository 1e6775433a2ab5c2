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
if os.environ.get("IVF_FROM_BUILD", "1") == "1":
    # The serving path: membership comes from the graph build's own partition
    # (bench.py does the same; build_ivf_table's standalone k-means+assign is
    # the flat-segment path and is much slower).
    from vecgo_tpu.index.build_fast import build_graph_clustered

    _, _, _, _, members = build_graph_clustered(
        xd, r=32, alpha=1.5, refine_rounds=0, return_device=True,
        return_membership=True,
    )
    print(
        f"build membership: {time.perf_counter()-t0:.1f}s K={members.shape[0]}"
        f" S={members.shape[1]}",
        flush=True,
    )
else:
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


for p, kk, qf in ((4, 16, 1.25), (4, 16, 0), (6, 16, 1.5), (8, 16, 0)):
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
sd, sr = ivf_ops.ivf_scan(qd[:256], table, n_probe=4, kk=16)
fd, fr = ivf_ops.ivf_scan_fused(qd[:256], table, n_probe=4, kk=16, group=4)
sset = [set(map(int, r[r >= 0])) for r in np.asarray(sr)]
fset = [set(map(int, r[r >= 0])) for r in np.asarray(fr)]
ov = np.mean([len(a & b) / max(1, len(a)) for a, b in zip(sset, fset)])
print(f"fused-vs-scan row overlap: {ov:.4f}", flush=True)
