"""Micro-bench: coded-IVF scan variants on the real chip.

Times, at BENCH_N x BENCH_D with the build-derived membership:
  - XLA coded scan (ops/ivf.ivf_scan, int8 streams)
  - XLA coded scan with approx top-kk (VECGO_IVF_TOPK=approx re-exec hint)
  - Pallas fused scan (ops/ivf.ivf_scan_fused) — VMEM-resident distance tiles

Usage: python scripts/bench_scan_variants.py  (env: BENCH_N/D/BATCH, VARIANTS)
Prints one JSON line per variant.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(os.environ.get("BENCH_N", 1_000_000))
    d = int(os.environ.get("BENCH_D", 128))
    batch = int(os.environ.get("BENCH_BATCH", 4096))
    variants = os.environ.get("VARIANTS", "xla,fused").split(",")

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
    import jax.numpy as jnp

    from vecgo_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    from vecgo_tpu.index.build_fast import build_graph_clustered
    from vecgo_tpu.ops import beam as beam_ops
    from vecgo_tpu.ops import ivf

    rng = np.random.default_rng(42)
    centers = rng.standard_normal((1024, d)).astype(np.float32)
    x = centers[rng.integers(0, 1024, n)] + 0.35 * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    q = centers[rng.integers(0, 1024, batch)] + 0.35 * rng.standard_normal(
        (batch, d)
    ).astype(np.float32)

    print("uploading + building...", file=sys.stderr, flush=True)
    xv = jax.block_until_ready(jnp.asarray(x, jnp.bfloat16))
    _, _, _, _, members = build_graph_clustered(
        xv, r=32, alpha=1.5, refine_rounds=0, return_device=True,
        return_membership=True,
    )
    table = ivf.device_table_coded(members, xv)
    jax.block_until_ready(table.codes)
    qd = jnp.asarray(q)
    print("table ready", table.codes.shape, file=sys.stderr, flush=True)

    # small recall harness (containment of brute top-10 within the pool)
    nq = 256
    qs = q[:nq]
    d2 = None

    def containment(rows):
        nonlocal d2
        if d2 is None:
            from vecgo_tpu.ops import topk as T
            from vecgo_tpu.model import Metric

            xd = jnp.asarray(x[: min(n, 2_000_000)])
            rn = jnp.sum(xd.astype(jnp.float32) ** 2, axis=1)
            _, gi = T.blockwise_topk_search(
                jnp.asarray(qs), xd, 10, metric=Metric.L2, x_norms_sq=rn,
                block_rows=131072, exact=True,
            )
            d2 = np.asarray(gi)
        rows = np.asarray(rows)[:nq]
        return sum(
            len(set(rows[b][rows[b] >= 0].tolist()) & set(map(int, d2[b])))
            for b in range(nq)
        ) / (nq * 10)

    for name in variants:
        for n_probe in (4, 6, 8):
            try:
                if name == "xla":
                    fn = lambda qq: ivf.ivf_scan(qq, table, n_probe=n_probe, kk=16)  # noqa: E731
                elif name == "fused":
                    fn = lambda qq: ivf.ivf_scan_fused(qq, table, n_probe=n_probe, kk=16, interpret=False)  # noqa: E731
                else:
                    print(json.dumps({"variant": name, "error": "unknown"}))
                    continue
                _, rows = fn(jnp.asarray(qs))
                cont = containment(rows)
                jax.block_until_ready(fn(qd))  # warm full batch
                t0 = time.perf_counter()
                for _ in range(5):
                    out = fn(qd)
                jax.block_until_ready(out)
                dt = (time.perf_counter() - t0) / 5
                # end-to-end with dedup+rescore cut (the serving tail)
                def e2e(qq):
                    sd, srows = fn(qq)
                    return beam_ops._dedup_topk(sd, srows, 48)

                jax.block_until_ready(e2e(qd))
                t0 = time.perf_counter()
                for _ in range(5):
                    out = e2e(qd)
                jax.block_until_ready(out)
                dt2 = (time.perf_counter() - t0) / 5
                print(json.dumps({
                    "variant": name, "n_probe": n_probe,
                    "scan_ms": round(dt * 1e3, 1),
                    "scan_qps": round(batch / dt, 1),
                    "e2e_ms": round(dt2 * 1e3, 1),
                    "e2e_qps": round(batch / dt2, 1),
                    "containment@10": round(cont, 4),
                }), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"variant": name, "n_probe": n_probe,
                                  "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
