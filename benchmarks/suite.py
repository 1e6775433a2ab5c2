"""Engine-level benchmark suite — the analogue of the reference's
benchmark_test 5-distribution methodology (benchmark_test/README.md,
baseline.txt): per-distribution filtered/unfiltered QPS + recall through the
full engine (planner, masks, MVCC, materialization), not just raw kernels.

Usage:  python benchmarks/suite.py [--n 100000] [--d 128] [--batch 512]
Prints a JSON line per config plus a summary table to stderr.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_distribution(kind: str, n: int, d: int, rng):
    """The reference's five fixture families (benchmark_test/README.md)."""
    if kind == "uniform":
        x = rng.random((n, d), dtype=np.float32)
        cats = rng.integers(0, 100, n)  # uniform categories
    elif kind == "clustered":
        centers = rng.standard_normal((64, d)).astype(np.float32)
        a = rng.integers(0, 64, n)
        x = centers[a] + 0.1 * rng.standard_normal((n, d)).astype(np.float32)
        cats = a  # cluster-correlated categories
    elif kind == "zipf":
        x = rng.standard_normal((n, d)).astype(np.float32)
        cats = np.minimum(rng.zipf(1.5, n) - 1, 99)
    elif kind == "correlated":
        # category correlates with vector position (segment-local skew analogue)
        x = rng.standard_normal((n, d)).astype(np.float32)
        x[:, 0] += np.arange(n) / n * 10
        cats = (np.arange(n) * 100 // n).astype(np.int64)
    elif kind == "adversarial":
        # boolean-adversarial: filter matches are far from query neighborhoods
        x = rng.standard_normal((n, d)).astype(np.float32)
        cats = (x[:, 0] > 0).astype(np.int64)  # filter anti-correlated w/ dist
    else:
        raise ValueError(kind)
    return x, cats


def run_config(kind, n, d, batch, k, selectivity, engine_opts, compact=False,
               compact_subprocess=False):
    import vecgo_tpu as vecgo
    from vecgo_tpu import metadata as md
    from vecgo_tpu.utils import testutil as tu

    rng = np.random.default_rng(42)
    x, cats = make_distribution(kind, n, d, rng)
    tmp = None
    if compact and compact_subprocess:
        # Writer/reader separation (reference: vecgo.go:151-179): the graph
        # build runs in a SEPARATE writer process over a shared Local store,
        # and this (serving) process reopens the new manifest version. On
        # TPU this is also the clean containment for the jax executable-
        # reuse bug — the build's programs never touch the serving runtime
        # (vecgo_tpu/tools/compact.py).
        import tempfile

        tmp = tempfile.mkdtemp(prefix="vecgo_suite_")
        backend = vecgo.Local(tmp)
    else:
        backend = vecgo.Memory()
    db = vecgo.Open(backend, vecgo.Create(dim=d, **engine_opts))
    log(f"  [{kind}] ingesting {n} rows...")
    ids = db.insert_batch(x, metadatas=[{"cat": int(c)} for c in cats])
    log(f"  [{kind}] committing (flush -> segment)...")
    db.commit()
    if compact and compact_subprocess:
        import subprocess
        import sys as _sys

        log(f"  [{kind}] compacting in a writer subprocess (graph build)...")
        db.close()
        t0 = time.perf_counter()
        r = subprocess.run(
            [_sys.executable, "-m", "vecgo_tpu.tools.compact", tmp, "--all"],
            capture_output=True, text=True, timeout=3600,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        if r.returncode != 0:
            raise RuntimeError(f"compact worker failed: {r.stderr[-2000:]}")
        out_extra = {"compact_s": round(time.perf_counter() - t0, 1),
                     "compact_worker": json.loads(r.stdout.strip().splitlines()[-1])}
        log(f"  [{kind}] reopening after writer compaction...")
        db = vecgo.Open(backend)  # existing db: config comes from the manifest
    elif compact:
        # Graphs come from compaction (reference: flat on flush, DiskANN at
        # merge) — compact so the suite measures GRAPH-segment serving.
        log(f"  [{kind}] compacting (graph build)...")
        t0 = time.perf_counter()
        db.compact([h.seg_id for h in db.engine._segments])
        out_extra = {"compact_s": round(time.perf_counter() - t0, 1)}
    else:
        out_extra = {}
    log(f"  [{kind}] searching...")

    q = x[rng.integers(0, n, batch)] + 0.05 * rng.standard_normal(
        (batch, d)
    ).astype(np.float32)

    out = {"dist": kind, "n": n, "d": d, "batch": batch, **out_extra}
    if compact:
        out["segment"] = type(db.engine._segments[0].segment).__name__
    # unfiltered
    t0 = time.perf_counter()
    res = db.search_batch(q, k=k)
    dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = db.search_batch(q, k=k)
    dt = time.perf_counter() - t0  # warm run
    out["qps"] = round(batch / dt, 1)

    log(f"  [{kind}] pipelined bulk...")
    # Pipelined bulk throughput (search_arrays: CHUNK_B-query device programs
    # dispatched back-to-back, one stacked drain — the serving path; the
    # reference's analogue is concurrent search, baseline.txt:55).
    import jax.numpy as jnp

    nq_bulk = max(4096, batch)
    q_bulk = np.tile(q, (max(1, nq_bulk // batch), 1))[:nq_bulk]
    qb_dev = jnp.asarray(q_bulk)  # device-resident queries (upload once)
    db.search_arrays(qb_dev, k=k)  # warm/compile
    t0 = time.perf_counter()
    db.search_arrays(qb_dev, k=k)
    out["pipelined_qps"] = round(nq_bulk / (time.perf_counter() - t0), 1)
    # Fast graph profile: no refine round, no f32 pool rescore (the bench's
    # measured serving config — recall ~0.96 at 1M vs ~1.0 exact).
    fast_kw = dict(
        graph_refine=0, graph_rescore=False, nprobes=6, graph_qcap_factor=1.5
    )
    db.search_arrays(qb_dev, k=k, **fast_kw)  # warm
    t0 = time.perf_counter()
    ids_fast, _ = db.search_arrays(qb_dev, k=k, **fast_kw)
    out["pipelined_fast_qps"] = round(nq_bulk / (time.perf_counter() - t0), 1)

    # Streaming serving throughput: B=1024 batches, `depth` in flight
    # (search_arrays_stream) — the sustained-QPS shape where the per-call
    # round trip is hidden under the next batch's compute.
    sb = 1024
    n_stream = max(8, (2 * nq_bulk) // sb)
    stream_batches = [
        jnp.asarray(q_bulk[(i * sb) % nq_bulk :][:sb]) for i in range(n_stream)
    ]
    stream_batches = [b_ for b_ in stream_batches if b_.shape[0] == sb]
    for _ in db.search_arrays_stream(stream_batches[:2], k=k):
        pass  # warm
    t0 = time.perf_counter()
    got_n = sum(
        ids_.shape[0] for ids_, _ in db.search_arrays_stream(stream_batches, k=k)
    )
    out["stream_qps_b1024"] = round(got_n / (time.perf_counter() - t0), 1)

    # recall vs host brute force on a query subsample
    sub = min(64, batch)
    _, ti = tu.brute_force_knn(q[:sub], x, k, "l2")
    got = np.asarray([[c.id for c in r] + [-1] * (k - len(r)) for r in res[:sub]])
    want = np.asarray([[ids[j] for j in row] for row in ti])
    out["recall"] = round(tu.recall_at_k(got, want), 4)
    out["fast_recall"] = round(
        tu.recall_at_k(np.asarray(ids_fast[:sub]), want), 4
    )

    # single-query latency percentiles (reference: baseline.txt:84 P50/P95/P99)
    lat = []
    for i in range(50):
        t0 = time.perf_counter()
        db.search(q[i % batch], k=k)
        lat.append(time.perf_counter() - t0)
    lat = np.sort(lat)
    out["p50_us"] = round(float(lat[len(lat) // 2]) * 1e6, 1)
    out["p95_us"] = round(float(lat[int(len(lat) * 0.95)]) * 1e6, 1)
    out["p99_us"] = round(float(lat[min(int(len(lat) * 0.99), len(lat) - 1)]) * 1e6, 1)

    log(f"  [{kind}] filtered curve...")
    # Filtered recall-vs-selectivity curve (reference holds recall@10 = 1.000
    # from 1% to 50% selectivity, baseline.txt:34-37). Default curve
    # 1% / 10% / 50%; `selectivity` adds a custom point if not on the curve.
    n_cats = len(set(cats.tolist()))
    curve = sorted({0.01, 0.10, 0.50, selectivity})
    for sel in curve:
        want_cats = max(1, int(n_cats * sel))
        f = md.isin("cat", list(range(want_cats)))
        db.search_batch(q, k=k, filter=f)  # warm
        t0 = time.perf_counter()
        res_f = db.search_batch(q, k=k, filter=f)
        tag = f"@{int(sel*100)}pct"
        out[f"filtered_qps{tag}"] = round(batch / (time.perf_counter() - t0), 1)
        eligible = np.flatnonzero(np.isin(cats, np.arange(want_cats)))
        if len(eligible) >= k:
            _, tif = tu.brute_force_knn(q[:sub], x[eligible], k, "l2")
            gotf = np.asarray(
                [[c.id for c in r] + [-1] * (k - len(r)) for r in res_f[:sub]]
            )
            wantf = np.asarray([[ids[eligible[j]] for j in row] for row in tif])
            out[f"filtered_recall{tag}"] = round(tu.recall_at_k(gotf, wantf), 4)
    # Back-compat aliases for the primary selectivity point.
    tag = f"@{int(selectivity*100)}pct"
    out["filtered_qps"] = out.get(f"filtered_qps{tag}")
    out["filtered_recall"] = out.get(f"filtered_recall{tag}")
    db.close()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--selectivity", type=float, default=0.1)
    ap.add_argument(
        "--scan-dtype", default="f32", choices=("f32", "bf16"),
        help="flat scan profile: f32 = exact 3-pass (apples-to-apples with "
        "the reference's committed full-precision recall=1.0 runs; the "
        "adversarially tight 'clustered' fixture has hundreds of near-ties "
        "inside the bf16 pool margin); bf16 = the throughput default",
    )
    ap.add_argument("--quantizer", default="none")
    ap.add_argument(
        "--compact", action="store_true",
        help="compact after commit so serving runs on GRAPH segments",
    )
    ap.add_argument(
        "--compact-subprocess", action="store_true",
        help="run the compaction (graph build) in a separate writer process "
        "over a Local store and reopen — the production topology, and the "
        "TPU containment for the jax executable-reuse bug (implies --compact)",
    )
    ap.add_argument(
        "--dists", default="",
        help="comma-separated subset of distributions (default: all five)",
    )
    args = ap.parse_args()

    try:
        from vecgo_tpu.utils.jaxcache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    opts = {"flat_scan_dtype": args.scan_dtype}
    if args.quantizer != "none":
        opts["quantizer"] = args.quantizer
    rows = []
    kinds = ["uniform", "clustered", "zipf", "correlated", "adversarial"]
    if args.dists:
        kinds = [k for k in kinds if k in args.dists.split(",")]
    for kind in kinds:
        log(f"running {kind}...")
        row = run_config(
            kind, args.n, args.d, args.batch, args.k, args.selectivity, opts,
            compact=args.compact or args.compact_subprocess,
            compact_subprocess=args.compact_subprocess,
        )
        rows.append(row)
        print(json.dumps(row), flush=True)
    log(
        f"{'dist':<12} {'qps':>9} {'pipe_qps':>9} {'strm_qps':>9} "
        f"{'recall':>7} {'f_rec@1':>8} {'f_rec@10':>9} {'f_rec@50':>9}"
    )
    for r in rows:
        log(
            f"{r['dist']:<12} {r['qps']:>9} {r.get('pipelined_qps', '-'):>9} "
            f"{r.get('stream_qps_b1024', '-'):>9} "
            f"{r['recall']:>7} {r.get('filtered_recall@1pct', '-'):>8} "
            f"{r.get('filtered_recall@10pct', '-'):>9} "
            f"{r.get('filtered_recall@50pct', '-'):>9}"
        )


if __name__ == "__main__":
    main()
