"""Benchmark: QPS/chip at recall@10 >= 0.95 over a 1M x 128d corpus.

Measures BOTH engine paths on real hardware and reports the better one as the
headline (both in extras):
  - flat exact scan: one bf16 matmul sweep + TPU-native approx top-k
    (exact distances, ~0.99-recall selection) — the TPU-first surprise is that
    this already clears 100k QPS/chip at N=1M,
  - Vamana beam search + exact rerank (the >HBM-scale path).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

vs_baseline compares against the reference's best committed unfiltered search
throughput (10,759 QPS on its 10k x 128d fixture, benchmark_test/baseline.txt:33
— see BASELINE.md; the reference commits no 1M number, so this is the most
favorable-to-the-reference comparison available; our corpus is 100x larger).

Env knobs: BENCH_N (default 1_000_000), BENCH_D (128), BENCH_BATCH (4096),
BENCH_MODE (auto|flat|vamana).
"""

import functools
import json
import os
import sys
import time

import numpy as np

BASELINE_QPS = 10_759.0
K = 10
N_QUERIES = 1024


def log(msg):
    print(msg, file=sys.stderr, flush=True)


@functools.lru_cache(maxsize=1)
def _rerank_coded_jit():
    """f32 rescore of the DECODED pool (mirrors VamanaSegment.rerank coded)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _rrq(q, rows, codes, scale, xnorm2, slot_of_row, cents):
        k_pad, s, d = codes.shape
        b, c = rows.shape
        safe = jnp.maximum(rows, 0)
        slot = jnp.take(slot_of_row, safe)
        cl = slot // s
        cv = jnp.take(
            codes.reshape(-1, d), slot.reshape(-1), axis=0
        ).reshape(b, c, d).astype(jnp.float32)
        sc = jnp.take(scale, cl)
        xhat = (
            jnp.take(cents, cl.reshape(-1), axis=0).reshape(b, c, d)
            + cv * sc[:, :, None]
        )
        qf = q.astype(jnp.float32)
        prod = jnp.einsum(
            "bcd,bd->bc", xhat, qf, precision=jax.lax.Precision.HIGHEST
        )
        dd = (
            jnp.sum(qf * qf, -1, keepdims=True)
            + jnp.take(xnorm2.reshape(-1), slot)
            - 2.0 * prod
        )
        return jnp.where(rows >= 0, jnp.maximum(dd, 0.0), jnp.inf)

    return _rrq


@functools.lru_cache(maxsize=1)
def _rerank_jit():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _rr(q, rows, xd, rnorm2):
        safe = jnp.maximum(rows, 0)
        v = jnp.take(xd, safe, axis=0)
        prod = jnp.einsum("bcd,bd->bc", v, q, precision=jax.lax.Precision.HIGHEST)
        qn = jnp.sum(q * q, axis=-1, keepdims=True)
        dd = qn + jnp.take(rnorm2, safe) - 2.0 * prod
        return jnp.where(rows >= 0, dd, jnp.inf)

    return _rr


def _timed(fn, reps=10):
    import jax

    jax.block_until_ready(fn())  # warm
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    n = int(os.environ.get("BENCH_N", 1_000_000))
    d = int(os.environ.get("BENCH_D", 128))
    mode = os.environ.get("BENCH_MODE", "auto")
    batch = int(os.environ.get("BENCH_BATCH", 4096))

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # Honor an explicit platform pin even when the axon plugin's backend
        # discovery would otherwise initialize (and sometimes hang on) the
        # tunnel — same containment as tests/conftest.py.
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
    import jax.numpy as jnp

    from vecgo_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from vecgo_tpu.model import Metric
    from vecgo_tpu.ops import topk as T

    t_process = time.perf_counter()
    rng = np.random.default_rng(42)
    extras = {"n": n, "d": d, "mode": mode, "batch": batch,
              "device": str(jax.devices()[0])}

    log(f"generating {n}x{d} clustered corpus...")
    n_clusters = 1024
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    assign = rng.integers(0, n_clusters, size=n)
    x = centers[assign] + 0.35 * rng.standard_normal((n, d)).astype(np.float32)
    q_all = centers[rng.integers(0, n_clusters, size=N_QUERIES)] + 0.35 * (
        rng.standard_normal((N_QUERIES, d)).astype(np.float32)
    )

    # ---------------- engine ingest (deferred-style bulk) ----------------
    # Reference: BatchInsertDeferred ~2M vec/s (doc.go:33-35). Host-only path
    # (one memtable slab write + one PK block per batch), measured BEFORE the
    # device-heavy phases: this environment slows host loops in processes
    # that have run large device programs (docs/PERF.md).
    try:
        from vecgo_tpu.blobstore import MemoryStore
        from vecgo_tpu.engine import Engine, EngineOptions

        eng = Engine.open(
            MemoryStore(), EngineOptions(dim=d, flush_threshold=2**62), create=True
        )
        t0 = time.perf_counter()
        eng.insert_batch(x)
        dt = time.perf_counter() - t0
        del eng
        extras["ingest_vps"] = round(n / dt, 1)
        extras["ingest_vs_go_deferred"] = round(n / dt / 2_064_326.0, 2)
    except Exception as e:  # noqa: BLE001
        log(f"ingest phase failed: {e!r}")
        extras["ingest_error"] = repr(e)



    xd = jnp.asarray(x)
    rnorm2 = jnp.sum(xd.astype(jnp.float32) ** 2, axis=1)
    qd = jnp.asarray(q_all)
    q_bench = np.tile(q_all, (max(1, batch // N_QUERIES), 1))[:batch]
    qb = jnp.asarray(q_bench)

    log("computing exact ground truth...")
    gt_d, gt_i = T.blockwise_topk_search(
        qd, xd, K, metric=Metric.L2, x_norms_sq=rnorm2, block_rows=131072,
        exact=True,
    )
    gt_i = np.asarray(gt_i)
    log("ground truth done")

    def recall(ids):
        hits = sum(
            len(set(map(int, ids[b])) & set(map(int, gt_i[b])))
            for b in range(N_QUERIES)
        )
        return hits / (N_QUERIES * K)

    results = {}  # name -> (qps, recall)

    # ---------------- flat exact scan (bf16 fast + f32-HIGH near-exact) ----
    if mode in ("auto", "flat"):
        log("flat exact scan...")
        xb16 = jnp.asarray(x, jnp.bfloat16)

        def flat16(queries):
            return T.blockwise_topk_search(
                queries, xb16, K, metric=Metric.L2, x_norms_sq=rnorm2,
                block_rows=min(131072, n), compute_dtype=jnp.bfloat16,
            )

        def flat32(queries):
            return T.blockwise_topk_search(
                queries, xd, K, metric=Metric.L2, x_norms_sq=rnorm2,
                block_rows=min(131072, n),
            )

        # bf16 single-pass scan over a (K+8) pool + exact f32-HIGHEST rerank
        # of the pool on device — the engine's FlatSegment.search default
        # (scan_dtype="bf16"): full-precision distances, pool margin absorbs
        # bf16 ranking noise. Near-f32 recall at near-bf16 speed.
        import jax as _jax

        @_jax.jit
        def _rr_exact(queries, rows):
            safe = jnp.maximum(rows, 0)
            v = jnp.take(xd, safe, axis=0)  # [B, C, d] f32
            qf = queries.astype(jnp.float32)
            prod = jnp.einsum(
                "bcd,bd->bc", v, qf, precision=_jax.lax.Precision.HIGHEST
            )
            qn = jnp.sum(qf * qf, axis=-1, keepdims=True)
            dd = qn + jnp.take(rnorm2, safe, axis=0) - 2.0 * prod
            return jnp.where(rows >= 0, jnp.maximum(dd, 0.0), jnp.inf)

        def flat_rr(queries):
            _, rows = T.blockwise_topk_search(
                queries, xb16, K + 8, metric=Metric.L2, x_norms_sq=rnorm2,
                block_rows=min(131072, n), compute_dtype=jnp.bfloat16,
            )
            dd = _rr_exact(queries, rows)
            return T.topk_smallest_with_ids(dd, rows, K)

        for name, fn in (
            ("flat_bf16", flat16), ("flat_rr", flat_rr), ("flat_f32", flat32),
        ):
            _, ids = fn(qd)
            rec = recall(np.asarray(ids))
            dt = _timed(lambda: fn(qb)[1])
            results[name] = (batch / dt, rec)
            extras[f"{name}_qps"] = round(batch / dt, 1)
            extras[f"{name}_recall"] = round(rec, 4)
            extras[f"{name}_ms_per_batch"] = round(dt * 1e3, 1)

    # ---------------- vamana ----------------
    # The graph build takes minutes at 1M; keep it inside a budget and never
    # let a failure/timeout suppress the output line (flat results above
    # already satisfy the headline).
    budget_s = float(os.environ.get("BENCH_BUDGET_S", 1800))
    run_vamana = mode == "vamana" or (
        mode == "auto" and time.perf_counter() - t_process < budget_s
    )
    try:
      if run_vamana:
        from vecgo_tpu.index.build_fast import build_graph_clustered
        from vecgo_tpu.ops import beam as beam_ops

        r = int(os.environ.get("BENCH_R", 32))
        alpha = float(os.environ.get("BENCH_ALPHA", 1.5))
        # The clustered (search-free) build runs the FULL corpus: ~25 s
        # device-resident at 1M x 128d warm (vs ~26 min for the round-1
        # search-based build). Cold adds one-time compiles (cached across
        # processes by the persistent compile cache).
        n_vam = n if mode == "vamana" else min(
            n, int(os.environ.get("BENCH_VAMANA_N", n))
        )
        xv = x[:n_vam]
        extras["vamana_n"] = n_vam
        log(f"building vamana graph (clustered, n={n_vam}, r={r}, alpha={alpha})...")
        # The build runs in-HBM end-to-end: ONE corpus upload outside the
        # timed region (recorded as build_h2d_s — the dev tunnel moves
        # ~12-36 MB/s; production PCIe makes it ~20 ms), then warm-timed
        # builds. This mirrors the reference's in-RAM build benchmark
        # (baseline.txt:90 excludes data loading) — and the engine's own
        # flush path feeds device-resident slabs the same way.
        t0 = time.perf_counter()
        xv_dev = jax.block_until_ready(jnp.asarray(xv, jnp.bfloat16))
        extras["build_h2d_s"] = round(time.perf_counter() - t0, 1)
        # Warm compiles with one full build first so build_vps measures the
        # build, not one-time XLA compilation (the reference's Go benchmark
        # framework likewise excludes warmup; the persistent compile cache
        # makes the warm path the steady state anyway).
        t0 = time.perf_counter()
        build_graph_clustered(
            xv_dev, r=r, alpha=alpha, refine_rounds=0, return_device=True,
            return_membership="device",
        )
        extras["build_cold_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        graph_dev, medoid, bcentroids, bentry, members = build_graph_clustered(
            xv_dev, r=r, alpha=alpha, refine_rounds=0, return_device=True,
            return_membership="device",
        )
        jax.block_until_ready(graph_dev)
        # Force a real sync: on the tunnelled device block_until_ready can
        # return before trailing async work drains — a 1-element D2H cannot.
        _ = np.asarray(graph_dev[:1, :1])
        _ = np.asarray(members[:1, :1])
        t_build = time.perf_counter() - t0
        extras["build_s"] = round(t_build, 1)
        extras["build_vps"] = round(n_vam / t_build, 1)
        # Reference build baseline: HNSW 25,368 vec/s (baseline.txt:90), an
        # in-RAM build; ours is the in-HBM analogue.
        extras["build_vs_go_hnsw"] = round(n_vam / t_build / 25368.0, 2)

        from vecgo_tpu.ops import distance as Dops

        xvd = jnp.asarray(xv)
        rnv = jnp.sum(xvd * xvd, axis=1)
        if n_vam == n:
            gt_v = gt_i
        else:
            _, gt_v = T.blockwise_topk_search(
                qd, xvd, K, metric=Metric.L2, x_norms_sq=rnv,
                block_rows=min(131072, n_vam), exact=True,
            )
            gt_v = np.asarray(gt_v)

        def recall_v(ids):
            hits = sum(
                len(set(map(int, ids[b])) & set(map(int, gt_v[b])))
                for b in range(N_QUERIES)
            )
            return hits / (N_QUERIES * K)

        # ---- two-stage query path: coded-IVF shortlist + graph refine ----
        # (the VamanaSegment.search serving pipeline, index/vamana.py).
        # SERVING MEMORY = SQ8 residual codes + graph only: the table derives
        # from the build's own membership (no second k-means — round-2's
        # ivf_table_s was 92.5 s) and the f32/bf16 full copies never upload.
        from vecgo_tpu.ops import ivf as ivf_ops

        t0 = time.perf_counter()
        table = ivf_ops.device_table_coded(members, xv_dev[:n_vam])
        jax.block_until_ready(table.codes)
        _ = np.asarray(table.codes[:1, :1, :1])
        extras["ivf_table_cold_s"] = round(time.perf_counter() - t0, 1)
        # Warm (steady-state) table build: the first call pays one-time XLA
        # compilation; flush/compaction reuse the cached executable.
        del table
        t0 = time.perf_counter()
        table = ivf_ops.device_table_coded(members, xv_dev[:n_vam])
        jax.block_until_ready(table.codes)
        _ = np.asarray(table.codes[:1, :1, :1])
        extras["ivf_table_s"] = round(time.perf_counter() - t0, 1)
        extras["build_total_s"] = round(t_build + time.perf_counter() - t0, 1)
        extras["build_total_vps"] = round(
            n_vam / (t_build + time.perf_counter() - t0), 1
        )
        kt, st, _ = table.codes.shape
        extras["serve_hbm_bytes_per_row"] = round(
            (kt * st * (d + 12) + n_vam * (4 + 4 * r) + kt * (4 * d + 8))
            / n_vam, 1,
        )

        kt_clusters = int(table.bnorm2.shape[0])

        def vam_run(queries, ef, n_probe, refine, qf=0.0, kk=16):
            # qf: qcap as a multiple of the average probes/cluster for THIS
            # batch size (0 = ivf_scan's auto 3x). Tighter qcaps trade probe
            # drops (rescued by refinement + the ef-pool rerank) for linear
            # scan-cost savings — the round-2 ablation's dominant knob.
            qcap = 0
            if qf:
                b_ = queries.shape[0]
                qcap = max(
                    32,
                    (int(qf * b_ * n_probe / max(kt_clusters, 1)) + 31)
                    // 32 * 32,
                )
            sd, srows = ivf_ops.ivf_scan(
                queries, table, n_probe=n_probe, kk=kk, qcap=qcap
            )
            cd, crows = beam_ops._dedup_topk(sd, srows, ef)
            pool = jnp.where(jnp.isfinite(cd), crows, -1)
            if not refine:
                # No-rescore fast path (mirrors VamanaSegment.search): the
                # scan's bf16-residual distances already rank within SQ8
                # error — measured recall 0.9611 w/o the f32 rescore vs
                # 0.9587 with it at 1M, and the ef-wide code gather was ~25%
                # of query time.
                return cd[:, :K], pool[:, :K]
            qc = jnp.einsum(
                "bd,kd->bk", queries.astype(jnp.float32), table.centroids
            )
            _, pool = beam_ops.beam_search_coded(
                queries, table, graph_dev, pool, qc,
                ef=ef, k=ef, beam_width=4, max_steps=refine,
            )
            rd = _rerank_coded_jit()(
                queries, pool, table.codes, table.scale, table.xnorm2,
                table.slot_of_row, table.centroids,
            )
            sd2, si2 = jax.lax.sort((rd, pool.astype(jnp.int32)), num_keys=1)
            return sd2[:, :K], si2[:, :K]

        chosen = None
        # The serving table's S equals the build's cluster_size (1024): each
        # probe covers 2x the rows of the round-2 S=512 table, so the sweep
        # starts at half the probe counts. qcap=0 means auto (3x the average
        # probes/cluster); explicit tighter qcaps trade drop-rate (rescued by
        # refinement + rerank) for linear scan-cost savings — the round-2
        # ablation's dominant knob.
        # Phase 1: recall-screen configs cheapest-first; collect the passing
        # ones. Phase 2: TIME the first few passers and keep the fastest
        # (cheap-looking configs are not always fastest: tighter qcaps cut
        # the scan linearly, refinement adds a fixed gather cost).
        passing = []
        for ef, n_probe, refine, qf in (
            (48, 4, 0, 1.25), (48, 4, 0, 1.5), (48, 4, 0, 2.0), (48, 4, 0, 0),
            (48, 6, 0, 1.5), (48, 4, 1, 1.5), (48, 6, 0, 0), (48, 8, 0, 1.5),
            (48, 8, 0, 0), (48, 10, 0, 0), (48, 12, 0, 0),
            (48, 16, 0, 0), (48, 16, 1, 0), (96, 24, 1, 0), (96, 32, 2, 0),
        ):
            log(f"vamana config ef={ef} p={n_probe} r={refine} qf={qf}...")
            _, ids = vam_run(qd, ef, n_probe, refine, qf)
            rec = recall_v(np.asarray(ids))
            extras[f"vamana_recall@ef{ef}p{n_probe}r{refine}qf{qf}"] = round(rec, 4)
            if rec >= 0.95:
                passing.append((ef, n_probe, refine, qf, rec))
            if len(passing) >= 3:
                break
        if not passing:
            passing = [(96, 32, 2, 0, rec)]
        best = None
        for ef, n_probe, refine, qf, rec in passing:
            dt = _timed(lambda: vam_run(qb, ef, n_probe, refine, qf)[1], reps=5)
            qps = batch / dt
            log(f"  timed ef={ef} p={n_probe} r={refine} qf={qf}: {qps:.0f} qps")
            extras[f"vamana_qps@ef{ef}p{n_probe}r{refine}qf{qf}"] = round(qps, 1)
            if best is None or qps > best[0]:
                best = (qps, ef, n_probe, refine, qf, rec)
        qps, ef, n_probe, refine, qf, rec = best
        extras["vamana_ef"] = ef
        extras["vamana_nprobe"] = n_probe
        extras["vamana_refine"] = refine
        extras["vamana_qcap_factor"] = qf
        results["vamana"] = (qps, rec)
        extras["vamana_qps"] = round(qps, 1)
        extras["vamana_recall"] = round(rec, 4)
    except Exception as e:  # noqa: BLE001 — never suppress the output line
        log(f"vamana phase failed: {e!r}")
        extras["vamana_error"] = repr(e)

    # ---------------- beyond-HBM streaming scan ----------------
    # Host-resident corpus, bounded device memory: row blocks stream through
    # a running top-k (reference: lazy block reads + RAM->NVMe tier). On this
    # dev tunnel the ~36 MB/s H2D bound dominates; production PCIe (~16 GB/s)
    # makes a full pass ~30 ms.
    try:
        from vecgo_tpu.index.common import sq8_stream_state
        from vecgo_tpu.ops import topk as TT

        enc_host, sfn = sq8_stream_state(x, Metric.L2)  # 1 byte/dim H2D
        qs_small = jnp.asarray(q_all[:256])

        def stream_once():
            return TT.streaming_topk_scored(
                qs_small, enc_host, n, K, sfn,
            )[1]

        ids_s = np.asarray(stream_once())
        rec_s = sum(
            len(set(map(int, ids_s[b])) & set(map(int, gt_i[b]))) for b in range(256)
        ) / (256 * K)
        t0 = time.perf_counter()
        jax.block_until_ready(stream_once())
        dt = time.perf_counter() - t0
        extras["stream_qps"] = round(256 / dt, 1)
        extras["stream_recall"] = round(rec_s, 4)
        extras["stream_pass_s"] = round(dt, 2)
    except Exception as e:  # noqa: BLE001
        log(f"streaming phase failed: {e!r}")
        extras["stream_error"] = repr(e)

    # ---------------- beyond-HBM cluster-cached coded serving ----------------
    # The cloud/cache tier (ops/ivf_cache): the device holds a fixed
    # 256-cluster cache (~1/4 of the table's HBM at 1M) over a host/store-
    # resident coded table. CLUSTERED query traffic — the tier's stated
    # economics (reference: lazy block reads + block cache, segment.go:1151)
    # — warms it; steady state is device-only compute + exact host rerank.
    try:
        from vecgo_tpu.index.common import rerank_host_rows
        from vecgo_tpu.ops.ivf_cache import ClusterCachedTable, MemHostTable

        if "table" not in locals():  # vamana phase skipped (flat mode / budget)
            raise RuntimeError("skipped: no coded table (vamana phase not run)")
        log("cluster-cached serving phase...")
        t0 = time.perf_counter()
        host_tbl = MemHostTable({
            "codes": np.asarray(table.codes),
            "bn": np.asarray(table.bnorm2),
            "scale": np.asarray(table.scale),
            "cent": np.asarray(table.centroids),
            "cnorm2": np.asarray(table.cnorm2),
            "rows": np.asarray(table.rows),
        })
        extras["cached_d2h_s"] = round(time.perf_counter() - t0, 1)
        cc = ClusterCachedTable(host=host_tbl, cache_clusters=256)
        extras["cached_hbm_mb"] = round(cc.device_bytes() / 1e6, 1)
        # Clustered traffic — the tier's stated economics: queries from the
        # corpus distribution restricted to 32 of its natural clusters
        # (directly comparable to the resident vamana numbers, whose q_all
        # spans all 1024 clusters). Do NOT sample membership slots: overlap
        # slots are boundary rows — worst-case probes — and skew recall.
        rngc = np.random.default_rng(7)
        sub = rngc.choice(n_clusters, 32, replace=False)
        qc = (
            centers[np.repeat(sub, 32)]
            + 0.35 * rngc.standard_normal((32 * 32, d)).astype(np.float32)
        )
        qc_dev = jnp.asarray(qc, jnp.float32)
        _, gt_c = T.blockwise_topk_search(
            qc_dev, xvd, K, metric=Metric.L2, x_norms_sq=rnv,
            block_rows=min(131072, n_vam), exact=True,
        )
        gt_c = np.asarray(gt_c)
        rn_host = np.asarray(rnv)

        def cached_once():
            return cc.probe_and_scan(qc_dev, n_probe=4, kk=16)[1]

        t0 = time.perf_counter()
        rows_c = jax.block_until_ready(cached_once())
        extras["cached_cold_s"] = round(time.perf_counter() - t0, 2)
        extras["cached_h2d_mb"] = round(cc.stats["h2d_bytes"] / 1e6, 1)
        rr = np.asarray(rows_c)
        de = np.asarray(
            rerank_host_rows(qc_dev, rr, x[:n_vam], rn_host, Metric.L2)
        )
        # Dedup before the top-K cut: overlap membership returns the same row
        # from several probed clusters (the engine path dedups in
        # _dedup_topk; a duplicate-blind cut here understates recall by ~30pt).
        hits = 0
        for b in range(len(qc)):
            seen = []
            for j in np.argsort(de[b]):
                rrow = int(rr[b, j])
                if rrow >= 0 and rrow not in seen:
                    seen.append(rrow)
                if len(seen) == K:
                    break
            hits += len(set(seen) & set(map(int, gt_c[b])))
        rec_c = hits / (len(qc) * K)
        dt = _timed(cached_once, reps=5)
        extras["cached_qps"] = round(len(qc) / dt, 1)
        extras["cached_recall"] = round(rec_c, 4)
        extras["cached_misses"] = cc.stats["misses"]
        extras["cached_dropped"] = cc.stats["dropped_probes"]
    except Exception as e:  # noqa: BLE001
        log(f"cached phase failed: {e!r}")
        extras["cached_error"] = repr(e)

    # ---------------- headline ----------------
    ok = {k: v for k, v in results.items() if v[1] >= 0.95} or results
    best = max(ok.items(), key=lambda kv: kv[1][0])
    name, (qps, rec) = best
    out = {
        "metric": f"QPS/chip at recall@10>=0.95 ({n}x{d}, best path)",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / BASELINE_QPS, 2),
        "best_path": name,
        "recall@10": round(rec, 4),
        **extras,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
