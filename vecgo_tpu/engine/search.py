"""Search planner: adaptive filtered fan-out over memtable + segments.

Reference: internal/engine/search.go (strategy selection :286-311, segment
fan-out :740-909, rerank :913-965, materialization :982-1082, LSN visibility
:1092-1105), segment_pruning.go (manifest-stats pruning), cursor_search.go.

TPU-first restructuring:
- Filters compile to exact dense masks per segment (selectivity is exact, not
  estimated) — the 30% cutoff decides graph-vs-brute for *vamana* segments only
  (flat segments are always a masked scan: that IS their search).
- Per-segment device calls dispatch asynchronously (JAX async dispatch replaces
  the goroutine-per-segment fan-out); the host merges [B, k'] results.
- Rerank = exact matmul over gathered candidates.
- Visibility check compares the candidate row's insert LSN against the PK
  chain — immune to flush/compaction remaps.
"""

from __future__ import annotations

import time
from typing import List, Optional

import numpy as np

from vecgo_tpu.index.flat import FlatSegment, bloom_may_contain
from vecgo_tpu.metadata import Op, as_filterset
from vecgo_tpu.model import Candidate, Metric, QueryStats, SearchOptions, SearchResult


def can_prune_segment(stats: dict, fs) -> bool:
    """O(1) manifest-stats pruning (reference: segment_pruning.go:15,
    manifest CanPruneNumeric:234 / CanPruneCategorical:449)."""
    if fs is None or not stats:
        return False
    fields = stats.get("fields", {})
    for flt in fs:
        st = fields.get(flt.field)
        if st is None:
            # Field absent from the whole segment: EQ/IN/GT... match nothing.
            if flt.op != Op.NEQ:
                return True
            continue
        if st["kind"] == "num" and isinstance(flt.value, (int, float)):
            lo, hi = st["min"], st["max"]
            v = float(flt.value)
            if flt.op == Op.EQ and (v < lo or v > hi):
                return True
            if flt.op == Op.GT and hi <= v:
                return True
            if flt.op == Op.GTE and hi < v:
                return True
            if flt.op == Op.LT and lo >= v:
                return True
            if flt.op == Op.LTE and lo > v:
                return True
        elif st["kind"] == "str":
            if flt.op == Op.EQ and st.get("bloom"):
                if not bloom_may_contain(st["bloom"], str(flt.value)):
                    return True
            if flt.op == Op.IN and st.get("bloom"):
                if not any(bloom_may_contain(st["bloom"], str(v)) for v in flt.value):
                    return True
    return False


def search_snapshot(
    snap,
    pk,
    q: np.ndarray,  # [B, d] float32
    opts: SearchOptions,
    options,  # EngineOptions
    device_budget=None,  # resource.DeviceBudget or None (unlimited HBM)
):
    """Execute a (batched) search against a snapshot.

    Returns (ids [B, k] int64 (-1 pad), dists [B, k] f32, locations list of
    per-query [(seg_id, row), ...], stats).
    """
    import jax.numpy as jnp

    from vecgo_tpu.ops.distance import normalize

    t0 = time.perf_counter()
    stats = QueryStats() if opts.with_stats else None
    k = opts.k
    fetch_k = max(k * max(opts.refine_factor, 1), k)
    fs = as_filterset(opts.filter)
    metric = options.metric

    qd = jnp.asarray(q, jnp.float32)
    if metric == Metric.COSINE:
        qd = normalize(qd)

    # ---------------- plan + dispatch per source ----------------
    t_plan = time.perf_counter()
    pending = []  # (seg_id_or_-1, d_dev, rows_dev, source)
    streamed = set()  # seg_ids searched without device residency
    dist_comps_mem = 0

    # Memtable.
    mem = snap.memtable
    n_vis = snap.mem_rows
    if n_vis:
        mask = None
        if fs is not None:
            mask = mem.filter_mask(fs, n_vis)
        dead = mem.deleted_mask(n_vis, snap.lsn)
        if dead is not None:
            mask = ~dead if mask is None else (mask & ~dead)
        if mask is None or mask.any():
            d, rows = mem.search(qd, min(fetch_k, n_vis), n_vis, mask)
            pending.append((-1, d, rows, mem))
            if stats:
                rows_c = n_vis if mask is None else int(mask.sum())
                stats.rows_considered += rows_c
                dist_comps_mem = rows_c

    # Segments.
    n_brute = n_graph = n_pruned = 0
    b = q.shape[0]
    dist_comps = 0  # pairwise distance evaluations across the whole batch
    nodes_visited = 0  # graph nodes expanded across the whole batch
    for h in snap.segments:
        seg = h.segment
        if seg.n == 0:
            continue
        if stats:
            stats.segments_total += 1
        if can_prune_segment(h.info.stats, fs):
            n_pruned += 1
            continue
        mask = None
        selectivity = 1.0
        if fs is not None:
            mask = seg.filter_mask(fs)
            selectivity = float(mask.mean())
            if selectivity == 0.0:
                n_pruned += 1
                continue
        dead = snap.tombstones.deleted_mask(seg.seg_id, seg.n, snap.lsn)
        if dead is not None:
            mask = ~dead if mask is None else (mask & ~dead)
            if not mask.any():
                n_pruned += 1
                continue
        kk = min(fetch_k, seg.n)
        was_graph = False
        # HBM residency: over-budget segments stream host blocks through the
        # device with a running top-k (reference: lazy block reads,
        # diskann/segment.go:1151; two-tier cache engine.go:425-477).
        resident = True
        if device_budget is not None:
            resident = device_budget.admit(
                ("seg", seg.seg_id), seg.device_bytes(), seg.release_device
            )
        if not resident:
            streamed.add(seg.seg_id)
        if isinstance(seg, FlatSegment):
            if resident:
                d, rows = seg.search(qd, kk, mask=mask, nprobes=opts.nprobes)
            else:
                d, rows = seg.search_streaming(
                    qd, kk, mask=mask, nprobes=opts.nprobes
                )
            n_brute += 1
        elif not resident:
            # Beyond-HBM graph segment: exact streaming brute force over the
            # host-resident full vectors (graph traversal needs residency).
            from vecgo_tpu.index.common import raw_score_fn
            from vecgo_tpu.ops import topk as T

            d, rows = T.streaming_topk_scored(
                qd,
                {"vectors": seg.vectors, "rnorm2": seg.rnorm2},
                seg.n,
                kk,
                raw_score_fn(metric),
                mask=mask,
            )
            n_brute += 1
        else:
            cutoff = (
                opts.selectivity_cutoff
                if opts.prefilter is None
                else (1.1 if opts.prefilter else -0.1)
            )
            if fs is not None and selectivity <= cutoff:
                # Brute-force the eligible rows (cheap on MXU at low selectivity
                # ... and at high selectivity too; the graph only wins on very
                # large segments — cutoff is configurable).
                from vecgo_tpu.ops import topk as T

                dev = seg.device_state()
                d, rows = T.blockwise_topk_search(
                    qd,
                    dev["full"],
                    kk,
                    metric=metric,
                    x_norms_sq=dev["rnorm2"],
                    mask=jnp.asarray(mask),
                    x_normalized=True,
                )
                n_brute += 1
            else:
                ef = max(opts.ef or options.ef_search, kk)
                bw = opts.beam_width or options.beam_width
                d, rows = seg.search(qd, kk, mask=mask, ef=ef, beam_width=bw)
                n_graph += 1
                was_graph = True
                if stats:
                    # Lockstep traversal: static per-query step budget
                    # (ops/beam.beam_search max_steps) x beam width nodes
                    # expanded, each scoring R neighbors.
                    import math as _math

                    steps = ef // max(bw, 1) + 8 + int(
                        _math.ceil(_math.log2(max(seg.n, 2)))
                    )
                    nodes_visited += b * steps * bw
                    dist_comps += b * steps * bw * seg.r
        if stats:
            rows_c = seg.n if mask is None else int(mask.sum())
            stats.rows_considered += rows_c
            if mask is not None:
                stats.rows_filtered_out += seg.n - int(mask.sum())
            if not was_graph:
                dist_comps += b * rows_c  # brute scans score every row
        pending.append((seg.seg_id, d, rows, seg))

    t_score = time.perf_counter()

    # ---------------- rerank (exact distances) ----------------
    # Graph results are bf16-precision; quantized flat results approximate.
    reranked = []
    for seg_id, d, rows, src in pending:
        if seg_id >= 0:
            seg = src
            if seg_id in streamed:
                # Streamed path scored raw/quantized blocks; exact rerank
                # gathers candidates from HOST (no device residency).
                if (not isinstance(seg, FlatSegment)) or seg.quant.kind != "none":
                    d = seg.rerank_host(qd, rows)
            else:
                needs = (not isinstance(seg, FlatSegment)) or seg.quant.kind != "none"
                if needs:
                    d = seg.rerank(qd, rows)
        reranked.append((seg_id, d, rows))

    t_rerank = time.perf_counter()

    # ---------------- host merge + visibility (vectorized) ----------------
    # One packed D2H transfer for all sources: per-transfer latency dominates
    # engine throughput (measured ~24 ms/transfer through the device tunnel),
    # so (dists, rows) of every source ship as a single [2, B, W] array
    # (rows bitcast into the f32 payload).
    b = q.shape[0]
    if not reranked:
        empty_ids = np.full((b, k), -1, np.int64)
        empty_d = np.full((b, k), np.inf, np.float32)
        if stats:
            stats.strategy = "empty"
        return empty_ids, empty_d, [[] for _ in range(b)], stats

    import jax

    # Single packed transfer: distances ride as their raw f32 bits inside an
    # int32 array (f32->i32 bitcast is safe; ints are never canonicalized in
    # transit — the reverse direction would hit TPU NaN/denormal handling).
    packed = jnp.stack(
        [
            jax.lax.bitcast_convert_type(
                jnp.concatenate([d for _, d, _ in reranked], axis=1), jnp.int32
            ),
            jnp.concatenate(
                [rows.astype(jnp.int32) for _, _, rows in reranked], axis=1
            ),
        ]
    )
    packed_host = np.asarray(packed)
    dist_host = packed_host[0].view(np.float32)
    rows_host = packed_host[1]
    all_d = []
    all_rows = []
    all_seg = []
    all_ids = []
    all_lsns = []
    mem_ids = np.asarray(snap.memtable.ids[: snap.mem_rows], np.int64) if snap.mem_rows else None
    mem_lsns = np.asarray(snap.memtable.lsns[: snap.mem_rows], np.int64) if snap.mem_rows else None
    segmap = {h.seg_id: h.segment for h in snap.segments}
    col = 0
    for seg_id, d, rows in reranked:
        w = rows.shape[1]
        dn = dist_host[:, col : col + w]
        rn = rows_host[:, col : col + w]
        col += w
        safe = np.maximum(rn, 0)
        if seg_id == -1:
            ids_src, lsns_src = mem_ids, mem_lsns
        else:
            seg = segmap[seg_id]
            ids_src = seg.ids.astype(np.int64, copy=False)
            lsns_src = seg.lsns
        all_d.append(np.where(rn >= 0, dn, np.inf))
        all_rows.append(rn)
        all_seg.append(np.full(rn.shape, seg_id, np.int32))
        all_ids.append(np.where(rn >= 0, ids_src[safe], -1))
        all_lsns.append(np.where(rn >= 0, lsns_src[safe], -1))

    D = np.concatenate(all_d, axis=1)
    order = np.argsort(D, axis=1, kind="stable")
    D = np.take_along_axis(D, order, axis=1)
    R = np.take_along_axis(np.concatenate(all_rows, axis=1), order, axis=1)
    S = np.take_along_axis(np.concatenate(all_seg, axis=1), order, axis=1)
    IDS = np.take_along_axis(np.concatenate(all_ids, axis=1), order, axis=1)
    LSNS = np.take_along_axis(np.concatenate(all_lsns, axis=1), order, axis=1)

    valid = np.isfinite(D) & (R >= 0)
    # MVCC visibility fast path: ids with a single chain version are trivially
    # visible; only multi-version ("dirty") ids need a chain lookup.
    dirty = pk.dirty_sorted()
    if len(dirty):
        from vecgo_tpu.engine.pk import DELETED

        flagged = valid & np.isin(IDS, dirty, assume_unique=False)
        for bi, j in zip(*np.nonzero(flagged)):
            ent = pk.get_entry(int(IDS[bi, j]), snap.lsn)
            if ent is None or ent[1] == DELETED or ent[0] != int(LSNS[bi, j]):
                valid[bi, j] = False
        # Dedup within a row can only involve dirty ids (single-version ids
        # exist in exactly one physical location).
        for bi in set(np.nonzero(flagged.any(axis=1))[0]):
            seen = set()
            for j in range(valid.shape[1]):
                if not valid[bi, j]:
                    continue
                cid = int(IDS[bi, j])
                if cid in seen:
                    valid[bi, j] = False
                else:
                    seen.add(cid)

    # Stable-compact the first k valid entries per row (candidate width may be
    # smaller than k on tiny corpora).
    sel = np.argsort(~valid, axis=1, kind="stable")[:, :k]
    kk = sel.shape[1]
    got = np.take_along_axis(valid, sel, axis=1)
    out_ids = np.full((b, k), -1, np.int64)
    out_d = np.full((b, k), np.inf, np.float32)
    out_ids[:, :kk] = np.where(got, np.take_along_axis(IDS, sel, axis=1), -1)
    out_d[:, :kk] = np.where(got, np.take_along_axis(D, sel, axis=1), np.inf)
    sel_seg = np.take_along_axis(S, sel, axis=1)
    sel_row = np.take_along_axis(R, sel, axis=1)
    out_loc: List[List] = [
        [(int(sel_seg[bi, j]), int(sel_row[bi, j])) for j in range(kk) if got[bi, j]]
        for bi in range(b)
    ]

    t_end = time.perf_counter()
    if stats:
        stats.planning_time_s = t_plan - t0
        stats.scoring_time_s = t_score - t_plan
        stats.rerank_time_s = t_rerank - t_score
        stats.materialize_time_s = t_end - t_rerank
        stats.total_time_s = t_end - t0
        stats.segments_pruned = n_pruned
        stats.segments_brute_force = n_brute
        stats.segments_graph = n_graph
        # Brute scans score every considered row against every query; graph
        # traversals contribute their expansion product; rerank adds the
        # candidate tiles.
        stats.nodes_visited = nodes_visited
        rerank_width = sum(r[2].shape[1] for r in reranked)
        stats.distance_computations = (
            dist_comps + b * dist_comps_mem + b * rerank_width
        )
        if fs is not None:
            sel_total = stats.rows_considered
            all_total = snap.mem_rows + sum(h.segment.n for h in snap.segments)
            stats.selectivity = sel_total / max(all_total, 1)
        stats.strategy = (
            f"brute={n_brute} graph={n_graph} pruned={n_pruned}"
            + (" filtered" if fs is not None else "")
        )
    return out_ids, out_d, out_loc, stats


def _seg_by_id(snap, seg_id: int):
    for h in snap.segments:
        if h.seg_id == seg_id:
            return h.segment
    raise KeyError(seg_id)
