"""Vamana graph segment: batched device build + lockstep beam search.

Reference: internal/segment/diskann — writer.go (Vamana build: R=64 L=100
alpha=1.2, random init, two passes alpha=1 then alpha :433-435, greedySearch
:472, RobustPrune :571-625, back-edges :627), segment.go (beam search :503-708),
format.go (the on-disk graph is already a dense padded [N, R] table :36 — we
keep exactly that layout, in HBM).

TPU-first build (SURVEY.md §7.2 stage 4, §7.3): instead of per-point sequential
insertion, the graph is built in batched rounds:

  1. random R-regular init,
  2. per block of C points: lockstep beam search (ops/beam.py) for candidates,
     vectorized RobustPrune, functional row update of the device graph,
  3. after each pass: bulk reverse-edge pass — every edge u->v contributes u as
     a candidate of v; all N nodes re-pruned blockwise on device.

Two passes (alpha=1, then alpha) mirror the reference. HNSW's role is covered
by this same structure: a single-layer graph with a medoid entry point
(SURVEY.md §7.2 stage 4 rationale).
"""

from __future__ import annotations

import json
from typing import Dict, Optional

import numpy as np

from vecgo_tpu.errors import ErrCorrupt
from vecgo_tpu.index import common
from vecgo_tpu.index.flat import segment_stats
from vecgo_tpu.metadata.columnar import ColumnarMeta
from vecgo_tpu.model import Metric
from vecgo_tpu.storage import container
from vecgo_tpu import quantization as Q

SEGMENT_KIND = "vamana"

DEFAULT_R = 32
DEFAULT_L_BUILD = 64
DEFAULT_ALPHA = 1.2


def coarse_quantize(x: np.ndarray, n_centroids: int, seed: int = 42):
    """Coarse k-means over the corpus; returns (centroids [C,d], assign [N],
    entry_nodes [C] — the row nearest each centroid).

    Used for IVF-guided graph entries: beam search starts at the entry node of
    the query's nearest centroids instead of one global medoid, which is what
    makes the graph navigable on strongly clustered corpora (the reference's
    single-medoid design relies on long-range alpha edges; batched lockstep
    search benefits far more from localized entries)."""
    from vecgo_tpu.quantization import kmeans as km

    n = x.shape[0]
    centroids, _ = km.train_kmeans(x, n_centroids, seed=seed)
    assign, dist = km.assign_partitions(x, centroids)
    entry_nodes = np.zeros(n_centroids, np.int32)
    order = np.lexsort((dist, assign))
    seen = np.zeros(n_centroids, bool)
    for i in order:
        c = assign[i]
        if not seen[c]:
            entry_nodes[c] = i
            seen[c] = True
    # Empty clusters: point their entry at the global nearest row.
    if not seen.all():
        entry_nodes[~seen] = int(np.argmin(dist))
    return centroids, assign, entry_nodes


def _cluster_aware_init(n: int, r: int, assign: np.ndarray, rng) -> np.ndarray:
    """Init graph: half cluster-local random edges + half global random.

    Gives pass-1 searches a locally navigable starting graph (random-only init
    makes early candidate generation useless on clustered data)."""
    g = rng.integers(0, n, size=(n, r), dtype=np.int64).astype(np.int32)
    # Local edges: random permutations within each cluster, vectorized.
    local = r // 2
    order = np.argsort(assign, kind="stable")
    # For each node, pick `local` random positions within its cluster range.
    starts = np.searchsorted(assign[order], assign)
    ends = np.searchsorted(assign[order], assign, side="right")
    width = np.maximum(ends - starts, 1)
    offs = rng.integers(0, 1 << 62, size=(n, local)) % width[:, None]
    g[:, :local] = order[starts[:, None] + offs]
    g[g == np.arange(n, dtype=np.int32)[:, None]] = -1
    return g


def build_graph(
    x: np.ndarray,
    r: int = DEFAULT_R,
    l_build: int = DEFAULT_L_BUILD,
    alpha: float = DEFAULT_ALPHA,
    block: int = 8192,
    seed: int = 42,
    beam_width: int = 8,
    passes: int = 2,
    n_centroids: int = 0,  # 0 = auto
):
    """Build a Vamana graph over x [N, d].

    Returns (graph [N, r] int32, medoid, centroids [C, d], entry_nodes [C]).
    """
    import jax
    import jax.numpy as jnp

    from vecgo_tpu.ops import beam as beam_ops
    from vecgo_tpu.utils.devbug import call_compiled

    n, d = x.shape
    rng = np.random.default_rng(seed)
    if n == 0:
        return np.zeros((0, r), np.int32), 0, np.zeros((0, d), np.float32), np.zeros(0, np.int32)
    if n <= r + 1:
        # Tiny graph: fully connected.
        g = np.full((n, r), -1, np.int32)
        for i in range(n):
            others = [j for j in range(n) if j != i]
            g[i, : len(others)] = others
        centroid = x.mean(0)
        medoid = int(((x - centroid) ** 2).sum(1).argmin())
        return g, medoid, x[medoid : medoid + 1].astype(np.float32), np.asarray([medoid], np.int32)

    if n_centroids <= 0:
        n_centroids = int(np.clip(n // 1024, 16, 4096))
    centroids, assign, entry_nodes = coarse_quantize(x, n_centroids, seed)

    # Cluster-aware init (replaces the reference's pure-random init,
    # writer.go:433 — see _cluster_aware_init).
    g_init = _cluster_aware_init(n, r, assign, rng)

    centroid = x.mean(0)
    medoid = int(((x - centroid) ** 2).sum(1).argmin())

    vectors = jnp.asarray(x, jnp.float32)
    # bf16 traversal copy for build-time beam searches: random row gathers are
    # bytes-bound above ~256 B/row (measured: 512 B rows cost 4x) — candidate
    # generation tolerates bf16; RobustPrune keeps f32.
    trav16 = jnp.asarray(x, jnp.bfloat16)
    rnorm2 = jnp.sum(vectors * vectors, axis=1)
    graph = jnp.asarray(g_init)
    entry_nodes_dev = jnp.asarray(entry_nodes)
    centroids_dev = jnp.asarray(centroids)

    # Per-block entries: each build query starts at its own cluster's entry
    # plus the global medoid.
    n_entry = 2

    update = jax.jit(
        lambda g, rows, vals: g.at[rows].set(vals), donate_argnums=(0,)
    )

    max_steps = l_build // beam_width + 12
    alphas = [1.0] * (passes - 1) + [alpha] if passes > 1 else [alpha]
    for a in alphas:
        # --- forward pass: blockwise search + prune ---
        for s in range(0, n, block):
            e = min(s + block, n)
            blk_rows = np.arange(s, e, dtype=np.int32)
            if e - s < block:  # pad to static shape
                blk_rows = np.concatenate(
                    [blk_rows, np.full(block - (e - s), s, np.int32)]
                )
            rows_dev = jnp.asarray(blk_rows)
            q_blk = jnp.take(vectors, rows_dev, axis=0)
            entries_blk = np.stack(
                [
                    entry_nodes[assign[blk_rows]],
                    np.full(block, medoid, np.int32),
                ],
                axis=1,
            )
            _, _, cand_d, cand_ids = call_compiled(
                beam_ops.beam_search,
                q_blk,
                trav16,
                rnorm2,
                graph,
                jnp.asarray(entries_blk),
                ef=l_build,
                k=1,
                beam_width=beam_width,
                max_steps=max_steps,
                with_visited=True,
            )
            cur = jnp.take(graph, rows_dev, axis=0)
            cand_all = jnp.concatenate([cand_ids, cur], axis=1)
            new_nbrs = call_compiled(
                beam_ops.robust_prune,
                rows_dev,
                q_blk,
                cand_all,
                vectors,
                rnorm2,
                r_out=r,
                alpha=a,
            )
            if e - s < block:
                # Don't clobber row `s` with a padded duplicate: re-set real rows only.
                new_nbrs = new_nbrs[: e - s]
                rows_dev = rows_dev[: e - s]
            graph = update(graph, rows_dev, new_nbrs)

        # --- reverse-edge pass (reference back-edges + re-prune :627) ---
        g_host = np.asarray(graph)
        rev = _reverse_candidates(g_host, r, rng)
        rev_dev = jnp.asarray(rev)
        for s in range(0, n, block):
            e = min(s + block, n)
            blk_rows = np.arange(s, e, dtype=np.int32)
            if e - s < block:
                blk_rows = np.concatenate(
                    [blk_rows, np.full(block - (e - s), s, np.int32)]
                )
            rows_dev = jnp.asarray(blk_rows)
            cand_all = jnp.concatenate(
                [jnp.take(graph, rows_dev, axis=0), jnp.take(rev_dev, rows_dev, axis=0)],
                axis=1,
            )
            new_nbrs = call_compiled(
                beam_ops.robust_prune,
                rows_dev,
                jnp.take(vectors, rows_dev, axis=0),
                cand_all,
                vectors,
                rnorm2,
                r_out=r,
                alpha=a,
            )
            if e - s < block:
                new_nbrs = new_nbrs[: e - s]
                rows_dev = rows_dev[: e - s]
            graph = update(graph, rows_dev, new_nbrs)

    return np.asarray(graph), medoid, centroids, entry_nodes


def _reverse_candidates(g: np.ndarray, cap: int, rng) -> np.ndarray:
    """For each node v, up to `cap` nodes u with an edge u->v ([N, cap] int32)."""
    n, r = g.shape
    src = np.repeat(np.arange(n, dtype=np.int64), r)
    dst = g.reshape(-1).astype(np.int64)
    keep = dst >= 0
    src, dst = src[keep], dst[keep]
    # Shuffle so truncation keeps a random sample of in-edges.
    perm = rng.permutation(len(src))
    src, dst = src[perm], dst[perm]
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    out = np.full((n, cap), -1, np.int32)
    starts = np.searchsorted(dst, np.arange(n))
    ends = np.searchsorted(dst, np.arange(n) + 1)
    take = np.minimum(ends - starts, cap)
    # Vectorized ragged fill.
    rows = np.repeat(np.arange(n), take)
    if len(rows):
        offs = np.concatenate([np.arange(t) for t in take if t > 0])
        out[rows, offs] = src[
            np.repeat(starts, take) + offs
        ]
    return out


class VamanaWriter:
    """Builds an immutable vamana segment (reference: diskann.NewWriter:97)."""

    def __init__(
        self,
        dim: int,
        metric: Metric = Metric.L2,
        r: int = DEFAULT_R,
        l_build: int = DEFAULT_L_BUILD,
        alpha: Optional[float] = None,
        quantizer: str = "none",
        qparams: Optional[dict] = None,
        seed: int = 42,
        compress: str = "",
        build_mode: str = "clustered",
        build_params: Optional[dict] = None,
        serve_ivf: bool = True,
        ivf_capacity: int = 512,
        ivf_min_n: int = 4096,  # below this, a graph walk beats the table
        store_codes: bool = False,
    ):
        """build_mode: "clustered" (default — cluster-local KNN + RobustPrune,
        index/build_fast.py, ~16x faster than beam at 1M) or "beam" (the
        search-based batched build, build_graph below).

        alpha=None resolves per mode: 1.2 for beam (reference default,
        writer.go:85-93) but 1.5 for clustered — pure-KNN candidate lists
        need weaker occlusion than search-path candidates for equal recall
        (measured: 0.92 -> 0.97 @ ef96 on 200k/1M clustered corpora).
        """
        if build_mode not in ("clustered", "beam"):
            raise ValueError(f"unknown build_mode {build_mode!r} (clustered|beam)")
        self.compress = compress
        self.dim = dim
        self.metric = metric
        self.r = r
        self.l_build = l_build
        self.build_mode = build_mode
        self.alpha = alpha if alpha is not None else (
            1.5 if build_mode == "clustered" else DEFAULT_ALPHA
        )
        self.build_params = dict(build_params or {})
        self.serve_ivf = serve_ivf
        self.ivf_capacity = ivf_capacity
        self.ivf_min_n = ivf_min_n
        # Persist the SQ8-residual coded table (`ivfq.*` sections) so remote
        # opens can serve from block-granular ranged reads without ever
        # downloading the vectors (reference: codes ARE the on-disk serving
        # payload, diskann/writer.go + segment.go:503-708). Off by default:
        # local serving re-encodes from vectors at open (cheaper than +1
        # byte/dim/slot on every blob for stores that never go remote).
        self.store_codes = store_codes
        self.quantizer_kind = quantizer
        self.qparams = dict(qparams or {})
        self.seed = seed
        self._rows = common.RowBuffer(dim)
        self._preset = None

    def add(self, vector, id: int, metadata=None, payload: Optional[bytes] = None,
            lsn: int = 0):
        self._rows.add(vector, id, metadata, payload, lsn)

    def add_batch(self, vectors, ids, metadatas=None, payloads=None, lsns=None):
        self._rows.add_batch(vectors, ids, metadatas, payloads, lsns)

    def set_preset_rows(self, cm, docs_csr, payload_csr) -> None:
        """Compaction slab path (see FlatWriter.set_preset_rows)."""
        self._preset = (cm, docs_csr, payload_csr)

    @property
    def row_count(self) -> int:
        return len(self._rows)

    def finish(self) -> bytes:
        n = len(self._rows)
        x, ids = self._rows.stacked(self.metric)
        want_ivf = self.serve_ivf and n >= self.ivf_min_n
        ivf_members = None
        if self.build_mode == "clustered":
            import jax.numpy as jnp

            from vecgo_tpu.index.build_fast import build_graph_clustered

            # Device-resident input: one upload + device norms replaces the
            # host-prep path (measured: removed ~37 s of host work + upload
            # overlap at 1M, PERF.md round 2) and keeps compaction on the
            # same build variant the bench exercises on real TPUs.
            out = build_graph_clustered(
                jnp.asarray(x, jnp.bfloat16),
                r=self.r, alpha=self.alpha, seed=self.seed,
                return_membership=want_ivf,
                **self.build_params,
            )
            if want_ivf:
                # The serving shortlist table IS the build's own partition —
                # no second k-means/assignment (VERDICT r2 #4).
                graph, medoid, centroids, entry_nodes, ivf_members = out
            else:
                graph, medoid, centroids, entry_nodes = out
        else:
            graph, medoid, centroids, entry_nodes = build_graph(
                x, r=self.r, l_build=self.l_build, alpha=self.alpha,
                seed=self.seed, **self.build_params,
            )
        if self._preset is not None:
            sections, md_meta, cm = common.preset_row_sections(
                x, ids, self._rows.lsns, self._preset
            )
        else:
            sections, md_meta, cm = common.row_sections(
                x, ids, self._rows.docs, self._rows.payloads, self._rows.lsns
            )
        sections["graph"] = graph
        sections["entry.centroids"] = centroids
        sections["entry.nodes"] = entry_nodes

        # Serving shortlist structure: blocked IVF membership (ops/ivf.py) —
        # the sublinear first stage of the two-stage query path (IVF
        # shortlist + graph refinement; the reference's nprobe knob,
        # vecgo.go WithNProbes, becomes a real compute saving here instead
        # of a scan mask). Serving-time quantization is the SQ8-residual
        # coded table built from this membership at open
        # (device_table_coded) — matching the reference's codes-resident
        # DiskANN serving (segment.go:503-708) without persisting separate
        # quantizer codes that the query path would never score.
        ivf_meta = None
        if want_ivf and ivf_members is None:
            # beam build mode: membership from a dedicated partition pass.
            from vecgo_tpu.ops import ivf as ivf_ops

            _, ivf_members = ivf_ops.build_ivf_table(
                x, capacity=self.ivf_capacity, seed=self.seed
            )
        if ivf_members is not None:
            sections["ivf.members"] = np.ascontiguousarray(ivf_members, np.int32)
            ivf_meta = {
                "capacity": int(ivf_members.shape[1]),
                "k": int(ivf_members.shape[0]),
                "coded": True,
            }
            if self.store_codes:
                # Persisted coded table (cluster-major: one cluster = one
                # contiguous byte range = one lazy block read). kind "sq8"
                # ships d bytes/slot; "pq"/"opq" ship d/4 bytes/slot and are
                # decoded into the SQ8 cache layout on device at admission.
                kind = (
                    self.store_codes
                    if isinstance(self.store_codes, str)
                    else "sq8"
                )
                if kind == "sq8":
                    from vecgo_tpu.ops.ivf_cache import _encode_host

                    h = _encode_host(
                        np.asarray(ivf_members), np.asarray(x, np.float32)
                    )
                    sections["ivfq.codes"] = h["codes"]
                elif kind in ("pq", "opq"):
                    from vecgo_tpu.ops.ivf_cache import _encode_host_pq

                    h = _encode_host_pq(
                        np.asarray(ivf_members), np.asarray(x, np.float32),
                        kind=kind, seed=self.seed,
                    )
                    sections["ivfq.pq"] = h["pq"]
                    sections["ivfq.cb"] = h["cb"]
                    if h["rot"] is not None:
                        sections["ivfq.rot"] = h["rot"]
                else:
                    raise ValueError(
                        f"store_codes={self.store_codes!r} (True|sq8|pq|opq)"
                    )
                sections["ivfq.bn"] = h["bn"]
                sections["ivfq.scale"] = h["scale"]
                sections["ivfq.cent"] = h["cent"]
                sections["ivfq.cnorm2"] = h["cnorm2"]
                ivf_meta["codes_stored"] = kind


        meta = {
            "kind": SEGMENT_KIND,
            "dim": self.dim,
            "metric": self.metric.value,
            "count": n,
            "medoid": medoid,
            "r": self.r,
            "l_build": self.l_build,
            "alpha": self.alpha,
            "quantizer": {
                # Recorded for API parity; the graph serving path quantizes
                # via the SQ8-residual table regardless (see ivf_meta above).
                "kind": self.quantizer_kind,
                "params": dict(self.qparams),
            },
            "ivf": ivf_meta,
            "metadata": md_meta,
            "stats": segment_stats(x, cm),
        }
        return container.pack_container(meta, sections, compress=self.compress or None)


class VamanaSegment(common.RowBlobAccess):
    """Immutable graph segment (reference: diskann.Segment, segment.go:92)."""

    DEFAULT_EF_SEARCH = 64
    # Serving memory/compute knob (engine: EngineOptions.serve_compact):
    # repack the coded table to one slot per row at open — half the HBM of
    # the overlap build membership, ~2x the probes for equal recall.
    serve_compact = False
    # int16 refinement plane for pool rescoring (+2 B/dim/row HBM): the int8
    # x̂ rescore caps recall ~2 points below the ef-pool's content
    # (scripts/probe_coded_recall2.py: 0.977 vs 0.999 exact-rr at 200k);
    # the plane restores the pool bound. EngineOptions.serve_refine.
    serve_refine = True

    def __init__(
        self,
        meta: dict,
        sections: Dict[str, np.ndarray],
        seg_id: int = 0,
        lazy=None,  # storage.container.LazyContainer for deferred docs/payload
    ):
        if meta.get("kind") != SEGMENT_KIND:
            raise ErrCorrupt(f"not a vamana segment: kind={meta.get('kind')!r}")
        self.meta = meta
        self.seg_id = seg_id
        self.dim = int(meta["dim"])
        self.metric = Metric(meta["metric"])
        self.n = int(meta["count"])
        self.medoid = int(meta["medoid"])
        self.r = int(meta["r"])
        self.ids: np.ndarray = sections["ids"]
        # Deferred on cloud opens of codes-stored segments (the `vectors`
        # property materializes with one ranged read on first touch; the
        # serving paths below never touch it).
        self._vectors_arr: Optional[np.ndarray] = sections.get("vectors")
        self.rnorm2: np.ndarray = sections["rnorm2"]
        self.lsns: np.ndarray = sections.get("lsns", np.zeros(self.n, np.int64))
        self.graph: np.ndarray = sections["graph"]
        # IVF-guided entries (older segments without them fall back to medoid).
        self.entry_centroids: Optional[np.ndarray] = sections.get("entry.centroids")
        self.entry_nodes: Optional[np.ndarray] = sections.get("entry.nodes")
        # Blocked IVF serving table (two-stage shortlist; ops/ivf.py).
        self.ivf_members: Optional[np.ndarray] = sections.get("ivf.members")
        self.ivf_centroids: Optional[np.ndarray] = sections.get("ivf.centroids")
        self.cm = ColumnarMeta.from_sections(meta["metadata"], sections)
        # Persisted coded table sections (writer store_codes=True), when the
        # open materialized them (local/mmap opens; cloud opens leave them in
        # the store and read cluster blocks lazily).
        self._ivfq = None
        if "ivfq.codes" in sections or "ivfq.pq" in sections:
            self._ivfq = {
                "bn": sections["ivfq.bn"],
                "scale": sections["ivfq.scale"],
                "cent": sections["ivfq.cent"],
                "cnorm2": sections["ivfq.cnorm2"],
            }
            if "ivfq.pq" in sections:
                self._ivfq["pq"] = sections["ivfq.pq"]
                self._ivfq["cb"] = sections["ivfq.cb"]
                self._ivfq["rot"] = sections.get("ivfq.rot")
            else:
                self._ivfq["codes"] = sections["ivfq.codes"]
        self._attach_row_blobs(sections, lazy)
        self._dev = None
        self._rerank_fn = None
        self._scan_score_fn = None
        self._stream = None
        self._ccache = None

    @property
    def vectors(self) -> np.ndarray:
        """Full-precision rows. On a cloud open of a codes-stored segment this
        is DEFERRED — first touch pulls the whole section with one ranged read
        (resident serving, compaction, iteration); the beyond-HBM serving
        paths (cluster_cache / rerank_host) never touch it."""
        if self._vectors_arr is None:
            self._vectors_arr = self._lazy.load("vectors")
        return self._vectors_arr

    @staticmethod
    def open(data: bytes, seg_id: int = 0, verify_checksum: bool = True) -> "VamanaSegment":
        meta, sections = container.unpack_container(data, verify_checksum, copy=False)
        try:
            return VamanaSegment(meta, sections, seg_id)
        except ErrCorrupt:
            raise
        except Exception as e:
            raise ErrCorrupt(f"vamana segment open failed: {e}")

    @staticmethod
    def open_lazy(store, name: str, seg_id: int = 0, verify_checksum: bool = True) -> "VamanaSegment":
        """Remote open via ranged reads; docs/payload sections deferred
        (reference: diskann lazy block reads segment.go:1151)."""
        lc = container.LazyContainer(store, name, verify_checksum)
        exclude = ("docs.", "payload.", "ivfq.")
        if (lc.meta.get("ivf") or {}).get("codes_stored"):
            # Codes-stored segment: serving never needs the f32 rows resident
            # — the cluster cache reads coded blocks from the store and the
            # exact rerank gathers candidate rows by ranged reads. Defer the
            # whole vectors section (the largest in the blob).
            exclude = exclude + ("vectors",)
        sections = lc.load_many(exclude_prefixes=exclude)
        try:
            return VamanaSegment(lc.meta, sections, seg_id, lazy=lc)
        except ErrCorrupt:
            raise
        except Exception as e:
            raise ErrCorrupt(f"vamana segment open failed: {e}")

    def device_state(self):
        import jax.numpy as jnp

        if self._dev is None:
            if self.ivf_members is not None:
                # QUANTIZED SERVING (the default for writer-built segments):
                # the SQ8-residual blocked table is the ONLY vector data in
                # HBM — scan, graph refinement, and rerank all score codes
                # (reference: diskann codes-resident serving,
                # segment.go:503-708). The bf16 upload below is a transient
                # encode input, freed after device_table_coded returns.
                from vecgo_tpu.ops import ivf as ivf_ops

                if self.serve_refine:
                    # f32 transient upload: feeds both the int8 encode and
                    # the int16 refinement plane (a bf16 source would bake
                    # bf16 value error into the refined decode).
                    xf = jnp.asarray(self.vectors, jnp.float32)
                    table = ivf_ops.device_table_coded(
                        self.ivf_members, xf, compact=self.serve_compact,
                        refine=xf,
                    )
                    table.codes.block_until_ready()
                    del xf
                else:
                    x16 = jnp.asarray(self.vectors, jnp.bfloat16)
                    table = ivf_ops.device_table_coded(
                        self.ivf_members, x16, compact=self.serve_compact
                    )
                    table.codes.block_until_ready()
                    del x16
                self._dev = {
                    "graph": jnp.asarray(self.graph),
                    "entry": jnp.asarray([self.medoid], jnp.int32),
                    "ivfq": table,
                }
                return self._dev
            self._dev = {
                # Legacy (table-less) segment: bf16 traversal copy + f32
                # rerank copy.
                "trav": jnp.asarray(self.vectors, jnp.bfloat16),
                "rnorm2": jnp.asarray(self.rnorm2),
                "graph": jnp.asarray(self.graph),
                "full": jnp.asarray(self.vectors),
                "entry": jnp.asarray([self.medoid], jnp.int32),
            }
            if self.entry_centroids is not None and len(self.entry_centroids):
                self._dev["entry_centroids"] = jnp.asarray(self.entry_centroids)
                self._dev["entry_nodes"] = jnp.asarray(self.entry_nodes)
        return self._dev

    def release_device(self):
        self._dev = None
        # A rebuild may flip the table variant (serve_refine/serve_compact);
        # the cached rerank jit is variant-specific.
        self._rerank_fn = None

    def device_bytes(self) -> int:
        """HBM footprint of device_state() (for DeviceBudget admission)."""
        n, d = self.n, self.dim
        if self.ivf_members is not None:
            k, s = self.ivf_members.shape
            # codes + norms/rows + slot map + centroids + graph
            total = int(
                k * s * (d + 4 + 4 + 4) + n * 4 + k * (d * 4 + 8)
                + self.graph.nbytes
            )
            if self.serve_refine:
                total += n * d * 2  # int16 refinement plane
            return total
        total = n * d * 2 + n * 4 + self.graph.nbytes + n * d * 4
        if self.entry_centroids is not None:
            total += self.entry_centroids.nbytes + self.entry_nodes.nbytes
        return int(total)

    def rerank_host(self, q, rows):
        """Exact rerank gathering candidate rows from HOST memory (beyond-HBM
        mode: the segment has no device residency). With deferred vectors
        (cloud open), candidate rows come from block-granular ranged reads —
        O(candidates) store bytes, never the full section (reference: rerank
        reads full-precision rows through the block cache,
        diskann/segment.go:1151)."""
        from vecgo_tpu.index.common import rerank_host_rows

        if self._vectors_arr is None and self._lazy is not None:
            if self._lazy.entries.get("vectors", {}).get("compression"):
                return rerank_host_rows(
                    q, rows, self.vectors, self.rnorm2, self.metric
                )  # compressed: not offset-sliceable; one full read
            rows_np = np.asarray(rows)
            uniq, inv = np.unique(np.maximum(rows_np, 0), return_inverse=True)
            if len(uniq) < max(1, self.n // 2):
                tbl = self._gather_rows_lazy(uniq)
                rows2 = np.where(
                    rows_np >= 0, inv.reshape(rows_np.shape), -1
                ).astype(np.int64)
                return rerank_host_rows(
                    q, rows2, tbl, self.rnorm2[uniq], self.metric
                )
            # Candidate set ~ the corpus: one full read beats row reads.
        return rerank_host_rows(q, rows, self.vectors, self.rnorm2, self.metric)

    def _gather_rows_lazy(self, uniq: np.ndarray) -> np.ndarray:
        """[U, d] f32 gather of sorted unique rows via coalesced ranged
        reads of the deferred vectors section."""
        out = np.empty((len(uniq), self.dim), np.float32)
        i = 0
        while i < len(uniq):
            j = i
            while j + 1 < len(uniq) and uniq[j + 1] == uniq[j] + 1:
                j += 1
            blk = self._lazy.load_rows("vectors", int(uniq[i]), int(uniq[j]) + 1)
            out[i : j + 1] = np.asarray(blk, np.float32)
            i = j + 1
        return out

    # ---- beyond-HBM coded serving (cluster-granular device cache) ----

    CACHE_CLUSTERS = 256

    def cache_bytes(self, cache_clusters: int = 0) -> int:
        """HBM footprint of the cluster cache (independent of N)."""
        c = cache_clusters or self.CACHE_CLUSTERS
        if self.ivf_members is None:
            return 0
        k, s = self.ivf_members.shape
        c = min(c, k)
        d = self.dim
        return int(c * (s * (d + 8) + d * 4 + 4) + k * (d * 4 + 8))

    def cluster_cache(self, cache_clusters: int = 0):
        """Lazily build the fixed-HBM coded serving cache
        (ops/ivf_cache.ClusterCachedTable; reference: lazy block reads +
        block cache, diskann/segment.go:1151)."""
        if self._ccache is None:
            from vecgo_tpu.ops.ivf_cache import (
                ClusterCachedTable,
                LazyHostTable,
                MemHostTable,
            )

            cc = cache_clusters or self.CACHE_CLUSTERS
            if self._ivfq is not None:
                # Persisted codes already in memory (local open): zero-copy.
                host = MemHostTable(
                    dict(
                        self._ivfq,
                        rows=np.ascontiguousarray(self.ivf_members, np.int32),
                    )
                )
                self._ccache = ClusterCachedTable(host=host, cache_clusters=cc)
            elif (
                self._vectors_arr is None
                and self._lazy is not None
                and (self._lazy.has("ivfq.codes") or self._lazy.has("ivfq.pq"))
            ):
                # Cloud tier: coded blocks stream straight from the store.
                self._ccache = ClusterCachedTable(
                    host=LazyHostTable(self._lazy, self.ivf_members),
                    cache_clusters=cc,
                )
            else:
                self._ccache = ClusterCachedTable(
                    self.ivf_members,
                    np.asarray(self.vectors, np.float32),
                    cache_clusters=cc,
                )
        return self._ccache

    def release_cache(self):
        self._ccache = None

    def search_cached(self, q, k: int, mask: Optional[np.ndarray] = None,
                      ef: int = 0, n_probe: int = 0):
        """Beyond-HBM two-stage stage 1: probe all centroids on device, scan
        only the cached cluster blocks (misses upload on demand). Returns
        (dists [B,k], rows [B,k]) with coded distances — callers rerank
        exactly via rerank_host. No graph refinement (the cache holds only
        probed clusters, so neighbor gathers outside it are impossible);
        the wider probe default compensates."""
        import jax.numpy as jnp

        from vecgo_tpu.ops import beam as beam_ops

        b = q.shape[0]
        if self.n == 0 or self.ivf_members is None:
            return (
                jnp.full((b, k), jnp.inf, jnp.float32),
                jnp.full((b, k), -1, jnp.int32),
            )
        cc = self.cluster_cache()
        ef = max(ef or max(self.DEFAULT_EF_SEARCH, k), k)
        if n_probe <= 0:
            n_probe = int(min(cc.k, max(16, (ef + 15) // 16 * 4)))
        kk = max(8, min(16, -(-2 * ef // max(n_probe, 1))))
        pool = max(ef, k)
        if getattr(cc.host, "kind", "sq8") == "pq":
            # PQ transport is coarser than SQ8 (~4x the residual error at
            # m=d/4): widen the scan pool AND the dedup cut so true
            # neighbors survive the coded ordering — the exact host rerank
            # repairs the final order (measured 0.84 -> 1.0 at 6k).
            kk *= 4
            pool = max(pool, 2 * k, 2 * ef)
        kk = min(kk, self.ivf_members.shape[1])
        sd, srows = cc.probe_and_scan(q, n_probe, kk, row_mask=mask)
        cd, crows = beam_ops._dedup_topk(sd, srows, pool)
        cd = cd[:, :k] if cd.shape[1] > k else cd
        crows = crows[:, :k] if crows.shape[1] > k else crows
        return cd, jnp.where(jnp.isfinite(cd), crows, -1)

    def stream_state(self, transport: str = "sq8"):
        """Host-resident coded transport + scorer for beyond-HBM STREAMING
        search: transport="sq8" uploads 1 byte/dim instead of 4 (the
        reference's "beyond-RAM via compression" axis, README.md quantization
        table; VERDICT r2 weak #8); "pq" uploads d/2 bytes/row (~1.9x less
        again — callers pool >=128 and exact-rerank downstream, which
        engine/search.py does)."""
        if self._stream is None:
            self._stream = {}
        if transport not in self._stream:
            mk = (
                common.pq_stream_state
                if transport == "pq"
                else common.sq8_stream_state
            )
            self._stream[transport] = mk(self.vectors, self.metric.compute())
        return self._stream[transport]

    def search(
        self,
        q,  # jnp [B, d] (normalized upstream for cosine)
        k: int,
        mask: Optional[np.ndarray] = None,
        ef: int = 0,
        beam_width: int = 4,
        n_probe: int = 0,  # 0 = auto; IVF shortlist width (two-stage path)
        # Graph expansion rounds after the shortlist. Default 1: the engine
        # depends on refinement to rescue rows outside the probe set
        # (serve_compact's one-slot-per-row tables especially). At 1M the
        # probe widths alone clear the recall floor (0.9611@p=6) and one
        # round costs ~2x the scan in beam gathers — serving pipelines that
        # measure this pass refine_steps=0 explicitly (bench.py).
        refine_steps: int = 1,
        rescore: Optional[bool] = None,  # None = only when refining
        # Per-cluster query capacity as a multiple of the batch average
        # (0 = ivf_scan's 3x auto). Tighter qcaps cut the grouped-scan cost
        # linearly at the price of probe drops — the dominant serving knob
        # (docs/PERF.md round-2 ablation; bench serves qf=1.5).
        qcap_factor: float = 0.0,
    ):
        """Returns (dists [B,k], rows [B,k]).

        Two-stage when the segment carries an IVF serving table (the default
        for segments built by VamanaWriter): blocked IVF shortlist
        (ops/ivf.ivf_scan — sublinear, zero gathers) seeds a short lockstep
        graph refinement (ops/beam.beam_search with per-query entries), which
        repairs cluster-boundary misses. Legacy segments without the table
        run the full beam search from IVF-guided entry nodes.

        Note: search returns bf16-precision distances; callers should rerank
        (Segment.rerank) for exact scores. For DOT/COSINE the graph was built
        on L2 geometry over (normalized) vectors — standard practice; for
        normalized vectors L2 and cosine orders agree. DOT queries search with
        L2 traversal then rerank by the true metric over a widened pool.
        """
        import jax
        import jax.numpy as jnp

        from vecgo_tpu.ops import beam as beam_ops

        b = q.shape[0]
        if self.n == 0:
            return (
                jnp.full((b, k), jnp.inf, jnp.float32),
                jnp.full((b, k), -1, jnp.int32),
            )
        ef = ef or max(self.DEFAULT_EF_SEARCH, k)
        ef = max(ef, k)
        dev = self.device_state()
        dmask = jnp.asarray(mask) if mask is not None else None

        if "ivfq" in dev:
            from vecgo_tpu.ops import ivf as ivf_ops

            table = dev["ivfq"]
            kt = table.bnorm2.shape[0]
            if n_probe <= 0:
                # Auto: enough probes that the shortlist pool comfortably
                # covers ef; floor 8, cap 32 (probe cost is linear). Compact
                # tables lose the boundary secondaries -> double the probes.
                n_probe = int(min(kt, max(8, min(32, (ef + 15) // 16 * 4))))
                if self.serve_compact:
                    n_probe = int(min(kt, 2 * n_probe))
            # Per-(query, cluster) winners: ~2*ef/n_probe covers the pool
            # width; the in-cluster top-k is a major scan cost (linear in kk).
            kk = max(8, min(16, -(-2 * ef // max(n_probe, 1))))
            kk = min(kk, int(table.bnorm2.shape[1]))
            mflat = (
                ivf_ops.slot_mask_from_rows(table, dmask)
                if dmask is not None
                else None
            )
            qcap = 0
            if qcap_factor > 0:
                qcap = max(
                    32,
                    (int(qcap_factor * b * n_probe / max(kt, 1)) + 31)
                    // 32 * 32,
                )
                qcap = min(qcap, b)
            sd, srows = ivf_ops.ivf_scan(
                q, table, n_probe=n_probe, kk=kk, mask_flat=mflat, qcap=qcap
            )
            cd, crows = beam_ops._dedup_topk(sd, srows, ef)
            if refine_steps > 0:
                # Graph refinement widens the pool at ef width, scoring the
                # SQ8 codes (the k-cut happens only AFTER the rescore below).
                qc = jnp.einsum(
                    "bd,kd->bk", q.astype(jnp.float32), table.centroids
                )
                _, pool_rows = beam_ops.beam_search_coded(
                    q,
                    table,
                    dev["graph"],
                    jnp.where(jnp.isfinite(cd), crows, -1),
                    qc,
                    ef=ef,
                    k=ef,
                    beam_width=beam_width,
                    max_steps=refine_steps,
                    mask=dmask,
                )
            else:
                pool_rows = jnp.where(jnp.isfinite(cd), crows, -1)
            if rescore is None:
                # Default ON: callers (the engine) cut the returned window to
                # k, so the ef-pool must be ordered by decoded-f32 distances
                # before truncation — bf16 scan ordering alone loses ~2-3/10
                # neighbors at small dim / wide clusters (serve_compact test).
                # Serving pipelines that measure the opposite at scale (1M x
                # 128d: 0.9611 without vs 0.9587 with, rescore ~25% of query
                # time) opt out explicitly with rescore=False (bench.py).
                rescore = True
            if not rescore and refine_steps == 0:
                res_d = cd[:, :k]
                res_i = jnp.where(jnp.isfinite(res_d), crows[:, :k], -1)
                return res_d, res_i
            # f32 rescore of the decoded pool, then cut to k. (Distances are
            # vs x̂; engine-level exact-on-x rerank of the final window runs
            # host-side via rerank_host when required.)
            rd = self.rerank(q, pool_rows)
            sd2, si2 = jax.lax.sort(
                (rd, pool_rows.astype(jnp.int32)), num_keys=1
            )
            res_d = sd2[:, :k]
            res_i = jnp.where(jnp.isfinite(res_d), si2[:, :k], -1)
            return res_d, res_i

        entry = dev["entry"]
        max_steps = 0
        if "entry_centroids" in dev:
            # IVF-guided entries: start each query at the entry nodes of its
            # nearest centroids (+ global medoid); the search list converges in
            # far fewer steps than a medoid-only walk on clustered corpora.
            from vecgo_tpu.ops import distance as D
            from vecgo_tpu.ops import topk as T

            n_probe = min(4, dev["entry_centroids"].shape[0])
            cd = D.squared_l2(
                q, dev["entry_centroids"], compute_dtype=jnp.bfloat16
            )
            _, probes = T.topk_smallest(cd, n_probe)
            per_q = jnp.take(dev["entry_nodes"], probes)  # [B, n_probe]
            entry = jnp.concatenate(
                [per_q, jnp.broadcast_to(dev["entry"][None, :], (b, 1))], axis=1
            )
            max_steps = ef // max(beam_width, 1) + 12
        res_d, res_i = beam_ops.beam_search(
            q,
            dev["trav"],
            dev["rnorm2"],
            dev["graph"],
            entry,
            ef=ef,
            k=k,
            beam_width=beam_width,
            max_steps=max_steps,
            mask=dmask,
        )
        return res_d, res_i

    def masked_scan(self, q, k: int, mask=None, block_rows: int = 65536):
        """Low-selectivity brute force over the CODED slot space (the
        planner's <30%-selectivity strategy for graph segments; reference:
        cursor_search.go streaming brute force). Scores every live slot's
        SQ8 code blockwise — no full-precision residency needed."""
        import jax.numpy as jnp

        from vecgo_tpu.ops import beam as beam_ops
        from vecgo_tpu.ops import ivf as ivf_ops
        from vecgo_tpu.ops import topk as topk_ops

        dev = self.device_state()
        table = dev["ivfq"]
        k_pad, s, d = table.codes.shape
        flat = dev.get("ivfq_flat")
        if flat is None:
            cluster = jnp.repeat(
                jnp.arange(k_pad, dtype=jnp.int32), s
            )
            flat = {
                "codes": table.codes.reshape(k_pad * s, d),
                "scale_slot": jnp.take(table.scale, cluster),
                "xnorm2": table.xnorm2.reshape(-1),
                "cluster": cluster,
            }
            dev["ivfq_flat"] = flat
        qf = q.astype(jnp.float32)
        qc = jnp.einsum("bd,kd->bk", qf, table.centroids)
        qn = jnp.sum(qf * qf, axis=-1, keepdims=True)

        score_fn = self._scan_score_fn
        if score_fn is None:
            # One closure per segment: score_fn identity keys the jit cache.
            def score_fn(qq, extra, blk):
                prod = jnp.einsum(
                    "bd,rd->br",
                    qq.astype(jnp.bfloat16), blk["codes"].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
                qcv = jnp.take(extra["qc"], blk["cluster"], axis=1)  # [B, rows]
                return (
                    extra["qn"] + blk["xnorm2"][None, :]
                    - 2.0 * (qcv + blk["scale_slot"][None, :] * prod)
                )

            self._scan_score_fn = score_fn

        mflat = (
            ivf_ops.slot_mask_from_rows(table, jnp.asarray(mask)).reshape(-1)
            if mask is not None
            else jnp.isfinite(flat["xnorm2"])  # live slots only
        )
        # Overlap memberships can surface a row twice -> widen, dedup, cut.
        dd, slots = topk_ops.blockwise_topk_scored(
            q, flat, k_pad * s, min(2 * k, k_pad * s), score_fn,
            mask=mflat, extra={"qc": qc, "qn": qn}, block_rows=block_rows,
        )
        rows = jnp.where(
            slots >= 0,
            jnp.take(table.rows.reshape(-1), jnp.maximum(slots, 0)),
            -1,
        )
        dd, rows = beam_ops._dedup_topk(
            jnp.where(rows >= 0, dd, jnp.inf), rows, k
        )
        return dd, rows

    def rerank(self, q, rows):
        """Distances for candidate rows [B, C]. Coded segments rescore the
        DECODED vectors x̂ in f32 (ranking error = SQ8 residual step, far
        below bf16-on-raw); legacy segments score the f32 copy exactly. The
        exact-on-x host rerank is rerank_host (beyond-HBM + final windows)."""
        import jax
        import jax.numpy as jnp

        dev = self.device_state()
        if "ivfq" in dev and dev["ivfq"].rcodes is not None:
            # Refinement plane: decode at int16 precision (one [B, C] gather
            # of 2 B/dim rows, direct row index — no slot indirection for the
            # codes). Ranking error = scale/516 per coordinate, far below the
            # pool's tie gaps: the rescore recovers the exact-rerank recall
            # (probe_coded_recall2: 0.999 vs the int8 plateau 0.977).
            if self._rerank_fn is None:
                metric = self.metric.compute()
                from vecgo_tpu.ops.ivf import RSCALE_RATIO

                def _rrq16(q, rows, rcodes, scale, slot_of_row, cents, *, s):
                    b, c = rows.shape
                    safe = jnp.maximum(rows, 0)
                    cl = jnp.take(slot_of_row, safe) // s  # [B, C]
                    cv = jnp.take(rcodes, safe.reshape(-1), axis=0).reshape(
                        b, c, -1
                    ).astype(jnp.float32)
                    rs = jnp.take(scale, cl) * RSCALE_RATIO
                    xhat = (
                        jnp.take(cents, cl.reshape(-1), axis=0).reshape(
                            b, c, -1
                        )
                        + cv * rs[:, :, None]
                    )
                    qf = q.astype(jnp.float32)
                    if metric == Metric.COSINE:
                        from vecgo_tpu.ops import distance as D

                        qf = D.normalize(qf)
                    prod = jnp.einsum(
                        "bcd,bd->bc", xhat, qf,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    if metric == Metric.L2:
                        dd = jnp.maximum(
                            jnp.sum(qf * qf, -1, keepdims=True)
                            + jnp.sum(xhat * xhat, -1)
                            - 2.0 * prod,
                            0.0,
                        )
                    elif metric == Metric.DOT:
                        dd = -prod
                    else:
                        dd = 1.0 - prod
                    return jnp.where(rows >= 0, dd, jnp.inf)

                self._rerank_fn = jax.jit(_rrq16, static_argnames=("s",))
            t = dev["ivfq"]
            return self._rerank_fn(
                q, rows, t.rcodes, t.scale, t.slot_of_row, t.centroids,
                s=int(t.rows.shape[1]),
            )
        if "ivfq" in dev:
            if self._rerank_fn is None:
                metric = self.metric.compute()

                def _rrq(q, rows, codes, scale, xnorm2, slot_of_row, cents):
                    k_pad, s, d = codes.shape
                    b, c = rows.shape
                    safe = jnp.maximum(rows, 0)
                    slot = jnp.take(slot_of_row, safe)  # [B, C]
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
                    if metric == Metric.COSINE:
                        from vecgo_tpu.ops import distance as D

                        qf = D.normalize(qf)
                    prod = jnp.einsum(
                        "bcd,bd->bc", xhat, qf,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    if metric == Metric.L2:
                        dd = jnp.maximum(
                            jnp.sum(qf * qf, -1, keepdims=True)
                            + jnp.take(xnorm2.reshape(-1), slot)
                            - 2.0 * prod,
                            0.0,
                        )
                    elif metric == Metric.DOT:
                        dd = -prod
                    else:
                        dd = 1.0 - prod
                    return jnp.where(rows >= 0, dd, jnp.inf)

                self._rerank_fn = jax.jit(_rrq)
            t = dev["ivfq"]
            return self._rerank_fn(
                q, rows, t.codes, t.scale, t.xnorm2, t.slot_of_row, t.centroids
            )
        if self._rerank_fn is None:
            metric = self.metric.compute()

            def _rr(q, rows, full, rn):
                safe = jnp.maximum(rows, 0)
                v = jnp.take(full, safe, axis=0)
                qf = q.astype(jnp.float32)
                if metric == Metric.COSINE:
                    from vecgo_tpu.ops import distance as D

                    qf = D.normalize(qf)
                prod = jnp.einsum(
                    "bcd,bd->bc", v, qf, precision=jax.lax.Precision.HIGHEST
                )
                if metric == Metric.L2:
                    d = jnp.maximum(
                        jnp.sum(qf * qf, -1, keepdims=True)
                        + jnp.take(rn, safe)
                        - 2.0 * prod,
                        0.0,
                    )
                elif metric == Metric.DOT:
                    d = -prod
                else:
                    d = 1.0 - prod
                return jnp.where(rows >= 0, d, jnp.inf)

            self._rerank_fn = jax.jit(_rr)
        return self._rerank_fn(q, rows, dev["full"], dev["rnorm2"])

    # ---- host access (same contract as FlatSegment) ----

    def filter_mask(self, f) -> np.ndarray:
        return self.cm.filter_mask(f)

    # payload() / doc() provided by common.RowBlobAccess (lazy-aware).

    def vector(self, row: int) -> np.ndarray:
        return self.vectors[row]

    def iterate(self):
        for row in range(self.n):
            yield int(self.ids[row]), self.vectors[row], self.doc(row), self.payload(row)

    def graph_stats(self) -> dict:
        """Degree/connectivity stats (reference: hnsw.Stats, stats.go:10)."""
        deg = (self.graph >= 0).sum(1)
        return {
            "nodes": self.n,
            "avg_degree": float(deg.mean()) if self.n else 0.0,
            "min_degree": int(deg.min()) if self.n else 0,
            "max_degree": int(deg.max()) if self.n else 0,
            "medoid": self.medoid,
        }
