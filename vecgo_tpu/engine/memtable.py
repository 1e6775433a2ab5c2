"""Mutable L0 memtable: columnar host buffer + chunked device brute-force search.

Reference: internal/segment/memtable (16-way sharded HNSW over an arena,
shard.go:21-34). TPU-first restructuring (SURVEY.md §7.2 stage 5): L0 never
builds a graph — brute-force matmul scan over <~100k rows is already fast on
the MXU, insert becomes an O(1) columnar append (so the reference's "deferred
insert" fast path, memtable.go:335, is simply the only path), and the sharded
locking disappears (single-writer host appends + RCU snapshots).

Storage is a columnar SLAB CHAIN (the arena analogue, internal/arena): each
bulk insert becomes its own immutable [n, d] f32 slab (one np.array copy —
no doubling-regrowth, no second touch of a shared buffer), per-row inserts
append to an amortized-doubling mutable tail that freezes into a slab when a
bulk block arrives. id/lsn columns stay contiguous (8 B/row). Bulk ingest is
allocation-bound: ~3-4M rows/s per host core at 128d.

Device caching: rows freeze into immutable device chunks of CHUNK rows; the
mutable tail uploads as a fixed-shape padded block per search (stable jit
shapes, only content changes).
"""

from __future__ import annotations

import os
import threading
from typing import List, Optional

import numpy as np

from vecgo_tpu.errors import ErrDimensionMismatch, ErrInvalidVector
from vecgo_tpu.metadata.columnar import ColumnarMeta
from vecgo_tpu.model import Metric
from vecgo_tpu.utils.hostmem import fill_arange, huge_empty, huge_empty_like

CHUNK = 8192
MIN_CAPACITY = 1024

_COPY_POOL = None
# Threaded copies pay off only with real cores to overlap page faults on;
# on small VMs (the dev tunnel box has run with nproc=1) threads just add
# scheduling overhead on top of the same memcpy.
_COPY_THREADS = min(8, os.cpu_count() or 1)


def _fast_copy(x: np.ndarray) -> np.ndarray:
    """Defensive bulk copy at memory speed: hugepage-advised np.empty target
    (utils/hostmem — first-touch page faults are the dominant cost of a big
    fresh copy; hugepages cut the fault count 512x) + parallel range copies
    (np.copyto releases the GIL) to overlap the remaining faults across
    cores. Measured ~2.8 GB/s multi-core vs ~1.2 GB/s for a single-threaded
    copy into fresh zeros (the round-2 bulk ingest bottleneck); on the
    page-fault-throttled dev VM the hugepage target is the difference
    between 11 MB/s and GB/s."""
    global _COPY_POOL
    x = np.ascontiguousarray(x, np.float32)
    if x.shape[0] < 65536:
        return x.copy()
    if _COPY_THREADS == 1:
        out = huge_empty_like(x)
        np.copyto(out, x)
        return out
    if _COPY_POOL is None:
        from concurrent.futures import ThreadPoolExecutor

        _COPY_POOL = ThreadPoolExecutor(_COPY_THREADS)
    out = huge_empty_like(x)
    step = (x.shape[0] + _COPY_THREADS - 1) // _COPY_THREADS

    def cp(i):
        np.copyto(out[i * step : (i + 1) * step], x[i * step : (i + 1) * step])

    list(_COPY_POOL.map(cp, range(_COPY_THREADS)))
    return out


def _copy_validate_range(x, out, a: int, b: int, rows_per: int) -> bool:
    """Copy rows [a, b) and finiteness-validate in the same pass; returns
    False on any NaN/Inf.

    Fast path: the native fused kernel (utils/hostops.cpp) — an integer
    exponent-bit test folded into the copy loop, so validation is free at
    memcpy speed and the GIL is released for the whole range. Fallback:
    chunked numpy copyto + min/max while the chunk is still cache-hot."""
    try:
        from vecgo_tpu.utils import hostops

        if hostops.available():
            return hostops.copy_validate_range(x, out, a, b)
    except Exception:  # noqa: BLE001 — native layer is strictly optional
        pass
    ok = True
    for i in range(a, b, rows_per):
        j = min(b, i + rows_per)
        np.copyto(out[i:j], x[i:j])
        c = out[i:j]
        lo, hi = c.min(), c.max()
        # NaN fails both comparisons; +/-Inf fails one (min/max propagate
        # NaN and saturate at the infinities — see hostmem.all_finite).
        if not (lo > -np.inf and hi < np.inf and lo == lo):
            ok = False
    return ok


def copy_validate(x: np.ndarray) -> np.ndarray:
    """_fast_copy with finiteness validation fused into the copy.

    all_finite as a separate pass re-reads the whole batch from RAM (measured
    ~100 ms of a 320 ms bulk insert at 1M x 128); here each ~2 MB chunk is
    validated right after it is written, while it still lives in cache, so
    validation adds ~zero RAM traffic. Raises ErrInvalidVector on NaN/Inf."""
    global _COPY_POOL
    x = np.ascontiguousarray(x, np.float32)
    n = x.shape[0]
    out = huge_empty_like(x) if n >= 65536 else np.empty_like(x)
    if n == 0:
        return out
    rows_per = max(1, (4 << 20) // max(1, x.shape[1] * 4))
    if _COPY_THREADS == 1 or n < 65536:
        ok = _copy_validate_range(x, out, 0, n, rows_per)
    else:
        if _COPY_POOL is None:
            from concurrent.futures import ThreadPoolExecutor

            _COPY_POOL = ThreadPoolExecutor(_COPY_THREADS)
        step = (n + _COPY_THREADS - 1) // _COPY_THREADS
        ok = all(
            _COPY_POOL.map(
                lambda i: _copy_validate_range(
                    x, out, i * step, min(n, (i + 1) * step), rows_per
                ),
                range(_COPY_THREADS),
            )
        )
    if not ok:
        raise ErrInvalidVector("batch contains NaN/Inf")
    return out


class MemTable:
    def __init__(self, dim: int, metric: Metric):
        self.dim = dim
        self.metric = metric
        self._n = 0
        self._cap = 0
        # Vector slab chain: frozen slabs + mutable tail (see module doc).
        self._slabs: List[np.ndarray] = []
        self._slab_ends = np.zeros(0, np.int64)  # cumulative end row per slab
        self._tail = np.zeros((0, dim), np.float32)
        self._tail_start = 0  # global row index of tail row 0
        self._ids = np.zeros(0, np.int64)
        self._lsns = np.zeros(0, np.int64)
        self.docs: List[Optional[dict]] = []
        self.payloads: List[Optional[bytes]] = []
        self.del_rows: List[int] = []
        self.del_lsns: List[int] = []
        self._version = 0
        self._cm_cache = None  # (version, ColumnarMeta)
        self._chunks: List = []  # frozen device chunks [(vec, rnorm2)]
        self._frozen_rows = 0
        self._lock = threading.Lock()

    def __len__(self):
        return self._n

    @property
    def row_count(self) -> int:
        return self._n

    # Array views (engine flush path reads these).
    @property
    def ids(self) -> np.ndarray:
        return self._ids[: self._n]

    @property
    def lsns(self) -> np.ndarray:
        return self._lsns[: self._n]

    def _ensure(self, need: int):
        """Grow the contiguous id/lsn columns (8 B/row — cheap to regrow)."""
        if need <= self._cap:
            return
        cap = max(MIN_CAPACITY, 1 << int(need - 1).bit_length())
        ids = huge_empty(cap, np.int64)
        ids[: self._n] = self._ids[: self._n]
        ids[self._n :] = 0
        self._ids = ids
        lsns = huge_empty(cap, np.int64)
        lsns[: self._n] = self._lsns[: self._n]
        lsns[self._n :] = 0
        self._lsns = lsns
        self._cap = cap

    def _ensure_tail(self, need_rows: int):
        """Grow the mutable tail slab (amortized doubling)."""
        if need_rows <= self._tail.shape[0]:
            return
        cap = max(MIN_CAPACITY, 1 << int(need_rows - 1).bit_length())
        t = np.zeros((cap, self.dim), np.float32)
        used = self._n - self._tail_start
        t[:used] = self._tail[:used]
        self._tail = t

    def _freeze_tail(self):
        """Seal the mutable tail into a frozen slab (bulk insert arriving)."""
        used = self._n - self._tail_start
        if used:
            self._slabs.append(self._tail[:used])
            self._slab_ends = np.append(self._slab_ends, self._n)
        self._tail = np.zeros((0, self.dim), np.float32)
        self._tail_start = self._n

    def _append_slab(self, slab: np.ndarray):
        self._slabs.append(slab)
        self._n += slab.shape[0]
        self._slab_ends = np.append(self._slab_ends, self._n)
        self._tail_start = self._n

    def rows_view(self, s: int, e: int) -> np.ndarray:
        """Contiguous [e-s, d] view/copy of global rows [s, e). A view when
        the range falls inside one slab (the common case: bulk slabs are
        large and CHUNK-sized reads rarely straddle)."""
        if e <= s:
            return np.zeros((0, self.dim), np.float32)
        parts = []
        pos = s
        while pos < e:
            si = int(np.searchsorted(self._slab_ends, pos, side="right"))
            if si < len(self._slabs):
                start = 0 if si == 0 else int(self._slab_ends[si - 1])
                stop = int(self._slab_ends[si])
                src = self._slabs[si]
            else:
                start = self._tail_start
                stop = self._n
                src = self._tail
            take = min(e, stop) - pos
            parts.append(src[pos - start : pos - start + take])
            pos += take
        return parts[0] if len(parts) == 1 else np.concatenate(parts)

    def _gather(self, rows: np.ndarray) -> np.ndarray:
        """Vectorized multi-slab row gather (flush export)."""
        from vecgo_tpu.utils import hostmem

        rows = np.asarray(rows, np.int64)
        # Bulk-load fast path: one slab holds every requested row in order —
        # hand the slab slice back without a 512 MB gather copy (the engine
        # flush discards the memtable right after, and IVF reorder replaces
        # the array anyway).
        # (rows is strictly increasing, so length == slab span + last == n-1
        # implies rows == arange(n) entirely inside slab 0.)
        if (
            len(self._slabs) == 1
            and len(rows)
            and len(rows) == int(self._slab_ends[0])
            and rows[0] == 0
            and rows[-1] == len(rows) - 1
        ):
            return self._slabs[0][: len(rows)]
        out = hostmem.huge_empty((len(rows), self.dim), np.float32)
        si_of = np.searchsorted(self._slab_ends, rows, side="right")
        for si in np.unique(si_of):
            m = si_of == si
            if si < len(self._slabs):
                start = 0 if si == 0 else int(self._slab_ends[si - 1])
                src = self._slabs[int(si)]
            else:
                start = self._tail_start
                src = self._tail
            out[m] = src[rows[m] - start]
        return out

    def insert(self, vector, id: int, lsn: int, metadata=None, payload=None) -> int:
        """Append a row; returns its memtable row index."""
        v = np.asarray(vector, np.float32).reshape(-1)
        if v.shape[0] != self.dim:
            raise ErrDimensionMismatch(f"got {v.shape[0]}, want {self.dim}")
        if not np.isfinite(v).all():
            raise ErrInvalidVector("vector contains NaN/Inf")
        if self.metric == Metric.COSINE:
            v = v / max(float(np.linalg.norm(v)), 1e-30)
        with self._lock:
            row = self._n
            self._ensure(row + 1)
            self._ensure_tail(row - self._tail_start + 1)
            self._tail[row - self._tail_start] = v
            self._ids[row] = int(id)
            self._lsns[row] = int(lsn)
            self.docs.append(metadata)
            self.payloads.append(payload)
            self._n += 1
            self._version += 1
            return row

    def insert_block(
        self,
        vectors: np.ndarray,  # [n, d] f32, already validated by the engine
        id0: int,
        lsn0: int,
        metadatas=None,
        payloads=None,
        ids: Optional[np.ndarray] = None,  # explicit ids (else id0 + arange)
        precopied: bool = False,  # caller already owns `vectors` (copy_validate)
    ) -> int:
        """Bulk append with consecutive LSNs; returns the first row index.

        The engine's deferred-style ingest path (reference:
        BatchInsertDeferred engine.go:1066) — one slab write, no per-row work.
        """
        n = vectors.shape[0]
        if self.metric == Metric.COSINE:
            # Normalization materializes a fresh array — adopt it as the slab.
            vectors = vectors / np.maximum(
                np.linalg.norm(vectors, axis=1, keepdims=True), 1e-30
            )
        elif not precopied:
            # One defensive copy (caller may mutate its buffer); becomes the
            # slab as-is — no doubling-regrowth, no second touch.
            vectors = _fast_copy(vectors)
        with self._lock:
            row0 = self._n
            self._ensure(row0 + n)
            self._freeze_tail()
            self._append_slab(vectors)
            if ids is not None:
                self._ids[row0 : row0 + n] = ids
            else:
                fill_arange(self._ids[row0 : row0 + n], id0)
            fill_arange(self._lsns[row0 : row0 + n], lsn0)
            if metadatas is None:
                self.docs.extend([None] * n)
            else:
                self.docs.extend(metadatas)
            if payloads is None:
                self.payloads.extend([None] * n)
            else:
                self.payloads.extend(payloads)
            # _append_slab already advanced _n by n.
            self._version += 1
            return row0

    def mark_deleted(self, row: int, lsn: int) -> None:
        with self._lock:
            self.del_rows.append(row)
            self.del_lsns.append(lsn)
            self._version += 1

    def deleted_mask(self, n: int, snapshot_lsn: Optional[int] = None) -> Optional[np.ndarray]:
        if not self.del_rows:
            return None
        rows = np.asarray(self.del_rows)
        lsns = np.asarray(self.del_lsns)
        sel = rows < n
        if snapshot_lsn is not None:
            sel &= lsns <= snapshot_lsn
        if not sel.any():
            return None
        mask = np.zeros(n, bool)
        mask[rows[sel]] = True
        return mask

    # ---------------- filtering ----------------

    def columnar(self, n: Optional[int] = None) -> ColumnarMeta:
        n = self._n if n is None else n
        if self._cm_cache is not None and self._cm_cache[0] == (self._version, n):
            return self._cm_cache[1]
        cm = ColumnarMeta.from_docs(self.docs[:n])
        self._cm_cache = ((self._version, n), cm)
        return cm

    def filter_mask(self, f, n: Optional[int] = None) -> np.ndarray:
        return self.columnar(n).filter_mask(f)

    # ---------------- device search ----------------

    def release_device(self):
        """Drop frozen device chunks (poisoned-backend containment: after a
        backend teardown their handles are dead). They re-upload lazily via
        _sync_chunks on the next search."""
        with self._lock:
            self._chunks = []
            self._frozen_rows = 0

    def _sync_chunks(self):
        import jax.numpy as jnp

        while self._frozen_rows + CHUNK <= self._n:
            s = self._frozen_rows
            block = self.rows_view(s, s + CHUNK)
            vec = jnp.asarray(block)
            rn = jnp.asarray(
                np.einsum("nd,nd->n", block, block, dtype=np.float64).astype(np.float32)
            )
            self._chunks.append((vec, rn))
            self._frozen_rows += CHUNK

    def search(
        self,
        q,  # jnp [B, d] (normalized upstream for cosine)
        k: int,
        n_visible: int,
        mask: Optional[np.ndarray] = None,  # host bool [n_visible]
    ):
        """Brute-force top-k over rows [0, n_visible). Returns (d, rows) device."""
        import jax.numpy as jnp

        from vecgo_tpu.ops import topk as T

        b = q.shape[0]
        out_d = jnp.full((b, k), jnp.inf, jnp.float32)
        out_i = jnp.full((b, k), -1, jnp.int32)
        if n_visible == 0:
            return out_d, out_i
        self._sync_chunks()
        n_frozen = min(self._frozen_rows, n_visible)
        for ci in range(0, (n_frozen + CHUNK - 1) // CHUNK):
            s = ci * CHUNK
            e = min(s + CHUNK, n_frozen)
            vec, rn = self._chunks[ci]
            cmask = None
            if mask is not None or e - s < CHUNK:
                m = np.ones(CHUNK, bool)
                if e - s < CHUNK:
                    m[e - s :] = False
                if mask is not None:
                    m[: e - s] &= mask[s:e]
                cmask = jnp.asarray(m)
            d, i = T.blockwise_topk_search(
                q, vec, k, metric=self.metric.compute(), x_norms_sq=rn, mask=cmask,
                block_rows=CHUNK, x_normalized=True,
            )
            out_d, out_i = T.merge_topk(out_d, out_i, d, i + s, k)

        # Mutable tail: fixed-shape padded upload.
        tail_s = n_frozen
        if n_visible > tail_s:
            tail_n = n_visible - tail_s
            pad_to = ((tail_n + CHUNK - 1) // CHUNK) * CHUNK
            tail = np.zeros((pad_to, self.dim), np.float32)
            tail[:tail_n] = self.rows_view(tail_s, n_visible)
            m = np.zeros(pad_to, bool)
            m[:tail_n] = True if mask is None else mask[tail_s:n_visible]
            d, i = T.blockwise_topk_search(
                q,
                jnp.asarray(tail),
                k,
                metric=self.metric.compute(),
                mask=jnp.asarray(m),
                block_rows=CHUNK,
                x_normalized=True,
            )
            out_d, out_i = T.merge_topk(out_d, out_i, d, i + tail_s, k)
        out_i = jnp.where(jnp.isfinite(out_d), out_i, -1)
        return out_d, out_i

    # ---------------- host access ----------------

    def vector(self, row: int) -> np.ndarray:
        return self.rows_view(row, row + 1)[0]

    def doc(self, row: int) -> Optional[dict]:
        return self.docs[row]

    def payload(self, row: int) -> Optional[bytes]:
        return self.payloads[row]

    def iterate(self, n: Optional[int] = None, skip_deleted_lsn: Optional[int] = None):
        """Yield (row, id, vector, doc, payload), optionally skipping rows
        deleted at lsn <= skip_deleted_lsn."""
        n = self._n if n is None else n
        dead = (
            self.deleted_mask(n, skip_deleted_lsn)
            if skip_deleted_lsn is not None
            else self.deleted_mask(n)
        )
        for row in range(n):
            if dead is not None and dead[row]:
                continue
            yield row, int(self._ids[row]), self.vector(row), self.docs[row], self.payloads[row]

    def export_live(self):
        """Vectorized flush export: (rows [m], vectors [m,d], ids [m],
        lsns [m], docs list, payloads list) for all non-deleted rows."""
        n = self._n
        dead = self.deleted_mask(n)
        if dead is None:
            rows = np.arange(n)
            docs = self.docs[:n]
            pays = self.payloads[:n]
        else:
            rows = np.flatnonzero(~dead)
            docs = [self.docs[r] for r in rows]
            pays = [self.payloads[r] for r in rows]
        return rows, self._gather(rows), self._ids[rows], self._lsns[rows], docs, pays

    def memory_bytes(self) -> int:
        return self._n * (self.dim * 4 + 64)
