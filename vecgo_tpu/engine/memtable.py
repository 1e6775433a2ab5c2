"""Mutable L0 memtable: columnar host buffer + chunked device brute-force search.

Reference: internal/segment/memtable (16-way sharded HNSW over an arena,
shard.go:21-34). TPU-first restructuring (SURVEY.md §7.2 stage 5): L0 never
builds a graph — brute-force matmul scan over <~100k rows is already fast on
the MXU, insert becomes an O(1) columnar append (so the reference's "deferred
insert" fast path, memtable.go:335, is simply the only path), and the sharded
locking disappears (single-writer host appends + RCU snapshots).

Storage is columnar with amortized-doubling capacity (the arena analogue,
internal/arena): one [cap, d] f32 slab + id/lsn arrays + doc/payload lists.
Bulk inserts write whole slabs — the engine's deferred-style ingest runs at
millions of rows/s on a single host core.

Device caching: rows freeze into immutable device chunks of CHUNK rows; the
mutable tail uploads as a fixed-shape padded block per search (stable jit
shapes, only content changes).
"""

from __future__ import annotations

import threading
from typing import List, Optional

import numpy as np

from vecgo_tpu.errors import ErrDimensionMismatch, ErrInvalidVector
from vecgo_tpu.metadata.columnar import ColumnarMeta
from vecgo_tpu.model import Metric

CHUNK = 8192
MIN_CAPACITY = 1024


class MemTable:
    def __init__(self, dim: int, metric: Metric):
        self.dim = dim
        self.metric = metric
        self._n = 0
        self._cap = 0
        self._v = np.zeros((0, dim), np.float32)
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
        if need <= self._cap:
            return
        cap = max(MIN_CAPACITY, 1 << int(need - 1).bit_length())
        v = np.zeros((cap, self.dim), np.float32)
        v[: self._n] = self._v[: self._n]
        self._v = v
        ids = np.zeros(cap, np.int64)
        ids[: self._n] = self._ids[: self._n]
        self._ids = ids
        lsns = np.zeros(cap, np.int64)
        lsns[: self._n] = self._lsns[: self._n]
        self._lsns = lsns
        self._cap = cap

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
            self._v[row] = v
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
    ) -> int:
        """Bulk append with consecutive LSNs; returns the first row index.

        The engine's deferred-style ingest path (reference:
        BatchInsertDeferred engine.go:1066) — one slab write, no per-row work.
        """
        n = vectors.shape[0]
        if self.metric == Metric.COSINE:
            vectors = vectors / np.maximum(
                np.linalg.norm(vectors, axis=1, keepdims=True), 1e-30
            )
        with self._lock:
            row0 = self._n
            self._ensure(row0 + n)
            self._v[row0 : row0 + n] = vectors
            self._ids[row0 : row0 + n] = (
                ids if ids is not None else np.arange(id0, id0 + n, dtype=np.int64)
            )
            self._lsns[row0 : row0 + n] = np.arange(lsn0, lsn0 + n, dtype=np.int64)
            if metadatas is None:
                self.docs.extend([None] * n)
            else:
                self.docs.extend(metadatas)
            if payloads is None:
                self.payloads.extend([None] * n)
            else:
                self.payloads.extend(payloads)
            self._n += n
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

    def _sync_chunks(self):
        import jax.numpy as jnp

        while self._frozen_rows + CHUNK <= self._n:
            s = self._frozen_rows
            block = self._v[s : s + CHUNK]
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
            tail[:tail_n] = self._v[tail_s:n_visible]
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
        return self._v[row]

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
            yield row, int(self._ids[row]), self._v[row], self.docs[row], self.payloads[row]

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
        return rows, self._v[rows], self._ids[rows], self._lsns[rows], docs, pays

    def memory_bytes(self) -> int:
        return self._n * (self.dim * 4 + 64)
