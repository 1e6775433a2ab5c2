"""Mutable L0 memtable: host append buffer + chunked device brute-force search.

Reference: internal/segment/memtable (16-way sharded HNSW over an arena,
shard.go:21-34). TPU-first restructuring (SURVEY.md §7.2 stage 5): L0 never
builds a graph — brute-force matmul scan over <~100k rows is already fast on
the MXU, insert becomes an O(1) host append (so the reference's "deferred
insert" fast path, memtable.go:335, is simply the only path), and the sharded
locking disappears (single-writer host appends + RCU snapshots).

Device caching: rows freeze into immutable device chunks of CHUNK rows; the
mutable tail uploads as a fixed-shape padded block per search (stable jit
shapes, only content changes).
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional

import numpy as np

from vecgo_tpu.errors import ErrDimensionMismatch, ErrInvalidVector
from vecgo_tpu.metadata.columnar import ColumnarMeta
from vecgo_tpu.model import Metric

CHUNK = 8192


class MemTable:
    def __init__(self, dim: int, metric: Metric):
        self.dim = dim
        self.metric = metric
        self.vectors: List[np.ndarray] = []
        self.ids: List[int] = []
        self.lsns: List[int] = []
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
        return len(self.ids)

    @property
    def row_count(self) -> int:
        return len(self.ids)

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
            row = len(self.ids)
            self.vectors.append(v)
            self.ids.append(int(id))
            self.lsns.append(int(lsn))
            self.docs.append(metadata)
            self.payloads.append(payload)
            self._version += 1
            return row

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
        n = len(self.ids) if n is None else n
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

        while self._frozen_rows + CHUNK <= len(self.ids):
            s = self._frozen_rows
            block = np.stack(self.vectors[s : s + CHUNK])
            vec = jnp.asarray(block)
            rn = jnp.asarray(np.einsum("nd,nd->n", block, block, dtype=np.float64).astype(np.float32))
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
                q, vec, k, metric=self.metric, x_norms_sq=rn, mask=cmask,
                block_rows=CHUNK, x_normalized=True,
            )
            out_d, out_i = T.merge_topk(out_d, out_i, d, i + s, k)

        # Mutable tail: fixed-shape padded upload.
        tail_s = n_frozen
        if n_visible > tail_s:
            tail_n = n_visible - tail_s
            pad_to = ((tail_n + CHUNK - 1) // CHUNK) * CHUNK
            tail = np.zeros((pad_to, self.dim), np.float32)
            tail[:tail_n] = np.stack(self.vectors[tail_s:n_visible])
            m = np.zeros(pad_to, bool)
            m[:tail_n] = True if mask is None else mask[tail_s:n_visible]
            d, i = T.blockwise_topk_search(
                q,
                jnp.asarray(tail),
                k,
                metric=self.metric,
                mask=jnp.asarray(m),
                block_rows=CHUNK,
                x_normalized=True,
            )
            out_d, out_i = T.merge_topk(out_d, out_i, d, i + tail_s, k)
        out_i = jnp.where(jnp.isfinite(out_d), out_i, -1)
        return out_d, out_i

    # ---------------- host access ----------------

    def vector(self, row: int) -> np.ndarray:
        return self.vectors[row]

    def doc(self, row: int) -> Optional[dict]:
        return self.docs[row]

    def payload(self, row: int) -> Optional[bytes]:
        return self.payloads[row]

    def iterate(self, n: Optional[int] = None, skip_deleted_lsn: Optional[int] = None):
        """Yield (row, id, vector, doc, payload), optionally skipping rows
        deleted at lsn <= skip_deleted_lsn."""
        n = len(self.ids) if n is None else n
        dead = (
            self.deleted_mask(n, skip_deleted_lsn)
            if skip_deleted_lsn is not None
            else self.deleted_mask(n)
        )
        for row in range(n):
            if dead is not None and dead[row]:
                continue
            yield row, self.ids[row], self.vectors[row], self.docs[row], self.payloads[row]

    def memory_bytes(self) -> int:
        return len(self.ids) * (self.dim * 4 + 64)
