"""Shared row buffering + section building for segment writers."""

from __future__ import annotations

import json
from typing import Dict, List, Optional

import numpy as np

from vecgo_tpu.errors import ErrDimensionMismatch, ErrInvalidVector
from vecgo_tpu.metadata.columnar import ColumnarMeta
from vecgo_tpu.model import Metric


class RowBuffer:
    """Accumulates (vector, id, metadata, payload) rows for a segment writer."""

    def __init__(self, dim: int):
        self.dim = dim
        self.vectors: List[np.ndarray] = []
        self.ids: List[int] = []
        self.docs: List[Optional[dict]] = []
        self.payloads: List[Optional[bytes]] = []
        self.lsns: List[int] = []

    def add(self, vector, id: int, metadata=None, payload: Optional[bytes] = None,
            lsn: int = 0):
        v = np.asarray(vector, np.float32).reshape(-1)
        if v.shape[0] != self.dim:
            raise ErrDimensionMismatch(f"got {v.shape[0]}, want {self.dim}")
        if not np.isfinite(v).all():
            raise ErrInvalidVector("vector contains NaN/Inf")
        self.vectors.append(v)
        self.ids.append(int(id))
        self.docs.append(metadata)
        self.payloads.append(payload)
        self.lsns.append(int(lsn))

    def add_batch(self, vectors, ids, metadatas=None, payloads=None, lsns=None):
        vectors = np.asarray(vectors, np.float32)
        for i in range(vectors.shape[0]):
            self.add(
                vectors[i],
                ids[i],
                metadatas[i] if metadatas is not None else None,
                payloads[i] if payloads is not None else None,
                lsns[i] if lsns is not None else 0,
            )

    def __len__(self):
        return len(self.ids)

    def stacked(self, metric: Metric):
        """Returns (x [N,d] f32 — normalized for cosine, ids [N] u64)."""
        n = len(self.ids)
        x = np.stack(self.vectors) if n else np.zeros((0, self.dim), np.float32)
        if metric == Metric.COSINE and n:
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        return x, np.asarray(self.ids, np.uint64)

    def reorder(self, order: np.ndarray):
        self.vectors = [self.vectors[i] for i in order]
        self.ids = [self.ids[i] for i in order]
        self.docs = [self.docs[i] for i in order]
        self.payloads = [self.payloads[i] for i in order]
        self.lsns = [self.lsns[i] for i in order]


def csr_bytes_sections(
    items: List[Optional[bytes]], prefix: str
) -> Dict[str, np.ndarray]:
    """Byte blobs -> CSR sections {prefix.data, prefix.indptr} (empty if all None)."""
    blob = bytearray()
    indptr = np.zeros(len(items) + 1, np.int64)
    any_data = False
    for i, p in enumerate(items):
        if p:
            blob.extend(p)
            any_data = True
        indptr[i + 1] = len(blob)
    if not any_data:
        return {}
    return {
        f"{prefix}.data": np.frombuffer(bytes(blob), np.uint8),
        f"{prefix}.indptr": indptr,
    }


def docs_sections(docs: List[Optional[dict]]) -> Dict[str, np.ndarray]:
    enc = [
        json.dumps(d, separators=(",", ":")).encode() if d is not None else None
        for d in docs
    ]
    return csr_bytes_sections(enc, "docs")


def row_sections(x: np.ndarray, ids: np.ndarray, docs, payloads, lsns=None):
    """Common sections: vectors/norms/ids/lsns/metadata columns/payloads/docs."""
    sections: Dict[str, np.ndarray] = {
        "vectors": x,
        "rnorm2": np.einsum("nd,nd->n", x, x, dtype=np.float64).astype(np.float32),
        "ids": ids,
        "lsns": np.asarray(
            lsns if lsns is not None else np.zeros(len(ids)), np.int64
        ),
    }
    cm = ColumnarMeta.from_docs(docs)
    md_meta, md_sections = cm.to_sections()
    sections.update(md_sections)
    sections.update(csr_bytes_sections(payloads, "payload"))
    sections.update(docs_sections(docs))
    return sections, md_meta, cm


def csr_lookup(data: Optional[np.ndarray], indptr: Optional[np.ndarray], row: int):
    if data is None:
        return None
    s, e = indptr[row], indptr[row + 1]
    if e <= s:
        return None
    return data[s:e].tobytes()
