"""MVCC primary-key index: id -> LSN-versioned location chains.

Reference: internal/pk/mvcc.go:35-125 (per-entry version chains, Get(id, lsn),
Upsert, Delete, Scan) and persist.go (binary checkpoint).

Location convention: seg_id == MEMTABLE_SEG (-1) addresses the active memtable;
row is the row within the segment/memtable. A None location marks a delete.
"""

from __future__ import annotations

import threading
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

MEMTABLE_SEG = -1

# chain entry: (lsn, seg_id, row); deletes encoded as seg_id == DELETED
DELETED = -2


class PKIndex:
    """id -> ascending-LSN chain of (lsn, seg_id, row)."""

    def __init__(self):
        self._chains: Dict[int, List[Tuple[int, int, int]]] = {}
        self._lock = threading.Lock()
        # ids with >1 chain entry (updated/deleted): only these need a
        # per-candidate visibility check at search time; everything else is
        # trivially visible (single immutable version).
        self._dirty: set = set()
        self._dirty_version = 0
        self._dirty_cache = None  # (version, sorted int64 array)

    def __len__(self):
        return len(self._chains)

    def _mark_dirty(self, id: int):
        self._dirty.add(id)
        self._dirty_version += 1

    def dirty_sorted(self) -> "np.ndarray":
        """Sorted array of multi-version ids (cached) for vectorized isin."""
        with self._lock:
            cache = self._dirty_cache
            if cache is not None and cache[0] == self._dirty_version:
                return cache[1]
            arr = np.fromiter(self._dirty, np.int64, len(self._dirty))
            arr.sort()
            self._dirty_cache = (self._dirty_version, arr)
            return arr

    def upsert(self, id: int, seg_id: int, row: int, lsn: int) -> None:
        with self._lock:
            chain = self._chains.setdefault(id, [])
            chain.append((lsn, seg_id, row))
            if len(chain) > 1:
                self._mark_dirty(id)

    def delete(self, id: int, lsn: int) -> bool:
        """Record a delete; returns False if id has never existed."""
        with self._lock:
            chain = self._chains.get(id)
            if not chain:
                return False
            chain.append((lsn, DELETED, 0))
            self._mark_dirty(id)
            return True

    def get(self, id: int, snapshot_lsn: Optional[int] = None) -> Optional[Tuple[int, int]]:
        """Visible (seg_id, row) at snapshot_lsn (None = latest)."""
        chain = self._chains.get(id)
        if not chain:
            return None
        for lsn, seg, row in reversed(chain):
            if snapshot_lsn is None or lsn <= snapshot_lsn:
                if seg == DELETED:
                    return None
                return (seg, row)
        return None

    def get_entry(self, id: int, snapshot_lsn: Optional[int] = None):
        """Visible chain entry (lsn, seg_id, row) at snapshot (seg_id may be
        DELETED); None if no entry is visible."""
        chain = self._chains.get(id)
        if not chain:
            return None
        for entry in reversed(chain):
            if snapshot_lsn is None or entry[0] <= snapshot_lsn:
                return entry
        return None

    def latest_entry(self, id: int):
        chain = self._chains.get(id)
        return chain[-1] if chain else None

    def remap(self, mapping: Dict[Tuple[int, int], Tuple[int, int]]) -> None:
        """Rewrite locations after flush/compaction: {(old_seg, old_row): (new_seg,
        new_row)} (reference: engine.go:1896-1907 PK remap with CAS check)."""
        with self._lock:
            for chain in self._chains.values():
                for i, (lsn, seg, row) in enumerate(chain):
                    new = mapping.get((seg, row))
                    if new is not None:
                        chain[i] = (lsn, new[0], new[1])

    def compact_chains(self, min_lsn: int) -> None:
        """Drop chain entries superseded before min_lsn (no live snapshot older)."""
        with self._lock:
            dead = []
            for id, chain in self._chains.items():
                # Keep the last entry with lsn <= min_lsn plus everything after.
                keep_from = 0
                for i, (lsn, _, _) in enumerate(chain):
                    if lsn <= min_lsn:
                        keep_from = i
                if keep_from:
                    del chain[:keep_from]
                if len(chain) == 1:
                    if chain[0][1] == DELETED:
                        dead.append(id)
                    elif id in self._dirty:
                        self._dirty.discard(id)
                        self._dirty_version += 1
            for id in dead:
                del self._chains[id]
                self._dirty.discard(id)
            if dead:
                self._dirty_version += 1

    def scan(self, snapshot_lsn: Optional[int] = None) -> Iterator[Tuple[int, int, int]]:
        """Yield (id, seg_id, row) visible at snapshot (reference: LSN-ordered Scan)."""
        for id in list(self._chains.keys()):
            loc = self.get(id, snapshot_lsn)
            if loc is not None:
                yield id, loc[0], loc[1]

    # ---------------- checkpoint ----------------

    def checkpoint_bytes(self) -> bytes:
        """Flatten all chains to numpy arrays (reference: pk/persist.go:20-97)."""
        from vecgo_tpu.storage import container

        ids, lsns, segs, rows = [], [], [], []
        with self._lock:
            for id, chain in self._chains.items():
                for lsn, seg, row in chain:
                    ids.append(id)
                    lsns.append(lsn)
                    segs.append(seg)
                    rows.append(row)
        return container.pack_container(
            {"kind": "pk_checkpoint", "entries": len(ids)},
            {
                "ids": np.asarray(ids, np.uint64),
                "lsns": np.asarray(lsns, np.int64),
                "segs": np.asarray(segs, np.int64),
                "rows": np.asarray(rows, np.int64),
            },
        )

    @staticmethod
    def from_checkpoint(data: bytes) -> "PKIndex":
        from vecgo_tpu.storage import container

        meta, secs = container.unpack_container(data)
        pk = PKIndex()
        ids = secs["ids"]
        lsns = secs["lsns"]
        segs = secs["segs"]
        rows = secs["rows"]
        order = np.argsort(lsns, kind="stable")
        for i in order:
            pk._chains.setdefault(int(ids[i]), []).append(
                (int(lsns[i]), int(segs[i]), int(rows[i]))
            )
        pk._dirty = {id for id, c in pk._chains.items() if len(c) > 1}
        pk._dirty_version += 1
        return pk

    @staticmethod
    def rebuild(segments) -> "PKIndex":
        """Rebuild from segment id arrays after recovery without a checkpoint
        (reference: engine.go:620-712). Later segments win at equal LSN: we
        assign synthetic ascending LSNs by segment order."""
        pk = PKIndex()
        for seg in segments:
            for row in range(seg.n):
                pk._chains.setdefault(int(seg.ids[row]), []).append(
                    (0, seg.seg_id, row)
                )
        pk._dirty = {id for id, c in pk._chains.items() if len(c) > 1}
        pk._dirty_version += 1
        return pk
