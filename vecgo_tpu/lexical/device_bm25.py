"""TPU-resident BM25 serving: lexical scoring on the MXU.

Reference analogue: lexical/bm25/bm25.go serves BM25 with per-term posting
iterators (DAAT) on the CPU. The TPU-first restructuring turns the scoring
into dense linear algebra: precompute the per-(term, doc) BM25 weight
    w[t, d] = idf_t * tf * (k1+1) / (tf + k1 * (1 - b + b * len_d / avg_len))
for the HOT vocabulary (terms with document frequency >= min_df, capped at
max_hot_terms), store it as a [n_docs, H] bf16 table in HBM, and score a
whole query batch as ONE matmul sweep:

    scores[B, n_docs] = Q_indicator[B, H] @ W[n_docs, H]^T      (MXU, bf16)

followed by an exact-f32 rescore of the top pool (bf16 ranking noise is
absorbed by a pool margin, the same scan+rerank shape as the flat vector
path). Query terms OUTSIDE the hot vocabulary are by construction rare —
their postings are short — so those queries fall back to the exact host
index per query; everything else rides the device batch.

This is a SERVING SNAPSHOT: build once from a BM25Index (e.g. after commit),
rebuild on writes. `search_batch` returns the same [(id, score)] contract as
BM25Index.search_batch; rankings agree up to bf16 near-ties (the exact host
path stays the source of truth — see tests/test_lexical_device.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from vecgo_tpu.lexical.bm25 import BM25Index, tokenize


class DeviceBM25:
    """Immutable device-resident BM25 scorer over a BM25Index snapshot."""

    def __init__(
        self,
        index: BM25Index,
        max_hot_terms: int = 4096,
        min_df: int = 8,
        pool_margin: int = 16,
    ):
        self.index = index
        self.pool_margin = pool_margin
        with index._lock:
            n_docs = sum(index._alive)
            n_slots = len(index._slot_id)
            self.n_slots = n_slots
            self.slot_id = np.asarray(index._slot_id, np.int64) if n_slots else (
                np.zeros(0, np.int64)
            )
            self.alive = np.asarray(index._alive, bool) if n_slots else (
                np.zeros(0, bool)
            )
            if n_docs == 0:
                self.hot: Dict[str, int] = {}
                self.w_host = np.zeros((0, 0), np.float32)
                self._dev = None
                return
            avg_len = index._total_len / n_docs
            doc_len = np.asarray(index._doc_len, np.float32)
            # hot vocabulary: by live document frequency
            dfs = []
            for t, (slots, tfs) in index._postings.items():
                df = int(self.alive[np.asarray(slots, np.int64)].sum())
                if df >= min_df:
                    dfs.append((df, t))
            dfs.sort(key=lambda x: (-x[0], x[1]))
            hot_terms = [t for _, t in dfs[:max_hot_terms]]
            self.hot = {t: i for i, t in enumerate(hot_terms)}
            h = len(hot_terms)
            w = np.zeros((n_slots, max(h, 1)), np.float32)
            for t, col in self.hot.items():
                slots, tfs = index._postings[t]
                slots = np.asarray(slots, np.int64)
                tfs = np.asarray(tfs, np.float32)
                live = self.alive[slots]
                slots, tfs = slots[live], tfs[live]
                df = len(slots)
                if df == 0:
                    continue
                idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                denom = tfs + index.k1 * (
                    1.0
                    - index.b
                    + index.b * doc_len[slots] / max(avg_len, 1e-9)
                )
                w[slots, col] = idf * tfs * (index.k1 + 1.0) / denom
            self.w_host = w
            self._dev = None

    def device_bytes(self) -> int:
        if self.w_host.size == 0:
            return 0
        return self.w_host.size * 2  # bf16 table

    def _device(self):
        if self._dev is None:
            import jax.numpy as jnp

            self._dev = {
                "w16": jnp.asarray(self.w_host, jnp.bfloat16),
                "alive": jnp.asarray(self.alive),
            }
        return self._dev

    def release_device(self):
        self._dev = None

    def encode_queries(
        self, queries: List[str]
    ) -> Tuple[np.ndarray, np.ndarray, List[int]]:
        """Returns (q_ind [B, H] f32 indicator over hot terms, on_device [B]
        bool, fallback list of row indices whose terms are not all hot)."""
        h = max(len(self.hot), 1)
        b = len(queries)
        q_ind = np.zeros((b, h), np.float32)
        ok = np.ones(b, bool)
        for r, text in enumerate(queries):
            toks = set(tokenize(text))
            if not toks:
                ok[r] = False
                continue
            for t in toks:
                col = self.hot.get(t)
                if col is None:
                    # Unknown-everywhere terms score zero on both paths; only
                    # terms that EXIST in the index but are rare force the
                    # exact fallback.
                    if t in self.index._postings:
                        ok[r] = False
                        break
                    continue
                q_ind[r, col] = 1.0
            else:
                continue
        return q_ind, ok, [r for r in range(b) if not ok[r]]

    def search_batch(
        self, queries: List[str], k: int = 10
    ) -> List[List[Tuple[int, float]]]:
        """Device-batch BM25: one bf16 MXU sweep + exact-f32 pool rescore.
        Queries containing a rare indexed term fall back to the exact host
        path (their postings are short — the host cost is bounded)."""
        b = len(queries)
        if self.n_slots == 0 or not self.hot:
            return self.index.search_batch(queries, k)
        import jax
        import jax.numpy as jnp

        q_ind, ok, fallback = self.encode_queries(queries)
        out: List[Optional[List[Tuple[int, float]]]] = [None] * b
        if ok.any():
            dev = self._device()
            qd = jnp.asarray(q_ind)
            kk = min(k + self.pool_margin, self.n_slots)
            d_pool, rows = _scan_topk(qd, dev["w16"], dev["alive"], kk)
            # exact f32 rescore of the pool (bf16 matmul ranking noise)
            d_exact = _rescore(qd, rows, dev["w16"])
            sd, si = jax.lax.sort(
                (d_exact, rows.astype(jnp.int32)), num_keys=1
            )
            sd = np.asarray(sd[:, :k])
            si = np.asarray(si[:, :k])
            for r in range(b):
                if not ok[r]:
                    continue
                hits = []
                for j in range(k):
                    s = float(-sd[r, j])
                    if s <= 0 or si[r, j] < 0:
                        break
                    hits.append((int(self.slot_id[si[r, j]]), s))
                out[r] = hits
        if fallback:
            fb = self.index.search_batch([queries[r] for r in fallback], k)
            for r, hits in zip(fallback, fb):
                out[r] = hits
        return [h if h is not None else [] for h in out]


def _scan_topk(qd, w16, alive, kk: int):
    """One [B, H] x [N, H]^T bf16 sweep + running top-k (negated scores:
    smaller-is-better, matching the vector kernels)."""
    from vecgo_tpu.ops import topk as T

    n = w16.shape[0]

    def score_fn(q, extra, blk):
        import jax.numpy as jnp

        s = jnp.einsum(
            "bh,nh->bn",
            q.astype(jnp.bfloat16),
            blk["w16"],
            preferred_element_type=jnp.float32,
        )
        return jnp.where(blk["alive"][None, :], -s, jnp.inf)

    return T.blockwise_topk_scored(
        qd, {"w16": w16, "alive": alive}, n, kk, _score_fn_cached(score_fn),
        block_rows=min(131072, n),
    )


_SCORE_FN = None


def _score_fn_cached(fn):
    """Stable closure object across calls -> jit cache hits (ops/topk.py)."""
    global _SCORE_FN
    if _SCORE_FN is None:
        _SCORE_FN = fn
    return _SCORE_FN


def _rescore(qd, rows, w16):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _rr(q, rows_, w):
        safe = jnp.maximum(rows_, 0)
        wv = jnp.take(w, safe, axis=0).astype(jnp.float32)  # [B, P, H]
        s = jnp.einsum(
            "bph,bh->bp", wv, q, precision=jax.lax.Precision.HIGHEST
        )
        return jnp.where(rows_ >= 0, -s, jnp.inf)

    return _rr(qd, rows, w16)
