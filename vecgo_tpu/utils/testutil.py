"""Deterministic test data generators (reference: testutil/testutil.go:20-130).

Seeded numpy RNG (seed=42 convention, as in the reference) producing the same
distribution families the reference benchmark suite uses: uniform, gaussian,
clustered, zipfian-ish category columns.
"""

from __future__ import annotations

import numpy as np

DEFAULT_SEED = 42


def rng(seed: int = DEFAULT_SEED) -> np.random.Generator:
    return np.random.default_rng(seed)


def uniform_vectors(n: int, d: int, seed: int = DEFAULT_SEED) -> np.ndarray:
    return rng(seed).random((n, d), dtype=np.float32)


def gaussian_vectors(n: int, d: int, seed: int = DEFAULT_SEED) -> np.ndarray:
    return rng(seed).standard_normal((n, d)).astype(np.float32)


def clustered_vectors(
    n: int, d: int, n_clusters: int = 16, spread: float = 0.05, seed: int = DEFAULT_SEED
):
    """Cluster-structured vectors; returns (vectors, cluster_assignment)."""
    r = rng(seed)
    centers = r.random((n_clusters, d), dtype=np.float32)
    assign = r.integers(0, n_clusters, size=n)
    noise = r.standard_normal((n, d)).astype(np.float32) * spread
    return centers[assign] + noise, assign


def zipf_categories(n: int, n_cats: int = 20, a: float = 1.5, seed: int = DEFAULT_SEED):
    """Zipfian categorical column as strings 'cat_i'."""
    r = rng(seed)
    raw = r.zipf(a, size=n)
    codes = np.minimum(raw - 1, n_cats - 1)
    return [f"cat_{c}" for c in codes]


def brute_force_knn(queries: np.ndarray, corpus: np.ndarray, k: int, metric="l2"):
    """Ground-truth exact top-k on host (float64 accumulation).

    Returns (dists [B,k], ids [B,k]); used by recall tests
    (reference analogue: benchmark_test recall methodology).
    """
    q = queries.astype(np.float64)
    x = corpus.astype(np.float64)
    if metric in ("l2", "L2"):
        d2 = (
            (q * q).sum(1)[:, None]
            + (x * x).sum(1)[None, :]
            - 2.0 * q @ x.T
        )
        scores = np.maximum(d2, 0.0)
    elif metric in ("dot", "DOT"):
        scores = -(q @ x.T)
    elif metric in ("cosine", "COSINE"):
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        scores = 1.0 - qn @ xn.T
    else:
        raise ValueError(metric)
    ids = np.argsort(scores, axis=1, kind="stable")[:, :k]
    d = np.take_along_axis(scores, ids, axis=1)
    return d, ids


def recall_at_k(found_ids: np.ndarray, true_ids: np.ndarray) -> float:
    """Mean fraction of true top-k recovered (order-insensitive)."""
    hits = 0
    total = 0
    for f, t in zip(found_ids, true_ids):
        ts = set(int(i) for i in t)
        hits += sum(1 for i in f if int(i) in ts)
        total += len(t)
    return hits / max(total, 1)
