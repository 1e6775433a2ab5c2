"""Kernel substrate: every distance/scoring primitive as MXU-friendly batched ops.

This package replaces the reference's native SIMD layer (internal/simd, see
SURVEY.md §2.2) with:
  - jnp reference implementations (always available, run anywhere), and
  - Pallas TPU kernels for the hot fused paths, with interpret-mode fallback.

Convention: all scores are *smaller-is-better* distances (see model.Metric).
"""

from vecgo_tpu.ops.distance import (
    squared_l2,
    dot_scores,
    cosine_scores,
    pairwise_scores,
    row_norms_sq,
    normalize,
)
from vecgo_tpu.ops.topk import topk_smallest, merge_topk, blockwise_topk_search

__all__ = [
    "squared_l2",
    "dot_scores",
    "cosine_scores",
    "pairwise_scores",
    "row_norms_sq",
    "normalize",
    "topk_smallest",
    "merge_topk",
    "blockwise_topk_search",
]
