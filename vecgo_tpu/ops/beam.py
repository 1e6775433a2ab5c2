"""Batched lockstep graph search + vectorized RobustPrune.

This is the TPU restructuring of the reference's pointer-chasing traversals —
HNSW searchLayer (hnsw/hnsw.go:1120, KNNSearchWithContext:1755) and DiskANN
beam search (diskann/segment.go:503-708) — and of the Vamana builder's
RobustPrune (diskann/writer.go:571-625).

Design (SURVEY.md §7.1):
- B queries walk the graph in lockstep. Per-query state is a fixed-width
  search list of `ef` (id, dist, expanded) triples — exactly DiskANN's L-list,
  kept as dense arrays instead of a heap.
- Each step expands the `beam_width` nearest unexpanded entries per query:
  gather their [W, R] neighbor rows, dedup against the list, score all new
  candidates with one batched matmul, and keep the best `ef` by top-k.
- Termination: lax.while_loop until every query's list is fully expanded (or
  max_steps). No host sync inside the loop.
- Filtered search keeps a separate masked result list (post-filter quality in
  a single pass: traversal is unmasked, results are masked) — replacing the
  reference's 4 traversal modes (hnsw.go:1220/1159/1406/1711).
- The visited-dedup is list-local: a node that falls off the ef-list can be
  re-scored later. This trades a little extra compute for O(ef) state — the
  lockstep analogue of the reference's epoch visited set (searcher/visited.go).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from vecgo_tpu.ops import topk as topk_ops

_INF = jnp.inf


def _score_rows(q, qn, vectors, rnorm2, ids):
    """Distances from q [B,d] to vectors[ids] [B,M] via gathered matmul."""
    safe = jnp.maximum(ids, 0)
    v = jnp.take(vectors, safe, axis=0)  # [B, M, d]
    prod = jnp.einsum(
        "bmd,bd->bm",
        v.astype(jnp.bfloat16),
        q.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return qn + jnp.take(rnorm2, safe) - 2.0 * prod


@functools.partial(
    jax.jit,
    static_argnames=("ef", "beam_width", "max_steps", "k", "with_visited"),
)
def beam_search(
    q,  # [B, d] float
    vectors,  # [N, d] (f32 or bf16 traversal copy)
    rnorm2,  # [N] f32
    graph,  # [N, R] int32, -1 padded
    entry_ids,  # [E] int32 entry points (medoid + extras)
    *,
    ef: int,
    k: int,
    beam_width: int = 4,
    max_steps: int = 0,
    mask=None,  # [N] bool or None: result filter (traversal unrestricted)
    with_visited: bool = False,
):
    """Batched greedy/beam search. Returns (res_d [B,k], res_i [B,k]) plus,
    when with_visited, the final search list (cand_d [B,ef], cand_i [B,ef])
    for Vamana build candidate generation."""
    b, d = q.shape
    r = graph.shape[1]
    w = beam_width
    m = w * r
    if max_steps == 0:
        max_steps = ef  # enough to expand the whole list one beam at a time

    qf = q.astype(jnp.float32)
    qn = jnp.sum(qf * qf, axis=-1, keepdims=True)  # [B,1]

    e = entry_ids.shape[0]
    init_ids = jnp.broadcast_to(entry_ids[None, :], (b, e)).astype(jnp.int32)
    init_d = _score_rows(qf, qn, vectors, rnorm2, init_ids)
    pad = ef - e
    cand_ids = jnp.concatenate(
        [init_ids, jnp.full((b, pad), -1, jnp.int32)], axis=1
    )
    cand_d = jnp.concatenate([init_d, jnp.full((b, pad), _INF, jnp.float32)], axis=1)
    expanded = cand_ids < 0  # sentinels count as expanded

    # Masked result list.
    if mask is not None:
        allowed0 = jnp.take(mask, jnp.maximum(init_ids, 0)) & (init_ids >= 0)
        rd0 = jnp.where(allowed0, init_d, _INF)
    else:
        rd0 = init_d
    res_d, pos0 = topk_ops.topk_smallest(
        jnp.concatenate([rd0, jnp.full((b, max(k - e, 0)), _INF)], axis=1), k
    )
    res_i = jnp.take_along_axis(
        jnp.concatenate([init_ids, jnp.full((b, max(k - e, 0)), -1, jnp.int32)], 1),
        pos0,
        axis=1,
    )

    rows_b = jnp.arange(b)[:, None]

    def cond(state):
        step, cand_ids, cand_d, expanded, res_d, res_i = state
        active = jnp.any(~expanded & jnp.isfinite(cand_d))
        return (step < max_steps) & active

    def body(state):
        step, cand_ids, cand_d, expanded, res_d, res_i = state
        sel_score = jnp.where(expanded, _INF, cand_d)
        _, sel_pos = jax.lax.top_k(-sel_score, w)  # [B, W] smallest unexpanded
        sel_ids = jnp.take_along_axis(cand_ids, sel_pos, axis=1)
        sel_valid = jnp.isfinite(
            jnp.take_along_axis(sel_score, sel_pos, axis=1)
        ) & (sel_ids >= 0)
        expanded = expanded.at[rows_b, sel_pos].set(True)

        nbrs = jnp.take(graph, jnp.maximum(sel_ids, 0), axis=0)  # [B, W, R]
        nbrs = jnp.where(sel_valid[:, :, None], nbrs, -1).reshape(b, m)
        valid_new = nbrs >= 0
        # Dedup vs the current list and within the new batch (keep first).
        dup_list = (nbrs[:, :, None] == cand_ids[:, None, :]).any(-1)
        eq_new = nbrs[:, :, None] == nbrs[:, None, :]
        earlier = jnp.tril(jnp.ones((m, m), bool), k=-1)[None]
        dup_new = (eq_new & earlier).any(-1)
        fresh = valid_new & ~dup_list & ~dup_new

        d_new = _score_rows(qf, qn, vectors, rnorm2, nbrs)
        d_new = jnp.where(fresh, d_new, _INF)

        # Merge into the ef-list.
        all_ids = jnp.concatenate([cand_ids, nbrs], axis=1)
        all_d = jnp.concatenate([cand_d, d_new], axis=1)
        all_exp = jnp.concatenate([expanded, ~fresh], axis=1)
        new_d, pos = jax.lax.top_k(-all_d, ef)
        cand_d = -new_d
        cand_ids = jnp.take_along_axis(all_ids, pos, axis=1)
        expanded = jnp.take_along_axis(all_exp, pos, axis=1)

        # Merge masked results.
        if mask is not None:
            allowed = jnp.take(mask, jnp.maximum(nbrs, 0)) & fresh
            rd = jnp.where(allowed, d_new, _INF)
        else:
            rd = d_new
        res_d, res_i = topk_ops.merge_topk(res_d, res_i, rd, nbrs, k)

        return step + 1, cand_ids, cand_d, expanded, res_d, res_i

    state = (jnp.int32(0), cand_ids, cand_d, expanded, res_d, res_i)
    _, cand_ids, cand_d, expanded, res_d, res_i = jax.lax.while_loop(
        cond, body, state
    )
    res_i = jnp.where(jnp.isfinite(res_d), res_i, -1)
    if with_visited:
        return res_d, res_i, cand_d, cand_ids
    return res_d, res_i


@functools.partial(jax.jit, static_argnames=("r_out", "alpha"))
def robust_prune(
    p_ids,  # [C] int32 node being pruned (excluded from its own candidates)
    p_vecs,  # [C, d]
    cand_ids,  # [C, L] int32, -1 padded
    vectors,  # [N, d]
    rnorm2,  # [N] f32
    *,
    r_out: int,
    alpha: float,
):
    """Vectorized RobustPrune (reference: diskann/writer.go:571-625).

    Per node: repeatedly take the closest alive candidate c*, keep it, and
    kill every candidate x with alpha * d(c*, x) <= d(p, x). Runs the R_out
    picks as a lax.scan with [C, L] masks; all distances via batched matmuls.
    Returns [C, r_out] int32 neighbor ids (-1 padded).
    """
    c, l = cand_ids.shape
    pf = p_vecs.astype(jnp.float32)
    pn = jnp.sum(pf * pf, axis=-1, keepdims=True)

    safe = jnp.maximum(cand_ids, 0)
    cv = jnp.take(vectors, safe, axis=0).astype(jnp.float32)  # [C, L, d]
    cn = jnp.take(rnorm2, safe)  # [C, L]
    d_p = pn + cn - 2.0 * jnp.einsum(
        "cld,cd->cl", cv.astype(jnp.bfloat16), pf.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    valid = (cand_ids >= 0) & (cand_ids != p_ids[:, None])
    # Dedup within candidates (keep first occurrence).
    eq = cand_ids[:, :, None] == cand_ids[:, None, :]
    earlier = jnp.tril(jnp.ones((l, l), bool), k=-1)[None]
    valid = valid & ~(eq & earlier).any(-1)
    d_p = jnp.where(valid, d_p, _INF)

    rows_c = jnp.arange(c)

    def pick(carry, _):
        alive, out_ids, slot = carry
        dmask = jnp.where(alive, d_p, _INF)
        best = jnp.argmin(dmask, axis=1)  # [C]
        best_d = jnp.take_along_axis(dmask, best[:, None], axis=1)[:, 0]
        ok = jnp.isfinite(best_d)
        best_id = jnp.where(ok, cand_ids[rows_c, best], -1)
        out_ids = out_ids.at[:, slot].set(best_id)
        # Occlusion: alpha * d(c*, x) <= d(p, x) kills x.
        bv = cv[rows_c, best]  # [C, d]
        bn = cn[rows_c, best][:, None]
        d_cx = bn + cn - 2.0 * jnp.einsum(
            "cld,cd->cl", cv.astype(jnp.bfloat16), bv.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        killed = alpha * jnp.maximum(d_cx, 0.0) <= d_p
        alive = alive & ~killed & ok[:, None]
        return (alive, out_ids, slot + 1), None

    out_ids = jnp.full((c, r_out), -1, jnp.int32)
    (alive, out_ids, _), _ = jax.lax.scan(
        pick, (valid, out_ids, jnp.int32(0)), None, length=r_out
    )
    return out_ids
