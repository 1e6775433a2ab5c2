"""Microbench: RobustPrune variants at 1M (the build's long pole).

Times: gram einsum alone, full prune (gram), full prune (lazy), narrower L,
r_out scaling — to locate the cost before optimizing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
import ml_dtypes

from vecgo_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

from vecgo_tpu.index import build_fast as bf
from vecgo_tpu.ops import beam as beam_ops

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
D, R, OCC, L = 128, 32, 32, 72
BLOCK = 8192

rng = np.random.default_rng(0)
x = rng.standard_normal((N, D)).astype(np.float32)
x16 = jnp.asarray(x.astype(ml_dtypes.bfloat16))
rn = jnp.asarray(np.einsum("nd,nd->n", x, x).astype(np.float32))
proj = jnp.asarray((rng.standard_normal((D, OCC)) / np.sqrt(OCC)).astype(ml_dtypes.bfloat16))
x_occ = (x16 @ proj).astype(jnp.float32)
rn_occ = jnp.sum(x_occ * x_occ, axis=1)
cand = jnp.asarray(rng.integers(0, N, size=(N, L), dtype=np.int64).astype(np.int32))
jax.block_until_ready((x_occ, rn_occ, cand))


def timed(name, fn, reps=2):
    jax.block_until_ready(fn())  # compile+warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e3:9.1f} ms", flush=True)
    return dt


import functools


@functools.partial(jax.jit, static_argnames=("l", "block"))
def gram_only(cand, x_occ, rn_occ, l: int, block: int):
    n = cand.shape[0]
    cb = cand.reshape(n // block, block, l)

    def body(_, cands):
        safe = jnp.maximum(cands, 0)
        ov = jnp.take(x_occ, safe.reshape(-1), axis=0).reshape(block, l, -1).astype(jnp.bfloat16)
        on = jnp.take(rn_occ, safe)
        gram = jnp.einsum("cld,cmd->clm", ov, ov, preferred_element_type=jnp.float32)
        d_all = on[:, :, None] + on[:, None, :] - 2.0 * gram
        return None, jnp.sum(d_all, axis=(1, 2))

    _, out = jax.lax.scan(body, None, cb)
    return out


@functools.partial(jax.jit, static_argnames=("l", "block"))
def gathers_only(cand, x16, rn, x_occ, rn_occ, l: int, block: int):
    """Just the row gathers (full-dim + occ) and d_p einsum — no gram/picks."""
    n = cand.shape[0]
    cb = cand.reshape(n // block, block, l)

    def body(_, cands):
        rows = jnp.arange(block)
        safe = jnp.maximum(cands, 0)
        cv16 = jnp.take(x16, safe.reshape(-1), axis=0).reshape(block, l, -1)
        cn = jnp.take(rn, safe)
        p16 = jnp.take(x16, rows, axis=0)
        d_p = cn - 2.0 * jnp.einsum("cld,cd->cl", cv16, p16, preferred_element_type=jnp.float32)
        ov = jnp.take(x_occ, safe.reshape(-1), axis=0).reshape(block, l, -1)
        return None, d_p.sum(1) + ov.sum((1, 2))

    _, out = jax.lax.scan(body, None, cb)
    return out


def run():
    print(f"N={N} L={L} occ={OCC} r_out={R} block={BLOCK}", flush=True)
    timed("gathers+d_p only", lambda: gathers_only(cand, x16, rn, x_occ, rn_occ, L, BLOCK))
    timed("gram einsum only (occ32)", lambda: gram_only(cand, x_occ, rn_occ, L, BLOCK))
    timed(
        "full prune gram L=72",
        lambda: bf._prune_all(cand, x16, rn, x_occ, rn_occ, R, 1.5, BLOCK),
    )
    # lazy variant: monkey-not — call robust_prune directly per block? use
    # _prune_all with x_occ wide... instead force lazy via a tweaked wrapper.
    @functools.partial(jax.jit, static_argnames=("r_out", "block"))
    def prune_lazy(cand_table, vectors, rnorm2, x_occ, rn_occ, r_out: int, block: int):
        n_pad, l = cand_table.shape
        cb = cand_table.reshape(n_pad // block, block, l)

        def body(_, inputs):
            bi, cands = inputs
            rows = bi * block + jax.lax.broadcasted_iota(jnp.int32, (block,), 0)
            vecs = jnp.take(vectors, jnp.minimum(rows, vectors.shape[0] - 1), axis=0)
            out = beam_ops.robust_prune_traced(
                rows, vecs, cands, vectors, rnorm2,
                r_out=r_out, alpha=1.5,
                vectors_occ=x_occ, rnorm2_occ=rn_occ,
                lazy_occlusion=True,
            )
            return None, out

        _, outs = jax.lax.scan(
            body, None, (jnp.arange(n_pad // block, dtype=jnp.int32), cb)
        )
        return outs.reshape(n_pad, r_out)

    timed("full prune lazy L=72", lambda: prune_lazy(cand, x16, rn, x_occ, rn_occ, R, BLOCK))
    cand56 = cand[:, :56]
    timed(
        "full prune gram L=56",
        lambda: bf._prune_all(cand56, x16, rn, x_occ, rn_occ, R, 1.5, BLOCK),
    )
    # occ 16
    proj16 = proj[:, :16] * np.sqrt(2.0)
    xo16 = (x16 @ proj16).astype(jnp.float32)
    rno16 = jnp.sum(xo16 * xo16, axis=1)
    timed(
        "full prune gram L=72 occ16",
        lambda: bf._prune_all(cand, x16, rn, xo16, rno16, R, 1.5, BLOCK),
    )
    timed(
        "full prune gram L=56 occ16",
        lambda: bf._prune_all(cand56, x16, rn, xo16, rno16, R, 1.5, BLOCK),
    )
    for blk in (32768, 65536):
        timed(
            f"full prune gram L=56 occ32 block={blk}",
            lambda blk=blk: bf._prune_all(cand56, x16, rn, x_occ, rn_occ, R, 1.5, blk),
        )
    timed(
        "full prune gram L=72 occ32 block=65536",
        lambda: bf._prune_all(cand, x16, rn, x_occ, rn_occ, R, 1.5, 65536),
    )
    # pick_batch x block: fewer scan steps (L/m) vs a longer unrolled
    # within-batch triangular pass; block grows rows per dispatch.
    for blk, pb in ((8192, 16), (32768, 8), (32768, 16), (65536, 16)):
        timed(
            f"full prune gram L=72 occ32 block={blk} pick={pb}",
            lambda blk=blk, pb=pb: bf._prune_all(
                cand, x16, rn, x_occ, rn_occ, R, 1.5, blk, pick_batch=pb
            ),
        )


if __name__ == "__main__":
    run()
