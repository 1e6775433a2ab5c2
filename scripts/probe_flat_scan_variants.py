"""Micro-probe: engine FlatSegment scan vs ops-level scan at 1M x 128.

Isolates where the engine flat path loses vs blockwise_topk_search:
per-call jnp.pad of the device table, scored-closure overhead, f32-HIGH
vs bf16 compute. Run on the real TPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vecgo_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from vecgo_tpu.model import Metric
from vecgo_tpu.ops import topk as T
from vecgo_tpu.ops import distance as D

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
K = int(sys.argv[3]) if len(sys.argv) > 3 else 30
DIM = 128
BLOCK = 131072


def log(m):
    print(m, file=sys.stderr, flush=True)


rng = np.random.default_rng(0)
x = rng.standard_normal((N, DIM)).astype(np.float32)
q = jnp.asarray(rng.standard_normal((B, DIM)).astype(np.float32))
xd = jnp.asarray(x)
xd16 = xd.astype(jnp.bfloat16)
rn = D.row_norms_sq(xd)
jax.block_until_ready((xd, xd16, rn, q))


def timed(name, fn, reps=3):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
        jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    log(f"{name:44s} {dt*1e3:8.1f} ms  {B/dt:9.0f} qps")
    return dt


# 1. ops-level f32 HIGH (the flat_f32 bench path)
timed("ops blockwise f32-HIGH", lambda: T.blockwise_topk_search(
    q, xd, K, metric=Metric.L2, x_norms_sq=rn, block_rows=BLOCK)[1])

# 2. ops-level bf16 (the flat_bf16 bench headline path)
timed("ops blockwise bf16", lambda: T.blockwise_topk_search(
    q, xd16, K, metric=Metric.L2, x_norms_sq=rn, block_rows=BLOCK,
    compute_dtype=jnp.bfloat16)[1])

# 3. scored path, NoneQuantizer-style closure (the engine path)
enc = {"vectors": xd, "rnorm2": rn}


def score_f32(qq, extra, blk):
    return D.pairwise_scores(
        qq, blk["vectors"], Metric.L2, x_norms_sq=blk["rnorm2"],
        x_normalized=False)


timed("scored f32-HIGH (engine path)", lambda: T.blockwise_topk_scored(
    q, enc, N, K, score_f32, block_rows=BLOCK)[1])

# 4. scored path with the table pre-padded once (no per-call jnp.pad)
pad = (-N) % BLOCK
enc_pad = {
    "vectors": jnp.pad(xd, ((0, pad), (0, 0))),
    "rnorm2": jnp.pad(rn, (0, pad)),
}
jax.block_until_ready(enc_pad)
timed("scored f32-HIGH pre-padded", lambda: T._blockwise_scored_jit(
    q, enc_pad, None, None, score_f32, K, BLOCK, N)[1])

# 5. scored bf16 closure over a bf16 table (pre-padded)
enc16 = {"vectors": enc_pad["vectors"].astype(jnp.bfloat16),
         "rnorm2": enc_pad["rnorm2"]}
jax.block_until_ready(enc16)


def score_bf16(qq, extra, blk):
    return D.pairwise_scores(
        qq, blk["vectors"], Metric.L2, x_norms_sq=blk["rnorm2"],
        x_normalized=False, compute_dtype=jnp.bfloat16)


timed("scored bf16 pre-padded", lambda: T._blockwise_scored_jit(
    q, enc16, None, None, score_bf16, K, BLOCK, N)[1])

# 6. scored bf16 with a tombstone-style mask (engine passes mask sometimes)
mask = np.ones(N + pad, bool)
timed("scored bf16 pre-padded + host mask", lambda: T._blockwise_scored_jit(
    q, enc16, jnp.asarray(mask), None, score_bf16, K, BLOCK, N)[1])
