"""Microbench: cluster-KNN top-k variants (build stage 3).

The [g, C, C] distance matmul is nearly free; lax.top_k over width-1024 rows
is the suspected cost. Compares: top_k(32), top_k(16), bucketed top-1
(approx_min_k-style binning), and sort-based selection.
"""

import functools
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

N = 1_048_576
D = 128
CMAX = 1024
G = 64
K_CL = 2752  # ~= ceil(1M*2*1.4/1024) padded to g multiple

rng = np.random.default_rng(0)
x = rng.standard_normal((N, D)).astype(np.float32)
x16 = jnp.asarray(x.astype(ml_dtypes.bfloat16))
rn = jnp.asarray(np.einsum("nd,nd->n", x, x).astype(np.float32))
members = jnp.asarray(
    rng.integers(0, N, size=(K_CL, CMAX), dtype=np.int64).astype(np.int32)
)
jax.block_until_ready((x16, rn, members))


def timed(name, fn, reps=2):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/reps*1e3:9.1f} ms", flush=True)


@functools.partial(jax.jit, static_argnames=("sel", "knn", "g"))
def knn_variant(x16, rnorm2, members, sel: str, knn: int, g: int):
    k_pad, cmax = members.shape
    mem_b = members.reshape(k_pad // g, g, cmax)

    def body(acc, mem):
        valid = mem >= 0
        safe = jnp.maximum(mem, 0)
        v = jnp.take(x16, safe.reshape(-1), axis=0).reshape(g, cmax, -1)
        rnm = jnp.take(rnorm2, safe)
        prod = jnp.einsum("gcd,ged->gce", v, v, preferred_element_type=jnp.float32)
        dmat = rnm[:, :, None] + rnm[:, None, :] - 2.0 * prod
        eye = jax.lax.broadcasted_iota(jnp.int32, (1, cmax, cmax), 1) == (
            jax.lax.broadcasted_iota(jnp.int32, (1, cmax, cmax), 2)
        )
        dmat = jnp.where(valid[:, None, :] & ~eye, dmat, jnp.inf)
        if sel == "matmul_only":
            return acc + dmat.sum((1, 2)).astype(jnp.float32), None
        if sel == "topk":
            _, loc = jax.lax.top_k(-dmat, knn)
        elif sel == "bucket":
            # [g, c, knn, cmax/knn]: min per bucket
            db = dmat.reshape(g, cmax, knn, cmax // knn)
            loc_in = jnp.argmin(db, axis=-1)
            loc = loc_in * knn + jax.lax.broadcasted_iota(
                jnp.int32, (g, cmax, knn), 2
            )  # NOTE: bucket stride layout
        else:  # sort
            _, loc = jax.lax.sort(
                (dmat, jax.lax.broadcasted_iota(jnp.int32, dmat.shape, 2)),
                num_keys=1,
            )
            loc = loc[:, :, :knn]
        gcand = jnp.take_along_axis(mem[:, None, :], loc, axis=2)
        return acc + gcand.sum((1, 2)).astype(jnp.float32), None

    acc0 = jnp.zeros((g,), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, mem_b)
    return acc


for name, sel, knn in [
    ("matmul only", "matmul_only", 32),
    ("top_k 32", "topk", 32),
    ("top_k 16", "topk", 16),
    ("bucket top-1 x32", "bucket", 32),
]:
    timed(name, lambda sel=sel, knn=knn: knn_variant(x16, rn, members, sel, knn, G))
