"""Focused probe: flush-path k-means (train + full-table assign) at 1M x 128.

Times cold (compile) and warm calls separately, plus a host-memory yardstick
so runs in different host regimes stay comparable.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vecgo_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

from vecgo_tpu.quantization import kmeans as km

N, D, K = 1_000_000, 128, 122


def log(m):
    print(m, file=sys.stderr, flush=True)


t0 = time.perf_counter()
rng = np.random.default_rng(0)
x = rng.standard_normal((N, D)).astype(np.float32)
log(f"corpus {time.perf_counter()-t0:.1f}s")

# Host yardstick: one full-table read+reduce pass.
t0 = time.perf_counter()
s = float(x.sum())
log(f"yardstick full-table sum    {time.perf_counter()-t0:6.2f}s")

for tag in ("cold", "warm"):
    t0 = time.perf_counter()
    cents, inertia = km.train_kmeans(x, K, seed=42)
    log(f"train_kmeans {tag}          {time.perf_counter()-t0:6.2f}s  inertia={inertia:.3e}")

for tag in ("cold", "warm"):
    t0 = time.perf_counter()
    a16, _ = km.assign_partitions(x, cents, transfer_dtype=jnp.bfloat16)
    log(f"assign bf16 {tag}           {time.perf_counter()-t0:6.2f}s")

t0 = time.perf_counter()
a32, _ = km.assign_partitions(x, cents)
log(f"assign f32  warm            {time.perf_counter()-t0:6.2f}s")
agree = float((a16 == a32).mean())
log(f"bf16/f32 assignment agreement: {agree:.4f}")
