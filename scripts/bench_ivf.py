"""Microbench: blocked-IVF scan stages at 1M (the vamana serving path).

Times the probe top-k, the inversion, and the grouped scan separately, plus
full ivf_scan end-to-end for several (n_probe, kk, qcap) settings.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from vecgo_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

from vecgo_tpu.ops import ivf as ivf_ops

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
D = 128
B = 4096
CAP = int(os.environ.get("IVF_CAP", 512))

rng = np.random.default_rng(42)
centers = rng.standard_normal((1024, D)).astype(np.float32)
assign = rng.integers(0, 1024, size=N)
x = centers[assign] + 0.35 * rng.standard_normal((N, D)).astype(np.float32)
q = centers[rng.integers(0, 1024, B)] + 0.35 * rng.standard_normal((B, D)).astype(np.float32)

t0 = time.perf_counter()
cents, members = ivf_ops.build_ivf_table(x, capacity=CAP)
print(f"build_ivf_table: {time.perf_counter()-t0:.1f}s K={cents.shape[0]}", flush=True)
xd = jnp.asarray(x, jnp.bfloat16)
rn = jnp.asarray(np.einsum("nd,nd->n", x, x).astype(np.float32))
t0 = time.perf_counter()
table = ivf_ops.device_table(members, cents, xd, rn)
jax.block_until_ready(table.blocks)
print(f"device_table: {time.perf_counter()-t0:.1f}s", flush=True)
qd = jnp.asarray(q)


def timed(name, fn, reps=5):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:8.1f} ms  ({B/dt:10,.0f} qps)", flush=True)


# stage: probe selection only
@functools.partial(jax.jit, static_argnames=("p",))
def probes_only(q, table, p: int):
    qf = q.astype(jnp.float32)
    qn = jnp.sum(qf * qf, axis=-1)
    cd = (
        qn[:, None] + table.cnorm2[None, :]
        - 2.0 * jax.lax.dot_general(
            q.astype(jnp.bfloat16), table.centroids.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )
    _, probes = jax.lax.top_k(-cd, p)
    return probes


@functools.partial(jax.jit, static_argnames=("k_pad", "p", "qcap"))
def invert_only(probes, k_pad: int, qcap: int, p: int):
    return ivf_ops._invert_probes(probes, k_pad, qcap)


k_pad = table.bnorm2.shape[0]
for p in (8, 16):
    timed(f"probes p={p}", lambda p=p: probes_only(qd, table, p))
pr16 = probes_only(qd, table, 16)
timed("invert p=16 qcap=112", lambda: invert_only(pr16, k_pad, 112, 16))

for p, kk, qcap in ((16, 8, 0), (16, 16, 0), (8, 16, 0), (16, 8, 224)):
    timed(
        f"ivf_scan p={p} kk={kk} qcap={qcap or 'auto'}",
        lambda p=p, kk=kk, qcap=qcap: ivf_ops.ivf_scan(
            qd, table, n_probe=p, kk=kk, qcap=qcap
        )[1],
    )
