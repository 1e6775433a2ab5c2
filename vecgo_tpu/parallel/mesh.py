"""Multi-chip sharded search + build over a jax.sharding.Mesh.

Reference analogue (SURVEY.md §2.3-2.4): the reference's only distributed story
is stateless read replicas over shared S3 with manifest CAS; its intra-node
parallelism is goroutine fan-out. The TPU-native replacements:

- **Shard (database) parallelism**: corpus rows sharded across chips along a
  "shard" mesh axis; each chip computes a local top-k over its rows, then an
  all_gather + merge over ICI produces the global top-k. This replaces the
  reference's per-segment goroutine fan-out (engine/search.go:790-909).
- **Query-batch data parallelism**: the query batch is sharded along a "dp"
  axis; no cross-query communication is needed.
- **Sharded k-means / index-build steps**: cluster statistics reduce with psum
  over the shard axis (build parallelism, reference pq.go:353-387).

All functions shard with shard_map over an explicit Mesh so collectives ride
ICI; blob/manifest durability stays host-side and orthogonal (§2.4).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vecgo_tpu.model import Metric
from vecgo_tpu.ops import distance as D
from vecgo_tpu.ops import topk as T


def make_mesh(shard: Optional[int] = None, dp: int = 1, devices=None) -> Mesh:
    """Build a ("dp", "shard") mesh; shard defaults to all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shard is None:
        shard = n // dp
    assert dp * shard == n, f"dp({dp}) * shard({shard}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, shard)
    return Mesh(arr, axis_names=("dp", "shard"))


class ShardedFlat:
    """A flat corpus sharded row-wise across the mesh's "shard" axis.

    Queries are sharded along "dp" and replicated along "shard"; results are
    the exact global top-k. Pads N to a multiple of the shard count.
    """

    def __init__(
        self,
        x: np.ndarray,
        mesh: Mesh,
        metric: Metric = Metric.L2,
        block_rows: int = 8192,
        mask: Optional[np.ndarray] = None,  # host bool [N]: rows eligible
    ):
        self.mesh = mesh
        self.metric = metric.compute() if hasattr(metric, "compute") else metric
        self.n = x.shape[0]
        self.dim = x.shape[1]
        self.block_rows = block_rows
        n_shards = mesh.shape["shard"]
        pad = (-self.n) % n_shards
        xp = np.pad(np.asarray(x, np.float32), ((0, pad), (0, 0)))
        if metric == Metric.COSINE:
            norms = np.linalg.norm(xp, axis=1, keepdims=True)
            xp = xp / np.maximum(norms, 1e-30)
        self.shard_rows = xp.shape[0] // n_shards
        x_sharding = NamedSharding(mesh, P("shard", None))
        self.x = jax.device_put(xp, x_sharding)
        rn = np.einsum("nd,nd->n", xp, xp, dtype=np.float64).astype(np.float32)
        self.rnorm2 = jax.device_put(rn, NamedSharding(mesh, P("shard")))
        self.mask = None
        if mask is not None:
            mp = np.zeros(xp.shape[0], bool)
            mp[: self.n] = mask[: self.n]
            self.mask = jax.device_put(mp, NamedSharding(mesh, P("shard")))
        self._search_fn = None
        self._search_k = None

    def _build_search(self, k: int):
        mesh = self.mesh
        metric = self.metric
        shard_rows = self.shard_rows
        n_valid = self.n
        block_rows = min(self.block_rows, shard_rows)
        has_mask = self.mask is not None

        def local_search(q, x, rn, *m):
            # q: [B/dp, d] (replicated over shard); x: [rows/shard, d]
            sidx = jax.lax.axis_index("shard")
            base = sidx * shard_rows
            # Mask out padding rows (only the last shard can contain any).
            local_valid = (
                jnp.arange(shard_rows, dtype=jnp.int32) + base < n_valid
            )
            if has_mask:
                local_valid = local_valid & m[0]
            d_loc, i_loc = T.blockwise_topk_search(
                q,
                x,
                k,
                metric=metric,
                x_norms_sq=rn,
                mask=local_valid,
                block_rows=block_rows,
                x_normalized=True,
            )
            i_glob = jnp.where(i_loc >= 0, i_loc + base, -1)
            # ICI merge: gather every shard's top-k, reduce to global top-k.
            d_all = jax.lax.all_gather(d_loc, "shard", axis=1, tiled=True)
            i_all = jax.lax.all_gather(i_glob, "shard", axis=1, tiled=True)
            return T.topk_smallest_with_ids(d_all, i_all, k)

        in_specs = [P("dp", None), P("shard", None), P("shard")]
        if has_mask:
            in_specs.append(P("shard"))
        fn = jax.shard_map(
            local_search,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(P("dp", None), P("dp", None)),
            # Outputs ARE shard-replicated (all_gather + identical reduction on
            # every shard); the varying-axis checker can't infer that.
            check_vma=False,
        )
        return jax.jit(fn)

    def search(self, q: np.ndarray, k: int):
        """Exact sharded top-k. q [B, d] with B % dp == 0."""
        if self._search_fn is None or self._search_k != k:
            self._search_fn = self._build_search(k)
            self._search_k = k
        # Normalize on host and device_put straight onto the mesh: jnp.asarray
        # would commit to the default device, which may be a different backend
        # (e.g. the real TPU while the mesh is the virtual CPU one).
        qd = np.asarray(q, np.float32)
        if self.metric == Metric.COSINE:
            qd = qd / np.maximum(
                np.linalg.norm(qd, axis=1, keepdims=True), 1e-30
            )
        q_sharding = NamedSharding(self.mesh, P("dp", None))
        qd = jax.device_put(qd, q_sharding)
        if self.mask is not None:
            d, i = self._search_fn(qd, self.x, self.rnorm2, self.mask)
        else:
            d, i = self._search_fn(qd, self.x, self.rnorm2)
        return d, i


def sharded_kmeans_step(mesh: Mesh):
    """One Lloyd iteration over a row-sharded corpus: local one-hot-matmul
    cluster stats + psum over the shard axis. Returns a jitted step fn
    (x_shard, centers) -> (centers', inertia)."""

    def step(x, centers):
        # x: [rows/shard, d] local; centers: [K, d] replicated.
        k = centers.shape[0]
        c_norms = D.row_norms_sq(centers)
        dmat = (
            D.row_norms_sq(x)[:, None]
            + c_norms[None, :]
            - 2.0
            * jax.lax.dot_general(
                x, centers, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        assign = jnp.argmin(dmat, axis=1)
        onehot = (
            assign[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
        ).astype(jnp.float32)
        sums = jax.lax.dot_general(
            onehot, x, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        counts = jnp.sum(onehot, axis=0)
        inertia = jnp.sum(jnp.maximum(jnp.min(dmat, axis=1), 0.0))
        sums = jax.lax.psum(sums, ("dp", "shard"))
        counts = jax.lax.psum(counts, ("dp", "shard"))
        inertia = jax.lax.psum(inertia, ("dp", "shard"))
        new_centers = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], centers
        )
        return new_centers, inertia

    fn = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(("dp", "shard"), None), P(None, None)),
        out_specs=(P(None, None), P()),
    )
    return jax.jit(fn)
