"""Engine-integrated multi-chip sharding.

Reference analogue (SURVEY.md §2.3): the reference scales reads with
stateless replicas over shared S3 (vecgo.go:151-179) and fans searches out
per segment across goroutines (engine/search.go:790-909). The TPU-native
replacement shards the ENGINE's data plane across a device mesh:

- **ShardedSnapshotSearcher**: takes an engine snapshot, concatenates its
  committed segments into one virtual row space, row-shards it across the
  mesh's devices (tombstones baked into the shard mask), and answers batched
  queries with per-shard local top-k + all_gather merge over ICI. Results map
  back to global ids via the concatenated id column.
- **sharded_cluster_knn**: the FLOP-dominant stage of the clustered Vamana
  build (index/build_fast) sharded over the mesh — clusters are independent
  work units; each device computes exact KNN for its cluster slice and the
  per-point candidate tables merge with an elementwise max-reduce (slots are
  written by exactly one device; -1 is the identity). Build throughput scales
  with mesh size.
- **dryrun_engine_sharded**: one tiny end-to-end pass of both planes, used by
  __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from vecgo_tpu.model import Metric
from vecgo_tpu.parallel.mesh import ShardedFlat


class ShardedSnapshotSearcher:
    """Row-shards a snapshot's committed segments across a device mesh.

    Built once per snapshot/mesh (device_put of the corpus); queries then run
    exact sharded search. Deletions visible at the snapshot are baked into
    the shard mask. The memtable (mutable, small) is NOT included — callers
    searching a live engine should flush first or merge memtable results
    host-side (the reference's read replicas are likewise committed-only).
    """

    def __init__(self, snapshot, mesh: Mesh, metric: Metric = Metric.L2):
        self.mesh = mesh
        self.metric = metric
        xs, ids, mask_parts = [], [], []
        self.seg_ids = []
        for h in snapshot.segments:
            seg = h.segment
            if seg.n == 0:
                continue
            xs.append(np.asarray(seg.vectors, np.float32))
            ids.append(np.asarray(seg.ids, np.int64))
            dead = snapshot.tombstones.deleted_mask(seg.seg_id, seg.n, snapshot.lsn)
            mask_parts.append(~dead if dead is not None else np.ones(seg.n, bool))
            self.seg_ids.append(seg.seg_id)
        if not xs:
            self.flat = None
            self.ids = np.zeros(0, np.int64)
            return
        x = np.concatenate(xs)
        self.ids = np.concatenate(ids)
        mask = np.concatenate(mask_parts)
        self.flat = ShardedFlat(x, mesh, metric=metric, mask=mask)

    def search(self, q: np.ndarray, k: int):
        """Exact sharded top-k over the snapshot. Returns (ids [B,k] int64
        with -1 padding, dists [B,k] f32), both host. Query batches pad to a
        dp multiple transparently."""
        q = np.asarray(q, np.float32)
        b = q.shape[0]
        if self.flat is None:
            return np.full((b, k), -1, np.int64), np.full((b, k), np.inf, np.float32)
        dp = self.mesh.shape.get("dp", 1)
        pad = (-b) % dp
        if pad:
            q = np.concatenate([q, np.zeros((pad, q.shape[1]), np.float32)])
        d, rows = self.flat.search(q, k)
        rows = np.asarray(rows)[:b]
        d = np.asarray(d)[:b]
        out = np.where(rows >= 0, self.ids[np.maximum(rows, 0)], -1)
        return out, np.where(rows >= 0, d, np.inf)


def sharded_cluster_knn(
    x16, rnorm2, members: np.ndarray, mem_slot: np.ndarray,
    knn: int, overlap: int, n_out: int, g: int, mesh: Mesh,
):
    """Mesh-sharded twin of build_fast._cluster_knn: the cluster axis splits
    across every mesh device; per-point candidate tables merge with pmax
    (each (point, slot) pair is owned by exactly one cluster => one device;
    -1 padding is the identity for max)."""
    from vecgo_tpu.index.build_fast import _cluster_knn

    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    k_pad, cmax = members.shape
    step = g * n_dev
    k_full = ((k_pad + step - 1) // step) * step
    if k_full > k_pad:
        members = np.concatenate(
            [members, np.full((k_full - k_pad, cmax), -1, np.int32)]
        )
        mem_slot = np.concatenate(
            [mem_slot, np.zeros((k_full - k_pad, cmax), np.int32)]
        )
    axes = tuple(mesh.axis_names)

    def local(x16_, rn_, mem_, slot_):
        cand = _cluster_knn(x16_, rn_, mem_, slot_, knn, overlap, n_out, g)
        return jax.lax.pmax(cand, axes)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axes, None), P(axes, None)),
        out_specs=P(None, None, None),
        check_vma=False,
    )
    from jax.sharding import NamedSharding

    row_sh = NamedSharding(mesh, P(axes, None))
    return jax.jit(fn)(
        x16,
        rnorm2,
        jax.device_put(np.asarray(members, np.int32), row_sh),
        jax.device_put(np.asarray(mem_slot, np.int32), row_sh),
    )


def sharded_prune(
    cand, x16, rnorm2, x_occ, rn_occ,
    r: int, alpha: float, block: int, rev_cap: int, mesh: Mesh,
    one_pass: bool = False,
):
    """Mesh-sharded RobustPrune + reverse re-prune (the build's FLOP-heavy
    tail, extending the sharded build beyond cluster-KNN — SURVEY §2.3 build
    parallelism). Candidate rows split across every device; the corpus
    replicates; the forward graph all_gathers once over ICI for the reverse
    pass, then each shard re-prunes its slice. Exact same semantics as the
    single-device _prune_all + _prune_with_reverse pipeline.

    one_pass=True: `cand` already carries reverse candidates (the build's
    default reverse-of-knn path) — ONE prune pass per shard and no
    intermediate all_gather at all (matches the single-device default)."""
    from vecgo_tpu.index.build_fast import _prune_blocks, _reverse_dev

    axes = tuple(mesh.axis_names)
    n_dev = int(np.prod([mesh.shape[a] for a in axes]))
    n_pad, l = cand.shape
    lblock = min(block, max(128, n_pad // n_dev))
    step = n_dev * lblock
    n_full = ((n_pad + step - 1) // step) * step
    if n_full > n_pad:
        cand = jnp.concatenate(
            [cand, jnp.full((n_full - n_pad, l), -1, cand.dtype)]
        )
    local_rows = n_full // n_dev

    def local(cand_, x16_, rn_, xo_, rno_):
        idx = jnp.int32(0)
        mult = 1
        for a in reversed(axes):
            idx = idx + jax.lax.axis_index(a) * mult
            mult *= mesh.shape[a]
        row0 = idx * local_rows
        g_loc = _prune_blocks(
            cand_, x16_, rn_, xo_, rno_, r, alpha, lblock, row0=row0
        )
        if one_pass:
            return jax.lax.all_gather(g_loc, axes, axis=0, tiled=True)
        g_full = jax.lax.all_gather(g_loc, axes, axis=0, tiled=True)
        rev = _reverse_dev(g_full, rev_cap)
        rev_loc = jax.lax.dynamic_slice_in_dim(rev, row0, local_rows, 0)
        cand2 = jnp.concatenate([g_loc, rev_loc], axis=1)
        g2 = _prune_blocks(
            cand2, x16_, rn_, xo_, rno_, r, alpha, lblock, row0=row0
        )
        return jax.lax.all_gather(g2, axes, axis=0, tiled=True)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axes, None), P(), P(), P(), P()),
        out_specs=P(None, None),
        check_vma=False,
    )
    out = jax.jit(fn)(cand, x16, rnorm2, x_occ, rn_occ)
    return out[:n_pad]


def dryrun_engine_sharded(mesh: Mesh) -> None:
    """Tiny end-to-end pass: engine snapshot -> sharded search; sharded
    cluster-KNN build stage. Runs on the dryrun's virtual CPU mesh."""
    from vecgo_tpu.blobstore import MemoryStore
    from vecgo_tpu.engine import Engine, EngineOptions
    from vecgo_tpu.utils import testutil as tu

    d = 16
    n = 64 * int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    eng = Engine.open(
        MemoryStore(),
        EngineOptions(dim=d, flush_threshold=10**9, graph_threshold=10**9),
        create=True,
    )
    x = tu.gaussian_vectors(n, d, seed=50)
    ids = eng.insert_batch(x)
    eng.commit()
    eng.delete(ids[1])
    snap = eng.snapshot()
    try:
        searcher = ShardedSnapshotSearcher(snap, mesh, eng.options.metric)
        got, dist = searcher.search(x[:8], k=3)
    finally:
        snap.release()
    assert got.shape == (8, 3)
    assert int(got[0, 0]) == ids[0] and float(dist[0, 0]) < 1e-5
    assert all(int(i) != ids[1] for i in got[1])  # tombstone respected

    # Sharded build stage: exact per-cluster KNN over the mesh. device_put
    # from host numpy so nothing lands on the (possibly non-CPU) default
    # device.
    import ml_dtypes
    from jax.sharding import NamedSharding

    rep = NamedSharding(mesh, P())
    x16 = jax.device_put(x.astype(ml_dtypes.bfloat16), rep)
    rn = jax.device_put(
        np.einsum("nd,nd->n", x, x, dtype=np.float64).astype(np.float32), rep
    )
    members = np.arange(n, dtype=np.int32).reshape(4, n // 4)
    slots = np.zeros((4, n // 4), np.int32)
    cand = sharded_cluster_knn(x16, rn, members, slots, 8, 1, n, 1, mesh)
    cand = np.asarray(cand[:n])
    assert cand.shape == (n, 1, 8) and (cand.reshape(n, -1) >= 0).any(axis=1).all()

    # Sharded FLAGSHIP serving structure: the SQ8-coded blocked-IVF table
    # cluster-sharded over the mesh, per-shard scan + all_gather merge
    # (parallel/mesh.ShardedIVF).
    from vecgo_tpu.ops import ivf as ivf_ops
    from vecgo_tpu.parallel.mesh import ShardedIVF

    xf = jax.device_put(np.asarray(x, np.float32), rep)
    table = ivf_ops.device_table_coded(members, xf)
    siv = ShardedIVF(table, mesh)
    # The toy membership is index-sliced (not geometric): probe every real
    # cluster so the exact self-match is guaranteed in the pool.
    dd, rows = siv.search(x[:8], n_probe_local=4, kk=4)
    assert rows.shape[0] == 8 and (rows[:, 0] == np.arange(8)).all(), rows[:, 0]
    # Coded (decoded-x̂) self-distance: bounded by the SQ8 residual step —
    # far below the ~2d expected inter-point distance on gaussian data.
    assert float(dd[0, 0]) < 1.0, float(dd[0, 0])
    print(
        "dryrun_engine_sharded OK: sharded snapshot search + sharded build "
        "knn + sharded coded-IVF serving"
    )
