"""Pallas TPU kernel: fused exact L2 scan + in-kernel top-k.

The TPU-native replacement for the reference's hot flat-scan kernels
(internal/simd SquaredL2Batch + heap push, flat/segment.go:487-560): one kernel
computes the [B_tile, N_tile] distance tile on the MXU and maintains a running
per-query top-k entirely in VMEM scratch — scores never round-trip to HBM.

Where it sits vs the XLA path (ops/topk.py):
- `approx_min_k` (XLA) is the fastest selector but approximate;
- exact `lax.top_k` over wide rows costs ~25 ms on [4096, 131072];
- this kernel is exact and avoids materializing scores in HBM: per corpus
  tile it extracts the tile top-k by iterative masked-min (k VPU reduces) and
  merges into the running list with an odd-even sorting network (no sort
  primitive needed inside kernels).

Grid: (B tiles, N tiles); N innermost so the running list lives in scratch
across a query tile's corpus sweep. Corpus tiles stream HBM->VMEM via the
standard pallas pipeline (double-buffered by the compiler).

Falls back to interpret mode off-TPU (the `noasm`/VECGO_SIMD-generic analogue;
equivalence-tested against the jnp reference in tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Plain Python float: a jnp scalar would be captured as a kernel constant
# (pallas requires constants to be inputs).
_BIG = 3.0e38


def _merge_sorted_2k(d, i, k: int):
    """Sort [B, 2k] -> top-k via an odd-even transposition network.

    Pallas-safe: only rolls + elementwise selects (no sort/gather primitives
    inside kernels). 2k rounds of compare-exchange; k is small (10-64)."""
    b, w = d.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)

    # lax.fori_loop, not lax.scan: Mosaic's in-kernel loop lowering only
    # accepts fori-style loops (a scan with array carries fails to lower on
    # real TPU with "not a fori_loop index" — invisible in interpret mode).
    def oe_round(r, state):
        dd, ii = state
        parity = r % 2
        right_d = jnp.roll(dd, -1, axis=1)
        right_i = jnp.roll(ii, -1, axis=1)
        left_d = jnp.roll(dd, 1, axis=1)
        left_i = jnp.roll(ii, 1, axis=1)
        is_left = (cols % 2) == parity  # left element of its pair
        has_partner = jnp.where(is_left, cols + 1 < w, cols - 1 >= 0)
        pd = jnp.where(is_left, right_d, left_d)
        pi = jnp.where(is_left, right_i, left_i)
        # Left keeps the min of the pair, right keeps the max.
        take = jnp.where(is_left, pd < dd, pd > dd) & has_partner
        dd = jnp.where(take, pd, dd)
        ii = jnp.where(take, pi, ii)
        return (dd, ii)

    d, i = jax.lax.fori_loop(0, w, oe_round, (d, i))
    return d[:, :k], i[:, :k]


def _tile_topk(scores, base, k: int):
    """Top-k smallest of a [B, T] tile by iterative masked min (k VPU reduces).
    Returns sorted (d [B,k], global ids [B,k])."""
    b, t = scores.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)

    # fori_loop for Mosaic lowering (see _merge_sorted_2k); the loop index
    # doubles as the output slot.
    def pick(slot, state):
        s, outd, outi = state
        m = jnp.min(s, axis=1, keepdims=True)
        is_min = s == m
        # First minimizing column via a second min-reduce over column ids
        # (cumsum is not lowerable by Mosaic).
        idx = jnp.min(jnp.where(is_min, cols, t), axis=1)
        first = cols == idx[:, None]
        outd = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, k), 1) == slot, m, outd
        )
        outi = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, k), 1) == slot,
            (idx + base)[:, None],
            outi,
        )
        s = jnp.where(first, _BIG, s)
        return (s, outd, outi)

    outd = jnp.full((b, k), _BIG, jnp.float32)
    outi = jnp.full((b, k), -1, jnp.int32)
    _, outd, outi = jax.lax.fori_loop(0, k, pick, (scores, outd, outi))
    return outd, outi


def _scan_kernel(q_ref, x_ref, rn_ref, outd_ref, outi_ref, run_d, run_i, *, k, tile_n, n_valid):
    ni = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(ni == 0)
    def _():
        run_d[:] = jnp.full_like(run_d, _BIG)
        run_i[:] = jnp.full_like(run_i, -1)

    q = q_ref[:]  # [TB, d] f32
    x = x_ref[:]  # [TILE_N, d] f32
    rn = rn_ref[:]  # [1, TILE_N] f32
    qn = jnp.sum(q * q, axis=1, keepdims=True)
    prod = jax.lax.dot_general(
        q, x, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    scores = qn + rn - 2.0 * prod
    base = ni * tile_n
    # Mask padded corpus rows.
    cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
    scores = jnp.where(cols < n_valid, scores, _BIG)

    tile_d, tile_i = _tile_topk(scores, base, k)
    md = jnp.concatenate([run_d[:], tile_d], axis=1)
    mi = jnp.concatenate([run_i[:], tile_i], axis=1)
    md, mi = _merge_sorted_2k(md, mi, k)
    run_d[:] = md
    run_i[:] = mi

    @pl.when(ni == n_tiles - 1)
    def _():
        outd_ref[:] = run_d[:]
        outi_ref[:] = run_i[:]


@functools.partial(
    jax.jit, static_argnames=("k", "tile_b", "tile_n", "interpret")
)
def pallas_l2_topk(
    q,  # [B, d] f32
    x,  # [N, d] f32 (N padded to tile_n multiple by caller or here)
    rnorm2,  # [N] f32
    k: int = 10,
    tile_b: int = 512,
    tile_n: int = 2048,
    interpret: bool = False,
):
    """Exact L2 top-k via the fused Pallas kernel. Returns (d [B,k], i [B,k])."""
    b, d = q.shape
    n = x.shape[0]
    pad_b = (-b) % tile_b
    pad_n = (-n) % tile_n
    if pad_b:
        q = jnp.pad(q, ((0, pad_b), (0, 0)))
    if pad_n:
        x = jnp.pad(x, ((0, pad_n), (0, 0)))
        rnorm2 = jnp.pad(rnorm2, (0, pad_n))
    bp, np_ = q.shape[0], x.shape[0]

    grid = (bp // tile_b, np_ // tile_n)
    kernel = functools.partial(_scan_kernel, k=k, tile_n=tile_n, n_valid=n)
    outd, outi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, d), lambda bi, ni: (bi, 0)),
            pl.BlockSpec((tile_n, d), lambda bi, ni: (ni, 0)),
            pl.BlockSpec((1, tile_n), lambda bi, ni: (0, ni)),
        ],
        out_specs=(
            pl.BlockSpec((tile_b, k), lambda bi, ni: (bi, 0)),
            pl.BlockSpec((tile_b, k), lambda bi, ni: (bi, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, k), jnp.float32),
            jax.ShapeDtypeStruct((bp, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_b, k), jnp.float32),
            pltpu.VMEM((tile_b, k), jnp.int32),
        ],
        interpret=interpret,
    )(q, x, rnorm2.reshape(1, -1))
    outd = outd[:b]
    outi = outi[:b]
    return jnp.where(outd >= _BIG, jnp.inf, outd), jnp.where(
        outd >= _BIG, -1, outi
    )


def l2_topk(q, x, rnorm2=None, k: int = 10, tile_b: int = 512, tile_n: int = 2048):
    """Convenience wrapper: compiled on TPU, interpret mode elsewhere (the
    VECGO_SIMD=generic / noasm analogue)."""
    if rnorm2 is None:
        rnorm2 = jnp.sum(jnp.asarray(x, jnp.float32) ** 2, axis=1)
    interpret = jax.default_backend() != "tpu"
    tile_b = min(tile_b, max(8, q.shape[0]))
    tile_n = min(tile_n, max(128, x.shape[0]))
    return pallas_l2_topk(
        q, x, rnorm2, k=k, tile_b=tile_b, tile_n=tile_n, interpret=interpret
    )


# ---------------------------------------------------------------------------
# Fused coded-IVF group scan (serving path, ops/ivf.IVFCodedTable)
# ---------------------------------------------------------------------------


def _coded_scan_kernel(
    qrs_ref, qrn_ref, codes_ref, bn_ref, scale_ref, ld_ref, lc_ref,
    *, kk, group,
):
    """One cluster GROUP per grid step: for each cluster, score its [qcap]
    probing queries against the [S] SQ8 residual codes on the MXU and keep
    the per-(query, cluster) top-kk entirely in VMEM — the [qcap, S] distance
    tile never reaches HBM (it is ~8x the size of every other operand and was
    the XLA scan's dominant traffic, docs/PERF.md round-2 ablation).

    Centroid subtraction happens upstream (XLA fuses it into the query
    gather); the per-cluster dequant scale arrives as [ngroups, 1, group] so
    its block's trailing dims EQUAL the array's — Mosaic's (8,128) VMEM
    block-tiling rule rejects a [1, group] slice of a [ngroups, group] array
    (the r3 real-chip lowering failure interpret mode cannot catch; this
    jax's Mosaic applies the same check to SMEM blocks). Scaling the f32
    product AFTER the bf16 matmul keeps bit-identical results with the XLA
    scan (prescaling qr would round differently through the bf16 cast)."""
    for c in range(group):  # static unroll; group is small (4-8)
        qrs = qrs_ref[0, c]  # [qcap, d] f32 query residuals (q - cent)
        qrn = qrn_ref[0, c]  # [qcap] f32 |q - cent|²
        x = codes_ref[0, c].astype(jnp.bfloat16)  # [S, d]
        prod = jax.lax.dot_general(
            qrs.astype(jnp.bfloat16), x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [qcap, S]
        sc = scale_ref[0, 0, c]
        dd = qrn[:, None] + bn_ref[0, c][None, :] - 2.0 * (sc * prod)
        tile_d, tile_i = _tile_topk(dd, 0, kk)
        ld_ref[0, c] = tile_d
        lc_ref[0, c] = tile_i


@functools.partial(
    jax.jit, static_argnames=("kk", "group", "interpret")
)
def pallas_coded_group_scan(
    qv,  # [ngroups, group, qcap, d] f32: probing queries per cluster
    codes,  # [ngroups, group, S, d] int8 residual codes
    bn,  # [ngroups, group, S] f32 (+inf = masked/padded slot)
    scale,  # [ngroups, group] f32 per-cluster dequant scale
    cent,  # [ngroups, group, d] f32 centroids
    kk: int,
    group: int,
    interpret: bool = False,
):
    """Fused scan+top-k over the blocked coded layout. Returns
    (ld [ngroups, group, qcap, kk] f32, lc [.., kk] i32 in-cluster columns)."""
    ngroups, g, qcap, d = qv.shape
    s = codes.shape[2]
    # Centroid subtraction on the query side (XLA fuses this into the
    # upstream gather): dd = |q-c|² + bn - 2·sc·((q-c)·codes).
    qr = qv - cent[:, :, None, :]
    qrn = jnp.sum(qr * qr, axis=-1)  # [ngroups, group, qcap]
    kernel = functools.partial(_coded_scan_kernel, kk=kk, group=group)
    return pl.pallas_call(
        kernel,
        grid=(ngroups,),
        in_specs=[
            pl.BlockSpec((1, group, qcap, d), lambda gi: (gi, 0, 0, 0)),
            pl.BlockSpec((1, group, qcap), lambda gi: (gi, 0, 0)),
            pl.BlockSpec((1, group, s, d), lambda gi: (gi, 0, 0, 0)),
            pl.BlockSpec((1, group, s), lambda gi: (gi, 0, 0)),
            pl.BlockSpec((1, 1, group), lambda gi: (gi, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, group, qcap, kk), lambda gi: (gi, 0, 0, 0)),
            pl.BlockSpec((1, group, qcap, kk), lambda gi: (gi, 0, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ngroups, group, qcap, kk), jnp.float32),
            jax.ShapeDtypeStruct((ngroups, group, qcap, kk), jnp.int32),
        ),
        interpret=interpret,
    )(qr, qrn, codes, bn, scale.reshape(ngroups, 1, g))
