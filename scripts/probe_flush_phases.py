"""Profile the engine commit (memtable -> flat segment) phase by phase.

The 1M x 128 engine probe measured flush at 262-445 s — this isolates which
of the ~8 full-table host passes (stack, finite-check, k-means assign,
reorder, rnorm2, stats, CRC+concat, open) carries the cost on this host.

Usage: python scripts/probe_flush_phases.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
D = 128


def log(m):
    print(m, file=sys.stderr, flush=True)


t_all = time.perf_counter()
rng = np.random.default_rng(42)
x = rng.standard_normal((N, D)).astype(np.float32)
ids = np.arange(1, N + 1, dtype=np.int64)
lsns = np.arange(N, dtype=np.int64)
log(f"corpus ready {time.perf_counter()-t_all:.1f}s")

from vecgo_tpu.engine.memtable import MemTable
from vecgo_tpu.model import Metric

mem = MemTable(D, Metric.L2)
t0 = time.perf_counter()
mem.insert_block(x, 1, 0)
log(f"memtable insert_block       {time.perf_counter()-t0:6.1f}s")

t0 = time.perf_counter()
live_rows, vecs, rids, mlsns, docs, pays = mem.export_live()
log(f"export_live                 {time.perf_counter()-t0:6.1f}s")

from vecgo_tpu.index.flat import FlatWriter
from vecgo_tpu.index import common

w = FlatWriter(D, Metric.L2, ivf_partitions=N // 8192)
t0 = time.perf_counter()
w.add_batch(vecs, rids, docs, pays, mlsns)
log(f"writer.add_batch            {time.perf_counter()-t0:6.1f}s")

# ---- finish(), unbundled ----
t0 = time.perf_counter()
xs, _ = w._rows.stacked(w.metric)
log(f"rows.stacked #1             {time.perf_counter()-t0:6.1f}s")

from vecgo_tpu.quantization import kmeans as km

t0 = time.perf_counter()
cents, _ = km.train_kmeans(xs, w.ivf_partitions, seed=42, sample=w.train_sample)
log(f"kmeans train                {time.perf_counter()-t0:6.1f}s")
t0 = time.perf_counter()
assign, _ = km.assign_partitions(xs, cents)
log(f"kmeans assign (full table)  {time.perf_counter()-t0:6.1f}s")
t0 = time.perf_counter()
order = np.argsort(assign, kind="stable")
log(f"argsort                     {time.perf_counter()-t0:6.1f}s")
t0 = time.perf_counter()
w._rows.reorder(order)
log(f"rows.reorder (permute)      {time.perf_counter()-t0:6.1f}s")

t0 = time.perf_counter()
xs2, ids2 = w._rows.stacked(w.metric)
log(f"rows.stacked #2             {time.perf_counter()-t0:6.1f}s")

t0 = time.perf_counter()
sections, md_meta, cm = common.row_sections(
    xs2, ids2, w._rows.docs, w._rows.payloads, w._rows.lsns
)
log(f"row_sections (norms+CSRs)   {time.perf_counter()-t0:6.1f}s")

from vecgo_tpu.index.flat import segment_stats

t0 = time.perf_counter()
stats = segment_stats(xs2, cm)
log(f"segment_stats               {time.perf_counter()-t0:6.1f}s")

from vecgo_tpu.storage import container

sections["ivf.centroids"] = np.asarray(cents)
sections["ivf.part"] = np.asarray(assign)[order].astype(np.int32)
from vecgo_tpu.index.flat import SEGMENT_KIND

meta = {"kind": SEGMENT_KIND, "dim": D, "metric": "l2", "count": N,
        "quantizer": {"kind": "none", "params": {}},
        "ivf": {"partitions": int(w.ivf_partitions)}, "metadata": md_meta,
        "stats": stats}
t0 = time.perf_counter()
data = container.pack_container(meta, sections, compress=None)
log(f"pack_container (CRC+concat) {time.perf_counter()-t0:6.1f}s  ({len(data)/1e6:.0f} MB)")

from vecgo_tpu.index.flat import FlatSegment

t0 = time.perf_counter()
seg = FlatSegment.open(data, 0, verify_checksum=False)
log(f"FlatSegment.open            {time.perf_counter()-t0:6.1f}s")

log(f"TOTAL                       {time.perf_counter()-t_all:6.1f}s")
