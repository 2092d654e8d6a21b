#!/usr/bin/env python
"""WAL-on build overhead at 1M (VERDICT r3 item 7's measurement half).

The reference pays GenericXLog per insert and documents it as the
serialization price (embedding.c:651-686); here the analogous cost is an
fsync'd logical record per add() call.  Measures 1M x 128d build vec/s
with WAL off / WAL on / WAL on + auto-checkpoint (256 MB trigger), plus
the log size each policy leaves behind.

Run: nohup python benchmarks/bench_wal_overhead.py > /tmp/bench_wal.log 2>&1 &
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg_embedding_tpu import HnswConfig, HnswIndex  # noqa: E402
from pg_embedding_tpu.utils.io import synthetic_clustered  # noqa: E402

N = int(os.environ.get("WAL_N", 1_000_000))
DIMS, M, EFC = 128, 16, 64
AUTO_BYTES = 256 << 20


def log(msg):
    print(msg, flush=True)


def build(pts, wal_path=None, auto=None):
    cfg = HnswConfig(dims=DIMS, m=M, ef_construction=EFC, ef_search=64)
    idx = HnswIndex(cfg, max_insert_batch=256)
    if wal_path:
        idx.enable_wal(wal_path, auto_checkpoint_bytes=auto)
    t0 = time.time()
    idx.add(pts)
    np.asarray(idx.graph.n_nodes)
    dt = time.time() - t0
    size = os.path.getsize(wal_path) if wal_path else 0
    del idx
    return N / dt, size


def main():
    pts = synthetic_clustered(N, DIMS, n_centers=50_000, seed=4242)
    out = {"n": N}
    with tempfile.TemporaryDirectory() as td:
        # warm EVERY compile before any timed build: the r4 run timed the
        # cold-compile build as the WAL-off baseline and "measured" WAL on
        # as 2.7x FASTER than off (overhead_pct=-167.7) — pure compile
        # skew.  The warmup build is discarded.
        build(pts)
        r0, _ = build(pts)
        log(f"WAL off:              {r0:.0f} vec/s")
        r1, s1 = build(pts, os.path.join(td, "a.wal"))
        log(f"WAL on (unbounded):   {r1:.0f} vec/s, log {s1 / 1e9:.2f} GB")
        r2, s2 = build(pts, os.path.join(td, "b.wal"), auto=AUTO_BYTES)
        log(f"WAL on (auto-ckpt):   {r2:.0f} vec/s, log {s2 / 1e6:.1f} MB "
            f"(+ snapshot)")
    out.update(off_vps=round(r0), on_vps=round(r1),
               on_log_gb=round(s1 / 1e9, 2), auto_vps=round(r2),
               auto_log_mb=round(s2 / 1e6, 1),
               overhead_pct=round(100 * (1 - r1 / r0), 1))
    log(json.dumps(out))


if __name__ == "__main__":
    main()
