#!/usr/bin/env python
"""Filtered-search crossover at GRAPH-served scale (12.5M x 96d).

bench_filtered.py measured 1M, where the masked exact sweep dominates at
every selectivity (1M is exact-route territory unfiltered too).  The
`filter_exact_selectivity` router threshold only matters past the
~5.5M auto crossover, where the graph is the unfiltered winner: this
harness loads the cached 12.5M shard (bench_shard125) and measures the
masked sweep vs graph+widening at 50% / 25% / 10% allowed.

Run: nohup python benchmarks/bench_filtered125.py > /tmp/bench_f125.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg_embedding_tpu import HnswIndex  # noqa: E402

K, NQ, REPS = 10, 1024, 4
CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache", "bench_shard125_idx.npz")


def log(msg):
    print(msg, flush=True)


def recall(l, v, le, ve):
    return float(np.mean([
        len(set(l[r][v[r]].tolist()) & set(le[r][ve[r]].tolist()))
        / max(ve[r].sum(), 1) for r in range(l.shape[0])]))


def main():
    if not os.path.exists(CACHE):
        raise SystemExit(f"no cached 12.5M shard at {CACHE} — run "
                         f"benchmarks/bench_shard125.py first")
    # regenerate bench_shard125's query stream (same rng pipeline)
    rng = np.random.default_rng(12_5)
    DIMS, N = 96, 12_500_000
    centers = rng.normal(scale=4.0, size=(50_000, DIMS)).astype(np.float32)
    for off in range(0, N, 1_000_000):
        take = min(1_000_000, N - off)
        rng.integers(0, 50_000, take)
        rng.normal(size=(take, DIMS))
    qs = (centers[rng.integers(0, 50_000, NQ)] +
          rng.normal(size=(NQ, DIMS)).astype(np.float32)).astype(np.float32)

    idx = HnswIndex.load(CACHE)
    idx._qvec = idx._qscale = None
    idx._qvec_rows = 0
    log(f"loaded {idx.n_nodes:,} nodes")

    frng = np.random.default_rng(7)
    out = {"n": idx.n_nodes}
    fracs = tuple(float(x) for x in os.environ.get(
        "F125_FRACS", "0.5,0.25,0.1").split(","))
    for frac in fracs:
        mask = frng.random(idx.n_nodes) < frac
        log(f"--- allowed {frac:.0%} ({int(mask.sum()):,} rows) ---")
        de, le, ve = idx.search(qs, K, mode="exact", where=mask)
        t0 = time.time()
        for _ in range(REPS):
            idx.search(qs, K, mode="exact", where=mask)
        qps_e = REPS * NQ / (time.time() - t0)
        log(f"  masked exact sweep: {qps_e:.0f} QPS (recall 1.0)")

        dg, lg, vg = idx.search(qs, K, mode="graph", where=mask)
        rg = recall(lg, vg, le, ve)
        w0 = idx.counters["n_widenings"]
        t0 = time.time()
        for _ in range(REPS):
            dg, lg, vg = idx.search(qs, K, mode="graph", where=mask)
        qps_g = NQ * REPS / (time.time() - t0)
        wid = (idx.counters["n_widenings"] - w0) / REPS
        log(f"  graph+widening: {qps_g:.0f} QPS, recall {rg:.4f}, "
            f"{wid:.1f} widenings/batch")
        key = f"f{int(frac * 100)}"
        out[f"{key}_exact_qps"] = round(qps_e, 1)
        out[f"{key}_graph_qps"] = round(qps_g, 1)
        out[f"{key}_graph_recall"] = round(rg, 4)
    log(json.dumps(out))


if __name__ == "__main__":
    main()
