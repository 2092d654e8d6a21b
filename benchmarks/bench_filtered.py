#!/usr/bin/env python
"""Filtered-search performance across selectivities (VERDICT r3 item 8).

At 1M x 128d, measures `where=` serving at allowed fractions 50% / 10% /
1% via (a) the graph walk + progressive widening and (b) the masked exact
sweep, to pin the `filter_exact_selectivity` router threshold.  The graph
path's cost grows as the filter tightens (excluded waypoints occupy beam
slots; the widening loop re-searches at doubled ef), while the sweep is
selectivity-independent — the open question is WHERE they cross.

Run: nohup python benchmarks/bench_filtered.py > /tmp/bench_filtered.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg_embedding_tpu import HnswConfig, HnswIndex  # noqa: E402
from pg_embedding_tpu.utils.io import synthetic_clustered  # noqa: E402

N = int(os.environ.get("FILT_N", 1_000_000))
DIMS, M, EFC, K, NQ, REPS = 128, 16, 64, 10, 1024, 4
ALLOWED_FRACS = (0.5, 0.1, 0.01)


def log(msg):
    print(msg, flush=True)


def recall(l, v, le, ve):
    return float(np.mean([
        len(set(l[r][v[r]].tolist()) & set(le[r][ve[r]].tolist()))
        / max(ve[r].sum(), 1) for r in range(l.shape[0])]))


def main():
    pts, qs = synthetic_clustered(N, DIMS, n_centers=50_000, seed=4242,
                                  n_queries=NQ)
    cfg = HnswConfig(dims=DIMS, m=M, ef_construction=EFC, ef_search=64)
    # pre-sized: doubling growth recompiles every slab program per grain
    idx = HnswIndex(cfg, initial_capacity=N + 256, max_insert_batch=256)
    t0 = time.time()
    idx.add(pts)
    np.asarray(idx.graph.n_nodes)
    log(f"build: {N / (time.time() - t0):.0f} vec/s")
    del pts

    rng = np.random.default_rng(7)
    out = {"n": N}
    for frac in ALLOWED_FRACS:
        mask = rng.random(N) < frac
        log(f"--- allowed fraction {frac:.0%} ({int(mask.sum())} rows) ---")
        # filtered oracle = masked exact sweep (recall 1.0 by construction)
        de, le, ve = idx.search(qs, K, mode="exact", where=mask)

        t0 = time.time()
        for _ in range(REPS):
            de2, le2, ve2 = idx.search(qs, K, mode="exact", where=mask)
        qps_e = REPS * NQ / (time.time() - t0)
        log(f"  exact masked sweep: {qps_e:.0f} QPS (recall 1.0)")

        dg, lg, vg = idx.search(qs, K, mode="graph", where=mask)
        rg = recall(lg, vg, le, ve)
        wid0 = idx.counters["n_widenings"]
        t0 = time.time()
        for _ in range(REPS):
            dg, lg, vg = idx.search(qs, K, mode="graph", where=mask)
        qps_g = NQ * REPS / (time.time() - t0)
        wid = (idx.counters["n_widenings"] - wid0) / REPS
        log(f"  graph+widening: {qps_g:.0f} QPS, recall {rg:.4f}, "
            f"{wid:.1f} widenings/batch")
        key = f"f{int(frac * 100)}"
        out[f"{key}_exact_qps"] = round(qps_e, 1)
        out[f"{key}_graph_qps"] = round(qps_g, 1)
        out[f"{key}_graph_recall"] = round(rg, 4)
        out[f"{key}_widenings"] = round(wid, 1)
    log(json.dumps(out))


if __name__ == "__main__":
    main()
