#!/usr/bin/env python
"""Root-cause follow-up for the powerlaw recall drop (bench_distributions:
graph recall@10 0.608 @ ef=64, 0.744 @ ef=128 at 1M x 128d).

Hypothesis: zipf_a=1.3 over 50k centers puts ~25% of the corpus in ONE
Gaussian mega-cluster (~250k unit-sigma points around one center), so a
Zipf-weighted query's true top-10 are ultra-fine distinctions among
hundreds of thousands of near-equidistant rows — hard for ANY beam-search
graph at m=16, not a defect of this engine.  Three measurements decide:

1. ef-scaling: if recall climbs smoothly with ef (no plateau), the graph
   is navigable and the drop is the standard hard-data ef/recall price.
2. The CPU reference (csrc/hnsw_ref.cpp, same semantics as
   /root/reference/hnswalg.cpp) on the SAME rows/queries at the same
   m/efc: if it degrades at least as much, the behavior is
   reference-faithful, not a TPU-engine regression.
3. The auto route at 1M serves the EXACT sweep (crossover 5.5M), so the
   production answer on this family is recall 1.0 regardless — measure
   its QPS for the table.

Run: nohup python benchmarks/bench_powerlaw_followup.py > /tmp/bench_plaw.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from pg_embedding_tpu import HnswConfig, HnswIndex  # noqa: E402
from pg_embedding_tpu.core.search import search_graph  # noqa: E402
from pg_embedding_tpu.utils.io import synthetic_powerlaw  # noqa: E402

N = int(os.environ.get("PLAW_N", 1_000_000))
DIMS, M, EFC, K, NQ, REPS = 128, 16, 64, 10, 1024, 4


def log(msg):
    print(msg, flush=True)


def recall(ids, oracle):
    return float(np.mean([
        len(set(ids[r][:K].tolist()) & set(oracle[r][:K].tolist())) / K
        for r in range(ids.shape[0])]))


def main():
    pts, qs = synthetic_powerlaw(N, DIMS, n_centers=50_000, seed=4242,
                                 n_queries=NQ)
    cfg = HnswConfig(dims=DIMS, m=M, ef_construction=EFC, ef_search=64)
    idx = HnswIndex(cfg, initial_capacity=N + 256, max_insert_batch=256)
    t0 = time.time()
    idx.add(pts)
    np.asarray(idx.graph.n_nodes)
    log(f"build: {N / (time.time() - t0):.0f} vec/s")

    out = {"n": N}
    qdev = jnp.asarray(qs)
    _, ol, _ = idx.exact_search(qs, K)
    oracle = ol.astype(np.int64)

    # (3) the production answer at 1M: auto -> exact sweep, recall 1.0
    t0 = time.time()
    for _ in range(REPS):
        d, i, _ = idx.exact_search(qs, K)
    qps = REPS * NQ / (time.time() - t0)
    log(f"exact sweep (the 1M auto route): {qps:.0f} QPS, recall 1.0")
    out["exact_qps"] = round(qps, 1)

    # (1) ef-scaling on the graph walk
    mv = cfg.metric.value
    g = idx.graph
    for ef in (64, 128, 256, 512):
        d, i, _ = search_graph(g, qdev, ef=ef, metric_value=mv,
                               expand_width=8)
        r = recall(np.asarray(i), oracle)
        t0 = time.time()
        for _ in range(REPS):
            d, i, _ = search_graph(g, qdev, ef=ef, metric_value=mv,
                                   expand_width=8)
        np.asarray(d)
        qps = REPS * NQ / (time.time() - t0)
        log(f"graph T=8 ef={ef}: {qps:.0f} QPS, recall@10 {r:.4f}")
        out[f"graph_ef{ef}_qps"] = round(qps, 1)
        out[f"graph_ef{ef}_recall"] = round(r, 4)
    del idx

    # (2) the CPU reference on the same rows/queries (quiet host: the TPU
    # phase above has fully drained before this starts)
    if os.environ.get("SKIP_CPU") != "1":
        from pg_embedding_tpu.utils.cpu_ref import CpuRefIndex
        cpu = CpuRefIndex(DIMS, m=M, ef_construction=EFC, metric=mv)
        t0 = time.time()
        cpu.build(pts, np.arange(N))
        log(f"CPU build: {N / (time.time() - t0):.0f} vec/s "
            f"({(time.time() - t0) / 60:.1f} min)")
        for ef in (64, 128):
            got = np.stack([cpu.search(q, ef)[1][:K] for q in qs[:256]])
            r = recall(got, oracle[:256])
            t0 = time.time()
            for q in qs[:512]:
                cpu.search(q, ef)
            qps = 512 / (time.time() - t0)
            log(f"CPU ef={ef}: {qps:.0f} QPS, recall@10 {r:.4f}")
            out[f"cpu_ef{ef}_qps"] = round(qps, 1)
            out[f"cpu_ef{ef}_recall"] = round(r, 4)
    log(json.dumps(out))


if __name__ == "__main__":
    main()
