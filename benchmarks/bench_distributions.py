#!/usr/bin/env python
"""Distribution robustness at 1M (VERDICT r3 item 5): every BASELINE
number rides one benign Gaussian-cluster generator; this sweep builds 1M
indexes over three adversarial families (correlated low-rank dims,
power-law cluster sizes, duplicate-heavy) and measures graph recall/QPS
per family.  On the correlated family it also prices PQ with and without
OPQ — the regime the rotation was built for (ops/pq.train_opq).

Run on the real chip:
  nohup python benchmarks/bench_distributions.py > /tmp/bench_dist.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from pg_embedding_tpu import HnswConfig, HnswIndex  # noqa: E402
from pg_embedding_tpu.core.search import search_graph, search_graph_pq  # noqa: E402
from pg_embedding_tpu.utils.io import (  # noqa: E402
    synthetic_clustered, synthetic_correlated, synthetic_duplicates,
    synthetic_powerlaw)

N = int(os.environ.get("DIST_N", 1_000_000))
DIMS, M, EFC, K, NQ, REPS = 128, 16, 64, 10, 1024, 4

FAMILIES = {
    "clustered": lambda: synthetic_clustered(
        N, DIMS, n_centers=50_000, seed=4242, n_queries=NQ),
    "correlated_r8": lambda: synthetic_correlated(
        N, DIMS, rank=8, n_centers=50_000, seed=4242, n_queries=NQ),
    "correlated_r32": lambda: synthetic_correlated(
        N, DIMS, rank=32, n_centers=50_000, seed=4242, n_queries=NQ),
    "powerlaw": lambda: synthetic_powerlaw(
        N, DIMS, n_centers=50_000, seed=4242, n_queries=NQ),
    "duplicates": lambda: synthetic_duplicates(
        N, DIMS, n_centers=50_000, seed=4242, n_queries=NQ),
}


def log(msg):
    print(msg, flush=True)


def recall(ids, oracle):
    return float(np.mean([
        len(set(ids[r][:K].tolist()) & set(oracle[r][:K].tolist())) / K
        for r in range(ids.shape[0])]))


def serve(fn, label, oracle, out, key):
    d, i, _ = fn()
    r = recall(np.asarray(i), oracle)
    t0 = time.time()
    for _ in range(REPS):
        d, i, _ = fn()
    np.asarray(d)
    qps = REPS * NQ / (time.time() - t0)
    log(f"  {label}: {qps:.0f} QPS, recall@10 {r:.4f}")
    out[f"{key}_qps"] = round(qps, 1)
    out[f"{key}_recall"] = round(r, 4)


def main():
    results = {}
    only = os.environ.get("DIST_FAMILY")
    for name, gen in FAMILIES.items():
        if only and name != only:
            continue
        log(f"=== family {name} (N={N}) ===")
        pts, qs = gen()
        cfg = HnswConfig(dims=DIMS, m=M, ef_construction=EFC, ef_search=64)
        # pre-size: doubling growth would recompile the slab programs at
        # every capacity grain; pre-sized, all five families share one
        # compiled program set (only the first pays the compile)
        idx = HnswIndex(cfg, initial_capacity=N + 256, max_insert_batch=256)
        t0 = time.time()
        idx.add(pts)
        np.asarray(idx.graph.n_nodes)
        rate = N / (time.time() - t0)
        log(f"  build: {rate:.0f} vec/s")
        out = {"build_vps": round(rate, 0)}
        del pts

        qdev = jnp.asarray(qs)
        _, ol, _ = idx.exact_search(qs, K)
        oracle = ol.astype(np.int64)
        mv = cfg.metric.value
        g = idx.graph
        for ef in (64, 128):
            serve(lambda ef=ef: search_graph(
                g, qdev, ef=ef, metric_value=mv, expand_width=8),
                f"graph T=8 ef={ef}", oracle, out, f"graph_ef{ef}")

        if name.startswith("correlated"):
            # PQ distortion vs OPQ on the family built for it
            for opq in (False, True):
                idx.packed_traversal = True
                idx.packed_dtype = "pq"
                idx.pq_groups = 16
                idx.pq_opq = opq
                idx._pq_codebook = None
                idx._pq_rot = None
                idx._pq_codes = None
                idx._pcodes = None
                t0 = time.time()
                pc, _ = idx._ensure_packed()
                np.asarray(pc[0, 0])
                log(f"  pq pack opq={opq}: {time.time() - t0:.1f}s")
                cb, rot = idx._pq_codebook, idx._pq_rot
                serve(lambda: search_graph_pq(
                    g, qdev, pc, cb, rot, ef=64, metric_value=mv,
                    expand_width=8),
                    f"pq G=16 opq={opq} T=8 ef=64", oracle, out,
                    f"pq16_opq{int(opq)}")
                idx._pcodes = None
                pc = None

        results[name] = out
        del idx
    log(json.dumps(results))


if __name__ == "__main__":
    main()
