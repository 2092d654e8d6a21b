#!/usr/bin/env python
"""1M-scale graph-engine benchmark: packed traversal vs plain vs CPU
(VERDICT r1 item 2: graph-mode >= 2x CPU QPS at 1M, recall >= CPU at equal
ef). Same synthetic clustered recipe as BASELINE.md's 1M row."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from pg_embedding_tpu import HnswConfig, HnswIndex  # noqa: E402
from pg_embedding_tpu.core.search import (  # noqa: E402
    search_graph, search_graph_packed)
from pg_embedding_tpu.utils.cpu_ref import CpuRefIndex  # noqa: E402

N, DIMS, M, EFC, EFS, K, NQ, REPS = 1_000_000, 128, 16, 64, 64, 10, 1024, 8
# rebuilt indexes are identical (deterministic build); cache across runs so
# perf experiments don't pay the ~7 min TPU + ~4 min CPU builds every time
CACHE_IDX = "/tmp/bench1m_idx.npz"
CACHE_CPU = "/tmp/bench1m_cpu.json"


def log(msg):
    print(msg, flush=True)


def recall(ids, oracle):
    return float(np.mean([
        len(set(ids[r][:K].tolist()) & set(oracle[r][:K].tolist())) / K
        for r in range(ids.shape[0])]))


def main():
    rng = np.random.default_rng(777)
    n_centers = 10_000
    centers = rng.normal(scale=4.0, size=(n_centers, DIMS)).astype(np.float32)
    assign = rng.integers(0, n_centers, N)
    pts = (centers[assign] +
           rng.normal(size=(N, DIMS)).astype(np.float32)).astype(np.float32)
    qs = (centers[rng.integers(0, n_centers, NQ)] +
          rng.normal(size=(NQ, DIMS)).astype(np.float32)).astype(np.float32)

    cfg = HnswConfig(dims=DIMS, m=M, ef_construction=EFC, ef_search=EFS)
    if os.path.exists(CACHE_IDX):
        idx = HnswIndex.load(CACHE_IDX)
        log(f"loaded cached index ({idx.n_nodes} nodes)")
    else:
        idx = HnswIndex(cfg, initial_capacity=N + 256)
        t0 = time.time()
        idx.build(pts, np.arange(N))
        np.asarray(idx.graph.n_nodes)
        log(f"TPU build: {N / (time.time() - t0):.0f} vec/s")
        idx.save(CACHE_IDX)

    _, ol, _ = idx.exact_search(qs, K)
    oracle = ol.astype(np.int64)
    qdev = jnp.asarray(qs)

    # CPU reference
    if os.path.exists(CACHE_CPU):
        with open(CACHE_CPU) as f:
            cj = json.load(f)
        cpu_qps = cj["qps"]
        log(f"cached CPU: {cpu_qps:.0f} QPS, recall {cj['recall']:.4f}, "
            f"build {cj['build_vps']:.0f} vec/s")
    else:
        cpu = CpuRefIndex(DIMS, m=M, ef_construction=EFC)
        t0 = time.time()
        cpu.build(pts, np.arange(N))
        cpu_build = N / (time.time() - t0)
        log(f"CPU build: {cpu_build:.0f} vec/s")
        got = np.stack([cpu.search(q, EFS)[1][:K] for q in qs[:256]])
        cpu_rec = recall(got, oracle[:256])
        log(f"CPU recall: {cpu_rec:.4f}")
        t0 = time.time()
        for q in qs[:512]:
            cpu.search(q, EFS)
        cpu_qps = 512 / (time.time() - t0)
        log(f"CPU QPS: {cpu_qps:.0f}")
        with open(CACHE_CPU, "w") as f:
            json.dump({"qps": cpu_qps, "recall": cpu_rec,
                       "build_vps": cpu_build}, f)

    # plain graph
    d, i, _ = search_graph(idx.graph, qdev, ef=EFS, metric_value=0,
                           expand_width=4)
    log(f"TPU plain recall: {recall(np.asarray(i), oracle):.4f}")
    t0 = time.time()
    for _ in range(REPS):
        d, i, _ = search_graph(idx.graph, qdev, ef=EFS, metric_value=0,
                               expand_width=4)
    np.asarray(d)
    qps = REPS * NQ / (time.time() - t0)
    log(f"TPU plain T=4: {qps:.0f} QPS ({qps / cpu_qps:.2f}x CPU)")

    # packed records
    idx.packed_traversal = True
    pc, ps = idx._ensure_packed()
    np.asarray(pc[0, 0])
    for t in (4, 8):
        d, i, _ = search_graph_packed(idx.graph, qdev, pc, ps, ef=EFS,
                                      metric_value=0, expand_width=t)
        r = recall(np.asarray(i), oracle)
        t0 = time.time()
        for _ in range(REPS):
            d, i, _ = search_graph_packed(idx.graph, qdev, pc, ps, ef=EFS,
                                          metric_value=0, expand_width=t)
        np.asarray(d)
        qps = REPS * NQ / (time.time() - t0)
        log(f"TPU packed T={t}: {qps:.0f} QPS, recall {r:.4f} "
            f"({qps / cpu_qps:.2f}x CPU)")


if __name__ == "__main__":
    main()
