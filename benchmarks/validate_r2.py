#!/usr/bin/env python
"""Round-2 validation on the real TPU: oracle accuracy fix + packed
traversal perf at the bench config (100k, 128-d L2, m=16/efc=64/efs=64)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from pg_embedding_tpu import HnswConfig, HnswIndex  # noqa: E402
from pg_embedding_tpu.core.search import (  # noqa: E402
    search_graph, search_graph_packed)
from pg_embedding_tpu.ops.pallas_bruteforce import (  # noqa: E402
    pallas_exact_search)
from pg_embedding_tpu.utils.cpu_ref import CpuRefIndex  # noqa: E402

N, DIMS, M, EFC, EFS, K, NQ, REPS = 100_000, 128, 16, 64, 64, 10, 1024, 8


def log(msg):
    print(msg, flush=True)


def recall(ids, oracle):
    return float(np.mean([
        len(set(ids[r][:K].tolist()) & set(oracle[r][:K].tolist())) / K
        for r in range(ids.shape[0])]))


def main():
    rng = np.random.default_rng(12345)
    centers = rng.normal(scale=4.0, size=(1000, DIMS)).astype(np.float32)
    pts = (centers[rng.integers(0, 1000, N)] +
           rng.normal(size=(N, DIMS)).astype(np.float32)).astype(np.float32)
    qs = (centers[rng.integers(0, 1000, NQ)] +
          rng.normal(size=(NQ, DIMS)).astype(np.float32)).astype(np.float32)

    cfg = HnswConfig(dims=DIMS, m=M, ef_construction=EFC, ef_search=EFS)
    idx = HnswIndex(cfg, initial_capacity=N + 256)
    t0 = time.time()
    idx.build(pts, np.arange(N))
    np.asarray(idx.graph.n_nodes)
    log(f"build: {N / (time.time() - t0):.0f} vec/s")

    # --- oracle accuracy: fixed exact engine vs f64 numpy, 16 queries ----
    # (this host has ONE cpu core: keep the numpy oracle tiny and chunked)
    _, ol, _ = idx.exact_search(qs, K)
    oracle = ol.astype(np.int64)
    sub = 16
    np_oracle = np.zeros((sub, K), np.int64)
    for r in range(sub):
        d64 = ((pts - qs[r]).astype(np.float64) ** 2).sum(-1)
        np_oracle[r] = np.argsort(d64)[:K]
    log(f"exact vs f64 oracle: {recall(oracle[:sub], np_oracle):.4f}")

    # --- graph + CPU recall against the SAME fixed oracle ----------------
    qdev = jnp.asarray(qs)
    d, i, _ = search_graph(idx.graph, qdev, ef=EFS, metric_value=0,
                           expand_width=idx.search_expand_width)
    log(f"TPU graph recall:  {recall(np.asarray(i), oracle):.4f}")

    cpu = CpuRefIndex(DIMS, m=M, ef_construction=EFC)
    t0 = time.time()
    cpu.build(pts, np.arange(N))
    cpu_bs = time.time() - t0
    got = np.stack([cpu.search(q, EFS)[1][:K] for q in qs[:256]])
    log(f"CPU graph recall:  {recall(got, oracle[:256]):.4f} "
        f"(build {N / cpu_bs:.0f} vec/s)")
    t0 = time.time()
    for q in qs[:512]:
        cpu.search(q, EFS)
    cpu_qps = 512 / (time.time() - t0)
    log(f"CPU QPS: {cpu_qps:.0f}")

    # --- packed traversal: recall + streaming QPS ------------------------
    pk = HnswIndex(cfg, initial_capacity=N + 256, packed_traversal=True)
    pk._graph = idx.graph
    pk._labels = idx._labels
    pk._count = idx._count
    pc, ps = pk._ensure_packed()
    np.asarray(pc[0, 0])  # materialize records before timing

    for t in (4, 8):
        dd, ii, _ = search_graph_packed(pk.graph, qdev, pc, ps, ef=EFS,
                                        metric_value=0, expand_width=t)
        r = recall(np.asarray(ii), oracle)
        t0 = time.time()
        for _ in range(REPS):
            dd, ii, _ = search_graph_packed(pk.graph, qdev, pc, ps, ef=EFS,
                                            metric_value=0, expand_width=t)
        np.asarray(dd)
        qps = REPS * NQ / (time.time() - t0)
        log(f"packed T={t}: {qps:.0f} QPS, recall {r:.4f} "
            f"({qps / cpu_qps:.2f}x CPU)")

    # plain graph streaming QPS for comparison
    t0 = time.time()
    for _ in range(REPS):
        dd, ii, _ = search_graph(idx.graph, qdev, ef=EFS, metric_value=0,
                                 expand_width=4)
    np.asarray(dd)
    qps = REPS * NQ / (time.time() - t0)
    log(f"plain  T=4: {qps:.0f} QPS ({qps / cpu_qps:.2f}x CPU)")

    # exact sweep QPS with the rerank pad (headline guard)
    for _ in range(2):
        de, ie = pallas_exact_search(qdev, idx.graph.vectors, K,
                                     cfg.metric, n_valid=N,
                                     deleted=idx.graph.deleted)
    t0 = time.time()
    for _ in range(REPS):
        de, ie = pallas_exact_search(qdev, idx.graph.vectors, K,
                                     cfg.metric, n_valid=N,
                                     deleted=idx.graph.deleted)
    np.asarray(de)
    log(f"pallas exact: {REPS * NQ / (time.time() - t0):.0f} QPS")


if __name__ == "__main__":
    main()
