#!/usr/bin/env python
"""Recall-gap diagnosis (VERDICT r1 item 3): TPU graph recall 0.957 vs CPU
reference 0.993 at 100k, m=16/efc=64/efs=64.

Isolates build quality from search semantics by crossing engines over the
SAME graphs:
  A. CPU-built graph x TPU search   (search-semantics probe)
  B. TPU-built graph x TPU search   (status quo)
  C. B with cand_cap sweep          (candidate-queue truncation probe)
  D. B with expand_width sweep      (beam-widening probe)
  E. TPU build at different insert batch sizes (build-quality probe)

Usage: python benchmarks/diagnose_recall.py [--n 100000]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from pg_embedding_tpu import HnswConfig, HnswIndex  # noqa: E402
from pg_embedding_tpu.core.graph import GraphState, empty_graph  # noqa: E402
from pg_embedding_tpu.core.search import search_graph  # noqa: E402
from pg_embedding_tpu.utils.cpu_ref import CpuRefIndex  # noqa: E402

M, EFC, EFS, K, DIMS, NQ = 16, 64, 64, 10, 128, 1024


def log(msg):
    print(msg, flush=True)


def make_data(n, rng):
    n_centers = 1000
    centers = rng.normal(scale=4.0, size=(n_centers, DIMS)).astype(np.float32)
    assign = rng.integers(0, n_centers, n)
    pts = (centers[assign] +
           rng.normal(size=(n, DIMS)).astype(np.float32)).astype(np.float32)
    qassign = rng.integers(0, n_centers, NQ)
    qs = (centers[qassign] +
          rng.normal(size=(NQ, DIMS)).astype(np.float32)).astype(np.float32)
    return pts, qs


def recall(ids, oracle):
    return float(np.mean([
        len(set(ids[i][:K].tolist()) & set(oracle[i][:K].tolist())) / K
        for i in range(ids.shape[0])]))


def cpu_graph_to_state(cpu, pts, max_m):
    n = cpu.n_nodes
    g = empty_graph(n + 128, DIMS, max_m)
    links = np.full((g.capacity, max_m), -1, np.int32)
    cnts = np.zeros(g.capacity, np.int32)
    for i in range(n):
        row = cpu.links(i)
        links[i, : len(row)] = row
        cnts[i] = len(row)
    vec = np.zeros((g.capacity, DIMS), np.float32)
    vec[:n] = pts[:n]
    return GraphState(vectors=jnp.asarray(vec), links=jnp.asarray(links),
                      link_counts=jnp.asarray(cnts),
                      deleted=jnp.zeros(g.capacity, bool),
                      n_nodes=jnp.int32(n))


def tpu_search_recall(graph, qs, oracle, *, ef=EFS, cand_cap=None, t=4):
    d, i, _ = search_graph(graph, jnp.asarray(qs), ef=ef, metric_value=0,
                           cand_cap=cand_cap, expand_width=t)
    return recall(np.asarray(i), oracle)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    args = ap.parse_args()
    rng = np.random.default_rng(12345)  # same data as bench.py
    pts, qs = make_data(args.n, rng)

    cfg = HnswConfig(dims=DIMS, m=M, ef_construction=EFC, ef_search=EFS)

    # exact oracle (internal ids == labels here)
    oracle_idx = HnswIndex(cfg)
    oracle_idx.build(pts[: 4096])  # warm compile at small capacity
    del oracle_idx

    idx = HnswIndex(cfg, initial_capacity=args.n + 256)
    t0 = time.time()
    idx.build(pts, np.arange(args.n))
    np.asarray(idx.graph.n_nodes)
    log(f"TPU build: {args.n / (time.time() - t0):.0f} vec/s")
    _, ol, ov = idx.exact_search(qs, K)
    oracle = ol.astype(np.int64)

    # --- CPU reference build + its own search (status quo baseline) -----
    cpu = CpuRefIndex(DIMS, m=M, ef_construction=EFC)
    t0 = time.time()
    cpu.build(pts, np.arange(args.n))
    log(f"CPU build: {args.n / (time.time() - t0):.0f} vec/s")
    got = np.stack([cpu.search(q, EFS)[1][:K] for q in qs[:256]])
    log(f"[base] CPU graph x CPU search : {recall(got, oracle[:256]):.4f}")

    # --- A: CPU graph x TPU search --------------------------------------
    cg = cpu_graph_to_state(cpu, pts, cfg.max_m)
    for t in (1, 4):
        r = tpu_search_recall(cg, qs, oracle, t=t)
        log(f"[A] CPU graph x TPU search (T={t}, cand=ef): {r:.4f}")
    for cc in (128, 256):
        r = tpu_search_recall(cg, qs, oracle, cand_cap=cc)
        log(f"[A] CPU graph x TPU search (T=4, cand={cc}): {r:.4f}")

    # --- B/C/D: TPU graph x TPU search variants -------------------------
    g = idx.graph
    log(f"[B] TPU graph x TPU search (T=4, cand=ef): "
        f"{tpu_search_recall(g, qs, oracle):.4f}")
    for cc in (128, 256):
        log(f"[C] TPU graph x TPU search (T=4, cand={cc}): "
            f"{tpu_search_recall(g, qs, oracle, cand_cap=cc):.4f}")
    log(f"[D] TPU graph x TPU search (T=1, cand=ef): "
        f"{tpu_search_recall(g, qs, oracle, t=1):.4f}")
    # CPU search over the TPU graph needs a csrc graph-injection entry
    # point; approximated instead by the cand_cap sweep above.

    # --- E: build batch-size sweep ---------------------------------------
    for b in (32, 256):
        bi = HnswIndex(cfg, initial_capacity=args.n + 2 * b,
                       max_insert_batch=b)
        t0 = time.time()
        bi.build(pts, np.arange(args.n))
        np.asarray(bi.graph.n_nodes)
        r = tpu_search_recall(bi.graph, qs, oracle)
        log(f"[E] TPU build B={b}: {args.n / (time.time() - t0):.0f} vec/s, "
            f"recall {r:.4f}")


if __name__ == "__main__":
    main()
