#!/usr/bin/env python
"""PQ packed-record serving measurements (ROADMAP r3 #4 follow-through).

Two regimes:
  * 1M x 128d (PQ_N=1000000, default): build fresh, serve plain / int8
    packed / pq packed back-to-back — the head-to-head that prices PQ's
    distortion against its D/G-fold record shrink where int8 still fits.
  * 10M x 128d (PQ_N=10000000): loads the cached bench_10m index
    (/tmp/bench10m_idx.npz) and serves pq packed records — the regime
    int8 packing CANNOT reach (maxM*D bytes/node = 41GB vs 16GB HBM;
    PQ at G=16 needs 5.1GB).  Memory math in bench_10m.py's docstring.

Run on the real chip as a background job (CLAUDE.md axon rules):
  nohup python benchmarks/bench_pq.py > /tmp/bench_pq.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from pg_embedding_tpu import HnswConfig, HnswIndex  # noqa: E402
from pg_embedding_tpu.core.search import (  # noqa: E402
    search_graph, search_graph_packed, search_graph_pq)
from pg_embedding_tpu.ops.pq import pq_encode, train_pq  # noqa: E402
from pg_embedding_tpu.ops.pq_sweep import (  # noqa: E402
    pq_sweep_search as sweep)

N = int(os.environ.get("PQ_N", 1_000_000))
DIMS, M, EFC, K = 128, 16, 64, 10
NQ = int(os.environ.get("PQ_NQ", 1024))
REPS = int(os.environ.get("PQ_REPS", 4))
GROUPS_LIST = [int(g) for g in
               os.environ.get("PQ_GROUPS", "16,32").split(",")]
CACHE_10M = "/tmp/bench10m_idx.npz"


def log(msg):
    print(msg, flush=True)


def recall(ids, oracle):
    return float(np.mean([
        len(set(ids[r][:K].tolist()) & set(oracle[r][:K].tolist())) / K
        for r in range(ids.shape[0])]))


def make_data(n, seed=4242):
    rng = np.random.default_rng(seed)
    n_centers = 50_000
    centers = rng.normal(scale=4.0, size=(n_centers, DIMS)).astype(np.float32)
    pts = np.empty((n, DIMS), np.float32)
    step = 1_000_000
    for off in range(0, n, step):
        take = min(step, n - off)
        a = rng.integers(0, n_centers, take)
        pts[off: off + take] = (
            centers[a] + rng.normal(size=(take, DIMS)).astype(np.float32))
    qs = (centers[rng.integers(0, n_centers, NQ)] +
          rng.normal(size=(NQ, DIMS)).astype(np.float32)).astype(np.float32)
    return pts, qs


def serve(fn, qdev, label, oracle, out, key):
    d, i, _ = fn(qdev)
    r = recall(np.asarray(i), oracle)
    t0 = time.time()
    for _ in range(REPS):
        d, i, _ = fn(qdev)
    np.asarray(d)
    qps = REPS * NQ / (time.time() - t0)
    log(f"{label}: {qps:.0f} QPS, recall@10 {r:.4f}")
    out[f"{key}_qps"] = round(qps, 1)
    out[f"{key}_recall"] = round(r, 4)


def main():
    cfg = HnswConfig(dims=DIMS, m=M, ef_construction=EFC, ef_search=64)
    if N >= 10_000_000 and os.path.exists(CACHE_10M):
        # regenerate the bench_10m query set exactly (same seed pipeline:
        # centers, then per-1M-chunk integers+normal draws, then queries)
        rng = np.random.default_rng(4242)
        centers = rng.normal(scale=4.0, size=(50_000, DIMS)).astype(np.float32)
        for _ in range(0, N, 1_000_000):
            rng.integers(0, 50_000, 1_000_000)
            rng.normal(size=(1_000_000, DIMS))
        qs = (centers[rng.integers(0, 50_000, NQ)] +
              rng.normal(size=(NQ, DIMS)).astype(np.float32)).astype(np.float32)
        idx = HnswIndex.load(CACHE_10M)
        log(f"loaded cached 10M index ({idx.n_nodes} nodes)")
    else:
        pts, qs = make_data(N)
        idx = HnswIndex(cfg, max_insert_batch=256)
        t0 = time.time()
        idx.add(pts, np.arange(N))
        np.asarray(idx.graph.n_nodes)
        log(f"build: {N / (time.time() - t0):.0f} vec/s")
        del pts

    out = {"n": idx.n_nodes, "dims": DIMS}
    qdev = jnp.asarray(qs)
    _, ol, _ = idx.exact_search(qs, K)
    oracle = ol.astype(np.int64)
    log("oracle ready")

    mv = cfg.metric.value
    ef = 64

    for groups in GROUPS_LIST:
        # records [cap, maxM*G] u8 alongside vectors+links: skip widths
        # that cannot fit this chip (the 10M G=32 case: 10.2 GB records
        # + 6.5 GB graph > 16 GB HBM)
        rec_gb = idx.graph.capacity * cfg.max_m * groups / 1e9
        base_gb = (idx.graph.vectors.nbytes
                   + idx.graph.links.nbytes) / 1e9
        if rec_gb + base_gb > 14.5:
            log(f"G={groups}: records {rec_gb:.1f} GB + graph "
                f"{base_gb:.1f} GB > HBM, skipped")
            out[f"g{groups}_skipped"] = "records_over_hbm"
            continue
        # pq packed records
        idx.packed_traversal = True
        idx.packed_dtype = "pq"
        idx.pq_groups = groups
        idx._pq_codebook = None
        idx._pq_codes = None
        t0 = time.time()
        pc, _ = idx._ensure_packed()          # FLAT u8[cap, maxM*G]
        np.asarray(pc[0, 0])
        log(f"G={groups} pq pack (train+encode+gather): "
            f"{time.time() - t0:.1f}s; records {pc.nbytes / 1e9:.2f} GB")
        cb = idx._pq_codebook
        rot = idx._pq_rot
        for t in (4, 8):
            serve(lambda q, t=t: search_graph_pq(
                idx.graph, q, pc, cb, rot, ef=ef, metric_value=mv,
                expand_width=t),
                qdev, f"pq G={groups} T={t} ef={ef}", oracle, out,
                f"g{groups}_pq_t{t}")
        serve(lambda q: search_graph_pq(
            idx.graph, q, pc, cb, rot, ef=2 * ef, metric_value=mv,
            expand_width=8),
            qdev, f"pq G={groups} T=8 ef={2 * ef}", oracle, out,
            f"g{groups}_pq_t8_ef128")
        idx._pcodes = None
        pc = None

        # compressed brute-force sweep (mode="sweep_pq"): sequential ADC
        # over the per-row codes (G bytes/row vs the exact sweep's 4*D) +
        # exact rerank — no graph traversal at all
        codes = idx._ensure_pq_codes()
        np.asarray(codes[0, 0])
        log(f"row codes {codes.nbytes / 1e9:.2f} GB")
        for pool in (64, 128, 256):
            serve(lambda q, p=pool: (*sweep(
                q, codes, cb, rot, idx.graph.vectors, K, cfg.metric,
                n_valid=idx.n_nodes, deleted=idx.graph.deleted, pool=p),
                None),
                qdev, f"pq G={groups} sweep pool={pool}", oracle, out,
                f"g{groups}_sweep_p{pool}")
        idx._pq_codes = None

    if N < 3_000_000:
        # int8 packed head-to-head (fits below ~2M@128d)
        idx.packed_dtype = "int8"
        pc8, ps8 = idx._ensure_packed()
        np.asarray(pc8[0, 0])   # FLAT int8[cap, maxM*D] records
        log(f"int8 records {pc8.nbytes / 1e9:.2f} GB")
        serve(lambda q: search_graph_packed(
            idx.graph, q, pc8, ps8, ef=ef, metric_value=mv, expand_width=8),
            qdev, f"int8 packed T=8 ef={ef}", oracle, out, "int8_t8")
        idx._pcodes = None

    # plain walk reference point
    serve(lambda q: search_graph(
        idx.graph, q, ef=ef, metric_value=mv, expand_width=8),
        qdev, f"plain T=8 ef={ef}", oracle, out, "plain_t8")

    log(json.dumps(out))


if __name__ == "__main__":
    main()
