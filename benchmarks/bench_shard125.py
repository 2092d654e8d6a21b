#!/usr/bin/env python
"""One REAL Deep100M shard: 12.5M x 96d built and served on a single chip
(VERDICT r3 item 3 — replaces the last extrapolated link in BASELINE.md's
config-5 composition with a measurement).

Deep100M on a v5p-16-class mesh is 8 shards of 12.5M x 96d; every other
link in the composition is measured (8x2M shard builds on chip, 16M merged
serving on the 8-device mesh, multi-process DCN topology).  Memory at
12.5M x 96d: 4.8 GB f32 vectors + 1.6 GB links + 1.25 GB int8 shadow
~= 7.7 GB — fits this 16 GB v5e.

Run: nohup python benchmarks/bench_shard125.py > /tmp/bench_shard125.log 2>&1 &
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

N = int(os.environ.get("SHARD_N", 12_500_000))
DIMS, M, EFC, K, NQ, REPS = 96, 16, 64, 10, 1024, 4
# repo-local cache: /tmp does not survive across builder sessions (observed
# r4 — a wiped /tmp cost a finished 10M build), the repo checkout does
CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache")
CACHE = os.path.join(CACHE_DIR, "bench_shard125_idx.npz")
CKPT = os.path.join(CACHE_DIR, "bench_shard125_ckpt.npz")


def log(msg):
    print(msg, flush=True)


def make_data():
    # per-shard slice of a Deep100M-shaped corpus: same generator family
    # as bench_deep100m_proxy's shards (50k centers per shard's slice)
    rng = np.random.default_rng(12_5)
    n_centers = 50_000
    centers = rng.normal(scale=4.0, size=(n_centers, DIMS)).astype(np.float32)
    pts = np.empty((N, DIMS), np.float32)
    step = 1_000_000
    for off in range(0, N, step):
        take = min(step, N - off)
        a = rng.integers(0, n_centers, take)
        pts[off: off + take] = (
            centers[a] + rng.normal(size=(take, DIMS)).astype(np.float32))
    qs = (centers[rng.integers(0, n_centers, NQ)] +
          rng.normal(size=(NQ, DIMS)).astype(np.float32)).astype(np.float32)
    return pts, qs


def recall(ids, oracle):
    return float(np.mean([
        len(set(ids[r][:K].tolist()) & set(oracle[r][:K].tolist())) / K
        for r in range(ids.shape[0])]))


def main():
    cfg = HnswConfig(dims=DIMS, m=M, ef_construction=EFC, ef_search=64)
    out = {"n": N, "dims": DIMS}
    os.makedirs(CACHE_DIR, exist_ok=True)
    if os.path.exists(CACHE):
        _, qs = make_data()
        idx = HnswIndex.load(CACHE)
        log(f"loaded cached shard ({idx.n_nodes} nodes)")
    else:
        pts, qs = make_data()
        log(f"data ready: {pts.nbytes / 1e9:.1f} GB host")
        # warm the slab programs at the REAL capacity before timing (both
        # candidate engines — auto switches to exact8 at 600k), then free
        # the warm graph before allocating the main one (bench_10m pattern)
        warm = HnswIndex(cfg, initial_capacity=N + 256, max_insert_batch=256)
        big, _ = warm.slab_batches
        warm.add(pts[: (big + 1) * 256])
        warm.exact_build_threshold = 0
        warm.add(pts[(big + 1) * 256: (2 * big + 2) * 256])
        np.asarray(warm.graph.n_nodes)
        del warm
        done, t_ck = 0, 0.0
        if os.path.exists(CKPT):
            # resume the tail: pre-grow straight to final capacity so the
            # resumed adds reuse the SAME compiled programs (bench_10m
            # pattern — load sizes capacity to the checkpoint)
            from pg_embedding_tpu.core.graph import grow_graph
            # refuse a checkpoint from a different run shape: a changed
            # SHARD_N regenerates a DIFFERENT corpus/query stream, and a
            # checkpoint with >= N rows would skip the build loop while
            # claiming out['n'] = N (ADVICE r4)
            meta = {}
            if os.path.exists(CKPT + ".meta.json"):
                with open(CKPT + ".meta.json") as f:
                    meta = json.load(f)
            idx = HnswIndex.load(CKPT)
            done = idx.n_nodes
            if (meta.get("n", N) != N or done >= N
                    or idx.config.dims != DIMS or idx.config.m != M):
                raise SystemExit(
                    f"checkpoint mismatch: ckpt n={meta.get('n')} "
                    f"done={done:,} vs SHARD_N={N:,} dims/m="
                    f"{idx.config.dims}/{idx.config.m} — delete {CKPT} "
                    f"to rebuild")
            idx._graph = grow_graph(idx._graph, N + idx.max_insert_batch)
            grown = np.zeros(idx._graph.capacity, np.uint64)
            grown[: len(idx._labels)] = idx._labels
            idx._labels = grown
            log(f"resumed from checkpoint at {done:,} rows")
        else:
            # pre-size to final capacity: doubling growth would land past
            # 16M rows and recompile every slab program at the new grain
            idx = HnswIndex(cfg, initial_capacity=N + 256,
                            max_insert_batch=256)
        t0 = time.time()
        last_ckpt = done
        for lo in range(done, N, 2_500_000):
            hi = min(lo + 2_500_000, N)
            idx.add(pts[lo:hi], np.arange(lo, hi))
            np.asarray(idx.graph.n_nodes)
            log(f"built {hi:>10,}  overall "
                f"{(hi - done) / (time.time() - t0 - t_ck):.0f} vec/s")
            # progress-based trigger (ADVICE r4: an absolute `hi % 5M`
            # never fires for SHARD_N values unaligned to 5M)
            if hi - last_ckpt >= 5_000_000 and hi < N:
                tc = time.time()
                idx.save(CKPT, compressed=False)
                with open(CKPT + ".meta.json", "w") as f:
                    json.dump({"n": N, "dims": DIMS, "m": M}, f)
                last_ckpt = hi
                t_ck += time.time() - tc
                log(f"checkpoint at {hi:,} ({time.time() - tc:.0f}s)")
        dt = time.time() - t0 - t_ck
        tag = "" if done == 0 else f" (marginal tail from {done:,})"
        log(f"build: {(N - done) / dt:.0f} vec/s ({dt / 60:.1f} min){tag}")
        # a resumed run reports the tail rate under its OWN key so run
        # comparisons never conflate full-build and tail rates (ADVICE r4)
        if done:
            out["build_tail_vps"] = round((N - done) / dt, 0)
            out["build_resumed_from"] = done
        else:
            out["build_vps"] = round(N / dt, 0)
        del pts
        t0 = time.time()
        idx.save(CACHE, compressed=False)
        if os.path.exists(CKPT):
            os.remove(CKPT)
        if os.path.exists(CKPT + ".meta.json"):
            os.remove(CKPT + ".meta.json")
        log(f"snapshot: {time.time() - t0:.0f}s")

    # free the exact8 build shadow before serving (1.25 GB at 12.5M)
    idx._qvec = idx._qscale = None
    idx._qvec_rows = 0

    qdev = jnp.asarray(qs)
    _, ol, _ = idx.exact_search(qs, K)
    oracle = ol.astype(np.int64)
    log("oracle ready (exact Pallas sweep)")
    # exact sweep throughput = the non-graph serving floor at this scale
    t0 = time.time()
    for _ in range(REPS):
        de, ie, _ = idx.exact_search(qs, K)
    qps = REPS * NQ / (time.time() - t0)
    log(f"exact sweep: {qps:.0f} QPS, recall 1.0")
    out["exact_qps"] = round(qps, 1)

    mv = cfg.metric.value
    g = idx.graph
    for t, ef in ((8, 64), (8, 128), (4, 64)):
        d, i, _ = search_graph(g, qdev, ef=ef, metric_value=mv,
                               expand_width=t)
        r = recall(np.asarray(i), oracle)
        t0 = time.time()
        for _ in range(REPS):
            d, i, _ = search_graph(g, qdev, ef=ef, metric_value=mv,
                                   expand_width=t)
        np.asarray(d)
        qps = REPS * NQ / (time.time() - t0)
        log(f"graph T={t} ef={ef}: {qps:.0f} QPS, recall@10 {r:.4f}")
        out[f"graph_t{t}_ef{ef}_qps"] = round(qps, 1)
        out[f"graph_t{t}_ef{ef}_recall"] = round(r, 4)
    log(json.dumps(out))


if __name__ == "__main__":
    main()
