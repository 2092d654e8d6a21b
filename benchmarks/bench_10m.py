#!/usr/bin/env python
"""Deep10M-class single-chip demo (BASELINE.md config 4; VERDICT r1 item 4).

Builds a 10M x 128d index on ONE chip and serves batched graph + exact
queries.  The two former scale blockers are gone:

  * visited-set memory (SURVEY.md §7): the dense-dedupe traversal needs NO
    per-query visited structure (core/search.py) — the old bitmap cost
    cap/8 bytes/query (40GB for a 1024-query batch at 10M).
  * per-batch graph copies: the insert path donates its buffers
    (core/build.py insert_batch_masked_donating), so the 5.1GB vector and
    1.3GB link arrays update in place.

Memory math at 10M x 128d on a 16GB v5e:
  vectors f32 [10M,128]          5.12 GB
  links   i32 [10M,32]           1.28 GB
  link_counts/deleted            ~0.05 GB
  int8 traversal shadow (opt)    1.28 GB + scales 0.04 GB
  search scratch (B=1024)        ~0.1 GB
  => ~6.5 GB static + batch staging.  Packed records (maxM*D bytes/node =
  41 GB) do NOT fit at this scale on one chip — they are the <=2M single
  -chip / sharded-tier option; quantized traversal is the 10M knob.

CPU reference comparison is optional (BENCH_10M_CPU=1): the single-thread
build takes ~75 min on this host.
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
    search_graph, search_graph_quantized)

N, DIMS, M, EFC, EFS, K, NQ, REPS = 10_000_000, 128, 16, 64, 64, 10, 1024, 4
# repo-local cache: /tmp does not survive across builder sessions
# (bench_shard125 lesson — a wiped /tmp cost a finished 10M build)
CACHE_IDX = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache", "bench10m_idx.npz")


def log(msg):
    print(msg, flush=True)


def recall(ids, oracle):
    return float(np.mean([
        len(set(ids[r][:K].tolist()) & set(oracle[r][:K].tolist())) / K
        for r in range(ids.shape[0])]))


def make_data():
    rng = np.random.default_rng(4242)
    n_centers = 50_000
    centers = rng.normal(scale=4.0, size=(n_centers, DIMS)).astype(np.float32)
    pts = np.empty((N, DIMS), np.float32)
    step = 1_000_000
    for off in range(0, N, step):
        a = rng.integers(0, n_centers, step)
        pts[off: off + step] = (
            centers[a] + rng.normal(size=(step, DIMS)).astype(np.float32))
    qs = (centers[rng.integers(0, n_centers, NQ)] +
          rng.normal(size=(NQ, DIMS)).astype(np.float32)).astype(np.float32)
    return pts, qs


def main():
    pts, qs = make_data()
    log(f"data ready: {pts.nbytes / 1e9:.1f} GB host")

    cfg = HnswConfig(dims=DIMS, m=M, ef_construction=EFC, ef_search=EFS)
    if os.path.exists(CACHE_IDX):
        idx = HnswIndex.load(CACHE_IDX)
        log(f"loaded cached index ({idx.n_nodes} nodes)")
    else:
        # warm the slab-insert programs at the REAL capacity so the
        # build-rate number measures execution, not the one-time compile.
        # Warm BEFORE allocating the main graph: two 6.4GB graphs coexist
        # otherwise and 10M x 128d would not leave room for both.
        warm = HnswIndex(cfg, initial_capacity=N + 256, max_insert_batch=256)
        big, _ = warm.slab_batches
        warm.add(pts[: (big + 1) * 256])
        # warm the exact8 slab programs too (auto switches engines at
        # 600k mid-build; both grains must be compiled before timing)
        warm.exact_build_threshold = 0
        warm.add(pts[(big + 1) * 256: (2 * big + 2) * 256])
        np.asarray(warm.graph.n_nodes)
        del warm
        ckpt = "/tmp/bench10m_ckpt.npz"
        done = 0
        t_ck = 0.0
        if os.environ.get("B10M_RESUME") == "1" and os.path.exists(ckpt):
            idx = HnswIndex.load(ckpt)
            done = idx.n_nodes
            # pre-grow straight to the final capacity so the resumed tail
            # reuses the SAME compiled programs as a fresh build (load
            # sizes capacity to the checkpoint; doubling growth would land
            # on a different, recompile-triggering grain)
            from pg_embedding_tpu.core.graph import grow_graph
            idx._graph = grow_graph(idx._graph,
                                    N + idx.max_insert_batch)
            grown = np.zeros(idx._graph.capacity, np.uint64)
            grown[: len(idx._labels)] = idx._labels
            idx._labels = grown
            log(f"resumed from checkpoint at {done:,} rows "
                f"(capacity {idx.graph.capacity:,})")
        else:
            # pre-size to the final capacity: doubling growth from the 1M
            # chunked adds would otherwise land on ~16M rows at hi=9M
            # (max(need, 2*cap)), and the oracle sweep over a 16M-capacity
            # vector array OOMs HBM (observed r4: 23.4G vs 15.75G)
            idx = HnswIndex(cfg, initial_capacity=N + 256,
                            max_insert_batch=256)
        # chunked add: progress visibility + crash insurance on a shared
        # dev tunnel whose worker can restart mid-run (observed r3); the
        # per-2.5M checkpoints are excluded from the build-rate clock
        t0 = time.time()
        for lo in range(done, N, 1_000_000):
            hi = min(lo + 1_000_000, N)
            idx.add(pts[lo:hi], np.arange(lo, hi))
            np.asarray(idx.graph.n_nodes)
            log(f"built {hi:>10,}  overall "
                f"{(hi - done) / (time.time() - t0 - t_ck):.0f} vec/s")
            if hi % 2_500_000 == 0 and hi < N:
                tc = time.time()
                idx.save(ckpt, compressed=False)
                t_ck += time.time() - tc
                log(f"checkpoint at {hi:,} ({time.time() - tc:.0f}s)")
        dt = time.time() - t0 - t_ck
        if done == 0:
            log(f"TPU build: {N / dt:.0f} vec/s ({dt / 60:.1f} min)")
        else:
            log(f"TPU build (resumed tail from {done:,}): "
                f"{(N - done) / dt:.0f} vec/s marginal")
        if os.environ.get("BENCH_10M_SAVE") == "1":
            # ~6.5GB through the tunnel; uncompressed (single-thread zlib
            # on float data costs ~25 min for a poor ratio)
            os.makedirs(os.path.dirname(CACHE_IDX), exist_ok=True)
            idx.save(CACHE_IDX, compressed=False)

    # free the exact8 build shadow before serving: 1.3GB of HBM the serve
    # benches don't need resident (the quantized-serve bench rebuilds it)
    idx._qvec = idx._qscale = None
    idx._qvec_rows = 0

    qdev = jnp.asarray(qs)
    t0 = time.time()
    _, ol, _ = idx.exact_search(qs, K)
    log(f"exact oracle batch: {time.time() - t0:.1f}s "
        f"({NQ / (time.time() - t0):.0f} QPS incl. compile)")
    oracle = ol.astype(np.int64)
    t0 = time.time()
    for _ in range(REPS):
        de, ie, ve = idx.exact_search(qs, K)
    qps_e = REPS * NQ / (time.time() - t0)
    log(f"exact sweep: {qps_e:.0f} QPS streaming (recall 1.0)")

    out = {"n": N, "dims": DIMS, "exact_qps": round(qps_e, 1)}
    for t, ef in ((4, EFS), (8, EFS), (8, 2 * EFS)):
        d, i, _ = search_graph(idx.graph, qdev, ef=ef, metric_value=0,
                               expand_width=t)
        r = recall(np.asarray(i), oracle)
        t0 = time.time()
        for _ in range(REPS):
            d, i, _ = search_graph(idx.graph, qdev, ef=ef, metric_value=0,
                                   expand_width=t)
        np.asarray(d)
        qps = REPS * NQ / (time.time() - t0)
        log(f"graph T={t} ef={ef}: {qps:.0f} QPS, recall@10 {r:.4f}")
        out[f"graph_qps_t{t}_ef{ef}"] = round(qps, 1)
        out[f"graph_recall_t{t}_ef{ef}"] = round(r, 4)

    # int8 quantized traversal (the 10M memory knob; exact rerank)
    qv, qsc = idx._ensure_quantized()
    np.asarray(qv[0, 0])
    d, i, _ = search_graph_quantized(idx.graph, qdev, qv, qsc, ef=EFS,
                                     metric_value=0, expand_width=8)
    r = recall(np.asarray(i), oracle)
    t0 = time.time()
    for _ in range(REPS):
        d, i, _ = search_graph_quantized(idx.graph, qdev, qv, qsc, ef=EFS,
                                         metric_value=0, expand_width=8)
    np.asarray(d)
    qps = REPS * NQ / (time.time() - t0)
    log(f"quantized T=8: {qps:.0f} QPS, recall@10 {r:.4f}")
    out["quant_qps_t8"] = round(qps, 1)
    out["quant_recall_t8"] = round(r, 4)

    if os.environ.get("B10M_PQ") == "1":
        # PQ-packed traversal at 10M (ROADMAP r4 #7): the regime int8
        # records cannot reach (maxM*D = 41GB).  G=16 records at 10M-cap
        # are ~5.2GB; resident with vectors (5.1) + links (1.3) = ~11.6GB.
        # G=32 (10.3GB records) does NOT fit next to the corpus on 16GB.
        from pg_embedding_tpu.core.search import search_graph_pq

        idx._qvec = idx._qscale = None   # drop the quantized shadow first
        idx._qvec_rows = 0
        for groups in (16,):
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
            cb, rot = idx._pq_codebook, idx._pq_rot
            for t, ef in ((8, EFS), (8, 2 * EFS)):
                d, i, _ = search_graph_pq(idx.graph, qdev, pc, cb, rot,
                                          ef=ef, metric_value=0,
                                          expand_width=t)
                r = recall(np.asarray(i), oracle)
                t0 = time.time()
                for _ in range(REPS):
                    d, i, _ = search_graph_pq(idx.graph, qdev, pc, cb, rot,
                                              ef=ef, metric_value=0,
                                              expand_width=t)
                np.asarray(d)
                qps = REPS * NQ / (time.time() - t0)
                log(f"pq G={groups} T={t} ef={ef}: {qps:.0f} QPS, "
                    f"recall@10 {r:.4f}")
                out[f"pq_g{groups}_qps_t{t}_ef{ef}"] = round(qps, 1)
                out[f"pq_g{groups}_recall_t{t}_ef{ef}"] = round(r, 4)
            idx._pcodes = None
            pc = None

    if os.environ.get("B10M_PQ32") == "1":
        # PQ G=32 at 10M in DROP-CORPUS mode (VERDICT r4 item 7): G=32
        # records (10.24 GB at 10M-cap) do NOT fit next to the f32
        # corpus (5.12 GB) on a 16 GB chip — but the serving walk only
        # reads corpus rows at the entry distance and the exact rerank,
        # so after encoding codes FROM the f32 rows the corpus can be
        # downcast to bf16 (2.56 GB): records 10.24 + bf16 corpus 2.56 +
        # links 1.28 + codes 0.32 ~= 14.4 GB.  Order matters: encode
        # (f32 resident, 5.5 GB peak) -> downcast (8 GB transient) ->
        # chunked record gather (14.5 GB peak).
        from pg_embedding_tpu.core.search import search_graph_pq

        idx._qvec = idx._qscale = None
        idx._qvec_rows = 0
        idx._pcodes = idx._pscales = None
        idx.packed_traversal = True
        idx.packed_dtype = "pq"
        idx.pq_groups = 32
        idx._pq_codebook = None
        idx._pq_codes = None
        t0 = time.time()
        idx._ensure_pq_codes()                    # train+encode on f32 rows
        np.asarray(idx._pq_codes[0, 0])
        log(f"G=32 train+encode: {time.time() - t0:.1f}s")
        idx.downcast_corpus("bfloat16")
        np.asarray(idx.graph.vectors[0, 0].astype(np.float32))
        log(f"corpus downcast to bf16 "
            f"({idx.graph.vectors.nbytes / 1e9:.2f} GB)")
        t0 = time.time()
        pc, _ = idx._ensure_packed()
        np.asarray(pc[0, 0])
        log(f"G=32 record gather: {time.time() - t0:.1f}s; records "
            f"{pc.nbytes / 1e9:.2f} GB")
        cb, rot = idx._pq_codebook, idx._pq_rot
        for t, ef in ((8, EFS), (8, 2 * EFS)):
            d, i, _ = search_graph_pq(idx.graph, qdev, pc, cb, rot,
                                      ef=ef, metric_value=0,
                                      expand_width=t)
            r = recall(np.asarray(i), oracle)
            t0 = time.time()
            for _ in range(REPS):
                d, i, _ = search_graph_pq(idx.graph, qdev, pc, cb, rot,
                                          ef=ef, metric_value=0,
                                          expand_width=t)
            np.asarray(d)
            qps = REPS * NQ / (time.time() - t0)
            log(f"pq G=32 dc T={t} ef={ef}: {qps:.0f} QPS, "
                f"recall@10 {r:.4f}")
            out[f"pq_g32_dc_qps_t{t}_ef{ef}"] = round(qps, 1)
            out[f"pq_g32_dc_recall_t{t}_ef{ef}"] = round(r, 4)
        idx._pcodes = None
        pc = None

    if os.environ.get("BENCH_10M_CPU") == "1":
        from pg_embedding_tpu.utils.cpu_ref import CpuRefIndex

        cpu = CpuRefIndex(DIMS, m=M, ef_construction=EFC)
        t0 = time.time()
        cpu.build(pts, np.arange(N))
        log(f"CPU build: {N / (time.time() - t0):.0f} vec/s")
        got = np.stack([cpu.search(q, EFS)[1][:K] for q in qs[:256]])
        log(f"CPU recall: {recall(got, oracle[:256]):.4f}")
        t0 = time.time()
        for q in qs[:256]:
            cpu.search(q, EFS)
        log(f"CPU QPS: {256 / (time.time() - t0):.0f}")

    log(json.dumps(out))


if __name__ == "__main__":
    main()
