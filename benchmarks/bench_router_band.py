#!/usr/bin/env python
"""Validate the auto-router's exact<->graph crossover in the 1-4M band.

Round-1 set ``exact_threshold = 4_000_000`` by extrapolating a ~8M
crossover from 1M measurements (VERDICT r1 weak #6).  This measures both
engines' streaming QPS at 2M and 4M rows (128-d L2, batch 1024) so the
threshold rests on data: the exact sweep costs O(N) per batch, the graph
walk ~O(hops * log N), so their ratio pins the crossover directly.

Prints one JSON line per corpus size plus a summary.
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
from pg_embedding_tpu.ops.pallas_bruteforce import (  # noqa: E402
    pallas_exact_search)

DIMS, M, EFC, EFS, K, NQ, REPS = 128, 16, 64, 64, 10, 1024, 8
SIZES = [2_000_000, 4_000_000]


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_data(rng, n, n_centers):
    centers = rng.normal(scale=4.0, size=(n_centers, DIMS)).astype(np.float32)
    pts = np.empty((n, DIMS), np.float32)
    step = 500_000
    for off in range(0, n, step):
        a = rng.integers(0, n_centers, min(step, n - off))
        pts[off: off + len(a)] = (
            centers[a] + rng.normal(size=(len(a), DIMS)).astype(np.float32))
    qs = (centers[rng.integers(0, n_centers, NQ)] +
          rng.normal(size=(NQ, DIMS)).astype(np.float32)).astype(np.float32)
    return pts, qs


def main():
    results = []
    for n in SIZES:
        rng = np.random.default_rng(777 + n)
        pts, qs = make_data(rng, n, n // 20)
        log(f"[{n}] data ready")

        cfg = HnswConfig(dims=DIMS, m=M, ef_construction=EFC, ef_search=EFS)
        idx = HnswIndex(cfg, max_insert_batch=256)
        t0 = time.time()
        idx.build(pts)
        np.asarray(idx.graph.n_nodes)
        build_vps = n / (time.time() - t0)
        log(f"[{n}] build {build_vps:.0f} vec/s (incl. compile)")

        qdev = jnp.asarray(qs)
        _, ol, ov = idx.exact_search(qs, K)

        # exact engine, streaming
        for _ in range(2):
            dd, ii = pallas_exact_search(qdev, idx.graph.vectors, K,
                                         cfg.metric, n_valid=n,
                                         deleted=idx.graph.deleted)
        np.asarray(dd)
        t0 = time.time()
        for _ in range(REPS):
            dd, ii = pallas_exact_search(qdev, idx.graph.vectors, K,
                                         cfg.metric, n_valid=n,
                                         deleted=idx.graph.deleted)
        np.asarray(dd)
        qps_e = REPS * NQ / (time.time() - t0)

        # graph engine, streaming (plain traversal, serving default T)
        d, i, _ = search_graph(idx.graph, qdev, ef=EFS, metric_value=0,
                               expand_width=idx.search_expand_width)
        rec = float(np.mean([
            len(set(np.asarray(i)[r][:K].tolist()) &
                set(ol[r][ov[r]][:K].tolist())) / K for r in range(NQ)]))
        t0 = time.time()
        for _ in range(REPS):
            d, i, _ = search_graph(idx.graph, qdev, ef=EFS, metric_value=0,
                                   expand_width=idx.search_expand_width)
        np.asarray(d)
        qps_g = REPS * NQ / (time.time() - t0)

        row = {"n": n, "exact_qps": round(qps_e, 1),
               "graph_qps": round(qps_g, 1), "graph_recall": round(rec, 4),
               "build_vps": round(build_vps, 1)}

        # packed traversal (int8 records): the serving mode the packed
        # router threshold (api.exact_threshold_packed) governs.  Records
        # cost maxM*D bytes/node — measured only where they fit the chip
        # alongside the graph (<= ~2.5M at 128d/m=16 on 16GB)
        if n * cfg.max_m * DIMS <= 9 * (1 << 30):
            from pg_embedding_tpu.core.search import search_graph_packed
            pc, ps = idx._ensure_packed()
            np.asarray(ps[0, 0])
            d, i, _ = search_graph_packed(idx.graph, qdev, pc, ps, ef=EFS,
                                          metric_value=0, expand_width=8)
            prec_ = float(np.mean([
                len(set(np.asarray(i)[r][:K].tolist()) &
                    set(ol[r][ov[r]][:K].tolist())) / K
                for r in range(NQ)]))
            t0 = time.time()
            for _ in range(REPS):
                d, i, _ = search_graph_packed(idx.graph, qdev, pc, ps,
                                              ef=EFS, metric_value=0,
                                              expand_width=8)
            np.asarray(d)
            qps_p = REPS * NQ / (time.time() - t0)
            row["packed_qps"] = round(qps_p, 1)
            row["packed_recall"] = round(prec_, 4)
            log(f"[{n}] packed {qps_p:.0f} QPS (recall {prec_:.4f})")

        results.append(row)
        log(f"[{n}] exact {qps_e:.0f} QPS | graph {qps_g:.0f} QPS "
            f"(recall {rec:.4f})")
        print(json.dumps(row), flush=True)
        del idx, pts

    if len(results) == 2 and all(r["exact_qps"] > 0 for r in results):
        # exact QPS ~ c/N  =>  crossover where c/N == graph_qps(N); use the
        # 4M point's graph QPS as the large-N plateau
        c = np.mean([r["exact_qps"] * r["n"] for r in results])
        plateau = results[-1]["graph_qps"]
        crossover = int(c / plateau) if plateau > 0 else None
        out = {"crossover_estimate": crossover}
        packed = [r for r in results if "packed_qps" in r]
        if packed:
            # packed plateau from the largest packed measurement
            out["crossover_estimate_packed"] = int(
                c / packed[-1]["packed_qps"])
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
