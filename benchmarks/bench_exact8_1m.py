#!/usr/bin/env python
"""exact8 A/B at 1M (VERDICT r2 item 1a validation, TPU).

Builds the same 1M x 128d corpus twice:
  r2 policy: exact candidates to 600k, BEAM beyond (exact8_build_threshold
             = 600k makes the exact8 band empty)
  r3 policy: exact to 600k, EXACT8 (int8-coarse sweep) beyond — the new
             auto default

and reports build vec/s + graph recall@10 (T=4/8 at ef=64) for each, so
the BASELINE quality/throughput trade past the 600k crossover is measured,
not assumed.
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

N, DIMS, M, EFC, EFS, K, NQ, REPS = 1_000_000, 128, 16, 64, 64, 10, 1024, 8


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    rng = np.random.default_rng(777 + N)
    n_centers = N // 20
    centers = rng.normal(scale=4.0, size=(n_centers, DIMS)).astype(np.float32)
    pts = np.empty((N, DIMS), np.float32)
    step = 500_000
    for off in range(0, N, step):
        a = rng.integers(0, n_centers, min(step, N - off))
        pts[off: off + len(a)] = (
            centers[a] + rng.normal(size=(len(a), DIMS)).astype(np.float32))
    qs = (centers[rng.integers(0, n_centers, NQ)] +
          rng.normal(size=(NQ, DIMS)).astype(np.float32)).astype(np.float32)
    qdev = jnp.asarray(qs)
    log("data ready")

    cfg = HnswConfig(dims=DIMS, m=M, ef_construction=EFC, ef_search=EFS)
    oracle = None
    out = {}
    for name, e8_thresh in (("r3_exact8", None), ("r2_beam", 600_000)):
        idx = HnswIndex(cfg, max_insert_batch=256)
        idx.exact8_build_threshold = e8_thresh
        # warm ALL slab programs at this capacity before timing
        warm = HnswIndex(cfg, initial_capacity=N + 256, max_insert_batch=256)
        warm.exact8_build_threshold = e8_thresh
        big, small = warm.slab_batches
        warm.add(pts[: (big + 1) * 256])
        warm.exact_build_threshold = 0          # compile the tail engine
        warm.add(pts[(big + 1) * 256: (2 * big + 2) * 256])
        np.asarray(warm.graph.n_nodes)
        del warm
        t0 = time.time()
        idx.build(pts)
        np.asarray(idx.graph.n_nodes)
        dt = time.time() - t0
        vps = N / dt
        log(f"{name}: build {vps:.0f} vec/s ({dt / 60:.1f} min)")
        out[f"{name}_build_vps"] = round(vps, 1)

        if oracle is None:
            _, ol, _ = idx.exact_search(qs, K)
            oracle = ol.astype(np.int64)
        for t in (4, 8):
            d, i, _ = search_graph(idx.graph, qdev, ef=EFS, metric_value=0,
                                   expand_width=t)
            r = float(np.mean([
                len(set(np.asarray(i)[rr][:K].tolist()) &
                    set(oracle[rr][:K].tolist())) / K for rr in range(NQ)]))
            t0 = time.time()
            for _ in range(REPS):
                d, i, _ = search_graph(idx.graph, qdev, ef=EFS,
                                       metric_value=0, expand_width=t)
            np.asarray(d)
            qps = REPS * NQ / (time.time() - t0)
            log(f"{name}: graph T={t} recall {r:.4f} QPS {qps:.0f}")
            out[f"{name}_recall_t{t}"] = round(r, 4)
            out[f"{name}_qps_t{t}"] = round(qps, 1)
        del idx

    log(json.dumps(out))
    with open("/tmp/bench_exact8_1m.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
