#!/usr/bin/env python
"""exact vs exact8 BELOW the 600k crossover (ROADMAP #3 build-rate half).

The quality half is already measured (CPU, hardware-independent):
exact8-built graphs are recall-IDENTICAL to exact-built ones below the
crossover (60k x 64d clustered, recall@10 1.0000 at ef=32/64/128 for
both — ROADMAP.md #3).  What decides whether exact8 becomes the auto
default below 600k is TPU build RATE: the int8 coarse sweep reads 4x
fewer HBM bytes per chunk but pays int8-shadow maintenance per slab and
an exact-f32 rerank of a 2x pool.

Builds the same 500k x 128d corpus twice:
  exact : the pre-flip auto default (exact_build_threshold = 600k)
  exact8: exact_build_threshold = 0 (coarse sweep from row 0)
Measured 2026-08-18 on v5e: exact 5,184 vec/s vs exact8 12,961 vec/s
(2.5x) at identical recall@10 0.999 — which flipped the auto default to
exact8 from row 0 on both tiers.
and reports build vec/s + graph recall@10 (T=8, ef=64) for each.
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

N, DIMS, M, EFC, EFS, K, NQ = 500_000, 128, 16, 64, 64, 10, 1024


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    rng = np.random.default_rng(555 + N)
    n_centers = N // 20
    centers = rng.normal(scale=4.0, size=(n_centers, DIMS)).astype(np.float32)
    a = rng.integers(0, n_centers, N)
    pts = (centers[a] +
           rng.normal(size=(N, DIMS)).astype(np.float32)).astype(np.float32)
    qs = (centers[rng.integers(0, n_centers, NQ)] +
          rng.normal(size=(NQ, DIMS)).astype(np.float32)).astype(np.float32)
    qdev = jnp.asarray(qs)
    log("data ready")

    cfg = HnswConfig(dims=DIMS, m=M, ef_construction=EFC, ef_search=EFS)
    oracle = None
    out = {}
    for name, threshold in (("exact", 600_000), ("exact8", 0)):
        # warm the slab programs at the final capacity before timing
        warm = HnswIndex(cfg, initial_capacity=N + 256, max_insert_batch=256)
        warm.exact_build_threshold = threshold
        big, _ = warm.slab_batches
        warm.add(pts[: (big + 1) * 256])
        np.asarray(warm.graph.n_nodes)
        del warm

        idx = HnswIndex(cfg, initial_capacity=N + 256, max_insert_batch=256)
        idx.exact_build_threshold = threshold
        t0 = time.time()
        idx.build(pts)
        np.asarray(idx.graph.n_nodes)
        dt = time.time() - t0
        vps = N / dt
        log(f"{name}: build {vps:.0f} vec/s ({dt:.0f} s)")
        out[f"{name}_build_vps"] = round(vps, 1)

        if oracle is None:
            _, ol, _ = idx.exact_search(qs, K)
            oracle = ol.astype(np.int64)
        d, i, _ = search_graph(idx.graph, qdev, ef=EFS, metric_value=0,
                               expand_width=8)
        ih = np.asarray(i)
        r = float(np.mean([
            len(set(ih[rr][:K].tolist()) & set(oracle[rr][:K].tolist())) / K
            for rr in range(NQ)]))
        log(f"{name}: graph T=8 recall {r:.4f}")
        out[f"{name}_recall_t8"] = round(r, 4)
        del idx

    out["exact8_speedup"] = round(
        out["exact8_build_vps"] / out["exact_build_vps"], 3)
    log(json.dumps(out))
    with open("/tmp/bench_exact8_below.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
