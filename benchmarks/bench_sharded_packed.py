#!/usr/bin/env python
"""Sharded strict-parity packed serving, measured (VERDICT r3 item 4's
bench half; the capability + bit-identity tests landed in r4 commit
8b5b1d2).

Protocol matches the r3 sharded config row: the REAL chip as a 1-device
mesh (the sharded slab/search programs are the same shard_map code that
runs on N devices; ICI merge degenerates to identity).  400k x 128d L2 —
inside packed-f32's memory regime (records = maxM*D*4 = 16KB/node,
~6.6GB at 400k; the <=500k band from BASELINE r3).

Measures: sharded plain walk vs cast-f32 (identical ids/order; distance
scalars final-ulp on TPU, bit-identical on CPU), cast-bf16, packed-int8,
all T=8 ef=64, streaming QPS via the device-side step functions (run.py
protocol).

Run: nohup python benchmarks/bench_sharded_packed.py > /tmp/bench_shpk.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from pg_embedding_tpu import HnswConfig, ShardedHnswIndex  # noqa: E402

N = int(os.environ.get("SHPK_N", 400_000))
DIMS, M, EFC, EFS, K = 128, 16, 64, 64, 10
NQ = int(os.environ.get("SHPK_NQ", 1024))
REPS = int(os.environ.get("SHPK_REPS", 8))


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
    a = rng.integers(0, n_centers, N)
    pts = (centers[a] + rng.normal(size=(N, DIMS)).astype(np.float32))
    qs = (centers[rng.integers(0, n_centers, NQ)] +
          rng.normal(size=(NQ, DIMS)).astype(np.float32)).astype(np.float32)

    cfg = HnswConfig(dims=DIMS, m=M, ef_construction=EFC, ef_search=EFS)
    idx = ShardedHnswIndex(cfg)
    log(f"{idx.n_shards} shard(s)")
    t0 = time.time()
    idx.build(pts, np.arange(N))
    np.asarray(idx._arrays[4])
    build_s = time.time() - t0
    log(f"sharded build: {N / build_s:.0f} vec/s")

    _, ol, _ = idx.exact_search(qs, K)
    oracle = ol.astype(np.int64)
    qdev = jnp.asarray(qs)
    excl = idx._filter_to_excluded(None)   # per-shard bool[S, cap] mask

    out = {"n": N, "dims": DIMS, "n_shards": idx.n_shards,
           "build_vps": round(N / build_s, 1)}
    results = {}
    for variant, dtype in (("plain", None), ("cast", "float32"),
                           ("cast_bf16", "bfloat16"), ("packed", "int8")):
        if dtype is None:
            idx.packed_traversal = False
            aux = ()
            v = "plain"
        else:
            idx.packed_traversal = True
            idx.packed_dtype = dtype
            idx._packed = None
            t0 = time.time()
            aux = idx._ensure_packed()
            np.asarray(aux[0][0, 0, 0])   # true sync; stacked records are
            # [S, cap, maxM*D] (flat per-shard layout, sharded.py:723+)
            log(f"{variant} pack: {time.time() - t0:.1f}s")
            v = idx._traversal_variant()
        step = idx._search_step(EFS, min(K, EFS * idx.n_shards), variant=v)
        d, g, _ = step(idx._arrays, qdev, excl, *aux)
        dn, gn = np.asarray(d), np.asarray(g)
        r = recall(gn, oracle)
        results[variant] = (dn, gn)
        t0 = time.time()
        for _ in range(REPS):
            d, g, _ = step(idx._arrays, qdev, excl, *aux)
        np.asarray(d)
        qps = REPS * NQ / (time.time() - t0)
        log(f"sharded {variant} T={idx.search_expand_width} ef={EFS}: "
            f"{qps:.0f} QPS, recall@10 {r:.4f}")
        out[f"{variant}_qps"] = round(qps, 1)
        out[f"{variant}_recall"] = round(r, 4)

    # strict-parity invariant on TPU: identical ids AND order; distance
    # scalars may differ in the final ulp (XLA reduction layouts differ
    # between the row-gather and record-gather producers — measured
    # 2.8e-7 max relative at 400k; bit-identity holds on CPU and is
    # pinned by tests/test_sharded_packed_cast.py)
    dp, gp = results["plain"]
    dc, gc = results["cast"]
    ids_identical = bool(np.array_equal(gp, gc))
    m = np.isfinite(dp) & np.isfinite(dc)
    max_rel = float(np.max(np.abs(dp[m] - dc[m]) /
                           np.maximum(np.abs(dp[m]), 1e-30)))
    out["cast_f32_ids_identical"] = ids_identical
    out["cast_f32_max_rel_dist_diff"] = max_rel
    log(f"cast-f32 ids/order identical to plain: {ids_identical}; "
        f"max rel dist diff {max_rel:.2e}")
    log(json.dumps(out))


if __name__ == "__main__":
    main()
