#!/usr/bin/env python
"""Multi-config benchmark harness for the BASELINE.md matrix.

Configs mirror BASELINE.md (real datasets are unavailable in this zero-egress
environment, so each uses a synthetic stand-in with the same dims/metric/
scale characteristics; pass --data-dir with .fvecs files to use real data):

  sift    SIFT1M-like   128-d L2      (m=16, efc=64, efs=64)
  glove   GloVe-100-like 100-d cosine (normalized)
  gist    GIST1M-like   960-d L2     (wide-vector tiling)
  deep    Deep-like      96-d L2     (10k-query batched throughput)
  sharded Deep-like sharded over the device mesh (per-shard search +
          ICI top-k merge)

Usage:
  python benchmarks/run.py --config sift --n 100000
  python benchmarks/run.py --config all --n 100000 --cpu-baseline
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg_embedding_tpu import HnswConfig, HnswIndex, Metric  # noqa: E402
from pg_embedding_tpu.utils.io import read_vecs, synthetic_clustered  # noqa: E402

CONFIGS = {
    "sift": dict(dims=128, metric=Metric.L2, m=16, efc=64, efs=64,
                 n_queries=1024, normalized=False),
    "glove": dict(dims=100, metric=Metric.COSINE, m=16, efc=64, efs=64,
                  n_queries=1024, normalized=True),
    "gist": dict(dims=960, metric=Metric.L2, m=16, efc=64, efs=64,
                 n_queries=512, normalized=False),
    "deep": dict(dims=96, metric=Metric.L2, m=16, efc=64, efs=64,
                 n_queries=10240, normalized=False),
    "sharded": dict(dims=96, metric=Metric.L2, m=16, efc=64, efs=64,
                    n_queries=1024, normalized=False),
}

K = 10


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def load_data(name, cfg, n, data_dir=None):
    if data_dir:
        base = os.path.join(data_dir, f"{name}_base.fvecs")
        qf = os.path.join(data_dir, f"{name}_query.fvecs")
        if os.path.exists(base) and os.path.exists(qf):
            pts = read_vecs(base, count=n).astype(np.float32)
            qs = read_vecs(qf, count=cfg["n_queries"]).astype(np.float32)
            return pts, qs
    pts, qs = synthetic_clustered(n, cfg["dims"], n_centers=max(n // 100, 16),
                                  seed=42, n_queries=cfg["n_queries"])
    if cfg["normalized"]:
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    return pts, qs


def recall_at_k(l, v, ol):
    return float(np.mean([
        len(set(l[i][v[i]][:K].tolist()) & set(ol[i][:K].tolist())) / K
        for i in range(l.shape[0])]))


def run_single(name, n, data_dir=None, reps=5):
    cfg = CONFIGS[name]
    pts, qs = load_data(name, cfg, n, data_dir)
    hc = HnswConfig(dims=cfg["dims"], m=cfg["m"], ef_construction=cfg["efc"],
                    ef_search=cfg["efs"], metric=cfg["metric"])

    if name == "sharded":
        from pg_embedding_tpu import ShardedHnswIndex
        idx = ShardedHnswIndex(hc)
        log(f"[{name}] {idx.n_shards} shards")
    else:
        idx = HnswIndex(hc)

    t0 = time.time()
    idx.build(pts)
    if hasattr(idx, "graph"):
        np.asarray(idx.graph.n_nodes)
    else:
        np.asarray(idx._arrays[4])
    build_s = time.time() - t0
    log(f"[{name}] build {n}: {build_s:.1f}s = {n / build_s:.0f} vec/s")

    _, ol, ov = idx.exact_search(qs, K)

    out = {"config": name, "n": n, "build_vps": round(n / build_s, 1)}
    for mode in ("graph", "auto"):
        d, l, v = idx.search(qs, K, mode=mode)
        r = recall_at_k(l, v, ol)
        # synchronous per-batch latency (includes host round trip)
        t0 = time.time()
        idx.search(qs, K, mode=mode)
        lat = time.time() - t0
        # streaming throughput: keep the device pipeline full, sync once
        qps = _streaming_qps(idx, qs, mode, reps)
        log(f"[{name}] {mode}: {qps:.0f} QPS streaming, "
            f"{lat * 1000:.0f}ms/batch sync, recall@10={r:.4f}")
        out[f"{mode}_qps"] = round(qps, 1)
        out[f"{mode}_recall"] = round(r, 4)
        out[f"{mode}_latency_ms"] = round(lat * 1000, 1)
    return out


def _streaming_qps(idx, qs, mode, reps):
    """Streaming (pipeline-full, one final sync) throughput of the
    device-side engine call a serving loop would issue.

    The call is WARMED before the window opens: these engine-direct
    programs are not always the ones the preceding API calls compiled
    (e.g. api.exact_search passes deleted=None on a tombstone-free
    index, while the serving-shaped call here passes the mask array),
    and on the tunneled dev box a cold compile/fetch inside the timed
    window swamps the measurement — the r5 matrix run recorded compile
    time as "672 QPS" until this warm-up was added (bench.py has always
    warmed; BASELINE r5)."""
    import jax.numpy as jnp

    qdev = jnp.asarray(qs)
    if hasattr(idx, "graph"):  # single-chip HnswIndex
        from pg_embedding_tpu.core.search import search_graph
        from pg_embedding_tpu.ops.bruteforce import exact_search
        from pg_embedding_tpu.ops.pallas_bruteforce import pallas_exact_search

        use_exact = mode == "auto" and idx._use_exact(len(qs))
        if use_exact:
            try:
                call = lambda: pallas_exact_search(
                    qdev, idx.graph.vectors, K, idx.config.metric,
                    n_valid=len(idx), deleted=idx.graph.deleted)[0]
                np.asarray(call())          # compile outside the window
            except ValueError:  # Manhattan: jnp fallback
                call = lambda: exact_search(
                    qdev, idx.graph.vectors, K, idx.config.metric,
                    n_valid=len(idx), deleted=idx.graph.deleted)[0]
                np.asarray(call())
        else:
            call = lambda: search_graph(
                idx.graph, qdev, ef=idx.config.ef_search,
                metric_value=idx.config.metric.value,
                expand_width=idx.search_expand_width)[0]
            np.asarray(call())
    else:
        # sharded: the step functions are already device-side (they take
        # a third per-shard `excluded` operand since the filtered-search
        # change)
        excl = idx._filter_to_excluded(None)
        if mode == "auto" and idx._use_exact(len(qs)):
            step = idx._exact_step(K)
            call = lambda: step(idx._arrays, qdev, excl)[0]
        else:
            ef = idx.config.ef_search
            step = idx._search_step(ef, min(K, ef * idx.n_shards))
            call = lambda: step(idx._arrays, qdev, excl)[0]
        np.asarray(call())
    t0 = time.time()
    dd = None
    for _ in range(reps):
        dd = call()
    np.asarray(dd)
    return reps * len(qs) / (time.time() - t0)


def run_cpu_baseline(name, n, data_dir=None):
    from pg_embedding_tpu.utils.cpu_ref import CpuRefIndex
    cfg = CONFIGS[name]
    pts, qs = load_data(name, cfg, n, data_dir)
    idx = CpuRefIndex(cfg["dims"], m=cfg["m"], ef_construction=cfg["efc"],
                      metric=cfg["metric"].value)
    t0 = time.time()
    idx.build(pts)
    build_s = time.time() - t0
    sub = qs[:512]
    t0 = time.time()
    for q in sub:
        idx.search(q, cfg["efs"])
    qps = len(sub) / (time.time() - t0)
    log(f"[{name}] CPU: build {n / build_s:.0f} vec/s, {qps:.0f} QPS "
        f"(single thread)")
    return {"config": name, "cpu_build_vps": round(n / build_s, 1),
            "cpu_qps": round(qps, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="sift",
                    choices=list(CONFIGS) + ["all"])
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--data-dir", default=None,
                    help="directory with <name>_base.fvecs/<name>_query.fvecs")
    ap.add_argument("--cpu-baseline", action="store_true")
    args = ap.parse_args()

    names = list(CONFIGS) if args.config == "all" else [args.config]
    results = []
    for name in names:
        r = run_single(name, args.n, args.data_dir)
        if args.cpu_baseline:
            r.update(run_cpu_baseline(name, args.n, args.data_dir))
        results.append(r)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
