#!/usr/bin/env python
"""BASELINE configs 2 and 3 at NATIVE scale (VERDICT r3 item 2).

Config 2: GloVe-100-class — 1,183,514 x 100d cosine, normalized vectors
          (reference opclass ann_cos_ops, embedding--0.3.6.sql:57-70).
Config 3: GIST1M-class   — 1,000,000 x 960d L2 (wide-vector tiling;
          reference metric formulas distfunc.c:121-155).

Both were previously measured only at 100k (a tenth of their defined
scale); wide dims change exact8 chunking, VMEM tiling, and the
packed-record memory math, so this measures the real thing:

  * TPU: build (exact8 auto default), exact-sweep serving (recall 1.0),
    plain graph walk T=8 at ef 64/128, and the per-config packed modes
    that physically fit the chip:
      glove 100d: int8 (3.8GB records) and bfloat16 (7.6GB) — float32
                  records are 15.1GB and do not fit next to the corpus;
      gist 960d:  int8 records are 30GB/row-dtype over HBM — PQ is the
                  only packed engine at this width (the wide-dim memory
                  wall PQ exists for; BASELINE r4 conclusion 5). G=60
                  (sub-dim 16, 1.9GB) and G=120 (sub-dim 8, 3.8GB).
  * CPU (quiet host, single thread): build + serve at the same scale.

Same synthetic recipe as benchmarks/run.py (seed 42, n//100 centers).
Run serialized on the chip (CLAUDE.md rules):
  nohup python benchmarks/bench_native23.py glove > /tmp/native_glove.log 2>&1 &
  nohup python benchmarks/bench_native23.py gist  > /tmp/native_gist.log 2>&1 &
Env: SKIP_CPU=1 to skip the CPU baseline, NAT_N to override N.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from pg_embedding_tpu import HnswConfig, HnswIndex, Metric  # noqa: E402
from pg_embedding_tpu.core.search import (  # noqa: E402
    search_graph, search_graph_packed, search_graph_pq)
from pg_embedding_tpu.utils.io import synthetic_clustered  # noqa: E402

CONFIGS = {
    "glove": dict(n=1_183_514, dims=100, metric=Metric.COSINE,
                  normalized=True, nq=1024),
    "gist": dict(n=1_000_000, dims=960, metric=Metric.L2,
                 normalized=False, nq=512),
}
M, EFC, K, REPS = 16, 64, 10, 4


def log(msg):
    print(msg, flush=True)


def recall(ids, oracle):
    return float(np.mean([
        len(set(ids[r][:K].tolist()) & set(oracle[r][:K].tolist())) / K
        for r in range(ids.shape[0])]))


def serve(fn, qdev, nq, label, oracle, out, key):
    d, i, _ = fn(qdev)
    r = recall(np.asarray(i), oracle)
    t0 = time.time()
    for _ in range(REPS):
        d, i, _ = fn(qdev)
    np.asarray(d)
    qps = REPS * nq / (time.time() - t0)
    log(f"{label}: {qps:.0f} QPS, recall@10 {r:.4f}")
    out[f"{key}_qps"] = round(qps, 1)
    out[f"{key}_recall"] = round(r, 4)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "glove"
    c = CONFIGS[name]
    n = int(os.environ.get("NAT_N", c["n"]))
    dims, metric, nq = c["dims"], c["metric"], c["nq"]
    mv = metric.value

    pts, qs = synthetic_clustered(n, dims, n_centers=max(n // 100, 16),
                                  seed=42, n_queries=nq)
    if c["normalized"]:
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    log(f"[{name}] data ready: {n:,} x {dims}d ({pts.nbytes / 1e9:.1f} GB)")

    out = {"config": name, "n": n, "dims": dims, "metric": metric.name}
    cfg = HnswConfig(dims=dims, m=M, ef_construction=EFC, ef_search=64,
                     metric=metric)
    idx = HnswIndex(cfg, initial_capacity=n + 256, max_insert_batch=256)
    t0 = time.time()
    idx.add(pts, np.arange(n))
    np.asarray(idx.graph.n_nodes)
    build_s = time.time() - t0
    out["build_vps"] = round(n / build_s, 1)
    log(f"[{name}] TPU build: {n / build_s:.0f} vec/s ({build_s / 60:.1f} min)")

    # drop the exact8 build shadow before serving
    idx._qvec = idx._qscale = None
    idx._qvec_rows = 0

    qdev = jnp.asarray(qs)
    _, ol, _ = idx.exact_search(qs, K)
    oracle = ol.astype(np.int64)
    log(f"[{name}] oracle ready")

    # exact sweep (the auto route at this scale): streaming QPS
    t0 = time.time()
    for _ in range(REPS):
        de, ie, _ = idx.exact_search(qs, K)
    np.asarray(de)
    qps_e = REPS * nq / (time.time() - t0)
    out["exact_qps"] = round(qps_e, 1)
    log(f"[{name}] exact sweep: {qps_e:.0f} QPS (recall 1.0)")

    # plain graph walk
    for t, ef in ((8, 64), (8, 128)):
        serve(lambda q, t=t, ef=ef: search_graph(
            idx.graph, q, ef=ef, metric_value=mv, expand_width=t),
            qdev, nq, f"[{name}] plain T={t} ef={ef}", oracle, out,
            f"plain_t{t}_ef{ef}")

    cap = idx.graph.capacity
    base_gb = (idx.graph.vectors.nbytes + idx.graph.links.nbytes) / 1e9
    if name == "glove":
        for dt in ("int8", "bfloat16"):
            bpf = {"int8": 1, "bfloat16": 2}[dt]
            rec_gb = cap * cfg.max_m * dims * bpf / 1e9
            if rec_gb + base_gb > 14.0:
                log(f"[{name}] {dt} records {rec_gb:.1f} GB > HBM, skipped")
                out[f"{dt}_skipped"] = "records_over_hbm"
                continue
            idx.packed_traversal = True
            idx.packed_dtype = dt
            # drop the previous dtype's records BEFORE packing the next —
            # the loop locals kept 3.8 GB of int8 records alive through
            # the 7.7 GB bf16 pack (OOM on the first native-scale run)
            idx._pcodes = idx._pscales = None
            pc = ps = None
            t0 = time.time()
            pc, ps = idx._ensure_packed()
            np.asarray(pc[0, 0])
            log(f"[{name}] {dt} pack: {time.time() - t0:.1f}s; "
                f"records {pc.nbytes / 1e9:.2f} GB")
            serve(lambda q, pc=pc, ps=ps: search_graph_packed(
                idx.graph, q, pc, ps, ef=64, metric_value=mv,
                expand_width=8),
                qdev, nq, f"[{name}] packed-{dt} T=8 ef=64", oracle, out,
                f"packed_{dt}_t8")
            idx._pcodes = idx._pscales = None
            pc = ps = None
    else:  # gist 960d: PQ is the only packed engine at this width
        out["int8_skipped"] = "records_30GB_over_hbm"
        for groups in (60, 120):
            rec_gb = cap * cfg.max_m * groups / 1e9
            if rec_gb + base_gb > 14.0:
                log(f"[{name}] pq G={groups} records {rec_gb:.1f} GB > HBM, "
                    "skipped")
                out[f"pq_g{groups}_skipped"] = "records_over_hbm"
                continue
            idx.packed_traversal = True
            idx.packed_dtype = "pq"
            idx.pq_groups = groups
            idx._pq_codebook = None
            idx._pq_codes = None
            idx._pcodes = idx._pscales = None
            t0 = time.time()
            pc, _ = idx._ensure_packed()
            np.asarray(pc[0, 0])
            log(f"[{name}] pq G={groups} pack: {time.time() - t0:.1f}s; "
                f"records {pc.nbytes / 1e9:.2f} GB")
            cb, rot = idx._pq_codebook, idx._pq_rot
            for ef in (64, 128):
                serve(lambda q, ef=ef: search_graph_pq(
                    idx.graph, q, pc, cb, rot, ef=ef, metric_value=mv,
                    expand_width=8),
                    qdev, nq, f"[{name}] pq G={groups} T=8 ef={ef}", oracle,
                    out, f"pq_g{groups}_t8_ef{ef}")
            idx._pcodes = None
            pc = None

    if os.environ.get("SKIP_CPU") != "1":
        from pg_embedding_tpu.utils.cpu_ref import CpuRefIndex
        cpu = CpuRefIndex(dims, m=M, ef_construction=EFC, metric=mv)
        t0 = time.time()
        cpu.build(pts, np.arange(n))
        cpu_build = n / (time.time() - t0)
        log(f"[{name}] CPU build: {cpu_build:.0f} vec/s "
            f"({(time.time() - t0) / 60:.1f} min)")
        got = np.stack([cpu.search(q, 64)[1][:K] for q in qs[:256]])
        cpu_rec = recall(got, oracle[:256])
        t0 = time.time()
        for q in qs[:512]:
            cpu.search(q, 64)
        cpu_qps = 512 / (time.time() - t0)
        log(f"[{name}] CPU ef=64: {cpu_qps:.0f} QPS, recall {cpu_rec:.4f}")
        out.update(cpu_build_vps=round(cpu_build, 1),
                   cpu_qps=round(cpu_qps, 1), cpu_recall=round(cpu_rec, 4))

    log(json.dumps(out))


if __name__ == "__main__":
    main()
