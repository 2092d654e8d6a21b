#!/usr/bin/env python
"""Measured 10M CPU baseline (VERDICT r2 item 1b).

Runs ONLY the CPU reference engine (csrc/hnsw_ref.cpp) on the exact same
synthetic 10M x 128d corpus as benchmarks/bench_10m.py (same seed, same
draw order), so its numbers are directly comparable with the TPU rows in
BASELINE.md's 10M table.  No JAX import — safe to run as a nohup job while
TPU work happens elsewhere.

Design for a 1-core shared host:
  * build via per-point add() with a timestamped progress line every 250k
    inserts — the per-chunk rates let us pick quiet-window (unpolluted)
    throughput, and show the log-N rate decline directly;
  * search QPS measured in N_ROUNDS repeated rounds with timestamps —
    report the best round (least polluted by concurrent host load);
  * exact oracle computed here on CPU (blocked matmul) for recall@10.

Reference role being filled: the CPU re-run IS the recall/QPS bar
(SURVEY.md §6); cf. /root/reference/hnswalg.cpp:42-232 semantics carried
by csrc/hnsw_ref.cpp.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg_embedding_tpu.utils.cpu_ref import CpuRefIndex  # noqa: E402

N = int(os.environ.get("B10M_N", 10_000_000))
DIMS, M, EFC, EFS, K = 128, 16, 64, 64, 10
NQ = int(os.environ.get("B10M_NQ", 256))
N_ROUNDS = int(os.environ.get("B10M_ROUNDS", 10))
CHUNK = min(250_000, N)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def make_data():
    # EXACT copy of benchmarks/bench_10m.py:make_data draw order.
    rng = np.random.default_rng(4242)
    n_centers = 50_000
    centers = rng.normal(scale=4.0, size=(n_centers, DIMS)).astype(np.float32)
    pts = np.empty((N, DIMS), np.float32)
    step = min(1_000_000, N)
    for off in range(0, N, step):
        a = rng.integers(0, n_centers, step)
        pts[off: off + step] = (
            centers[a] + rng.normal(size=(step, DIMS)).astype(np.float32))
    qs = (centers[rng.integers(0, n_centers, 1024)] +
          rng.normal(size=(1024, DIMS)).astype(np.float32)).astype(np.float32)
    return pts, qs[:NQ]


def exact_oracle(pts, qs):
    """Exact L2 top-K on CPU, blocked over the corpus."""
    nq = qs.shape[0]
    best_d = np.full((nq, K), np.inf, np.float32)
    best_i = np.zeros((nq, K), np.int64)
    qn = (qs * qs).sum(1)[:, None]
    for off in range(0, N, CHUNK):
        blk = pts[off: off + CHUNK]
        d2 = qn + (blk * blk).sum(1)[None, :] - 2.0 * qs @ blk.T
        cat_d = np.concatenate([best_d, d2.astype(np.float32)], 1)
        cat_i = np.concatenate(
            [best_i, np.broadcast_to(np.arange(off, off + blk.shape[0],
                                               dtype=np.int64), (nq, blk.shape[0]))], 1)
        sel = np.argpartition(cat_d, K, 1)[:, :K]
        best_d = np.take_along_axis(cat_d, sel, 1)
        best_i = np.take_along_axis(cat_i, sel, 1)
    order = np.argsort(best_d, 1)
    return np.take_along_axis(best_i, order, 1)


def main():
    t0 = time.time()
    pts, qs = make_data()
    log(f"data ready ({pts.nbytes / 1e9:.1f} GB, {time.time() - t0:.0f}s)")

    oracle_path = "/tmp/bench10m_cpu_oracle.npy"
    if os.path.exists(oracle_path):
        oracle = np.load(oracle_path)
        log("oracle loaded from cache")
    else:
        t0 = time.time()
        oracle = exact_oracle(pts, qs)
        np.save(oracle_path, oracle)
        log(f"exact oracle done ({time.time() - t0:.0f}s)")

    cpu = CpuRefIndex(DIMS, m=M, ef_construction=EFC)
    labels = np.arange(N, dtype=np.uint64)
    t_build0 = time.time()
    t_chunk = t_build0
    for i in range(N):
        cpu.add(pts[i], int(labels[i]))
        if (i + 1) % CHUNK == 0:
            now = time.time()
            log(f"built {i + 1:>10,}  chunk {CHUNK / (now - t_chunk):7.0f} vec/s"
                f"  overall {(i + 1) / (now - t_build0):7.0f} vec/s")
            t_chunk = now
    build_s = time.time() - t_build0
    log(f"CPU build DONE: {N / build_s:.0f} vec/s overall ({build_s / 60:.1f} min)")

    got = np.full((NQ, K), -1, np.int64)
    for r in range(NQ):
        _, lab = cpu.search(qs[r], EFS)
        got[r, :min(K, len(lab))] = lab[:K].astype(np.int64)
    rec = float(np.mean([
        len(set(got[r].tolist()) & set(oracle[r][:K].tolist())) / K
        for r in range(NQ)]))
    log(f"CPU recall@10 at ef={EFS}: {rec:.4f}")

    best_qps = 0.0
    for rnd in range(N_ROUNDS):
        t0 = time.time()
        for r in range(NQ):
            cpu.search(qs[r], EFS)
        qps = NQ / (time.time() - t0)
        best_qps = max(best_qps, qps)
        log(f"QPS round {rnd}: {qps:.0f}")

    out = {"n": N, "dims": DIMS, "cpu_build_vps": round(N / build_s, 1),
           "cpu_build_min": round(build_s / 60, 1),
           "cpu_recall_at_ef64": round(rec, 4),
           "cpu_qps_best": round(best_qps, 1)}
    log(json.dumps(out))
    with open("/tmp/bench10m_cpu_result.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
