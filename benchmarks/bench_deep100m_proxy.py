#!/usr/bin/env python
"""Deep100M-shaped sharded demonstration (BASELINE config 5; VERDICT r2
item 3).

Real 8-chip meshes are not available in this environment (one tunneled
chip), so config 5 is demonstrated honestly in two composable halves:

  PHASE BUILD (this script, on the TPU, --phase build):
    partition a 16M x 96d corpus round-robin into 8 shards of 2M; build
    each shard's flat-NSW graph ON THE REAL CHIP sequentially (the same
    single-chip engine a real v5p-16 would run per chip, exact8
    construction candidates); write each shard with the per-shard-split
    save format (one file per shard + manifest) — the format a multi-host
    mesh needs anyway (each host checkpoints its own shard).

  PHASE SERVE (--phase serve, CPU 8-device mesh):
    load the assembled ShardedHnswIndex on an 8-virtual-device mesh,
    run the REAL sharded serving path (shard_map beam search + on-shard
    tombstone filter + all_gather over the mesh + global top-k merge)
    against a 16M exact oracle -> merged recall@10.  CPU-mesh timings are
    NOT TPU numbers and are not reported as such; the per-chip serving
    throughput column for config 5 composes from the measured single-chip
    10M numbers (benchmarks/bench_10m.py) as documented in BASELINE.md.

Corpus: synthetic clustered 96-d (Deep-like), seed-pinned.

Usage:
  JAX on TPU:  python benchmarks/bench_deep100m_proxy.py --phase build
  CPU mesh:    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
               python benchmarks/bench_deep100m_proxy.py --phase serve
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TOTAL = int(os.environ.get("D100M_N", 16_000_000))
DIMS = 96
S = 8
M, EFC, EFS, K = 16, 64, 64, 10
NQ = int(os.environ.get("D100M_NQ", 256))
OUT_DIR = os.environ.get("D100M_DIR", "/tmp/deep100m_proxy")
PER_SHARD = N_TOTAL // S


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def shard_points(i, rng_centers):
    """Shard i's rows (global positions p with p % S == i), generated
    chunk-wise from the shared center table (seeded per shard so each
    shard regenerates only its slice)."""
    rng = np.random.default_rng(9000 + i)
    a = rng.integers(0, len(rng_centers), PER_SHARD)
    pts = rng_centers[a] + rng.normal(
        size=(PER_SHARD, DIMS)).astype(np.float32)
    return pts.astype(np.float32)


def centers():
    rng = np.random.default_rng(77)
    return rng.normal(scale=4.0, size=(100_000, DIMS)).astype(np.float32)


def queries(cts):
    rng = np.random.default_rng(78)
    return (cts[rng.integers(0, len(cts), NQ)] +
            rng.normal(size=(NQ, DIMS))).astype(np.float32)


def build_phase():
    """TPU: build the 8 shard graphs sequentially, write split snapshot."""
    import jax.numpy as jnp  # noqa: F401
    from pg_embedding_tpu import HnswConfig, HnswIndex
    from pg_embedding_tpu.api import _atomic_savez

    os.makedirs(OUT_DIR, exist_ok=True)
    cts = centers()
    cfg = HnswConfig(dims=DIMS, m=M, ef_construction=EFC, ef_search=EFS)
    counts = []
    t_all = time.time()
    for i in range(S):
        f = os.path.join(OUT_DIR, f"index.shard{i}.npz")
        if os.path.exists(f):
            log(f"shard {i}: exists, skipping")
            counts.append(PER_SHARD)
            continue
        pts = shard_points(i, cts)
        idx = HnswIndex(cfg, max_insert_batch=256)
        t0 = time.time()
        idx.build(pts)               # exact8 past 600k (auto default)
        np.asarray(idx.graph.n_nodes)
        dt = time.time() - t0
        log(f"shard {i}: built {PER_SHARD} rows at "
            f"{PER_SHARD / dt:.0f} vec/s ({dt / 60:.1f} min)")
        n = idx.n_nodes
        # labels = global positions (round-robin: pos = slot*S + shard)
        labels = (np.arange(n, dtype=np.uint64) * S + i)
        payload = dict(
            shard=np.int64(i),
            vectors=idx._to_host(idx.graph.vectors, n, np.float32),
            links=idx._to_host(idx.graph.links, n),
            link_counts=idx._to_host(idx.graph.link_counts, n),
            deleted=idx._to_host(idx.graph.deleted, n),
            labels=labels,
            positions=labels.astype(np.int64),
        )
        _atomic_savez(f, payload, False)
        counts.append(n)
        del idx
    # manifest
    manifest = dict(
        format_version=np.int64(1),
        config=np.frombuffer(json.dumps(cfg.to_dict()).encode(),
                             dtype=np.uint8),
        storage_dtype=np.frombuffer(b"float32", dtype=np.uint8),
        n_shards=np.int64(S),
        shard_counts=np.asarray(counts, np.int64),
        wal_offset=np.int64(-1), wal_epoch=np.int64(-1),
        per_shard=np.int64(1),
    )
    _atomic_savez(os.path.join(OUT_DIR, "index.npz"), manifest, True)
    log(f"build phase done in {(time.time() - t_all) / 60:.1f} min; "
        f"split snapshot at {OUT_DIR}/index.npz")


def serve_phase():
    """CPU 8-device mesh: load split snapshot, sharded search, recall."""
    from pg_embedding_tpu import ShardedHnswIndex

    cts = centers()
    qs = queries(cts)
    t0 = time.time()
    idx = ShardedHnswIndex.load(os.path.join(OUT_DIR, "index.npz"))
    log(f"loaded {idx.n_nodes:,} rows over {idx.n_shards} shards "
        f"({time.time() - t0:.0f}s)")
    assert idx.n_nodes == N_TOTAL

    # exact oracle over the full corpus, chunk-wise on host (numpy),
    # regenerating shard rows to avoid holding 16M x 96 twice
    oracle_path = os.path.join(OUT_DIR, "oracle.npy")
    if os.path.exists(oracle_path):
        oracle = np.load(oracle_path)
    else:
        t0 = time.time()
        # float64 throughout: the f32 matmul expansion's cancellation can
        # mis-rank near-ties (the round-2 exact-oracle artifact)
        q64 = qs.astype(np.float64)
        best_d = np.full((NQ, K), np.inf, np.float64)
        best_l = np.zeros((NQ, K), np.int64)
        qn = (q64 * q64).sum(1)[:, None]
        for i in range(S):
            pts = shard_points(i, cts)
            labels = np.arange(PER_SHARD, dtype=np.int64) * S + i
            step = 500_000
            for off in range(0, PER_SHARD, step):
                blk = pts[off: off + step].astype(np.float64)
                d2 = (qn + (blk * blk).sum(1)[None, :] -
                      2.0 * q64 @ blk.T)
                sel = np.argpartition(d2, K, 1)[:, :K]
                cd = np.concatenate(
                    [best_d, np.take_along_axis(d2, sel, 1)], 1)
                cl = np.concatenate(
                    [best_l, labels[off + sel]], 1)
                s2 = np.argpartition(cd, K, 1)[:, :K]
                best_d = np.take_along_axis(cd, s2, 1)
                best_l = np.take_along_axis(cl, s2, 1)
            log(f"oracle: shard {i} swept")
        order = np.argsort(best_d, 1)
        oracle = np.take_along_axis(best_l, order, 1)
        np.save(oracle_path, oracle)
        log(f"oracle done ({time.time() - t0:.0f}s)")

    out = {"n_total": N_TOTAL, "n_shards": S, "dims": DIMS}
    for t in (4, 8):
        idx.search_expand_width = t
        idx._step_cache.clear()
        t0 = time.time()
        d, l, v = idx.search(qs, K, mode="graph")
        dt = time.time() - t0
        rec = float(np.mean([
            len(set(l[r][v[r]].astype(np.int64).tolist()) &
                set(oracle[r].tolist())) / K for r in range(NQ)]))
        log(f"sharded graph T={t}: merged recall@10 {rec:.4f} "
            f"({dt:.0f}s on the CPU mesh — not a TPU number)")
        out[f"recall_t{t}"] = round(rec, 4)
    log(json.dumps(out))
    with open(os.path.join(OUT_DIR, "result.json"), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["build", "serve"], required=True)
    args = ap.parse_args()
    (build_phase if args.phase == "build" else serve_phase)()
