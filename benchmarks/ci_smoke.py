#!/usr/bin/env python
"""CI bench smoke: a small end-to-end build+search on the CPU backend with
CORRECTNESS thresholds (recall floors), plus a relative-regression guard
between the engines.

Absolute QPS thresholds are meaningless on shared CI runners; real-hardware
throughput is recorded per round by the driver (BENCH_r{N}.json) and judged
against BASELINE.md. What CI can catch deterministically:
  * recall floors at ROUND-2 reality (exact-sweep construction candidates
    lifted graph recall to ~1.0 at the bench config; floor 0.97 here vs
    round 1's 0.90)
  * the exact engines agreeing with each other and with a float64 oracle
  * widening/tombstone behavior staying functional
  * the DISPATCH-COUNT property slab inserts bought (round 2): a bulk add
    must issue one device dispatch per slab, not per batch — countable on
    any backend, and exactly the regression that r1's 0.15x-CPU build
    rate came from
  * the exact8 (int8-coarse) candidate engine matching the f32 sweep's
    quality on a small corpus
"""

import os
import subprocess
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def smoke_bench_harnesses():
    """Execute the REAL bench harnesses end-to-end at tiny N on the CPU
    backend — every engine call AND every host-sync line runs exactly as
    on the chip.  This exists because round 4's flat-records layout
    change (api.py commit 3ea3657) broke three harnesses' sync lines
    (bench.py / bench_pq.py / bench_sharded_packed.py indexed the old
    3-D records) and nothing executed them until the driver's headline
    capture crashed mid-round (BENCH_r04 rc=1).  QPS values at tiny N
    are meaningless and ignored; only rc=0 is asserted."""
    base = {**os.environ, "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    jobs = [
        ("bench.py", [sys.executable, os.path.join(REPO, "bench.py")],
         {"BENCH_N": "2000", "BENCH_NQ": "64", "BENCH_REPS": "1",
          "BENCH_ROUNDS": "1"}),
        ("bench_pq.py",
         [sys.executable, os.path.join(REPO, "benchmarks", "bench_pq.py")],
         {"PQ_N": "3000", "PQ_NQ": "64", "PQ_REPS": "1",
          "PQ_GROUPS": "16"}),
        ("bench_sharded_packed.py",
         [sys.executable,
          os.path.join(REPO, "benchmarks", "bench_sharded_packed.py")],
         {"SHPK_N": "8192", "SHPK_NQ": "32", "SHPK_REPS": "1"}),
    ]
    for name, cmd, env in jobs:
        r = subprocess.run(cmd, env={**base, **env}, cwd=REPO,
                           capture_output=True, text=True, timeout=900)
        if r.returncode != 0:
            sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-4000:])
            raise AssertionError(
                f"bench harness smoke FAILED: {name} rc={r.returncode}")
        print(f"bench-harness smoke OK: {name}")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from pg_embedding_tpu import HnswConfig, HnswIndex

    rng = np.random.default_rng(7)
    n, d = 20_000, 64
    centers = rng.normal(scale=4.0, size=(200, d)).astype(np.float32)
    pts = (centers[rng.integers(0, 200, n)] +
           rng.normal(size=(n, d))).astype(np.float32)
    qs = (centers[rng.integers(0, 200, 128)] +
          rng.normal(size=(128, d))).astype(np.float32)

    cfg = HnswConfig(dims=d, m=16, ef_construction=64, ef_search=64)
    idx = HnswIndex(cfg)

    # dispatch-count guard: 20k rows / 256-row batches / (128,16) slab
    # grains => ceil(20000/4096) = 5 slab dispatches, and NOT 79 per-batch
    # dispatches (the round-1 dispatch wall ci must never readmit)
    from pg_embedding_tpu import api as _api
    dispatches = {"n": 0}
    real_slab = _api.insert_slab_donating
    real_slab8 = _api.HnswIndex._run_exact8_slab

    def counting_slab(*a, **kw):
        dispatches["n"] += 1
        return real_slab(*a, **kw)

    def counting_slab8(self, *a, **kw):
        dispatches["n"] += 1
        return real_slab8(self, *a, **kw)

    _api.insert_slab_donating = counting_slab
    _api.HnswIndex._run_exact8_slab = counting_slab8
    try:
        idx.build(pts, np.arange(n))
    finally:
        _api.insert_slab_donating = real_slab
        _api.HnswIndex._run_exact8_slab = real_slab8
    assert dispatches["n"] <= 6, (
        f"bulk add issued {dispatches['n']} dispatches for 20k rows — "
        f"slab batching regressed (expected <= 6)")

    # float64 oracle (chunked)
    oracle = np.zeros((len(qs), 10), np.int64)
    for i, q in enumerate(qs):
        dd = ((pts.astype(np.float64) - q.astype(np.float64)) ** 2).sum(-1)
        oracle[i] = np.argsort(dd)[:10]

    _, le, ve = idx.exact_search(qs, 10)
    exact_rec = np.mean([
        len(set(le[i][ve[i]].tolist()) & set(oracle[i].tolist())) / 10
        for i in range(len(qs))])
    assert exact_rec >= 0.999, f"exact engine vs f64 oracle: {exact_rec}"

    d_, l, v = idx.search(qs, 10, mode="graph")
    rec = np.mean([len(set(l[i][v[i]].tolist()) & set(oracle[i].tolist()))
                   / 10 for i in range(len(qs))])
    # round-2 floor: exact-sweep candidates carry ~1.0 at this config;
    # 0.97 leaves data noise while catching any construction regression
    assert rec >= 0.97, f"graph recall regression: {rec}"

    # exact8 candidate engine: same corpus, forced int8-coarse sweep
    idx8 = HnswIndex(cfg, build_candidates="exact8")
    idx8.build(pts, np.arange(n))
    _, l8, v8 = idx8.search(qs, 10, mode="graph")
    rec8 = np.mean([
        len(set(l8[i][v8[i]].tolist()) & set(oracle[i].tolist())) / 10
        for i in range(len(qs))])
    assert rec8 >= rec - 0.02, (
        f"exact8 candidate quality regressed: {rec8} vs exact {rec}")

    # compressed sweep engine (ADC over PQ codes + exact rerank): measured
    # 0.947 at the default pool (64) on this corpus; 0.92 floor leaves
    # codebook-training noise while catching engine regressions
    _, ls, vs = idx.search(qs, 10, mode="sweep_pq")
    rec_s = np.mean([
        len(set(ls[i][vs[i]].tolist()) & set(oracle[i].tolist())) / 10
        for i in range(len(qs))])
    assert rec_s >= 0.92, f"sweep_pq recall regression: {rec_s}"

    # tombstones + widening stay functional
    idx.delete(oracle[0])
    d2, l2, v2 = idx.search(qs[:1], 10, mode="graph")
    assert v2.all()
    assert not (set(l2[0].tolist()) & set(oracle[0].tolist()))

    print(f"ci-smoke OK: exact_recall={exact_rec:.4f} "
          f"graph_recall={rec:.4f} exact8_recall={rec8:.4f} "
          f"sweep_pq_recall={rec_s:.4f} bulk_dispatches={dispatches['n']}")

    smoke_bench_harnesses()


if __name__ == "__main__":
    main()
