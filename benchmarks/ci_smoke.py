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
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


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


if __name__ == "__main__":
    main()
