#!/usr/bin/env python
"""CI bench smoke: a small end-to-end build+search on the CPU backend with
CORRECTNESS thresholds (recall floors), plus a relative-regression guard
between the engines.

Absolute QPS thresholds are meaningless on shared CI runners; real-hardware
throughput is recorded per round by the driver (BENCH_r{N}.json) and judged
against BASELINE.md. What CI can catch deterministically:
  * recall floors (graph >= 0.90 at efs=64 on clustered data; exact == 1.0)
  * the exact engines agreeing with each other and with a float64 oracle
  * widening/tombstone behavior staying functional
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
    idx.build(pts, np.arange(n))

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
    assert rec >= 0.90, f"graph recall regression: {rec}"

    # tombstones + widening stay functional
    idx.delete(oracle[0])
    d2, l2, v2 = idx.search(qs[:1], 10, mode="graph")
    assert v2.all()
    assert not (set(l2[0].tolist()) & set(oracle[0].tolist()))

    print(f"ci-smoke OK: exact_recall={exact_rec:.4f} "
          f"graph_recall={rec:.4f}")


if __name__ == "__main__":
    main()
