"""exact8 construction candidates (VERDICT r2 item 1a): the int8-coarse
MXU sweep + exact f32 rerank that extends full-corpus candidate quality
past the f32 sweep's 600k crossover.  CPU-mesh tests pin correctness and
the shadow lifecycle; the 10M quality/throughput numbers live in
benchmarks/bench_10m.py + BASELINE.md."""

import numpy as np
import pytest

from pg_embedding_tpu import HnswConfig, HnswIndex


@pytest.fixture(scope="module")
def corpus(rng):
    pts = rng.normal(size=(1200, 24)).astype(np.float32)
    qs = (pts[rng.integers(0, 1200, 8)] +
          rng.normal(scale=0.05, size=(8, 24))).astype(np.float32)
    return pts, qs


def _cfg(**kw):
    kw.setdefault("dims", 24)
    kw.setdefault("m", 8)
    kw.setdefault("ef_construction", 32)
    kw.setdefault("ef_search", 32)
    return HnswConfig(**kw)


def _recall(idx, qs, k=10):
    d, l, v = idx.search(qs, k, mode="graph")
    _, le, ve = idx.exact_search(qs, k)
    return np.mean([len(set(l[i][v[i]]) & set(le[i][ve[i]])) / k
                    for i in range(len(qs))])


def test_exact8_build_quality(corpus):
    pts, qs = corpus
    ex = HnswIndex(_cfg(), build_candidates="exact")
    ex.build(pts, np.arange(len(pts)))
    e8 = HnswIndex(_cfg(), build_candidates="exact8")
    e8.build(pts, np.arange(len(pts)))
    e8.check_integrity()
    r_exact = _recall(ex, qs)
    r_e8 = _recall(e8, qs)
    # int8 coarse + 2x pool + f32 rerank: candidate quality within noise
    # of the true f32 sweep
    assert r_e8 >= r_exact - 0.03
    assert r_e8 >= 0.9


def test_exact8_shadow_maintained_through_build(corpus):
    pts, qs = corpus
    idx = HnswIndex(_cfg(), build_candidates="exact8")
    idx.build(pts, np.arange(len(pts)))
    # the shadow survived add() (watermark == count) ...
    assert idx._qvec is not None
    assert idx._qvec_rows == idx.n_nodes
    # ... and equals a from-scratch quantization (incremental == full)
    qv_inc = np.asarray(idx._qvec)[: idx.n_nodes]
    sc_inc = np.asarray(idx._qscale)[: idx.n_nodes]
    idx._qvec = None
    qv_full, sc_full = idx._ensure_quantized()
    np.testing.assert_array_equal(qv_inc,
                                  np.asarray(qv_full)[: idx.n_nodes])
    np.testing.assert_allclose(sc_inc,
                               np.asarray(sc_full)[: idx.n_nodes],
                               rtol=1e-6)


def test_auto_mode_routes_exact8_between_thresholds(corpus, monkeypatch):
    pts, _ = corpus
    idx = HnswIndex(_cfg(), build_candidates="auto")
    idx.exact_build_threshold = 300
    idx.exact8_build_threshold = 800
    # one batch per slab so the mode is re-resolved every 256 rows (a
    # slab's mode is static; default grains would span both thresholds)
    idx.slab_batches = (1, 1)
    modes = []
    orig = HnswIndex._candidate_mode

    def spy(self, c):
        m = orig(self, c)
        modes.append(m[0])
        return m

    monkeypatch.setattr(HnswIndex, "_candidate_mode", spy)
    idx.build(pts, np.arange(len(pts)))
    assert "exact" in modes and "exact8" in modes and "beam" in modes
    idx.check_integrity()


def test_exact8_incremental_small_adds(corpus):
    """Small (non-slab) adds on an exact8 index go through the 1-batch
    slab path and keep the shadow watermark consistent."""
    pts, qs = corpus
    idx = HnswIndex(_cfg(), build_candidates="exact8")
    idx.build(pts[:1000], np.arange(1000))
    assert idx._qvec_rows == 1000
    idx.add(pts[1000:1100], np.arange(1000, 1100))
    assert idx.n_nodes == 1100
    assert idx._qvec_rows == 1100
    idx.check_integrity()
    assert _recall(idx, qs) >= 0.9


def test_exact8_after_capacity_growth(corpus):
    pts, qs = corpus
    idx = HnswIndex(_cfg(), build_candidates="exact8",
                    initial_capacity=256)
    idx.add(pts[:200], np.arange(200))
    idx.add(pts[200:600], np.arange(200, 600))   # forces growth
    assert idx.n_nodes == 600
    idx.check_integrity()
    assert _recall(idx, qs[:4]) >= 0.8
