"""End-to-end API tests: the amgettuple/aminsert/ambulkdelete lifecycle."""

import numpy as np
import pytest

from pg_embedding_tpu import HnswConfig, HnswIndex, Metric


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(21)
    pts = rng.normal(size=(600, 24)).astype(np.float32)
    qs = rng.normal(size=(5, 24)).astype(np.float32)
    return pts, qs


@pytest.fixture(scope="module")
def built(corpus):
    pts, _ = corpus
    idx = HnswIndex(HnswConfig(dims=24, m=8, ef_construction=48,
                               ef_search=48))
    idx.build(pts, np.arange(len(pts)))
    return idx


def test_recall_vs_oracle(built, corpus):
    pts, qs = corpus
    d, l, v = built.search(qs, 10)
    de, le, ve = built.exact_search(qs, 10)
    rec = np.mean([len(set(l[i][v[i]]) & set(le[i][ve[i]])) / 10
                   for i in range(len(qs))])
    assert rec >= 0.95, rec
    # distances ascending
    for row in d:
        assert (np.diff(row[np.isfinite(row)]) >= -1e-6).all()


def test_progressive_widening_limit_gt_efsearch(corpus):
    """LIMIT > efSearch forces the ef-doubling re-search loop
    (embedding.c:329-366) — untested in the reference (SURVEY.md §4)."""
    pts, qs = corpus
    idx = HnswIndex(HnswConfig(dims=24, m=8, ef_construction=48,
                               ef_search=8))
    idx.build(pts, np.arange(len(pts)))
    k = 32  # > ef_search=8
    d, l, v = idx.search(qs, k)
    assert v.sum(axis=1).min() == k
    assert idx.counters["n_widenings"] > 0
    # results still accurate after widening
    de, le, ve = idx.exact_search(qs, k)
    rec = np.mean([len(set(l[i][v[i]]) & set(le[i][ve[i]])) / k
                   for i in range(len(qs))])
    assert rec >= 0.9, rec


def test_widening_from_tombstones(corpus):
    """Tombstones shrink effective k; the widening loop must compensate
    (SURVEY.md §3.4)."""
    pts, qs = corpus
    idx = HnswIndex(HnswConfig(dims=24, m=8, ef_construction=48,
                               ef_search=16))
    idx.build(pts, np.arange(len(pts)))
    # delete the true top-12 of query 0
    _, le, _ = idx.exact_search(qs[:1], 12)
    idx.delete(le[0])
    d, l, v = idx.search(qs[:1], 10)
    assert v[0].sum() == 10
    assert not (set(l[0].tolist()) & set(le[0].tolist()))
    # and they match the exact post-delete answer reasonably
    _, le2, _ = idx.exact_search(qs[:1], 10)
    assert len(set(l[0]) & set(le2[0])) >= 8


def test_delete_semantics(built):
    idx = built
    before = idx.vacuum()
    n = idx.delete(np.array([0, 1, 2], np.uint64))
    assert n == 3
    assert idx.delete(np.array([0], np.uint64)) == 0  # already dead
    after = idx.vacuum()
    assert after["num_dead"] == before["num_dead"] + 3
    assert after["num_nodes"] == before["num_nodes"]  # space not reclaimed


def test_incremental_add_and_capacity_growth():
    rng = np.random.default_rng(33)
    idx = HnswIndex(HnswConfig(dims=8, m=4, ef_construction=16,
                               ef_search=16), initial_capacity=32)
    for i in range(4):
        idx.add(rng.normal(size=(40, 8)).astype(np.float32),
                np.arange(i * 40, (i + 1) * 40, dtype=np.uint64))
    assert len(idx) == 160
    assert idx.graph.capacity >= 160
    q = rng.normal(size=(2, 8)).astype(np.float32)
    d, l, v = idx.search(q, 5)
    de, le, ve = idx.exact_search(q, 5)
    assert len(set(l[0][v[0]]) & set(le[0][ve[0]])) >= 4


def test_save_load_roundtrip(tmp_path, built, corpus):
    pts, qs = corpus
    p = str(tmp_path / "idx.npz")
    built.save(p)
    loaded = HnswIndex.load(p)
    d1, l1, v1 = built.search(qs, 10)
    d2, l2, v2 = loaded.search(qs, 10)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)
    # ef knobs may change on load; frozen fields may not
    reloaded = HnswIndex.load(p, config=built.config.with_ef(ef_search=128))
    assert reloaded.config.ef_search == 128
    with pytest.raises(ValueError):
        HnswIndex.load(p, config=HnswConfig(dims=24, m=99))
    with pytest.raises(ValueError):
        HnswIndex.load(p, config=HnswConfig(dims=25, m=8))
    with pytest.raises(ValueError):
        HnswIndex.load(p, config=HnswConfig(dims=24, m=8,
                                            metric=Metric.COSINE))


def test_load_then_add(tmp_path, corpus):
    pts, qs = corpus
    idx = HnswIndex(HnswConfig(dims=24, m=8, ef_construction=32,
                               ef_search=32))
    idx.build(pts[:300], np.arange(300))
    p = str(tmp_path / "idx2.npz")
    idx.save(p)
    loaded = HnswIndex.load(p)
    loaded.add(pts[300:], np.arange(300, len(pts)))
    assert len(loaded) == len(pts)
    d, l, v = loaded.search(qs, 10)
    de, le, ve = loaded.exact_search(qs, 10)
    rec = np.mean([len(set(l[i][v[i]]) & set(le[i][ve[i]])) / 10
                   for i in range(len(qs))])
    assert rec >= 0.9, rec


def test_set_ef_search(built):
    old = built.config.ef_search
    built.set_ef_search(old * 2)
    assert built.config.ef_search == old * 2
    built.set_ef_search(old)


def test_counters(built, corpus):
    _, qs = corpus
    c0 = dict(built.counters)
    built.search(qs, 5)
    assert built.counters["n_searches"] == c0["n_searches"] + len(qs)
    assert built.counters["n_hops"] > c0["n_hops"]
    assert built.counters["n_dist_evals"] > c0["n_dist_evals"]


def test_duplicate_vectors():
    """Duplicate points must not break construction or search."""
    pts = np.ones((20, 6), np.float32)
    idx = HnswIndex(HnswConfig(dims=6, m=4, ef_construction=16,
                               ef_search=16))
    idx.build(pts, np.arange(20))
    d, l, v = idx.search(np.ones((1, 6), np.float32), 5)
    assert v[0].sum() == 5
    assert np.allclose(d[0][v[0]], 0.0, atol=1e-5)


def test_search_mode_routing(corpus):
    """auto mode routes large batches on small corpora to the exact sweep
    (recall 1.0); graph/exact forcing works; tiny batches stay on the
    graph."""
    pts, _ = corpus
    idx = HnswIndex(HnswConfig(dims=24, m=8, ef_construction=48,
                               ef_search=16))
    idx.build(pts, np.arange(len(pts)))
    qs = np.random.default_rng(0).normal(size=(64, 24)).astype(np.float32)

    d_a, l_a, v_a = idx.search(qs, 10, mode="auto")
    assert idx.counters.get("n_exact_routed", 0) == 64  # batch>=32, small n
    d_e, l_e, v_e = idx.search(qs, 10, mode="exact")
    np.testing.assert_array_equal(l_a, l_e)
    d_g, l_g, v_g = idx.search(qs, 10, mode="graph")
    # graph results are ANN — compare overlap, not equality
    rec = np.mean([len(set(l_g[i][v_g[i]]) & set(l_e[i][v_e[i]])) / 10
                   for i in range(64)])
    assert rec >= 0.8
    # tiny batch stays on the graph path (no new exact routing)
    routed = idx.counters.get("n_exact_routed", 0)
    idx.search(qs[:4], 5, mode="auto")
    assert idx.counters.get("n_exact_routed", 0) == routed
    with pytest.raises(ValueError):
        idx.search(qs, 5, mode="nope")


def test_tune_ef_search(corpus):
    pts, qs = corpus
    idx = HnswIndex(HnswConfig(dims=24, m=8, ef_construction=48,
                               ef_search=8))
    idx.build(pts, np.arange(len(pts)))
    res = idx.tune_ef_search(qs, target_recall=0.95, k=10)
    assert idx.config.ef_search == res.ef
    assert res.ef >= 10
    assert res.met and res.recall >= 0.95
    # the tuned ef actually delivers the target
    d, l, v = idx.search(qs, 10, mode="graph")
    de, le, ve = idx.exact_search(qs, 10)
    rec = np.mean([len(set(l[i][v[i]]) & set(le[i][ve[i]])) / 10
                   for i in range(len(qs))])
    assert rec >= 0.9
