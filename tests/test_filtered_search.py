"""Filtered search (predicate pushdown) — beyond the reference; filtered
rows behave exactly like tombstones (routable, never surfaced)."""

import numpy as np
import pytest

from pg_embedding_tpu import HnswConfig, HnswIndex


@pytest.fixture(scope="module")
def built(rng):
    pts = rng.normal(size=(500, 16)).astype(np.float32)
    idx = HnswIndex(HnswConfig(dims=16, m=8, ef_construction=48,
                               ef_search=32))
    # labels: even = category A, odd = category B
    idx.build(pts, np.arange(500))
    return idx, pts


def test_filter_by_labels(built, rng):
    idx, pts = built
    qs = rng.normal(size=(8, 16)).astype(np.float32)
    evens = np.arange(0, 500, 2, dtype=np.uint64)
    for mode in ("graph", "exact"):
        d, l, v = idx.search(qs, 10, mode=mode, where=evens)
        assert v.all()
        assert (l[v] % 2 == 0).all()
    # results match an exact search restricted to evens
    d_e, l_e, v_e = idx.search(qs, 10, mode="exact", where=evens)
    d_g, l_g, v_g = idx.search(qs, 10, mode="graph", where=evens)
    rec = np.mean([len(set(l_g[i][v_g[i]]) & set(l_e[i][v_e[i]])) / 10
                   for i in range(8)])
    assert rec >= 0.85, rec


def test_filter_by_mask(built, rng):
    idx, pts = built
    qs = rng.normal(size=(4, 16)).astype(np.float32)
    mask = np.zeros(500, bool)
    mask[100:200] = True
    d, l, v = idx.search(qs, 5, mode="graph", where=mask)
    assert v.all()
    assert ((l[v] >= 100) & (l[v] < 200)).all()


def test_filter_widening_compensates(built, rng):
    """A narrow filter starves the initial beam; the ef-doubling loop must
    still produce k results."""
    idx, pts = built
    qs = rng.normal(size=(2, 16)).astype(np.float32)
    narrow = np.arange(0, 500, 25, dtype=np.uint64)  # 20 allowed rows
    d, l, v = idx.search(qs, 10, mode="graph", where=narrow)
    assert v.sum(axis=1).min() == 10
    assert set(l[v].tolist()) <= set(narrow.tolist())


def test_filter_plus_tombstones(built, rng):
    idx, pts = built
    qs = rng.normal(size=(2, 16)).astype(np.float32)
    idx2 = HnswIndex(HnswConfig(dims=16, m=8, ef_construction=48,
                                ef_search=32))
    idx2.build(pts, np.arange(500))
    idx2.delete(np.arange(0, 100, dtype=np.uint64))
    allowed = np.arange(0, 300, dtype=np.uint64)
    d, l, v = idx2.search(qs, 10, where=allowed, mode="graph")
    got = l[v]
    assert (got >= 100).all() and (got < 300).all()


def test_filter_mask_too_short(built):
    idx, _ = built
    with pytest.raises(ValueError):
        idx.search(np.zeros((1, 16), np.float32), 3,
                   where=np.zeros(10, bool))


def test_filter_empty_allowed(built, rng):
    idx, _ = built
    qs = rng.normal(size=(1, 16)).astype(np.float32)
    d, l, v = idx.search(qs, 5, where=np.zeros(500, bool))
    assert not v.any()


def test_sharded_filtered_search(rng):
    from pg_embedding_tpu import ShardedHnswIndex

    pts = rng.normal(size=(400, 16)).astype(np.float32)
    qs = rng.normal(size=(8, 16)).astype(np.float32)
    cfg = HnswConfig(dims=16, m=8, ef_construction=32, ef_search=32)
    sidx = ShardedHnswIndex(cfg)
    sidx.build(pts, np.arange(400))
    evens = np.arange(0, 400, 2, dtype=np.uint64)
    for mode in ("graph", "exact"):
        d, l, v = sidx.search(qs, 10, mode=mode, where=evens)
        assert v.all()
        assert (l[v] % 2 == 0).all()
    # agreement between the two filtered engines
    _, le, ve = sidx.search(qs, 10, mode="exact", where=evens)
    _, lg, vg = sidx.search(qs, 10, mode="graph", where=evens)
    rec = np.mean([len(set(lg[i][vg[i]]) & set(le[i][ve[i]])) / 10
                   for i in range(8)])
    assert rec >= 0.85, rec


def test_selective_filter_routes_to_exact(built, rng):
    """Round-4 router rule: a filter allowing under
    filter_exact_selectivity of rows sends auto mode to the masked exact
    sweep (selectivity-independent cost) instead of the degenerate
    widening walk — the amcostestimate-analog decision."""
    idx, pts = built
    qs = rng.normal(size=(64, 16)).astype(np.float32)
    # 2% selectivity — far under the threshold
    allowed = np.arange(0, 500, 50, dtype=np.uint64)
    before = idx.counters.get("n_exact_routed", 0)
    d, l, v = idx.search(qs, 5, mode="auto", where=allowed)
    assert idx.counters.get("n_exact_routed", 0) == before + 64
    assert set(l[v].tolist()) <= set(allowed.tolist())
    # exact route == recall 1.0 vs the filtered oracle
    d_e, l_e, v_e = idx.search(qs, 5, mode="exact", where=allowed)
    np.testing.assert_array_equal(l[v], l_e[v_e])


def test_wide_filter_stays_on_graph(built, rng):
    """A permissive filter (80% allowed) must NOT trigger the selective
    route on its own (batch < 32 keeps _use_exact off)."""
    idx, pts = built
    qs = rng.normal(size=(4, 16)).astype(np.float32)
    mask = np.ones(500, bool)
    mask[::5] = False
    before = idx.counters.get("n_exact_routed", 0)
    idx.search(qs, 5, mode="auto", where=mask)
    assert idx.counters.get("n_exact_routed", 0) == before


def test_sharded_selective_filter_routes_to_exact(rng):
    from pg_embedding_tpu import ShardedHnswIndex

    pts = rng.normal(size=(600, 16)).astype(np.float32)
    idx = ShardedHnswIndex(HnswConfig(dims=16, m=8, ef_construction=48,
                                      ef_search=32), max_insert_batch=64)
    idx.add(pts, np.arange(600))
    qs = rng.normal(size=(64, 16)).astype(np.float32)
    allowed = np.arange(0, 600, 40, dtype=np.uint64)
    before = idx.counters.get("n_exact_routed", 0)
    d, l, v = idx.search(qs, 5, mode="auto", where=allowed)
    assert idx.counters.get("n_exact_routed", 0) == before + 64
    assert set(l[v].tolist()) <= set(allowed.tolist())


def test_widening_cap_bounds_forced_graph_search(rng):
    """max_widen_ef bounds the widening loop (r5: unbounded ef-doubling
    under a 1%-selectivity forced-graph filter at 1M compiled ever-larger
    beam programs until the TPU worker crashed; auto mode routes such
    filters to the masked exact sweep and never widens like this)."""
    from pg_embedding_tpu import HnswConfig, HnswIndex

    pts = rng.normal(size=(2_000, 16)).astype(np.float32)
    qs = rng.normal(size=(4, 16)).astype(np.float32)
    idx = HnswIndex(HnswConfig(dims=16, m=6, ef_construction=24,
                               ef_search=16))
    idx.build(pts)
    idx.max_widen_ef = 64
    # allow only 3 rows: k=10 can never be satisfied, so the loop would
    # widen to n_nodes without the cap
    mask = np.zeros(2_000, bool)
    mask[:3] = True
    w0 = idx.counters["n_widenings"]
    d, l, v = idx.search(qs, 10, mode="graph", where=mask)
    # terminated at the cap: ef path 16 -> 32 -> 64 (2 widenings/query run)
    assert idx.counters["n_widenings"] - w0 <= 3
    assert v.sum(axis=1).max() <= 3          # partial valid mask, no hang
    # surfaced rows respect the filter
    allowed = set(np.nonzero(mask)[0].tolist())
    for r in range(len(qs)):
        got = set(l[r][v[r]].astype(np.int64).tolist())
        assert got <= allowed
    # auto mode routes the same filter to the exact sweep: full recall
    d2, l2, v2 = idx.search(qs, 3, mode="auto", where=mask)
    assert v2.all()
