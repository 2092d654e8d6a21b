"""Round-3 regression tests: VERDICT r2 items 4, 7, 9, 10.

Covers: the packed-aware auto-router threshold, the removed dead
visited-mode knob (auto == dense, pinned), search_ids ef bucketing (no
compile per raw ef value), the honest tuner (TuneResult + strict), and
the amgettuple-style pull cursor (open_scan / HnswScan) with TID dedup,
progressive widening, and tombstone starvation.
"""

import numpy as np
import pytest

from pg_embedding_tpu import (HnswConfig, HnswIndex, TuneResult,
                              TuneTargetMissed)


@pytest.fixture(scope="module")
def built(rng):
    pts = rng.normal(size=(400, 16)).astype(np.float32)
    qs = rng.normal(size=(4, 16)).astype(np.float32)
    cfg = HnswConfig(dims=16, m=8, ef_construction=32, ef_search=16)
    idx = HnswIndex(cfg)
    idx.build(pts, np.arange(400))
    return idx, pts, qs


# ---------------------------------------------------------------------- #
# item 7: dead knob removed; auto == dense
# ---------------------------------------------------------------------- #

def test_hash_visited_knob_removed(built):
    idx, _, _ = built
    assert not hasattr(idx, "hash_visited_min_cap")


def test_visited_auto_is_dense(built):
    idx, _, _ = built
    idx.visited_mode = "auto"
    assert idx._visited_slots(64) == -1      # dense sentinel
    idx.visited_mode = "dense"
    assert idx._visited_slots(64) == -1
    idx.visited_mode = "bitmap"
    assert idx._visited_slots(64) == 0
    idx.visited_mode = "hash"
    assert idx._visited_slots(64) > 0
    idx.visited_mode = "dense"


# ---------------------------------------------------------------------- #
# item 4: packed-aware router
# ---------------------------------------------------------------------- #

def test_router_uses_packed_threshold():
    cfg = HnswConfig(dims=16, m=8)
    idx = HnswIndex(cfg)
    idx._count = 3_000_000          # between the two thresholds
    assert idx._use_exact(64)       # plain: 3M <= 5.5M -> exact
    idx.packed_traversal = True
    assert not idx._use_exact(64)   # packed: 3M > 2.2M -> graph
    idx._count = 1_000_000
    assert idx._use_exact(64)       # packed but below 2.2M -> exact
    assert not idx._use_exact(4)    # tiny batches always walk the graph


# ---------------------------------------------------------------------- #
# item 9: search_ids bucketing + honest tuner
# ---------------------------------------------------------------------- #

def test_search_ids_buckets_ef(built, monkeypatch):
    idx, pts, qs = built
    used = []
    orig = HnswIndex._graph_search

    def spy(self, qdev, ef):
        used.append(ef)
        return orig(self, qdev, ef)

    monkeypatch.setattr(HnswIndex, "_graph_search", spy)
    for ef in (17, 19, 23, 29, 31):
        d, i = idx.search_ids(qs, ef)
        assert d.shape == (len(qs), ef)
        assert i.shape == (len(qs), ef)
    # every odd ef must have collapsed into ONE bucketed width (32)
    assert set(used) == {32}


def test_search_ids_prefix_consistent(built):
    idx, pts, qs = built
    d17, i17 = idx.search_ids(qs, 17)
    d32, i32 = idx.search_ids(qs, 32)
    np.testing.assert_array_equal(i17, i32[:, :17])


def test_tune_returns_result(built):
    idx, pts, qs = built
    res = idx.tune_ef_search(qs, target_recall=0.9, k=5)
    assert isinstance(res, TuneResult)
    assert res.met and res.recall >= 0.9
    assert idx.config.ef_search == res.ef


def test_tune_strict_raises_on_miss(built):
    idx, pts, qs = built
    with pytest.raises(TuneTargetMissed):
        # recall can never exceed 1.0 -> guaranteed miss
        idx.tune_ef_search(qs, target_recall=1.01, k=5, strict=True)
    res = idx.tune_ef_search(qs, target_recall=1.01, k=5)
    assert not res.met and res.recall <= 1.0


# ---------------------------------------------------------------------- #
# item 10: pull-model scan cursor
# ---------------------------------------------------------------------- #

def test_scan_matches_search_order(built):
    idx, pts, qs = built
    scan = idx.open_scan(qs[:1])
    d, l = scan.next(10)
    ds, ls, vs = idx.search(qs[:1], 10, mode="graph")
    np.testing.assert_array_equal(l, ls[0][vs[0]])
    np.testing.assert_allclose(d, ds[0][vs[0]], rtol=1e-6)


def test_scan_no_duplicates_and_widens(built):
    idx, pts, qs = built
    # ef starts at 16; pulling 200 rows forces several widenings
    scan = idx.open_scan(qs[:1], ef=16)
    w0 = idx.counters["n_widenings"]
    seen = []
    while True:
        d, l = scan.next(25)
        seen.extend(l.tolist())
        if len(l) < 25:
            break
    assert idx.counters["n_widenings"] > w0
    assert len(seen) == len(set(seen))          # TID dedup
    # full drain reaches (essentially) everything: a node can be orphaned
    # by back-link re-pruning — unreachable for the reference's
    # searchBaseLayer too, which likewise only explores node 0's component
    assert len(seen) >= idx.n_nodes - 4
    assert scan.exhausted


def test_scan_one_at_a_time(built):
    idx, pts, qs = built
    scan = idx.open_scan(qs[:1])
    rows = [scan.next(1) for _ in range(20)]
    labels = [int(l[0]) for _, l in rows]
    assert len(set(labels)) == 20
    # first pulls come back ascending (within one cached search)
    d10 = [float(d[0]) for d, _ in rows[:10]]
    assert d10 == sorted(d10)


def test_scan_tombstone_starvation(rng):
    pts = rng.normal(size=(120, 8)).astype(np.float32)
    q = rng.normal(size=(1, 8)).astype(np.float32)
    idx = HnswIndex(HnswConfig(dims=8, m=6, ef_construction=24, ef_search=8))
    idx.build(pts, np.arange(120))
    # tombstone the 100 nearest: the first fetch surfaces almost nothing
    _, ol, _ = idx.exact_search(q, 100)
    idx.delete(ol[0])
    scan = idx.open_scan(q, ef=8)
    d, l = scan.next(20)
    assert len(l) == 20                          # widening compensated
    assert not np.isin(l, ol[0]).any()           # no tombstones surface
    # drain: exactly the 20 live rows exist
    rest_d, rest_l = scan.next(1000)
    assert len(rest_l) == 0 or not np.isin(rest_l, ol[0]).any()
    assert len(l) + len(rest_l) == 20
    assert scan.exhausted


def test_scan_empty_index():
    idx = HnswIndex(HnswConfig(dims=8, m=4))
    scan = idx.open_scan(np.zeros((1, 8), np.float32))
    d, l = scan.next(5)
    assert len(d) == 0 and scan.exhausted


# ---------------------------------------------------------------------- #
# item 5: packed_dtype — full-precision packed traversal
# ---------------------------------------------------------------------- #

def test_packed_f32_bit_identical_to_plain(built):
    """packed_dtype="float32" collapses the gather-transaction count while
    computing the exact reference distances — results must be
    BIT-identical to the plain f32 walk."""
    idx, pts, qs = built
    idx.packed_traversal = False
    plain_d, plain_i = idx.search_ids(qs, 32)
    idx.packed_traversal = True
    idx.packed_dtype = "float32"
    idx._pcodes = idx._pscales = None
    try:
        pd, pi = idx.search_ids(qs, 32)
    finally:
        idx.packed_traversal = False
        idx.packed_dtype = "int8"
        idx._pcodes = idx._pscales = None
    np.testing.assert_array_equal(plain_i, pi)
    np.testing.assert_array_equal(plain_d, pd)


def test_packed_bf16_recall(built):
    idx, pts, qs = built
    idx.packed_traversal = True
    idx.packed_dtype = "bfloat16"
    idx._pcodes = idx._pscales = None
    try:
        d, l, v = idx.search(qs, 10, mode="graph")
    finally:
        idx.packed_traversal = False
        idx.packed_dtype = "int8"
        idx._pcodes = idx._pscales = None
    _, le, ve = idx.exact_search(qs, 10)
    rec = np.mean([len(set(l[i][v[i]]) & set(le[i][ve[i]])) / 10
                   for i in range(len(qs))])
    assert rec >= 0.9


def test_packed_dtype_validation():
    with pytest.raises(ValueError, match="packed_dtype"):
        HnswIndex(HnswConfig(dims=8, m=4), packed_dtype="int4")


def test_scan_filtered(built):
    idx, pts, qs = built
    allowed = np.arange(0, 400, 2).astype(np.uint64)   # even labels only
    scan = idx.open_scan(qs[:1], where=allowed)
    d, l = scan.next(30)
    assert len(l) == 30
    assert (l % 2 == 0).all()


def test_scan_sees_concurrent_deletes_and_survives_growth(rng):
    """The cursor re-reads tombstones per fetch (concurrent deletes are
    honored) and stays well-defined when the graph grows mid-scan (rows
    inserted after open stay invisible under a where-filter snapshot)."""
    pts = rng.normal(size=(150, 8)).astype(np.float32)
    q = rng.normal(size=(1, 8)).astype(np.float32)
    idx = HnswIndex(HnswConfig(dims=8, m=6, ef_construction=24, ef_search=8),
                    initial_capacity=160)
    idx.build(pts, np.arange(150))
    scan = idx.open_scan(q, where=np.arange(150).astype(np.uint64))
    d1, l1 = scan.next(5)
    # delete labels the scan has neither returned NOR buffered (the first
    # fetch caches up to ef=8 rows; rows already in the cache are returned
    # even if deleted afterwards — snapshot semantics, as in Postgres)
    _, ol, _ = idx.exact_search(q, 30)
    victims = ol[0][10:20]
    idx.delete(victims)
    # grow the graph mid-scan (forces capacity growth past 160)
    idx.add(rng.normal(size=(300, 8)).astype(np.float32),
            np.arange(1000, 1300))
    rest = []
    while True:
        d, l = scan.next(40)
        rest.extend(l.tolist())
        if len(l) < 40:
            break
    assert not np.isin(np.asarray(rest, np.uint64), victims).any()
    assert all(r < 150 for r in rest)        # post-open inserts filtered
