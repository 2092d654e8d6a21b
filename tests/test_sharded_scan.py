"""Sharded-tier API parity: the amgettuple pull cursor (open_scan),
delete_where, tune_sweep_pool, and ef setters on ShardedHnswIndex —
the single-chip r3 capabilities carried to the multi-chip tier.
Reference: embedding.c:100-107, 284-366 (scan machine), 918-932
(bulkdelete callback form), 594-602 (ALTER INDEX ef rule)."""

import numpy as np
import pytest

from pg_embedding_tpu import HnswConfig, ShardedHnswIndex


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(17)
    centers = rng.normal(scale=4.0, size=(40, 16)).astype(np.float32)
    pts = (centers[rng.integers(0, 40, 800)] +
           rng.normal(size=(800, 16))).astype(np.float32)
    q = (centers[:1] + rng.normal(size=(1, 16))).astype(np.float32)
    idx = ShardedHnswIndex(
        HnswConfig(dims=16, m=8, ef_construction=32, ef_search=16))
    idx.build(pts, np.arange(800))
    return idx, q, pts


def test_scan_pagination_and_dedup(built):
    idx, q, _ = built
    scan = idx.open_scan(q)
    d1, l1 = scan.next(5)
    d2, l2 = scan.next(5)
    assert len(l1) == len(l2) == 5
    # each row exactly once across the scan's lifetime
    assert len(set(l1.tolist()) | set(l2.tolist())) == 10
    # first batch matches the one-shot search's top-5
    ds, ls, vs = idx.search(q, 5, mode="graph")
    assert set(l1.tolist()) == set(ls[0][vs[0]].tolist())
    np.testing.assert_allclose(np.sort(d1), d1)  # in-batch ascending


def test_scan_widens_past_ef(built):
    """LIMIT > efSearch: the cursor re-searches with doubled ef and keeps
    producing fresh rows (hnsw_gettuple's widening, embedding.c:329-366)."""
    idx, q, _ = built
    before = idx.counters["n_widenings"]
    scan = idx.open_scan(q, ef=16)
    # one fetch surfaces at most S*ef = 128 rows; asking for more forces
    # the ef-doubling re-search
    d, l = scan.next(300)
    assert len(l) == 300
    assert len(set(l.tolist())) == 300
    assert idx.counters["n_widenings"] > before


def test_scan_exhaustion(built):
    idx, q, _ = built
    scan = idx.open_scan(q)
    d, l = scan.next(2000)            # more than the index holds
    assert len(l) <= 800
    assert len(l) >= 700              # near-total coverage of live rows
    assert scan.exhausted
    d2, l2 = scan.next(5)
    assert len(l2) == 0


def test_scan_sees_concurrent_deletes(built):
    """Tombstones are re-read per FETCH: deletes of rows not yet buffered
    never surface (rows already in the cache are returned even if deleted
    afterwards — snapshot semantics, same as the single-chip cursor)."""
    idx, q, pts = built
    scan = idx.open_scan(q, ef=16)          # first fetch caches <= S*16
    d1, l1 = scan.next(3)
    # victims beyond anything the first fetch could have buffered
    _, ol, ov = idx.exact_search(q, 200)
    victims = ol[0][ov[0]][150:160]
    assert idx.delete(victims) == 10
    drained = []
    while True:
        d2, l2 = scan.next(50)
        drained.extend(l2.tolist())
        if len(l2) < 50:
            break
    assert not np.isin(np.asarray(drained[130:], np.uint64),
                       victims).any()


def test_scan_where_filter():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(200, 8)).astype(np.float32)
    idx = ShardedHnswIndex(HnswConfig(dims=8, m=6, ef_construction=24,
                                      ef_search=16))
    idx.build(pts, np.arange(200))
    allowed = np.arange(0, 200, 2, dtype=np.uint64)   # even labels only
    scan = idx.open_scan(pts[:1], where=allowed)
    d, l = scan.next(50)
    assert len(l) == 50
    assert (l % 2 == 0).all()


def test_delete_where_positions():
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(300, 8)).astype(np.float32)
    idx = ShardedHnswIndex(HnswConfig(dims=8, m=6, ef_construction=24,
                                      ef_search=24))
    idx.build(pts, np.arange(300))
    mask = np.zeros(300, bool)
    mask[:100] = True                  # first 100 INSERT positions
    assert idx.delete_where(mask) == 100
    assert idx.delete_where(mask) == 0  # idempotent
    assert idx.vacuum()["num_dead"] == 100
    d, l, v = idx.search(pts[:4], 10)
    assert not np.isin(l[v], np.arange(100, dtype=np.uint64)).any()


def test_sharded_tune_sweep_pool():
    rng = np.random.default_rng(5)
    centers = rng.normal(scale=4.0, size=(50, 32)).astype(np.float32)
    pts = (centers[rng.integers(0, 50, 2000)] +
           rng.normal(size=(2000, 32))).astype(np.float32)
    qs = (centers[rng.integers(0, 50, 16)] +
          rng.normal(size=(16, 32))).astype(np.float32)
    idx = ShardedHnswIndex(HnswConfig(dims=32, m=8, ef_construction=32,
                                      ef_search=32), pq_groups=4)
    idx.build(pts, np.arange(2000))
    res = idx.tune_sweep_pool(qs, target_recall=0.9, k=10)
    assert res.met and res.recall >= 0.9
    assert idx.pq_sweep_pool == res.ef


def test_ef_setters():
    idx = ShardedHnswIndex(HnswConfig(dims=8, m=4, ef_construction=8,
                                      ef_search=8))
    idx.set_ef_search(64)
    idx.set_ef_construction(32)
    assert idx.config.ef_search == 64
    assert idx.config.ef_construction == 32
