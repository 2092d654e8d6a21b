"""Golden-ordering tests ported from the reference regression suite.

Each test mirrors a statement block from test/sql/knn.sql, gh-2.sql or
gh-3.sql, with the SQL surface mapped to the Python API:

  CREATE INDEX ... WITH (dims=3, m=3)   -> HnswConfig(dims=3, m=3)
  INSERT                                 -> add()
  ORDER BY val <-> q (index scan)        -> search()
  ORDER BY val <-> q (seqscan)           -> exact_search()
  DELETE + VACUUM                        -> delete() + vacuum()
  TRUNCATE                               -> fresh index (new relfilenode)

The reference's NULL row (knn.sql:4) is skipped before the insert path
(embedding.c:171-173), so it simply doesn't appear here.
"""

import numpy as np
import pytest

from pg_embedding_tpu import HnswConfig, HnswIndex, Metric

# knn.sql data: ('{0,1,2}'), ('{1,2,3}'), ('{1,1,1}'), NULL skipped,
# then INSERT array[1,2,4]
VECS = np.array([[0, 1, 2], [1, 2, 3], [1, 1, 1]], np.float32)
LATE = np.array([[1, 2, 4]], np.float32)
Q = np.array([[3, 3, 3]], np.float32)
LABELS = np.array([1, 2, 3], np.uint64)
LATE_LABEL = np.array([4], np.uint64)


def _build(metric):
    idx = HnswIndex(HnswConfig(dims=3, m=3, metric=metric))
    idx.build(VECS, LABELS)          # CREATE INDEX over existing rows
    idx.add(LATE, LATE_LABEL)        # post-build incremental insert
    return idx


@pytest.mark.parametrize("metric", list(Metric))
def test_index_scan_matches_seqscan(metric):
    """knn.sql:23-26 (index) vs :41-44 (seqscan): same ordering."""
    idx = _build(metric)
    d_ann, l_ann, v_ann = idx.search(Q, 4)
    d_ex, l_ex, v_ex = idx.exact_search(Q, 4)
    assert v_ann.all() and v_ex.all()
    np.testing.assert_allclose(d_ann, d_ex, rtol=1e-5, atol=1e-6)
    # at distance ties any order is legal (Sort is unstable); compare label
    # sets per distinct distance
    for da, la, de, le in zip(d_ann[0], l_ann[0], d_ex[0], l_ex[0]):
        assert da == pytest.approx(de, rel=1e-5, abs=1e-6)
    assert set(l_ann[0]) == set(l_ex[0])


def test_l2_expected_order():
    """Pinned expected ordering for <-> [3,3,3] (knn.out golden file):
    {1,2,3} < {1,2,4} < {1,1,1} < {0,1,2}."""
    idx = _build(Metric.L2)
    _, labels, valid = idx.search(Q, 4)
    assert valid.all()
    assert labels[0].tolist() == [2, 4, 3, 1]


def test_count_excludes_nothing():
    """SELECT COUNT(*) = 4 live rows after the late insert (knn.sql:12)."""
    idx = _build(Metric.L2)
    assert len(idx) == 4


@pytest.mark.parametrize("metric", list(Metric))
def test_delete_vacuum_reinsert(metric):
    """knn.sql:46-53: delete everything, vacuum, re-insert, search again."""
    idx = _build(metric)
    n = idx.delete([1, 2, 3, 4])
    assert n == 4
    stats = idx.vacuum()
    assert stats["num_dead"] == 4 and stats["num_live"] == 0

    # tombstoned rows must not surface (hnswalg.cpp:245)
    _, labels, valid = idx.search(Q, 4)
    assert not valid.any()

    # re-insert; tombstones stay as waypoints but fresh rows are found
    idx.add(np.vstack([VECS, LATE]), np.array([11, 12, 13, 14], np.uint64))
    d, labels, valid = idx.search(Q, 4)
    assert valid.all()
    assert set(labels[0]) == {11, 12, 13, 14}
    d_ex, l_ex, v_ex = idx.exact_search(Q, 4)
    np.testing.assert_allclose(d, d_ex, rtol=1e-5, atol=1e-6)


def test_empty_index_gh2():
    """gh-2: searching a valid but empty index returns 0 rows, no crash
    (hnswalg.cpp:56-57; embedding.c:737-742)."""
    idx = HnswIndex(HnswConfig(dims=3, m=3))
    d, labels, valid = idx.search(np.array([[3, 3, 3]], np.float32), 5)
    assert not valid.any()
    assert np.isinf(d).all()


def test_truncate_rebuild_gh3():
    """gh-3: TRUNCATE = new relfilenode = fresh index; re-inserted rows map
    to fresh labels."""
    cfg = HnswConfig(dims=3, m=3)
    idx = HnswIndex(cfg)
    idx.build(np.array([[0, 1, 2], [1, 2, 3], [1, 1, 1]], np.float32),
              np.array([1, 2, 3], np.uint64))
    # TRUNCATE: the index is rebuilt from scratch on the new storage
    idx = HnswIndex(cfg)
    idx.build(np.array([[4, 5, 6], [1, 2, 3], [7, 8, 9]], np.float32),
              np.array([1, 2, 3], np.uint64))
    _, labels, valid = idx.search(np.array([[3, 3, 3]], np.float32), 3)
    assert valid.all()
    # expected/gh-3.out:9-13 ordering: (1,2,3) then (4,5,6) then (7,8,9)
    assert labels[0].tolist() == [2, 1, 3]


def test_dims_mismatch_on_insert_and_search():
    """'Wrong number of dimensions' (embedding.c:179, 314, 581)."""
    idx = HnswIndex(HnswConfig(dims=3, m=3))
    with pytest.raises(ValueError):
        idx.add(np.zeros((1, 4), np.float32))
    idx.add(np.zeros((1, 3), np.float32))
    with pytest.raises(ValueError):
        idx.search(np.zeros((1, 5), np.float32), 1)
