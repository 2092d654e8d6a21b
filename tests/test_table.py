"""VectorTable: end-to-end replay of the reference regression scripts
through the SQL-surface analog (test/sql/knn.sql, gh-2.sql, gh-3.sql)."""

import numpy as np
import pytest

from pg_embedding_tpu.table import VectorTable


def test_knn_sql_replay():
    """test/sql/knn.sql line by line."""
    t = VectorTable(dims=3)
    # INSERT ... VALUES ('{0,1,2}'), ('{1,2,3}'), ('{1,1,1}'), (NULL)
    ids = t.insert([[0, 1, 2], [1, 2, 3], [1, 1, 1], None])
    # CREATE INDEX USING hnsw (val) WITH (dims=3, m=3)
    t.create_index("<->", m=3)
    # INSERT INTO t VALUES (array[1,2,4]) — post-build incremental
    t.insert([[1, 2, 4]])

    q = [3, 3, 3]
    # index scan ordering: {1,2,3} < {1,2,4} < {1,1,1} < {0,1,2}
    res = t.order_by(q, "<->", limit=4)
    assert [r for r, _ in res] == [1, 4, 2, 0]
    assert t.count() == 5  # includes the NULL row

    # cosine + manhattan indexes on the same column
    t.create_index("<=>", m=3)
    t.create_index("<~>", m=3)
    res_cos = t.order_by(q, "<=>", limit=4)
    res_man = t.order_by(q, "<~>", limit=4)
    # cross-validate every metric against the seqscan (knn.sql:41-44)
    for op, res_idx in [("<->", res), ("<=>", res_cos), ("<~>", res_man)]:
        res_seq = t.order_by(q, op, limit=4, use_index=False)
        assert [d for _, d in res_idx] == pytest.approx(
            [d for _, d in res_seq], rel=1e-5, abs=1e-6)
        assert {r for r, _ in res_idx} == {r for r, _ in res_seq}

    # delete from t; vacuum t; re-insert; search again (knn.sql:46-53)
    t.delete(ids + [4])
    assert t.count() == 0
    assert t.order_by(q, "<->", limit=4) == []
    new_ids = t.insert([[0, 1, 2], [1, 2, 3], [1, 1, 1], None, [1, 2, 4]])
    res2 = t.order_by(q, "<->", limit=4)
    assert [r for r, _ in res2] == [new_ids[1], new_ids[4], new_ids[2],
                                    new_ids[0]]


def test_gh2_empty_index():
    """gh-2: search on a valid but empty index returns 0 rows."""
    t = VectorTable(dims=3)
    t.create_index("<->", m=3)
    assert t.order_by([3, 3, 3], "<->", limit=5) == []


def test_gh3_truncate():
    """gh-3: TRUNCATE then re-insert uses fresh index storage."""
    t = VectorTable(dims=3)
    t.create_index("<->", m=3)
    t.insert([[0, 1, 2], [1, 2, 3], [1, 1, 1]])
    t.truncate()
    assert t.count() == 0
    ids = t.insert([[4, 5, 6], [1, 2, 3], [7, 8, 9]])
    res = t.order_by([3, 3, 3], "<->", limit=3)
    # expected/gh-3.out ordering: (1,2,3), (4,5,6), (7,8,9)
    assert [r for r, _ in res] == [ids[1], ids[0], ids[2]]


def test_seqscan_without_index(rng):
    t = VectorTable(dims=8)
    pts = rng.normal(size=(50, 8)).astype(np.float32)
    t.insert(list(pts))
    res = t.order_by(pts[7], "<->", limit=3)  # no index -> seq scan
    assert res[0][0] == 7 and res[0][1] == pytest.approx(0.0, abs=1e-5)


def test_dims_and_duplicate_index_errors():
    t = VectorTable(dims=3)
    with pytest.raises(ValueError):
        t.insert([[1, 2]])
    t.create_index("<->", m=3)
    with pytest.raises(ValueError):
        t.create_index("ann_l2_ops", m=3)
    with pytest.raises(ValueError):
        t.order_by([1, 2], "<->", limit=1)


def test_pull_scan_cursor(rng):
    """t.scan(q) is the executor's amgettuple pull: streams every live row
    exactly once in pulled order, widening past ef as needed."""
    t = VectorTable(dims=8)
    pts = rng.normal(size=(120, 8)).astype(np.float32)
    ids = t.insert(list(pts))
    t.create_index("<->", m=6, ef_construction=24, ef_search=8)
    got = list(t.scan(pts[3], "<->", batch=7))
    rows = [r for r, _ in got]
    assert rows[0] == ids[3]                       # self is nearest
    assert len(rows) == len(set(rows)) == 120      # each row exactly once
    # deleted rows never stream
    t.delete(rows[:10])
    rows2 = [r for r, _ in t.scan(pts[3], "<->")]
    assert not set(rows2) & set(rows[:10])
    with pytest.raises(ValueError):
        next(t.scan(pts[3], "<=>"))                # no cosine index
