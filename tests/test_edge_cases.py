"""Edge cases the reference leaves untested (SURVEY.md §4 'what's untested')."""

import numpy as np
import pytest

from pg_embedding_tpu import HnswConfig, HnswIndex, Metric
from pg_embedding_tpu.ops.distance import cosine_distance


def test_cosine_zero_vector():
    """cosine with a zero vector: the reference divides by zero
    (distfunc.c:144 -> nan/inf); we clamp the norm product, yielding a
    well-defined worst-case distance of 1.0."""
    z = np.zeros(4, np.float32)
    a = np.ones(4, np.float32)
    d = float(cosine_distance(z, a))
    assert np.isfinite(d)
    assert d == pytest.approx(1.0)

    idx = HnswIndex(HnswConfig(dims=4, m=4, metric=Metric.COSINE))
    idx.build(np.vstack([z, a, 2 * a]), np.array([1, 2, 3], np.uint64))
    d, l, v = idx.search(a[None, :], 3)
    assert np.isfinite(d[0][v[0]]).all()
    assert set(l[0][v[0]]) == {1, 2, 3}


def test_duplicate_labels_delete_all(rng):
    pts = rng.normal(size=(10, 8)).astype(np.float32)
    idx = HnswIndex(HnswConfig(dims=8, m=4))
    idx.build(pts, np.array([7] * 5 + [8] * 5, np.uint64))
    assert idx.delete([7]) == 5  # all copies tombstoned
    _, l, v = idx.search(pts[:1], 10)
    assert 7 not in set(l[0][v[0]].tolist())
    assert idx.vacuum()["num_dead"] == 5


def test_compact_reclaims_space(rng):
    pts = rng.normal(size=(200, 8)).astype(np.float32)
    idx = HnswIndex(HnswConfig(dims=8, m=4, ef_construction=16,
                               ef_search=16))
    idx.build(pts, np.arange(200))
    idx.delete(np.arange(100, dtype=np.uint64))
    assert idx.vacuum()["num_dead"] == 100

    fresh = idx.compact()
    assert len(fresh) == 100
    assert fresh.vacuum()["num_dead"] == 0
    fresh.check_integrity()
    q = pts[150][None, :]
    d, l, v = fresh.search(q, 5)
    assert 150 in set(l[0][v[0]].tolist())
    assert not (set(l[0][v[0]].tolist()) & set(range(100)))
    # original untouched
    assert idx.vacuum()["num_dead"] == 100


def test_compact_empty():
    idx = HnswIndex(HnswConfig(dims=4, m=4))
    fresh = idx.compact()
    assert len(fresh) == 0


def test_single_vector_index(rng):
    idx = HnswIndex(HnswConfig(dims=8, m=4))
    idx.add(rng.normal(size=(1, 8)).astype(np.float32), [42])
    d, l, v = idx.search(rng.normal(size=(2, 8)).astype(np.float32), 3)
    assert (v[:, 0]).all() and not v[:, 1:].any()
    assert (l[:, 0] == 42).all()


def test_search_before_any_insert_then_add(rng):
    """gh-2 then recovery: empty search, then inserts make it live."""
    idx = HnswIndex(HnswConfig(dims=8, m=4))
    _, _, v = idx.search(np.zeros((1, 8), np.float32), 3)
    assert not v.any()
    idx.add(rng.normal(size=(5, 8)).astype(np.float32))
    _, _, v = idx.search(np.zeros((1, 8), np.float32), 3)
    assert v.all()
