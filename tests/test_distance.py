"""Distance kernel parity vs the reference formulas (distfunc.c:121-155)."""

import numpy as np
import pytest

from pg_embedding_tpu.config import Metric
from pg_embedding_tpu.ops.distance import (cosine_distance, dist_one_to_many,
                                           l2_distance, manhattan_distance,
                                           pairwise_dist)


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.default_rng(7)
    return (rng.normal(size=(32, 48)).astype(np.float32),
            rng.normal(size=(8, 48)).astype(np.float32))


def _np_dist(metric, a, b):
    if metric is Metric.L2:
        return np.sqrt(((a - b) ** 2).sum(-1))
    if metric is Metric.COSINE:
        return 1 - (a * b).sum(-1) / np.sqrt((a * a).sum(-1) *
                                             (b * b).sum(-1))
    return np.abs(a - b).sum(-1)


def test_l2_formula(vecs):
    pts, qs = vecs
    got = float(l2_distance(qs[0], pts[0]))
    want = float(_np_dist(Metric.L2, qs[0], pts[0]))
    assert got == pytest.approx(want, rel=1e-5)


def test_cosine_formula(vecs):
    pts, qs = vecs
    got = float(cosine_distance(qs[0], pts[0]))
    want = float(_np_dist(Metric.COSINE, qs[0], pts[0]))
    assert got == pytest.approx(want, rel=1e-5, abs=1e-6)


def test_manhattan_formula(vecs):
    pts, qs = vecs
    got = float(manhattan_distance(qs[0], pts[0]))
    want = float(_np_dist(Metric.MANHATTAN, qs[0], pts[0]))
    assert got == pytest.approx(want, rel=1e-5)


@pytest.mark.parametrize("metric", list(Metric))
def test_one_to_many_matches_numpy(vecs, metric):
    pts, qs = vecs
    got = np.asarray(dist_one_to_many(qs[0], pts, metric))
    want = _np_dist(metric, qs[0][None, :], pts)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("metric", list(Metric))
def test_pairwise_matches_one_to_many(vecs, metric):
    """The MXU (matmul) form must order-agree with the exact VPU form."""
    pts, qs = vecs
    mat = np.asarray(pairwise_dist(qs, pts, metric))
    for i in range(qs.shape[0]):
        row = np.asarray(dist_one_to_many(qs[i], pts, metric))
        np.testing.assert_allclose(mat[i], row, rtol=1e-3, atol=1e-4)
        # ordering must match exactly on well-separated data
        assert (np.argsort(mat[i])[:5] == np.argsort(row)[:5]).all()


def test_dims_mismatch_error():
    # "Different array dimensions" (embedding.c:1030-1035)
    with pytest.raises(ValueError):
        l2_distance(np.zeros(3, np.float32), np.zeros(4, np.float32))
    with pytest.raises(ValueError):
        cosine_distance(np.zeros(3, np.float32), np.zeros(4, np.float32))
    with pytest.raises(ValueError):
        manhattan_distance(np.zeros(3, np.float32), np.zeros(4, np.float32))
