"""Exact-search oracle tests (the seq-scan analog, embedding.c:1022-1038)."""

import numpy as np
import pytest

from pg_embedding_tpu.config import Metric
from pg_embedding_tpu.ops.bruteforce import exact_search


def _np_topk(metric, qs, pts, k):
    if metric is Metric.L2:
        d = np.sqrt(((qs[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
    elif metric is Metric.COSINE:
        d = 1 - (qs @ pts.T) / np.sqrt(
            ((qs * qs).sum(-1)[:, None]) * ((pts * pts).sum(-1)[None, :]))
    else:
        d = np.abs(qs[:, None, :] - pts[None, :, :]).sum(-1)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


@pytest.mark.parametrize("metric", list(Metric))
def test_matches_numpy(rng, metric):
    pts = rng.normal(size=(777, 32)).astype(np.float32)
    qs = rng.normal(size=(5, 32)).astype(np.float32)
    d, i = exact_search(qs, pts, 10, metric, chunk=256)
    wd, wi = _np_topk(metric, qs, pts, 10)
    np.testing.assert_array_equal(np.asarray(i), wi)
    np.testing.assert_allclose(np.asarray(d), wd, rtol=1e-4, atol=1e-5)


def test_k_exceeds_n(rng):
    pts = rng.normal(size=(6, 8)).astype(np.float32)
    qs = rng.normal(size=(2, 8)).astype(np.float32)
    d, i = exact_search(qs, pts, 10, Metric.L2)
    i = np.asarray(i)
    d = np.asarray(d)
    assert (i[:, 6:] == -1).all()
    assert np.isinf(d[:, 6:]).all()
    assert (i[:, :6] >= 0).all()


def test_n_valid_masks_padding(rng):
    pts = rng.normal(size=(100, 8)).astype(np.float32)
    qs = rng.normal(size=(3, 8)).astype(np.float32)
    _, i_full = exact_search(qs, pts[:50], 5, Metric.L2)
    _, i_masked = exact_search(qs, pts, 5, Metric.L2, n_valid=50)
    np.testing.assert_array_equal(np.asarray(i_full), np.asarray(i_masked))


def test_deleted_mask(rng):
    pts = rng.normal(size=(64, 8)).astype(np.float32)
    qs = rng.normal(size=(2, 8)).astype(np.float32)
    _, i0 = exact_search(qs, pts, 1, Metric.L2)
    top = int(np.asarray(i0)[0, 0])
    deleted = np.zeros(64, bool)
    deleted[top] = True
    _, i1 = exact_search(qs, pts, 5, Metric.L2, deleted=deleted)
    assert top not in np.asarray(i1)[0]


def test_empty_corpus(rng):
    pts = np.zeros((4, 8), np.float32)
    qs = rng.normal(size=(2, 8)).astype(np.float32)
    d, i = exact_search(qs, pts, 3, Metric.L2, n_valid=0)
    assert (np.asarray(i) == -1).all()


def test_l2_accuracy_vs_f64_oracle(rng):
    """The L2 matmul expansion cancels catastrophically in f32 on data with
    |p|^2 >> d^2 (round-1 oracle bug: ~3% of top-10 sets flipped at 100k).
    The over-fetch + exact-rerank path must match a float64 oracle."""
    centers = rng.normal(scale=4.0, size=(200, 128)).astype(np.float32)
    pts = (centers[rng.integers(0, 200, 20000)] +
           rng.normal(size=(20000, 128))).astype(np.float32)
    qs = (centers[rng.integers(0, 200, 64)] +
          rng.normal(size=(64, 128))).astype(np.float32)
    # per-query f64 oracle (chunked: this host has one CPU core)
    oracle = np.zeros((len(qs), 10), np.int64)
    best64 = np.zeros(len(qs), np.float64)
    for r in range(len(qs)):
        drow = ((pts - qs[r]).astype(np.float64) ** 2).sum(-1)
        oracle[r] = np.argsort(drow)[:10]
        best64[r] = drow[oracle[r][0]]

    d, i = exact_search(qs, pts, 10, Metric.L2)
    i = np.asarray(i)
    rec = np.mean([len(set(i[r].tolist()) & set(oracle[r].tolist())) / 10
                   for r in range(len(qs))])
    assert rec >= 0.999, rec

    from pg_embedding_tpu.ops.pallas_bruteforce import pallas_exact_search
    dp, ip = pallas_exact_search(qs, pts, 10, Metric.L2)
    ip = np.asarray(ip)
    recp = np.mean([len(set(ip[r].tolist()) & set(oracle[r].tolist())) / 10
                    for r in range(len(qs))])
    assert recp >= 0.999, recp
    # returned distances use the exact difference form (sqrt'd)
    np.testing.assert_allclose(np.asarray(d)[:, 0], np.sqrt(best64),
                               rtol=1e-4)
