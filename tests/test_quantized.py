"""int8 quantized traversal + exact rerank."""

import numpy as np
import pytest

from pg_embedding_tpu import HnswConfig, HnswIndex


@pytest.fixture(scope="module")
def data(rng):
    n_clusters, per, d = 15, 40, 16
    centers = rng.normal(scale=4.0, size=(n_clusters, d))
    pts = (centers[np.repeat(np.arange(n_clusters), per)] +
           rng.normal(size=(n_clusters * per, d))).astype(np.float32)
    qs = (centers[rng.integers(0, n_clusters, 16)] +
          rng.normal(size=(16, d))).astype(np.float32)
    return pts, qs


def test_quantized_recall_parity(data):
    pts, qs = data
    cfg = HnswConfig(dims=16, m=8, ef_construction=48, ef_search=48)
    f32 = HnswIndex(cfg)
    f32.build(pts)
    _, le, ve = f32.exact_search(qs, 10)

    qi = HnswIndex(cfg, quantized_traversal=True)
    qi.build(pts)
    d, l, v = qi.search(qs, 10, mode="graph")
    rec = np.mean([len(set(l[i][v[i]]) & set(le[i][ve[i]])) / 10
                   for i in range(len(qs))])
    assert rec >= 0.9, rec
    # reranked distances are exact full-precision values (ascending)
    de, _, _ = f32.exact_search(qs[:1], 1)
    assert d[0][0] == pytest.approx(de[0][0], rel=1e-4, abs=1e-5)
    for row, val in zip(d, v):
        dd = row[val]
        assert (np.diff(dd) >= -1e-6).all()


def test_quantized_stale_after_add(data):
    """The int8 shadow must never serve stale rows after add().  Under a
    non-exact8 build mode the add invalidates it (rebuilt lazily); under
    the exact8 default the slab threading maintains it through every
    inserted row, so it stays valid and watermark-consistent."""
    pts, qs = data
    cfg = HnswConfig(dims=16, m=8, ef_construction=32, ef_search=32)
    qi = HnswIndex(cfg, quantized_traversal=True, build_candidates="beam")
    qi.build(pts[:300])
    qi.search(qs[:2], 5)         # builds the shadow copy
    assert qi._qvec is not None
    qi.add(pts[300:330], np.arange(300, 330))
    assert qi._qvec is None      # invalidated
    d, l, v = qi.search(qs[:2], 5)
    assert v.all()

    e8 = HnswIndex(cfg, quantized_traversal=True)   # auto -> exact8
    e8.build(pts[:300])
    assert e8._qvec is not None and e8._qvec_rows == 300
    e8.add(pts[300:330], np.arange(300, 330))
    assert e8._qvec is not None and e8._qvec_rows == 330  # maintained
    d, l, v = e8.search(qs[:2], 5)
    assert v.all()


def test_quantized_tombstones(data):
    pts, qs = data
    cfg = HnswConfig(dims=16, m=8, ef_construction=32, ef_search=32)
    qi = HnswIndex(cfg, quantized_traversal=True)
    qi.build(pts[:200])
    _, le, _ = qi.exact_search(qs[:1], 5)
    qi.delete(le[0])
    _, l, v = qi.search(qs[:1], 5, mode="graph")
    assert not (set(l[0][v[0]].tolist()) & set(le[0].tolist()))
