"""Sharded/single-chip capability parity (VERDICT r1 item 7): bf16 storage,
packed traversal, node-mask filters, tune_ef_search, and the Pallas-backed
per-shard exact sweep."""

import numpy as np
import pytest

from pg_embedding_tpu import HnswConfig, HnswIndex, Metric, ShardedHnswIndex


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(91)
    centers = rng.normal(scale=4.0, size=(20, 16)).astype(np.float32)
    pts = (centers[rng.integers(0, 20, 600)] +
           rng.normal(size=(600, 16))).astype(np.float32)
    qs = (centers[rng.integers(0, 20, 8)] +
          rng.normal(size=(8, 16))).astype(np.float32)
    return pts, qs


def _cfg(**kw):
    base = dict(dims=16, m=8, ef_construction=32, ef_search=32)
    base.update(kw)
    return HnswConfig(**base)


def test_sharded_exact_uses_pallas_and_matches_single(corpus):
    pts, qs = corpus
    sidx = ShardedHnswIndex(_cfg())
    sidx.build(pts, np.arange(len(pts)))
    single = HnswIndex(_cfg())
    single.build(pts, np.arange(len(pts)))
    _, le, ve = single.exact_search(qs, 10)
    d, l, v = sidx.exact_search(qs, 10)
    assert v.all()
    for r in range(len(qs)):
        assert set(l[r].tolist()) == set(le[r].tolist())


@pytest.mark.parametrize("metric",
                         [Metric.L2, Metric.COSINE, Metric.MANHATTAN])
def test_sharded_exact_all_metrics(corpus, metric):
    pts, qs = corpus
    sidx = ShardedHnswIndex(_cfg(metric=metric))
    sidx.build(pts[:300], np.arange(300))
    single = HnswIndex(_cfg(metric=metric))
    single.build(pts[:300], np.arange(300))
    _, le, _ = single.exact_search(qs, 5)
    _, l, v = sidx.exact_search(qs, 5)
    assert v.all()
    for r in range(len(qs)):
        assert set(l[r].tolist()) == set(le[r].tolist())


def test_sharded_bf16_storage(corpus):
    pts, qs = corpus
    sidx = ShardedHnswIndex(_cfg(), storage_dtype="bfloat16")
    sidx.build(pts, np.arange(len(pts)))
    single = HnswIndex(_cfg())
    single.build(pts, np.arange(len(pts)))
    _, le, ve = single.exact_search(qs, 10)
    d, l, v = sidx.search(qs, 10)
    rec = np.mean([len(set(l[i][v[i]]) & set(le[i][ve[i]])) / 10
                   for i in range(len(qs))])
    assert rec >= 0.9, rec  # bf16 rounding may flip near-ties only


def test_sharded_bf16_save_load(tmp_path, corpus):
    pts, qs = corpus
    sidx = ShardedHnswIndex(_cfg(), storage_dtype="bfloat16")
    sidx.build(pts[:200], np.arange(200))
    p = str(tmp_path / "bf16.npz")
    sidx.save(p)
    back = ShardedHnswIndex.load(p)
    assert back.storage_dtype == "bfloat16"
    d0, l0, _ = sidx.search(qs, 5, mode="graph")
    d1, l1, _ = back.search(qs, 5, mode="graph")
    np.testing.assert_array_equal(l0, l1)


def test_sharded_packed_traversal(corpus):
    pts, qs = corpus
    plain = ShardedHnswIndex(_cfg())
    plain.build(pts, np.arange(len(pts)))
    packed = ShardedHnswIndex(_cfg(), packed_traversal=True)
    packed.build(pts, np.arange(len(pts)))
    _, le, ve = plain.exact_search(qs, 10)
    d, l, v = packed.search(qs, 10, mode="graph")
    rec = np.mean([len(set(l[i][v[i]]) & set(le[i][ve[i]])) / 10
                   for i in range(len(qs))])
    assert rec >= 0.9, rec
    # records invalidate on add
    packed._ensure_packed()
    assert packed._packed is not None
    packed.add(pts[:8], np.arange(1000, 1008))
    assert packed._packed is None
    _, _, v2 = packed.search(qs, 10, mode="graph")
    assert v2.all()


def test_sharded_node_mask_filter(corpus):
    """Bool mask over global insert positions — the single-chip ``where``
    node-mask form, now addressing sharded rows via tracked positions."""
    pts, qs = corpus
    sidx = ShardedHnswIndex(_cfg())
    sidx.build(pts, np.arange(len(pts)))
    # allow only even insert positions; labels == positions here
    mask = np.arange(len(pts)) % 2 == 0
    d, l, v = sidx.search(qs, 10, where=mask)
    assert v.any()
    assert (l[v] % 2 == 0).all()
    # and the exact path honors the same mask
    d2, l2, v2 = sidx.exact_search(qs, 10, where=mask)
    assert (l2[v2] % 2 == 0).all()


def test_sharded_node_mask_after_save_load(tmp_path, corpus):
    pts, _ = corpus
    sidx = ShardedHnswIndex(_cfg())
    sidx.build(pts[:100], np.arange(100))
    p = str(tmp_path / "pos.npz")
    sidx.save(p)
    back = ShardedHnswIndex.load(p)
    np.testing.assert_array_equal(back._positions[:, :20],
                                  sidx._positions[:, :20])


def test_sharded_tune_ef_search(corpus):
    pts, qs = corpus
    sidx = ShardedHnswIndex(_cfg(ef_search=8))
    sidx.build(pts, np.arange(len(pts)))
    res = sidx.tune_ef_search(qs, target_recall=0.95, k=10)
    assert res.ef >= 10
    assert sidx.config.ef_search == res.ef
    assert res.met and res.recall >= 0.95
    d, l, v = sidx.search(qs, 10, mode="graph")
    _, le, ve = sidx.exact_search(qs, 10)
    rec = np.mean([len(set(l[i][v[i]]) & set(le[i][ve[i]])) / 10
                   for i in range(len(qs))])
    assert rec >= 0.9
