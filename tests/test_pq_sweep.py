"""Compressed brute-force sweep (mode="sweep_pq"): ADC over per-row PQ
codes + exact f32 rerank (ops/pq_sweep.py).  The sequential engine between
the exact sweep (reads the f32 corpus) and the graph walk — its HBM cost
is the code stream (G bytes/row vs 4*D), its recall is priced by the
coarse pool width, and its returned distances are reference-exact
(distfunc.c forms) because the pool is reranked on the gathered rows."""

import numpy as np
import pytest
import jax.numpy as jnp

from pg_embedding_tpu import HnswConfig, HnswIndex
from pg_embedding_tpu.ops.bruteforce import exact_search
from pg_embedding_tpu.ops.pq import pq_encode, train_pq
from pg_embedding_tpu.ops.pq_sweep import pq_sweep_search


@pytest.fixture(scope="module")
def clustered(rng):
    centers = rng.normal(scale=4.0, size=(200, 32)).astype(np.float32)
    a = rng.integers(0, 200, 6000)
    pts = (centers[a] + rng.normal(size=(6000, 32))).astype(np.float32)
    qs = (centers[rng.integers(0, 200, 32)] +
          rng.normal(size=(32, 32))).astype(np.float32)
    return pts, qs


def _cfg(**kw):
    kw.setdefault("dims", 32)
    kw.setdefault("m", 8)
    kw.setdefault("ef_construction", 32)
    kw.setdefault("ef_search", 32)
    return HnswConfig(**kw)


def _recall(l, v, le, ve, k):
    return np.mean([len(set(l[i][v[i]].tolist()) &
                        set(le[i][ve[i]].tolist())) / k
                    for i in range(len(l))])


# --------------------------------------------------------------------- #
# ops/pq_sweep.py
# --------------------------------------------------------------------- #

def test_sweep_recall_and_exact_distances(clustered):
    pts, qs = clustered
    x = jnp.asarray(pts)
    cb = train_pq(x, groups=8, iters=10)
    codes = pq_encode(x, cb)
    d, i = pq_sweep_search(qs, codes, cb, None, x, 10, pool=64)
    de, ie = exact_search(jnp.asarray(qs), x, 10)
    d, i, de, ie = map(np.asarray, (d, i, de, ie))
    rec = np.mean([len(set(i[r].tolist()) & set(ie[r].tolist())) / 10
                   for r in range(len(qs))])
    assert rec >= 0.9  # clustered data, generous pool
    # wherever the sweep found the true neighbor, its distance is EXACT
    for r in range(len(qs)):
        for c, idx in enumerate(i[r]):
            hit = np.nonzero(ie[r] == idx)[0]
            if len(hit):
                np.testing.assert_allclose(d[r, c], de[r, hit[0]],
                                           rtol=1e-5, atol=1e-5)
    # ascending order
    assert np.all(np.diff(d, axis=1) >= -1e-6)


def test_sweep_pool_widens_recall(clustered):
    pts, qs = clustered
    x = jnp.asarray(pts)
    cb = train_pq(x, groups=4, iters=8)   # coarse codes => distortion
    codes = pq_encode(x, cb)
    _, ie = exact_search(jnp.asarray(qs), x, 10)
    ie = np.asarray(ie)

    def rec(pool):
        _, i = pq_sweep_search(qs, codes, cb, None, x, 10, pool=pool)
        i = np.asarray(i)
        return np.mean([len(set(i[r].tolist()) & set(ie[r].tolist())) / 10
                        for r in range(len(qs))])

    assert rec(128) >= rec(10) - 1e-9


def test_sweep_respects_deleted_and_nvalid(clustered):
    pts, qs = clustered
    x = jnp.asarray(pts)
    cb = train_pq(x, groups=8, iters=8)
    codes = pq_encode(x, cb)
    _, i_full = pq_sweep_search(qs, codes, cb, None, x, 5, pool=32)
    # tombstone the full result set; none may resurface
    dead_ids = np.unique(np.asarray(i_full)[np.asarray(i_full) >= 0])
    deleted = np.zeros(len(pts), bool)
    deleted[dead_ids] = True
    _, i2 = pq_sweep_search(qs, codes, cb, None, x, 5, pool=32,
                            deleted=jnp.asarray(deleted))
    assert not np.isin(np.asarray(i2), dead_ids).any()
    # n_valid caps ids
    _, i3 = pq_sweep_search(qs, codes, cb, None, x, 5, pool=32, n_valid=100)
    i3 = np.asarray(i3)
    assert i3.max() < 100


def test_sweep_manhattan_metric(clustered):
    pts, qs = clustered
    x = jnp.asarray(pts)
    cb = train_pq(x, groups=8, iters=8)
    codes = pq_encode(x, cb)
    d, i = pq_sweep_search(qs, codes, cb, None, x, 5, metric="manhattan",
                           pool=64)
    de, ie = exact_search(jnp.asarray(qs), x, 5, metric="manhattan")
    rec = np.mean([len(set(np.asarray(i)[r].tolist()) &
                       set(np.asarray(ie)[r].tolist())) / 5
                   for r in range(len(qs))])
    assert rec >= 0.8


# --------------------------------------------------------------------- #
# HnswIndex.search(mode="sweep_pq") / pq_sweep_search
# --------------------------------------------------------------------- #

def test_index_sweep_pq_mode(clustered):
    pts, qs = clustered
    idx = HnswIndex(_cfg())
    idx.build(pts)
    d, l, v = idx.search(qs, 10, mode="sweep_pq")
    _, le, ve = idx.exact_search(qs, 10)
    assert v.all()
    assert _recall(l, v, le, ve, 10) >= 0.9
    assert np.all(np.diff(d, axis=1) >= -1e-6)


def test_index_sweep_pq_opq_rotation(clustered):
    pts, qs = clustered
    idx = HnswIndex(_cfg(), pq_opq=True)
    idx.build(pts)
    _, l, v = idx.search(qs, 10, mode="sweep_pq")
    _, le, ve = idx.exact_search(qs, 10)
    assert _recall(l, v, le, ve, 10) >= 0.9


def test_index_sweep_pq_filters_and_tombstones(clustered):
    pts, qs = clustered
    idx = HnswIndex(_cfg())
    idx.build(pts)
    _, l, v = idx.search(qs, 5, mode="sweep_pq")
    gone = np.unique(l[v])
    idx.delete(gone)
    _, l2, v2 = idx.search(qs, 5, mode="sweep_pq")
    assert not np.isin(l2[v2], gone).any()
    # where= filter: only even labels allowed
    allowed = np.asarray(idx.labels)[np.asarray(idx.labels) % 2 == 0]
    _, l3, v3 = idx.search(qs, 5, mode="sweep_pq", where=allowed)
    assert (l3[v3] % 2 == 0).all()


def test_index_sweep_pq_codes_invalidated_on_insert(clustered):
    pts, qs = clustered
    idx = HnswIndex(_cfg())
    idx.build(pts[:4000])
    _ = idx.search(qs, 5, mode="sweep_pq")
    assert idx._pq_codes is not None
    idx.add(pts[4000:], np.arange(4000, len(pts)))
    assert idx._pq_codes is None          # stale shadow dropped
    _, l, v = idx.search(qs, 5, mode="sweep_pq")
    _, le, ve = idx.exact_search(qs, 5)
    assert _recall(l, v, le, ve, 5) >= 0.85


# --------------------------------------------------------------------- #
# ShardedHnswIndex.search(mode="sweep_pq") — 8-device CPU mesh
# --------------------------------------------------------------------- #

def test_sharded_sweep_pq(clustered):
    from pg_embedding_tpu import ShardedHnswIndex

    pts, qs = clustered
    sidx = ShardedHnswIndex(_cfg())
    sidx.build(pts, np.arange(len(pts)))
    d, l, v = sidx.search(qs, 10, mode="sweep_pq")
    _, le, ve = sidx.exact_search(qs, 10)
    assert v.all()
    assert _recall(l, v, le, ve, 10) >= 0.9
    assert np.all(np.diff(d, axis=1) >= -1e-6)
    # deleted rows never resurface through the merged sweep
    gone = np.unique(l[v])[:20]
    sidx.delete(gone)
    _, l2, v2 = sidx.search(qs, 10, mode="sweep_pq")
    assert not np.isin(l2[v2], gone).any()


def test_codebook_persisted_on_save_load(clustered, tmp_path):
    pts, qs = clustered
    idx = HnswIndex(_cfg(), pq_opq=True)
    idx.build(pts)
    d1, l1, v1 = idx.search(qs, 10, mode="sweep_pq")  # trains codebook
    path = str(tmp_path / "idx.npz")
    idx.save(path)
    idx2 = HnswIndex.load(path)
    # no retrain: the stored dictionary (and OPQ rotation) comes back
    assert idx2._pq_codebook is not None
    np.testing.assert_array_equal(np.asarray(idx2._pq_codebook),
                                  np.asarray(idx._pq_codebook))
    assert idx2.pq_opq and idx2._pq_rot is not None
    d2, l2, v2 = idx2.search(qs, 10, mode="sweep_pq")
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)


def test_sharded_codebook_persisted_on_save_load(clustered, tmp_path):
    from pg_embedding_tpu import ShardedHnswIndex

    pts, qs = clustered
    sidx = ShardedHnswIndex(_cfg())
    sidx.build(pts, np.arange(len(pts)))
    d1, l1, v1 = sidx.search(qs, 10, mode="sweep_pq")  # trains codebook
    path = str(tmp_path / "sidx.npz")
    sidx.save(path)
    sidx2 = ShardedHnswIndex.load(path)
    # no retrain: the stored global dictionary comes back and per-shard
    # codes re-derive from it, so merged results are reproducible
    assert sidx2._pq_codebook is not None
    np.testing.assert_array_equal(np.asarray(sidx2._pq_codebook),
                                  np.asarray(sidx._pq_codebook))
    d2, l2, v2 = sidx2.search(qs, 10, mode="sweep_pq")
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)


def test_tune_sweep_pool(clustered):
    from pg_embedding_tpu.api import TuneTargetMissed

    pts, qs = clustered
    idx = HnswIndex(_cfg(), pq_groups=4)   # coarse codes: pool matters
    idx.build(pts)
    res = idx.tune_sweep_pool(qs, target_recall=0.9, k=10)
    assert res.met and res.recall >= 0.9
    assert idx.pq_sweep_pool == res.ef
    # the tuned pool is now the mode default
    _, l, v = idx.search(qs, 10, mode="sweep_pq")
    _, le, ve = idx.exact_search(qs, 10)
    assert _recall(l, v, le, ve, 10) >= 0.9
    # an unreachable target raises under strict
    with pytest.raises(TuneTargetMissed):
        idx.tune_sweep_pool(qs, target_recall=1.1, strict=True,
                            max_pool=64)


def test_index_sweep_pq_small_k_gt_n():
    rng = np.random.default_rng(7)
    pts = rng.normal(size=(6, 32)).astype(np.float32)
    idx = HnswIndex(_cfg())
    idx.build(pts)
    d, l, v = idx.search(pts[:2], 10, mode="sweep_pq")
    assert v[:, :6].all() and not v[:, 6:].any()
    assert np.isinf(d[:, 6:]).all()
