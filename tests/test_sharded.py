"""Multi-chip sharded index tests on the 8-virtual-device CPU mesh.

The reference has zero distributed testing (SURVEY.md §4); this suite is the
'fake backend' equivalent: an 8-device host mesh exercising the shard_map
build, the all-gather top-k merge, ragged shard tails, tombstones, and
capacity growth."""

import numpy as np
import pytest

import jax

from pg_embedding_tpu import HnswConfig, HnswIndex, Metric, ShardedHnswIndex
from pg_embedding_tpu.parallel.sharded import default_mesh


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(55)
    pts = rng.normal(size=(500, 16)).astype(np.float32)
    qs = rng.normal(size=(6, 16)).astype(np.float32)
    return pts, qs


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("metric", [Metric.L2, Metric.COSINE])
def test_sharded_recall_matches_exact(corpus, metric):
    pts, qs = corpus
    cfg = HnswConfig(dims=16, m=8, ef_construction=32, ef_search=32,
                     metric=metric)
    sidx = ShardedHnswIndex(cfg)
    assert sidx.n_shards == 8
    sidx.build(pts, np.arange(len(pts)))
    assert sidx.n_nodes == len(pts)

    single = HnswIndex(cfg)
    single.build(pts, np.arange(len(pts)))
    _, le, ve = single.exact_search(qs, 10)

    d, l, v = sidx.search(qs, 10)
    rec = np.mean([len(set(l[i][v[i]]) & set(le[i][ve[i]])) / 10
                   for i in range(len(qs))])
    # per-shard exhaustive-ish search merged over ICI should be >= single
    assert rec >= 0.95, rec


def test_ragged_shard_sizes(corpus):
    """N not divisible by n_shards exercises the n_insert-masked tail."""
    pts, qs = corpus
    n = 403  # 403 = 8*50 + 3
    cfg = HnswConfig(dims=16, m=6, ef_construction=24, ef_search=24)
    sidx = ShardedHnswIndex(cfg)
    sidx.build(pts[:n], np.arange(n))
    assert sidx.n_nodes == n
    counts = sidx.shard_counts
    assert counts.sum() == n
    assert counts.max() - counts.min() <= 1

    single = HnswIndex(cfg)
    single.build(pts[:n], np.arange(n))
    _, le, ve = single.exact_search(qs, 10)
    d, l, v = sidx.search(qs, 10)
    rec = np.mean([len(set(l[i][v[i]]) & set(le[i][ve[i]])) / 10
                   for i in range(len(qs))])
    assert rec >= 0.95, rec


def test_sharded_delete_and_widening(corpus):
    pts, qs = corpus
    cfg = HnswConfig(dims=16, m=8, ef_construction=32, ef_search=16)
    sidx = ShardedHnswIndex(cfg)
    sidx.build(pts, np.arange(len(pts)))

    single = HnswIndex(cfg)
    single.build(pts, np.arange(len(pts)))
    _, le, _ = single.exact_search(qs[:1], 12)
    n = sidx.delete(le[0])
    assert n == 12
    d, l, v = sidx.search(qs[:1], 10)
    assert v[0].sum() == 10
    assert not (set(l[0].tolist()) & set(le[0].tolist()))
    stats = sidx.vacuum()
    assert stats["num_dead"] == 12
    assert stats["num_live"] == len(pts) - 12


def test_sharded_incremental_add(corpus):
    pts, qs = corpus
    cfg = HnswConfig(dims=16, m=6, ef_construction=24, ef_search=24)
    sidx = ShardedHnswIndex(cfg, initial_capacity=32)
    sidx.add(pts[:100], np.arange(100))
    sidx.add(pts[100:250], np.arange(100, 250))  # forces capacity growth
    assert sidx.n_nodes == 250

    single = HnswIndex(cfg)
    single.build(pts[:250], np.arange(250))
    _, le, ve = single.exact_search(qs, 10)
    _, l, v = sidx.search(qs, 10)
    rec = np.mean([len(set(l[i][v[i]]) & set(le[i][ve[i]])) / 10
                   for i in range(len(qs))])
    assert rec >= 0.9, rec


def test_sharded_empty_index():
    cfg = HnswConfig(dims=16, m=6)
    sidx = ShardedHnswIndex(cfg)
    d, l, v = sidx.search(np.zeros((2, 16), np.float32), 5)
    assert not v.any()


def test_explicit_small_mesh(corpus):
    """A 2-device sub-mesh must work too (mesh shape is a free parameter)."""
    pts, qs = corpus
    cfg = HnswConfig(dims=16, m=6, ef_construction=24, ef_search=24)
    sidx = ShardedHnswIndex(cfg, mesh=default_mesh(2))
    assert sidx.n_shards == 2
    sidx.build(pts[:200], np.arange(200))
    _, l, v = sidx.search(qs, 5)
    assert v.all()


def test_sharded_exact_search(corpus):
    pts, qs = corpus
    cfg = HnswConfig(dims=16, m=6, ef_construction=24, ef_search=24)
    sidx = ShardedHnswIndex(cfg)
    sidx.build(pts, np.arange(len(pts)))
    single = HnswIndex(cfg)
    single.build(pts, np.arange(len(pts)))
    d1, l1, v1 = single.exact_search(qs, 10)
    d2, l2, v2 = sidx.exact_search(qs, 10)
    assert v2.all()
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_allclose(d1, d2, rtol=1e-4, atol=1e-5)
    # exact excludes tombstones
    sidx.delete(l2[0][:3])
    _, l3, _ = sidx.exact_search(qs[:1], 10)
    assert not (set(l3[0].tolist()) & set(l2[0][:3].tolist()))


def test_sharded_mode_routing(corpus):
    pts, _ = corpus
    cfg = HnswConfig(dims=16, m=6, ef_construction=24, ef_search=24)
    sidx = ShardedHnswIndex(cfg)
    sidx.build(pts, np.arange(len(pts)))
    qs = np.random.default_rng(1).normal(size=(64, 16)).astype(np.float32)
    d_a, l_a, v_a = sidx.search(qs, 10, mode="auto")
    assert sidx.counters.get("n_exact_routed", 0) == 64
    d_e, l_e, v_e = sidx.search(qs, 10, mode="exact")
    np.testing.assert_array_equal(l_a, l_e)
    d_g, l_g, v_g = sidx.search(qs, 10, mode="graph")
    rec = np.mean([len(set(l_g[i][v_g[i]]) & set(l_e[i][v_e[i]])) / 10
                   for i in range(64)])
    assert rec >= 0.8


def test_sharded_save_load(tmp_path, corpus):
    pts, qs = corpus
    cfg = HnswConfig(dims=16, m=6, ef_construction=24, ef_search=24)
    sidx = ShardedHnswIndex(cfg)
    sidx.build(pts, np.arange(len(pts)))
    sidx.delete([5, 6])
    p = str(tmp_path / "shidx.npz")
    sidx.save(p)
    loaded = ShardedHnswIndex.load(p)
    assert loaded.n_nodes == sidx.n_nodes
    d1, l1, v1 = sidx.search(qs, 10, mode="graph")
    d2, l2, v2 = loaded.search(qs, 10, mode="graph")
    np.testing.assert_array_equal(l1, l2)
    # frozen-field guard
    with pytest.raises(ValueError):
        ShardedHnswIndex.load(p, config=HnswConfig(dims=16, m=9))
    # ef change allowed
    l3 = ShardedHnswIndex.load(p, config=cfg.with_ef(ef_search=48))
    assert l3.config.ef_search == 48
    # mesh-size mismatch
    from pg_embedding_tpu.parallel.sharded import default_mesh
    with pytest.raises(ValueError):
        ShardedHnswIndex.load(p, mesh=default_mesh(4))
    # load-then-add keeps working
    loaded.add(pts[:50], np.arange(1000, 1050))
    assert loaded.n_nodes == len(pts) + 50


def test_sharded_compact_and_integrity(corpus):
    pts, qs = corpus
    cfg = HnswConfig(dims=16, m=6, ef_construction=24, ef_search=24)
    sidx = ShardedHnswIndex(cfg)
    sidx.build(pts[:300], np.arange(300))
    sidx.check_integrity()
    sidx.delete(np.arange(100, dtype=np.uint64))
    fresh = sidx.compact()
    assert fresh.n_nodes == 200
    assert fresh.vacuum()["num_dead"] == 0
    fresh.check_integrity()
    _, l, v = fresh.search(qs[:2], 5, mode="graph")
    assert not (set(l[v].tolist()) & set(range(100)))
