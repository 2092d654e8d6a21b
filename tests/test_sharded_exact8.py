"""Sharded exact8 construction (ROADMAP r3 #6): the int8-shadow coarse
sweep + exact f32 rerank candidate engine under shard_map, with the shadow
threaded through slab batch loops exactly as on the single-chip path
(core/build.insert_slab_q_donating).  Per-shard corpora past the ~600k
f32-sweep crossover keep full-corpus construction candidates instead of
falling back to beam quality — the regime every Deep100M-class shard
lives in (100M / 8 shards = 12.5M rows per shard)."""

import numpy as np
import pytest

from pg_embedding_tpu import HnswConfig, HnswIndex, ShardedHnswIndex

N_SHARDS = 8


@pytest.fixture(scope="module")
def corpus(rng):
    pts = rng.normal(size=(1536, 16)).astype(np.float32)
    qs = pts[rng.integers(0, 1536, 8)] + \
        rng.normal(scale=0.05, size=(8, 16)).astype(np.float32)
    return pts, qs.astype(np.float32)


def _cfg(**kw):
    kw.setdefault("dims", 16)
    kw.setdefault("m", 8)
    kw.setdefault("ef_construction", 32)
    kw.setdefault("ef_search", 32)
    return HnswConfig(**kw)


def _recall(idx, qs, k=10):
    d, l, v = idx.search(qs, k, mode="graph")
    _, le, ve = idx.exact_search(qs, k)
    return np.mean([len(set(l[i][v[i]]) & set(le[i][ve[i]])) / k
                    for i in range(len(qs))])


def test_sharded_exact8_quality(corpus):
    """exact8 graphs serve within noise of exact-sweep graphs (the coarse
    scores are reranked in exact f32 from a 2x-widened pool)."""
    pts, qs = corpus
    exact = ShardedHnswIndex(_cfg(), build_candidates="exact")
    exact.build(pts, np.arange(len(pts)))
    e8 = ShardedHnswIndex(_cfg(), build_candidates="exact8")
    e8.build(pts, np.arange(len(pts)))
    e8.check_integrity()
    assert e8.n_nodes == len(pts)
    r_exact = _recall(exact, qs)
    r_e8 = _recall(e8, qs)
    assert r_e8 >= r_exact - 0.02
    assert r_e8 >= 0.9


def test_sharded_exact8_matches_single_chip(corpus):
    """Bit-exactness: each shard's graph from the sharded exact8 slab
    program equals a single-chip exact8 build over that shard's row stream
    (same batch boundaries => the same insert_batch_core sequence; masked
    no-op tail batches change nothing)."""
    pts, _ = corpus
    n = 1024  # divisible by shards*batch so streams align exactly
    b = 32
    # capacity parity matters: the exact8 sweep chunk is min(1M, capacity),
    # and the approx_min_k branch engages by chunk size — pin the per-shard
    # capacity to what the single-chip build allocates (128 rows + b slack)
    sh = ShardedHnswIndex(_cfg(), build_candidates="exact8",
                          max_insert_batch=b, initial_capacity=160)
    sh.build(pts[:n], np.arange(n))
    assert sh.capacity_per_shard == 160
    links = np.asarray(sh._arrays[1])
    cnts = np.asarray(sh._arrays[2])
    per = n // sh.n_shards
    for s in range(min(sh.n_shards, 2)):  # two shards suffice; keep it fast
        stream = pts[:n][np.arange(n) % sh.n_shards == s]
        solo = HnswIndex(_cfg(), build_candidates="exact8",
                         max_insert_batch=b)
        solo.build(stream, np.arange(per))
        solo_links = np.asarray(solo._graph.links[:per])
        solo_cnts = np.asarray(solo._graph.link_counts[:per])
        np.testing.assert_array_equal(links[s, :per], solo_links)
        np.testing.assert_array_equal(cnts[s, :per], solo_cnts)


def test_sharded_shadow_incremental_matches_full_requant(corpus):
    """The slab-threaded shadow (staged batch by batch on device) equals a
    full requantization of the live rows — appended rows never change."""
    pts, _ = corpus
    idx = ShardedHnswIndex(_cfg(), build_candidates="exact8")
    idx.build(pts, np.arange(len(pts)))
    assert idx._qvec is not None
    assert np.array_equal(idx._qvec_counts, idx._counts)
    full_qv, full_qs = idx._quant_step()(idx._arrays)
    qv = np.asarray(idx._qvec)
    qs_ = np.asarray(idx._qscale)
    fqv = np.asarray(full_qv)
    fqs = np.asarray(full_qs)
    for s in range(idx.n_shards):
        c = int(idx._counts[s])
        np.testing.assert_array_equal(qv[s, :c], fqv[s, :c])
        np.testing.assert_allclose(qs_[s, :c], fqs[s, :c], rtol=1e-6)


def test_sharded_exact8_shadow_reused_for_quant_traversal(corpus):
    """_ensure_quant reuses the maintained build shadow instead of a fresh
    quantize pass when it covers every live row."""
    pts, qs = corpus
    idx = ShardedHnswIndex(_cfg(), build_candidates="exact8",
                           quantized_traversal=True)
    idx.build(pts, np.arange(len(pts)))
    aux = idx._ensure_quant()
    assert aux[0] is idx._qvec and aux[1] is idx._qscale
    assert _recall(idx, qs) >= 0.9


def test_sharded_exact8_mode_transition_drops_stale_shadow(corpus):
    """Crossing into the beam regime (which does not stage the shadow)
    invalidates it; the next exact8 slab resyncs with a full pass."""
    pts, _ = corpus
    idx = ShardedHnswIndex(_cfg(), build_candidates="auto")
    idx.exact_build_threshold = 0     # straight to exact8
    idx.add(pts[:512], np.arange(512))
    assert idx._qvec is not None
    idx.exact8_build_threshold = 1    # now beam
    idx.add(pts[512:768], np.arange(512, 768))
    assert idx._qvec is None          # stale shadow dropped
    idx.exact8_build_threshold = None  # back to exact8 (forces resync)
    idx.add(pts[768:1024], np.arange(768, 1024))
    assert idx._qvec is not None
    assert np.array_equal(idx._qvec_counts, idx._counts)
    idx.check_integrity()


def test_sharded_exact8_wal_replay(tmp_path, corpus):
    """WAL replay re-runs adds through the exact8 path; the recovered index
    serves identically (reference discipline: per-insert durability for all
    writers, embedding.c:651-686)."""
    pts, qs = corpus
    snap = str(tmp_path / "e8.npz")
    wal = str(tmp_path / "e8.wal")
    idx = ShardedHnswIndex(_cfg(), build_candidates="exact8")
    idx.enable_wal(wal)
    idx.add(pts[:1024], np.arange(1024))
    idx.save(snap)
    idx.add(pts[1024:1280], np.arange(1024, 1280))  # in WAL, not snapshot
    d0, l0, v0 = idx.search(qs, 10, mode="graph")
    rec = ShardedHnswIndex.load(snap, wal=wal)
    assert rec.n_nodes == 1280
    d1, l1, v1 = rec.search(qs, 10, mode="graph")
    np.testing.assert_array_equal(l0, l1)
    np.testing.assert_allclose(d0, d1, rtol=1e-5)
