"""Round-3 sharded capability parity (VERDICT r2 item 2): slab inserts
(one dispatch per multi-batch slab), exact-sweep construction candidates,
and int8 quantized traversal on the sharded tier."""

import numpy as np
import pytest

from pg_embedding_tpu import HnswConfig, ShardedHnswIndex


@pytest.fixture(scope="module")
def corpus(rng):
    pts = rng.normal(size=(1500, 16)).astype(np.float32)
    # clustered queries near corpus points
    qs = pts[rng.integers(0, 1500, 8)] + \
        rng.normal(scale=0.05, size=(8, 16)).astype(np.float32)
    return pts, qs.astype(np.float32)


def _cfg(**kw):
    kw.setdefault("dims", 16)
    kw.setdefault("m", 8)
    kw.setdefault("ef_construction", 32)
    kw.setdefault("ef_search", 32)
    return HnswConfig(**kw)


def _recall(idx, qs, k=10, **search_kw):
    d, l, v = idx.search(qs, k, mode="graph", **search_kw)
    _, le, ve = idx.exact_search(qs, k)
    return np.mean([len(set(l[i][v[i]]) & set(le[i][ve[i]])) / k
                    for i in range(len(qs))])


def test_sharded_add_is_slabbed(corpus, monkeypatch):
    """The whole bulk add must go through ONE slab dispatch per grain —
    not one dispatch per batch (the round-1 dispatch wall; dispatch-count
    parity with api.HnswIndex.add)."""
    pts, qs = corpus
    idx = ShardedHnswIndex(_cfg(), max_insert_batch=128)
    calls = []
    orig = ShardedHnswIndex._slab_step
    orig8 = ShardedHnswIndex._slab_step8

    def spy(self, batch, n_batches, candidates, cand_cap):
        fn = orig(self, batch, n_batches, candidates, cand_cap)

        def counted(*a):
            calls.append((batch, n_batches))
            return fn(*a)
        return counted

    def spy8(self, batch, n_batches, cand_cap):
        fn = orig8(self, batch, n_batches, cand_cap)

        def counted(*a):
            calls.append((batch, n_batches))
            return fn(*a)
        return counted

    # the measured default routes through the exact8 slab program; count
    # dispatches from EITHER slab factory so the bound is mode-agnostic
    monkeypatch.setattr(ShardedHnswIndex, "_slab_step", spy)
    monkeypatch.setattr(ShardedHnswIndex, "_slab_step8", spy8)
    idx.build(pts, np.arange(len(pts)))
    # 1500 rows over 8 shards = 188 rows/shard = 2 batches of 128 ->
    # ONE small-grain slab dispatch covers them (16 batches/slab)
    assert len(calls) == 1
    assert idx.n_nodes == len(pts)
    idx.check_integrity()
    assert _recall(idx, qs) >= 0.9


def test_sharded_exact_candidates_quality(corpus):
    pts, qs = corpus
    beam = ShardedHnswIndex(_cfg(), build_candidates="beam")
    beam.build(pts, np.arange(len(pts)))
    exact = ShardedHnswIndex(_cfg(), build_candidates="exact")
    exact.build(pts, np.arange(len(pts)))
    exact.check_integrity()
    r_beam = _recall(beam, qs)
    r_exact = _recall(exact, qs)
    # exact candidate sets are supersets-in-quality; allow tiny noise
    assert r_exact >= r_beam - 0.02
    assert r_exact >= 0.9


def test_sharded_auto_candidates_threshold(corpus, monkeypatch):
    """auto resolves to exact below the per-shard threshold, exact8 up to
    exact8_build_threshold, and beam above that (api._candidate_mode
    semantics on the sharded tier)."""
    pts, _ = corpus
    idx = ShardedHnswIndex(_cfg(), build_candidates="auto")
    modes = []
    orig = ShardedHnswIndex._slab_step

    def spy(self, batch, n_batches, candidates, cand_cap):
        modes.append(candidates)
        return orig(self, batch, n_batches, candidates, cand_cap)

    orig8 = ShardedHnswIndex._slab_step8

    def spy8(self, batch, n_batches, cand_cap):
        modes.append("exact8")
        return orig8(self, batch, n_batches, cand_cap)

    monkeypatch.setattr(ShardedHnswIndex, "_slab_step", spy)
    monkeypatch.setattr(ShardedHnswIndex, "_slab_step8", spy8)
    idx.add(pts[:400], np.arange(400))
    assert set(modes) == {"exact8"}         # measured default: exact8 @ row 0
    modes.clear()
    idx.exact_build_threshold = 600_000     # opt back into the f32 band
    idx.add(pts[400:800], np.arange(400, 800))
    assert set(modes) == {"exact"}
    modes.clear()
    idx.exact_build_threshold = 10          # force the exact8 regime
    idx.exact8_build_threshold = None
    idx.add(pts[800:1200], np.arange(800, 1200))
    assert set(modes) == {"exact8"}
    modes.clear()
    idx.exact8_build_threshold = 20         # force the beam regime
    idx.add(pts[1200:1500], np.arange(1200, 1500))
    assert set(modes) == {"beam"}
    idx.check_integrity()


def test_sharded_quantized_traversal(corpus):
    pts, qs = corpus
    idx = ShardedHnswIndex(_cfg(), quantized_traversal=True)
    idx.build(pts, np.arange(len(pts)))
    assert idx._traversal_variant() == "quant"
    r = _recall(idx, qs)
    assert r >= 0.9
    # the quant shadow is invalidated by further inserts and rebuilt
    idx.add(pts[:10], np.arange(2000, 2010))
    assert idx._quant is None
    assert _recall(idx, qs) >= 0.9


def test_sharded_quantized_vs_plain_results(corpus):
    """Quantized traversal reranks exactly — top-k labels should nearly
    always match the plain walk on well-separated queries."""
    pts, qs = corpus
    plain = ShardedHnswIndex(_cfg())
    plain.build(pts, np.arange(len(pts)))
    quant = ShardedHnswIndex(_cfg(), quantized_traversal=True)
    quant.build(pts, np.arange(len(pts)))
    dp, lp, vp = plain.search(qs, 5, mode="graph")
    dq, lq, vq = quant.search(qs, 5, mode="graph")
    agree = np.mean([len(set(lp[i]) & set(lq[i])) / 5
                     for i in range(len(qs))])
    assert agree >= 0.85
