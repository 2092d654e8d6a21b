"""downcast_corpus: the post-build serving-footprint transition.

The case it exists for (PQ G=32 at 10M x 128d: records + f32 corpus
exceed HBM; a bf16 corpus serves the same records in half the bytes —
api.HnswIndex.downcast_corpus) is exercised at bench scale by
benchmarks/bench_10m.py B10M_PQ=1; these tests pin the semantics at
suite scale on both tiers: construction and PQ code assignments come
from full-precision rows, derived shadows survive the cast, searches
keep working, the transition is one-way, and save/load round-trips the
narrowed dtype (reference analog: metadata derivation discipline,
embedding.c:58-64)."""

import numpy as np
import pytest

from pg_embedding_tpu import HnswConfig, HnswIndex, ShardedHnswIndex


def _corpus(rng, n=2_000, d=32, nq=16):
    centers = rng.normal(scale=4.0, size=(50, d)).astype(np.float32)
    pts = (centers[rng.integers(0, 50, n)] +
           rng.normal(size=(n, d))).astype(np.float32)
    qs = (centers[rng.integers(0, 50, nq)] +
          rng.normal(size=(nq, d))).astype(np.float32)
    return pts, qs


def _recall(l, v, le, ve, k=10):
    return float(np.mean([
        len(set(l[i][v[i]].tolist()) & set(le[i][ve[i]].tolist())) / k
        for i in range(l.shape[0])]))


def test_downcast_graph_search_stays_close(rng):
    pts, qs = _corpus(rng)
    cfg = HnswConfig(dims=32, m=8, ef_construction=48, ef_search=48)
    idx = HnswIndex(cfg)
    idx.build(pts)
    _, le, ve = idx.exact_search(qs, 10)          # f32 oracle pre-cast
    _, l0, v0 = idx.search(qs, 10, mode="graph")
    idx.downcast_corpus("bfloat16")
    assert str(idx.graph.vectors.dtype) == "bfloat16"
    assert idx.storage_dtype == "bfloat16"
    _, l1, v1 = idx.search(qs, 10, mode="graph")
    # topology is unchanged (built in f32); only row reads are rounded
    assert _recall(l1, v1, le, ve) >= _recall(l0, v0, le, ve) - 0.05


def test_downcast_keeps_pq_shadows_and_serves(rng):
    pts, qs = _corpus(rng)
    cfg = HnswConfig(dims=32, m=8, ef_construction=48, ef_search=48)
    idx = HnswIndex(cfg, packed_traversal=True, packed_dtype="pq",
                    pq_groups=8)
    idx.build(pts)
    _, le, ve = idx.exact_search(qs, 10)
    pc, _ = idx._ensure_packed()                  # encoded from f32 rows
    idx.downcast_corpus("bfloat16")
    # shadows survive the cast (they carry f32-derived assignments)
    assert idx._pcodes is pc
    _, l, v = idx.search(qs, 10, mode="graph")
    assert _recall(l, v, le, ve) >= 0.8


def test_downcast_one_way_and_validated(rng):
    pts, _ = _corpus(rng, n=300)
    cfg = HnswConfig(dims=32, m=6, ef_construction=24, ef_search=24)
    idx = HnswIndex(cfg)
    idx.build(pts)
    idx.downcast_corpus("bfloat16")
    idx.downcast_corpus("bfloat16")               # idempotent no-op
    with pytest.raises(ValueError, match="cannot widen"):
        idx.downcast_corpus("float32")
    with pytest.raises(ValueError, match="unknown downcast"):
        idx.downcast_corpus("int8")


def test_downcast_insert_and_exact_keep_working(rng):
    pts, qs = _corpus(rng, n=600)
    cfg = HnswConfig(dims=32, m=6, ef_construction=24, ef_search=24)
    idx = HnswIndex(cfg)
    idx.build(pts[:500])
    idx.downcast_corpus("bfloat16")
    idx.add(pts[500:])                            # casts to storage dtype
    assert idx.n_nodes == 600
    d, l, v = idx.exact_search(qs, 5)
    assert v.all()


def test_downcast_save_load_roundtrip(tmp_path, rng):
    pts, qs = _corpus(rng, n=400)
    cfg = HnswConfig(dims=32, m=6, ef_construction=24, ef_search=24)
    idx = HnswIndex(cfg)
    idx.build(pts)
    idx.downcast_corpus("bfloat16")
    p = str(tmp_path / "dc.npz")
    idx.save(p)
    back = HnswIndex.load(p)
    assert back.storage_dtype == "bfloat16"
    d1, l1, v1 = idx.search(qs, 5, mode="graph")
    d2, l2, v2 = back.search(qs, 5, mode="graph")
    np.testing.assert_array_equal(l1, l2)


def test_downcast_sharded_tier(rng):
    pts, qs = _corpus(rng)
    cfg = HnswConfig(dims=32, m=8, ef_construction=48, ef_search=48)
    idx = ShardedHnswIndex(cfg)
    idx.build(pts, np.arange(len(pts)))
    _, le, ve = idx.exact_search(qs, 10)
    _, l0, v0 = idx.search(qs, 10)
    idx.downcast_corpus("bfloat16")
    assert str(idx._arrays[0].dtype) == "bfloat16"
    with pytest.raises(ValueError, match="cannot widen"):
        idx.downcast_corpus("float32")
    _, l1, v1 = idx.search(qs, 10)
    assert _recall(l1, v1, le, ve) >= _recall(l0, v0, le, ve) - 0.05
