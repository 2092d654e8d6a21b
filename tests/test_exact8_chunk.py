"""exact8 sweep-chunk tuning knob (ROADMAP r3 #1): the coarse sweep's
chunk width is a static perf parameter threaded from the index into the
slab programs, resolvable from a persistent measured cache
(tune_exact8_chunk).  These CPU-mesh tests pin the plumbing — the knob
reaches the kernel, resolution order is explicit > cache > default, and
quality is chunk-independent; the timing half needs the real device."""

import json
import os

import numpy as np
import pytest

import pg_embedding_tpu.api as api_mod
from pg_embedding_tpu import HnswConfig, HnswIndex
from pg_embedding_tpu.parallel.sharded import ShardedHnswIndex


def _cfg(**kw):
    kw.setdefault("dims", 24)
    kw.setdefault("m", 8)
    kw.setdefault("ef_construction", 32)
    kw.setdefault("ef_search", 32)
    return HnswConfig(**kw)


def _recall(idx, qs, k=10):
    d, l, v = idx.search(qs, k, mode="graph")
    _, le, ve = idx.exact_search(qs, k)
    return np.mean([len(set(l[i][v[i]]) & set(le[i][ve[i]])) / k
                    for i in range(len(qs))])


@pytest.fixture()
def corpus(rng):
    pts = rng.normal(size=(900, 24)).astype(np.float32)
    qs = (pts[rng.integers(0, 900, 8)] +
          rng.normal(scale=0.05, size=(8, 24))).astype(np.float32)
    return pts, qs


@pytest.fixture(autouse=True)
def _isolated_cache(tmp_path, monkeypatch):
    """Point the persistent tune cache at a temp dir and reset the
    module-level memo so tests never read the developer's real cache."""
    monkeypatch.setenv("PG_EMB_TUNE_DIR", str(tmp_path))
    api_mod._EXACT8_CHUNK_CACHE = None
    yield
    api_mod._EXACT8_CHUNK_CACHE = None


def test_custom_chunk_builds_equivalent_quality(corpus):
    pts, qs = corpus
    base = HnswIndex(_cfg(), build_candidates="exact8")
    base.build(pts, np.arange(len(pts)))
    small = HnswIndex(_cfg(), build_candidates="exact8")
    small.exact8_chunk = 256          # forces many chunks + running merge
    small.build(pts, np.arange(len(pts)))
    r_base, r_small = _recall(base, qs), _recall(small, qs)
    assert r_small >= r_base - 0.05
    assert r_small >= 0.9


def test_resolution_order_explicit_then_cache_then_default():
    idx = HnswIndex(_cfg())
    assert idx._resolve_exact8_chunk() == 1_048_576       # default
    # a persisted cache entry for (dims, capacity bucket) wins over it
    key = api_mod._exact8_chunk_key(24, idx._graph.capacity)
    cache = {key: [262_144, 123]}
    api_mod._save_exact8_chunk_cache(cache)
    api_mod._EXACT8_CHUNK_CACHE = None                    # drop the memo
    assert idx._resolve_exact8_chunk() == 262_144
    # a tune at a very different scale does NOT leak to this build
    api_mod._save_exact8_chunk_cache(
        {api_mod._exact8_chunk_key(24, 16_000_000): [131_072, 123]})
    api_mod._EXACT8_CHUNK_CACHE = None
    assert idx._resolve_exact8_chunk() == 1_048_576       # bucket miss
    api_mod._save_exact8_chunk_cache(cache)
    api_mod._EXACT8_CHUNK_CACHE = None
    # an explicit setting wins over the cache
    idx.exact8_chunk = 4096
    assert idx._resolve_exact8_chunk() == 4096
    # the cache file round-trips through the atomic writer
    with open(api_mod._exact8_chunk_cache_path()) as f:
        assert json.load(f) == cache
    assert os.environ["PG_EMB_TUNE_DIR"] in \
        api_mod._exact8_chunk_cache_path()


def test_sharded_resolves_from_the_same_cache(corpus):
    pts, qs = corpus
    sh = ShardedHnswIndex(_cfg(), build_candidates="exact8")
    cache = {api_mod._exact8_chunk_key(24, sh.capacity_per_shard):
             [512, 123]}
    api_mod._save_exact8_chunk_cache(cache)
    api_mod._EXACT8_CHUNK_CACHE = None
    assert sh._resolve_exact8_chunk() == 512
    sh.build(pts, np.arange(len(pts)))                    # compiles with it
    d, l, v = sh.search(qs, 10)
    _, le, ve = sh.exact_search(qs, 10)
    r = np.mean([len(set(l[i][v[i]]) & set(le[i][ve[i]])) / 10
                 for i in range(len(qs))])
    assert r >= 0.9
    sh.exact8_chunk = 1024
    assert sh._resolve_exact8_chunk() == 1024


def test_tuner_requires_tpu_backend(corpus):
    pts, _ = corpus
    idx = HnswIndex(_cfg(), build_candidates="exact8")
    idx.build(pts, np.arange(len(pts)))
    with pytest.raises(RuntimeError, match="TPU"):
        idx.tune_exact8_chunk()


def test_tuner_requires_rows():
    idx = HnswIndex(_cfg())
    with pytest.raises(RuntimeError):
        idx.tune_exact8_chunk()
