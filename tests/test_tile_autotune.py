"""Exact-kernel tile autotune plumbing (ops/pallas_bruteforce.py,
ROADMAP #2).  The measurement itself needs a real TPU (autotune_tiles
refuses to time interpret mode); what is pinned here: the cache file
round-trip, the key scheme, and the k-guard that keeps cached tiles from
being used past the k they were proven to compile at."""

import json
import os

import pytest

import pg_embedding_tpu.ops.pallas_bruteforce as pbf
from pg_embedding_tpu import Metric


@pytest.fixture
def tune_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("PG_EMB_TUNE_DIR", str(tmp_path))
    pbf._TILE_CACHE = None          # drop any loaded cache
    yield tmp_path
    pbf._TILE_CACHE = None


def test_cache_roundtrip(tune_dir):
    cache = pbf._tile_cache()
    assert cache == {}
    key = pbf._tile_key(Metric.L2, 128, 20)
    cache[key] = [1024, 1536, 20]
    p = pbf._tile_cache_path()
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        json.dump(cache, f)
    pbf._TILE_CACHE = None
    assert pbf._tile_cache()[key] == [1024, 1536, 20]


def test_key_buckets_k():
    # k buckets to powers of two so nearby k values share entries
    assert pbf._tile_key(Metric.L2, 128, 17) == \
        pbf._tile_key(Metric.L2, 128, 32)
    assert pbf._tile_key(Metric.L2, 128, 16) != \
        pbf._tile_key(Metric.L2, 128, 17)
    assert pbf._tile_key(Metric.L2, 128, 20) != \
        pbf._tile_key(Metric.COSINE, 128, 20)
    assert pbf._tile_key(Metric.L2, 128, 20) != \
        pbf._tile_key(Metric.L2, 256, 20)


def test_autotune_refuses_off_tpu(tune_dir):
    with pytest.raises(RuntimeError):
        pbf.autotune_tiles(64, Metric.L2, n=4096, batch=64)
    with pytest.raises(ValueError):
        pbf.autotune_tiles(64, Metric.MANHATTAN)


def test_factory_fallback_and_user_cache_precedence(tune_dir, tmp_path,
                                                    monkeypatch):
    """The committed factory calibration backs a missing user cache, and a
    local autotune (user cache) always wins over the factory entry."""
    fkey = pbf._tile_key(Metric.L2, 128, 20)
    okey = pbf._tile_key(Metric.COSINE, 256, 10)
    factory = tmp_path / "factory_tiles.json"
    factory.write_text(json.dumps({fkey: [512, 2048, 20],
                                   okey: [256, 1024, 10]}))
    monkeypatch.setattr(pbf, "_FACTORY_TILES_PATH", str(factory))
    pbf._TILE_CACHE = None
    # no user cache: factory entries serve
    assert pbf._tile_cache()[fkey] == [512, 2048, 20]
    assert pbf._tile_cache()[okey] == [256, 1024, 10]
    # user cache overrides the shared key, factory still fills the other
    p = pbf._tile_cache_path()
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        json.dump({fkey: [1024, 1536, 20]}, f)
    pbf._TILE_CACHE = None
    assert pbf._tile_cache()[fkey] == [1024, 1536, 20]
    assert pbf._tile_cache()[okey] == [256, 1024, 10]


def test_auto_probe_guards_and_one_shot(tune_dir, monkeypatch):
    """First-serve auto-probe (_probe_uncovered): disabled flag, off-TPU,
    traced operands, and the one-shot attempted set all short-circuit; on
    a (faked) TPU backend it runs the quick autotune exactly once and
    returns the measured entry."""
    import jax
    import numpy as np

    from pg_embedding_tpu import Metric

    qs = np.zeros((4, 128), np.float32)
    key = pbf._tile_key(Metric.L2, 128, 16)
    monkeypatch.setattr(pbf, "_PROBE_ATTEMPTED", set())

    # flag off
    monkeypatch.setenv("PG_EMB_AUTO_PROBE", "0")
    assert pbf._probe_uncovered(Metric.L2, key, 128, 10, qs, qs) is None
    monkeypatch.delenv("PG_EMB_AUTO_PROBE")

    # traced operands never probe (checked before the backend)
    def traced(x):
        assert pbf._probe_uncovered(Metric.L2, key, 128, 10, x, x) is None
        return x
    jax.jit(traced)(np.zeros(4, np.float32))
    assert key not in pbf._PROBE_ATTEMPTED

    # off-TPU (the test backend is CPU): no probe, no attempt recorded
    assert pbf._probe_uncovered(Metric.L2, key, 128, 10, qs, qs) is None
    assert key not in pbf._PROBE_ATTEMPTED

    # fake TPU backend + stub tuner: probes once, persists, then one-shot
    calls = []

    def stub_tune(dims, metric, k, quick):
        calls.append((dims, metric, k, quick))
        pbf._tile_cache()[key] = [512, 1024, 16]

    monkeypatch.setattr(pbf.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(pbf, "autotune_tiles", stub_tune)
    assert pbf._probe_uncovered(Metric.L2, key, 128, 10, qs, qs) == \
        [512, 1024, 16]
    assert calls == [(128, Metric.L2, 10, True)]
    # second call: already attempted, no re-probe
    assert pbf._probe_uncovered(Metric.L2, key, 128, 10, qs, qs) is None
    assert len(calls) == 1


def test_quick_mode_off_tpu_still_refuses(tune_dir):
    from pg_embedding_tpu import Metric

    with pytest.raises(RuntimeError):
        pbf.autotune_tiles(64, Metric.L2, n=4096, batch=64, quick=True)


def test_factory_fallback_exact8_chunk(tune_dir, tmp_path, monkeypatch):
    """Same precedence for the build-side exact8 chunk cache."""
    import pg_embedding_tpu.api as api

    key = api._exact8_chunk_key(128, 500_224)
    factory = tmp_path / "factory_chunk.json"
    factory.write_text(json.dumps({key: [524_288, 500_000]}))
    monkeypatch.setattr(api, "_FACTORY_CHUNK_PATH", str(factory))
    api._EXACT8_CHUNK_CACHE = None
    assert api._exact8_chunk_cache()[key] == [524_288, 500_000]
    # user cache wins
    with open(api._exact8_chunk_cache_path(), "w") as f:
        json.dump({key: [1_048_576, 500_000]}, f)
    api._EXACT8_CHUNK_CACHE = None
    assert api._exact8_chunk_cache()[key] == [1_048_576, 500_000]
    api._EXACT8_CHUNK_CACHE = None
