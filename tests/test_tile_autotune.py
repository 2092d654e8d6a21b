"""Exact-kernel tile autotune plumbing (ops/pallas_bruteforce.py,
ROADMAP #2).  The measurement itself needs a real TPU (autotune_tiles
refuses to time interpret mode); what is pinned here: the cache file
round-trip, the key scheme (k AND corpus-rows buckets), the k-guard that
keeps cached tiles from being used past the k they were proven to compile
at, the nearest-rows-bucket fallback, and the first-serve auto-probe
guards."""

import json
import os

import pytest

import pg_embedding_tpu.ops.pallas_bruteforce as pbf
from pg_embedding_tpu import Metric


@pytest.fixture
def tune_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("PG_EMB_TUNE_DIR", str(tmp_path))
    # isolate from the SHIPPED factory calibration (a real file since r4)
    monkeypatch.setattr(pbf, "_FACTORY_TILES_PATH",
                        str(tmp_path / "no_factory.json"))
    pbf._TILE_CACHE = None          # drop any loaded cache
    yield tmp_path
    pbf._TILE_CACHE = None


def test_cache_roundtrip(tune_dir):
    cache = pbf._tile_cache()
    assert cache == {}
    key = pbf._tile_key(Metric.L2, 128, 20, 100_000)
    cache[key] = [1024, 1536, 20]
    p = pbf._tile_cache_path()
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        json.dump(cache, f)
    pbf._TILE_CACHE = None
    assert pbf._tile_cache()[key] == [1024, 1536, 20]


def test_key_buckets_k_and_rows():
    # k buckets to powers of two so nearby k values share entries
    assert pbf._tile_key(Metric.L2, 128, 17, 1000) == \
        pbf._tile_key(Metric.L2, 128, 32, 1000)
    assert pbf._tile_key(Metric.L2, 128, 16, 1000) != \
        pbf._tile_key(Metric.L2, 128, 17, 1000)
    assert pbf._tile_key(Metric.L2, 128, 20, 1000) != \
        pbf._tile_key(Metric.COSINE, 128, 20, 1000)
    assert pbf._tile_key(Metric.L2, 128, 20, 1000) != \
        pbf._tile_key(Metric.L2, 256, 20, 1000)
    # corpus rows bucket likewise: 100k and 131072 share, 100k/1M differ
    assert pbf._tile_key(Metric.L2, 128, 20, 100_000) == \
        pbf._tile_key(Metric.L2, 128, 20, 131_072)
    assert pbf._tile_key(Metric.L2, 128, 20, 100_000) != \
        pbf._tile_key(Metric.L2, 128, 20, 1_000_000)


def test_lookup_exact_then_nearest_bucket(tune_dir):
    cache = pbf._tile_cache()
    k131 = pbf._tile_key(Metric.L2, 128, 12, 131_072)
    k1m = pbf._tile_key(Metric.L2, 128, 12, 1_000_000)
    cache[k131] = [1024, 1536, 12]
    cache[k1m] = [256, 512, 12]
    # exact bucket wins
    assert pbf._lookup_tiles(Metric.L2, 128, 12, 120_000) == [1024, 1536, 12]
    assert pbf._lookup_tiles(Metric.L2, 128, 12, 900_000) == [256, 512, 12]
    # uncovered bucket: nearest in log2 distance serves
    assert pbf._lookup_tiles(Metric.L2, 128, 12, 300_000) == [1024, 1536, 12]
    assert pbf._lookup_tiles(Metric.L2, 128, 12, 8_000_000) == [256, 512, 12]
    # k-guard applies to fallback entries too
    assert pbf._lookup_tiles(Metric.L2, 128, 20, 300_000) is None
    # other metric/dims never match
    assert pbf._lookup_tiles(Metric.COSINE, 128, 12, 131_072) is None
    assert pbf._lookup_tiles(Metric.L2, 256, 12, 131_072) is None


def test_autotune_refuses_off_tpu(tune_dir):
    with pytest.raises(RuntimeError):
        pbf.autotune_tiles(64, Metric.L2, n=4096, batch=64)
    with pytest.raises(ValueError):
        pbf.autotune_tiles(64, Metric.MANHATTAN)


def test_factory_fallback_and_user_cache_precedence(tune_dir, tmp_path,
                                                    monkeypatch):
    """The committed factory calibration backs a missing user cache, and a
    local autotune (user cache) always wins over the factory entry."""
    fkey = pbf._tile_key(Metric.L2, 128, 20, 131_072)
    okey = pbf._tile_key(Metric.COSINE, 256, 10, 131_072)
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
    a (faked) TPU backend it runs the quick autotune exactly once at the
    capped corpus size and returns the measured entry."""
    import jax
    import numpy as np

    qs = np.zeros((4, 128), np.float32)
    monkeypatch.setattr(pbf, "_PROBE_ATTEMPTED", set())

    # flag off
    monkeypatch.setenv("PG_EMB_AUTO_PROBE", "0")
    assert pbf._probe_uncovered(Metric.L2, 128, 12, 128, 10,
                                100_000, qs, qs) is None
    monkeypatch.delenv("PG_EMB_AUTO_PROBE")

    # traced operands never probe (checked before the backend)
    def traced(x):
        assert pbf._probe_uncovered(Metric.L2, 128, 12, 128, 10,
                                    100_000, x, x) is None
        return x
    jax.jit(traced)(np.zeros(4, np.float32))
    assert not pbf._PROBE_ATTEMPTED

    # off-TPU (the test backend is CPU): no probe, no attempt recorded
    assert pbf._probe_uncovered(Metric.L2, 128, 12, 128, 10,
                                100_000, qs, qs) is None
    assert not pbf._PROBE_ATTEMPTED

    # fake TPU backend + stub tuner: probes once at min(n, 256k), the
    # probed entry serves the original corpus size via nearest-bucket
    calls = []

    def stub_tune(dims, metric, k, n, quick):
        calls.append((dims, metric, k, n, quick))
        pbf._tile_cache()[pbf._tile_key(metric, 128, 12, n)] = [512, 1024, 12]

    monkeypatch.setattr(pbf.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(pbf, "autotune_tiles", stub_tune)
    assert pbf._probe_uncovered(Metric.L2, 128, 12, 128, 10,
                                1_000_000, qs, qs) == [512, 1024, 12]
    assert calls == [(128, Metric.L2, 10, 262_144, True)]
    # second call: already attempted, no re-probe
    assert pbf._probe_uncovered(Metric.L2, 128, 12, 128, 10,
                                1_000_000, qs, qs) is None
    assert len(calls) == 1


def test_quick_mode_off_tpu_still_refuses(tune_dir):
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
