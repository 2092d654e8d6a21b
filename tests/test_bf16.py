"""bfloat16 storage mode: recall parity within tolerance of f32."""

import numpy as np
import pytest

from pg_embedding_tpu import HnswConfig, HnswIndex


def test_bf16_build_search_recall(rng):
    pts = rng.normal(size=(800, 32)).astype(np.float32)
    qs = rng.normal(size=(16, 32)).astype(np.float32)
    cfg = HnswConfig(dims=32, m=8, ef_construction=48, ef_search=48)

    f32 = HnswIndex(cfg)
    f32.build(pts)
    _, le, ve = f32.exact_search(qs, 10)

    bf = HnswIndex(cfg, storage_dtype="bfloat16")
    bf.build(pts)
    assert str(bf.graph.vectors.dtype) == "bfloat16"
    _, l, v = bf.search(qs, 10, mode="graph")
    rec = np.mean([len(set(l[i][v[i]]) & set(le[i][ve[i]])) / 10
                   for i in range(16)])
    assert rec >= 0.9, rec
    # exact over bf16 storage also close to f32 truth
    _, lb, vb = bf.exact_search(qs, 10)
    rec_e = np.mean([len(set(lb[i][vb[i]]) & set(le[i][ve[i]])) / 10
                     for i in range(16)])
    assert rec_e >= 0.95, rec_e


def test_bf16_save_load_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(300, 16)).astype(np.float32)
    qs = rng.normal(size=(4, 16)).astype(np.float32)
    cfg = HnswConfig(dims=16, m=6, ef_construction=24, ef_search=24)
    bf = HnswIndex(cfg, storage_dtype="bfloat16")
    bf.build(pts)
    p = str(tmp_path / "bf.npz")
    bf.save(p)
    loaded = HnswIndex.load(p)
    assert loaded.storage_dtype == "bfloat16"
    d1, l1, v1 = bf.search(qs, 5, mode="graph")
    d2, l2, v2 = loaded.search(qs, 5, mode="graph")
    np.testing.assert_array_equal(l1, l2)


def test_bad_storage_dtype():
    with pytest.raises(ValueError):
        HnswIndex(HnswConfig(dims=4), storage_dtype="fp8")


def test_pack_records_cast_chunked_matches_oneshot(rng):
    """The chunked pack (cap > chunk, incl. the overlapping tail) is
    value-identical to the one-shot gather — added after the one-shot
    whole-capacity gather OOM'd a 16 GB chip at 1.2M x 100d (api.py
    _pack_records_cast)."""
    import jax.numpy as jnp

    cap, max_m, dims = 333, 6, 16     # 333 % 64 != 0: exercises the tail
    vectors = jnp.asarray(rng.normal(size=(cap, dims)).astype(np.float32))
    links = jnp.asarray(rng.integers(-1, cap, (cap, max_m), dtype=np.int32))
    for dt in ("bfloat16", "float32"):
        one = HnswIndex._pack_records_cast(vectors, links, dt, chunk=512)
        chunked = HnswIndex._pack_records_cast(vectors, links, dt, chunk=64)
        assert one.dtype == chunked.dtype == jnp.dtype(dt)
        assert np.array_equal(np.asarray(one, np.float32),
                              np.asarray(chunked, np.float32))
