"""Dataset IO round-trips and graph integrity checking."""

import numpy as np
import pytest

from pg_embedding_tpu import HnswConfig, HnswIndex
from pg_embedding_tpu.utils.io import (read_vecs, synthetic_clustered,
                                       write_vecs)


@pytest.mark.parametrize("ext,dtype", [(".fvecs", np.float32),
                                       (".ivecs", np.int32),
                                       (".bvecs", np.uint8)])
def test_vecs_roundtrip(tmp_path, rng, ext, dtype):
    if dtype is np.uint8:
        data = rng.integers(0, 255, size=(37, 12)).astype(dtype)
    elif dtype is np.int32:
        data = rng.integers(-1000, 1000, size=(37, 12)).astype(dtype)
    else:
        data = rng.normal(size=(37, 12)).astype(dtype)
    p = str(tmp_path / f"v{ext}")
    write_vecs(p, data)
    back = read_vecs(p)
    np.testing.assert_array_equal(back, data)
    # bounded reads
    np.testing.assert_array_equal(read_vecs(p, count=5), data[:5])
    np.testing.assert_array_equal(read_vecs(p, count=5, offset=30),
                                  data[30:35])


def test_vecs_corrupt(tmp_path):
    p = str(tmp_path / "bad.fvecs")
    with open(p, "wb") as f:
        f.write(np.array([3], np.int32).tobytes())
        f.write(np.zeros(2, np.float32).tobytes())  # truncated record
    with pytest.raises(ValueError):
        read_vecs(p)


def test_synthetic_reproducible():
    a, qa = synthetic_clustered(100, 8, n_centers=10, seed=3, n_queries=5)
    b, qb = synthetic_clustered(100, 8, n_centers=10, seed=3, n_queries=5)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(qa, qb)
    c = synthetic_clustered(100, 8, n_centers=10, seed=4)
    assert not np.array_equal(a, c)


def test_check_integrity_clean(rng):
    pts = rng.normal(size=(200, 8)).astype(np.float32)
    idx = HnswIndex(HnswConfig(dims=8, m=4, ef_construction=16,
                               ef_search=16))
    idx.build(pts)
    viol = idx.check_integrity()
    assert all(v == 0 for v in viol.values())


def test_check_integrity_detects_corruption(rng):
    import jax.numpy as jnp

    pts = rng.normal(size=(50, 8)).astype(np.float32)
    idx = HnswIndex(HnswConfig(dims=8, m=4, ef_construction=16,
                               ef_search=16))
    idx.build(pts)
    g = idx.graph
    # inject a self-link at node 5, slot 0
    idx._graph = g._replace(links=g.links.at[5, 0].set(5))
    with pytest.raises(AssertionError):
        idx.check_integrity()
    viol = idx.check_integrity(raise_on_error=False)
    assert viol["self_links"] >= 1
