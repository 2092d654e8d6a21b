"""Pallas fused brute-force kernel vs the jnp exact oracle (interpret mode
on CPU; the driver bench exercises the compiled TPU path)."""

import numpy as np
import pytest

from pg_embedding_tpu.config import Metric
from pg_embedding_tpu.ops.bruteforce import exact_search
from pg_embedding_tpu.ops.pallas_bruteforce import pallas_exact_search


@pytest.mark.parametrize("metric",
                         [Metric.L2, Metric.COSINE, Metric.MANHATTAN])
def test_matches_exact(rng, metric):
    pts = rng.normal(size=(777, 24)).astype(np.float32)
    qs = rng.normal(size=(9, 24)).astype(np.float32)
    d1, i1 = exact_search(qs, pts, 10, metric)
    d2, i2 = pallas_exact_search(qs, pts, 10, metric, tile_n=128)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-4,
                               atol=1e-5)


def test_deleted_and_nvalid(rng):
    pts = rng.normal(size=(300, 16)).astype(np.float32)
    qs = rng.normal(size=(4, 16)).astype(np.float32)
    _, i0 = pallas_exact_search(qs, pts, 1, Metric.L2, tile_n=128)
    top = int(np.asarray(i0)[0, 0])
    deleted = np.zeros(300, bool)
    deleted[top] = True
    _, i1 = pallas_exact_search(qs, pts, 5, Metric.L2, deleted=deleted,
                                tile_n=128)
    assert top not in np.asarray(i1)[0]
    d2, i2 = pallas_exact_search(qs, pts, 5, Metric.L2, n_valid=100,
                                 tile_n=128)
    d3, i3 = exact_search(qs, pts, 5, Metric.L2, n_valid=100)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i3))


def test_k_exceeds_n(rng):
    pts = rng.normal(size=(6, 8)).astype(np.float32)
    qs = rng.normal(size=(2, 8)).astype(np.float32)
    d, i = pallas_exact_search(qs, pts, 10, Metric.L2, tile_n=128)
    i = np.asarray(i)
    assert (i[:, 6:] == -1).all()
    assert (i[:, :6] >= 0).all()


def test_bf16_points(rng):
    import jax.numpy as jnp

    pts = rng.normal(size=(500, 16)).astype(np.float32)
    qs = rng.normal(size=(4, 16)).astype(np.float32)
    d1, i1 = pallas_exact_search(qs, jnp.asarray(pts, jnp.bfloat16), 10,
                                 Metric.L2, tile_n=128)
    _, i2 = exact_search(qs, pts, 10, Metric.L2)
    # bf16 rounding may flip near-ties; overlap must stay high
    i1, i2 = np.asarray(i1), np.asarray(i2)
    overlap = np.mean([len(set(i1[r]) & set(i2[r])) / 10 for r in range(4)])
    assert overlap >= 0.9


def test_manhattan_wide_and_masked(rng):
    """Manhattan on the fast path (VERDICT r1 item 9): VPU |a-b|
    accumulation branch, including D-tiling and tombstones."""
    pts = rng.normal(size=(400, 300)).astype(np.float32)
    qs = rng.normal(size=(4, 300)).astype(np.float32)
    deleted = np.zeros(400, bool)
    deleted[rng.integers(0, 400, 30)] = True
    d1, i1 = exact_search(qs, pts, 7, Metric.MANHATTAN, deleted=deleted)
    d2, i2 = pallas_exact_search(qs, pts, 7, Metric.MANHATTAN, tile_n=128,
                                 tile_q=8, deleted=deleted)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-4,
                               atol=1e-4)


def test_wide_dims_d_tiling(rng):
    """GIST-like wide vectors (> 256-d) run through the D-tiled grid path."""
    pts = rng.normal(size=(600, 960)).astype(np.float32)
    qs = rng.normal(size=(8, 960)).astype(np.float32)
    d1, i1 = exact_search(qs, pts, 10, Metric.L2)
    d2, i2 = pallas_exact_search(qs, pts, 10, Metric.L2, tile_n=128,
                                 tile_q=8)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-4,
                               atol=1e-4)


def test_nonmultiple_dims_padding(rng):
    """D not a multiple of 128 pads with zeros (no effect on distances)."""
    pts = rng.normal(size=(300, 100)).astype(np.float32)
    qs = rng.normal(size=(4, 100)).astype(np.float32)
    d1, i1 = exact_search(qs, pts, 5, Metric.COSINE)
    d2, i2 = pallas_exact_search(qs, pts, 5, Metric.COSINE, tile_n=128,
                                 tile_q=8)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
