"""Hierarchical multi-slice (DCN) merge tests on the 8-device CPU mesh.

``dcn_slices`` tells the sharded index its mesh spans multiple ICI slices
(devices slice-major); merges then run hierarchically — within-slice
gather + top-k reduce over ICI via ``axis_index_groups``, with only the
reduced [B, k] sets crossing the slow DCN links (parallel/sharded.py
``_gather_merge``).  The hierarchy is a pure communication-layout choice:
results must be IDENTICAL to the flat single-slice merge.  SURVEY §2/§5
"TPU-native equivalents" (ICI within a slice, DCN across); the reference
has no distributed path at all (embedding.c:982).
"""

import numpy as np
import pytest

from pg_embedding_tpu import HnswConfig, ShardedHnswIndex


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(91)
    centers = rng.normal(scale=4.0, size=(40, 16)).astype(np.float32)
    pts = (centers[rng.integers(0, 40, 900)] +
           rng.normal(size=(900, 16))).astype(np.float32)
    qs = (centers[rng.integers(0, 40, 12)] +
          rng.normal(size=(12, 16))).astype(np.float32)
    return pts, qs


def _cfg():
    return HnswConfig(dims=16, m=8, ef_construction=32, ef_search=32)


def _build(dcn_slices, **kw):
    return ShardedHnswIndex(_cfg(), dcn_slices=dcn_slices, **kw)


@pytest.mark.parametrize("slices", [2, 4, 8])
def test_hierarchical_graph_merge_identical(corpus, slices):
    """The two-stage ICI/DCN merge returns exactly the flat merge's
    results for the graph walk (same shard graphs: deterministic build)."""
    pts, qs = corpus
    flat = _build(None)
    flat.build(pts, np.arange(len(pts)))
    hier = _build(slices)
    hier.build(pts, np.arange(len(pts)))

    df, lf, vf = flat.search(qs, 10)
    dh, lh, vh = hier.search(qs, 10)
    np.testing.assert_array_equal(vf, vh)
    np.testing.assert_array_equal(lf, lh)
    np.testing.assert_allclose(df, dh, rtol=0, atol=0)


@pytest.mark.parametrize("slices", [2, 4])
def test_hierarchical_exact_and_sweep_merge_identical(corpus, slices):
    pts, qs = corpus
    flat = _build(None)
    flat.build(pts, np.arange(len(pts)))
    hier = _build(slices)
    hier.build(pts, np.arange(len(pts)))

    df, lf, vf = flat.exact_search(qs, 10)
    dh, lh, vh = hier.exact_search(qs, 10)
    np.testing.assert_array_equal(lf, lh)
    np.testing.assert_allclose(df, dh, rtol=0, atol=0)

    # compressed sweep: same global codebook on both sides so the ADC
    # pools (and hence the merged reranked sets) are comparable
    df, lf, vf = flat.search(qs, 10, mode="sweep_pq")
    hier._pq_codebook = flat._pq_codebook
    dh, lh, vh = hier.search(qs, 10, mode="sweep_pq")
    np.testing.assert_array_equal(lf, lh)
    np.testing.assert_allclose(df, dh, rtol=0, atol=0)


def test_hierarchical_merge_with_tombstones_and_widening(corpus):
    """Tombstone filtering happens on-shard before either merge stage, and
    the widening signal (pmax of per-shard found counts) survives the
    hierarchy: deleting most rows forces ef-doubling on both layouts."""
    pts, qs = corpus
    flat = _build(None)
    flat.build(pts, np.arange(len(pts)))
    hier = _build(4)
    hier.build(pts, np.arange(len(pts)))
    gone = np.arange(0, 840, dtype=np.uint64)
    flat.delete(gone)
    hier.delete(gone)

    df, lf, vf = flat.search(qs, 40)
    dh, lh, vh = hier.search(qs, 40)
    np.testing.assert_array_equal(vf, vh)
    np.testing.assert_array_equal(lf, lh)
    assert not np.isin(lh[vh], gone).any()


def test_dcn_slices_validation():
    with pytest.raises(ValueError):
        ShardedHnswIndex(_cfg(), dcn_slices=3)   # 3 does not divide 8
    with pytest.raises(ValueError):
        ShardedHnswIndex(_cfg(), dcn_slices=0)


def test_dcn_slices_load_hint(corpus, tmp_path):
    """dcn_slices is a serving-topology hint on load, not index state."""
    pts, qs = corpus
    flat = _build(None)
    flat.build(pts, np.arange(len(pts)))
    path = str(tmp_path / "s.npz")
    flat.save(path)
    hier = ShardedHnswIndex.load(path, dcn_slices=2)
    assert hier.dcn_slices == 2
    df, lf, vf = flat.search(qs, 10)
    dh, lh, vh = hier.search(qs, 10)
    np.testing.assert_array_equal(lf, lh)
