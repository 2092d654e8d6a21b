"""Product-quantized packed traversal (ROADMAP r3 #4): per-group codebook
training, chunked encode, register-level decode (the TPU-native ADC), and
the pq packed-record serving mode on both index tiers.  PQ records are
D/G-fold smaller than int8 records — the only packed form that fits past
~2M rows @128d/chip — and the exact rerank keeps returned distances at
reference precision (distfunc.c forms)."""

import numpy as np
import pytest
import jax.numpy as jnp

from pg_embedding_tpu import HnswConfig, HnswIndex, ShardedHnswIndex
from pg_embedding_tpu.ops.pq import (encode_block, pq_decode, pq_encode,
                                     train_pq)


@pytest.fixture(scope="module")
def corpus(rng):
    pts = rng.normal(size=(3000, 32)).astype(np.float32)
    qs = pts[rng.integers(0, 3000, 16)] + \
        rng.normal(scale=0.05, size=(16, 32)).astype(np.float32)
    return pts, qs.astype(np.float32)


def _cfg(**kw):
    kw.setdefault("dims", 32)
    kw.setdefault("m", 8)
    kw.setdefault("ef_construction", 32)
    kw.setdefault("ef_search", 32)
    return HnswConfig(**kw)


def _recall(idx, qs, k=10):
    d, l, v = idx.search(qs, k, mode="graph")
    _, le, ve = idx.exact_search(qs, k)
    return np.mean([len(set(l[i][v[i]]) & set(le[i][ve[i]])) / k
                    for i in range(len(qs))])


# --------------------------------------------------------------------- #
# ops/pq.py primitives
# --------------------------------------------------------------------- #

def test_pq_roundtrip_reconstruction(rng):
    x = rng.normal(size=(4000, 32)).astype(np.float32)
    cb = train_pq(jnp.asarray(x), groups=8, iters=10)
    assert cb.shape == (8, 256, 4)
    rec = np.asarray(pq_decode(pq_encode(jnp.asarray(x), cb), cb))
    rel = (np.mean(np.sum((rec - x) ** 2, axis=1)) /
           np.mean(np.sum(x ** 2, axis=1)))
    # iid gaussian is the WORST case for PQ; 256 centroids over 4 dims
    # still reconstruct well under ~15% relative error
    assert rel < 0.15
    # more groups => finer quantization => strictly better reconstruction
    cb16 = train_pq(jnp.asarray(x), groups=16, iters=10)
    rec16 = np.asarray(pq_decode(pq_encode(jnp.asarray(x), cb16), cb16))
    rel16 = (np.mean(np.sum((rec16 - x) ** 2, axis=1)) /
             np.mean(np.sum(x ** 2, axis=1)))
    assert rel16 < rel


def test_pq_encode_chunked_matches_block(rng):
    x = rng.normal(size=(5000, 16)).astype(np.float32)
    cb = train_pq(jnp.asarray(x[:2000]), groups=4, iters=6)
    chunked = np.asarray(pq_encode(jnp.asarray(x), cb, chunk=1024))
    block = np.asarray(encode_block(jnp.asarray(x), cb))
    np.testing.assert_array_equal(chunked, block)
    assert chunked.dtype == np.uint8


def test_pq_groups_must_divide_dims():
    with pytest.raises(ValueError):
        train_pq(jnp.zeros((10, 30)), groups=4)
    with pytest.raises(ValueError):
        HnswIndex(_cfg(dims=30), packed_traversal=True, packed_dtype="pq",
                  pq_groups=4)


def test_pq_codes_are_nearest_centroids(rng):
    """encode must pick the argmin-distance centroid (the x^2 term dropped
    from the argmin is centroid-independent)."""
    x = rng.normal(size=(200, 8)).astype(np.float32)
    cb = train_pq(jnp.asarray(x), groups=2, iters=8)
    codes = np.asarray(pq_encode(jnp.asarray(x), cb))
    cbn = np.asarray(cb)
    for g in range(2):
        sub = x[:, g * 4:(g + 1) * 4]
        d = ((sub[:, None, :] - cbn[g][None, :, :]) ** 2).sum(-1)
        np.testing.assert_array_equal(codes[:, g], d.argmin(1))


# --------------------------------------------------------------------- #
# single-chip pq packed traversal
# --------------------------------------------------------------------- #

def test_pq_packed_traversal_recall(corpus):
    pts, qs = corpus
    # approximate traversal order surfaces the true neighbors at a modestly
    # wider beam (the PQ serving discipline: ef covers the distortion, the
    # exact rerank fixes the ordering)
    idx = HnswIndex(_cfg(ef_search=64), packed_traversal=True,
                    packed_dtype="pq", pq_groups=8)
    idx.build(pts)
    assert _recall(idx, qs) >= 0.9
    # records are D/G-fold smaller than int8 records, stored FLAT
    # (uint8[cap, maxM*G]) so the TPU's 128-lane minor-dim tiling doesn't
    # pad them 8x in HBM (ops/pq.pack_pq_records)
    assert idx._pcodes.shape == (idx._graph.capacity,
                                 idx.config.max_m * 8)
    assert idx._pcodes.dtype == jnp.uint8


def test_pq_packed_agrees_with_plain(corpus):
    """The exact rerank restores full-precision ordering of surfaced
    candidates — top-k labels nearly always match the plain walk."""
    pts, qs = corpus
    plain = HnswIndex(_cfg())
    plain.build(pts)
    pq = HnswIndex(_cfg(), packed_traversal=True, packed_dtype="pq",
                   pq_groups=8)
    pq.build(pts)
    _, lp, _ = plain.search(qs, 5, mode="graph")
    _, lq, _ = pq.search(qs, 5, mode="graph")
    agree = np.mean([len(set(lp[i]) & set(lq[i])) / 5
                     for i in range(len(qs))])
    assert agree >= 0.85


def test_pq_records_invalidated_by_insert_codebook_kept(corpus):
    pts, qs = corpus
    idx = HnswIndex(_cfg(ef_search=64), packed_traversal=True,
                    packed_dtype="pq", pq_groups=8)
    idx.build(pts[:2000])
    assert _recall(idx, qs) >= 0.8
    cb = idx._pq_codebook
    assert cb is not None
    idx.add(pts[2000:])
    assert idx._pcodes is None          # records stale after insert
    assert idx._pq_codebook is cb       # dictionary survives growth
    assert _recall(idx, qs) >= 0.9


def test_pq_codebook_reset_on_build(corpus):
    pts, _ = corpus
    idx = HnswIndex(_cfg(), packed_traversal=True, packed_dtype="pq",
                    pq_groups=8)
    idx.build(pts[:1000])
    idx.search(pts[:4], 5, mode="graph")
    assert idx._pq_codebook is not None
    idx2 = idx.compact()
    assert idx2.packed_dtype == "pq" and idx2.pq_groups == 8


# --------------------------------------------------------------------- #
# sharded pq packed traversal
# --------------------------------------------------------------------- #

def test_sharded_pq_packed_traversal(corpus):
    pts, qs = corpus
    idx = ShardedHnswIndex(_cfg(), packed_traversal=True,
                           packed_dtype="pq", pq_groups=8)
    idx.build(pts, np.arange(len(pts)))
    assert idx._traversal_variant() == "pq"
    assert _recall(idx, qs) >= 0.9
    pcodes, cb, rot = idx._ensure_packed()
    assert pcodes.shape[0] == idx.n_shards
    assert pcodes.shape[-1] == idx.config.max_m * 8   # flat records
    # one GLOBAL codebook, replicated — not per-shard; identity rotation
    # when OPQ is off
    assert np.asarray(cb).shape == (8, 256, 4)
    np.testing.assert_array_equal(np.asarray(rot), np.eye(32))


def test_opq_improves_reconstruction_on_correlated_dims(rng):
    """OPQ's rotation redistributes correlated variance across groups —
    on anisotropic data it must beat plain PQ's reconstruction."""
    from pg_embedding_tpu.ops.pq import train_opq

    # heavily correlated dims: random low-rank mix of a few factors
    z = rng.normal(size=(4000, 6)).astype(np.float32)
    mix = rng.normal(size=(6, 32)).astype(np.float32)
    x = (z @ mix + 0.05 * rng.normal(size=(4000, 32))).astype(np.float32)
    xd = jnp.asarray(x)
    cb = train_pq(xd, groups=8, iters=10)
    rec = np.asarray(pq_decode(pq_encode(xd, cb), cb))
    err_pq = np.mean(np.sum((rec - x) ** 2, axis=1))
    rot, cb_o = train_opq(xd, groups=8, iters=6, pq_iters=10)
    rec_o = np.asarray(pq_decode(pq_encode(xd, cb_o, rot), cb_o))
    err_opq = np.mean(np.sum((rec_o @ np.asarray(rot).T - x) ** 2, axis=1))
    assert err_opq < err_pq
    # R orthogonal: R R^T = I
    r = np.asarray(rot)
    np.testing.assert_allclose(r @ r.T, np.eye(32), atol=1e-4)


def test_opq_packed_traversal_both_tiers(corpus):
    pts, qs = corpus
    idx = HnswIndex(_cfg(ef_search=64), packed_traversal=True,
                    packed_dtype="pq", pq_groups=8, pq_opq=True)
    idx.build(pts)
    assert _recall(idx, qs) >= 0.9
    assert idx._pq_rot is not None
    sh = ShardedHnswIndex(_cfg(ef_search=64), packed_traversal=True,
                          packed_dtype="pq", pq_groups=8, pq_opq=True)
    sh.build(pts, np.arange(len(pts)))
    assert _recall(sh, qs) >= 0.9
    _, _, rot = sh._ensure_packed()
    assert not np.allclose(np.asarray(rot), np.eye(32))  # a real rotation


def test_opq_rejects_manhattan():
    from pg_embedding_tpu.config import Metric

    with pytest.raises(ValueError):
        HnswIndex(_cfg(metric=Metric.MANHATTAN), packed_traversal=True,
                  packed_dtype="pq", pq_groups=8, pq_opq=True)
    with pytest.raises(ValueError):
        ShardedHnswIndex(_cfg(metric=Metric.MANHATTAN),
                         packed_traversal=True, packed_dtype="pq",
                         pq_groups=8, pq_opq=True)


def test_sharded_pq_agrees_with_plain(corpus):
    pts, qs = corpus
    plain = ShardedHnswIndex(_cfg())
    plain.build(pts, np.arange(len(pts)))
    pq = ShardedHnswIndex(_cfg(), packed_traversal=True, packed_dtype="pq",
                          pq_groups=8)
    pq.build(pts, np.arange(len(pts)))
    _, lp, _ = plain.search(qs, 5, mode="graph")
    _, lq, _ = pq.search(qs, 5, mode="graph")
    agree = np.mean([len(set(lp[i]) & set(lq[i])) / 5
                     for i in range(len(qs))])
    assert agree >= 0.85
