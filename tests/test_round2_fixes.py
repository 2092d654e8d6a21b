"""Round-2 regression tests: ADVICE r1 fixes.

Covers: save/load path normalization (suffix-less paths), per-shard widening
with a deliberately tiny shard, unpruned link-list tie-order parity, per-row
int8 quantization scales, and a benchmarks/run.py smoke (the sharded
streaming path regressed when the filtered-search operand was added).
"""

import json
import os
import sys

import numpy as np
import pytest

from pg_embedding_tpu import HnswConfig, HnswIndex, ShardedHnswIndex
from pg_embedding_tpu.core.refimpl import RefHnswIndex
from pg_embedding_tpu.parallel.sharded import default_mesh


@pytest.fixture(scope="module")
def small(rng):
    pts = rng.normal(size=(300, 16)).astype(np.float32)
    qs = rng.normal(size=(4, 16)).astype(np.float32)
    return pts, qs


def test_save_load_without_npz_suffix(tmp_path, small):
    pts, qs = small
    cfg = HnswConfig(dims=16, m=6, ef_construction=24, ef_search=24)
    idx = HnswIndex(cfg)
    idx.build(pts[:100], np.arange(100))
    p = str(tmp_path / "plain_name")        # no .npz suffix
    idx.save(p)
    back = HnswIndex.load(p)                # must find the file
    assert back.n_nodes == 100
    d0, l0, _ = idx.search(qs, 5, mode="graph")
    d1, l1, _ = back.search(qs, 5, mode="graph")
    np.testing.assert_array_equal(l0, l1)


def test_sharded_save_load_without_npz_suffix(tmp_path, small):
    pts, _ = small
    cfg = HnswConfig(dims=16, m=6, ef_construction=24, ef_search=24)
    idx = ShardedHnswIndex(cfg)
    idx.build(pts[:64], np.arange(64))
    p = str(tmp_path / "sharded_plain")
    idx.save(p)
    back = ShardedHnswIndex.load(p)
    assert back.n_nodes == 64


def _assemble_sharded_npz(path, shards, cfg):
    """Write a ShardedHnswIndex save file from per-shard HnswIndexes with
    (possibly) unbalanced sizes — the unbalanced-shard fixture the public
    build path (round-robin, balanced) cannot produce."""
    s = len(shards)
    counts = np.array([ix.n_nodes for ix in shards], np.int64)
    hi = int(counts.max())
    vec = np.zeros((s, hi, cfg.dims), np.float32)
    lnk = np.full((s, hi, cfg.max_m), -1, np.int32)
    cnt = np.zeros((s, hi), np.int32)
    dlt = np.zeros((s, hi), bool)
    lab = np.zeros((s, hi), np.uint64)
    for i, ix in enumerate(shards):
        n = ix.n_nodes
        vec[i, :n] = np.asarray(ix.graph.vectors[:n], np.float32)
        lnk[i, :n] = np.asarray(ix.graph.links[:n])
        cnt[i, :n] = np.asarray(ix.graph.link_counts[:n])
        dlt[i, :n] = np.asarray(ix.graph.deleted[:n])
        lab[i, :n] = ix.labels
    np.savez_compressed(
        path, format_version=np.int64(1),
        config=np.frombuffer(json.dumps(cfg.to_dict()).encode(),
                             dtype=np.uint8),
        n_shards=np.int64(s), shard_counts=counts, vectors=vec, links=lnk,
        link_counts=cnt, deleted=dlt, labels=lab)


def test_widening_with_tiny_shard(tmp_path, rng):
    """One nearly-empty shard must not block ef-doubling for the others
    (ADVICE r1: the old rule required the SUM over shards to fill every
    beam; reference semantics widen until the index is exhausted per query,
    embedding.c:322,338-343)."""
    cfg = HnswConfig(dims=8, m=6, ef_construction=24, ef_search=8)
    pts = rng.normal(size=(103, 8)).astype(np.float32)
    big = HnswIndex(cfg)
    big.build(pts[:100], np.arange(100))
    tiny = HnswIndex(cfg)
    tiny.build(pts[100:], np.arange(100, 103))
    p = str(tmp_path / "unbalanced.npz")
    _assemble_sharded_npz(p, [big, tiny], cfg)

    idx = ShardedHnswIndex.load(p, mesh=default_mesh(2))
    assert list(idx.shard_counts) == [100, 3]
    qs = rng.normal(size=(3, 8)).astype(np.float32)
    k = 20  # > ef_search + tiny shard: requires widening on the big shard
    d, l, v = idx.search(qs, k, mode="graph")
    assert v.sum(axis=1).min() == k, v.sum(axis=1)
    assert idx.counters["n_widenings"] >= 1


def test_unpruned_tie_order_parity(rng):
    """Equal-distance candidates in an UNPRUNED link list must be written
    farthest-first with larger-id-first among ties, matching the reference
    heap's (+dist, idx) pop order (refimpl._mutually_connect)."""
    cfg = HnswConfig(dims=4, m=8, ef_construction=16, ef_search=16)
    # many duplicate points => tied distances everywhere; fewer than m+1
    # candidates early on => unpruned lists
    base = rng.normal(size=(3, 4)).astype(np.float32)
    pts = base[np.array([0, 1, 1, 2, 2, 0, 1])]  # duplicates => exact ties

    ref = RefHnswIndex(cfg)
    for i, p in enumerate(pts):
        ref.add(p, i)

    idx = HnswIndex(cfg, max_insert_batch=1)  # serial order, like the ref
    idx.build(pts, np.arange(len(pts)))

    links = np.asarray(idx.graph.links)
    cnts = np.asarray(idx.graph.link_counts)
    for i in range(len(pts)):
        got = links[i, : cnts[i]].tolist()
        want = ref.links[i]
        assert got == want, f"node {i}: {got} != {want}"


def test_per_row_quantization_scales(rng):
    """A single huge-magnitude row must not collapse the int8 resolution of
    the other rows (per-row scales, ADVICE r1)."""
    pts = rng.normal(size=(64, 8)).astype(np.float32)
    pts[0] *= 1e5  # the outlier
    cfg = HnswConfig(dims=8, m=6, ef_construction=24, ef_search=24)
    idx = HnswIndex(cfg, quantized_traversal=True)
    idx.build(pts, np.arange(64))
    qv, qs = idx._ensure_quantized()
    qv = np.asarray(qv)
    scales = np.asarray(qs)
    assert scales.shape[0] == idx.graph.capacity
    # non-outlier rows keep full int8 range despite the outlier
    assert np.abs(qv[1:64]).max() >= 100
    # dequantized rows approximate the originals row-wise
    deq = qv[:64].astype(np.float32) * scales[:64, None]
    err = np.abs(deq - pts) / np.maximum(np.abs(pts).max(axis=1,
                                                         keepdims=True), 1)
    assert err.max() < 0.01


def test_benchmarks_run_smoke():
    """benchmarks/run.py streaming paths execute for single-chip and sharded
    indexes (the sharded branch crashed after the filtered-search change)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from benchmarks.run import CONFIGS, _streaming_qps

    rng = np.random.default_rng(7)
    pts = rng.normal(size=(96, CONFIGS["sharded"]["dims"])).astype(np.float32)
    qs = rng.normal(size=(64, CONFIGS["sharded"]["dims"])).astype(np.float32)
    cfg = HnswConfig(dims=CONFIGS["sharded"]["dims"], m=6,
                     ef_construction=16, ef_search=16)
    sidx = ShardedHnswIndex(cfg)
    sidx.build(pts, np.arange(len(pts)))
    for mode in ("auto", "graph"):
        qps = _streaming_qps(sidx, qs, mode, reps=1)
        assert qps > 0

    idx = HnswIndex(cfg)
    idx.build(pts, np.arange(len(pts)))
    for mode in ("auto", "graph"):
        qps = _streaming_qps(idx, qs, mode, reps=1)
        assert qps > 0


def test_hash_visited_set_matches_bitmap(rng):
    """The fixed-size open-hash visited set (the 100M-scale replacement for
    the cap/8-bytes-per-query bitmap) must produce ~identical results: no
    duplicate ids, recall within noise of the exact-bitmap mode."""
    centers = rng.normal(scale=4.0, size=(30, 24)).astype(np.float32)
    pts = (centers[rng.integers(0, 30, 4000)] +
           rng.normal(size=(4000, 24))).astype(np.float32)
    qs = (centers[rng.integers(0, 30, 32)] +
          rng.normal(size=(32, 24))).astype(np.float32)
    cfg = HnswConfig(dims=24, m=8, ef_construction=48, ef_search=48)
    idx = HnswIndex(cfg)
    idx.build(pts, np.arange(len(pts)))

    d0, i0 = idx.search_ids(qs)                      # bitmap (auto, small)
    idx.visited_mode = "hash"
    d1, i1 = idx.search_ids(qs)

    for r in range(len(qs)):
        ids = i1[r][i1[r] >= 0]
        assert len(ids) == len(set(ids.tolist())), "duplicate ids in results"
    # overlap of surfaced ids: hash overwrites may very rarely re-route the
    # walk; demand near-identity
    overlap = np.mean([
        len(set(i0[r][i0[r] >= 0].tolist()) &
            set(i1[r][i1[r] >= 0].tolist())) / max((i0[r] >= 0).sum(), 1)
        for r in range(len(qs))])
    assert overlap >= 0.98, overlap
    # and top-10 recall vs the exact oracle must not degrade
    _, le, ve = idx.exact_search(qs, 10)
    lab0 = idx.labels[np.maximum(i0[:, :10], 0)]
    lab1 = idx.labels[np.maximum(i1[:, :10], 0)]
    r0 = np.mean([len(set(lab0[r]) & set(le[r][ve[r]])) / 10
                  for r in range(len(qs))])
    r1 = np.mean([len(set(lab1[r]) & set(le[r][ve[r]])) / 10
                  for r in range(len(qs))])
    assert r1 >= r0 - 0.01, (r0, r1)


def test_slab_insert_matches_per_batch(rng):
    """The one-dispatch slab path (insert_slab_donating: fori over masked
    batch inserts, slab sliced on device) must produce the IDENTICAL graph
    to the host-driven per-batch path — same scatters in the same order,
    just without per-batch dispatch.  Exercises big slabs, small slabs, and
    a ragged tail."""
    n, dims = 150, 16
    pts = rng.normal(size=(n, dims)).astype(np.float32)
    cfg = HnswConfig(dims=dims, m=6, ef_construction=20, ef_search=20)

    a = HnswIndex(cfg, max_insert_batch=8)
    a.slab_batches = (4, 2)         # slabs of 32 and 16 rows
    a.build(pts, np.arange(n))      # n=150: 4 big + small slabs + ragged

    b = HnswIndex(cfg, max_insert_batch=8)
    for off in range(0, n, 24):     # chunks <= 4*batch => per-batch path
        b.add(pts[off: off + 24], np.arange(off, min(off + 24, n)))

    assert int(a.n_nodes) == int(b.n_nodes) == n
    np.testing.assert_array_equal(np.asarray(a.graph.links)[:n],
                                  np.asarray(b.graph.links)[:n])
    np.testing.assert_array_equal(np.asarray(a.graph.link_counts)[:n],
                                  np.asarray(b.graph.link_counts)[:n])
    np.testing.assert_allclose(np.asarray(a.graph.vectors)[:n],
                               np.asarray(b.graph.vectors)[:n])
    a.check_integrity()


def test_exact_candidate_build_quality(rng):
    """build_candidates="exact" (MXU sweep construction, the TPU-native
    bulk-build default below exact_build_threshold) must produce a graph at
    least as good as the beam-parity path: integrity clean, graph-mode
    recall not worse (exact candidate sets are supersets in quality of what
    the beam walk finds)."""
    centers = rng.normal(scale=4.0, size=(40, 32)).astype(np.float32)
    pts = (centers[rng.integers(0, 40, 5000)] +
           rng.normal(size=(5000, 32))).astype(np.float32)
    qs = (centers[rng.integers(0, 40, 64)] +
          rng.normal(size=(64, 32))).astype(np.float32)
    cfg = HnswConfig(dims=32, m=8, ef_construction=32, ef_search=32)

    def build(mode):
        idx = HnswIndex(cfg, build_candidates=mode)
        idx.build(pts, np.arange(len(pts)))
        idx.check_integrity()
        _, ol, ov = idx.exact_search(qs, 10)
        d, l, v = idx.search(qs, 10, mode="graph")
        return np.mean([len(set(l[r][v[r]]) & set(ol[r][ov[r]])) / 10
                        for r in range(len(qs))])

    rec_beam = build("beam")
    rec_exact = build("exact")
    assert rec_exact >= rec_beam - 0.01, (rec_beam, rec_exact)


def test_reprune_drain_exceeds_buffer(rng):
    """The connect re-prune compaction (core/build._connect_batch) drains
    overflow lanes in K-wide passes.  When more lanes overflow in one
    round than the buffer holds, the inner while_loop must run extra
    passes and produce the IDENTICAL result (lanes in a round target
    distinct nodes, so pass-splitting cannot reorder anything).  Forced
    here with a tiny buffer (4) against the default on a dense graph
    where every back-link target is saturated."""
    import functools

    import jax
    import jax.numpy as jnp

    from pg_embedding_tpu.core.build import _connect_batch

    dims, m, max_m = 8, 4, 8
    n, cap = 600, 640
    from pg_embedding_tpu.core.graph import GraphState

    # synthetic fully-saturated graph: every node has max_m links, so every
    # back-link target takes the re-prune path
    vecs = np.zeros((cap, dims), np.float32)
    vecs[:n] = rng.normal(size=(n, dims)).astype(np.float32)
    links = np.full((cap, max_m), -1, np.int32)
    links[:n] = (np.arange(n)[:, None] + np.arange(1, max_m + 1)) % n
    counts = np.zeros(cap, np.int32)
    counts[:n] = max_m
    g = GraphState(vectors=jnp.asarray(vecs), links=jnp.asarray(links),
                   link_counts=jnp.asarray(counts),
                   deleted=jnp.zeros(cap, bool), n_nodes=jnp.int32(n))

    b = 16
    kept_i = np.asarray(
        rng.choice(600, size=(b, m), replace=False).astype(np.int32))
    kept_cnt = np.full((b,), m, np.int32)

    out = {}
    for name, buf in (("default", None), ("tiny", 4)):
        fn = jax.jit(functools.partial(
            _connect_batch, m=m, max_m=max_m, metric_value=0,
            reprune_buffer=buf))
        links, counts = fn(g.vectors, g.links, g.link_counts, g.n_nodes,
                           jnp.asarray(kept_i), jnp.asarray(kept_cnt),
                           jnp.int32(b))
        out[name] = (np.asarray(links), np.asarray(counts))

    np.testing.assert_array_equal(out["default"][0], out["tiny"][0])
    np.testing.assert_array_equal(out["default"][1], out["tiny"][1])
