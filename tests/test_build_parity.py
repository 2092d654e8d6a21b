"""TPU batched construction vs the serial reference builder.

Batched insertion diverges from the reference's strictly-serial order in one
way: batch members don't see each other as candidates (SURVEY.md §7 hard
parts: 'serial-insert semantics vs batched construction — mitigate with small
batch sizes + recall-parity testing rather than bit-identical graphs').
These tests pin (a) structural invariants of the built graph and (b) recall
parity against the reference-built graph on the same data."""

import jax.numpy as jnp
import numpy as np
import pytest

from pg_embedding_tpu.config import HnswConfig, Metric
from pg_embedding_tpu.core.build import build_schedule, insert_batch
from pg_embedding_tpu.core.graph import empty_graph
from pg_embedding_tpu.core.refimpl import RefHnswIndex
from pg_embedding_tpu.core.search import search_graph
from pg_embedding_tpu.ops.bruteforce import exact_search


def _tpu_build(pts, cfg, max_batch=64, capacity=None):
    g = empty_graph(max(capacity or len(pts), 32) + max_batch,
                    cfg.dims, cfg.max_m)
    for off, cnt in build_schedule(len(pts), max_batch):
        g = insert_batch(g, jnp.asarray(pts[off: off + cnt]),
                         ef_construction=cfg.ef_construction, m=cfg.m,
                         max_m=cfg.max_m, metric_value=cfg.metric.value)
    return g


def test_batch_of_one_matches_reference_graph():
    """With batch size 1 the TPU build is serial like the reference; the
    resulting graphs must have identical adjacency SETS per node (ordering
    within a list may differ only at distance ties)."""
    rng = np.random.default_rng(11)
    pts = rng.normal(size=(120, 8)).astype(np.float32)
    cfg = HnswConfig(dims=8, m=5, ef_construction=24, ef_search=24)

    ri = RefHnswIndex(cfg)
    ri.build(pts, np.arange(len(pts)))

    g = _tpu_build(pts, cfg, max_batch=1)
    links = np.asarray(g.links)
    cnts = np.asarray(g.link_counts)

    mismatches = 0
    for i in range(len(pts)):
        ref_set = set(ri.links[i])
        got_set = set(links[i][: cnts[i]].tolist())
        if ref_set != got_set:
            mismatches += 1
    # identical up to float tie-breaks; allow a tiny epsilon of drift
    assert mismatches <= len(pts) * 0.02, mismatches


def test_structural_invariants():
    rng = np.random.default_rng(12)
    pts = rng.normal(size=(300, 16)).astype(np.float32)
    cfg = HnswConfig(dims=16, m=6, ef_construction=32, ef_search=32)
    g = _tpu_build(pts, cfg, max_batch=32)
    links = np.asarray(g.links)
    cnts = np.asarray(g.link_counts)
    n = int(g.n_nodes)
    assert n == 300
    for i in range(n):
        row = links[i][: cnts[i]]
        assert (row >= 0).all() and (row < n).all()
        assert len(set(row.tolist())) == len(row), f"dup links at {i}"
        assert i not in row, f"self-link at {i}"  # hnswalg.cpp:183-184
        assert cnts[i] <= cfg.max_m
        assert (links[i][cnts[i]:] == -1).all()
    # node 0 has no forward links of its own insert but must have back-links
    assert cnts[0] > 0
    # graph must be reachable from the entry point (BFS)
    seen = {0}
    frontier = [0]
    while frontier:
        nxt = []
        for u in frontier:
            for v in links[u][: cnts[u]]:
                if v not in seen:
                    seen.add(int(v))
                    nxt.append(int(v))
        frontier = nxt
    assert len(seen) >= n * 0.99, f"only {len(seen)}/{n} reachable"


@pytest.mark.parametrize("metric", [Metric.L2, Metric.COSINE])
def test_recall_parity_batched_vs_serial(metric):
    """Batched TPU build must reach the reference build's recall@10 within
    2 points on clustered data at equal ef."""
    rng = np.random.default_rng(13)
    n_clusters, per, d, ef, k = 15, 40, 12, 48, 10
    centers = rng.normal(scale=4.0, size=(n_clusters, d))
    pts = (centers[np.repeat(np.arange(n_clusters), per)] +
           rng.normal(size=(n_clusters * per, d))).astype(np.float32)
    qs = (centers[rng.integers(0, n_clusters, 12)] +
          rng.normal(size=(12, d))).astype(np.float32)
    cfg = HnswConfig(dims=d, m=8, ef_construction=ef, ef_search=ef,
                     metric=metric)

    _, oracle = exact_search(qs, pts, k, metric)
    oracle = np.asarray(oracle)

    ri = RefHnswIndex(cfg)
    ri.build(pts, np.arange(len(pts)))
    ref_rows = [[i for _, i in ri.search_idx(q, ef)][:k] for q in qs]
    r_ref = np.mean([len(set(r) & set(oracle[i])) / k
                     for i, r in enumerate(ref_rows)])

    g = _tpu_build(pts, cfg, max_batch=32)
    _, ti, _ = search_graph(g, jnp.asarray(qs), ef=ef,
                            metric_value=metric.value)
    ti = np.asarray(ti)
    r_tpu = np.mean([len(set(ti[i][:k].tolist()) & set(oracle[i])) / k
                     for i in range(len(qs))])
    assert r_tpu >= r_ref - 0.02, (r_tpu, r_ref)


def test_build_schedule_properties():
    for n in [1, 2, 3, 7, 100, 1000]:
        sched = build_schedule(n, 64)
        assert sum(cnt for _, cnt in sched) == n
        assert all(cnt <= 64 for _, cnt in sched)
        offs = [off for off, _ in sched]
        assert offs == sorted(offs)
    assert build_schedule(0, 64) == []


def test_masked_tail_insert():
    """n_insert masking: inserting a batch of b points with n_insert=4 must
    produce exactly the same graph as inserting the first 4 as their own
    batch (the SPMD ragged-tail path in the sharded build)."""
    import jax

    from pg_embedding_tpu.core.build import insert_batch_core

    rng = np.random.default_rng(14)
    pts = rng.normal(size=(40, 8)).astype(np.float32)
    cfg = HnswConfig(dims=8, m=4, ef_construction=16, ef_search=16)

    base = _tpu_build(pts[:32], cfg, max_batch=16, capacity=64)

    g_full = insert_batch(base, jnp.asarray(pts[32:36]),
                          ef_construction=16, m=4, max_m=8, metric_value=0)
    g_masked = jax.jit(lambda g, p: insert_batch_core(
        g, p, jnp.int32(4), ef_construction=16, m=4, max_m=8,
        metric_value=0))(base, jnp.asarray(pts[32:40]))

    assert int(g_full.n_nodes) == 36
    assert int(g_masked.n_nodes) == 36
    np.testing.assert_array_equal(np.asarray(g_full.link_counts)[:36],
                                  np.asarray(g_masked.link_counts)[:36])
    np.testing.assert_array_equal(np.asarray(g_full.links)[:36],
                                  np.asarray(g_masked.links)[:36])
