#!/usr/bin/env python
"""Split the build hot path into its phases on real hardware.

Per insert batch (core/build.py:insert_batch_core), time separately:
  1. the staged vmapped beam search (ef=efc) over the pre-batch graph
  2. the intra-batch merge + batched heuristic prune
  3. the sequential fori connect (_connect_one x B)
and the full insert_batch_masked for reference, across batch sizes and
expand widths.  Drives the round-2 build-throughput work (VERDICT item 5:
>= 1.2x CPU vec/s at 100k)."""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pg_embedding_tpu import HnswConfig, HnswIndex  # noqa: E402
from pg_embedding_tpu.core import build as B  # noqa: E402
from pg_embedding_tpu.core.search import _search_one  # noqa: E402
from pg_embedding_tpu.ops.distance import pairwise_dist  # noqa: E402

N, DIMS, M, EFC = 100_000, 128, 16, 64
REPS = 16


def log(msg):
    print(msg, flush=True)


def _sync(out):
    # materialize ONE SMALL leaf only: np.asarray of a big leaf would drag
    # the whole array through the tunnel and time the transfer, not the op
    leaves = jax.tree_util.tree_leaves(out)
    small = min(leaves, key=lambda x: getattr(x, "size", 1 << 60))
    np.asarray(small)


def timeit(fn, *args, reps=REPS):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / reps


@functools.partial(jax.jit, static_argnames=("efc", "mv", "t"))
def search_phase(graph, points, *, efc, mv, t):
    vectors = jax.lax.dynamic_update_slice(
        graph.vectors, points.astype(graph.vectors.dtype),
        (graph.n_nodes, 0))
    staged = graph._replace(vectors=vectors)
    fn = functools.partial(_search_one, ef=efc, metric_value=mv,
                           cand_cap=efc, expand_width=t)
    cd, ci, _, _ = jax.vmap(fn, in_axes=(None, 0))(staged, points)
    return cd, ci


@functools.partial(jax.jit, static_argnames=("m", "mv"))
def prune_phase(graph, points, cand_d, cand_i, *, m, mv):
    cvecs = graph.vectors[jnp.maximum(cand_i, 0)]
    pair = jax.vmap(lambda v: pairwise_dist(v, v, mv))(cvecs)
    kept_i, kept_cnt = jax.vmap(
        lambda cd, ci, pd: B._prune_heuristic(cd, ci, pd, m))(cand_d, cand_i,
                                                              pair)
    return kept_i, kept_cnt


@functools.partial(jax.jit, static_argnames=("m", "max_m", "mv"))
def connect_phase(graph, kept_i, kept_cnt, *, m, max_m, mv):
    b = kept_i.shape[0]
    base = graph.n_nodes

    def body(i, carry):
        links, link_counts = carry
        return B._connect_one(graph.vectors, links, link_counts, base + i,
                              kept_i[i], kept_cnt[i], True, m=m, max_m=max_m,
                              metric_value=mv)

    links, link_counts = jax.lax.fori_loop(
        0, b, body, (graph.links, graph.link_counts))
    return links[0, 0], link_counts[0]


def main():
    rng = np.random.default_rng(99)
    n_centers = 1_000
    centers = rng.normal(scale=4.0, size=(n_centers, DIMS)).astype(np.float32)
    pts = (centers[rng.integers(0, n_centers, N)] +
           rng.normal(size=(N, DIMS)).astype(np.float32)).astype(np.float32)

    cfg = HnswConfig(dims=DIMS, m=M, ef_construction=EFC, ef_search=64)
    idx = HnswIndex(cfg, initial_capacity=N + 512, max_insert_batch=128)
    t0 = time.time()
    idx.build(pts[:N - 4096])
    np.asarray(idx.graph.n_nodes)
    log(f"build to {N - 4096}: {(N - 4096) / (time.time() - t0):.0f} vec/s "
        f"(incl. one-time compile)")
    # steady-state api-level insert rate at ~full graph, warm program
    t0 = time.time()
    idx.add(pts[N - 4096: N - 1024])
    np.asarray(idx.graph.n_nodes)
    dt = time.time() - t0
    log(f"warm add rate at ~100k: {3072 / dt:.0f} vec/s")
    g = idx.graph
    mv = cfg.metric.value

    for bsz in (64, 128, 256):
        batch = jnp.asarray(pts[N - 1024: N - 1024 + bsz])
        for t in (4, 8):
            ts = timeit(functools.partial(search_phase, efc=EFC, mv=mv, t=t),
                        g, batch)
            log(f"B={bsz:<4d} T={t}: search {ts * 1e3:7.1f} ms "
                f"({bsz / ts:6.0f} vec/s equiv)")
        cd, ci = search_phase(g, batch, efc=EFC, mv=mv, t=4)
        tp = timeit(functools.partial(prune_phase, m=M, mv=mv),
                    g, batch, cd, ci)
        ki, kc = prune_phase(g, batch, cd, ci, m=M, mv=mv)
        tc = timeit(functools.partial(connect_phase, m=M, max_m=cfg.max_m,
                                      mv=mv), g, ki, kc)
        tf = timeit(
            lambda gg, bb: B.insert_batch_masked(
                gg, bb, jnp.int32(bsz), ef_construction=EFC, m=M,
                max_m=cfg.max_m, metric_value=mv, expand_width=4),
            g, batch)
        log(f"B={bsz:<4d} prune {tp * 1e3:7.1f} ms | connect {tc * 1e3:7.1f} "
            f"ms | full {tf * 1e3:7.1f} ms ({bsz / tf:6.0f} vec/s)")


if __name__ == "__main__":
    main()
