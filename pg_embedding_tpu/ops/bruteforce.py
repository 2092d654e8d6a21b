"""Exact (brute-force) k-NN — the seq-scan ground-truth path.

In the reference, exact ordering comes from a sequential scan + Sort using
the row-at-a-time distance operators (embedding.c:1022-1062); the regression
tests cross-validate the ANN index against it (test/sql/knn.sql:23-26 vs
41-44).  On TPU, exact k-NN over the whole corpus is a tiled distance-matrix
sweep with a running top-k merge — the distance FLOPs ride the MXU, the
corpus streams once through HBM, and a batch of queries amortizes the sweep
(cf. the TPU-KNN approach of computing k-NN at peak FLOP/s).

This doubles as (a) the recall oracle for every ANN test and (b) a fast
exact-search path small corpora can use outright.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import Metric
from .distance import dist_one_to_many, pairwise_dist

# Extra candidates fetched by the matmul-form sweep before the exact
# elementwise rerank.  The L2 matmul expansion |p|^2+|q|^2-2pq cancels
# catastrophically in f32 when |p|^2 >> d^2 (measured: ~3% of top-10 sets
# flipped vs a difference-form oracle at 100k x 128d clustered data), so the
# sweep over-fetches and the final top-k is re-scored with the exact
# difference form (distfunc.c:121-130 semantics) on the gathered rows.
# Pad size: with the sweep's dots forced to Precision.HIGHEST (TPU f32
# matmuls otherwise run ONE bf16 MXU pass — O(1) absolute score error at
# |p||q| ~ 2e3, displacing true neighbors many ranks), the remaining error
# is true-f32-level (~1e-3 absolute here), orders of magnitude below
# inter-neighbor spacing, so displaced true neighbors sink at most a rank
# or two; 2 covers it (pinned vs float64 oracles in tests and re-verified
# at 100k/1M on real TPU).  Kept small because the Pallas kernel's
# selection cost grows with k+pad.
_RERANK_PAD = 2


@functools.partial(jax.jit, static_argnames=("k", "metric_value"))
def _rerank_exact(queries, points, i_run, *, k: int, metric_value: int):
    """Re-score [B, k_run] candidate ids with the exact elementwise
    distance form and keep the k best (ascending; -1 ids stay last)."""
    rows = points[jnp.maximum(i_run, 0)].astype(jnp.float32)  # [B, k_run, D]
    d = jax.vmap(lambda q, r: dist_one_to_many(q, r, metric_value))(
        queries, rows)
    d = jnp.where(i_run >= 0, d, jnp.inf)
    neg, sel = jax.lax.top_k(-d, k)
    return -neg, jnp.take_along_axis(i_run, sel, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "metric_value", "chunk"))
def _exact_search_impl(queries, points, n_valid, deleted, *, k: int,
                       metric_value: int, chunk: int):
    """Tiled exact top-k.

    queries: [B, D]; points: [N_pad, D] (rows >= n_valid are padding);
    deleted: bool[N_pad] tombstone mask (excluded rows, like deleted heap
    tuples being absent from a seq scan); returns (dists [B, k],
    idxs [B, k]) ascending by distance, idx -1 past the end when fewer than
    k valid points exist.
    """
    b = queries.shape[0]
    n_pad = points.shape[0]
    num_chunks = n_pad // chunk

    def body(c, carry):
        top_d, top_i = carry
        start = c * chunk
        pts = jax.lax.dynamic_slice_in_dim(points, start, chunk, axis=0)
        dd = jax.lax.dynamic_slice_in_dim(deleted, start, chunk, axis=0)
        d = pairwise_dist(queries, pts, metric_value)               # [B, chunk]
        ids = start + jax.lax.broadcasted_iota(jnp.int32, (b, chunk), 1)
        valid = (ids < n_valid) & ~dd[None, :]
        d = jnp.where(valid, d, jnp.inf)
        ids = jnp.where(valid, ids, -1)
        # merge: concat running top-k with this chunk, keep k smallest
        all_d = jnp.concatenate([top_d, d], axis=1)
        all_i = jnp.concatenate([top_i, ids], axis=1)
        neg_top, sel = jax.lax.top_k(-all_d, k)
        return (-neg_top, jnp.take_along_axis(all_i, sel, axis=1))

    init = (jnp.full((b, k), jnp.inf, jnp.float32),
            jnp.full((b, k), -1, jnp.int32))
    top_d, top_i = jax.lax.fori_loop(0, num_chunks, body, init)
    # top_k returns descending in -d => ascending in d already; but ties with
    # inf padding can interleave — enforce ascending order deterministically.
    order = jnp.argsort(top_d, axis=1, stable=True)
    return (jnp.take_along_axis(top_d, order, axis=1),
            jnp.take_along_axis(top_i, order, axis=1))


def exact_search(queries, points, k: int, metric=Metric.L2,
                 n_valid=None, deleted=None, chunk: int = 15360):
    """Exact top-k nearest neighbors.

    Args:
      queries: [B, D] float32.
      points:  [N, D] float32 (may be padded; pass n_valid).
      k:       results per query.
      metric:  Metric / operator string.
      n_valid: number of valid rows in ``points`` (default: all).
      deleted: optional bool[N] tombstone mask; True rows are excluded.
      chunk:   corpus tile size per sweep step (default divides the
               aligned capacity grain, core/graph._EXACT_TILE_ALIGN, so
               large corpora are never pad-copied).

    Returns (dists [B, k] ascending, idxs [B, k]; idx == -1 => no such
    neighbor).
    """
    from ..config import resolve_metric

    queries = jnp.asarray(queries, jnp.float32)
    points = jnp.asarray(points, jnp.float32)
    metric = resolve_metric(metric)
    # n_valid may be traced (per-shard counts inside shard_map)
    n = points.shape[0] if n_valid is None else n_valid

    chunk = min(chunk, max(points.shape[0], 1))
    n_pad = ((points.shape[0] + chunk - 1) // chunk) * chunk
    if n_pad != points.shape[0]:
        points = jnp.pad(points, ((0, n_pad - points.shape[0]), (0, 0)))
    if deleted is None:
        deleted = jnp.zeros((n_pad,), jnp.bool_)
    else:
        deleted = jnp.asarray(deleted, jnp.bool_)
        if deleted.shape[0] != n_pad:
            deleted = jnp.pad(deleted, (0, n_pad - deleted.shape[0]))
    k = int(k)
    if metric is Metric.L2:
        # over-fetch + exact rerank: the matmul form's f32 cancellation can
        # sink true top-k items a few ranks down (see _RERANK_PAD)
        k_run = k + _RERANK_PAD
        _, i_run = _exact_search_impl(queries, points, jnp.asarray(n, jnp.int32), deleted,
                                      k=k_run, metric_value=metric.value,
                                      chunk=chunk)
        return _rerank_exact(queries, points, i_run, k=k,
                             metric_value=metric.value)
    return _exact_search_impl(queries, points, jnp.asarray(n, jnp.int32), deleted,
                              k=k, metric_value=metric.value,
                              chunk=chunk)
