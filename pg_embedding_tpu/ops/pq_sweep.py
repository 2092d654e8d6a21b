"""Compressed brute-force sweep — ADC over PQ codes + exact f32 rerank.

The reference's only full-corpus scan reads full float32 rows (the seq
scan, embedding.c:1022-1038).  On TPU the analogous exact sweep streams
the whole f32 corpus through HBM per query batch, which is what bounds it
at large N (BASELINE 10M: ~395ms/batch).  This engine sweeps the corpus'
PQ codes instead — G bytes/row instead of 4*D (32x fewer HBM bytes at
D=128, G=16) — decoding each chunk register-side from the VMEM-resident
codebook and scoring with ONE bf16 MXU pass (the same dequantize-gather +
dense-distance ADC as ops/pq.py, applied to the corpus itself rather than
to neighbor records).  The coarse top-``pool`` per query is then reranked
with the exact elementwise distance on the gathered full-precision rows
(ops/bruteforce._rerank_exact), so returned distances are reference-exact
(distfunc.c:121-155 forms) even though the candidate pool is approximate.

This sits between the exact sweep (recall 1.0, reads the f32 corpus) and
the graph walk (random gathers): a *sequential* engine whose HBM cost is
the code stream.  PQ distortion can drop a true neighbor from the coarse
pool, so recall < 1.0; over-fetch (``pool``) prices that directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import Metric, resolve_metric
from .bruteforce import _rerank_exact
from .distance import pairwise_dist
from .pq import pq_decode_mxu


@functools.partial(jax.jit, static_argnames=("pool", "metric_value", "chunk"))
def _pq_pool_impl(queries, codes, codebook, rotation, n_valid, deleted, *,
                  pool: int, metric_value: int, chunk: int):
    """Chunked coarse sweep over codes: running top-``pool`` per query.

    queries: f32[B, D] (original space; rotated here if OPQ); codes:
    u8[N_pad, G] (rows >= n_valid are padding); deleted: bool[N_pad].
    Returns (dists f32[B, pool], ids i32[B, pool]) ascending by the
    COARSE (decoded, bf16-dot) distance; callers rerank exactly.
    """
    q = queries if rotation is None else queries @ rotation
    b = q.shape[0]
    n_pad = codes.shape[0]
    num_chunks = n_pad // chunk

    def body(c, carry):
        top_d, top_i = carry
        start = c * chunk
        cblk = jax.lax.dynamic_slice_in_dim(codes, start, chunk, axis=0)
        dd = jax.lax.dynamic_slice_in_dim(deleted, start, chunk, axis=0)
        # bf16 decoded rows select pairwise_dist's fast-MXU path (one bf16
        # pass, f32 accumulation) — the decode error is far below the PQ
        # quantization error the pool already tolerates
        # bf16 rows keep pairwise_dist on its fast-MXU path (one bf16
        # pass, f32 accumulation) — see the original decode note
        rows = pq_decode_mxu(cblk, codebook).astype(jnp.bfloat16)
        d = pairwise_dist(q, rows, metric_value)               # [B, chunk]
        ids = start + jax.lax.broadcasted_iota(jnp.int32, (b, chunk), 1)
        valid = (ids < n_valid) & ~dd[None, :]
        d = jnp.where(valid, d, jnp.inf)
        ids = jnp.where(valid, ids, -1)
        all_d = jnp.concatenate([top_d, d], axis=1)
        all_i = jnp.concatenate([top_i, ids], axis=1)
        neg, sel = jax.lax.top_k(-all_d, pool)
        return (-neg, jnp.take_along_axis(all_i, sel, axis=1))

    init = (jnp.full((b, pool), jnp.inf, jnp.float32),
            jnp.full((b, pool), -1, jnp.int32))
    return jax.lax.fori_loop(0, num_chunks, body, init)


def pq_sweep_search(queries, codes, codebook, rotation, points, k: int,
                    metric=Metric.L2, *, n_valid=None, deleted=None,
                    pool: int | None = None, chunk: int = 16384):
    """Top-k by compressed sweep + exact rerank.

    Args:
      queries:  f32[B, D] in the ORIGINAL space.
      codes:    u8[N, G] per-row PQ codes (rotated space when OPQ).
      codebook: f32[G, 256, D/G].
      rotation: f32[D, D] OPQ rotation or None.
      points:   f32[N_pts, D] original rows for the exact rerank
                (N_pts >= max surviving id + 1; typically the graph store).
      k:        results per query.
      metric:   Metric / operator string (rerank uses its exact form).
      n_valid:  live-row count (default: all of ``codes``).
      deleted:  optional bool[N] tombstone/filter mask; True rows excluded.
      pool:     coarse candidates per query before rerank (default
                max(4*k, k+28), capped at 256 — the top_k merge cost grows
                with pool+chunk).
      chunk:    code rows per sweep step.

    Returns (dists f32[B, k] ascending exact distances, ids i32[B, k];
    id == -1 => fewer than k live rows).
    """
    metric = resolve_metric(metric)
    queries = jnp.asarray(queries, jnp.float32)
    codes = jnp.asarray(codes)
    n = codes.shape[0] if n_valid is None else n_valid
    if pool is None:
        pool = min(max(4 * k, k + 28), 256)
    pool = max(int(pool), int(k))

    chunk = min(chunk, max(codes.shape[0], 1))
    n_pad = ((codes.shape[0] + chunk - 1) // chunk) * chunk
    if n_pad != codes.shape[0]:
        codes = jnp.pad(codes, ((0, n_pad - codes.shape[0]), (0, 0)))
    if deleted is None:
        deleted = jnp.zeros((n_pad,), jnp.bool_)
    else:
        deleted = jnp.asarray(deleted, jnp.bool_)
        if deleted.shape[0] != n_pad:
            deleted = jnp.pad(deleted, (0, n_pad - deleted.shape[0]))

    _, i_pool = _pq_pool_impl(
        queries, codes, codebook, rotation, jnp.asarray(n, jnp.int32),
        deleted, pool=pool, metric_value=metric.value, chunk=chunk)
    return _rerank_exact(queries, points, i_pool, k=int(k),
                         metric_value=metric.value)
