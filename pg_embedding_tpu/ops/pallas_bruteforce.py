"""Pallas fused brute-force top-k kernel — exact k-NN at MXU speed.

The jnp exact path (ops/bruteforce.py) materializes a [B, chunk] distance
tile to HBM and runs lax.top_k per chunk; the merge dominates.  This kernel
keeps everything on-chip: the query block stays resident in VMEM, corpus
tiles stream through VMEM (the Pallas pipeline double-buffers the HBM loads),
distances are one MXU dot per tile, and an exact running top-k per query is
maintained in VMEM scratch across grid steps with K selection passes —
distances never round-trip to HBM.  This is the TPU-native formulation of
the seq-scan exact path (reference: embedding.c:1022-1038) and the engine
behind the batched serving fast path; cf. the TPU-KNN approach (PAPERS.md).

Supports L2 and cosine (matmul forms). Manhattan has no matmul form and
stays on the jnp path.

Layout notes:
  - grid is 1-D over corpus tiles; Pallas TPU executes grid steps
    sequentially on the core, so VMEM scratch carries the running top-k
  - K is padded to a multiple of 8 lanes? No: run_d is [B, K_pad] with
    K_pad = max(k, 8) kept small; selection passes are vectorized over B
  - the final grid step writes the scratch to the outputs
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Metric

_INF = float("inf")


def _insert_pass(run_d, run_i, m, gid):
    """Vectorized sorted-insert of one (m, gid) per row into ascending
    [B, K] running arrays."""
    k = run_d.shape[1]
    pos = jnp.sum((run_d < m[:, None]).astype(jnp.int32), axis=1)  # [B]
    cols = jax.lax.broadcasted_iota(jnp.int32, run_d.shape, 1)
    # shifted-by-one views (previous column), column 0 unused when j > pos
    prev_d = jnp.concatenate([run_d[:, :1], run_d[:, :-1]], axis=1)
    prev_i = jnp.concatenate([run_i[:, :1], run_i[:, :-1]], axis=1)
    at = cols == pos[:, None]
    after = cols > pos[:, None]
    new_d = jnp.where(at, m[:, None], jnp.where(after, prev_d, run_d))
    new_i = jnp.where(at, gid[:, None], jnp.where(after, prev_i, run_i))
    return new_d, new_i


def _bruteforce_kernel(n_valid_ref, q_ref, qnorm_ref, pts_ref, pnorm_ref,
                       del_ref, out_d_ref, out_i_ref, run_d, run_i, *,
                       k: int, tile_n: int, metric_value: int,
                       n_tiles: int):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        run_d[:] = jnp.full_like(run_d[:], _INF)
        run_i[:] = jnp.full_like(run_i[:], -1)

    q = q_ref[:]                                   # [B, D]
    pts = pts_ref[:]                               # [TILE_N, D]
    qp = jax.lax.dot_general(
        q, pts, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # [B, TILE_N]

    pnorm = pnorm_ref[:].reshape(1, tile_n)        # [1, TILE_N] |p|^2
    if metric_value == Metric.L2.value:
        qn = qnorm_ref[:].reshape(-1, 1)           # [B, 1] |q|^2
        scores = jnp.maximum(qn + pnorm - 2.0 * qp, 0.0)
    else:  # cosine
        qn = qnorm_ref[:].reshape(-1, 1)           # [B, 1] |q|^2
        scores = 1.0 - qp * jax.lax.rsqrt(
            jnp.maximum(qn * pnorm, 1e-30))

    start = step * tile_n
    ids = start + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    dead = del_ref[:].reshape(1, tile_n)
    ok = (ids < n_valid_ref[0]) & ~dead
    scores = jnp.where(ok, scores, _INF)

    # exact running top-k: k selection passes over the tile
    rd, ri = run_d[:], run_i[:]
    for _ in range(k):
        m = jnp.min(scores, axis=1)                # [B]
        a = jnp.argmin(scores, axis=1)             # [B]
        gid = start + a
        better = m < rd[:, k - 1]
        nd, ni = _insert_pass(rd, ri, m, gid)
        rd = jnp.where(better[:, None], nd, rd)
        ri = jnp.where(better[:, None], ni, ri)
        cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(cols == a[:, None], _INF, scores)
    run_d[:] = rd
    run_i[:] = ri

    @pl.when(step == n_tiles - 1)
    def _finish():
        d = run_d[:]
        if metric_value == Metric.L2.value:
            d = jnp.sqrt(d)                        # reference returns sqrt'd
        out_d_ref[:] = d
        out_i_ref[:] = run_i[:]


@functools.partial(jax.jit,
                   static_argnames=("k", "metric_value", "tile_n",
                                    "interpret"))
def _pallas_exact(queries, points, pnorms, deleted, n_valid, *, k: int,
                  metric_value: int, tile_n: int, interpret: bool):
    b, d = queries.shape
    n_pad = points.shape[0]
    n_tiles = n_pad // tile_n
    qnorms = jnp.sum(queries.astype(jnp.float32) ** 2, axis=1)

    kernel = functools.partial(_bruteforce_kernel, k=k, tile_n=tile_n,
                               metric_value=metric_value, n_tiles=n_tiles)
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),               # n_valid
            pl.BlockSpec((b, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),               # queries
            pl.BlockSpec((b,), lambda i: (0,),
                         memory_space=pltpu.VMEM),               # qnorms
            pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),               # points tile
            pl.BlockSpec((tile_n,), lambda i: (i,),
                         memory_space=pltpu.VMEM),               # pnorm tile
            pl.BlockSpec((tile_n,), lambda i: (i,),
                         memory_space=pltpu.VMEM),               # deleted
        ],
        out_specs=(
            pl.BlockSpec((b, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
        ],
        interpret=interpret,
    )(n_valid, queries, qnorms, points, pnorms, deleted)
    return out_d, out_i


def pallas_exact_search(queries, points, k: int, metric=Metric.L2,
                        n_valid=None, deleted=None, tile_n: int = 2048,
                        interpret: bool | None = None):
    """Exact top-k via the fused Pallas kernel (L2/cosine only).

    Same contract as ops.bruteforce.exact_search. ``interpret`` defaults to
    True off-TPU (CPU tests) and False on TPU.
    """
    from ..config import resolve_metric

    metric = resolve_metric(metric)
    if metric is Metric.MANHATTAN:
        raise ValueError("pallas_exact_search supports L2/cosine only; "
                         "use ops.bruteforce.exact_search for Manhattan")
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    queries = jnp.asarray(queries, jnp.float32)
    points = jnp.asarray(points)
    n = points.shape[0] if n_valid is None else int(n_valid)

    tile_n = min(tile_n, max(((points.shape[0] + 127) // 128) * 128, 128))
    n_pad = ((points.shape[0] + tile_n - 1) // tile_n) * tile_n
    if n_pad != points.shape[0]:
        points = jnp.pad(points, ((0, n_pad - points.shape[0]), (0, 0)))
    if deleted is None:
        deleted = jnp.zeros((n_pad,), jnp.bool_)
    else:
        deleted = jnp.asarray(deleted, jnp.bool_)
        if deleted.shape[0] != n_pad:
            deleted = jnp.pad(deleted, (0, n_pad - deleted.shape[0]))
    pnorms = jnp.sum(points.astype(jnp.float32) ** 2, axis=1)
    return _pallas_exact(queries, points, pnorms, deleted,
                         jnp.full((1,), n, jnp.int32), k=int(k),
                         metric_value=metric.value, tile_n=tile_n,
                         interpret=bool(interpret))
