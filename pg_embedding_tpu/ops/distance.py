"""Distance kernels — the TPU-native replacement for distfunc.c.

The reference implements three metrics as scalar/SIMD loops over float32
pairs with runtime AVX2/SSE dispatch (reference: distfunc.c:28-169):

  - L2:        ``sqrtf(sum((a-b)^2))``           distfunc.c:121-130
  - cosine:    ``1 - dot(a,b)/sqrt(|a|^2|b|^2)`` distfunc.c:133-145
  - manhattan: ``sum(|a-b|)``                    distfunc.c:147-155

On TPU the equivalents are expressed so XLA maps them onto the MXU (matmul
forms) or the VPU (elementwise forms), batched over queries and points
instead of one pair at a time.  Two families:

  * ``dist_one_to_many`` — one query vs a small gathered set (the beam-search
    inner loop, replacing the per-neighbor ``hnsw_dist_func`` calls at
    hnswalg.cpp:96).  Uses the exact elementwise form, since the gathered
    set is tiny and VPU-bound.
  * ``pairwise_dist`` — a [B, N] distance matrix tile (the brute-force
    oracle / seq-scan analog, embedding.c:1022-1038).  L2 and cosine use the
    matmul expansion so the FLOPs land on the MXU.

All math is float32; ordering matches the reference formulas (the matmul L2
expansion differs from the diff-square form only by rounding — the oracle
tests pin ordering equivalence on realistic data).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Metric


def _metric_value(metric) -> int:
    return metric.value if isinstance(metric, Metric) else int(metric)


# ---------------------------------------------------------------------------
# One-to-many: exact elementwise forms (VPU path, beam-search inner loop)
# ---------------------------------------------------------------------------

def dist_one_to_many(query: jax.Array, points: jax.Array, metric) -> jax.Array:
    """Distances from one query [D] to a gathered set [K, D] -> [K].

    Exact per-formula computation matching distfunc.c semantics; used where
    the reference calls ``calc_dist_func`` per neighbor (hnswalg.cpp:36-40).
    """
    m = _metric_value(metric)
    if m == Metric.L2.value:
        d = points - query[None, :]
        return jnp.sqrt(jnp.sum(d * d, axis=-1))
    if m == Metric.COSINE.value:
        dot = points @ query
        na = jnp.sum(query * query)
        nb = jnp.sum(points * points, axis=-1)
        return 1.0 - dot * jax.lax.rsqrt(jnp.maximum(na * nb, 1e-30))
    if m == Metric.MANHATTAN.value:
        return jnp.sum(jnp.abs(points - query[None, :]), axis=-1)
    raise ValueError(f"unknown metric: {metric}")


def dist_pair(a: jax.Array, b: jax.Array, metric) -> jax.Array:
    """Single-pair distance [D],[D] -> scalar; the direct ``hnsw_dist_func``
    analog (distfunc.c:171-174)."""
    return dist_one_to_many(a, b[None, :], metric)[0]


# ---------------------------------------------------------------------------
# Batched pairwise: MXU matmul forms (brute force / oracle / construction)
# ---------------------------------------------------------------------------

def pairwise_dist(queries: jax.Array, points: jax.Array, metric) -> jax.Array:
    """Distance matrix [B, D] x [N, D] -> [B, N].

    L2/cosine route their FLOPs through a single matmul (MXU); Manhattan has
    no matmul form and stays on the VPU via broadcasting — mirroring the
    reference where Manhattan is also the scalar-only path (distfunc.c:147).
    """
    m = _metric_value(metric)
    # bf16 storage signals the fast MXU path: the dot runs in bf16 with f32
    # accumulation (2x MXU throughput, half the HBM stream); norms always
    # accumulate in f32. f32 storage keeps the dot in full precision.
    bf16 = points.dtype == jnp.bfloat16
    # The CPU executor cannot run BF16 x BF16 = F32 dots (DotThunk); it
    # also has no bf16 fast path to win, so upcast there — operands are
    # already bf16-rounded, making the f32 dot strictly more accurate.
    if bf16 and jax.default_backend() == "cpu":
        points = points.astype(jnp.float32)
        bf16 = False
        qd = queries
    else:
        qd = queries.astype(jnp.bfloat16) if bf16 else queries
    pf = points.astype(jnp.float32)
    # f32 storage: force true-f32 dots (TPU f32 matmuls otherwise run a
    # single bf16 MXU pass — DEFAULT precision — whose O(1) absolute score
    # error breaks exact-oracle ordering and perturbs heuristic pruning);
    # bf16 storage explicitly opts into the fast single-pass trade.
    prec = (jax.lax.Precision.DEFAULT if bf16
            else jax.lax.Precision.HIGHEST)
    if m == Metric.L2.value:
        qq = jnp.sum(queries * queries, axis=-1, keepdims=True)      # [B,1]
        pp = jnp.sum(pf * pf, axis=-1)[None, :]                      # [1,N]
        qp = jnp.dot(qd, points.T, preferred_element_type=jnp.float32,
                     precision=prec)
        ssd = jnp.maximum(qq + pp - 2.0 * qp, 0.0)
        return jnp.sqrt(ssd)
    if m == Metric.COSINE.value:
        qp = jnp.dot(qd, points.T, preferred_element_type=jnp.float32,
                     precision=prec)
        nq = jnp.sum(queries * queries, axis=-1, keepdims=True)      # [B,1]
        npts = jnp.sum(pf * pf, axis=-1)[None, :]                    # [1,N]
        return 1.0 - qp * jax.lax.rsqrt(jnp.maximum(nq * npts, 1e-30))
    if m == Metric.MANHATTAN.value:
        # [B,1,D] - [1,N,D] — VPU-bound; callers tile N to bound memory.
        return jnp.sum(jnp.abs(queries[:, None, :] - pf[None, :, :]),
                       axis=-1)
    raise ValueError(f"unknown metric: {metric}")


# ---------------------------------------------------------------------------
# Seq-scan operator analogs (embedding.c:1040-1062)
# ---------------------------------------------------------------------------

def _check_dims(a, b) -> None:
    # analog of the per-call dimension check in calc_distance
    # (embedding.c:1030-1035)
    if a.shape[-1] != b.shape[-1]:
        raise ValueError(
            f"different array dimensions {a.shape[-1]} and {b.shape[-1]}"
        )


def l2_distance(a, b) -> jax.Array:
    """``<->`` operator (embedding--0.3.6.sql:31-34; embedding.c:1040-1046)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    _check_dims(a, b)
    return dist_pair(a, b, Metric.L2)


def cosine_distance(a, b) -> jax.Array:
    """``<=>`` operator (embedding--0.3.6.sql:35-38; embedding.c:1048-1054)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    _check_dims(a, b)
    return dist_pair(a, b, Metric.COSINE)


def manhattan_distance(a, b) -> jax.Array:
    """``<~>`` operator (embedding--0.3.6.sql:39-42; embedding.c:1056-1062)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    _check_dims(a, b)
    return dist_pair(a, b, Metric.MANHATTAN)
