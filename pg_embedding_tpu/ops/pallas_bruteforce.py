"""Pallas fused brute-force top-k kernel — exact k-NN at MXU speed.

The jnp exact path (ops/bruteforce.py) materializes a [B, chunk] distance
tile to HBM and runs lax.top_k per chunk; the merge dominates.  This kernel
keeps everything on-chip: a query tile stays resident in VMEM, corpus tiles
stream through VMEM (the Pallas pipeline double-buffers the HBM loads),
distances are one MXU dot per tile pair, and an exact running top-k per
query is maintained in VMEM scratch across the corpus dimension with K
vectorized selection passes — distances never round-trip to HBM.  This is
the TPU-native formulation of the seq-scan exact path (reference:
embedding.c:1022-1038) and the engine behind the batched serving fast path;
cf. the TPU-KNN approach (PAPERS.md).

Layout: everything is QUERY-IN-LANES — scores are [TILE_N, QT] with QT=128
queries across the 128 VPU lanes, so the per-query min/argmin selection
reductions run along the SUBLANE axis (the fast reduction direction);
reducing along lanes instead makes the selection passes dominate the
kernel.  The running top-k lives as [K, QT] scratch.

Supports L2 and cosine (matmul forms). Manhattan has no matmul form and
stays on the jnp path.

Grid: (query tiles, corpus tiles) — corpus is the MINOR (fastest-moving)
dimension, so the running top-k scratch carries across corpus steps and is
re-initialized whenever a new query tile starts.  A tile-level early-out
skips the selection passes when a corpus tile holds nothing better than the
current per-query worst (common once the top-k converges).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Metric

_INF = float("inf")


def _insert_pass(run_d, run_i, m, gid):
    """Vectorized sorted-insert of one (m, gid) per LANE (query) into
    ascending [K, QT] running arrays."""
    pos = jnp.sum((run_d < m[None, :]).astype(jnp.int32), axis=0)  # [QT]
    rows = jax.lax.broadcasted_iota(jnp.int32, run_d.shape, 0)
    prev_d = jnp.concatenate([run_d[:1], run_d[:-1]], axis=0)
    prev_i = jnp.concatenate([run_i[:1], run_i[:-1]], axis=0)
    at = rows == pos[None, :]
    after = rows > pos[None, :]
    new_d = jnp.where(at, m[None, :], jnp.where(after, prev_d, run_d))
    new_i = jnp.where(at, gid[None, :], jnp.where(after, prev_i, run_i))
    return new_d, new_i


def _bruteforce_kernel(n_valid_ref, q_ref, qnorm_ref, pts_ref,
                       del_ref, out_d_ref, out_i_ref, scores, pnorm_acc,
                       run_d, run_i,
                       *, k: int, tile_n: int, metric_value: int,
                       n_tiles: int, d_tiles: int, select_head: int):
    ti = pl.program_id(1)
    di = pl.program_id(2)

    @pl.when((ti == 0) & (di == 0))
    def _init():
        run_d[:] = jnp.full_like(run_d[:], _INF)
        run_i[:] = jnp.full_like(run_i[:], -1)

    q = q_ref[:]                                   # [QT, D_CHUNK]
    pts = pts_ref[:]                               # [TILE_N, D_CHUNK]
    # scores transposed: [TILE_N, QT] — queries in lanes. Wide dims
    # (e.g. GIST 960-d) are tiled over the innermost grid axis and the
    # query-point dot accumulates into the scores scratch.
    #
    # Precision: TPU f32 matmuls default to ONE bf16 MXU pass (~2^-9
    # relative error — at |p||q| ~ 2e3 that is O(1) absolute on scores and
    # displaces true neighbors MANY ranks, unfixable by any sane rerank
    # pad).  Requesting Precision.HIGHEST fixes accuracy but its in-kernel
    # lowering blows the scoped-VMEM stack past 16MB at the fast tile
    # shapes, so do the bf16x3 split by hand, accumulating each single-pass
    # product straight into the scores scratch (one [TILE_N, QT] live
    # temporary at a time).  Dropping the lo*lo term leaves ~2^-18 relative
    # error — far below inter-neighbor spacing; _RERANK_PAD covers it.
    p_hi = pts.astype(jnp.bfloat16)
    p_lo = (pts - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    q_hi = q.astype(jnp.bfloat16)
    q_lo = (q - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def _dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # [TILE_N, QT]

    # Row norms are computed IN-KERNEL from the points tile already resident
    # in VMEM for the matmul (a VPU square+lane-reduce, negligible next to
    # the three MXU passes).  A host-side f32[N, 1] norms operand costs
    # 128x lane padding in HBM — 7.7GB at 16M rows, the round-4 10M-oracle
    # OOM — for 62MB of payload.
    p32 = pts.astype(jnp.float32)
    pn = jnp.sum(p32 * p32, axis=1, keepdims=True)  # [TILE_N, 1]

    @pl.when(di == 0)
    def _acc_init():
        scores[:] = _dot(p_hi, q_hi)
        pnorm_acc[:] = pn

    @pl.when(di > 0)
    def _acc():
        scores[:] = scores[:] + _dot(p_hi, q_hi)
        pnorm_acc[:] = pnorm_acc[:] + pn

    scores[:] = scores[:] + _dot(p_hi, q_lo)
    scores[:] = scores[:] + _dot(p_lo, q_hi)

    @pl.when(di == d_tiles - 1)
    def _select_phase():
        _finalize_and_select(ti, n_valid_ref, qnorm_ref, pnorm_acc, del_ref,
                             out_d_ref, out_i_ref, scores, run_d, run_i,
                             k=k, tile_n=tile_n, metric_value=metric_value,
                             n_tiles=n_tiles, select_head=select_head)


def _finalize_and_select(ti, n_valid_ref, qnorm_ref, pnorm_acc, del_ref,
                         out_d_ref, out_i_ref, scores, run_d, run_i, *,
                         k: int, tile_n: int, metric_value: int,
                         n_tiles: int, select_head: int):
    pq = scores[:]                                 # accumulated [TILE_N, QT]
    if metric_value == Metric.L2.value:
        pnorm = pnorm_acc[:]                       # [TILE_N, 1] |p|^2
        qn = qnorm_ref[:]                          # [1, QT]    |q|^2
        s = jnp.maximum(pnorm + qn - 2.0 * pq, 0.0)
    elif metric_value == Metric.MANHATTAN.value:
        s = pq                                     # |a-b| sum, already final
    else:  # cosine
        pnorm = pnorm_acc[:]
        qn = qnorm_ref[:]
        s = 1.0 - pq * jax.lax.rsqrt(jnp.maximum(pnorm * qn, 1e-30))

    start = ti * tile_n
    # validity depends only on the ROW — keep it a [TILE_N, 1] column and
    # let the where broadcast, instead of materializing full-size iota /
    # mask temporaries (every live [TILE_N, QT] value counts against the
    # 16MB scoped-VMEM stack; the fast tile shapes sit right at the edge)
    rown = jax.lax.broadcasted_iota(jnp.int32, (s.shape[0], 1), 0)
    # tombstone mask arrives as an int8 [TILE_N, 1] column — already
    # sublane-oriented, so no in-kernel transpose (a lane-packed
    # penalty row measured 4x slower: the (1, TILE_N) -> (TILE_N, 1)
    # reshape scalarizes in Mosaic).  int8 matters: a BOOL column is
    # widened to s32 by the Mosaic ABI and lane-pads 128x in HBM —
    # 5.96 GB at 12.5M rows, the r5 filtered-sweep OOM; i8 tiles
    # (32, 128) for 1.49 GB, and zero bytes in the common no-tombstone
    # case (del_tiled=False maps one all-zero block to every step)
    # i8 -> f32 convert FIRST: a bool compared straight off the
    # (32,128)-tiled i8 block needs a lane broadcast Mosaic has not
    # implemented; after the convert the compare runs on an (8,128)
    # f32 column and broadcasts like the row-validity mask.  Masked
    # rows stay _INF (never admitted even into empty slots — the
    # delete-all edge keeps returning -1 indices)
    deadf = del_ref[:].astype(jnp.float32)         # [TILE_N, 1]
    ok = ((start + rown) < n_valid_ref[0]) & (deadf == 0.0)
    s = jnp.where(ok, s, _INF)
    scores[:] = s

    # tile-level early-out: skip the selection passes when this corpus tile
    # holds nothing better than the current per-query worst (the per-query
    # tile-min is a cheap sublane reduce; no full-size mask temp)
    tile_min = jnp.min(s, axis=0)                  # [QT]
    tile_has_candidates = jnp.any(tile_min < run_d[k - 1, :])

    def _passes(n_passes):
        for _ in range(n_passes):
            sc = scores[:]
            m = jnp.min(sc, axis=0)                # [QT] sublane reduce
            a = jnp.argmin(sc, axis=0)             # [QT]
            gid = start + a
            rd, ri = run_d[:], run_i[:]
            better = m < rd[k - 1, :]
            nd, ni = _insert_pass(rd, ri, m, gid)
            run_d[:] = jnp.where(better[None, :], nd, rd)
            run_i[:] = jnp.where(better[None, :], ni, ri)
            rows = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 0)
            scores[:] = jnp.where(rows == a[None, :], _INF, sc)

    # Once the running top-k is warm, a corpus tile almost never holds more
    # than a few candidates per query (expected k*tile_n/N), so run a few
    # passes unconditionally and gate the rest behind ONE conditional per
    # tile.  (One dynamic branch per tile is fine — round 1 shipped that;
    # a branch per PASS measured 50x slower: dynamic conditionals break
    # Mosaic's pipelining.)
    head = min(select_head, k)

    @pl.when(tile_has_candidates)
    def _select():
        _passes(head)
        if k > head:
            more = jnp.any(jnp.min(scores[:], axis=0) < run_d[k - 1, :])

            @pl.when(more)
            def _tail():
                _passes(k - head)

    @pl.when(ti == n_tiles - 1)
    def _finish():
        d = run_d[:]
        if metric_value == Metric.L2.value:
            d = jnp.sqrt(d)                        # reference returns sqrt'd
        out_d_ref[:] = d
        out_i_ref[:] = run_i[:]


@functools.partial(jax.jit,
                   static_argnames=("k", "metric_value", "tile_n", "tile_q",
                                    "tile_d", "interpret", "select_head",
                                    "del_tiled"))
def _pallas_exact(queries, points, deleted, n_valid, *, k: int,
                  metric_value: int, tile_n: int, tile_q: int, tile_d: int,
                  interpret: bool, select_head: int = 64,
                  del_tiled: bool = True):
    b, d = queries.shape
    n_pad = points.shape[0]
    n_tiles = n_pad // tile_n
    q_tiles = b // tile_q
    d_tiles = d // tile_d
    out_specs = (
        pl.BlockSpec((k, tile_q), lambda qi, ti, di: (0, qi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, tile_q), lambda qi, ti, di: (0, qi),
                     memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((k, b), jnp.float32),
        jax.ShapeDtypeStruct((k, b), jnp.int32),
    )
    scratch_shapes = [
        pltpu.VMEM((tile_n, tile_q), jnp.float32),   # scores / qp acc
        pltpu.VMEM((tile_n, 1), jnp.float32),        # |p|^2 acc (in-kernel)
        pltpu.VMEM((k, tile_q), jnp.float32),        # running top-k d
        pltpu.VMEM((k, tile_q), jnp.int32),          # running top-k i
    ]

    # aux vectors as 2-D: 1-D blocked operands trip Mosaic/XLA layout
    # tiling mismatches
    qnorms = jnp.sum(queries.astype(jnp.float32) ** 2, axis=1)[None, :]

    # tombstones as an int8 [N, 1] column (see the kernel note: bool
    # widens to s32 and lane-pads 128x — 5.96 GB at 12.5M, the r5
    # filtered-sweep OOM; a lane-packed penalty row avoids the HBM cost
    # but its in-kernel transpose scalarizes, measured 4x slower; i8
    # keeps the sublane orientation at (32, 128) tiling = 1.49 GB at
    # 12.5M).  With no tombstones (del_tiled=False, the common
    # serving/oracle case) the operand is ONE all-zero (tile_n, 1)
    # block mapped to every grid step — never materialized full-size.
    if del_tiled:
        del_spec = pl.BlockSpec((tile_n, 1), lambda qi, ti, di: (ti, 0),
                                memory_space=pltpu.VMEM)
    else:
        del_spec = pl.BlockSpec((tile_n, 1), lambda qi, ti, di: (0, 0),
                                memory_space=pltpu.VMEM)

    kernel = functools.partial(_bruteforce_kernel, k=k, tile_n=tile_n,
                               metric_value=metric_value, n_tiles=n_tiles,
                               d_tiles=d_tiles, select_head=select_head)
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=(q_tiles, n_tiles, d_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),               # n_valid
            pl.BlockSpec((tile_q, tile_d), lambda qi, ti, di: (qi, di),
                         memory_space=pltpu.VMEM),               # queries
            pl.BlockSpec((1, tile_q), lambda qi, ti, di: (0, qi),
                         memory_space=pltpu.VMEM),               # qnorms
            pl.BlockSpec((tile_n, tile_d), lambda qi, ti, di: (ti, di),
                         memory_space=pltpu.VMEM),               # points tile
            del_spec,                                            # deleted
        ],
        out_specs=out_specs, out_shape=out_shape,
        scratch_shapes=scratch_shapes, interpret=interpret,
        # the in-kernel norm accumulator pushes the fast tile shapes ~1MB
        # past Mosaic's default 16MB scoped-VMEM budget; v5e has 128MB of
        # VMEM, so raise the cap rather than shrink the measured tiles
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(n_valid, queries, qnorms, points, deleted)
    # back to [B, K]
    return out_d.T, out_i.T


# --------------------------------------------------------------------- #
# measured tile autotuning (opt-in; ROADMAP #2)
# --------------------------------------------------------------------- #
#
# The static tile table below was measured once at 100k x 128d on v5e;
# other (metric, dims, k) points inherit it.  autotune_tiles() measures a
# small candidate grid ON THE REAL DEVICE and persists the winner to a
# JSON cache keyed by (backend, metric, padded dims, k bucket); the entry
# point consults the cache before the static heuristics, so a one-time
# probe upgrades every later call with those shapes.  Off-TPU (interpret
# mode) timings are meaningless, so autotuning is TPU-only.

_TILE_CACHE: dict | None = None

# Factory calibration shipped with the package: autotune_tiles results
# measured on real hardware and committed, so a fresh machine (or a wiped
# ~/.cache) still starts from measured tiles rather than the static
# heuristics.  Precedence: explicit tile args > user cache (a local
# autotune_tiles run) > this file > static table.
_FACTORY_TILES_PATH: str | None = None  # default resolved lazily

# First-serve auto-probe: when a TPU serve hits a (metric, dims, k) point
# with no measured tiles anywhere (user cache, factory file), run one
# cheap quick-grid autotune and persist the winner, so the second call
# onward uses measured tiles with no manual step.  The cost is a handful
# of kernel compiles + ~1s of timing, once per machine per point (the HLO
# cache amortizes compiles across processes).  Disable with
# PG_EMB_AUTO_PROBE=0 (strict first-call latency).  Never fires under
# tracing (shard_map serving passes tracers) and never retries a point
# that failed or was probed this process.
_PROBE_ATTEMPTED: set = set()


def _auto_probe_enabled() -> bool:
    import os

    return os.environ.get("PG_EMB_AUTO_PROBE", "1") != "0"


def _probe_uncovered(metric, d_pad: int, k_run: int, dims: int, k: int,
                     n_rows: int, queries, points):
    """One-shot quick autotune for an uncovered tile-cache point (the
    first-serve auto-probe).  Probes at the serving corpus size, capped
    at 256k rows (probe cost stays bounded; larger corpora reach the
    probed entry via _lookup_tiles' nearest-bucket fallback).  Returns
    the entry measured by the probe, or None when probing is
    disabled/unavailable/already tried."""
    n_probe = min(int(n_rows), 262_144)
    key = _tile_key(metric, d_pad, k_run, n_probe)
    if not _auto_probe_enabled() or key in _PROBE_ATTEMPTED:
        return None
    if (isinstance(queries, jax.core.Tracer)
            or isinstance(points, jax.core.Tracer)):
        return None                      # traced serve (shard_map etc.)
    if jax.default_backend() not in ("tpu", "axon"):
        return None
    _PROBE_ATTEMPTED.add(key)
    try:
        autotune_tiles(dims, metric, k=k, n=n_probe, quick=True)
    except Exception:
        pass                             # static table is the fallback
    return _lookup_tiles(metric, d_pad, k_run, n_rows)


def _tile_cache_path() -> str:
    import os

    root = os.environ.get("PG_EMB_TUNE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "pg_embedding_tpu")
    return os.path.join(root, "exact_tiles.json")


def _load_json(path: str) -> dict:
    import json
    import os

    if os.path.exists(path):
        try:
            with open(path) as f:
                loaded = json.load(f)
            if isinstance(loaded, dict):
                return loaded
        except Exception:
            pass
    return {}


def _tile_cache() -> dict:
    global _TILE_CACHE
    if _TILE_CACHE is None:
        import os

        _TILE_CACHE = _load_json(_tile_cache_path())
        factory = _FACTORY_TILES_PATH or os.path.join(
            os.path.dirname(__file__), "exact_tiles_factory.json")
        for key, val in _load_json(factory).items():
            _TILE_CACHE.setdefault(key, val)
    return _TILE_CACHE


def _tile_key(metric, d_pad: int, k_run: int, n_rows: int) -> str:
    """Cache key includes a power-of-two CORPUS-ROWS bucket: the winning
    tile pair is scale-dependent (at 100k x 128d the big (1024, 1536)
    tiles win — the corpus streams once per batch; at 262k the grid
    prefers (256, 512)), so a tune at one scale must not silently govern
    a very different one — the same lesson as the exact8 chunk cache's
    capacity bucket (api._exact8_chunk_key)."""
    kb = 1 << (max(int(k_run), 1) - 1).bit_length()   # k bucket (pow2)
    nb = 1 << max(int(n_rows) - 1, 1).bit_length()    # rows bucket (pow2)
    return f"{jax.default_backend()}:{metric.name}:{d_pad}:{kb}:{nb}"


def _lookup_tiles(metric, d_pad: int, k_run: int, n_rows: int):
    """Exact-bucket hit first, else the NEAREST measured rows-bucket for
    the same (backend, metric, d_pad, k) — a 1M tune is a far better
    guess for 2M serving than the static table.  Entries are only used up
    to the k they were proven to compile at (hit[2], the VMEM k-guard)."""
    cache = _tile_cache()
    hit = cache.get(_tile_key(metric, d_pad, k_run, n_rows))
    if hit is not None and k_run <= int(hit[2]):
        return hit
    import math

    kb = 1 << (max(int(k_run), 1) - 1).bit_length()
    prefix = f"{jax.default_backend()}:{metric.name}:{d_pad}:{kb}:"
    want = math.log2(max(int(n_rows), 1))
    best, best_dist = None, None
    for key, val in cache.items():
        if not key.startswith(prefix) or k_run > int(val[2]):
            continue
        try:
            dist = abs(math.log2(int(key[len(prefix):])) - want)
        except ValueError:
            continue
        if best_dist is None or dist < best_dist:
            best, best_dist = val, dist
    return best


def autotune_tiles(dims: int, metric=Metric.L2, k: int = 10,
                   n: int = 262_144, batch: int = 1024, reps: int = 4,
                   rounds: int = 3, save: bool = True, candidates=None,
                   verbose=False, quick: bool = False):
    """Measure candidate (tile_q, tile_n) pairs for the exact kernel at
    this (metric, dims, k) point on the current device and cache the
    winner for future pallas_exact_search calls.  Returns
    (best_tile_q, best_tile_n, qps).

    Timing discipline: one warm call per candidate (compile), then
    ``reps`` streamed calls with a single host sync (on the axon tunnel
    only host materialization truly blocks).  Candidates that fail to
    compile (VMEM overflow at high k) are skipped.

    Noise discipline: on shared devices external load spreads a single
    timing window 2-3x (measured on the tunneled v5e: two back-to-back
    full scans ranked DIFFERENT winners), and the noise is one-sided —
    contention only ever slows a window down.  So candidates are swept in
    ``rounds`` interleaved passes and each keeps its BEST (minimum-time)
    window; a load spike then hurts one pass of one candidate instead of
    that candidate's whole measurement."""
    import json
    import os
    import time

    from ..config import resolve_metric
    from .bruteforce import _RERANK_PAD

    metric = resolve_metric(metric)
    if metric is Metric.MANHATTAN:
        raise ValueError("Manhattan routes to the XLA sweep; no tiles")
    if jax.default_backend() not in ("tpu", "axon"):
        raise RuntimeError("autotune_tiles needs a real TPU backend")

    import numpy as np

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(n, dims)).astype(np.float32))
    qs = jnp.asarray(rng.normal(size=(batch, dims)).astype(np.float32))
    k_run = k + _RERANK_PAD if metric is Metric.L2 else k
    d_pad = (max(((dims + 127) // 128) * 128, 128) if dims <= 256
             else ((dims + 255) // 256) * 256)
    if quick:
        # first-serve auto-probe budget: 4 candidates bracketing the
        # static default for this (metric, width) region, bounded corpus,
        # 2x2 timing.  The full grid is the opt-in autotune_tiles() run.
        n = min(n, 262_144)
        reps, rounds = min(reps, 2), min(rounds, 2)
        if candidates is None:
            if metric is Metric.L2 and dims <= 256:
                candidates = [(1024, 1536), (1024, 1024),
                              (512, 1536), (512, 2048)]
            else:
                candidates = [(512, 1024), (512, 1536),
                              (256, 1024), (1024, 1024)]
    if candidates is None:
        qt = (256, 512, 1024)
        nt = (512, 1024, 1536, 2048)
        candidates = [(a, b) for a in qt for b in nt]

    best_qps: dict = {}
    failed: set = set()
    for rnd in range(max(int(rounds), 1)):
        for tq, tn in candidates:
            if (tq, tn) in failed:
                continue
            try:
                d, i = pallas_exact_search(qs, pts, k, metric, tile_q=tq,
                                           tile_n=tn, interpret=False)
                np.asarray(d)                       # compile + warm
                t0 = time.time()
                for _ in range(reps):
                    d, i = pallas_exact_search(qs, pts, k, metric,
                                               tile_q=tq, tile_n=tn,
                                               interpret=False)
                np.asarray(d)                       # one true sync
                qps = reps * batch / (time.time() - t0)
            except Exception as e:                  # VMEM overflow etc.
                failed.add((tq, tn))
                if verbose and rnd == 0:
                    print(f"  tiles ({tq},{tn}): failed "
                          f"({type(e).__name__})")
                continue
            key = (tq, tn)
            best_qps[key] = max(best_qps.get(key, 0.0), qps)
            if verbose:
                print(f"  tiles ({tq},{tn}) round {rnd}: {qps:.0f} QPS"
                      f" (best {best_qps[key]:.0f})")
    if not best_qps:
        raise RuntimeError("no tile candidate compiled")
    (btq, btn), bq = max(best_qps.items(), key=lambda kv: kv[1])
    best = (btq, btn, bq)
    cache = _tile_cache()
    # k_run recorded so lookups never use tiles past the k they were
    # proven to compile at (selection-pass VMEM grows with k)
    cache[_tile_key(metric, d_pad, k_run, n)] = [best[0], best[1], k_run]
    if save:
        p = _tile_cache_path()
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cache, f, indent=1)
        os.replace(tmp, p)
    return best


def pallas_exact_search(queries, points, k: int, metric=Metric.L2,
                        n_valid=None, deleted=None, tile_n: int | None = None,
                        tile_q: int | None = None,
                        interpret: bool | None = None,
                        select_head: int = 64):
    """Exact top-k — the unified fast-path entry point for all three
    metrics.

    L2/cosine run the fused Pallas MXU kernel. Manhattan has no matmul
    form; its fast path IS XLA's fused VPU sweep (ops.bruteforce), to which
    this routes — a hand-written Pallas per-dim |a-b| kernel was measured
    SLOWER (21k vs 37k QPS at 20k x 128d on v5e: Mosaic's (8,128) lane
    layout makes per-dim column broadcasts cost a full padded tile each,
    while XLA fuses the broadcast-abs-reduce natively).  Mirrors the
    reference, where Manhattan is likewise the scalar/autovectorized path
    (distfunc.c:147-155).

    Same contract as ops.bruteforce.exact_search. ``interpret`` defaults to
    True off-TPU (CPU tests) and False on TPU. The query batch is padded to
    a multiple of tile_q (lane width); corpus to tile_n.
    """
    from ..config import resolve_metric
    from .bruteforce import exact_search as _jnp_exact

    metric = resolve_metric(metric)
    if metric is Metric.MANHATTAN:
        return _jnp_exact(queries, points, k, metric, n_valid=n_valid,
                          deleted=deleted)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    queries = jnp.asarray(queries, jnp.float32)
    points = jnp.asarray(points)
    # n_valid may be a traced scalar (e.g. per-shard counts inside
    # shard_map); only its value is needed, never its Python int
    n = points.shape[0] if n_valid is None else n_valid
    b = queries.shape[0]
    # L2: over-fetch + exact elementwise rerank — the matmul expansion's f32
    # cancellation flips near-tied top-k memberships (ops/bruteforce.py
    # _RERANK_PAD note); the kernel finds k+pad by matmul score, the rerank
    # re-scores those rows with the difference form
    from .bruteforce import _RERANK_PAD, _rerank_exact
    k = int(k)
    k_run = k + _RERANK_PAD if metric is Metric.L2 else k
    orig_points = points

    # Measured-tile cache first (autotune_tiles, ROADMAP #2): a one-time
    # on-device probe at this (metric, dims, k) point beats the static
    # table; entries are only used up to the k they were proven at.
    if tile_q is None and tile_n is None and not interpret:
        d0k = queries.shape[1]
        dpk = (max(((d0k + 127) // 128) * 128, 128) if d0k <= 256
               else ((d0k + 255) // 256) * 256)
        n_rows = orig_points.shape[0]
        hit = _lookup_tiles(metric, dpk, k_run, n_rows)
        if hit is None:
            # uncovered point on a real TPU serve: one quick measured
            # probe, persisted, instead of the static table forever
            hit = _probe_uncovered(metric, dpk, k_run, d0k, k, n_rows,
                                   queries, points)
        if hit and k_run <= int(hit[2]):
            tile_q, tile_n = int(hit[0]), int(hit[1])

    # Static tile table (measured on v5e, 100k x 128d x 1024 queries):
    #   L2 narrow:  tq=1024/tn=1536 -> 135k QPS (corpus streams once/batch)
    #   cosine:     tq=512/tn=1536  -> 46k (its finalize needs ~50% more
    #               VMEM stack than L2; bigger tiles OOM the 16MB budget)
    #   wide d>256: tq=512/tn=1024  -> 28k at 960-d
    wide = queries.shape[1] > 256
    if tile_q is None:
        tile_q = 1024 if (metric is Metric.L2 and not wide) else 512
    if tile_n is None:
        tile_n = 1024 if wide else 1536
        # the selection phase is an unrolled k_run-pass loop over the
        # [tile_n, tile_q] scores tile; Mosaic's scoped-VMEM stack grows
        # with both, and at k_run=20/tile_n=1536/tile_q=1024 it overflows
        # the 16MB budget (measured: 17.63M).  Shrink the corpus tile as
        # k grows — corpus tiles just stream more, throughput loss is
        # small next to an OOM.
        if k_run > 12:
            tile_n = min(tile_n, 1024 if k_run <= 24 else
                         (640 if k_run <= 48 else 384))

    # wide dims (GIST 960-d etc.) are tiled over the innermost grid axis;
    # zero-padding D changes neither dots nor norms
    d0 = queries.shape[1]
    if d0 <= 256:
        if d0 % 8 == 0:
            # consume the corpus at its stored width: padding narrow D up
            # to 128 lanes materializes a whole-corpus HBM copy (6.4 GB
            # at 12.5M x 96d — with the tombstone column, the r5
            # shard-125 oracle OOM).  The single D block covers the full
            # axis, so Mosaic pads the VMEM tiles internally and the
            # kernel's dots/norms reduce over the logical extent only
            # (verified bit-equal to the padded path on hardware at 96d).
            d_pad = d0
        else:
            d_pad = max(((d0 + 127) // 128) * 128, 128)
        tile_d = d_pad
    else:
        d_pad = ((d0 + 255) // 256) * 256
        tile_d = 256
        # wide dims: shrink the corpus tile so the double-buffered point
        # tiles + scores scratch stay inside the 16MB VMEM budget
        tile_n = min(tile_n, 1024)
    if d_pad != d0:
        queries = jnp.pad(queries, ((0, 0), (0, d_pad - d0)))
        points = jnp.pad(points, ((0, 0), (0, d_pad - d0)))

    tile_q = min(tile_q, max(((b + 7) // 8) * 8, 8))
    b_pad = ((b + tile_q - 1) // tile_q) * tile_q
    if b_pad != b:
        queries = jnp.pad(queries, ((0, b_pad - b), (0, 0)))

    tile_n = min(tile_n, max(((points.shape[0] + 127) // 128) * 128, 128))
    n_pad = ((points.shape[0] + tile_n - 1) // tile_n) * tile_n
    if n_pad != points.shape[0]:
        points = jnp.pad(points, ((0, n_pad - points.shape[0]), (0, 0)))
    # Row norms are computed inside the kernel (see _bruteforce_kernel) —
    # a host-side f32[N, 1] operand pads 128x in HBM.  Same for the deleted
    # mask: with no tombstones a single all-false block stands in for the
    # whole column (del_tiled=False below).
    if deleted is None:
        del_col = jnp.zeros((tile_n, 1), jnp.int8)
        del_tiled = False
    else:
        deleted = jnp.asarray(deleted, jnp.bool_)
        if deleted.shape[0] != n_pad:
            deleted = jnp.pad(deleted, (0, n_pad - deleted.shape[0]))
        del_col = deleted.astype(jnp.int8)[:, None]
        del_tiled = True
    out_d, out_i = _pallas_exact(queries, points, del_col,
                                 jnp.asarray(n, jnp.int32).reshape(1),
                                 k=k_run,
                                 metric_value=metric.value, tile_n=tile_n,
                                 tile_q=tile_q, tile_d=tile_d,
                                 interpret=bool(interpret),
                                 select_head=int(select_head),
                                 del_tiled=del_tiled)
    if k_run != k:
        return _rerank_exact(queries[:b, : orig_points.shape[1]],
                             orig_points, out_i[:b], k=k,
                             metric_value=metric.value)
    return out_d[:b], out_i[:b]
