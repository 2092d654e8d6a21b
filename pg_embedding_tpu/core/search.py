"""Batched ef-bounded best-first graph search — the TPU searchBaseLayer.

The reference's hot loop (hnswalg.cpp:42-114) is a best-first traversal with
two priority queues and a growable visited bitmap, one buffer pin + one SIMD
distance per neighbor visit.  The TPU formulation keeps the exact algorithmic
contract but restructures the data for XLA:

  * priority queues  -> fixed-width distance-sorted arrays maintained by
                        concat + top-k ("masked merge"), inf/-1 padded
  * visited bitset   -> u32-word bitmap per query (same layout as
                        hnswalg.cpp:45-64: word = id >> 5, bit = id & 31),
                        updated with disjoint-bit scatter-adds
  * the while loop   -> jax.lax.while_loop with the reference's exact
                        termination rule (stop when the best unexpanded
                        candidate is farther than the worst kept result,
                        hnswalg.cpp:69-71)
  * the gating rule  -> dist < worst_kept OR results not full
                        (hnswalg.cpp:99), expressed as a mask
  * per-neighbor distance calls -> one gather of T whole neighbor rows
                        [T*maxM, D] + one vectorized distance (the
                        hnsw_prefetch latency hiding at embedding.c:845-850
                        becomes a single coalesced HBM gather)
  * one query per backend      -> jax.vmap over a query batch

Beam widening (``expand_width`` = T): instead of popping ONE candidate per
step, pop the best T and expand them together.  Iteration count drops ~T-fold
and the per-step gather/distance work is T times larger (far better TPU
utilization).  Semantics: expansion of candidate j is masked unless
d_j <= lowerBound at the *start* of the step; the reference applies the same
test against a monotonically-shrinking lowerBound one pop at a time, so the
T-wide expansion set is a SUPERSET of the reference's — extra expansions can
only add results, so recall(T) >= recall(1) with the same result-set gate
(verified in tests/test_search_parity.py::test_expand_width_recall).

Semantic notes (validated against core.refimpl in tests):
  - With results-not-full, the reference's lowerBound (= current worst kept)
    can never be exceeded by any queued candidate (every queued candidate was
    simultaneously pushed into topResults), so padding the result array with
    +inf reproduces both the gate and the termination test exactly.
  - The candidate queue is truncated to a static width ``cand_cap`` (default
    ef).  Any truncated candidate is farther than cand_cap better ones;
    expansions are best-first and only shrink lowerBound, so truncation only
    drops candidates that would overwhelmingly have failed the termination
    test.  Recall parity is established empirically in
    tests/test_search_parity.py (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.distance import dist_one_to_many
from .graph import GraphState

_INF = jnp.inf


class SearchStats(NamedTuple):
    hops: jax.Array        # i32[B] — loop steps per query
    dist_evals: jax.Array  # i32[B] — distance computations per query


def _merge_topk(d_a, i_a, d_b, i_b, k: int):
    """Merge two (dist, idx) sets, keep the k smallest by distance.

    lax.top_k on negated distances: descending in -d == ascending in d;
    ties resolve to the lower concatenated position, i.e. incumbents (set a)
    win — matching the reference heaps' keep-the-incumbent behavior closely
    enough for parity tests."""
    d = jnp.concatenate([d_a, d_b])
    i = jnp.concatenate([i_a, i_b])
    neg, sel = jax.lax.top_k(-d, k)
    return -neg, i[sel]


def _search_one(graph: GraphState, query: jax.Array, *, ef: int,
                metric_value: int, cand_cap: int,
                expand_width: int = 1, qvectors=None, qscale=None,
                pcodes=None, pscales=None, pq_codebook=None,
                query_t=None, visited_slots: int = -1):
    """searchBaseLayer for a single query. Returns (res_d[ef], res_i[ef],
    hops, dist_evals); results ascending, -1/inf padded.

    Quantized traversal: when ``qvectors`` (int8[cap, D]) and ``qscale``
    (f32[cap] per-row scales) are given, the hot-loop neighbor gathers move
    int8 rows and
    the final ef results are RERANKED with exact full-precision distances,
    so returned distances keep reference semantics and only the traversal
    order is approximate (cf. quantize-then-rerank, PAPERS.md AQR-HNSW).
    Measured on v5e at 1M x 128d: throughput-neutral (the random row gather
    is transaction-bound, not byte-bound) with a small recall gain from the
    rerank; its practical value is the 4x smaller traversal copy for
    memory-tight serving.

    Packed traversal: when ``pcodes`` (FLAT int8[cap, maxM*D]) and ``pscales``
    (f32[cap, maxM]) are given, each node's NEIGHBORS' int8 codes are
    co-located in one contiguous record, so expanding T candidates costs T
    contiguous record gathers instead of T*maxM random row gathers — the
    TPU answer to the reference's page locality (one begin_read pulls the
    whole node record, embedding.c:226-231,704-767).  The graph walk is
    HBM-transaction-bound (BASELINE.md profiling note), so collapsing the
    transaction count is the lever that actually moves it.  Same exact
    rerank as the quantized path.

    PQ traversal: when ``pq_codebook`` (f32[G, 256, D/G], ops/pq.py) is
    also given, ``pcodes`` holds PQ codes (flat uint8[cap, maxM*G]) instead of
    int8 dims — D/G-fold smaller records than int8 packing (the regime
    where int8 records exceed HBM: 41GB at 10M x 128d x maxM=32 vs 5.1GB
    at G=16).  Decoding is a register-level codebook gather (the TPU ADC —
    see ops/pq.py) feeding the same dense distance; the exact rerank below
    restores full-precision ordering of the surfaced ef.

    ``query_t`` (optional) replaces the query for TRAVERSAL distances only
    — the OPQ hook (ops/pq.train_opq): with rotated codebooks the decoded
    rows live in the rotated space, so the walk compares them against
    q @ R while the entry distance and the exact rerank keep the original
    query against the original f32 rows (rotation-invariant metrics make
    both spaces approximate the same true distances).

    Visited set: ``visited_slots == -1`` (the default used by the API) is
    the DENSE-DEDUPE mode — no visited memory at all.  The reference's
    visited bitmap exists to stop re-evaluating seen nodes
    (hnswalg.cpp:45-64), but it is provably redundant given the queues:
    any node admitted earlier either (a) still sits in the result or
    candidate queue — caught by an all-lanes compare of the new neighbor
    ids against both queues (pure VPU, zero memory transactions) — or
    (b) was displaced from the results, which can only happen once
    res is full with entries all <= worst, so its distance >= the current
    worst and the admit gate rejects it (the gate bound is monotonically
    tightening).  Induction on steps: while results are not full every
    admitted node is in res (inf slots lose any merge), so (a)/(b) is
    exhaustive.  Rejected-but-never-admitted nodes may be re-SCORED
    (wasted VPU work the reference's bitmap avoids), but never admitted,
    expanded, or duplicated.  Identical results to the bitmap mode
    (pinned by tests/test_search_parity.py::test_dense_matches_bitmap),
    while eliminating BOTH the per-query cap/8-byte bitmap (12.5MB/query
    at 100M rows — SURVEY.md §7 "visited-set memory") and the dominant
    per-step HBM cost: the bitmap's T*maxM scattered word reads + writes
    per step were ~16x more random transactions than the link/vector
    gathers themselves.

    ``visited_slots == 0`` keeps the exact per-query bitmap (u32 words,
    the hnswalg.cpp:45-64 layout) as a cross-check oracle.
    ``visited_slots = 2^s`` is a fixed-size open-hash table with overwrite
    (4-way buckets): collisions may OVERWRITE older entries, so a node can
    occasionally be re-expanded (wasted work, never wrong results) and
    duplicate ids can reach the result queue — removed by a final
    id-dedupe pass.  32KB/query at 8192 slots regardless of corpus size."""
    cap = graph.capacity
    max_m = graph.max_m
    n_words = cap // 32
    t = expand_width
    tm = t * max_m
    qt = query if query_t is None else query_t
    use_dense = visited_slots < 0
    use_hash = visited_slots > 0
    if use_hash:
        assert visited_slots & (visited_slots - 1) == 0, \
            "visited_slots must be a power of two"
        hmask = jnp.uint32(visited_slots - 1)
        # Knuth multiplicative hash; bucket = 4 consecutive slots
        hprime = jnp.uint32(2654435761)

    # --- entry point: node 0, hardwired (embedding.c:235) -----------------
    has_nodes = graph.n_nodes > 0
    d0 = dist_one_to_many(query, graph.vectors[0][None, :], metric_value)[0]
    d0 = jnp.where(has_nodes, d0, _INF)
    i0 = jnp.where(has_nodes, 0, -1)

    res_d = jnp.full((ef,), _INF, jnp.float32).at[0].set(d0)
    res_i = jnp.full((ef,), -1, jnp.int32).at[0].set(i0)
    cand_d = jnp.full((cand_cap,), _INF, jnp.float32).at[0].set(d0)
    cand_i = jnp.full((cand_cap,), -1, jnp.int32).at[0].set(i0)

    def _buckets(ids):
        """4-slot bucket indices for each id (hash mode)."""
        h = (ids.astype(jnp.uint32) * hprime) & hmask & ~jnp.uint32(3)
        return (h[:, None] + jax.lax.broadcasted_iota(
            jnp.uint32, (ids.shape[0], 4), 1)).astype(jnp.int32)

    def _slot_choice(ids):
        """Deterministic per-id slot within its bucket (overwrite policy)."""
        return ((ids.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)) >> 30
                ).astype(jnp.int32)

    if use_dense:
        # no visited memory: dedupe is dense compares against the queues
        visited = jnp.zeros((1,), jnp.uint32)
    elif use_hash:
        visited = jnp.full((visited_slots,), -1, jnp.int32)
        zero = jnp.zeros((1,), jnp.int32)
        slot0 = _buckets(zero)[0, _slot_choice(zero)[0]]
        visited = visited.at[slot0].set(jnp.where(has_nodes, 0, -1))
    else:
        visited = jnp.zeros((n_words,), jnp.uint32).at[0].set(
            jnp.where(has_nodes, jnp.uint32(1), jnp.uint32(0)))

    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)[:, 0]
    slot_in_row = slot_ids % max_m

    def cond(state):
        res_d, res_i, cand_d, cand_i, visited, hops, evals = state
        lower_bound = res_d[ef - 1]  # inf while not full (see module doc)
        # continue while best candidate exists and is not strictly farther
        # than the worst kept result (hnswalg.cpp:69-71)
        go = (cand_d[0] < _INF) & ~(cand_d[0] > lower_bound)
        if use_hash:
            # overwritten table entries can re-admit already-expanded nodes;
            # a generous hop cap guarantees termination regardless
            go = go & (hops < visited_slots)
        return go

    def body(state):
        res_d, res_i, cand_d, cand_i, visited, hops, evals = state
        lower_bound = res_d[ef - 1]

        # --- pop the best T candidates (candidateSet.pop, hnswalg.cpp:73);
        # expansion masked where d > lowerBound: those would have terminated
        # the reference's loop, so this is a superset of its expansions ----
        pop_d = cand_d[:t]
        pop_i = cand_i[:t]
        expand = ~(pop_d > lower_bound) & (pop_i >= 0)
        cand_d = jnp.concatenate([cand_d[t:],
                                  jnp.full((t,), _INF, jnp.float32)])
        cand_i = jnp.concatenate([cand_i[t:], jnp.full((t,), -1, jnp.int32)])

        safe_cur = jnp.maximum(pop_i, 0)                 # [T]
        nbr_rows = graph.links[safe_cur]                 # [T, maxM]
        cnts = graph.link_counts[safe_cur]               # [T]
        nbrs = nbr_rows.reshape(tm)
        valid = ((slot_in_row < jnp.repeat(cnts, max_m)) & (nbrs >= 0) &
                 jnp.repeat(expand, max_m))

        safe_nbrs = jnp.where(valid, nbrs, 0)

        if use_dense:
            # dense dedupe (see module/function docs): a neighbor id is
            # skipped iff it currently sits in either queue or was popped
            # this very step — all-lanes compares, no memory transactions.
            # Anything else previously admitted is >= the current worst
            # and dies at the admit gate below.
            in_cand = jnp.any(safe_nbrs[:, None] == cand_i[None, :], axis=1)
            in_res = jnp.any(safe_nbrs[:, None] == res_i[None, :], axis=1)
            in_pop = jnp.any(safe_nbrs[:, None] == pop_i[None, :], axis=1)
            unvisited = ~(in_cand | in_res | in_pop)
        elif use_hash:
            buckets = _buckets(safe_nbrs)                      # [TM, 4]
            unvisited = ~jnp.any(visited[buckets] == safe_nbrs[:, None],
                                 axis=1)
        else:
            words = safe_nbrs >> 5
            bits = (jnp.uint32(1) << (safe_nbrs & 31).astype(jnp.uint32))
            unvisited = (visited[words] & bits) == 0

        # first-occurrence dedupe across the expanded rows (two popped
        # candidates may share neighbors; each id must be seen once so the
        # visited scatter stays conflict-free / the queues stay dup-free)
        eq_earlier = (safe_nbrs[None, :] == safe_nbrs[:, None]) & (
            slot_ids[None, :] < slot_ids[:, None])
        dup = jnp.any(eq_earlier & valid[None, :], axis=1)

        process = valid & unvisited & ~dup

        if use_hash:
            # insert into the chosen bucket slot; colliding ids overwrite
            # (older entries may be lost => possible re-expansion, see doc)
            ins = jnp.take_along_axis(buckets,
                                      _slot_choice(safe_nbrs)[:, None],
                                      axis=1)[:, 0]
            ins = jnp.where(process, ins, visited_slots)  # drop non-processed
            visited = visited.at[ins].set(safe_nbrs, mode="drop")
        elif not use_dense:
            # mark visited (hnswalg.cpp:92-93): bits are unset and pairwise
            # distinct within each word, so scatter-add == scatter-or
            add_bits = jnp.where(process, bits, jnp.uint32(0))
            visited = visited.at[words].add(add_bits)

        # --- fused gather + distance (replaces the per-neighbor
        #     begin_read/dist loop, hnswalg.cpp:89-98); int8 traversal
        #     gathers quarter the bytes and dequantizes in-register;
        #     packed traversal gathers T contiguous neighbor-code records
        #     (aligned with nbr_rows slot-for-slot) ------------------------
        if pcodes is not None:
            codes = pcodes[safe_cur]                     # [T, maxM*(D or G)]
            if pq_codebook is not None:                  # PQ codes
                from ..ops.pq import pq_decode_mxu
                nvecs = pq_decode_mxu(codes.reshape(tm, -1), pq_codebook)
            elif pscales is not None:                    # int8 + scales
                scales = pscales[safe_cur]               # [T, maxM]
                nvecs = (codes.reshape(tm, -1).astype(jnp.float32) *
                         scales.reshape(tm)[:, None])
            else:                                        # bf16/f32 records
                nvecs = codes.reshape(tm, -1).astype(jnp.float32)
        elif qvectors is not None:
            nvecs = (qvectors[safe_nbrs].astype(jnp.float32) *
                     qscale[safe_nbrs][:, None])
        else:
            nvecs = graph.vectors[safe_nbrs]             # [T*maxM, D]
        dists = dist_one_to_many(qt, nvecs, metric_value)
        evals = evals + jnp.sum(process.astype(jnp.int32))

        # gating rule (hnswalg.cpp:99): admit if better than worst kept or
        # results not full (res_d[ef-1] is inf while not full)
        admit = process & (dists < res_d[ef - 1])
        new_d = jnp.where(admit, dists, _INF)
        new_i = jnp.where(admit, nbrs, -1)

        # two-stage merge: pre-reduce the T*maxM new entries to the best
        # min(ef, cand_cap) once, then both queue merges work on the small
        # set — at most ef/cand_cap survivors can matter for either queue
        pre = min(max(ef, cand_cap), tm)
        if tm > pre:
            neg, sel = jax.lax.top_k(-new_d, pre)
            new_d, new_i = -neg, new_i[sel]

        res_d, res_i = _merge_topk(res_d, res_i, new_d, new_i, ef)
        cand_d, cand_i = _merge_topk(cand_d, cand_i, new_d, new_i, cand_cap)

        return res_d, res_i, cand_d, cand_i, visited, hops + 1, evals

    state = (res_d, res_i, cand_d, cand_i, visited, jnp.int32(0),
             jnp.int32(0))
    res_d, res_i, _, _, _, hops, evals = jax.lax.while_loop(cond, body, state)
    if use_hash:
        # hash overwrites allow duplicate ids into the result queue; drop
        # duplicates (identical ids carry identical distances) and restore
        # ascending order
        order = jnp.argsort(res_i)
        si = res_i[order]
        sd = res_d[order]
        prev = jnp.concatenate([jnp.full((1,), -2, si.dtype), si[:-1]])
        dup = (si == prev) & (si >= 0)
        sd = jnp.where(dup, _INF, sd)
        si = jnp.where(dup, -1, si)
        neg, sel = jax.lax.top_k(-sd, ef)
        res_d, res_i = -neg, si[sel]
    approx_traversal = (qvectors is not None or
                        (pcodes is not None and
                         pcodes.dtype != jnp.float32))
    if approx_traversal:
        # exact rerank of the ef results (full-precision distances, exact
        # ordering among the surfaced candidates).  f32 packed records
        # skip this: their traversal distances are already the exact
        # reference values (dist_one_to_many over the same f32 rows), so
        # the walk is result-identical to the plain mode — same ids, same
        # order — the strict-parity serving configuration.  Distance
        # scalars: bit-identical on CPU (pinned by the suite,
        # tests/test_round3_fixes.py / test_sharded_packed_cast.py); on
        # TPU, XLA lays the record-gather dot's reduction out differently
        # from the row-gather's, leaving scalars within 4 ulps (max rel
        # 2.9e-7, measured r5 at 100k single-chip with 3-D records; the
        # same magnitude under the sharded program at 400k) with
        # ids/order still identical on every query.
        fvecs = graph.vectors[jnp.maximum(res_i, 0)]
        rd = dist_one_to_many(query, fvecs, metric_value)
        rd = jnp.where(res_i >= 0, rd, _INF)
        neg, sel = jax.lax.top_k(-rd, ef)
        res_d, res_i = -neg, res_i[sel]
    return res_d, res_i, hops, evals


@functools.partial(jax.jit,
                   static_argnames=("ef", "metric_value", "cand_cap",
                                    "expand_width", "visited_slots"))
def search_graph_quantized(graph: GraphState, queries: jax.Array,
                           qvectors: jax.Array, qscale: jax.Array, *,
                           ef: int, metric_value: int,
                           cand_cap: int | None = None, expand_width: int = 1,
                           visited_slots: int = -1
                           ) -> Tuple[jax.Array, jax.Array, SearchStats]:
    """Batched searchBaseLayer with int8 quantized traversal + exact
    rerank (see _search_one). qvectors: int8[cap, D]; qscale: f32[cap]
    per-row scales."""
    if cand_cap is None:
        cand_cap = ef
    fn = functools.partial(_search_one, ef=ef, metric_value=metric_value,
                           cand_cap=cand_cap, expand_width=expand_width,
                           visited_slots=visited_slots)
    res_d, res_i, hops, evals = jax.vmap(
        lambda g, q, qv, qsc: fn(g, q, qvectors=qv, qscale=qsc),
        in_axes=(None, 0, None, None))(graph, queries, qvectors, qscale)
    return res_d, res_i, SearchStats(hops=hops, dist_evals=evals)


@functools.partial(jax.jit,
                   static_argnames=("ef", "metric_value", "cand_cap",
                                    "expand_width", "visited_slots"))
def search_graph_packed(graph: GraphState, queries: jax.Array,
                        pcodes: jax.Array, pscales: jax.Array, *,
                        ef: int, metric_value: int,
                        cand_cap: int | None = None, expand_width: int = 1,
                        visited_slots: int = -1
                        ) -> Tuple[jax.Array, jax.Array, SearchStats]:
    """Batched searchBaseLayer over packed neighbor-code records + exact
    rerank (see _search_one). pcodes: FLAT int8[cap, maxM*D] (node i's
    segment j = the int8 code of links[i, j]; flat 2-D records avoid
    per-neighbor lane padding and the serving-program layout copy — see
    api._pack_records); pscales: f32[cap, maxM] per-row dequantization
    scales."""
    if cand_cap is None:
        cand_cap = ef
    fn = functools.partial(_search_one, ef=ef, metric_value=metric_value,
                           cand_cap=cand_cap, expand_width=expand_width,
                           visited_slots=visited_slots)
    res_d, res_i, hops, evals = jax.vmap(
        lambda g, q, pc, ps: fn(g, q, pcodes=pc, pscales=ps),
        in_axes=(None, 0, None, None))(graph, queries, pcodes, pscales)
    return res_d, res_i, SearchStats(hops=hops, dist_evals=evals)


@functools.partial(jax.jit,
                   static_argnames=("ef", "metric_value", "cand_cap",
                                    "expand_width", "visited_slots"))
def search_graph_pq(graph: GraphState, queries: jax.Array,
                    pcodes: jax.Array, codebook: jax.Array,
                    rotation: jax.Array | None = None, *,
                    ef: int, metric_value: int,
                    cand_cap: int | None = None, expand_width: int = 1,
                    visited_slots: int = -1
                    ) -> Tuple[jax.Array, jax.Array, SearchStats]:
    """Batched searchBaseLayer over packed PQ neighbor records + exact
    rerank (see _search_one). pcodes: FLAT uint8[cap, maxM*G] (node i's
    bytes [j*G:(j+1)*G] = the PQ code of links[i, j]; flat 2-D records
    keep the minor dim lane-aligned — api._pack_records rationale);
    codebook: f32[G, 256, D/G] (ops/pq.py);
    ``rotation`` (optional f32[D, D], OPQ): codes live in the rotated
    space, so traversal compares against q @ R (see _search_one
    ``query_t``)."""
    if cand_cap is None:
        cand_cap = ef
    fn = functools.partial(_search_one, ef=ef, metric_value=metric_value,
                           cand_cap=cand_cap, expand_width=expand_width,
                           visited_slots=visited_slots)
    qt = None if rotation is None else queries.astype(jnp.float32) @ rotation
    if rotation is None:
        res_d, res_i, hops, evals = jax.vmap(
            lambda g, q, pc, cb: fn(g, q, pcodes=pc, pq_codebook=cb),
            in_axes=(None, 0, None, None))(graph, queries, pcodes, codebook)
    else:
        res_d, res_i, hops, evals = jax.vmap(
            lambda g, q, qq, pc, cb: fn(g, q, pcodes=pc, pq_codebook=cb,
                                        query_t=qq),
            in_axes=(None, 0, 0, None, None))(graph, queries, qt, pcodes,
                                              codebook)
    return res_d, res_i, SearchStats(hops=hops, dist_evals=evals)


@functools.partial(jax.jit,
                   static_argnames=("ef", "metric_value", "cand_cap",
                                    "expand_width", "visited_slots"))
def search_graph(graph: GraphState, queries: jax.Array, *, ef: int,
                 metric_value: int, cand_cap: int | None = None,
                 expand_width: int = 1, visited_slots: int = -1
                 ) -> Tuple[jax.Array, jax.Array, SearchStats]:
    """Batched searchBaseLayer.

    Args:
      graph:   GraphState (device arrays).
      queries: f32[B, D] query batch (the reference serves one query per
               backend; batching is the TPU's replacement for that).
      ef:      beam width (efSearch / efConstruction).
      metric_value: Metric.value (static).
      cand_cap: candidate-queue width (default ef).
      expand_width: candidates expanded per loop step (T); recall(T) >=
               recall(1), iteration count ~1/T (see module docstring).

    Returns:
      (dists f32[B, ef] ascending, node ids i32[B, ef] (-1 past end),
       SearchStats).
    """
    if cand_cap is None:
        cand_cap = ef
    fn = functools.partial(_search_one, ef=ef, metric_value=metric_value,
                           cand_cap=cand_cap, expand_width=expand_width,
                           visited_slots=visited_slots)
    res_d, res_i, hops, evals = jax.vmap(fn, in_axes=(None, 0))(graph,
                                                                queries)
    return res_d, res_i, SearchStats(hops=hops, dist_evals=evals)
