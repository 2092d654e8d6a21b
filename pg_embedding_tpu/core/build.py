"""Batched graph construction — the TPU bindPoint / mutuallyConnectNewElement.

Reference semantics (hnswalg.cpp:155-232, embedding.c:606-701):
  - node 0 is inserted with no links and becomes the entry point
  - every later node: searchBaseLayer(point, efConstruction), prune the
    results to M via the Malkov diversity heuristic, write the new node's
    link list, then back-link: append to each chosen neighbor's list if it
    has room, else re-select its maxM best from {existing links + new node}
    with the same heuristic (distances measured to the overflowing node)
  - inserts are strictly serial (single-writer lock, embedding.c:624-631)

TPU formulation:
  - a *batch* of new points runs the beam search together (vmapped), and the
    O(M^2) pairwise-distance heuristic is vectorized as a small masked
    distance matrix + a fori scan over candidates (exact reference rule:
    keep c iff no already-kept r has dist(c, r) < dist(c, query),
    hnswalg.cpp:117-153)
  - link wiring is applied *sequentially within the batch* (fori_loop), so
    back-link overflow re-pruning sees every earlier update — deterministic,
    no scatter conflicts
  - batch members cannot reach each other through the graph during the
    batched search (their links don't exist yet); this is the one divergence
    from strict serial order. It is repaired by merging brute-force
    *intra-batch* candidates (earlier batch members, by exact distance) into
    each element's candidate set before pruning — a superset of what the
    serial search would have found among them. Recall parity vs. the serial
    reference is established empirically (tests/test_build_parity.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.distance import dist_one_to_many, pairwise_dist
from .graph import GraphState
from .search import _search_one

_INF = jnp.inf


def _prune_heuristic(cand_d: jax.Array, cand_i: jax.Array,
                     pair_d: jax.Array, nn: int):
    """getNeighborsByHeuristic (hnswalg.cpp:117-153), vectorized.

    Args:
      cand_d: f32[C] distances candidate -> query point (inf = invalid).
      cand_i: i32[C] candidate node ids (-1 = invalid).
      pair_d: f32[C, C] pairwise candidate distances (same order).
      nn:     max neighbors to keep (M, or maxM for back-link re-prunes).

    Returns (kept_i i32[nn] in selection order, -1 padded; kept_count i32).

    Candidates are scanned nearest-first (ties: larger id first, matching
    std::pair max-heap ordering); c is kept iff no already-kept r satisfies
    dist(c, r) < dist(c, query). If fewer than nn valid candidates exist the
    heuristic is skipped entirely and all are kept (hnswalg.cpp:119-120) —
    in farthest-first order with ties larger-id-first (unpruned heaps hold
    (+dist, idx) pairs and pop farthest/larger-id first; see
    core.refimpl._mutually_connect), preserving the reference's link-list
    order quirk exactly, including on tied distances.
    """
    c = cand_d.shape[0]
    valid = (cand_i >= 0) & jnp.isfinite(cand_d)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    do_prune = n_valid >= nn

    # nearest-first scan order; invalid entries (inf) sort last
    key_d = jnp.where(valid, cand_d, _INF)
    order = jnp.lexsort((-cand_i, key_d))
    d_s = key_d[order]
    i_s = cand_i[order]
    valid_s = valid[order]
    pair_s = pair_d[order][:, order]

    def body(j, carry):
        kept_mask, kept_count = carry
        # diversity rule: reject if any kept r is closer to c than q is
        conflict = jnp.any(kept_mask & (pair_s[j] < d_s[j]))
        good = ~conflict | ~do_prune
        take = valid_s[j] & good & (kept_count < nn)
        kept_mask = kept_mask.at[j].set(take)
        return kept_mask, kept_count + take.astype(jnp.int32)

    kept_mask, kept_count = jax.lax.fori_loop(
        0, c, body, (jnp.zeros((c,), jnp.bool_), jnp.int32(0)))

    # compact kept ids into [nn] in selection (ascending-distance) order
    pos = jnp.cumsum(kept_mask.astype(jnp.int32)) - 1
    scatter_to = jnp.where(kept_mask, pos, nn)  # overflow slot nn is dropped
    kept_i = jnp.full((nn + 1,), -1, jnp.int32).at[scatter_to].set(i_s)[:nn]

    # link-order parity: unpruned lists are written farthest-first with
    # ties popping larger-id-first, i.e. sort key (-d, -id).  Reversing the
    # (d asc, id desc) scan order would flip ties to smaller-id-first, so
    # build the reversed list from a (d asc, id ASC) sort instead.
    order_asc = jnp.lexsort((cand_i, key_d))
    i_asc = cand_i[order_asc]
    slot = jax.lax.broadcasted_iota(jnp.int32, (nn, 1), 0)[:, 0]
    rev_idx = jnp.clip(kept_count - 1 - slot, 0, c - 1)
    kept_rev = jnp.where(slot < kept_count, i_asc[rev_idx], -1)
    kept_i = jnp.where(do_prune, kept_i, kept_rev)

    return kept_i, kept_count


def _connect_one(vectors, links, link_counts, cur, kept_i, kept_cnt, enable,
                 *, m: int, max_m: int, metric_value: int):
    """mutuallyConnectNewElement (hnswalg.cpp:155-223) for one new node,
    given its already-pruned neighbor list. ``enable`` masks the whole
    connect (used for ragged tails in SPMD sharded builds: a disabled slot
    writes a blank link row and touches nothing else).

    The reference back-links one neighbor at a time; the targets are
    *distinct* nodes (the heuristic selects without replacement), so their
    updates are independent and we process all M at once: both the append
    path (hnswalg.cpp:193-195) and the overflow re-prune path
    (hnswalg.cpp:196-220) are computed vectorized and selected by mask —
    data-dependent branching via select, not lax.cond, because conds that
    carry the full capacity-sized link arrays make XLA's buffer planning
    (and compile time) blow up."""
    cap = links.shape[0]
    kept_cnt = jnp.where(enable, kept_cnt, 0)
    slot_m = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]
    slot_mm = jax.lax.broadcasted_iota(jnp.int32, (max_m, 1), 0)[:, 0]

    # forward links (hnswalg.cpp:168-181): pad [m] -> [max_m]
    valid = (slot_m < kept_cnt) & (kept_i >= 0)
    fwd = jnp.full((max_m,), -1, jnp.int32)
    fwd = fwd.at[:m].set(jnp.where(valid, kept_i, -1))
    links = links.at[cur].set(fwd)
    link_counts = link_counts.at[cur].set(kept_cnt)

    # back-links, all M targets at once
    safe_t = jnp.where(valid, kept_i, 0)                     # [m]
    rows = links[safe_t]                                     # [m, max_m]
    cnts = link_counts[safe_t]                               # [m]
    overflow = cnts >= max_m

    # append path: place cur at slot cnts
    one_hot = slot_mm[None, :] == cnts[:, None]              # [m, max_m]
    app_rows = jnp.where(one_hot, cur, rows)
    app_cnts = cnts + 1

    # re-prune path: maxM best of {existing links + cur} by distance to the
    # overflowing node (computed for every target, selected only where
    # overflow — the masked-compute idiom)
    cand_ids = jnp.concatenate(
        [rows, jnp.full((m, 1), 1, jnp.int32) * cur], axis=1)  # [m, max_m+1]
    base_vecs = vectors[safe_t]                              # [m, D]
    cvecs = vectors[jnp.maximum(cand_ids, 0)]                # [m, max_m+1, D]
    d = jax.vmap(lambda bv, cv: dist_one_to_many(bv, cv, metric_value))(
        base_vecs, cvecs)                                    # [m, max_m+1]
    d = jnp.where(cand_ids >= 0, d, _INF)
    pair = jax.vmap(lambda cv: pairwise_dist(cv, cv, metric_value))(cvecs)
    rep_rows, rep_cnts = jax.vmap(
        lambda dd, ci, pd: _prune_heuristic(dd, ci, pd, max_m))(
        d, cand_ids, pair)                                   # [m, max_m], [m]

    new_rows = jnp.where(overflow[:, None], rep_rows, app_rows)
    new_cnts = jnp.where(overflow, rep_cnts, app_cnts)

    # scatter; invalid slots target index=cap and are dropped
    tgt = jnp.where(valid, safe_t, cap)
    links = links.at[tgt].set(new_rows, mode="drop")
    link_counts = link_counts.at[tgt].set(new_cnts, mode="drop")
    return links, link_counts


def _connect_batch(vectors, links, link_counts, base, kept_i, kept_cnt,
                   n_insert, *, m: int, max_m: int, metric_value: int,
                   reprune_buffer: int | None = None):
    """Wire a whole batch — bit-exact replacement for running _connect_one
    sequentially over the batch, restructured for TPU parallelism.

    Key fact: back-link state depends ONLY on the sequence of operations
    applied to each individual target (re-prune distances read the static
    ``vectors``), so the sequential schedule's dependencies form per-target
    chains.  Equivalent parallel schedule:

      1. all forward link rows commit in one scatter (each new node's row
         is written before any back-link can target it: a member's targets
         are strictly earlier nodes);
      2. back-link ops are ranked by their occurrence index PER TARGET
         (batch order), and rounds r = 0,1,... apply every target's r-th
         op in parallel — within a round all targets are distinct, so the
         scatters are conflict-free, and across rounds each target sees
         exactly the sequential order.

    The sequential fori over the batch (depth B x the O(maxM) heuristic
    scan) collapses to ~max-collision-count rounds (2-3 in practice, while
    the expected per-target multiplicity is B*m/N); measured 18.3ms -> a
    few ms at B=128/m=16 on v5e.  ``n_insert`` masks ragged SPMD tails
    exactly like the sequential version's ``enable``."""
    b = kept_i.shape[0]
    cap = links.shape[0]
    bm = b * m
    slot_m = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]
    slot_mm = jax.lax.broadcasted_iota(jnp.int32, (max_m, 1), 0)[:, 0]
    member = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)[:, 0]
    enable = member < n_insert
    kept_cnt = jnp.where(enable, kept_cnt, 0)

    # --- 1. forward links, all members at once (hnswalg.cpp:168-181) -----
    valid_f = (slot_m[None, :] < kept_cnt[:, None]) & (kept_i >= 0)  # [b, m]
    fwd = jnp.full((b, max_m), -1, jnp.int32)
    fwd = fwd.at[:, :m].set(jnp.where(valid_f, kept_i, -1))
    tgt_f = jnp.where(enable, base + member, cap)        # cap => dropped
    links = links.at[tgt_f].set(fwd, mode="drop")
    link_counts = link_counts.at[tgt_f].set(kept_cnt, mode="drop")

    # --- 2. back-link ops, rounds by per-target occurrence rank ----------
    tgt = jnp.where(valid_f, kept_i, -1).reshape(bm)     # [bm]
    cur = (base + member)[:, None].repeat(m, axis=1).reshape(bm)
    valid = tgt >= 0
    op = jax.lax.broadcasted_iota(jnp.int32, (bm, 1), 0)[:, 0]
    same_earlier = ((tgt[None, :] == tgt[:, None]) & valid[None, :] &
                    valid[:, None] & (op[None, :] < op[:, None]))
    rank = jnp.sum(same_earlier.astype(jnp.int32), axis=1)       # [bm]
    n_rounds = jnp.max(jnp.where(valid, rank, -1)) + 1

    # Re-prune lanes are compacted into a K-wide buffer: only ~1% of
    # back-link targets are at max_m in practice (measured at 100k/m=16),
    # and the re-prune's per-lane [maxM+1 x maxM+1] pairwise matmuls +
    # heuristic scan are ~10x the cost of everything else in the round —
    # computing them bm-wide made connect 90% of the whole insert.  K has
    # ~6x headroom over the measured rate; exactness is preserved by an
    # inner while_loop that drains any overflow-lane excess in further
    # K-wide passes (all lanes in a round target distinct nodes, so the
    # split into passes cannot reorder anything).
    k_prune = min(256, bm) if reprune_buffer is None else reprune_buffer

    def reprune_pass(state):
        links, link_counts, todo = state
        prio = jnp.argsort(~todo, stable=True)           # todo lanes first
        idxs = prio[:k_prune]
        active = todo[idxs]
        sub_t = jnp.where(active, tgt[idxs], 0)
        rows = links[sub_t]                              # [K, max_m]
        cand_ids = jnp.concatenate([rows, cur[idxs][:, None]], axis=1)
        base_vecs = vectors[sub_t]                       # [K, D]
        cvecs = vectors[jnp.maximum(cand_ids, 0)]        # [K, max_m+1, D]
        d = jax.vmap(lambda bv, cv: dist_one_to_many(bv, cv, metric_value))(
            base_vecs, cvecs)
        d = jnp.where(cand_ids >= 0, d, _INF)
        pair = jax.vmap(lambda cv: pairwise_dist(cv, cv, metric_value))(
            cvecs)
        rep_rows, rep_cnts = jax.vmap(
            lambda dd, ci, pd: _prune_heuristic(dd, ci, pd, max_m))(
            d, cand_ids, pair)
        t_idx = jnp.where(active, sub_t, cap)
        links = links.at[t_idx].set(rep_rows, mode="drop")
        link_counts = link_counts.at[t_idx].set(rep_cnts, mode="drop")
        todo = todo.at[idxs].set(todo[idxs] & ~active)
        return links, link_counts, todo

    def round_body(state):
        r, links, link_counts = state
        sel = valid & (rank == r)
        safe_t = jnp.where(sel, tgt, 0)
        cnts = link_counts[safe_t]                       # [bm]
        overflow = sel & (cnts >= max_m)

        # append path (hnswalg.cpp:193-195), full width — cheap scatter
        app = sel & ~overflow
        rows = links[safe_t]
        one_hot = slot_mm[None, :] == cnts[:, None]
        app_rows = jnp.where(one_hot, cur[:, None], rows)
        t_idx = jnp.where(app, safe_t, cap)
        links = links.at[t_idx].set(app_rows, mode="drop")
        link_counts = link_counts.at[t_idx].set(cnts + 1, mode="drop")

        # overflow re-prune path (hnswalg.cpp:196-220), compacted
        links, link_counts, _ = jax.lax.while_loop(
            lambda s: jnp.any(s[2]), reprune_pass,
            (links, link_counts, overflow))
        return r + 1, links, link_counts

    _, links, link_counts = jax.lax.while_loop(
        lambda s: s[0] < n_rounds, round_body,
        (jnp.int32(0), links, link_counts))
    return links, link_counts


def _exact_candidates(vectors, points, base, *, cand_cap: int,
                      metric_value: int, chunk: int = 32768,
                      qvec=None, qscale=None):
    """Construction candidates via a full MXU corpus sweep instead of the
    beam walk — the TPU-native bulk-build move (opt-in; see
    HnswIndex(build_candidates=...)).

    The reference's insert searches the graph because a serial CPU cannot
    afford an O(N) scan per insert (hnswalg.cpp:229).  On TPU the scan IS
    the fast path below ~1M rows: one [B, chunk] distance tile per chunk
    rides the MXU at full tilt, per-chunk approx top-k + a running merge
    select cand_cap candidates, and an exact elementwise rerank restores
    reference distance semantics (distfunc.c forms) for the pruning
    heuristic.  Strictly better candidate sets than the beam walk (true
    top-efc modulo approx_min_k's ~0.95 per-chunk recall), so graph
    quality can only improve; link-level parity with the reference is
    intentionally given up (use candidates="beam" for that).

    COARSE MODE (``qvec``/``qscale`` given — the "exact8" candidate
    engine): the sweep reads the int8 shadow rows instead of the f32
    corpus — 4x fewer HBM bytes — and scores them with one bf16 MXU pass
    (dequantize in-register; vs the f32 path's 3-pass bf16x3 split), which
    is what keeps full-corpus candidate sweeps affordable ABOVE the ~600k
    f32-sweep crossover (the r2 10M quality gap: beam-built graphs past
    600k served recall 0.86-0.92).  Coarse scores carry ~0.5% int8 + bf16
    error, so the kept pool is widened 2x before the same exact f32
    rerank selects the final cand_cap — candidate quality is within the
    widened pool of the true sweep.

    Returns (cand_d [B, cand_cap], cand_i [B, cand_cap]) ascending,
    -1-padded, considering only rows < base (tombstones stay candidates,
    matching construction semantics — deletes filter results, not
    waypoints, hnswalg.cpp:245)."""
    b = points.shape[0]
    cap = vectors.shape[0]
    chunk = min(chunk, cap)
    coarse = qvec is not None
    # traced trip count: scan only chunks that contain live rows (< base).
    # During a growing build the graph is far smaller than capacity, and
    # the per-chunk masking already handles the ragged edge.
    n_chunks = jnp.clip((base + chunk - 1) // chunk, 0, -(-cap // chunk))
    # rerank pad (ops/bruteforce._RERANK_PAD); coarse scores widen 2x
    keep = 2 * cand_cap if coarse else cand_cap + 2
    pts32 = points.astype(jnp.float32)

    def body(c, carry):
        top_d, top_i = carry
        start = jnp.minimum(c * chunk, cap - chunk)
        if coarse:
            qrows = jax.lax.dynamic_slice_in_dim(qvec, start, chunk, axis=0)
            qsc = jax.lax.dynamic_slice_in_dim(qscale, start, chunk, axis=0)
            # dequantize in-register to bf16: pairwise_dist routes bf16
            # points through its single-pass MXU branch (f32 accumulation)
            rows_b = (qrows.astype(jnp.bfloat16) *
                      qsc.astype(jnp.bfloat16)[:, None])
            d = pairwise_dist(pts32, rows_b, metric_value)
        else:
            rows = jax.lax.dynamic_slice_in_dim(vectors, start, chunk,
                                                axis=0)
            d = pairwise_dist(pts32, rows.astype(jnp.float32), metric_value)
        ids = start + jax.lax.broadcasted_iota(jnp.int32, (b, chunk), 1)
        # kill overlap from the clamped last chunk + rows past the graph
        valid = (ids >= c * chunk) & (ids < base)
        d = jnp.where(valid, d, _INF)
        ids = jnp.where(valid, ids, -1)
        if chunk > 4 * keep:
            d, sel = jax.lax.approx_min_k(d, keep, recall_target=0.99)
            ids = jnp.take_along_axis(ids, sel, axis=1)
        all_d = jnp.concatenate([top_d, d], axis=1)
        all_i = jnp.concatenate([top_i, ids], axis=1)
        neg, sel = jax.lax.top_k(-all_d, keep)
        return -neg, jnp.take_along_axis(all_i, sel, axis=1)

    init = (jnp.full((b, keep), _INF, jnp.float32),
            jnp.full((b, keep), -1, jnp.int32))
    run_d, run_i = jax.lax.fori_loop(0, n_chunks, body, init)

    # exact rerank with the reference's elementwise forms
    rrows = vectors[jnp.maximum(run_i, 0)].astype(jnp.float32)
    rd = jax.vmap(lambda q, r: dist_one_to_many(q, r, metric_value))(
        pts32, rrows)
    rd = jnp.where(run_i >= 0, rd, _INF)
    neg, sel = jax.lax.top_k(-rd, cand_cap)
    return -neg, jnp.take_along_axis(run_i, sel, axis=1)


def insert_batch_core(graph: GraphState, points: jax.Array,
                      n_insert: jax.Array, *, ef_construction: int, m: int,
                      max_m: int, metric_value: int,
                      cand_cap: int | None = None,
                      expand_width: int = 1,
                      candidates: str = "beam",
                      qvec=None, qscale=None,
                      exact8_chunk: int = 1_048_576) -> GraphState:
    """Insert a batch of points (the aminsert/ambuild hot path,
    embedding.c:606-701 + hnswalg.cpp:225-232). Un-jitted core, also used
    inside shard_map.

    Stages the batch's vectors, beam-searches the pre-batch graph for all of
    them at once, prunes candidates to M with the vectorized heuristic, then
    wires links sequentially within the batch.  Only the first ``n_insert``
    (dynamic, <= B) points are actually inserted; the rest are masked no-ops
    so SPMD shards with ragged tails can share one program.
    """
    b, d = points.shape
    base = graph.n_nodes
    efc = ef_construction
    if cand_cap is None:
        cand_cap = efc

    # stage vectors (they are unreachable until links exist, so staging
    # before the search is safe — new nodes have no in-edges yet)
    vectors = jax.lax.dynamic_update_slice(
        graph.vectors, points.astype(graph.vectors.dtype), (base, 0))
    staged = graph._replace(vectors=vectors)

    if candidates == "exact":
        # TPU-native bulk-build candidates: full MXU sweep (see
        # _exact_candidates; waives link-level reference parity)
        cand_d, cand_i = _exact_candidates(
            vectors, points, base, cand_cap=cand_cap,
            metric_value=metric_value)
    elif candidates == "exact8":
        # int8-coarse sweep + exact f32 rerank (the >600k engine; the
        # caller threads the incrementally-maintained shadow arrays).
        # 32x-wider chunks than the f32 sweep: the per-chunk top-k/merge
        # machinery has a measured ~5ms fixed cost per chunk that dwarfs
        # the (cheap) int8 matmul, so fewer+larger chunks is the lever —
        # measured at base=8M on v5e: 1506/620/187/87 ms per 256-row batch
        # at chunk=32k/131k/524k/1M.  The [B, chunk] f32 score tile is the
        # ephemeral cost: ~1GB at chunk=1M, B=256.  exact8_chunk is a
        # static perf knob (HnswIndex.tune_exact8_chunk measures it per
        # (device, dims) and persists the winner).
        cand_d, cand_i = _exact_candidates(
            vectors, points, base, cand_cap=cand_cap,
            metric_value=metric_value, chunk=exact8_chunk,
            qvec=qvec, qscale=qscale)
    else:
        # batched searchBaseLayer(point, efConstruction) (hnswalg.cpp:229)
        search = functools.partial(_search_one, ef=efc,
                                   metric_value=metric_value,
                                   cand_cap=cand_cap,
                                   expand_width=expand_width)
        cand_d, cand_i, _, _ = jax.vmap(search, in_axes=(None, 0))(staged,
                                                                   points)

    # Intra-batch candidates: under strict serial insertion (the reference),
    # element i's search would also reach earlier inserts i' < i of this
    # batch; the batched search cannot (their links don't exist yet).
    # Restore that by brute-forcing distances within the batch and merging
    # earlier members into each element's candidate set — a superset of what
    # the serial search would have found among them.
    bi = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)[:, 0]
    intra = pairwise_dist(points.astype(jnp.float32),
                          points.astype(jnp.float32), metric_value)  # [B,B]
    earlier = (bi[None, :] < bi[:, None]) & (bi[None, :] < n_insert)
    intra_d = jnp.where(earlier, intra, _INF)
    intra_i = jnp.where(earlier, base + bi[None, :], -1)
    merged_d = jnp.concatenate([cand_d, intra_d], axis=1)    # [B, W+B]
    merged_i = jnp.concatenate([cand_i, intra_i], axis=1)
    # keep the full candidate-pool width (cand_cap may exceed efc — the
    # exact sweep benefits from a wider pool for the diversity heuristic)
    order = jnp.argsort(merged_d, axis=1,
                        stable=True)[:, :cand_d.shape[1]]
    cand_d = jnp.take_along_axis(merged_d, order, axis=1)
    cand_i = jnp.take_along_axis(merged_i, order, axis=1)

    # batched heuristic prune to M (hnswalg.cpp:158)
    cvecs = vectors[jnp.maximum(cand_i, 0)]                  # [B, efc, D]
    pair = jax.vmap(lambda v: pairwise_dist(v, v, metric_value))(cvecs)
    kept_i, kept_cnt = jax.vmap(
        lambda cd, ci, pd: _prune_heuristic(cd, ci, pd, m))(cand_d, cand_i,
                                                            pair)

    # node 0 special case: the very first element binds with no links
    # (hnswalg.cpp:227-228); searching an empty graph already yields zero
    # candidates, so kept_cnt is 0 and the wiring below is a natural no-op.

    links, link_counts = _connect_batch(
        vectors, graph.links, graph.link_counts, base, kept_i, kept_cnt,
        n_insert, m=m, max_m=max_m, metric_value=metric_value)

    return GraphState(vectors=vectors, links=links, link_counts=link_counts,
                      deleted=graph.deleted, n_nodes=base + n_insert)


@functools.partial(
    jax.jit,
    static_argnames=("ef_construction", "m", "max_m", "metric_value",
                     "cand_cap", "expand_width", "candidates"))
def insert_batch(graph: GraphState, points: jax.Array, *,
                 ef_construction: int, m: int, max_m: int, metric_value: int,
                 cand_cap: int | None = None,
                 expand_width: int = 1,
                 candidates: str = "beam") -> GraphState:
    """Jitted full-batch insert (see insert_batch_core)."""
    return insert_batch_core(graph, points, jnp.int32(points.shape[0]),
                             ef_construction=ef_construction, m=m,
                             max_m=max_m, metric_value=metric_value,
                             cand_cap=cand_cap, expand_width=expand_width,
                             candidates=candidates)


@functools.partial(
    jax.jit,
    static_argnames=("ef_construction", "m", "max_m", "metric_value",
                     "cand_cap", "expand_width", "candidates"))
def insert_batch_masked(graph: GraphState, points: jax.Array,
                        n_insert: jax.Array, *, ef_construction: int, m: int,
                        max_m: int, metric_value: int,
                        cand_cap: int | None = None,
                        expand_width: int = 1,
                        candidates: str = "beam") -> GraphState:
    """Jitted masked-tail insert: only the first ``n_insert`` (dynamic) rows
    of ``points`` are inserted.  Because n_insert is traced, every insert —
    full batches and ragged tails alike — shares ONE compiled program per
    (batch size, capacity), which matters on TPU where a cold compile costs
    tens of seconds."""
    return insert_batch_core(graph, points, n_insert,
                             ef_construction=ef_construction, m=m,
                             max_m=max_m, metric_value=metric_value,
                             cand_cap=cand_cap, expand_width=expand_width,
                             candidates=candidates)


@functools.partial(
    jax.jit, donate_argnums=(0,),
    static_argnames=("ef_construction", "m", "max_m", "metric_value",
                     "cand_cap", "expand_width", "candidates"))
def insert_batch_masked_donating(graph: GraphState, points: jax.Array,
                                 n_insert: jax.Array, *,
                                 ef_construction: int, m: int,
                                 max_m: int, metric_value: int,
                                 cand_cap: int | None = None,
                                 expand_width: int = 1,
                                 candidates: str = "beam") -> GraphState:
    """insert_batch_masked with the graph buffers DONATED: XLA aliases
    input to output, so the capacity-sized arrays are updated in place
    instead of copied per batch.  Without this, every 128-row batch copies
    the whole vectors+links arrays (6.4GB/batch at 10M x 128d — both a
    throughput wall and a 2x peak-memory tax; the page store updates in
    place for the same reason, embedding.c:769-843).  The input GraphState
    is INVALIDATED — callers must rebind (api.add does)."""
    return insert_batch_core(graph, points, n_insert,
                             ef_construction=ef_construction, m=m,
                             max_m=max_m, metric_value=metric_value,
                             cand_cap=cand_cap, expand_width=expand_width,
                             candidates=candidates)


@functools.partial(
    jax.jit, donate_argnums=(0,),
    static_argnames=("batch", "n_batches", "ef_construction", "m", "max_m",
                     "metric_value", "cand_cap", "expand_width",
                     "candidates"))
def insert_slab_donating(graph: GraphState, slab: jax.Array,
                         n_valid: jax.Array, *, batch: int, n_batches: int,
                         ef_construction: int, m: int, max_m: int,
                         metric_value: int, cand_cap: int | None = None,
                         expand_width: int = 1,
                         candidates: str = "beam") -> GraphState:
    """Insert a whole multi-batch slab in ONE device dispatch.

    Per-batch host dispatch through the axon tunnel costs ~150ms of latency
    (argument PUTs + execute RPCs) against ~15-30ms of device compute — the
    round-1 build ran at 0.15x the single-thread CPU reference purely on
    host-loop overhead.  Folding the batch loop into the compiled program
    (fori over ``n_batches`` sequential masked inserts, slab sliced on
    device) leaves one upload + one dispatch per slab, so the build runs at
    device speed — the bulk-build analog of the reference building unlogged
    and WAL-logging once at the end (embedding.c:526-530).

    Only the first ``n_valid`` slab rows are real; trailing batches become
    masked no-ops (n_insert=0), so ragged tails share the program.  The
    caller must keep capacity >= final_count + batch: a no-op batch still
    stages a batch-wide garbage slice past n_nodes (harmless there, but
    dynamic_update_slice would clamp it INTO live rows at the array end).
    """
    def body(i, g):
        off = i * batch
        points = jax.lax.dynamic_slice_in_dim(slab, off, batch, axis=0)
        n_ins = jnp.clip(n_valid - off, 0, batch)
        return insert_batch_core(g, points, n_ins,
                                 ef_construction=ef_construction, m=m,
                                 max_m=max_m, metric_value=metric_value,
                                 cand_cap=cand_cap,
                                 expand_width=expand_width,
                                 candidates=candidates)

    return jax.lax.fori_loop(0, n_batches, body, graph)


def quantize_rows(points: jax.Array):
    """Per-row symmetric int8 quantization of a batch (the api._quantize
    formula, applied to the rows being staged): scale = max|v|/127,
    q = clip(round(v/scale)).  Appended rows never change, so incremental
    staging reproduces exactly what a full re-quantization would."""
    v = points.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(v), axis=1), 1e-30) / 127.0
    q = jnp.clip(jnp.round(v / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale


@functools.partial(
    jax.jit, donate_argnums=(0, 1, 2),
    static_argnames=("batch", "n_batches", "ef_construction", "m", "max_m",
                     "metric_value", "cand_cap", "expand_width",
                     "exact8_chunk"))
def insert_slab_q_donating(graph: GraphState, qvec: jax.Array,
                           qscale: jax.Array, slab: jax.Array,
                           n_valid: jax.Array, *, batch: int, n_batches: int,
                           ef_construction: int, m: int, max_m: int,
                           metric_value: int, cand_cap: int | None = None,
                           expand_width: int = 1,
                           exact8_chunk: int = 1_048_576):
    """insert_slab_donating with the exact8 candidate engine: the int8
    shadow (qvec [cap, D] i8, qscale [cap] f32) is threaded through the
    batch loop — each batch stages its rows' quantized codes BEFORE its
    sweep, so later batches in the slab see earlier ones as candidates,
    exactly like the f32 staging does for the exact sweep.  Returns
    (graph, qvec, qscale); all three inputs are DONATED."""
    def body(i, state):
        g, qv, qs = state
        off = i * batch
        points = jax.lax.dynamic_slice_in_dim(slab, off, batch, axis=0)
        n_ins = jnp.clip(n_valid - off, 0, batch)
        base = g.n_nodes
        q, s = quantize_rows(points)
        qv = jax.lax.dynamic_update_slice(qv, q, (base, 0))
        qs = jax.lax.dynamic_update_slice(qs, s, (base,))
        g = insert_batch_core(g, points, n_ins,
                              ef_construction=ef_construction, m=m,
                              max_m=max_m, metric_value=metric_value,
                              cand_cap=cand_cap, expand_width=expand_width,
                              candidates="exact8", qvec=qv, qscale=qs,
                              exact8_chunk=exact8_chunk)
        return g, qv, qs

    return jax.lax.fori_loop(0, n_batches, body, (graph, qvec, qscale))


def build_schedule(n: int, max_batch: int):
    """Fixed-size batch schedule: (offset, count) pairs, all with the same
    padded batch shape.  One compiled program per capacity (tails are handled
    by n_insert masking, not by smaller shapes — early-batch graph quality is
    covered by the intra-batch brute-force candidates in
    insert_batch_core)."""
    return [(off, min(max_batch, n - off)) for off in range(0, n, max_batch)]
