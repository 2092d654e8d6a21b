"""Multi-chip sharded index — the TPU-native scaling layer.

The reference has no intra-query or multi-node parallelism at all
(``amcanparallel = false``, embedding.c:982; single-writer inserts,
embedding.c:624-631); its only "distribution" is Neon's storage
disaggregation over the WAL.  On TPU the idiomatic scale-out for a graph
index is (SURVEY.md §2 "TPU-native equivalents"):

  * partition the corpus round-robin across a 1-D device mesh — each shard
    holds an independent flat-NSW sub-graph over its slice (round-robin so
    every shard sees an unbiased sample of the distribution),
  * build runs the same batched-insert program on every shard at once
    (SPMD via shard_map; zero communication — shard graphs are independent),
  * queries are replicated; every shard runs the beam search on its
    sub-graph; the per-shard top-ef candidate sets are combined with
    ``jax.lax.all_gather`` over ICI and reduced to a global top-k inside the
    same program (the NCCL-equivalent on TPU is XLA's built-in collectives).

Per-shard recall at equal ef is *higher* than single-graph recall (each
sub-graph is searched exhaustively relative to its size), so the merged
global top-k matches or beats single-chip recall at efsearch parity.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import HnswConfig
from ..core.build import insert_batch_core
from ..core.graph import GraphState
from ..core.search import _search_one

AXIS = "shard"


def default_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (AXIS,))


def _local(graph_arrays):
    """Strip the leading per-shard axis inside shard_map."""
    vectors, links, link_counts, deleted, n_nodes = graph_arrays
    return GraphState(vectors=vectors[0], links=links[0],
                      link_counts=link_counts[0], deleted=deleted[0],
                      n_nodes=n_nodes[0])


def _stacked(graph: GraphState):
    return (graph.vectors[None], graph.links[None],
            graph.link_counts[None], graph.deleted[None],
            graph.n_nodes[None])


class ShardedHnswIndex:
    """Data-parallel sharded flat-NSW index over a 1-D device mesh."""

    def __init__(self, config: HnswConfig, mesh: Optional[Mesh] = None, *,
                 initial_capacity: int = 1024,
                 max_insert_batch: int = 128,
                 search_expand_width: int = 4,
                 storage_dtype: str = "float32",
                 packed_traversal: bool = False) -> None:
        self.config = config
        self.search_expand_width = int(search_expand_width)
        # per-shard auto-routing crossover (see _use_exact)
        self.exact_threshold = 5_500_000   # per shard; see api.py note
        self.mesh = mesh if mesh is not None else default_mesh()
        self.n_shards = self.mesh.devices.size
        self.max_insert_batch = int(max_insert_batch)
        if storage_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unknown storage_dtype: {storage_dtype!r}")
        self.storage_dtype = storage_dtype
        # packed neighbor-code records per shard (api.HnswIndex's
        # packed_traversal, sharded): rebuilt lazily after inserts
        self.packed_traversal = bool(packed_traversal)
        self._packed = None  # (pcodes [S,cap,maxM,D] i8, pscales [S,cap,maxM])

        cap = self._pad_cap(initial_capacity)
        s = self.n_shards
        shard = NamedSharding(self.mesh, P(AXIS))
        self._arrays = tuple(
            jax.device_put(a, shard) for a in (
                np.zeros((s, cap, config.dims),
                         jnp.dtype(self.storage_dtype)),
                np.full((s, cap, config.max_m), -1, np.int32),
                np.zeros((s, cap), np.int32),
                np.zeros((s, cap), bool),
                np.zeros((s,), np.int32),
            ))
        self._labels = np.zeros((s, cap), np.uint64)
        # global insert position of each (shard, slot) — lets node-id mask
        # filters (the single-chip ``where`` bool form) address sharded rows
        self._positions = np.full((s, cap), -1, np.int64)
        # host-side mirror of per-shard n_nodes (reading the device array
        # would force a pipeline-draining sync; see api.HnswIndex._count)
        self._counts = np.zeros((s,), np.int64)
        self.counters: Dict[str, int] = {"n_inserted": 0, "n_deleted": 0,
                                         "n_searches": 0, "n_widenings": 0}
        self._step_cache: Dict = {}

    # ------------------------------------------------------------------ #

    @staticmethod
    def _pad_cap(cap: int) -> int:
        # multiples of 32 for the visited bitmap; above one exact-sweep
        # chunk, multiples of 8192 so the sharded exact path can tile the
        # capacity evenly
        cap = max(int(cap), 32)
        if cap > 8192:
            return ((cap + 8191) // 8192) * 8192
        return ((cap + 31) // 32) * 32

    @property
    def capacity_per_shard(self) -> int:
        return self._arrays[0].shape[1]

    @property
    def shard_counts(self) -> np.ndarray:
        return self._counts.copy()

    @property
    def n_nodes(self) -> int:
        return int(self.shard_counts.sum())

    def __len__(self) -> int:
        return self.n_nodes

    def _check_dims(self, vectors) -> np.ndarray:
        vectors = np.asarray(vectors, np.float32)
        if vectors.ndim == 1:
            vectors = vectors[None, :]
        if vectors.shape[1] != self.config.dims:
            raise ValueError(
                f"wrong number of dimensions: {vectors.shape[1]} instead of "
                f"{self.config.dims} expected")
        return vectors

    # ------------------------------------------------------------------ #
    # build
    # ------------------------------------------------------------------ #

    def _insert_step(self, batch_size: int):
        """Shard-mapped SPMD insert program for a given static batch size.

        Cached per (batch_size, capacity) so jit retraces are bounded."""
        key = ("insert", batch_size, self.capacity_per_shard,
               self.search_expand_width)
        if key in self._step_cache:
            return self._step_cache[key]
        cfg = self.config

        def step(arrays, points, n_insert):
            # points: [1, B, D] local; n_insert: [1] local
            g = _local(arrays)
            g = insert_batch_core(g, points[0], n_insert[0],
                                  ef_construction=cfg.ef_construction,
                                  m=cfg.m, max_m=cfg.max_m,
                                  metric_value=cfg.metric.value,
                                  expand_width=self.search_expand_width)
            return _stacked(g)

        spec = (P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS))
        fn = jax.jit(jax.shard_map(
            step, mesh=self.mesh,
            in_specs=(spec, P(AXIS), P(AXIS)),
            out_specs=spec, check_vma=False))
        self._step_cache[key] = fn
        return fn

    def add(self, vectors, labels=None) -> None:
        """Round-robin partition + SPMD batched insert on every shard."""
        vectors = self._check_dims(vectors)
        n = vectors.shape[0]
        if labels is None:
            base_label = self.counters["n_inserted"]
            labels = np.arange(base_label, base_label + n, dtype=np.uint64)
        else:
            labels = np.asarray(labels, np.uint64).reshape(-1)
            if labels.shape[0] != n:
                raise ValueError("labels/vectors length mismatch")

        s = self.n_shards
        counts = self.shard_counts.copy()
        # round-robin over shards, continuing from current global position
        start = int(counts.sum())
        assign = (start + np.arange(n)) % s
        per_shard = [np.nonzero(assign == i)[0] for i in range(s)]
        per_n = np.array([len(p) for p in per_shard])

        # capacity check / growth (+1 batch of staging slack per shard;
        # a masked tail batch stages a full batch-width slice)
        need = counts + per_n + self.max_insert_batch
        if need.max() > self.capacity_per_shard:
            self._grow(int(need.max()))

        # write labels + global insert positions
        for i in range(s):
            self._labels[i, counts[i]: counts[i] + per_n[i]] = \
                labels[per_shard[i]]
            self._positions[i, counts[i]: counts[i] + per_n[i]] = \
                start + per_shard[i]

        # insert in uniform fixed-shape SPMD batches; ragged tails (across
        # batches AND across shards) use n_insert masking so exactly one
        # program compiles per capacity
        max_off = int(per_n.max())
        b = self.max_insert_batch
        shard = NamedSharding(self.mesh, P(AXIS))
        for off in range(0, max_off, b):
            pts = np.zeros((s, b, self.config.dims), np.float32)
            n_ins = np.zeros((s,), np.int32)
            for i in range(s):
                take = per_shard[i][off: off + b]
                pts[i, : len(take)] = vectors[take]
                n_ins[i] = len(take)
            self._arrays = self._insert_step(b)(
                self._arrays, jax.device_put(pts, shard),
                jax.device_put(n_ins, shard))
        self._counts = counts + per_n
        self.counters["n_inserted"] += n
        self._packed = None  # records are stale once links changed

    def build(self, vectors, labels=None) -> None:
        vectors = self._check_dims(vectors)
        if self.n_nodes != 0:
            raise RuntimeError("build() requires an empty index; use add()")
        per = -(-vectors.shape[0] // self.n_shards) + self.max_insert_batch
        if per > self.capacity_per_shard:
            self._grow(per)
        self.add(vectors, labels)

    def _grow(self, new_cap: int) -> None:
        new_cap = self._pad_cap(max(new_cap, self.capacity_per_shard * 2))
        s = self.n_shards
        old = self.capacity_per_shard
        cfg = self.config
        vec, lnk, cnt, dlt, nn = (np.asarray(a) for a in self._arrays)
        nvec = np.zeros((s, new_cap, cfg.dims), vec.dtype)
        nvec[:, :old] = vec
        nlnk = np.full((s, new_cap, cfg.max_m), -1, np.int32)
        nlnk[:, :old] = lnk
        ncnt = np.zeros((s, new_cap), np.int32)
        ncnt[:, :old] = cnt
        ndlt = np.zeros((s, new_cap), bool)
        ndlt[:, :old] = dlt
        shard = NamedSharding(self.mesh, P(AXIS))
        self._arrays = tuple(jax.device_put(a, shard)
                             for a in (nvec, nlnk, ncnt, ndlt, nn))
        nlab = np.zeros((s, new_cap), np.uint64)
        nlab[:, :old] = self._labels
        self._labels = nlab
        npos = np.full((s, new_cap), -1, np.int64)
        npos[:, :old] = self._positions
        self._positions = npos
        self._packed = None

    # ------------------------------------------------------------------ #
    # search
    # ------------------------------------------------------------------ #

    def _pack_step(self):
        """Shard-mapped builder for packed neighbor-code records: per-row
        int8 quantization + one gather that co-locates every node's
        neighbors' codes (see api.HnswIndex.packed_traversal)."""
        key = ("pack", self.capacity_per_shard)
        if key in self._step_cache:
            return self._step_cache[key]

        def pack(arrays):
            g = _local(arrays)
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (g.capacity, 1), 0)[:, 0]
            live = (rows < g.n_nodes)[:, None]
            v = jnp.where(live, g.vectors.astype(jnp.float32), 0.0)
            scale = jnp.maximum(jnp.max(jnp.abs(v), axis=1), 1e-30) / 127.0
            qv = jnp.clip(jnp.round(v / scale[:, None]), -127,
                          127).astype(jnp.int8)
            safe = jnp.maximum(g.links, 0)
            return qv[safe][None], scale[safe][None]

        spec = (P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS))
        fn = jax.jit(jax.shard_map(pack, mesh=self.mesh, in_specs=(spec,),
                                   out_specs=(P(AXIS), P(AXIS)),
                                   check_vma=False))
        self._step_cache[key] = fn
        return fn

    def _ensure_packed(self):
        if self._packed is None:
            self._packed = self._pack_step()(self._arrays)
        return self._packed

    def _search_step(self, ef: int, k_total: int, packed: bool = False):
        """Shard-mapped search + ICI all-gather + global top-k merge."""
        key = ("search", ef, k_total, self.capacity_per_shard,
               self.search_expand_width, packed)
        if key in self._step_cache:
            return self._step_cache[key]
        cfg = self.config
        cap = self.capacity_per_shard

        def step(arrays, queries, excluded, pcodes, pscales):
            g = _local(arrays)
            g = g._replace(deleted=g.deleted | excluded[0])
            q = queries  # replicated: [B, D]
            fn = functools.partial(_search_one, ef=ef,
                                   metric_value=cfg.metric.value,
                                   cand_cap=ef,
                                   expand_width=self.search_expand_width)
            if packed:
                d, i, hops, evals = jax.vmap(
                    lambda gg, qq, pc, ps: fn(gg, qq, pcodes=pc,
                                              pscales=ps),
                    in_axes=(None, 0, None, None))(g, q, pcodes[0],
                                                   pscales[0])
            else:
                d, i, hops, evals = jax.vmap(fn, in_axes=(None, 0))(g, q)
            # filter tombstones on-shard before the merge so dead nodes
            # never travel over ICI (searchKnn filter, hnswalg.cpp:245)
            dead = g.deleted[jnp.maximum(i, 0)] & (i >= 0)
            d = jnp.where(dead, jnp.inf, d)
            i = jnp.where(dead, -1, i)
            # local idx -> global handle: shard * cap + idx
            sid = jax.lax.axis_index(AXIS)
            gid = jnp.where(i >= 0, sid * cap + i, -1)
            # found count per query (for the widening heuristic): how many
            # raw results this shard produced before tombstone filtering.
            # The merge below takes the MAX over shards: widening continues
            # while ANY shard filled its beam (one exhausted/small shard must
            # not block ef-doubling for the others — reference semantics
            # widen until the index is exhausted, embedding.c:322,338-343)
            found = jnp.sum((i >= 0).astype(jnp.int32), axis=1)  # [B]

            # all-gather candidate sets over ICI, merge to global top-k
            all_d = jax.lax.all_gather(d, AXIS)      # [S, B, ef]
            all_g = jax.lax.all_gather(gid, AXIS)    # [S, B, ef]
            all_f = jax.lax.all_gather(found, AXIS)  # [S, B]
            s = all_d.shape[0]
            b = all_d.shape[1]
            flat_d = jnp.moveaxis(all_d, 0, 1).reshape(b, s * ef)
            flat_g = jnp.moveaxis(all_g, 0, 1).reshape(b, s * ef)
            neg, sel = jax.lax.top_k(-flat_d, k_total)
            out_d = -neg
            out_g = jnp.take_along_axis(flat_g, sel, axis=1)
            return out_d, out_g, jnp.max(all_f, axis=0)

        spec = (P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS))
        if packed:
            fn = jax.jit(jax.shard_map(
                step, mesh=self.mesh,
                in_specs=(spec, P(), P(AXIS), P(AXIS), P(AXIS)),
                out_specs=(P(), P(), P()), check_vma=False))
        else:
            plain = functools.partial(step, pcodes=None, pscales=None)
            fn = jax.jit(jax.shard_map(
                plain, mesh=self.mesh,
                in_specs=(spec, P(), P(AXIS)),
                out_specs=(P(), P(), P()), check_vma=False))
        self._step_cache[key] = fn
        return fn

    def _exact_step(self, k: int):
        """Shard-mapped exact sweep: per-shard fused Pallas top-k over the
        local vectors (the same kernel as the single-chip fast path,
        including the L2 over-fetch + exact rerank), all_gather + global
        top-k merge — the sharded seq-scan oracle (and the batched serving
        fast path)."""
        key = ("exact", k, self.capacity_per_shard)
        if key in self._step_cache:
            return self._step_cache[key]
        cfg = self.config
        cap = self.capacity_per_shard
        from ..ops.pallas_bruteforce import pallas_exact_search

        def step(arrays, queries, excluded):
            g = _local(arrays)
            d, i = pallas_exact_search(queries, g.vectors, k, cfg.metric,
                                       n_valid=g.n_nodes,
                                       deleted=g.deleted | excluded[0])

            sid = jax.lax.axis_index(AXIS)
            gid = jnp.where(i >= 0, sid * cap + i, -1)
            all_d = jax.lax.all_gather(d, AXIS)             # [S, B, k]
            all_g = jax.lax.all_gather(gid, AXIS)
            s, b = all_d.shape[0], all_d.shape[1]
            flat_d = jnp.moveaxis(all_d, 0, 1).reshape(b, s * k)
            flat_g = jnp.moveaxis(all_g, 0, 1).reshape(b, s * k)
            neg, sel = jax.lax.top_k(-flat_d, k)
            return -neg, jnp.take_along_axis(flat_g, sel, axis=1)

        spec = (P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS))
        fn = jax.jit(jax.shard_map(
            step, mesh=self.mesh,
            in_specs=(spec, P(), P(AXIS)),
            out_specs=(P(), P()), check_vma=False))
        self._step_cache[key] = fn
        return fn

    def _filter_to_excluded(self, where):
        """Search filter -> per-shard excluded bool[S, cap] on the mesh
        (sharded predicate pushdown). ``where`` is either an array of
        allowed labels, or a bool mask over global INSERT POSITIONS (the
        single-chip node-id mask form; positions are tracked per slot in
        self._positions)."""
        cap = self.capacity_per_shard
        excluded = np.zeros((self.n_shards, cap), bool)
        if where is not None:
            where = np.asarray(where)
            counts = self.shard_counts
            if where.dtype == bool:
                allowed_pos = where.reshape(-1)
                n = self.n_nodes
                if allowed_pos.shape[0] < n:
                    raise ValueError(
                        f"filter mask covers {allowed_pos.shape[0]} of {n} "
                        f"nodes")
                for i in range(self.n_shards):
                    pos = self._positions[i, : counts[i]]
                    excluded[i, : counts[i]] = ~allowed_pos[pos]
            else:
                allowed = where.astype(np.uint64)
                for i in range(self.n_shards):
                    excluded[i, : counts[i]] = ~np.isin(
                        self._labels[i, : counts[i]], allowed)
        return jax.device_put(excluded,
                              NamedSharding(self.mesh, P(AXIS)))

    def exact_search(self, queries, k: int, where=None
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Sharded brute-force exact k-NN (seq-scan ground truth analog,
        embedding.c:1022-1038), tombstones (and filtered rows) excluded."""
        queries = self._check_dims(queries)
        bq = queries.shape[0]
        d, g = self._exact_step(int(k))(self._arrays, jnp.asarray(queries),
                                        self._filter_to_excluded(where))
        d = np.asarray(d)
        g = np.asarray(g)
        cap = self.capacity_per_shard
        valid = (g >= 0) & np.isfinite(d)
        safe = np.maximum(g, 0)
        labels = np.where(valid, self._labels[safe // cap, safe % cap], 0)
        return d, labels.astype(np.uint64), valid

    def _bucket_ef(self, ef: int) -> int:
        base = self.config.ef_search
        b = base
        while b < max(ef, 1):
            b *= 2
        return b

    def _use_exact(self, batch: int) -> bool:
        """Cost-based routing (see api.HnswIndex._use_exact): per-shard
        exact cost is O(n_shard), so the crossover scales with the mesh."""
        per_shard = self.n_nodes / max(self.n_shards, 1)
        return per_shard <= self.exact_threshold and batch >= 32

    def search(self, queries, k: int, ef: Optional[int] = None,
               mode: str = "auto", where=None
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Global k-NN: per-shard beam search, all-gather merge, progressive
        ef-doubling when tombstones/small-ef starve a query (the
        hnsw_gettuple widening loop, embedding.c:329-366, applied to the
        merged result). ``where``: optional allowed-labels filter (predicate
        pushdown; filtered rows act like tombstones)."""
        queries = self._check_dims(queries)
        bq = queries.shape[0]
        if mode not in ("auto", "graph", "exact"):
            raise ValueError(f"unknown search mode: {mode!r}")
        if mode == "exact" or (mode == "auto" and self._use_exact(bq)):
            self.counters["n_searches"] += bq
            self.counters["n_exact_routed"] = (
                self.counters.get("n_exact_routed", 0) + bq)
            return self.exact_search(queries, k, where=where)
        ef = self.config.ef_search if ef is None else int(ef)
        ef = self._bucket_ef(ef)
        qdev = jnp.asarray(queries)
        excluded = self._filter_to_excluded(where)

        n = self.n_nodes
        if where is not None:
            n = int(n - np.asarray(excluded).sum())
        packed_ops = (self._ensure_packed() if self.packed_traversal
                      else ())
        while True:
            step = self._search_step(ef, min(k, ef * self.n_shards),
                                     packed=self.packed_traversal)
            d, g, found = step(self._arrays, qdev, excluded, *packed_ops)
            d = np.asarray(d)
            g = np.asarray(g)
            alive = (g >= 0) & np.isfinite(d)
            n_alive = alive.sum(axis=1)
            # per-query: some shard filled its whole beam => more graph may
            # remain there; a single exhausted shard never blocks widening
            need_more = (n_alive < min(k, n)) & (np.asarray(found) >= ef)
            if not need_more.any() or ef >= max(self.n_nodes, 1):
                break
            ef = self._bucket_ef(ef * 2)
            self.counters["n_widenings"] += 1
        self.counters["n_searches"] += bq

        cap = self.capacity_per_shard
        out_d = np.full((bq, k), np.inf, np.float32)
        out_l = np.zeros((bq, k), np.uint64)
        out_v = np.zeros((bq, k), bool)
        for row in range(bq):
            sel = np.nonzero(alive[row])[0][:k]
            m = len(sel)
            out_d[row, :m] = d[row, sel]
            gids = g[row, sel]
            out_l[row, :m] = self._labels[gids // cap, gids % cap]
            out_v[row, :m] = True
        return out_d, out_l, out_v

    # ------------------------------------------------------------------ #
    # delete / stats
    # ------------------------------------------------------------------ #

    def tune_ef_search(self, queries, target_recall: float = 0.95,
                       k: int = 10, max_ef: int = 4096) -> int:
        """Smallest power-of-two efSearch meeting ``target_recall`` on
        ``queries`` against the sharded exact oracle (the autotuner,
        mirroring api.HnswIndex.tune_ef_search)."""
        queries = self._check_dims(queries)
        _, ol, ov = self.exact_search(queries, k)
        ef = max(self.config.ef_search, k)
        ef = 1 << (ef - 1).bit_length()
        best = ef
        while ef <= min(max_ef, max(self.n_nodes, 1)):
            d, l, v = self.search(queries, k, ef=ef, mode="graph")
            recs = []
            for r in range(queries.shape[0]):
                got = set(l[r][v[r]][:k].tolist())
                want = set(ol[r][ov[r]][:k].tolist())
                recs.append(len(got & want) / max(len(want), 1))
            best = ef
            if float(np.mean(recs)) >= target_recall:
                break
            ef *= 2
        self.config = self.config.with_ef(ef_search=best)
        return best

    def delete(self, labels) -> int:
        labels = np.asarray(labels, np.uint64).reshape(-1)
        dlt = np.asarray(self._arrays[3]).copy()
        counts = self.shard_counts
        n_new = 0
        for i in range(self.n_shards):
            mine = self._labels[i, : counts[i]]
            dead = np.isin(mine, labels) & ~dlt[i, : counts[i]]
            n_new += int(dead.sum())
            dlt[i, : counts[i]] |= dead
        shard = NamedSharding(self.mesh, P(AXIS))
        arrays = list(self._arrays)
        arrays[3] = jax.device_put(dlt, shard)
        self._arrays = tuple(arrays)
        self.counters["n_deleted"] += n_new
        return n_new

    def vacuum(self) -> Dict[str, int]:
        n = self.n_nodes
        counts = self.shard_counts
        dlt = np.asarray(self._arrays[3])
        dead = int(sum(dlt[i, : counts[i]].sum()
                       for i in range(self.n_shards)))
        return {"num_nodes": n, "num_live": n - dead, "num_dead": dead,
                "capacity": self.capacity_per_shard * self.n_shards,
                "n_shards": self.n_shards}

    def compact(self) -> "ShardedHnswIndex":
        """Rebuild over live vectors only (see api.HnswIndex.compact).
        Returns a NEW sharded index on the same mesh."""
        counts = self.shard_counts
        vec = np.asarray(self._arrays[0], np.float32)
        dlt = np.asarray(self._arrays[3])
        vecs, labels = [], []
        for i in range(self.n_shards):
            alive = ~dlt[i, : counts[i]]
            vecs.append(vec[i, : counts[i]][alive])
            labels.append(self._labels[i, : counts[i]][alive])
        fresh = ShardedHnswIndex(
            self.config, mesh=self.mesh,
            max_insert_batch=self.max_insert_batch,
            search_expand_width=self.search_expand_width,
            storage_dtype=self.storage_dtype,
            packed_traversal=self.packed_traversal)
        if sum(len(v) for v in vecs):
            fresh.build(np.concatenate(vecs), np.concatenate(labels))
        return fresh

    def check_integrity(self, raise_on_error: bool = True) -> Dict[str, int]:
        """Per-shard graph invariant validation (see api.HnswIndex)."""
        counts = self.shard_counts
        links = np.asarray(self._arrays[1])
        cnts = np.asarray(self._arrays[2])
        viol = {"count_over_maxm": 0, "self_links": 0, "bad_ids": 0,
                "dup_links": 0, "pad_violations": 0}
        slot = np.arange(self.config.max_m)[None, :]
        for s in range(self.n_shards):
            n = counts[s]
            ln = links[s, :n]
            cn = cnts[s, :n]
            in_range = slot < cn[:, None]
            viol["count_over_maxm"] += int((cn > self.config.max_m).sum())
            viol["self_links"] += int(
                ((ln == np.arange(n)[:, None]) & in_range).sum())
            viol["bad_ids"] += int((((ln < 0) | (ln >= n)) & in_range).sum())
            viol["pad_violations"] += int(((ln != -1) & ~in_range).sum())
            for i in range(n):
                row = ln[i][: cn[i]]
                viol["dup_links"] += int(len(row) - len(np.unique(row)))
        if raise_on_error and any(viol.values()):
            raise AssertionError(f"graph integrity violations: {viol}")
        return viol

    # ------------------------------------------------------------------ #
    # durability
    # ------------------------------------------------------------------ #

    def save(self, path: str) -> None:
        """Serialize all shards (same format discipline as HnswIndex.save:
        arrays + config; everything else re-derived on load)."""
        import json
        import os

        from ..api import _npz_path

        path = _npz_path(path)
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        vec, lnk, cnt, dlt, nn = (np.asarray(a) for a in self._arrays)
        hi = int(self._counts.max()) if self.n_nodes else 0
        np.savez_compressed(
            path,
            format_version=np.int64(1),
            config=np.frombuffer(
                json.dumps(self.config.to_dict()).encode(), dtype=np.uint8),
            storage_dtype=np.frombuffer(
                self.storage_dtype.encode(), dtype=np.uint8),
            n_shards=np.int64(self.n_shards),
            shard_counts=self._counts.astype(np.int64),
            # bf16 upcasts losslessly to f32 for serialization
            vectors=vec[:, :hi].astype(np.float32),
            links=lnk[:, :hi],
            link_counts=cnt[:, :hi],
            deleted=dlt[:, :hi],
            labels=self._labels[:, :hi],
            positions=self._positions[:, :hi],
        )

    @classmethod
    def load(cls, path: str, mesh: Optional[Mesh] = None,
             config: Optional[HnswConfig] = None) -> "ShardedHnswIndex":
        """Restore a sharded index. The mesh must have the same number of
        devices as the saved index had shards (resharding is a rebuild).
        Frozen-field guard as in HnswIndex.load."""
        import json

        from ..api import _npz_path

        with np.load(_npz_path(path)) as z:
            stored = HnswConfig.from_dict(
                json.loads(bytes(z["config"]).decode()))
            if config is not None:
                if config.frozen_fields() != stored.frozen_fields():
                    raise ValueError(
                        "index was built with different options "
                        "(dims/m/metric are frozen; only ef* may change)")
                cfg = config
            else:
                cfg = stored
            s = int(z["n_shards"])
            counts = z["shard_counts"]
            vec, lnk, cnt = z["vectors"], z["links"], z["link_counts"]
            dlt, lab = z["deleted"], z["labels"]
            storage_dtype = (bytes(z["storage_dtype"]).decode()
                             if "storage_dtype" in z else "float32")
            pos = z["positions"] if "positions" in z else None

        idx = cls(cfg, mesh=mesh,
                  initial_capacity=max(int(counts.max()), 32),
                  storage_dtype=storage_dtype)
        if idx.n_shards != s:
            raise ValueError(
                f"saved index has {s} shards but the mesh has "
                f"{idx.n_shards} devices; resharding requires a rebuild")
        cap = idx.capacity_per_shard
        hi = vec.shape[1]
        nvec = np.zeros((s, cap, cfg.dims), jnp.dtype(storage_dtype))
        nvec[:, :hi] = vec.astype(jnp.dtype(storage_dtype))
        nlnk = np.full((s, cap, cfg.max_m), -1, np.int32)
        nlnk[:, :hi] = lnk
        ncnt = np.zeros((s, cap), np.int32)
        ncnt[:, :hi] = cnt
        ndlt = np.zeros((s, cap), bool)
        ndlt[:, :hi] = dlt
        shard = NamedSharding(idx.mesh, P(AXIS))
        idx._arrays = tuple(jax.device_put(a, shard) for a in (
            nvec, nlnk, ncnt, ndlt, counts.astype(np.int32)))
        idx._labels = np.zeros((s, cap), np.uint64)
        idx._labels[:, :hi] = lab
        idx._positions = np.full((s, cap), -1, np.int64)
        if pos is not None:
            idx._positions[:, :hi] = pos
        else:
            # legacy files (no positions): reconstruct assuming the
            # round-robin-from-zero build order (position = slot*S + shard)
            for i in range(s):
                idx._positions[i, : counts[i]] = (
                    np.arange(counts[i]) * s + i)
        idx._counts = counts.astype(np.int64)
        idx.counters["n_inserted"] = int(counts.sum())
        return idx
