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
from ..core.build import insert_batch_core, quantize_rows
from ..core.graph import GraphState, records_3d
from ..core.search import _search_one
from ..api import _read_locked, _write_locked
from ..utils.locking import RWLock

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


def _topk_merge(all_d, all_g, k):
    """Reduce gathered per-shard candidate sets [S, B, w] to [B, k]
    (padded with +inf/-1 when fewer than k gathered candidates exist)."""
    s, b, w = all_d.shape
    flat_d = jnp.moveaxis(all_d, 0, 1).reshape(b, s * w)
    flat_g = jnp.moveaxis(all_g, 0, 1).reshape(b, s * w)
    kk = min(k, s * w)
    neg, sel = jax.lax.top_k(-flat_d, kk)
    d = -neg
    g = jnp.take_along_axis(flat_g, sel, axis=1)
    if kk < k:
        d = jnp.pad(d, ((0, 0), (0, k - kk)), constant_values=jnp.inf)
        g = jnp.pad(g, ((0, 0), (0, k - kk)), constant_values=-1)
    return d, g


def _gather_merge(d, gid, k, n_shards, dcn_slices=None):
    """All-gather per-shard candidate sets and reduce to a replicated
    global top-k — the distributed-communication backend of the index
    (SURVEY §2/§5 "TPU-native equivalents": XLA collectives over ICI
    within a slice, DCN across slices).

    Flat mode (``dcn_slices`` None/1, a single-slice mesh): one
    all_gather over the shard axis + one top-k reduce.

    Hierarchical mode (``dcn_slices`` > 1, a multi-slice mesh whose
    devices enumerate slice-major — JAX's multi-slice device order): the
    first gather + top-k reduce runs WITHIN each slice via
    ``axis_index_groups`` so it rides ICI; only the reduced [B, k] sets
    cross the slow inter-slice DCN links (k entries per query instead of
    w * devices_per_slice).  Each device's second gather meets exactly
    one peer per foreign slice; slice reductions are replicated within
    their slice, so the merged result is the global top-k, replicated on
    every device — collectives laid out so the bulk rides ICI, not DCN."""
    if not dcn_slices or dcn_slices <= 1:
        return _topk_merge(jax.lax.all_gather(d, AXIS),
                           jax.lax.all_gather(gid, AXIS), k)
    per = n_shards // dcn_slices
    ici = [[s * per + j for j in range(per)] for s in range(dcn_slices)]
    dcn = [[s * per + j for s in range(dcn_slices)] for j in range(per)]
    d1, g1 = _topk_merge(
        jax.lax.all_gather(d, AXIS, axis_index_groups=ici),
        jax.lax.all_gather(gid, AXIS, axis_index_groups=ici), k)
    return _topk_merge(
        jax.lax.all_gather(d1, AXIS, axis_index_groups=dcn),
        jax.lax.all_gather(g1, AXIS, axis_index_groups=dcn), k)


class ShardedHnswIndex:
    """Data-parallel sharded flat-NSW index over a 1-D device mesh."""

    def __init__(self, config: HnswConfig, mesh: Optional[Mesh] = None, *,
                 initial_capacity: int = 1024,
                 max_insert_batch: int = 128,
                 search_expand_width: int = 4,
                 build_expand_width: int = 8,
                 build_candidates: str = "auto",
                 storage_dtype: str = "float32",
                 quantized_traversal: bool = False,
                 packed_traversal: bool = False,
                 packed_dtype: str = "int8",
                 pq_groups: int = 16,
                 pq_opq: bool = False,
                 dcn_slices: Optional[int] = None) -> None:
        self.config = config
        self.search_expand_width = int(search_expand_width)
        # beam expansion width for CONSTRUCTION searches (see api.HnswIndex)
        self.build_expand_width = int(build_expand_width)
        # construction candidate generation, mirroring api.HnswIndex:
        # "beam" (strict reference parity) / "exact" (MXU corpus sweep per
        # shard — each shard sweeps only ITS slice, so the sweep stays
        # O(N/S) per batch and the crossover threshold applies per shard) /
        # "exact8" (int8-shadow coarse sweep + exact f32 rerank — the
        # >600k-rows-per-shard engine, see core.build._exact_candidates) /
        # "auto" (exact below exact_build_threshold rows PER SHARD, exact8
        # from there to exact8_build_threshold, beam beyond)
        if build_candidates not in ("auto", "beam", "exact", "exact8"):
            raise ValueError(
                f"unknown build_candidates: {build_candidates!r}")
        self.build_candidates = build_candidates
        # per shard (api.py analog); 0 = exact8 from row 0, the measured
        # winner (2.5x the f32 sweep's build rate at identical recall)
        self.exact_build_threshold = 0
        self.exact8_build_threshold: Optional[int] = None  # per shard
        # exact8 sweep chunk rows per shard; None = the persistent
        # measured cache (api.tune_exact8_chunk) or the 1M default
        self.exact8_chunk: Optional[int] = None
        self.build_cand_cap: Optional[int] = None
        # bulk-insert slab grains (batches per dispatch), as api.HnswIndex:
        # one host->device upload + ONE shard_map dispatch per slab — the
        # round-2 single-chip fix carried to the sharded tier (per-batch
        # dispatch costs ~150ms tunnel latency; the CPU-mesh tests don't
        # show it but real hardware does)
        self.slab_batches = (128, 16)
        # per-shard auto-routing crossover (see _use_exact)
        self.exact_threshold = 5_500_000   # per shard; see api.py note
        self.exact_threshold_packed = 2_700_000
        # filtered-search routing (see api.HnswIndex): below this allowed
        # fraction, auto mode serves `where=` via the masked exact sweep
        self.filter_exact_selectivity = 0.75
        # widening-loop ceiling (see api.HnswIndex.max_widen_ef: every
        # doubled ef is a new compiled program; unbounded doubling under
        # an ultra-selective forced-graph filter crashed the TPU worker)
        self.max_widen_ef = 4096
        self.mesh = mesh if mesh is not None else default_mesh()
        self.n_shards = self.mesh.devices.size
        # multi-slice topology hint: number of ICI slices the mesh spans
        # (devices enumerated slice-major).  Merges become hierarchical —
        # within-slice gather+reduce over ICI, only reduced top-k sets
        # cross DCN (see _gather_merge).  None/1 = single-slice (flat).
        if dcn_slices is not None and (
                dcn_slices < 1 or self.n_shards % dcn_slices):
            raise ValueError(
                f"dcn_slices={dcn_slices} must divide the mesh's "
                f"{self.n_shards} devices")
        self.dcn_slices = dcn_slices
        self.max_insert_batch = int(max_insert_batch)
        if storage_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unknown storage_dtype: {storage_dtype!r}")
        self.storage_dtype = storage_dtype
        # int8 quantized traversal with exact rerank (api.HnswIndex's
        # quantized_traversal, sharded): per-shard int8 shadow rows
        self.quantized_traversal = bool(quantized_traversal)
        self._quant = None   # (qvec [S,cap,D] i8, qscale [S,cap] f32)
        # packed neighbor-code records per shard (api.HnswIndex's
        # packed_traversal, sharded): rebuilt lazily after inserts.
        # packed_dtype "int8" (default), "pq" (product-quantized records,
        # D/pq_groups bytes/elem — the only record type that fits past ~2M
        # rows/shard at 128d; see api.HnswIndex), "float32" (exact records,
        # NO rerank — the merged results are BIT-identical to the sharded
        # plain walk, the strict-parity serving mode) or "bfloat16" (half
        # the record bytes, exact rerank).  The PQ codebook is
        # GLOBAL: trained once on a cross-shard sample and replicated over
        # the mesh, so every shard compresses consistently and the merged
        # top-k reranks against one dictionary.
        self.packed_traversal = bool(packed_traversal)
        if packed_dtype not in ("int8", "bfloat16", "float32", "pq"):
            raise ValueError(f"unknown packed_dtype: {packed_dtype!r}")
        if packed_dtype == "pq" and config.dims % int(pq_groups):
            raise ValueError(
                f"dims {config.dims} not divisible by pq_groups {pq_groups}")
        self.packed_dtype = packed_dtype
        self.pq_groups = int(pq_groups)
        # OPQ rotation before PQ (see api.HnswIndex; L2/cosine only)
        from ..config import Metric
        if pq_opq and config.metric == Metric.MANHATTAN:
            raise ValueError(
                "pq_opq requires a rotation-invariant metric (l2/cosine); "
                "manhattan distances change under rotation")
        self.pq_opq = bool(pq_opq)
        self._pq_rot = None
        self.pq_train_sample = 131_072
        self.pq_train_iters = 12
        self._pq_codebook = None
        self._packed = None  # (pcodes [S,cap,maxM*D] i8, pscales [S,cap,maxM])
        self._pq_codes = None  # u8[S, cap, G] per-ROW codes (sweep_pq)
        # sweep_pq coarse-pool width: None = per-call heuristic;
        # tune_sweep_pool sets it from a measured target (api.py analog)
        self.pq_sweep_pool: Optional[int] = None
        # incrementally-maintained int8 row shadow for the exact8 candidate
        # engine (api.HnswIndex._qvec, stacked per shard): valid iff
        # _qvec_counts matches the per-shard counts it describes
        self._qvec = None        # [S, cap, D] int8
        self._qscale = None      # [S, cap] f32
        self._qvec_counts: Optional[np.ndarray] = None

        cap = self._pad_cap(initial_capacity)
        s = self.n_shards
        self._arrays = tuple(
            self._to_mesh(a) for a in (
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
        # write-ahead delta log (see api.HnswIndex.enable_wal) — ONE logical
        # log for the whole sharded index: records are logical
        # (vectors + labels), and replay re-runs the deterministic
        # round-robin partitioning, so per-shard logs would buy nothing
        self._wal = None
        self._wal_replaying = False
        self._wal_auto_bytes = None      # enable_wal(auto_checkpoint_bytes=)
        self._wal_snapshot_path = None
        # MURSIW contract (see api.HnswIndex docstring): writers exclusive,
        # readers shared — slab donation makes read/write overlap unsafe
        self._rwlock = RWLock()

    def enable_wal(self, path: str,
                   auto_checkpoint_bytes: Optional[int] = None,
                   snapshot_path: Optional[str] = None) -> None:
        """Enable the write-ahead delta log (the GenericXLog analog,
        embedding.c:651-686) — every add()/delete() is appended and fsync'd
        BEFORE the device mutation.  load(snapshot, wal=path) replays the
        tail; save() truncates the replayed prefix (see api.HnswIndex.save).
        Reference discipline being carried over: per-insert durability
        applies to ALL writers, not just the single-chip one.

        ``auto_checkpoint_bytes`` bounds the log: past the threshold, the
        next completed mutation snapshots to ``snapshot_path`` (default
        ``path + ".ckpt.npz"``), truncating the replayed prefix — the
        checkpoint-bounded WAL discipline (see api.HnswIndex.enable_wal)."""
        from ..wal import WalWriter

        self._wal = WalWriter(path, self.config)
        self._wal_auto_bytes = (int(auto_checkpoint_bytes)
                                if auto_checkpoint_bytes else None)
        self._wal_snapshot_path = snapshot_path or (path + ".ckpt.npz")

    def _maybe_auto_checkpoint(self) -> None:
        """Post-mutation checkpoint trigger (see api.HnswIndex): every
        logged record is applied on device at call time, so snapshot +
        truncate never drops an acknowledged write."""
        if (self._wal is not None and not self._wal_replaying
                and getattr(self, "_wal_auto_bytes", None) is not None
                and self._wal.tell() >= self._wal_auto_bytes):
            self.save(self._wal_snapshot_path)

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

    def _candidate_mode(self, count_at_start: int):
        """Resolve (candidates, cand_cap) for a slab starting at the given
        PER-SHARD node count (mirrors api.HnswIndex._candidate_mode; the
        sweep cost is O(rows-per-shard), so the threshold applies per
        shard)."""
        mode = self.build_candidates
        if mode == "auto":
            if count_at_start < self.exact_build_threshold:
                mode = "exact"
            elif (self.exact8_build_threshold is None or
                  count_at_start < self.exact8_build_threshold):
                mode = "exact8"
            else:
                mode = "beam"
        cap = self.build_cand_cap
        if cap is None and mode in ("exact", "exact8"):
            cap = 2 * self.config.ef_construction
        return mode, cap

    def _slab_step(self, batch: int, n_batches: int, candidates: str,
                   cand_cap):
        """Shard-mapped SLAB insert: ``n_batches`` sequential masked batch
        inserts run INSIDE one compiled SPMD program per dispatch — the
        single-chip insert_slab_donating (core/build.py) under shard_map.
        Graph buffers are donated, so capacity-sized arrays update in
        place instead of copying per slab.

        Cached per (batch, n_batches, capacity, candidate mode)."""
        key = ("slab", batch, n_batches, self.capacity_per_shard,
               self.build_expand_width, candidates, cand_cap)
        if key in self._step_cache:
            return self._step_cache[key]
        cfg = self.config

        def step(arrays, slab, n_valid):
            # slab: [1, n_batches*batch, D] local; n_valid: [1] local
            g = _local(arrays)

            def body(i, g):
                points = jax.lax.dynamic_slice_in_dim(
                    slab[0], i * batch, batch, axis=0)
                n_ins = jnp.clip(n_valid[0] - i * batch, 0, batch)
                return insert_batch_core(
                    g, points, n_ins,
                    ef_construction=cfg.ef_construction,
                    m=cfg.m, max_m=cfg.max_m,
                    metric_value=cfg.metric.value, cand_cap=cand_cap,
                    expand_width=self.build_expand_width,
                    candidates=candidates)

            g = jax.lax.fori_loop(0, n_batches, body, g)
            return _stacked(g)

        spec = (P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS))
        fn = jax.jit(jax.shard_map(
            step, mesh=self.mesh,
            in_specs=(spec, P(AXIS), P(AXIS)),
            out_specs=spec, check_vma=False), donate_argnums=(0,))
        self._step_cache[key] = fn
        return fn

    def _resolve_exact8_chunk(self) -> int:
        """Per-shard exact8 sweep chunk: explicit setting > the persistent
        measured cache shared with the single-chip tuner > 1M default."""
        if self.exact8_chunk is not None:
            return int(self.exact8_chunk)
        from ..api import _exact8_chunk_cache, _exact8_chunk_key

        hit = _exact8_chunk_cache().get(
            _exact8_chunk_key(self.config.dims, self.capacity_per_shard))
        return int(hit[0]) if hit else 1_048_576

    def _slab_step8(self, batch: int, n_batches: int, cand_cap):
        """Shard-mapped exact8 SLAB insert — insert_slab_q_donating
        (core/build.py) under shard_map: the per-shard int8 row shadow is
        threaded through the batch loop (each batch stages its quantized
        codes BEFORE its coarse sweep, so later batches see earlier ones as
        candidates), and all buffers — graph AND shadow — are donated."""
        chunk = self._resolve_exact8_chunk()
        key = ("slab8", batch, n_batches, self.capacity_per_shard,
               self.build_expand_width, cand_cap, chunk)
        if key in self._step_cache:
            return self._step_cache[key]
        cfg = self.config

        def step(arrays, qvec, qscale, slab, n_valid):
            g = _local(arrays)

            def body(i, state):
                g, qv, qs = state
                points = jax.lax.dynamic_slice_in_dim(
                    slab[0], i * batch, batch, axis=0)
                n_ins = jnp.clip(n_valid[0] - i * batch, 0, batch)
                base = g.n_nodes
                q, s = quantize_rows(points)
                qv = jax.lax.dynamic_update_slice(qv, q, (base, 0))
                qs = jax.lax.dynamic_update_slice(qs, s, (base,))
                g = insert_batch_core(
                    g, points, n_ins,
                    ef_construction=cfg.ef_construction,
                    m=cfg.m, max_m=cfg.max_m,
                    metric_value=cfg.metric.value, cand_cap=cand_cap,
                    expand_width=self.build_expand_width,
                    candidates="exact8", qvec=qv, qscale=qs,
                    exact8_chunk=chunk)
                return g, qv, qs

            g, qv, qs = jax.lax.fori_loop(
                0, n_batches, body, (g, qvec[0], qscale[0]))
            return _stacked(g), qv[None], qs[None]

        spec = (P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS))
        fn = jax.jit(jax.shard_map(
            step, mesh=self.mesh,
            in_specs=(spec, P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
            out_specs=(spec, P(AXIS), P(AXIS)), check_vma=False),
            donate_argnums=(0, 1, 2))
        self._step_cache[key] = fn
        return fn

    def _sync_shadow(self, counts_now: np.ndarray) -> None:
        """Bring the int8 row shadow up to the current live rows if it is
        missing or stale (one full shard-mapped quantize pass — only at the
        first exact8 slab or after growth/non-exact8 slabs; appended rows
        never change, so incremental staging equals a full requantization
        thereafter)."""
        if self._qvec is None or not np.array_equal(self._qvec_counts,
                                                    counts_now):
            self._qvec, self._qscale = self._quant_step()(self._arrays)
            self._qvec_counts = counts_now.copy()

    @_write_locked
    def add(self, vectors, labels=None) -> None:
        """Round-robin partition + SPMD slab inserts on every shard.

        The per-shard row streams are cut into (big, small)-grain slabs of
        fixed shape; each slab is one host->device upload + ONE shard_map
        dispatch (the batch loop runs inside the program) — dispatch-count
        parity with the single-chip path (api.HnswIndex.add bulk branch)."""
        vectors = self._check_dims(vectors)
        n = vectors.shape[0]
        if labels is None:
            base_label = self.counters["n_inserted"]
            labels = np.arange(base_label, base_label + n, dtype=np.uint64)
        else:
            labels = np.asarray(labels, np.uint64).reshape(-1)
            if labels.shape[0] != n:
                raise ValueError("labels/vectors length mismatch")
        if self._wal is not None and not self._wal_replaying:
            # write-ahead: durable before any device mutation
            self._wal.log_insert(vectors, labels)

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

        # slab schedule over the max per-shard stream (ragged tails across
        # batches AND shards are n_insert-masked): (offset, rows, batches)
        max_off = int(per_n.max())
        b = self.max_insert_batch
        big, small = self.slab_batches
        schedule = []
        off = 0
        while max_off - off >= big * b:
            schedule.append((off, big * b, big))
            off += big * b
        while off < max_off:
            rows = min(small * b, max_off - off)
            schedule.append((off, rows, small))
            off += rows

        def _upload(soff, rows, nb):
            pts = np.zeros((s, nb * b, self.config.dims), np.float32)
            n_val = np.zeros((s,), np.int32)
            for i in range(s):
                take = per_shard[i][soff: soff + nb * b]
                pts[i, : len(take)] = vectors[take]
                n_val[i] = len(take)
            return (self._to_mesh(pts), self._to_mesh(n_val))

        # packed/quant serving caches may alias the build shadow, which the
        # exact8 slab DONATES — drop them before any dispatch
        self._packed = None
        self._quant = None
        self._pq_codes = None
        if schedule:
            nxt = _upload(*schedule[0])
            for si, (soff, rows, nb) in enumerate(schedule):
                dev = nxt
                if si + 1 < len(schedule):
                    nxt = _upload(*schedule[si + 1])  # overlap with insert
                mode, cap = self._candidate_mode(int(counts.min()) + soff)
                if mode == "exact8":
                    counts_now = counts + np.minimum(soff, per_n)
                    self._sync_shadow(counts_now)
                    (self._arrays, self._qvec,
                     self._qscale) = self._slab_step8(b, nb, cap)(
                        self._arrays, self._qvec, self._qscale, *dev)
                    self._qvec_counts = counts + np.minimum(soff + nb * b,
                                                            per_n)
                else:
                    self._arrays = self._slab_step(b, nb, mode, cap)(
                        self._arrays, *dev)
        self._counts = counts + per_n
        self.counters["n_inserted"] += n
        # the int8 row shadow survives the add iff the exact8 threading
        # maintained it through every inserted row (api.add discipline)
        if self._qvec is not None and not np.array_equal(self._qvec_counts,
                                                         self._counts):
            self._qvec = None
            self._qscale = None
            self._qvec_counts = None
        self._maybe_auto_checkpoint()

    @_write_locked
    def build(self, vectors, labels=None) -> None:
        vectors = self._check_dims(vectors)
        if self.n_nodes != 0:
            raise RuntimeError("build() requires an empty index; use add()")
        per = -(-vectors.shape[0] // self.n_shards) + self.max_insert_batch
        if per > self.capacity_per_shard:
            self._grow(per)
        self.add(vectors, labels)

    # ------------------------------------------------------------------ #
    # multi-process (multi-host) array movement
    # ------------------------------------------------------------------ #

    def _to_host(self, a) -> np.ndarray:
        """Materialize a device array on THIS host.  On a multi-process
        mesh (jax.distributed — the real multi-host deployment) per-shard
        arrays span non-addressable devices, so plain np.asarray raises;
        process_allgather assembles the global value on every host.
        NOTE: in multi-process mode this is ALWAYS a collective — every
        process must call it in the same order (no addressability
        short-circuit, which would deadlock processes that own the data
        against processes that don't)."""
        if jax.process_count() == 1:
            return np.asarray(a)
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(a, tiled=True))

    def _to_mesh(self, a, spec=P(AXIS)):
        """Place a host array onto the mesh.  Multi-process: every process
        holds the same full host value (SPMD discipline) and contributes
        its addressable shards via make_array_from_callback."""
        sh = NamedSharding(self.mesh, spec)
        if jax.process_count() == 1:
            return jax.device_put(a, sh)
        a = np.asarray(a)
        return jax.make_array_from_callback(a.shape, sh,
                                            lambda idx: a[idx])

    def _grow(self, new_cap: int) -> None:
        new_cap = self._pad_cap(max(new_cap, self.capacity_per_shard * 2))
        s = self.n_shards
        old = self.capacity_per_shard
        grow = new_cap - old
        shard = NamedSharding(self.mesh, P(AXIS))

        # pad ON DEVICE: capacity growth never round-trips the graph
        # through the host (the old host path both drained the pipeline
        # and broke multi-process meshes, where per-shard arrays are not
        # host-addressable); padding is along the capacity axis, so the
        # shard axis layout is untouched and donation frees old buffers
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3),
                           out_shardings=(shard, shard, shard, shard))
        def pad(vec, lnk, cnt, dlt):
            return (jnp.pad(vec, ((0, 0), (0, grow), (0, 0))),
                    jnp.pad(lnk, ((0, 0), (0, grow), (0, 0)),
                            constant_values=-1),
                    jnp.pad(cnt, ((0, 0), (0, grow))),
                    jnp.pad(dlt, ((0, 0), (0, grow))))

        vec, lnk, cnt, dlt, nn = self._arrays
        self._arrays = pad(vec, lnk, cnt, dlt) + (nn,)
        nlab = np.zeros((s, new_cap), np.uint64)
        nlab[:, :old] = self._labels
        self._labels = nlab
        npos = np.full((s, new_cap), -1, np.int64)
        npos[:, :old] = self._positions
        self._positions = npos
        self._packed = None
        self._quant = None
        self._pq_codes = None
        # capacity-shaped shadow: rebuilt at the new capacity by the next
        # exact8 slab (or quantized search)
        self._qvec = None
        self._qscale = None
        self._qvec_counts = None

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
            # tile-conditional layout (core/graph.records_3d): 3-D when
            # exactly aligned (avoids the per-hop relayout — the r4
            # packed regression), else flat [cap, maxM*D] (per-neighbor
            # D padding + the serving-program layout copy)
            recs = qv[safe]
            if not records_3d(1, g.links.shape[1], qv.shape[1]):
                recs = recs.reshape(g.capacity, -1)
            return recs[None], scale[safe][None]

        spec = (P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS))
        fn = jax.jit(jax.shard_map(pack, mesh=self.mesh, in_specs=(spec,),
                                   out_specs=(P(AXIS), P(AXIS)),
                                   check_vma=False))
        self._step_cache[key] = fn
        return fn

    def _ensure_pq_codebook(self):
        """Train the global PQ codebook on a strided cross-shard sample
        (see api.HnswIndex._ensure_pq_codebook; one dictionary for the
        whole mesh so merged candidates compress consistently)."""
        if self._pq_codebook is None:
            from ..ops.pq import train_opq, train_pq

            counts = self.shard_counts
            per = max(1, self.pq_train_sample // max(self.n_shards, 1))
            rows = []
            for i in range(self.n_shards):
                n_i = int(counts[i])
                if n_i:
                    stride = max(1, n_i // per)
                    rows.append(self._to_host(
                        self._arrays[0][i, :n_i:stride]).astype(np.float32))
            sample = (np.concatenate(rows) if rows
                      else np.zeros((1, self.config.dims), np.float32))
            if self.pq_opq:
                self._pq_rot, self._pq_codebook = train_opq(
                    jnp.asarray(sample), groups=self.pq_groups,
                    pq_iters=self.pq_train_iters)
            else:
                self._pq_codebook = train_pq(jnp.asarray(sample),
                                             groups=self.pq_groups,
                                             iters=self.pq_train_iters)
        return self._pq_codebook

    def _pack_step_pq(self):
        """Shard-mapped builder for packed PQ neighbor records: rotate
        (identity when OPQ is off — bit-exact no-op) and encode the local
        rows against the REPLICATED global codebook, then one gather
        co-locates every node's neighbors' codes (cf. _pack_step)."""
        key = ("packpq", self.capacity_per_shard, self.pq_groups)
        if key in self._step_cache:
            return self._step_cache[key]
        from ..ops.pq import pack_pq_records, pq_encode

        def pack(arrays, codebook, rot):
            g = _local(arrays)
            codes = pq_encode(g.vectors, codebook, rot)
            # FLAT u8[cap, maxM*G] records (128-lane aligned; ops/pq.py)
            return pack_pq_records(codes, g.links)[None]

        spec = (P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS))
        fn = jax.jit(jax.shard_map(pack, mesh=self.mesh,
                                   in_specs=(spec, P(), P()),
                                   out_specs=P(AXIS), check_vma=False))
        self._step_cache[key] = fn
        return fn

    def _pack_step_cast(self):
        """Shard-mapped builder for cast packed records (bf16/f32 — no
        scales; see api.HnswIndex._pack_records_cast): one gather
        co-locates every node's neighbors' rows at the chosen precision.
        f32 records reproduce the plain walk's results exactly (same ids,
        same order; distance scalars bit-identical on CPU, final-ulp on
        TPU — see api.HnswIndex._pack_records_cast)."""
        key = ("packcast", self.capacity_per_shard, self.packed_dtype)
        if key in self._step_cache:
            return self._step_cache[key]
        dtype = jnp.dtype(self.packed_dtype)

        def pack(arrays):
            g = _local(arrays)
            safe = jnp.maximum(g.links, 0)
            # tile-conditional layout (core/graph.records_3d; see
            # api._pack_records_cast)
            recs = g.vectors.astype(dtype)[safe]
            if not records_3d(dtype.itemsize, g.links.shape[1],
                              g.vectors.shape[1]):
                recs = recs.reshape(g.capacity, -1)
            return recs[None]

        spec = (P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS))
        fn = jax.jit(jax.shard_map(pack, mesh=self.mesh, in_specs=(spec,),
                                   out_specs=P(AXIS), check_vma=False))
        self._step_cache[key] = fn
        return fn

    def _pq_rotation(self):
        """The OPQ rotation, or the identity (matmul with I is bit-exact,
        so one compiled program serves both modes)."""
        if self._pq_rot is not None:
            return self._pq_rot
        return jnp.eye(self.config.dims, dtype=jnp.float32)

    def _ensure_packed(self):
        if self._packed is None:
            if self.packed_dtype == "pq":
                cb = self._ensure_pq_codebook()
                rot = self._pq_rotation()
                self._packed = (
                    self._pack_step_pq()(self._arrays, cb, rot), cb, rot)
            elif self.packed_dtype in ("float32", "bfloat16"):
                self._packed = (self._pack_step_cast()(self._arrays),)
            else:
                self._packed = self._pack_step()(self._arrays)
        return self._packed

    def downcast_corpus(self, dtype: str = "bfloat16") -> None:
        """Serving-footprint transition, sharded twin of
        api.HnswIndex.downcast_corpus: cast the stacked per-shard corpus
        to a narrower storage dtype in place AFTER building (and after
        any PQ training/encoding), keeping derived shadows.  The cast
        preserves the mesh sharding (elementwise astype over the
        AXIS-sharded array); lossy and one-way."""
        if dtype not in ("bfloat16",):
            if dtype == "float32":
                raise ValueError(
                    "cannot widen a downcast corpus back to float32 — "
                    "the dropped mantissa bits are gone; rebuild from "
                    "the source vectors")
            raise ValueError(f"unknown downcast dtype: {dtype!r}")
        if self.storage_dtype == dtype:
            return
        self.storage_dtype = dtype
        self._arrays = (self._arrays[0].astype(jnp.dtype(dtype)),
                        *self._arrays[1:])

    def _quant_step(self):
        """Shard-mapped int8 row quantization (api.HnswIndex._quantize per
        shard): per-row symmetric scales, live rows only."""
        key = ("quant", self.capacity_per_shard)
        if key in self._step_cache:
            return self._step_cache[key]

        def quant(arrays):
            g = _local(arrays)
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (g.capacity, 1), 0)[:, 0]
            live = (rows < g.n_nodes)[:, None]
            v = jnp.where(live, g.vectors.astype(jnp.float32), 0.0)
            scale = jnp.maximum(jnp.max(jnp.abs(v), axis=1), 1e-30) / 127.0
            qv = jnp.clip(jnp.round(v / scale[:, None]), -127,
                          127).astype(jnp.int8)
            return qv[None], scale[None]

        spec = (P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS))
        fn = jax.jit(jax.shard_map(quant, mesh=self.mesh, in_specs=(spec,),
                                   out_specs=(P(AXIS), P(AXIS)),
                                   check_vma=False))
        self._step_cache[key] = fn
        return fn

    def _ensure_quant(self):
        if self._quant is None:
            # the exact8 build shadow IS the quantized-traversal shadow —
            # reuse it when it covers every live row (add() drops serving
            # caches before donating, so the alias is safe)
            if self._qvec is not None and np.array_equal(self._qvec_counts,
                                                         self._counts):
                self._quant = (self._qvec, self._qscale)
            else:
                self._quant = self._quant_step()(self._arrays)
        return self._quant

    def _traversal_variant(self) -> str:
        if self.packed_traversal:
            if self.packed_dtype == "pq":
                return "pq"
            if self.packed_dtype in ("float32", "bfloat16"):
                return "cast"
            return "packed"
        if self.quantized_traversal:
            return "quant"
        return "plain"

    def _search_step(self, ef: int, k_total: int, variant: str = "plain"):
        """Shard-mapped search + ICI all-gather + global top-k merge.
        ``variant``: "plain" f32 row gathers / "packed" contiguous int8
        neighbor records / "pq" product-quantized records against the
        replicated global codebook (+ OPQ rotation) / "quant" int8 row
        gathers — all with exact rerank (see core/search._search_one)."""
        key = ("search", ef, k_total, self.capacity_per_shard,
               self.search_expand_width, variant, self.dcn_slices)
        if key in self._step_cache:
            return self._step_cache[key]
        cfg = self.config
        cap = self.capacity_per_shard

        def step(arrays, queries, excluded, *aux):
            g = _local(arrays)
            g = g._replace(deleted=g.deleted | excluded[0])
            q = queries  # replicated: [B, D]
            fn = functools.partial(_search_one, ef=ef,
                                   metric_value=cfg.metric.value,
                                   cand_cap=ef,
                                   expand_width=self.search_expand_width)
            if variant == "pq":
                # codebook + rotation are REPLICATED (not per-shard); the
                # traversal compares decoded rotated rows against q @ R
                # (identity when OPQ is off — see _pq_rotation)
                pc, cb, rot = aux
                qts = q.astype(jnp.float32) @ rot          # [B, D]
                d, i, hops, evals = jax.vmap(
                    lambda gg, qq, qt, pc_, cb_: fn(
                        gg, qq, pcodes=pc_, pq_codebook=cb_, query_t=qt),
                    in_axes=(None, 0, 0, None, None))(g, q, qts, pc[0], cb)
            elif variant == "packed":
                aux_a, aux_b = aux
                d, i, hops, evals = jax.vmap(
                    lambda gg, qq, pc, ps: fn(gg, qq, pcodes=pc,
                                              pscales=ps),
                    in_axes=(None, 0, None, None))(g, q, aux_a[0],
                                                   aux_b[0])
            elif variant == "cast":
                # bf16/f32 records, no scales (f32 = result-exact plain
                # walk; scalars final-ulp on TPU, see _pack_step_cast)
                (aux_a,) = aux
                d, i, hops, evals = jax.vmap(
                    lambda gg, qq, pc: fn(gg, qq, pcodes=pc),
                    in_axes=(None, 0, None))(g, q, aux_a[0])
            elif variant == "quant":
                aux_a, aux_b = aux
                d, i, hops, evals = jax.vmap(
                    lambda gg, qq, qv, qs: fn(gg, qq, qvectors=qv,
                                              qscale=qs),
                    in_axes=(None, 0, None, None))(g, q, aux_a[0],
                                                   aux_b[0])
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

            # gather candidate sets + global top-k merge (hierarchical on
            # multi-slice meshes: ICI within a slice, DCN across)
            out_d, out_g = _gather_merge(d, gid, k_total, self.n_shards,
                                         self.dcn_slices)
            return out_d, out_g, jax.lax.pmax(found, AXIS)

        spec = (P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS))
        if variant == "pq":
            # records per-shard; codebook + rotation replicated
            aux_specs = (P(AXIS), P(), P())
        elif variant == "cast":
            aux_specs = (P(AXIS),)
        elif variant != "plain":
            aux_specs = (P(AXIS), P(AXIS))
        else:
            aux_specs = ()
        fn = jax.jit(jax.shard_map(
            step, mesh=self.mesh,
            in_specs=(spec, P(), P(AXIS)) + aux_specs,
            out_specs=(P(), P(), P()), check_vma=False))
        self._step_cache[key] = fn
        return fn

    def _exact_step(self, k: int):
        """Shard-mapped exact sweep: per-shard fused Pallas top-k over the
        local vectors (the same kernel as the single-chip fast path,
        including the L2 over-fetch + exact rerank), all_gather + global
        top-k merge — the sharded seq-scan oracle (and the batched serving
        fast path)."""
        key = ("exact", k, self.capacity_per_shard, self.dcn_slices)
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
            return _gather_merge(d, gid, k, self.n_shards,
                                 self.dcn_slices)

        spec = (P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS))
        fn = jax.jit(jax.shard_map(
            step, mesh=self.mesh,
            in_specs=(spec, P(), P(AXIS)),
            out_specs=(P(), P()), check_vma=False))
        self._step_cache[key] = fn
        return fn

    def _pq_codes_step(self):
        """Shard-mapped per-ROW PQ encode: u8[S, cap, G] against the
        replicated global codebook (+ OPQ rotation) — the compressed corpus
        image the sweep_pq engine streams (ops/pq_sweep.py)."""
        key = ("pqcodes", self.capacity_per_shard, self.pq_groups)
        if key in self._step_cache:
            return self._step_cache[key]
        from ..ops.pq import pq_encode

        def step(arrays, cb, rot):
            g = _local(arrays)
            return pq_encode(g.vectors, cb, rot)[None]

        spec = (P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS))
        fn = jax.jit(jax.shard_map(step, mesh=self.mesh,
                                   in_specs=(spec, P(), P()),
                                   out_specs=P(AXIS), check_vma=False))
        self._step_cache[key] = fn
        return fn

    def _ensure_pq_codes(self):
        if self._pq_codes is None:
            cb = self._ensure_pq_codebook()
            self._pq_codes = self._pq_codes_step()(
                self._arrays, cb, self._pq_rotation())
        return self._pq_codes

    def _sweep_pq_step(self, k: int, pool: int):
        """Shard-mapped compressed sweep: per-shard ADC over local PQ codes
        + exact-f32 rerank on the local rows (ops/pq_sweep.pq_sweep_search
        — distances are exact BEFORE the merge), all_gather + global top-k.
        The sharded analog of _exact_step with the code stream replacing
        the f32 corpus stream."""
        key = ("sweeppq", k, pool, self.capacity_per_shard,
               self.pq_groups, self.dcn_slices)
        if key in self._step_cache:
            return self._step_cache[key]
        cfg = self.config
        cap = self.capacity_per_shard
        from ..ops.pq_sweep import pq_sweep_search as _sweep

        def step(arrays, queries, excluded, codes, cb, rot):
            g = _local(arrays)
            d, i = _sweep(queries, codes[0], cb, rot, g.vectors, k,
                          cfg.metric, n_valid=g.n_nodes,
                          deleted=g.deleted | excluded[0], pool=pool)
            sid = jax.lax.axis_index(AXIS)
            gid = jnp.where(i >= 0, sid * cap + i, -1)
            return _gather_merge(d, gid, k, self.n_shards,
                                 self.dcn_slices)

        spec = (P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS))
        fn = jax.jit(jax.shard_map(
            step, mesh=self.mesh,
            in_specs=(spec, P(), P(AXIS), P(AXIS), P(), P()),
            out_specs=(P(), P()), check_vma=False))
        self._step_cache[key] = fn
        return fn

    @_read_locked
    def pq_sweep_search(self, queries, k: int, pool: Optional[int] = None,
                        where=None
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Sharded compressed brute-force k-NN (see
        api.HnswIndex.pq_sweep_search): every shard streams its own code
        image, reranks its pool exactly, and the merge keeps the global
        top-k — approximate via the coarse pool, exact in the returned
        distances.  ``pool`` is bucketed to a power of two per shard."""
        queries = self._check_dims(queries)
        codes = self._ensure_pq_codes()
        if pool is None:
            pool = (self.pq_sweep_pool if self.pq_sweep_pool
                    else min(max(4 * k, k + 28), 256))
        pool = 1 << (max(int(pool), int(k)) - 1).bit_length()
        d, g = self._sweep_pq_step(int(k), pool)(
            self._arrays, jnp.asarray(queries),
            self._filter_to_excluded(where), codes,
            self._ensure_pq_codebook(), self._pq_rotation())
        d = np.asarray(d)
        g = np.asarray(g)
        cap = self.capacity_per_shard
        valid = (g >= 0) & np.isfinite(d)
        safe = np.maximum(g, 0)
        labels = np.where(valid, self._labels[safe // cap, safe % cap], 0)
        return d, labels.astype(np.uint64), valid

    def _filter_to_excluded(self, where):
        """Search filter -> per-shard excluded bool[S, cap] on the mesh
        (sharded predicate pushdown). ``where`` is either an array of
        allowed labels, or a bool mask over global INSERT POSITIONS (the
        single-chip node-id mask form; positions are tracked per slot in
        self._positions)."""
        return self._to_mesh(self._filter_mask(where))

    def _filter_mask(self, where) -> np.ndarray:
        """Host form of _filter_to_excluded (the scan cursor snapshots
        this before placement)."""
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
        return excluded

    @_read_locked
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
        exact cost is O(n_shard), so the crossover scales with the mesh;
        packed traversal roughly doubles graph QPS and halves the
        crossover (the packed threshold, as on the single-chip router)."""
        threshold = (self.exact_threshold_packed if self.packed_traversal
                     else self.exact_threshold)
        per_shard = self.n_nodes / max(self.n_shards, 1)
        return per_shard <= threshold and batch >= 32

    @_read_locked
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
        if mode not in ("auto", "graph", "exact", "sweep_pq"):
            raise ValueError(f"unknown search mode: {mode!r}")
        if mode == "sweep_pq":
            self.counters["n_searches"] += bq
            return self.pq_sweep_search(queries, k, where=where)
        # selective filters route to the masked exact sweep (see
        # api.HnswIndex.search: filtered waypoints fill beam slots without
        # surfacing, degenerating the widening loop; sweep cost is
        # selectivity-independent)
        host_mask = self._filter_mask(where)
        n_allowed = (self.n_nodes - int(host_mask.sum())
                     if where is not None else self.n_nodes)
        selective = (where is not None and
                     n_allowed < self.filter_exact_selectivity
                     * max(self.n_nodes, 1))
        if mode == "exact" or (mode == "auto"
                               and (self._use_exact(bq) or selective)):
            self.counters["n_searches"] += bq
            self.counters["n_exact_routed"] = (
                self.counters.get("n_exact_routed", 0) + bq)
            return self.exact_search(queries, k, where=where)
        ef = self.config.ef_search if ef is None else int(ef)
        ef = self._bucket_ef(ef)
        qdev = jnp.asarray(queries)
        excluded = self._to_mesh(host_mask)

        n = n_allowed
        variant = self._traversal_variant()
        if variant in ("packed", "pq", "cast"):
            aux = self._ensure_packed()
        elif variant == "quant":
            aux = self._ensure_quant()
        else:
            aux = ()
        while True:
            step = self._search_step(ef, min(k, ef * self.n_shards),
                                     variant=variant)
            d, g, found = step(self._arrays, qdev, excluded, *aux)
            d = np.asarray(d)
            g = np.asarray(g)
            alive = (g >= 0) & np.isfinite(d)
            n_alive = alive.sum(axis=1)
            # per-query: some shard filled its whole beam => more graph may
            # remain there; a single exhausted shard never blocks widening
            need_more = (n_alive < min(k, n)) & (np.asarray(found) >= ef)
            if (not need_more.any()
                    or ef >= min(max(self.n_nodes, 1),
                                 self.max_widen_ef)):
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
                       k: int = 10, max_ef: int = 4096,
                       strict: bool = False):
        """Smallest power-of-two efSearch meeting ``target_recall`` on
        ``queries`` against the sharded exact oracle (the autotuner,
        mirroring api.HnswIndex.tune_ef_search).  Returns
        TuneResult(ef, recall, met); strict=True raises on miss."""
        from ..api import TuneResult, TuneTargetMissed

        queries = self._check_dims(queries)
        _, ol, ov = self.exact_search(queries, k)
        ef = max(self.config.ef_search, k)
        ef = 1 << (ef - 1).bit_length()
        best, achieved = ef, 0.0
        while ef <= min(max_ef, max(self.n_nodes, 1)):
            d, l, v = self.search(queries, k, ef=ef, mode="graph")
            recs = []
            for r in range(queries.shape[0]):
                got = set(l[r][v[r]][:k].tolist())
                want = set(ol[r][ov[r]][:k].tolist())
                recs.append(len(got & want) / max(len(want), 1))
            best, achieved = ef, float(np.mean(recs))
            if achieved >= target_recall:
                break
            ef *= 2
        met = achieved >= target_recall
        if strict and not met:
            raise TuneTargetMissed(
                f"recall {achieved:.4f} at ef={best} misses target "
                f"{target_recall} (max_ef={max_ef})")
        self.config = self.config.with_ef(ef_search=best)
        return TuneResult(best, achieved, met)

    def tune_sweep_pool(self, queries, target_recall: float = 0.95,
                        k: int = 10, max_pool: int = 1024,
                        strict: bool = False):
        """Smallest power-of-two sweep_pq coarse-pool width (PER SHARD)
        meeting ``target_recall`` against the sharded exact oracle —
        mirrors api.HnswIndex.tune_sweep_pool; sets self.pq_sweep_pool."""
        from ..api import TuneResult, TuneTargetMissed

        queries = self._check_dims(queries)
        _, ol, ov = self.exact_search(queries, k)
        pool = 1 << (max(2 * k, 16) - 1).bit_length()
        best, achieved = pool, 0.0
        while pool <= max_pool:
            _, l, v = self.pq_sweep_search(queries, k, pool=pool)
            recs = []
            for r in range(queries.shape[0]):
                want = set(ol[r][ov[r]][:k].tolist())
                recs.append(len(set(l[r][v[r]].tolist()) & want) /
                            max(len(want), 1))
            best, achieved = pool, float(np.mean(recs))
            if achieved >= target_recall:
                break
            pool *= 2
        met = achieved >= target_recall
        if strict and not met:
            raise TuneTargetMissed(
                f"recall {achieved:.4f} at pool={best} misses target "
                f"{target_recall} (max_pool={max_pool})")
        self.pq_sweep_pool = best
        return TuneResult(best, achieved, met)

    def set_ef_search(self, ef_search: int) -> None:
        """ALTER INDEX ... SET (efsearch=...) — the only legal live
        mutation besides ef_construction (embedding.c:594-602)."""
        self.config = self.config.with_ef(ef_search=ef_search)

    def set_ef_construction(self, ef_construction: int) -> None:
        self.config = self.config.with_ef(ef_construction=ef_construction)

    def open_scan(self, query, ef: Optional[int] = None,
                  where=None) -> "ShardedScan":
        """Pull-model cursor over one query — the amgettuple analog on the
        sharded tier (see api.HnswIndex.open_scan): result cache, global
        node-id dedup across fetches, progressive ef-doubling on
        exhaustion, per-shard raw-beam termination."""
        query = self._check_dims(query)
        if query.shape[0] != 1:
            raise ValueError("open_scan takes exactly one query vector")
        ef = self.config.ef_search if ef is None else int(ef)
        return ShardedScan(self, query, self._bucket_ef(max(ef, 1)), where)

    @_write_locked
    def delete(self, labels) -> int:
        labels = np.asarray(labels, np.uint64).reshape(-1)
        dlt = self._to_host(self._arrays[3]).copy()
        counts = self.shard_counts
        n_new = 0
        newly: list = []
        for i in range(self.n_shards):
            mine = self._labels[i, : counts[i]]
            dead = np.isin(mine, labels) & ~dlt[i, : counts[i]]
            n_new += int(dead.sum())
            newly.append(mine[dead])
            dlt[i, : counts[i]] |= dead
        if n_new and self._wal is not None and not self._wal_replaying:
            self._wal.log_delete(np.concatenate(newly))
        arrays = list(self._arrays)
        arrays[3] = self._to_mesh(dlt)
        self._arrays = tuple(arrays)
        self.counters["n_deleted"] += n_new
        self._maybe_auto_checkpoint()
        return n_new

    @_write_locked
    def delete_where(self, mask) -> int:
        """Tombstone by global-insert-position mask — the callback form of
        ambulkdelete (see api.HnswIndex.delete_where; positions are the
        sharded node-id space, tracked per slot in self._positions)."""
        mask = np.asarray(mask, bool).reshape(-1)
        dlt = self._to_host(self._arrays[3]).copy()
        counts = self.shard_counts
        n_new = 0
        newly: list = []
        for i in range(self.n_shards):
            pos = self._positions[i, : counts[i]]
            hit = (pos >= 0) & (pos < len(mask))
            dead = np.zeros(int(counts[i]), bool)
            dead[hit] = mask[pos[hit]]
            dead &= ~dlt[i, : counts[i]]
            n_new += int(dead.sum())
            newly.append(self._labels[i, : counts[i]][dead])
            dlt[i, : counts[i]] |= dead
        if n_new and self._wal is not None and not self._wal_replaying:
            # canonical WAL form is labels (the TID analog)
            self._wal.log_delete(np.concatenate(newly))
        arrays = list(self._arrays)
        arrays[3] = self._to_mesh(dlt)
        self._arrays = tuple(arrays)
        self.counters["n_deleted"] += n_new
        self._maybe_auto_checkpoint()
        return n_new

    @_read_locked
    def vacuum(self) -> Dict[str, int]:
        n = self.n_nodes
        counts = self.shard_counts
        dlt = self._to_host(self._arrays[3])
        dead = int(sum(dlt[i, : counts[i]].sum()
                       for i in range(self.n_shards)))
        return {"num_nodes": n, "num_live": n - dead, "num_dead": dead,
                "capacity": self.capacity_per_shard * self.n_shards,
                "n_shards": self.n_shards}

    @_read_locked
    def compact(self) -> "ShardedHnswIndex":
        """Rebuild over live vectors only (see api.HnswIndex.compact).
        Returns a NEW sharded index on the same mesh."""
        counts = self.shard_counts
        vec = self._to_host(self._arrays[0]).astype(np.float32)
        dlt = self._to_host(self._arrays[3])
        vecs, labels = [], []
        for i in range(self.n_shards):
            alive = ~dlt[i, : counts[i]]
            vecs.append(vec[i, : counts[i]][alive])
            labels.append(self._labels[i, : counts[i]][alive])
        fresh = ShardedHnswIndex(
            self.config, mesh=self.mesh,
            max_insert_batch=self.max_insert_batch,
            search_expand_width=self.search_expand_width,
            build_expand_width=self.build_expand_width,
            build_candidates=self.build_candidates,
            storage_dtype=self.storage_dtype,
            quantized_traversal=self.quantized_traversal,
            packed_traversal=self.packed_traversal,
            packed_dtype=self.packed_dtype,
            pq_groups=self.pq_groups,
            pq_opq=self.pq_opq,
            dcn_slices=self.dcn_slices)
        if sum(len(v) for v in vecs):
            fresh.build(np.concatenate(vecs), np.concatenate(labels))
        return fresh

    @_read_locked
    def check_integrity(self, raise_on_error: bool = True) -> Dict[str, int]:
        """Per-shard graph invariant validation (see api.HnswIndex)."""
        counts = self.shard_counts
        links = self._to_host(self._arrays[1])
        cnts = self._to_host(self._arrays[2])
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

    def _shard_file(self, path: str, i: int) -> str:
        return path[:-4] + f".shard{i}.npz"

    @_read_locked
    def save(self, path: str, per_shard: bool = False,
             truncate_wal: bool = True) -> None:
        """Serialize all shards (same format discipline as HnswIndex.save:
        arrays + config; everything else re-derived on load; atomic
        tmp+rename writes; WAL (epoch, offset) recorded and the replayed
        prefix truncated — see api.HnswIndex.save).

        ``per_shard=True`` splits the payload into one file per shard
        (``<path>.shard<i>.npz``) plus a small manifest at ``path`` — the
        per-host snapshot split for Deep100M-class indexes: each shard's
        arrays move device->host and hit disk independently, so peak host
        memory is one shard (not the whole index) and shard files can land
        on different filesystems/hosts."""
        import json
        import os

        from ..api import _atomic_savez, _npz_path

        path = _npz_path(path)
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        hi = int(self._counts.max()) if self.n_nodes else 0
        do_truncate = truncate_wal and self._wal is not None
        manifest = dict(
            format_version=np.int64(1),
            config=np.frombuffer(
                json.dumps(self.config.to_dict()).encode(), dtype=np.uint8),
            storage_dtype=np.frombuffer(
                self.storage_dtype.encode(), dtype=np.uint8),
            n_shards=np.int64(self.n_shards),
            shard_counts=self._counts.astype(np.int64),
            wal_offset=np.int64(self._wal.tell() if self._wal is not None
                                else -1),
            wal_epoch=np.int64(self._wal.epoch if self._wal is not None
                               else -1),
        )
        if do_truncate:
            nxt = self._wal.epoch + 1
            manifest["wal_epoch_next"] = np.int64(nxt)
            manifest["wal_offset_next"] = np.int64(
                self._wal.header_len(nxt))
        if self._pq_codebook is not None:
            # persist the trained global PQ dictionary (~256*D floats) so
            # load() serves pq-packed/sweep_pq without retraining; per-shard
            # codes/records re-derive from it (see api.HnswIndex.save)
            manifest["pq_codebook"] = np.asarray(self._pq_codebook,
                                                 np.float32)
            manifest["pq_groups_trained"] = np.int64(self.pq_groups)
            if self._pq_rot is not None:
                manifest["pq_rot"] = np.asarray(self._pq_rot, np.float32)
        # multi-process discipline: the _to_host fetches below are
        # collectives every process must execute, but each FILE has one
        # writer — per-shard files go to the process whose devices own the
        # shard (so shard files land on that shard's host), the manifest /
        # monolithic payload to process 0
        mp = jax.process_count() > 1
        devs = list(self.mesh.devices.flat)
        if per_shard:
            for i in range(self.n_shards):
                n_i = int(self._counts[i])
                # one shard at a time device->host (bf16 upcasts to f32)
                shard_payload = dict(
                    shard=np.int64(i),
                    vectors=self._to_host(
                        self._arrays[0][i, :n_i]).astype(np.float32),
                    links=self._to_host(self._arrays[1][i, :n_i]),
                    link_counts=self._to_host(self._arrays[2][i, :n_i]),
                    deleted=self._to_host(self._arrays[3][i, :n_i]),
                    labels=self._labels[i, :n_i],
                    positions=self._positions[i, :n_i],
                )
                if mp and devs[i].process_index != jax.process_index():
                    continue
                compressed = shard_payload["vectors"].nbytes < (1 << 30)
                _atomic_savez(self._shard_file(path, i), shard_payload,
                              compressed)
            manifest["per_shard"] = np.int64(1)
            if not mp or jax.process_index() == 0:
                _atomic_savez(path, manifest, True)
        else:
            vec, lnk, cnt, dlt, nn = (self._to_host(a)
                                      for a in self._arrays)
            manifest.update(
                # bf16 upcasts losslessly to f32 for serialization
                vectors=vec[:, :hi].astype(np.float32),
                links=lnk[:, :hi],
                link_counts=cnt[:, :hi],
                deleted=dlt[:, :hi],
                labels=self._labels[:, :hi],
                positions=self._positions[:, :hi],
            )
            if not mp or jax.process_index() == 0:
                _atomic_savez(path, manifest,
                              manifest["vectors"].nbytes < (1 << 30))
        if do_truncate:
            self._wal.truncate(self._wal.epoch + 1)

    @classmethod
    def load(cls, path: str, mesh: Optional[Mesh] = None,
             config: Optional[HnswConfig] = None,
             wal: Optional[str] = None,
             dcn_slices: Optional[int] = None) -> "ShardedHnswIndex":
        """Restore a sharded index. The mesh must have the same number of
        devices as the saved index had shards (resharding is a rebuild).
        Frozen-field guard as in HnswIndex.load.  Handles both monolithic
        and per-shard-split snapshots; ``wal`` replays the delta-log tail
        appended after the snapshot (see api.HnswIndex.load).
        ``dcn_slices`` is a serving-mesh topology hint, not index state —
        pass it when loading onto a multi-slice mesh (see __init__)."""
        import json

        from ..api import _npz_path

        path = _npz_path(path)
        with np.load(path) as z:
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
            storage_dtype = (bytes(z["storage_dtype"]).decode()
                             if "storage_dtype" in z else "float32")
            wal_offset = int(z["wal_offset"]) if "wal_offset" in z else -1
            wal_epoch = int(z["wal_epoch"]) if "wal_epoch" in z else None
            wal_next = (int(z["wal_epoch_next"]),
                        int(z["wal_offset_next"])) \
                if "wal_epoch_next" in z else None
            split = bool(int(z["per_shard"])) if "per_shard" in z else False
            pq_codebook = z["pq_codebook"] if "pq_codebook" in z else None
            pq_groups_trained = (int(z["pq_groups_trained"])
                                 if "pq_groups_trained" in z else None)
            pq_rot = z["pq_rot"] if "pq_rot" in z else None
            if split:
                vec = lnk = cnt = dlt = lab = pos = None
            else:
                vec, lnk, cnt = z["vectors"], z["links"], z["link_counts"]
                dlt, lab = z["deleted"], z["labels"]
                pos = z["positions"] if "positions" in z else None

        if split:
            # assemble padded per-shard stacks one shard file at a time
            hi = int(counts.max()) if counts.max() else 0
            vec = np.zeros((s, hi, cfg.dims), np.float32)
            lnk = np.full((s, hi, cfg.max_m), -1, np.int32)
            cnt = np.zeros((s, hi), np.int32)
            dlt = np.zeros((s, hi), bool)
            lab = np.zeros((s, hi), np.uint64)
            pos = np.full((s, hi), -1, np.int64)
            for i in range(s):
                with np.load(path[:-4] + f".shard{i}.npz") as zi:
                    n_i = int(counts[i])
                    vec[i, :n_i] = zi["vectors"]
                    lnk[i, :n_i] = zi["links"]
                    cnt[i, :n_i] = zi["link_counts"]
                    dlt[i, :n_i] = zi["deleted"]
                    lab[i, :n_i] = zi["labels"]
                    pos[i, :n_i] = zi["positions"]

        idx = cls(cfg, mesh=mesh,
                  initial_capacity=max(int(counts.max()), 32),
                  storage_dtype=storage_dtype, dcn_slices=dcn_slices)
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
        idx._arrays = tuple(idx._to_mesh(a) for a in (
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
        if pq_codebook is not None:
            idx._pq_codebook = jnp.asarray(pq_codebook)
            idx.pq_groups = pq_groups_trained
            if pq_rot is not None:
                idx._pq_rot = jnp.asarray(pq_rot)
                idx.pq_opq = True
        if wal is not None:
            idx._replay_wal(wal, wal_offset, wal_epoch, wal_next)
        return idx

    def _replay_wal(self, wal_path: str, from_offset: int,
                    snap_epoch=None, snap_next=None) -> None:
        """Apply WAL records past the snapshot position (epoch-aware, see
        api.HnswIndex._wal_replay_start), then keep journaling."""
        from ..api import HnswIndex
        from .. import wal as walmod

        start = HnswIndex._wal_replay_start(wal_path, from_offset,
                                            snap_epoch, snap_next)
        self._wal_replaying = True
        try:
            for op, labels, vectors in walmod.replay(
                    wal_path, self.config.dims, start):
                if op == walmod.OP_INSERT:
                    self.add(vectors, labels)
                elif op == walmod.OP_DELETE:
                    self.delete(labels)
        finally:
            self._wal_replaying = False
        self.enable_wal(wal_path)


class ShardedScan:
    """Pull-model scan cursor over one query on the sharded tier — the
    amgettuple state machine (embedding.c:100-107, 284-366) applied to the
    merged per-shard results (see api.HnswScan for the single-chip form).

    State: undelivered-row cache, the set of GLOBAL node ids already
    returned (the sorted-TID dedup array analog — node-id based, so two
    rows with equal labels are still returned once each), the current ef,
    and the no-more flag.  Tombstones are re-read per fetch (concurrent
    deletes are seen); the where-filter is snapshotted at open, and rows
    inserted after open stay excluded (snapshot semantics, as the
    single-chip cursor).  Termination follows the per-shard raw-beam rule:
    widening stops once NO shard can fill its beam (the pmax'd found
    count, mirroring the merged search's widening gate) or ef covers the
    whole index."""

    def __init__(self, index: ShardedHnswIndex, query: np.ndarray, ef: int,
                 where=None) -> None:
        self._idx = index
        self._q = np.asarray(query, np.float32)
        self._ef = ef
        self._excluded = index._filter_mask(where)
        self._buf_d: list = []
        self._buf_l: list = []
        self._seen: set = set()
        self._no_more = False
        self._first = True

    def _excluded_now(self):
        """Snapshot filter padded to the CURRENT per-shard capacity (the
        mesh may have grown mid-scan; post-open rows stay excluded)."""
        exc = self._excluded
        cap = self._idx.capacity_per_shard
        if exc.shape[1] != cap:
            exc = np.pad(exc, ((0, 0), (0, cap - exc.shape[1])),
                         constant_values=True)
            self._excluded = exc
        return self._idx._to_mesh(exc)

    @property
    def exhausted(self) -> bool:
        return self._no_more and not self._buf_d

    def _fetch(self) -> None:
        with self._idx._rwlock.read():
            self._fetch_locked()

    def _fetch_locked(self) -> None:
        idx = self._idx
        if not self._first:
            if self._ef >= min(max(idx.n_nodes, 1), idx.max_widen_ef):
                self._no_more = True
                return
            self._ef = idx._bucket_ef(self._ef * 2)
            idx.counters["n_widenings"] += 1
        variant = idx._traversal_variant()
        if variant in ("packed", "pq", "cast"):
            aux = idx._ensure_packed()
        elif variant == "quant":
            aux = idx._ensure_quant()
        else:
            aux = ()
        # merge keeps ALL gathered candidates (k_total = S*ef): the
        # exhaustion rule below ("no shard filled its raw beam") is only
        # sound if the merge never drops rows the shards produced
        step = idx._search_step(self._ef, self._ef * idx.n_shards,
                                variant=variant)
        d, g, found = step(idx._arrays, jnp.asarray(self._q),
                           self._excluded_now(), *aux)
        d = np.asarray(d)[0]
        g = np.asarray(g)[0]
        idx.counters["n_searches"] += 1
        cap = idx.capacity_per_shard
        alive = (g >= 0) & np.isfinite(d)
        for pos in range(len(g)):
            gid = int(g[pos])
            if gid < 0 or not alive[pos] or gid in self._seen:
                continue
            self._seen.add(gid)
            self._buf_d.append(float(d[pos]))
            self._buf_l.append(idx._labels[gid // cap, gid % cap])
        # exhausted once no shard filled its raw beam (found is the pmax
        # over shards of pre-filter per-shard result counts) — one small
        # shard never stops the others from widening
        if int(np.asarray(found)[0]) < self._ef:
            self._no_more = True
        self._first = False

    def next(self, n: int = 1) -> Tuple[np.ndarray, np.ndarray]:
        """Return up to ``n`` further (dists f32[m], labels u64[m]) rows,
        m <= n; m < n means the scan is exhausted.  Each row is returned
        exactly once across the scan's lifetime."""
        if n < 1:
            raise ValueError("next() needs n >= 1")
        while len(self._buf_d) < n and not self._no_more:
            self._fetch()
        m = min(n, len(self._buf_d))
        out_d = np.asarray(self._buf_d[:m], np.float32)
        out_l = np.asarray(self._buf_l[:m], np.uint64)
        del self._buf_d[:m], self._buf_l[:m]
        return out_d, out_l
