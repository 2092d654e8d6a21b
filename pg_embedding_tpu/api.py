"""HnswIndex — the user-facing API, replacing the SQL surface + index AM.

Maps the reference's lifecycle onto a Python/JAX object (reference entry
points in parentheses):

  HnswIndex(config)            CREATE INDEX ... USING hnsw WITH (...)
  .build(vectors, labels)      ambuild / hnsw_build        (embedding.c:503)
  .add(vectors, labels)        aminsert / hnsw_insert      (embedding.c:556)
  .search(queries, k)          amgettuple + progressive ef-doubling
                                                           (embedding.c:284-366)
  .delete(labels)              ambulkdelete tombstones     (embedding.c:883-944)
  .vacuum()                    amvacuumcleanup stats       (embedding.c:867-878)
  .exact_search(queries, k)    seq-scan ORDER BY oracle    (embedding.c:1022-1038)
  .save(path) / .load(path)    page durability + metadata guard
                                                           (embedding.c:594-602)

Labels are opaque uint64 user ids (the heap-TID analog, embedding.c:50-56)
kept on the host; device search returns internal node ids which are mapped to
labels at the very end, exactly where searchKnn does (hnswalg.cpp:243-246).
Tombstoned nodes remain graph waypoints but are filtered from results
(hnswalg.cpp:245); space is never reclaimed (matching VACUUM semantics).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import HnswConfig, Metric
from .core.build import (build_schedule, insert_batch_masked_donating,
                         insert_slab_donating)
from .core.graph import (GraphState, empty_graph, grow_graph,
                         pin_serving_layout, records_3d)
from .core.search import (search_graph, search_graph_packed,
                          search_graph_quantized)
from .ops.bruteforce import exact_search as _bruteforce
from .ops.pallas_bruteforce import pallas_exact_search as _pallas_bruteforce
from .utils.locking import RWLock


def _write_locked(fn):
    """Mutator: exclusive section (MURSIW single-writer discipline,
    embedding.c:624-631 — and stricter: the insert path donates device
    buffers, so an overlapping read could gather from a re-used buffer)."""
    @functools.wraps(fn)
    def wrapper(self, *a, **k):
        with self._rwlock.write():
            return fn(self, *a, **k)
    return wrapper


def _read_locked(fn):
    """Reader: shared section; any number may overlap, none with a writer.
    Reentrant under this thread's own write (auto-checkpoint calls save()
    from inside add())."""
    @functools.wraps(fn)
    def wrapper(self, *a, **k):
        with self._rwlock.read():
            return fn(self, *a, **k)
    return wrapper

_SAVE_FORMAT_VERSION = 1


class TuneResult(NamedTuple):
    """tune_ef_search / tune_sweep_pool outcome: the chosen knob value
    (ef or pool), the recall it achieved on the tuning queries, and whether
    the target was met.  Earlier rounds returned a bare int that was
    indistinguishable between 'met at ef' and 'gave up at max_ef' (VERDICT
    r2 weak #7); the achieved recall makes failure visible, and
    ``strict=True`` turns it into an error."""

    ef: int
    recall: float
    met: bool


class TuneTargetMissed(RuntimeError):
    """Raised by tune_ef_search(strict=True) when even max_ef missed the
    recall target."""


def _npz_path(path: str) -> str:
    """np.savez_compressed appends '.npz' to suffix-less paths; normalize so
    save(p) / load(p) are symmetric for any p."""
    return path if path.endswith(".npz") else path + ".npz"


def _atomic_savez(path: str, payload: dict, compressed: bool) -> None:
    """Write an .npz durably and atomically: tmp file + flush + fsync +
    rename + directory fsync.  A crash mid-save leaves the previous
    snapshot intact (the reference gets this from Postgres page WAL; a
    bare np.savez would torn-write the only copy)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        (np.savez_compressed if compressed else np.savez)(f, **payload)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    dirfd = os.open(os.path.dirname(os.path.abspath(path)) or ".",
                    os.O_RDONLY)
    try:
        os.fsync(dirfd)
    finally:
        os.close(dirfd)


# Persistent measured-chunk cache for the exact8 build sweep (same
# discipline as ops/pallas_bruteforce's serve-side tile cache): a one-time
# tune_exact8_chunk probe upgrades every later build with these dims.
_EXACT8_CHUNK_CACHE: Optional[dict] = None


def _exact8_chunk_cache_path() -> str:
    root = os.environ.get("PG_EMB_TUNE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "pg_embedding_tpu")
    return os.path.join(root, "exact8_chunk.json")


# Factory calibration shipped with the package (same precedence as the
# serve-side tile cache: user cache > factory file > built-in default) —
# a machine reset must not silently drop to the untuned 1M default.
_FACTORY_CHUNK_PATH: Optional[str] = None  # default resolved lazily


def _exact8_chunk_cache() -> dict:
    global _EXACT8_CHUNK_CACHE
    if _EXACT8_CHUNK_CACHE is None:
        from .ops.pallas_bruteforce import _load_json

        _EXACT8_CHUNK_CACHE = _load_json(_exact8_chunk_cache_path())
        factory = _FACTORY_CHUNK_PATH or os.path.join(
            os.path.dirname(__file__), "exact8_chunk_factory.json")
        for key, val in _load_json(factory).items():
            _EXACT8_CHUNK_CACHE.setdefault(key, val)
    return _EXACT8_CHUNK_CACHE


def _exact8_chunk_key(dims: int, capacity: int) -> str:
    """Cache key includes a power-of-two CAPACITY bucket: the winning
    chunk is scale-dependent (per-chunk fixed overhead argues for wide
    chunks at 10M; at 500k one corpus-covering chunk wins), so a tune at
    one scale must not leak to builds at a very different one — misses
    fall back to the 1M default measured at 8M."""
    cb = 1 << max(int(capacity) - 1, 1).bit_length()
    return f"{jax.default_backend()}:{dims}:{cb}"


def _save_exact8_chunk_cache(cache: dict) -> None:
    p = _exact8_chunk_cache_path()
    os.makedirs(os.path.dirname(p), exist_ok=True)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cache, f, indent=1)
    os.replace(tmp, p)


class HnswIndex:
    """Flat-NSW approximate nearest neighbor index on TPU.

    Thread-safety contract — MURSIW, the reference's model made explicit
    (embedding.c:624-631): any number of concurrent reader threads
    (search/exact_search/pq_sweep_search/save/scan fetches), at most one
    writer (build/add/delete/delete_where) at a time, and reads never
    overlap writes.  The last rule is stricter than the reference's page
    locks because the insert path DONATES device buffers in place — an
    overlapping read could gather from memory XLA has re-used.  All public
    methods take the appropriate side of an internal reader-writer lock
    (utils/locking.py); callers need no external synchronization."""

    def __init__(self, config: HnswConfig, *,
                 initial_capacity: int = 1024,
                 max_insert_batch: int = 256,
                 search_expand_width: int = 4,
                 build_expand_width: int = 8,
                 build_candidates: str = "auto",
                 storage_dtype: str = "float32",
                 quantized_traversal: bool = False,
                 packed_traversal: bool = False,
                 packed_dtype: str = "int8",
                 pq_groups: int = 16,
                 pq_opq: bool = False) -> None:
        self.config = config
        self.max_insert_batch = int(max_insert_batch)
        # "float32" (exact, reference precision) or "bfloat16" (halves the
        # HBM stream and doubles MXU throughput for distance dots; distances
        # accumulate in f32). A serving/memory knob, persisted on save.
        if storage_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unknown storage_dtype: {storage_dtype!r}")
        self.storage_dtype = storage_dtype
        # candidates expanded per beam-search step (T): recall(T) ~= recall(1)
        # with ~T-fold fewer loop iterations (core/search.py docstring);
        # a serving knob, not part of the index format
        self.search_expand_width = int(search_expand_width)
        # beam expansion width for CONSTRUCTION searches.  Wider beams
        # both raise build throughput (fewer while_loop steps; measured
        # 27->21 ms/batch at B=256) and improve graph quality (the search
        # explores a superset of candidates: build recall 0.9953 -> 0.9992
        # at 100k) — a knob the serial reference cannot express.
        self.build_expand_width = int(build_expand_width)
        # construction candidate generation:
        #   "beam"   — batched searchBaseLayer, strict reference parity
        #              (hnswalg.cpp:229; link-level parity pinned in tests)
        #   "exact"  — full MXU corpus sweep per batch (core/build.py
        #              _exact_candidates): true top-efc candidate sets, much
        #              faster below ~1M rows, strictly better graph quality;
        #              waives link-level parity with the reference
        #   "exact8" — the sweep over an incrementally-maintained int8
        #              shadow (4x fewer HBM bytes, one bf16 MXU pass) with
        #              an exact f32 rerank of a 2x-widened pool — keeps
        #              full-corpus candidates affordable far beyond the
        #              f32 sweep's crossover (the r2 >600k quality fix)
        #   "auto"   — exact below exact_build_threshold, exact8 from
        #              there to exact8_build_threshold, beam beyond.
        #              Measured (bench_exact8_below, 500k x 128d v5e):
        #              exact8 builds 2.5x faster than the f32 sweep at
        #              IDENTICAL recall (0.999 both; quality also pinned
        #              recall-identical at 60k x 64d), so the default
        #              exact band is empty — exact8 from row 0.
        if build_candidates not in ("auto", "beam", "exact", "exact8"):
            raise ValueError(
                f"unknown build_candidates: {build_candidates!r}")
        self.build_candidates = build_candidates
        self.exact_build_threshold = 0
        # upper bound for the exact8 coarse sweep under "auto"; None =
        # unlimited (the sweep stays the quality/throughput winner at 10M
        # — see BASELINE.md round-3 10M table)
        self.exact8_build_threshold: Optional[int] = None
        # exact8 coarse-sweep chunk rows (static in the slab programs;
        # fewer+larger chunks amortize the ~5ms per-chunk top-k/merge
        # fixed cost, but the ephemeral [B, chunk] f32 score tile grows
        # with it).  None = consult the persistent measured cache
        # (tune_exact8_chunk), falling back to the 1M default measured
        # at 8M x 128d on v5e.
        self.exact8_chunk: Optional[int] = None
        # int8 shadow validity watermark: number of leading rows the
        # (qvec, qscale) arrays currently describe; kept == _count by the
        # exact8 slab threading, else the shadow is dropped after add()
        self._qvec_rows = 0
        # candidate-pool width for construction (None => ef_construction
        # for beam, 2*ef_construction for exact).  Exact mode needs the
        # wider pool: a tight top-efc sweep lacks the diverse mid-range
        # candidates a beam walk's PATH provides, and the pruning
        # heuristic needs them for long links (measured: pool=efc loses
        # 1.5pt recall vs beam; pool=2*efc restores parity).
        self.build_cand_cap: Optional[int] = None
        # bulk-insert slab grains, in units of max_insert_batch batches:
        # (big, small).  A slab = one host->device upload + one dispatch
        # running that many sequential masked batch-inserts on device.
        self.slab_batches = (128, 16)
        # auto-routing crossover for search(mode="auto"): corpora up to this
        # size are served by the exact MXU sweep (recall 1.0) when the query
        # batch is large enough; see _use_exact.
        # Measured directly (128-d L2, batch 1024, v5e): exact/graph QPS =
        # 14.2k/5.9k at 2M, 7.5k/5.1k at 4M, 2.3k/4.6k at 10M — the c/N fit
        # crosses the graph plateau at ~5.7M (benchmarks/bench_router_band
        # + bench_10m). 5.5M keeps auto on the winning engine with margin.
        self.exact_threshold = 5_500_000
        # packed traversal serves ~2x the plain graph QPS (9.4k vs 5.4k at
        # 1M, BASELINE.md), which pulls the exact/graph crossover in: the
        # same c/N exact fit (2.07e10/N) meets the packed plateau at ~2.2M.
        # _use_exact picks this threshold when packed_traversal is on.
        self.exact_threshold_packed = 2_700_000
        # filtered-search routing: below this allowed-fraction, auto mode
        # serves `where=` via the masked exact sweep instead of widening
        # the graph walk.  MEASURED at 12.5M x 96d (graph-served scale,
        # benchmarks/bench_filtered125.py, BASELINE r5): the sweep's
        # cost is selectivity-independent and beats the filtered graph
        # at EVERY measured fraction <= 75%, on QPS and always on recall
        # (75%: 1,678 @ 1.0 vs 1,557 @ 0.9593); the graph only overtakes
        # approaching the unfiltered case.  0.75 routes every measured
        # filtered fraction to the sweep; unfiltered stays on the graph.
        self.filter_exact_selectivity = 0.75
        # widening-loop ceiling: the reference widens toward the index
        # size (embedding.c:338-343), which on host hardware just reads
        # more pages — here every doubled ef is a NEW compiled program
        # whose beam state scales batch*ef, and a forced graph-mode
        # search under an ultra-selective filter at 1M doubled ef until
        # the TPU worker crashed outright (measured r5,
        # benchmarks/bench_filtered.py at 1% selectivity). Graphs
        # smaller than the cap keep exact exhaustion semantics; beyond
        # it a starved query returns a partial valid mask — auto mode
        # never gets there (selective filters route to the masked exact
        # sweep, whose cost is selectivity-independent).
        self.max_widen_ef = 4096
        # int8 traversal with exact rerank: quarters the graph walk's HBM
        # gather bytes (its measured bottleneck); the int8 shadow copy is
        # (re)built lazily after inserts. Serving knob, off by default.
        self.quantized_traversal = bool(quantized_traversal)
        # write-ahead delta log (the GenericXLog analog, embedding.c:651-686)
        # — see enable_wal(); None until enabled
        self._wal = None
        self._wal_replaying = False
        self._wal_auto_bytes = None       # enable_wal(auto_checkpoint_bytes=)
        self._wal_snapshot_path = None
        # MURSIW contract (see class docstring / utils.locking): writers
        # exclusive, readers shared — donation makes overlap unsafe
        self._rwlock = RWLock()
        # packed traversal: co-locate every node's NEIGHBORS' int8 codes in
        # one contiguous record (int8[cap, maxM, D]), so a beam step gathers
        # T records instead of T*maxM random rows — the page-locality analog
        # (embedding.c:226-231) and the graph walk's transaction-bound fix
        # (BASELINE.md profiling note). Exact rerank keeps returned
        # distances full-precision. Costs maxM x D bytes/node of HBM;
        # records are (re)built lazily after inserts. Serving knob.
        self.packed_traversal = bool(packed_traversal)
        # record element type for packed traversal:
        #   "int8"     — 1 byte/elem + per-row scales + exact rerank (the
        #                default; maxM*D bytes/node, fits ~2M@128d/chip)
        #   "bfloat16" — 2 bytes/elem, no scales, exact rerank
        #   "float32"  — 4 bytes/elem, NO rerank needed: the walk computes
        #                the exact reference distances, so results are
        #                BIT-IDENTICAL to the plain f32 mode while still
        #                collapsing T*maxM random row gathers to T record
        #                gathers — the strict-parity serving mode for
        #                corpora where maxM*D*4 bytes/node fits (~500k@128d)
        #   "pq"       — product-quantized codes (ops/pq.py): D/pq_groups
        #                bytes/elem — the ONLY record type that fits past
        #                ~2M@128d/chip (int8 records need maxM*D bytes/node:
        #                41GB at 10M; pq at G=16 needs 5.1GB). Codebook
        #                trained once per index on a corpus sample; decode
        #                is a register-level codebook gather feeding the
        #                same dense distance (TPU-native ADC), then the
        #                exact rerank — a serving knob like the others.
        if packed_dtype not in ("int8", "bfloat16", "float32", "pq"):
            raise ValueError(f"unknown packed_dtype: {packed_dtype!r}")
        self.packed_dtype = packed_dtype
        if packed_dtype == "pq" and config.dims % int(pq_groups):
            raise ValueError(
                f"dims {config.dims} not divisible by pq_groups {pq_groups}")
        self.pq_groups = int(pq_groups)
        # OPQ (ops/pq.train_opq): learn an orthogonal rotation before PQ —
        # better codebooks for correlated dims at the cost of one q @ R per
        # query batch.  L2/cosine only: Manhattan is not rotation-invariant
        if pq_opq and config.metric == Metric.MANHATTAN:
            raise ValueError(
                "pq_opq requires a rotation-invariant metric (l2/cosine); "
                "manhattan distances change under rotation")
        self.pq_opq = bool(pq_opq)
        self._pq_codebook = None        # f32[G, 256, D/G], trained lazily
        self._pq_rot = None             # f32[D, D] when pq_opq
        self.pq_train_sample = 131_072  # rows sampled for codebook training
        self.pq_train_iters = 12
        self._qvec = None
        self._qscale = None
        self._pcodes = None
        self._pscales = None
        self._pq_codes = None           # u8[cap, G] per-ROW codes (sweep_pq)
        # sweep_pq coarse-pool width: None = per-call heuristic (4k,
        # capped 256); tune_sweep_pool sets it from a measured target
        self.pq_sweep_pool: Optional[int] = None
        # visited-set structure (core/search.py): "dense" (default) needs
        # NO visited memory — dedupe is all-lanes compares against the
        # queues plus the monotone admit gate; results are identical to the
        # exact bitmap (see _search_one docstring) while removing both the
        # cap/8-bytes-per-query bitmap (the SURVEY §7 100M-scale hard part)
        # and the dominant per-step scattered word reads+writes.  "bitmap"
        # keeps the reference-layout bitmap as a cross-check oracle; "hash"
        # the fixed-size open-hash table (32KB/query).  "auto" IS dense at
        # every scale: dense dedupe was measured at or above both
        # alternatives from 100k through 10M (no crossover exists — the
        # others pay scattered HBM transactions per step, dense pays none),
        # so there is no size threshold to route on.
        self.visited_mode = "dense"     # "dense"|"auto"|"bitmap"|"hash"
        self._graph = empty_graph(initial_capacity, config.dims,
                                  config.max_m,
                                  dtype=jnp.dtype(self.storage_dtype))
        self._labels = np.zeros(self._graph.capacity, dtype=np.uint64)
        # host-side mirror of graph.n_nodes: reading the device scalar would
        # force a device sync (and drain the async dispatch pipeline), so the
        # API tracks the count itself — the device scalar is for kernels.
        self._count = 0
        # observability counters (the reference has none beyond n_inserted,
        # embedding.c:69; SURVEY.md §5 asks us to close that gap)
        self.counters: Dict[str, int] = {
            "n_inserted": 0, "n_deleted": 0, "n_searches": 0,
            "n_hops": 0, "n_dist_evals": 0, "n_widenings": 0,
        }

    # ------------------------------------------------------------------ #
    # introspection
    # ------------------------------------------------------------------ #

    @property
    def n_nodes(self) -> int:
        return self._count

    @property
    def graph(self) -> GraphState:
        return self._graph

    @property
    def labels(self) -> np.ndarray:
        return self._labels[: self.n_nodes]

    def __len__(self) -> int:
        return self.n_nodes

    # ------------------------------------------------------------------ #
    # insert paths
    # ------------------------------------------------------------------ #

    def _check_dims(self, vectors: np.ndarray) -> np.ndarray:
        vectors = np.asarray(vectors, dtype=np.float32)
        if vectors.ndim == 1:
            vectors = vectors[None, :]
        if vectors.shape[1] != self.config.dims:
            # analog of "Wrong number of dimensions" (embedding.c:179,581)
            raise ValueError(
                f"wrong number of dimensions: {vectors.shape[1]} instead of "
                f"{self.config.dims} expected")
        return vectors

    def _candidate_mode(self, count_at_start: int):
        """Resolve (candidates, cand_cap) for a slab/batch starting at the
        given node count (static per compiled program; "auto" switches
        engines at exact_build_threshold / exact8_build_threshold)."""
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

    def _ensure_capacity(self, n_new: int) -> None:
        # one extra batch of slack: a masked tail batch stages a full
        # batch-width vector slice, which must stay inside the array
        # (dynamic_update_slice clamps out-of-bounds starts)
        need = self.n_nodes + n_new + self.max_insert_batch
        cap = self._graph.capacity
        if need > cap:
            new_cap = max(need, cap * 2)
            self._graph = grow_graph(self._graph, new_cap)
            grown = np.zeros(self._graph.capacity, dtype=np.uint64)
            grown[: len(self._labels)] = self._labels
            self._labels = grown
            # the int8 shadow is capacity-shaped; the next exact8 slab (or
            # quantized search) rebuilds it at the new capacity
            self._qvec = None
            self._qvec_rows = 0

    @_write_locked
    def add(self, vectors, labels=None) -> np.ndarray:
        """Incremental insert (aminsert analog). Returns assigned node ids.

        NULL-vector rows are the caller's problem here (the reference skips
        SQL NULLs before reaching the insert path, embedding.c:171-173).
        """
        vectors = self._check_dims(vectors)
        n = vectors.shape[0]
        if labels is None:
            labels = np.arange(self.n_nodes, self.n_nodes + n,
                               dtype=np.uint64)
        else:
            labels = np.asarray(labels, dtype=np.uint64).reshape(-1)
            if labels.shape[0] != n:
                raise ValueError("labels/vectors length mismatch")
        self._ensure_capacity(n)
        if self._wal is not None and not self._wal_replaying:
            # write-ahead: the record is durable before the device mutation
            # (per-insert GenericXLog discipline, embedding.c:651-686)
            self._wal.log_insert(vectors, labels)

        base = self.n_nodes
        cfg = self.config
        b = self.max_insert_batch
        if n > 4 * b:
            # bulk path: one host->device upload + ONE dispatch per
            # multi-batch slab (the batch loop runs inside the compiled
            # program).  Per-batch host dispatch costs ~150ms of tunnel
            # latency vs ~15-30ms of device compute; slabs remove it
            # entirely.  Two slab grains (big for the bulk, small for the
            # tail) bound masked no-op waste at small_batches-1 batches
            # while keeping the compiled-program count at two.
            big, small = self.slab_batches
            schedule = []                      # (offset, rows, n_batches)
            off = 0
            while n - off >= big * b:
                schedule.append((off, big * b, big))
                off += big * b
            while off < n:
                rows = min(small * b, n - off)
                schedule.append((off, rows, small))
                off += rows

            def _upload(s, rows, nb):
                buf = np.zeros((nb * b, cfg.dims), np.float32)
                buf[:rows] = vectors[s: s + rows]
                return jnp.asarray(buf)

            nxt = _upload(*schedule[0])
            for si, (s, rows, nb) in enumerate(schedule):
                dev = nxt
                if si + 1 < len(schedule):
                    nxt = _upload(*schedule[si + 1])  # overlap with insert
                slab_mode, slab_cap = self._candidate_mode(base + s)
                if slab_mode == "exact8":
                    self._run_exact8_slab(dev, rows, b, nb, slab_cap,
                                          base + s)
                else:
                    self._graph = insert_slab_donating(
                        self._graph, dev, jnp.int32(rows), batch=b,
                        n_batches=nb, ef_construction=cfg.ef_construction,
                        m=cfg.m, max_m=cfg.max_m,
                        metric_value=cfg.metric.value, cand_cap=slab_cap,
                        expand_width=self.build_expand_width,
                        candidates=slab_mode)
        else:
            cand_mode, cand_cap = self._candidate_mode(base)
            for off, cnt in build_schedule(n, b):
                # fixed batch shape + traced n_insert => one compile per
                # capacity
                chunk = np.zeros((b, cfg.dims), np.float32)
                chunk[:cnt] = vectors[off: off + cnt]
                if cand_mode == "exact8":
                    # the 1-batch slab program (shares the exact8 shadow
                    # threading; one extra compiled shape per capacity)
                    self._run_exact8_slab(jnp.asarray(chunk), cnt, b, 1,
                                          cand_cap, base + off)
                    continue
                # donating variant: the old graph is dead after rebinding,
                # and in-place aliasing avoids a capacity-sized copy/batch
                self._graph = insert_batch_masked_donating(
                    self._graph, jnp.asarray(chunk), jnp.int32(cnt),
                    ef_construction=cfg.ef_construction,
                    m=cfg.m, max_m=cfg.max_m, metric_value=cfg.metric.value,
                    cand_cap=cand_cap,
                    expand_width=self.build_expand_width,
                    candidates=cand_mode)
        self._count = base + n
        self._labels[base: base + n] = labels
        self.counters["n_inserted"] += n
        # quantized/packed shadows are stale after inserts — EXCEPT the
        # int8 row shadow when the exact8 threading maintained it through
        # every inserted row (rows are append-only, so incremental staging
        # equals a full re-quantization)
        if self._qvec_rows != base + n:
            self._qvec = None
            self._qvec_rows = 0
        self._pcodes = None
        self._pscales = None
        self._pq_codes = None
        self._maybe_auto_checkpoint()
        return np.arange(base, base + n, dtype=np.int64)

    def _run_exact8_slab(self, dev_slab, rows: int, batch: int,
                         n_batches: int, cand_cap, base_at_start: int
                         ) -> None:
        """Dispatch one exact8 slab: sync the int8 shadow to the current
        rows if needed (one full quantize pass — only at the first exact8
        slab or after capacity growth), then run the threaded slab program
        (core/build.insert_slab_q_donating)."""
        cfg = self.config
        if self._qvec is None or self._qvec_rows != base_at_start:
            self._qvec, self._qscale = self._quantize(self._graph.vectors,
                                                      self._graph.n_nodes)
            self._qvec_rows = base_at_start
        from .core.build import insert_slab_q_donating

        self._graph, self._qvec, self._qscale = insert_slab_q_donating(
            self._graph, self._qvec, self._qscale, dev_slab,
            jnp.int32(rows), batch=batch, n_batches=n_batches,
            ef_construction=cfg.ef_construction, m=cfg.m, max_m=cfg.max_m,
            metric_value=cfg.metric.value, cand_cap=cand_cap,
            expand_width=self.build_expand_width,
            exact8_chunk=self._resolve_exact8_chunk())
        self._qvec_rows = base_at_start + int(rows)

    def _resolve_exact8_chunk(self) -> int:
        """exact8 sweep chunk rows: explicit setting > persistent measured
        cache (tune_exact8_chunk) > 1M default."""
        if self.exact8_chunk is not None:
            return int(self.exact8_chunk)
        hit = _exact8_chunk_cache().get(
            _exact8_chunk_key(self.config.dims, self._graph.capacity))
        return int(hit[0]) if hit else 1_048_576

    def tune_exact8_chunk(self, chunks=(262_144, 524_288, 1_048_576,
                                        2_097_152),
                          reps: int = 3, save: bool = True,
                          verbose: bool = False) -> int:
        """Measure the exact8 coarse-sweep dispatch at candidate chunk
        widths against THIS index's live rows on the real device, set
        ``exact8_chunk`` to the winner, and persist it so later indexes
        with these dims at a similar capacity inherit it (ROADMAP r3 #1 —
        the 1M default was a single scan at 8M x 128d; per-(device, dims,
        capacity-bucket) tuning generalizes it).  Requires a TPU backend
        (off-TPU timings are meaningless) and a non-empty index; returns
        the chosen chunk."""
        import time

        if jax.default_backend() not in ("tpu", "axon"):
            raise RuntimeError("tune_exact8_chunk needs a real TPU backend")
        if self._count == 0:
            raise RuntimeError("tune_exact8_chunk needs a non-empty index")
        from .core.build import _exact_candidates

        qv, qs = self._ensure_quantized()
        cfg = self.config
        _, cand_cap = self._candidate_mode(self._count)
        if cand_cap is None:
            cand_cap = 2 * cfg.ef_construction
        b = self.max_insert_batch
        pts = self._graph.vectors[:b].astype(jnp.float32)
        base = jnp.int32(self._count)
        best = (None, 0.0)
        for c in chunks:
            fn = jax.jit(functools.partial(
                _exact_candidates, cand_cap=cand_cap,
                metric_value=cfg.metric.value, chunk=int(c)))
            try:
                d, _ = fn(self._graph.vectors, pts, base, qvec=qv, qscale=qs)
                np.asarray(d)                       # compile + warm
                t0 = time.time()
                for _ in range(reps):
                    d, _ = fn(self._graph.vectors, pts, base,
                              qvec=qv, qscale=qs)
                np.asarray(d)                       # one true sync
                dt = (time.time() - t0) / reps
            except Exception as e:                  # HBM overflow at 2M+
                if verbose:
                    print(f"  chunk {c}: failed ({type(e).__name__})")
                continue
            if verbose:
                print(f"  chunk {c}: {dt * 1e3:.1f} ms/batch")
            if best[0] is None or dt < best[1]:
                best = (int(c), dt)
        if best[0] is None:
            raise RuntimeError("no chunk candidate ran")
        self.exact8_chunk = best[0]
        cache = _exact8_chunk_cache()
        cache[_exact8_chunk_key(cfg.dims, self._graph.capacity)] = \
            [best[0], int(self._count)]
        if save:
            _save_exact8_chunk_cache(cache)
        return best[0]

    @_write_locked
    def build(self, vectors, labels=None) -> None:
        """Bulk build (ambuild analog): preallocates capacity for the whole
        corpus up front (the unlogged-build analog, embedding.c:503-551)."""
        vectors = self._check_dims(vectors)
        if self.n_nodes != 0:
            raise RuntimeError("build() requires an empty index; use add()")
        self._graph = empty_graph(
            max(vectors.shape[0] + self.max_insert_batch, 32),
            self.config.dims, self.config.max_m,
            dtype=jnp.dtype(self.storage_dtype))
        self._labels = np.zeros(self._graph.capacity, dtype=np.uint64)
        self._count = 0
        self._qvec = None
        self._qvec_rows = 0
        self._pq_codebook = None
        self._pq_rot = None
        self._pq_codes = None
        self.add(vectors, labels)

    # ------------------------------------------------------------------ #
    # search paths
    # ------------------------------------------------------------------ #

    def _bucket_ef(self, ef: int) -> int:
        """Pad ef to a power of two >= ef_search so progressive widening
        reuses a small set of compiled shapes (SURVEY.md §7 hard-parts:
        'padding ef to a small set of bucketed widths')."""
        base = self.config.ef_search
        e = max(ef, 1)
        b = base
        while b < e:
            b *= 2
        return b

    @_read_locked
    def search_ids(self, queries, ef: Optional[int] = None
                   ) -> Tuple[np.ndarray, np.ndarray]:
        """Raw searchBaseLayer results: (dists [B, ef], node ids [B, ef]),
        ascending, -1 padded, tombstones NOT filtered.

        ``ef`` is bucketed to the same power-of-two widths as search()
        before dispatch (a compile on this TPU costs minutes; callers
        sweeping raw ef values must not trigger one per value) and the
        result is sliced back to the requested width.  The top-ef prefix
        of a bucketed-wider run is at least as good as the narrow run's
        result set (a wider beam's gate is never tighter), so slicing
        only ever improves on the un-bucketed answer."""
        queries = self._check_dims(queries)
        ef = self.config.ef_search if ef is None else int(ef)
        ef_run = self._bucket_ef(max(ef, 1))
        d, i, stats = self._graph_search(jnp.asarray(queries), ef_run)
        d, i = d[:, :ef], i[:, :ef]
        self.counters["n_searches"] += queries.shape[0]
        self.counters["n_hops"] += int(np.sum(np.asarray(stats.hops)))
        self.counters["n_dist_evals"] += int(
            np.sum(np.asarray(stats.dist_evals)))
        return np.asarray(d), np.asarray(i)

    def _visited_slots(self, ef: int) -> int:
        """-1 = dense dedupe (no visited memory; the default), 0 = exact
        bitmap, else hash-table slot count (power of two, sized ~4x the
        expected unique visits ef * maxM)."""
        if self.visited_mode in ("dense", "auto"):
            return -1
        if self.visited_mode == "bitmap":
            return 0
        return 1 << max(13, (4 * ef * self.config.max_m - 1).bit_length())

    def _graph_search(self, qdev, ef):
        vs = self._visited_slots(ef)
        if self.packed_traversal:
            pc, ps = self._ensure_packed()
            if self.packed_dtype == "pq":
                from .core.search import search_graph_pq
                return search_graph_pq(
                    self._graph, qdev, pc, self._pq_codebook,
                    self._pq_rot, ef=ef,
                    metric_value=self.config.metric.value,
                    expand_width=self.search_expand_width,
                    visited_slots=vs)
            return search_graph_packed(
                self._graph, qdev, pc, ps, ef=ef,
                metric_value=self.config.metric.value,
                expand_width=self.search_expand_width, visited_slots=vs)
        if self.quantized_traversal:
            qv, qs = self._ensure_quantized()
            return search_graph_quantized(
                self._graph, qdev, qv, qs, ef=ef,
                metric_value=self.config.metric.value,
                expand_width=self.search_expand_width, visited_slots=vs)
        return search_graph(self._graph, qdev, ef=ef,
                            metric_value=self.config.metric.value,
                            expand_width=self.search_expand_width,
                            visited_slots=vs)

    @staticmethod
    @jax.jit
    def _quantize(vectors, n_nodes):
        rows = jax.lax.broadcasted_iota(jnp.int32, (vectors.shape[0], 1),
                                        0)[:, 0]
        live = (rows < n_nodes)[:, None]
        v = jnp.where(live, vectors.astype(jnp.float32), 0.0)
        # per-ROW symmetric scales: a single outlier row no longer collapses
        # quantization resolution for every vector
        scale = jnp.maximum(jnp.max(jnp.abs(v), axis=1), 1e-30) / 127.0
        q = jnp.clip(jnp.round(v / scale[:, None]), -127,
                     127).astype(jnp.int8)
        return q, scale

    def _ensure_serving_layout(self):
        """Lazily re-pin the corpus to the row-major serving layout
        (core/graph.pin_serving_layout) at the serve entries.

        Donating insert programs emit vectors in the backend-default
        D-major layout at unaligned D, so a mutation strips the pin;
        re-pinning here costs ONE relayout copy per mutation->serve
        transition instead of a whole-corpus relayout TEMP inside every
        serve program on every call (measured r5 at 1.5M x 96d: +27%
        graph walk / +15% sweep QPS, and -0.787 GB per-program temp —
        5.96 GB at 12.5M).  Runs under the read lock: the swap is
        value-identical and reference-atomic, so concurrent readers see
        either layout correctly; duplicate re-pins are benign."""
        g = self._graph
        pinned = pin_serving_layout(g.vectors)
        if pinned is not g.vectors:
            self._graph = g._replace(vectors=pinned)

    def _ensure_quantized(self):
        if self._qvec is None:
            self._qvec, self._qscale = self._quantize(
                self._graph.vectors, self._graph.n_nodes)
        return self._qvec, self._qscale

    @staticmethod
    @jax.jit
    def _pack_records(qvec, qscale, links):
        """int8 neighbor records + f32[cap, maxM] scales.  Layout is
        tile-conditional (core/graph.records_3d): 3-D [cap, maxM, D] when
        the minor tile is exactly (sublane, lane)-aligned — the gather
        then lands in the [rows, D] tiling the distance matmul wants
        (flat records cost a lanes<->sublanes relayout per beam hop:
        -19% QPS measured at 100k x 128d, the r4 packed regression) —
        else FLAT [cap, maxM*D]: 3-D at unaligned D pads every neighbor
        to 128 lanes (1.3x HBM at D=100) and the serving program prepends
        a full layout-conversion copy of the records (measured: +9.1 GB
        temp at 1.2M x 100d — the native-scale OOM).  core/search
        reshapes per-frontier tiles to [T*maxM, D] either way,
        value-identical."""
        safe = jnp.maximum(links, 0)                 # [cap, maxM]
        cap, max_m = links.shape
        recs = qvec[safe]                            # [cap, maxM, D]
        if not records_3d(1, max_m, qvec.shape[1]):
            recs = recs.reshape(cap, -1)
        return recs, qscale[safe]

    @staticmethod
    @functools.partial(jax.jit, static_argnames=("dtype", "chunk"))
    def _pack_records_cast(vectors, links, dtype, chunk: int = 131_072):
        """Packed neighbor records in bf16/f32 — no scales; f32 records
        make the packed walk result-identical to the plain mode: same ids,
        same order, same exact distance form over the same f32 rows.
        Distance scalars are bit-identical on CPU (pinned by the suite);
        on TPU the record-gather dot's reduction layout differs from the
        row-gather's, leaving scalars within 4 ulps (max rel 2.9e-7,
        measured r5 at 100k single-chip; same magnitude sharded at 400k)
        with ids/order identical (see core/search._search_one).

        Record layout is tile-conditional (core/graph.records_3d, same
        rationale as _pack_records): 3-D [cap, maxM, D] when exactly
        tile-aligned (avoids the per-hop relayout the flat layout costs
        — the r4 packed regression), else FLAT [cap, maxM*D] (3-D at
        unaligned D pads neighbors to 128 lanes AND the serving program
        prepends a whole-records layout copy — both measured to OOM a
        16 GB chip at 1.2M x 100d).  The gather also runs CHUNKED into a
        loop-carried buffer (fori_loop updates the carry in place), so
        pack-time peak = records + one chunk tile."""
        cast = vectors.astype(jnp.dtype(dtype))
        cap, max_m = links.shape
        three_d = records_3d(jnp.dtype(dtype).itemsize, max_m,
                             cast.shape[1])

        def shape_recs(recs, n):
            return recs if three_d else recs.reshape(n, -1)

        if cap <= chunk:
            return shape_recs(cast[jnp.maximum(links, 0)], cap)
        n_chunks = -(-cap // chunk)

        def body(i, out):
            # overlapping-tail trick: the last chunk re-covers rows the
            # previous one wrote, with identical values
            start = jnp.minimum(i * chunk, cap - chunk)
            ln = jax.lax.dynamic_slice_in_dim(links, start, chunk)
            rec = shape_recs(cast[jnp.maximum(ln, 0)], chunk)
            return jax.lax.dynamic_update_slice_in_dim(out, rec, start, 0)

        shape = ((cap, max_m, cast.shape[1]) if three_d
                 else (cap, max_m * cast.shape[1]))
        out = jnp.zeros(shape, jnp.dtype(dtype))
        return jax.lax.fori_loop(0, n_chunks, body, out)

    def _ensure_pq_codebook(self):
        """Train the PQ codebook once per index on a strided corpus sample
        (ops/pq.train_pq).  The codebook is a compression dictionary — it
        stays usable as the corpus grows (codes are re-derived per packing
        pass), and compact()/build() reset it with everything else."""
        if self._pq_codebook is None:
            from .ops.pq import train_opq, train_pq

            n = max(self.n_nodes, 1)
            stride = max(1, n // self.pq_train_sample)
            sample = jnp.asarray(self._graph.vectors[:n:stride],
                                 jnp.float32)
            if self.pq_opq:
                self._pq_rot, self._pq_codebook = train_opq(
                    sample, groups=self.pq_groups,
                    pq_iters=self.pq_train_iters)
            else:
                self._pq_codebook = train_pq(sample, groups=self.pq_groups,
                                             iters=self.pq_train_iters)
        return self._pq_codebook

    def _ensure_pq_codes(self):
        """Per-ROW PQ codes u8[cap, G] — the compressed corpus image shared
        by the sweep_pq engine and (as the gather source) pq packed records.
        Invalidated with the other shadows on insert/build/compact."""
        if self._pq_codes is None:
            from .ops.pq import pq_encode

            cb = self._ensure_pq_codebook()
            # rotation (OPQ) fuses into the chunked encode
            self._pq_codes = pq_encode(self._graph.vectors, cb, self._pq_rot)
        return self._pq_codes

    def _ensure_packed(self):
        if self._pcodes is None:
            if self.packed_dtype == "pq":
                from .ops.pq import pack_pq_records

                codes = self._ensure_pq_codes()
                # records are FLAT u8[cap, maxM*G] (128-lane aligned — see
                # ops/pq.py)
                self._pcodes = pack_pq_records(codes, self._graph.links)
                self._pscales = None
            elif self.packed_dtype == "int8":
                qv, qs = self._ensure_quantized()
                self._pcodes, self._pscales = self._pack_records(
                    qv, qs, self._graph.links)
            else:
                self._pcodes = self._pack_records_cast(
                    self._graph.vectors, self._graph.links,
                    self.packed_dtype)
                self._pscales = None
        return self._pcodes, self._pscales

    @staticmethod
    @jax.jit
    def _alive_mask(deleted, i):
        # tombstone lookup on device: transfers [B, ef] bools to host
        # instead of the whole capacity-sized deleted array
        return (i >= 0) & ~deleted[jnp.maximum(i, 0)]

    def _use_exact(self, batch: int) -> bool:
        """Cost-based routing between the graph scan and the exact sweep —
        the planner analog (the reference's hnsw_costestimate always prefers
        the index, embedding.c:393-436; on TPU a batched exact MXU sweep
        genuinely beats graph traversal up to corpus sizes in the
        hundreds of thousands, cf. the TPU-KNN approach).  Heuristic
        crossover: exact cost ~ O(N) per batch regardless of batch size;
        graph cost ~ O(batch * hops).  The crossover depends on the serving
        mode: packed traversal roughly doubles graph QPS, halving the
        corpus size past which the graph engine wins.  Tunable via
        exact_threshold / exact_threshold_packed."""
        threshold = (self.exact_threshold_packed if self.packed_traversal
                     else self.exact_threshold)
        return (self.n_nodes <= threshold and batch >= 32)

    def _filter_to_excluded(self, where
                            ) -> Tuple[Optional[jax.Array], int]:
        """Normalize a search filter into a device 'excluded' bool[cap]
        array plus the allowed-row count (the router's selectivity input).
        ``where`` is either a bool mask over node ids (True = allowed)
        or an array of allowed labels (predicate pushdown — a capability the
        reference lacks; filtered rows behave exactly like tombstones:
        routable waypoints excluded from results)."""
        if where is None:
            return None, self.n_nodes
        n = self.n_nodes
        where = np.asarray(where)
        if where.dtype == bool:
            allowed = where.reshape(-1)
            if allowed.shape[0] < n:
                raise ValueError(
                    f"filter mask covers {allowed.shape[0]} of {n} nodes")
            allowed = allowed[:n]
        else:
            allowed = np.isin(self._labels[:n], where.astype(np.uint64))
        excluded = np.ones(self._graph.capacity, bool)
        excluded[:n] = ~allowed
        return jnp.asarray(excluded), int(allowed.sum())

    @_read_locked
    def search(self, queries, k: int, ef: Optional[int] = None,
               mode: str = "auto", where=None
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """k-NN search with tombstone filtering and progressive ef-doubling.

        Mirrors hnsw_gettuple (embedding.c:284-366): run with efSearch; if
        the executor (caller) wants more rows than surfaced (tombstones or
        k > ef), double ef and re-search, until either k live results are
        found, a search returns fewer results than requested (graph
        exhausted, embedding.c:322), or widening stops producing new rows
        (embedding.c:338-341).

        ``mode``: "graph" forces the NSW beam search, "exact" forces the
        brute-force MXU sweep (recall 1.0), "sweep_pq" the compressed
        brute-force sweep (ADC over PQ codes + exact rerank — sequential
        like "exact" but streaming G bytes/row instead of 4*D;
        see pq_sweep_search), "auto" (default) routes between graph and
        exact by the cost model in ``_use_exact`` — the planner analog.

        ``where``: optional filter (predicate pushdown) — a bool mask over
        node ids (True = allowed) or an array of allowed labels. Filtered
        nodes act like tombstones: the graph still routes through them but
        they never surface, and the widening loop compensates.

        Returns (dists f32[B, k], labels u64[B, k], valid bool[B, k]); rows
        are ascending by distance, invalid slots padded with inf/0/False.
        """
        queries = self._check_dims(queries)
        self._ensure_serving_layout()
        b = queries.shape[0]
        if mode not in ("auto", "graph", "exact", "sweep_pq"):
            raise ValueError(f"unknown search mode: {mode!r}")
        excluded, n_allowed = self._filter_to_excluded(where)
        if mode == "sweep_pq":
            self.counters["n_searches"] += b
            return self.pq_sweep_search(queries, k, excluded=excluded)
        # selective filters route to the exact sweep: a graph walk under a
        # filter that excludes most rows degenerates toward ef ~ n_nodes
        # (filtered waypoints fill beam slots without surfacing), while the
        # masked exact sweep's cost is selectivity-independent — the
        # planner-analog decision the reference makes with amcostestimate
        # (embedding.c:393-436); threshold measured at 12.5M (BASELINE
        # r5 filtered tables; benchmarks/bench_filtered125.py)
        selective = (excluded is not None and
                     n_allowed < self.filter_exact_selectivity
                     * max(self.n_nodes, 1))
        if mode == "exact" or (mode == "auto"
                               and (self._use_exact(b) or selective)):
            self.counters["n_searches"] += b
            self.counters["n_exact_routed"] = (
                self.counters.get("n_exact_routed", 0) + b)
            return self.exact_search(queries, k, excluded=excluded)
        ef = self.config.ef_search if ef is None else int(ef)
        ef = self._bucket_ef(max(ef, 1))

        n = n_allowed
        qdev = jnp.asarray(queries)
        dead = (self._graph.deleted if excluded is None
                else self._graph.deleted | excluded)

        while True:
            dd, ii, stats = self._graph_search(qdev, ef)
            alive_dev = self._alive_mask(dead, ii)
            d = np.asarray(dd)
            i = np.asarray(ii)
            self.counters["n_searches"] += b
            self.counters["n_hops"] += int(np.sum(np.asarray(stats.hops)))
            self.counters["n_dist_evals"] += int(
                np.sum(np.asarray(stats.dist_evals)))
            found = i >= 0                                  # [B, ef]
            alive = np.asarray(alive_dev)
            n_alive = alive.sum(axis=1)
            n_found = found.sum(axis=1)
            # widen if some query still lacks k live results AND its search
            # filled the whole beam (=> more graph remains to explore);
            # the satisfaction target uses the ALLOWED row count, but ef may
            # keep growing toward the full graph size (filtered/tombstoned
            # nodes occupy beam slots without surfacing)
            need_more = (n_alive < min(k, n)) & (n_found >= ef)
            if (not need_more.any()
                    or ef >= min(max(self.n_nodes, 1),
                                 self.max_widen_ef)):
                break
            ef = self._bucket_ef(ef * 2)
            self.counters["n_widenings"] += 1

        out_d = np.full((b, k), np.inf, np.float32)
        out_l = np.zeros((b, k), np.uint64)
        out_v = np.zeros((b, k), bool)
        for row in range(b):
            sel = np.nonzero(alive[row])[0][:k]
            m = len(sel)
            out_d[row, :m] = d[row, sel]
            out_l[row, :m] = self._labels[i[row, sel]]
            out_v[row, :m] = True
        return out_d, out_l, out_v

    def open_scan(self, query, ef: Optional[int] = None,
                  where=None) -> "HnswScan":
        """Open a pull-model cursor over one query — the amgettuple analog
        (embedding.c:284-366).  ``scan.next(n)`` returns the next n
        not-yet-returned live results, re-searching with doubled ef when
        the cache is exhausted (hnsw_gettuple's progressive widening,
        embedding.c:329-366) and deduping rows already handed out (the
        qsort+bsearch TID dedup, embedding.c:356-365).

        Like the reference (comment embedding.c:345-351), rows appended by
        a widened re-search may be CLOSER than rows already returned —
        monotonicity is traded for recall, faithfully."""
        query = self._check_dims(query)
        if query.shape[0] != 1:
            raise ValueError("open_scan takes exactly one query vector")
        ef = self.config.ef_search if ef is None else int(ef)
        return HnswScan(self, query, self._bucket_ef(max(ef, 1)), where)

    @_read_locked
    def exact_search(self, queries, k: int, engine: str = "auto",
                     excluded=None
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Brute-force exact k-NN over live vectors — the seq-scan ground
        truth (embedding.c:1022-1038; test/sql/knn.sql:41-44).

        ``engine``: "pallas" uses the fused kernel (MXU matmul form for
        L2/cosine, VPU |a-b| accumulation for Manhattan — all exact), "jnp"
        the chunked lax.top_k path, "auto" picks pallas on TPU.
        ``excluded``: optional bool[cap] device mask of additional rows to
        skip (the filtered-search pushdown)."""
        queries = self._check_dims(queries)
        self._ensure_serving_layout()
        n = self.n_nodes
        if engine not in ("auto", "jnp", "pallas"):
            raise ValueError(f"unknown exact engine: {engine!r}")
        # with no tombstones and no filter, drop the deleted operand
        # entirely: a bool[N, 1] column tiles 128x in the lane dim on TPU
        # — 1.6 GB of HBM at 12.5M rows for an all-false mask (the r5
        # shard-125 oracle OOM; counters["n_deleted"] is restored from
        # the stored mask on load, so this is exact, not heuristic)
        if excluded is None:
            dead = (self._graph.deleted
                    if self.counters.get("n_deleted", 0) else None)
        else:
            dead = self._graph.deleted | excluded
        use_pallas = (engine == "pallas" or
                      (engine == "auto"
                       and jax.default_backend() in ("tpu", "axon")))
        if use_pallas:
            d, i = _pallas_bruteforce(jnp.asarray(queries),
                                      self._graph.vectors, k,
                                      self.config.metric, n_valid=n,
                                      deleted=dead)
        else:
            d, i = _bruteforce(jnp.asarray(queries), self._graph.vectors, k,
                               self.config.metric, n_valid=n,
                               deleted=dead)
        d = np.asarray(d)
        i = np.asarray(i)
        valid = i >= 0
        labels = np.where(valid, self._labels[np.maximum(i, 0)], 0)
        return d, labels.astype(np.uint64), valid

    @_read_locked
    def pq_sweep_search(self, queries, k: int, pool: Optional[int] = None,
                        excluded=None
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Compressed brute-force k-NN: one sequential ADC sweep over the
        corpus' PQ codes (G bytes/row instead of the exact sweep's 4*D),
        exact-f32 rerank of the coarse top-``pool`` (ops/pq_sweep.py).

        Approximate — PQ distortion can drop a true neighbor from the
        coarse pool — but returned distances are reference-exact, and
        ``pool`` prices recall directly.  The engine for the regime where
        the exact sweep is corpus-bandwidth-bound (multi-million rows) yet
        graph memory/quality is unattractive; no graph required (codes come
        from the stored vectors, so this also serves un-linked corpora).

        ``pool`` is bucketed to a power of two (compile reuse, same rule as
        ef).  Returns (dists, labels, valid) like search()/exact_search().
        """
        from .ops.pq_sweep import pq_sweep_search as _pq_sweep

        queries = self._check_dims(queries)
        codes = self._ensure_pq_codes()
        dead = (self._graph.deleted if excluded is None
                else self._graph.deleted | excluded)
        if pool is None:
            pool = (self.pq_sweep_pool if self.pq_sweep_pool
                    else min(max(4 * k, k + 28), 256))
        pool = 1 << (max(int(pool), int(k)) - 1).bit_length()
        d, i = _pq_sweep(jnp.asarray(queries), codes, self._pq_codebook,
                         self._pq_rot, self._graph.vectors, k,
                         self.config.metric, n_valid=self.n_nodes,
                         deleted=dead, pool=pool)
        d = np.asarray(d)
        i = np.asarray(i)
        valid = i >= 0
        labels = np.where(valid, self._labels[np.maximum(i, 0)], 0)
        return d, labels.astype(np.uint64), valid

    # ------------------------------------------------------------------ #
    # delete / vacuum (tombstones)
    # ------------------------------------------------------------------ #

    @_write_locked
    def delete(self, labels) -> int:
        """Tombstone every node whose label matches (ambulkdelete analog,
        embedding.c:918-932). Nodes stay in the graph as routable waypoints;
        returns the number tombstoned."""
        labels = np.asarray(labels, dtype=np.uint64).reshape(-1)
        n = self.n_nodes
        mine = self._labels[:n]
        dead = np.isin(mine, labels)
        already = np.asarray(self._graph.deleted)[:n]
        newly = dead & ~already
        idxs = np.nonzero(newly)[0]
        if len(idxs):
            if self._wal is not None and not self._wal_replaying:
                self._wal.log_delete(mine[idxs])
            self._graph = self._graph._replace(
                deleted=self._graph.deleted.at[jnp.asarray(idxs)].set(True))
        self.counters["n_deleted"] += len(idxs)
        self._maybe_auto_checkpoint()
        return len(idxs)

    @_write_locked
    def delete_where(self, mask) -> int:
        """Tombstone by node-id mask — the callback form of ambulkdelete."""
        mask = np.asarray(mask, bool).reshape(-1)
        n = self.n_nodes
        idxs = np.nonzero(mask[:n] & ~np.asarray(self._graph.deleted)[:n])[0]
        if len(idxs):
            if self._wal is not None and not self._wal_replaying:
                # canonical WAL form is labels (the TID analog)
                self._wal.log_delete(self._labels[idxs])
            self._graph = self._graph._replace(
                deleted=self._graph.deleted.at[jnp.asarray(idxs)].set(True))
        self.counters["n_deleted"] += len(idxs)
        self._maybe_auto_checkpoint()
        return len(idxs)

    def tune_ef_search(self, queries, target_recall: float = 0.95,
                       k: int = 10, max_ef: int = 4096,
                       strict: bool = False) -> TuneResult:
        """Find (and set) the smallest power-of-two efSearch whose graph-mode
        recall@k on ``queries`` meets ``target_recall`` against the exact
        oracle — the ef/beam autotuner (SURVEY.md §7 step 6).

        Returns TuneResult(ef, recall, met); config.ef_search is set to the
        chosen ef either way (the best available if the target was missed).
        ``strict=True`` raises TuneTargetMissed instead of returning an
        unmet result."""
        queries = self._check_dims(queries)
        _, ol, ov = self.exact_search(queries, k)
        ef = max(self.config.ef_search, k)
        # round up to power of two
        ef = 1 << (ef - 1).bit_length()
        best, achieved = ef, 0.0
        while ef <= min(max_ef, max(self.n_nodes, 1)):
            d, i = self.search_ids(queries, ef)
            alive = np.asarray(self._alive_mask(self._graph.deleted,
                                                jnp.asarray(i)))
            recs = []
            for r in range(queries.shape[0]):
                got = set(self._labels[i[r][alive[r]][:k]].tolist())
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
        self.set_ef_search(best)
        return TuneResult(best, achieved, met)

    def tune_sweep_pool(self, queries, target_recall: float = 0.95,
                        k: int = 10, max_pool: int = 1024,
                        strict: bool = False) -> TuneResult:
        """Find (and set) the smallest power-of-two sweep_pq coarse-pool
        width whose recall@k on ``queries`` meets ``target_recall`` against
        the exact oracle — the pool analog of tune_ef_search (the pool
        prices PQ distortion the way ef prices beam width).

        Sets self.pq_sweep_pool and returns TuneResult(pool, recall, met);
        ``strict=True`` raises TuneTargetMissed on a miss."""
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

    @_write_locked
    def downcast_corpus(self, dtype: str = "bfloat16") -> None:
        """Serving-footprint transition: cast the resident corpus to a
        narrower storage dtype IN PLACE — the single-chip answer when
        derived serving records leave no HBM room for the f32 rows.
        The case it exists for: PQ G=32 at 10M x 128d, where records
        (10.2 GB) + f32 corpus (5.1 GB) + links (1.3 GB) exceed a 16 GB
        chip, but a bf16 corpus serves the same records in 2.6 GB (the
        co-located record-locality role, embedding.c:226-231, carried
        past the point the reference's mmap'd f32 pages could reach).

        Equivalent to ``storage_dtype="bfloat16"`` at construction,
        except applied AFTER building and after any PQ training/encoding
        — so graph topology and code assignments come from
        full-precision rows; only the traversal's row reads (entry
        distance, plain-walk gathers, exact rerank) see dtype-rounded
        rows afterwards.  Derived shadows (PQ codebook/codes/records,
        int8 shadow) are deliberately KEPT — they were computed from the
        f32 corpus.  Lossy and one-way (widening back is refused);
        subsequent inserts and the exact sweep keep working in the
        narrow dtype, exactly as a bf16-storage index does.  save()
        persists the new dtype (vectors upcast losslessly to f32 in the
        file, restored to storage_dtype on load)."""
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
        # re-pin after the cast (the astype output reverts to the
        # backend-default layout at unaligned D)
        self._graph = self._graph._replace(
            vectors=pin_serving_layout(
                self._graph.vectors.astype(jnp.dtype(dtype))))

    @_read_locked
    def compact(self) -> "HnswIndex":
        """Rebuild the index over live (non-tombstoned) vectors only,
        reclaiming dead space — a capability the reference lacks entirely
        (space is never reclaimed, embedding.c:867-878; TRUNCATE+reinsert is
        the only reset, test gh-3). Returns a NEW index; self is untouched."""
        n = self.n_nodes
        alive = ~np.asarray(self._graph.deleted)[:n]
        vecs = np.asarray(self._graph.vectors[:n], np.float32)[alive]
        labels = self._labels[:n][alive]
        fresh = HnswIndex(self.config,
                          max_insert_batch=self.max_insert_batch,
                          search_expand_width=self.search_expand_width,
                          build_expand_width=self.build_expand_width,
                          build_candidates=self.build_candidates,
                          storage_dtype=self.storage_dtype,
                          quantized_traversal=self.quantized_traversal,
                          packed_traversal=self.packed_traversal,
                          packed_dtype=self.packed_dtype,
                          pq_groups=self.pq_groups,
                          pq_opq=self.pq_opq)
        if len(vecs):
            fresh.build(vecs, labels)
        return fresh

    @_read_locked
    def check_integrity(self, raise_on_error: bool = True) -> Dict[str, int]:
        """Validate graph invariants — the debug-mode analog of the
        reference's runtime asserts (SURVEY.md §5 'race detection'):
        blank-slot / self-link / link-count-bounds checks
        (hnswalg.cpp:170-177, 183-184, 190-191) plus id-range and
        -1-padding discipline. Returns violation counts."""
        n = self.n_nodes
        links = np.asarray(self._graph.links)[:n]
        cnts = np.asarray(self._graph.link_counts)[:n]
        viol = {"count_over_maxm": 0, "self_links": 0, "bad_ids": 0,
                "dup_links": 0, "pad_violations": 0}
        viol["count_over_maxm"] = int((cnts > self.config.max_m).sum())
        slot = np.arange(self.config.max_m)[None, :]
        in_range = slot < cnts[:, None]
        viol["self_links"] = int(
            ((links == np.arange(n)[:, None]) & in_range).sum())
        viol["bad_ids"] = int(
            (((links < 0) | (links >= n)) & in_range).sum())
        viol["pad_violations"] = int(((links != -1) & ~in_range).sum())
        for i in range(n):
            row = links[i][: cnts[i]]
            viol["dup_links"] += int(len(row) - len(np.unique(row)))
        if raise_on_error and any(viol.values()):
            raise AssertionError(f"graph integrity violations: {viol}")
        return viol

    @_read_locked
    def vacuum(self) -> Dict[str, int]:
        """Stats only — space is never reclaimed (amvacuumcleanup,
        embedding.c:867-878)."""
        n = self.n_nodes
        dead = int(np.asarray(self._graph.deleted)[:n].sum())
        return {"num_nodes": n, "num_live": n - dead, "num_dead": dead,
                "capacity": self._graph.capacity}

    # ------------------------------------------------------------------ #
    # durability (save/load) — the WAL/checkpoint analog
    # ------------------------------------------------------------------ #

    def enable_wal(self, path: str,
                   auto_checkpoint_bytes: Optional[int] = None,
                   snapshot_path: Optional[str] = None) -> None:
        """Enable the write-ahead delta log — the GenericXLog analog
        (embedding.c:651-686): every add()/delete() is appended and fsync'd
        BEFORE the device mutation, so a crash between save() snapshots
        loses nothing acknowledged. load(snapshot, wal=path) replays the
        records appended after the snapshot (see wal.py).

        ``auto_checkpoint_bytes`` bounds the log the way Postgres
        checkpoints bound GenericXLog (embedding.c:526-530): once the log
        passes the threshold, the next completed add()/delete() snapshots
        to ``snapshot_path`` (default: ``path + ".ckpt.npz"``), which
        truncates the replayed prefix.  The log is therefore never larger
        than threshold + one call's payload.  Recovery after a crash:
        ``load(snapshot_path, wal=path)``.  None (default) keeps the
        manual-checkpoint behavior."""
        from .wal import WalWriter

        self._wal = WalWriter(path, self.config)
        self._wal_auto_bytes = (int(auto_checkpoint_bytes)
                                if auto_checkpoint_bytes else None)
        self._wal_snapshot_path = snapshot_path or (path + ".ckpt.npz")

    def _maybe_auto_checkpoint(self) -> None:
        """Called AFTER a mutation is applied on device: every logged
        record is covered by device state, so the snapshot+truncate pair
        is loss-free (a checkpoint between log-append and apply would
        truncate acknowledged-but-unapplied records)."""
        if (self._wal is not None and not self._wal_replaying
                and getattr(self, "_wal_auto_bytes", None) is not None
                and self._wal.tell() >= self._wal_auto_bytes):
            self.save(self._wal_snapshot_path)

    @staticmethod
    def _to_host(arr, n, dtype=None, rows: int = 1 << 20):
        """Device->host in bounded chunks: one giant np.asarray of a
        multi-GB array goes through the transfer path as a single
        transaction (minutes-long, unabortable on the tunnel); chunking
        keeps each read bounded and pipelines with the next slice."""
        shape = (n,) + tuple(arr.shape[1:])
        out = np.empty(shape, dtype if dtype is not None else arr.dtype)
        for off in range(0, n, rows):
            hi = min(off + rows, n)
            out[off:hi] = np.asarray(arr[off:hi], out.dtype)
        return out

    @_read_locked
    def save(self, path: str, compressed: Optional[bool] = None,
             truncate_wal: bool = True) -> None:
        """Serialize the full device state. Like the reference, everything
        except the arrays is re-derived from config on load
        (embedding.c:58-64: 'metadata is reconstructed from reloptions').

        The snapshot is written ATOMICALLY (tmp + fsync + rename): a crash
        mid-save never clobbers the previous snapshot.

        If a WAL is enabled, the snapshot records the current WAL
        (epoch, offset) — the LSN analog — so load(wal=...) replays only
        the tail; with ``truncate_wal`` (default) the replayed prefix is
        then reclaimed by truncating the log to a new epoch, bounding WAL
        size and replay cost exactly like Postgres checkpoints bound
        GenericXLog (embedding.c:526-530).  The snapshot additionally
        records the predicted post-truncation epoch, so a crash BETWEEN
        the snapshot and the truncation replays from the correct position
        either way (see wal.py module doc).

        ``compressed``: None (default) compresses only indexes under ~1GB —
        single-thread zlib on a multi-GB vector array costs minutes for a
        poor ratio on float data; np.load reads both forms."""
        path = _npz_path(path)
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        n = self.n_nodes
        do_truncate = truncate_wal and self._wal is not None
        payload = dict(
            format_version=np.int64(_SAVE_FORMAT_VERSION),
            wal_offset=np.int64(self._wal.tell() if self._wal is not None
                                else -1),
            wal_epoch=np.int64(self._wal.epoch if self._wal is not None
                               else -1),
            storage_dtype=np.frombuffer(
                self.storage_dtype.encode(), dtype=np.uint8),
            config=np.frombuffer(
                json.dumps(self.config.to_dict()).encode(), dtype=np.uint8),
            # bf16 upcasts losslessly to f32 for serialization (numpy
            # cannot serialize ml_dtypes); restored to storage_dtype on load
            vectors=self._to_host(self._graph.vectors, n, np.float32),
            links=self._to_host(self._graph.links, n),
            link_counts=self._to_host(self._graph.link_counts, n),
            deleted=self._to_host(self._graph.deleted, n),
            labels=self._labels[:n],
        )
        if do_truncate:
            nxt = self._wal.epoch + 1
            payload["wal_epoch_next"] = np.int64(nxt)
            payload["wal_offset_next"] = np.int64(self._wal.header_len(nxt))
        if self._pq_codebook is not None:
            # persist the trained PQ dictionary (~256*D floats) so load()
            # serves pq-packed/sweep_pq without a retrain, with codes
            # stable across restarts; codes/records re-derive from it
            payload["pq_codebook"] = np.asarray(self._pq_codebook,
                                                np.float32)
            payload["pq_groups_trained"] = np.int64(self.pq_groups)
            if self._pq_rot is not None:
                payload["pq_rot"] = np.asarray(self._pq_rot, np.float32)
        if compressed is None:
            compressed = payload["vectors"].nbytes < (1 << 30)
        _atomic_savez(path, payload, compressed)
        if do_truncate:
            # the covering snapshot is durable; reclaim the replayed prefix
            self._wal.truncate(self._wal.epoch + 1)

    @classmethod
    def load(cls, path: str, config: Optional[HnswConfig] = None,
             wal: Optional[str] = None) -> "HnswIndex":
        """Restore an index. If ``config`` is given, its frozen fields
        {dims, maxM, metric} must match the stored ones — the metadata-guard
        analog (embedding.c:594-602); ef* knobs may differ freely.

        ``wal``: path of the write-ahead delta log; records appended after
        the snapshot's stored offset are replayed (crash recovery), then
        the log stays enabled on the restored index."""
        with np.load(_npz_path(path)) as z:
            wal_offset = int(z["wal_offset"]) if "wal_offset" in z else -1
            wal_epoch = int(z["wal_epoch"]) if "wal_epoch" in z else None
            wal_next = (int(z["wal_epoch_next"]),
                        int(z["wal_offset_next"])) \
                if "wal_epoch_next" in z else None
            if int(z["format_version"]) != _SAVE_FORMAT_VERSION:
                raise ValueError("unsupported index format version")
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
            storage_dtype = (bytes(z["storage_dtype"]).decode()
                             if "storage_dtype" in z else "float32")
            vectors = z["vectors"]
            links = z["links"]
            link_counts = z["link_counts"]
            deleted = z["deleted"]
            labels = z["labels"]
            pq_codebook = z["pq_codebook"] if "pq_codebook" in z else None
            pq_groups_trained = (int(z["pq_groups_trained"])
                                 if "pq_groups_trained" in z else None)
            pq_rot = z["pq_rot"] if "pq_rot" in z else None

        n = vectors.shape[0]
        idx = cls(cfg, initial_capacity=max(n, 32),
                  storage_dtype=storage_dtype)
        cap = idx._graph.capacity
        # free the constructor's placeholder graph BEFORE uploading the
        # real arrays: holding both means two full corpora (plus the
        # serving-layout pin's chunked-relayout transient) coexist on
        # device — 18 GB at 12.5M x 96d, the r5 pinned-load OOM
        idx._graph = None
        vec = np.zeros((cap, cfg.dims), np.float32)
        vec[:n] = vectors
        lnk = np.full((cap, cfg.max_m), -1, np.int32)
        lnk[:n] = links
        cnt = np.zeros(cap, np.int32)
        cnt[:n] = link_counts
        dlt = np.zeros(cap, bool)
        dlt[:n] = deleted
        # upload the HOST array straight into the serving layout (at
        # unaligned D the pin applies during the transfer — a device-side
        # relayout would transiently hold dense + row-major + transpose
        # workspace, which OOM'd the 12.5M load); non-f32 storage casts
        # on device after a plain upload (numpy has no bf16)
        if jnp.dtype(storage_dtype) == jnp.float32:
            vec_dev = pin_serving_layout(vec)
            if not isinstance(vec_dev, jax.Array):
                vec_dev = jnp.asarray(vec_dev)
        else:
            vec_dev = pin_serving_layout(
                jnp.asarray(vec, jnp.dtype(storage_dtype)))
        idx._graph = GraphState(
            vectors=vec_dev,
            links=jnp.asarray(lnk),
            link_counts=jnp.asarray(cnt), deleted=jnp.asarray(dlt),
            n_nodes=jnp.int32(n))
        idx._labels[:n] = labels
        idx._count = n
        idx.counters["n_inserted"] = n
        # live tombstone count (exact_search drops the deleted operand
        # when it is zero — see the HBM-padding note there); counted on
        # the host copy before upload, so this is free
        idx.counters["n_deleted"] = int(dlt.sum())
        if pq_codebook is not None:
            idx._pq_codebook = jnp.asarray(pq_codebook)
            idx.pq_groups = pq_groups_trained
            if pq_rot is not None:
                idx._pq_rot = jnp.asarray(pq_rot)
                idx.pq_opq = True
        if wal is not None:
            idx._replay_wal(wal, wal_offset, wal_epoch, wal_next)
        return idx

    @staticmethod
    def _wal_replay_start(wal_path: str, from_offset: int,
                          snap_epoch, snap_next) -> Optional[int]:
        """Pick the replay start by comparing the WAL file's actual epoch
        with the snapshot's recorded pre-/post-truncation positions (see
        wal.py module doc).  Returns a byte offset or None (= whole log)."""
        from . import wal as walmod

        if not os.path.exists(wal_path):
            return None
        file_epoch = int(walmod.read_header(wal_path).get("epoch", 0))
        if snap_next is not None and file_epoch == snap_next[0]:
            return snap_next[1]       # truncation completed before the crash
        if snap_epoch is None or snap_epoch < 0:
            # legacy snapshot (no epoch recorded): offsets are only valid
            # against a never-truncated (epoch-0) log
            if file_epoch != 0:
                raise ValueError(
                    f"WAL {wal_path} is at epoch {file_epoch} but the "
                    f"snapshot predates WAL epochs; the tail this snapshot "
                    f"needs was truncated by a later save()")
            return from_offset if from_offset >= 0 else None
        if file_epoch == snap_epoch:
            return from_offset        # crash before the truncation (or none)
        raise ValueError(
            f"WAL {wal_path} is at epoch {file_epoch} but the snapshot "
            f"recorded epoch {snap_epoch}: the log was truncated by a "
            f"LATER snapshot — load that snapshot instead")

    def _replay_wal(self, wal_path: str, from_offset: int,
                    snap_epoch=None, snap_next=None) -> None:
        """Apply WAL records past the snapshot position, then reopen the log
        for appending (the recovered index keeps journaling)."""
        from . import wal as walmod

        start = self._wal_replay_start(wal_path, from_offset, snap_epoch,
                                       snap_next)
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

    # ------------------------------------------------------------------ #
    # knobs
    # ------------------------------------------------------------------ #

    def set_ef_search(self, ef_search: int) -> None:
        """ALTER INDEX ... SET (efsearch=...) — the only legal live
        mutation besides ef_construction (embedding.c:594-602)."""
        self.config = self.config.with_ef(ef_search=ef_search)

    def set_ef_construction(self, ef_construction: int) -> None:
        self.config = self.config.with_ef(ef_construction=ef_construction)


class HnswScan:
    """Pull-model scan cursor over one query — HnswScanOpaqueData + the
    hnsw_gettuple state machine (embedding.c:100-107, 284-366).

    State: the current result cache, a cursor into it, the set of node ids
    already returned (the sorted-TID dedup array analog), the current ef,
    and the ``no_more_results`` flag (embedding.c:322, 338-343).  Created
    via HnswIndex.open_scan()."""

    def __init__(self, index: HnswIndex, query: np.ndarray, ef: int,
                 where) -> None:
        self._idx = index
        self._q = query                                 # [1, D] f32
        self._ef = ef
        # the where-filter is snapshotted at open (rescan to refresh);
        # tombstones are re-read per fetch so concurrent deletes are seen
        self._excluded, _ = index._filter_to_excluded(where)
        self._buf_d: list = []                          # undelivered rows
        self._buf_l: list = []
        self._seen: set = set()                         # returned node ids
        self._no_more = False
        self._first = True

    def _dead_mask(self):
        """Current tombstone|filter mask, padded to the CURRENT capacity:
        the graph may have grown since open (concurrent add); rows
        inserted after open were never evaluated by the where-filter, so
        they stay excluded (snapshot semantics) while fresh tombstones
        are honored."""
        dead = self._idx._graph.deleted
        exc = self._excluded
        if exc is None:
            return dead
        if exc.shape[0] != dead.shape[0]:
            exc = jnp.pad(exc, (0, dead.shape[0] - exc.shape[0]),
                          constant_values=True)
            self._excluded = exc
        return dead | exc

    @property
    def exhausted(self) -> bool:
        """True once the graph can produce no further rows (the cache may
        still hold undelivered ones)."""
        return self._no_more and not self._buf_d

    def _fetch(self) -> None:
        """Run (or widen + re-run) the search, appending only new live rows
        to the cache — one iteration of the embedding.c:297-366 machine."""
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
        dd, ii, stats = idx._graph_search(jnp.asarray(self._q), self._ef)
        alive = np.asarray(idx._alive_mask(self._dead_mask(), ii))[0]
        d = np.asarray(dd)[0]
        i = np.asarray(ii)[0]
        idx.counters["n_searches"] += 1
        idx.counters["n_hops"] += int(np.sum(np.asarray(stats.hops)))
        idx.counters["n_dist_evals"] += int(
            np.sum(np.asarray(stats.dist_evals)))
        n_found = int((i >= 0).sum())
        for pos in range(len(i)):
            node = int(i[pos])
            if node < 0 or not alive[pos] or node in self._seen:
                continue
            self._seen.add(node)
            self._buf_d.append(float(d[pos]))
            self._buf_l.append(idx._labels[node])
        # termination: the graph is exhausted once a search cannot fill its
        # RAW beam (embedding.c:322's rule, applied pre-filter).  The
        # reference counts post-filter rows, which stops a scan early when
        # tombstones crowd the beam; like api.search's widening loop we
        # count raw rows, so starved scans keep widening until live rows
        # surface or the beam covers the graph (the ef >= n_nodes gate
        # above) — strictly more results, never fewer.
        if n_found < self._ef:
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
