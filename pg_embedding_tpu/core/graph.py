"""Device-resident graph state — the TPU replacement for the page store.

The reference stores each node as a packed record
``[count:u32][links:u32 x maxM][coords:f32 x dim][label:u64]`` inside 8KB
Postgres pages (layout derivation: embedding.c:224-231), accessed one node at
a time through begin_read/begin_write cursors (embedding.c:704-843).

On TPU that AoS-in-pages layout becomes structure-of-arrays in HBM so that a
whole frontier's neighbor rows can be gathered coalesced and fed to the
MXU/VPU in one shot:

  vectors     f32[cap, D]     coordinate rows      (offset_data analog)
  links       i32[cap, maxM]  adjacency, -1 padded (the link array analog)
  link_counts i32[cap]        valid-link counts    (the count word analog)
  deleted     bool[cap]       tombstone bits       (label flags bit, embedding.c:44)
  n_nodes     i32 scalar      number of live+dead nodes appended so far

Labels (the u64 heap-TID analog, embedding.c:50-56) live on the host in the
API layer: device search works in internal node ids; the idx -> label mapping
happens at the very end, exactly where searchKnn does it (hnswalg.cpp:243-246).

Everything is a pytree of arrays; all mutation is functional (no data races
by construction — the TPU answer to the reference's single-writer lock,
embedding.c:624-631).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class GraphState(NamedTuple):
    vectors: jax.Array      # f32[cap, D]
    links: jax.Array        # i32[cap, maxM], -1 padded
    link_counts: jax.Array  # i32[cap]
    deleted: jax.Array      # bool[cap]
    n_nodes: jax.Array      # i32 scalar

    @property
    def capacity(self) -> int:
        return self.vectors.shape[0]

    @property
    def dims(self) -> int:
        return self.vectors.shape[1]

    @property
    def max_m(self) -> int:
        return self.links.shape[1]


# LCM of the exact-sweep kernel's corpus tile sizes (1536/1024/640/384/128,
# ops/pallas_bruteforce.py tile auto-selection) and the 32-row visited-bitmap
# word. Large graphs align to it so the sweep NEVER has to jnp.pad the
# corpus to a tile multiple — that pad is a full copy of a multi-GB array
# (the 10M x 128d OOM: 6.5GB graph + 5.1GB padded copy).  Small graphs keep
# the 32-row grain; <1.6% waste above the threshold.
_EXACT_TILE_ALIGN = 15360
_ALIGN_THRESHOLD = 1_000_000


def _round_capacity(capacity: int) -> int:
    grain = _EXACT_TILE_ALIGN if capacity >= _ALIGN_THRESHOLD else 32
    return max(-(-int(capacity) // grain) * grain, 32)


# TPU (sublane, lane) tile shapes by element width: f32 (8, 128),
# bf16 (16, 128), int8/u8 (32, 128)
_SUBLANE_TILE = {1: 32, 2: 16, 4: 8}


def records_3d(itemsize: int, max_m: int, dims: int) -> bool:
    """Whether packed neighbor records should be 3-D [cap, maxM, D]
    instead of flat 2-D [cap, maxM*D].

    3-D wins when the [maxM, D] minor tile is EXACTLY lane/sublane
    aligned for the record dtype: the per-hop gather then lands directly
    in the [rows, D] tiling the distance matmul consumes, while flat
    records tile the gathered [T, maxM*D] block along maxM*D lanes and
    the reshape to [T*maxM, D] becomes a lanes<->sublanes relayout
    INSIDE the beam loop (measured on the chip at 100k x 128d, r5:
    int8 14,261 -> 17,702 QPS, f32 15,128 -> 17,800 — the round-4
    packed regression, BENCH_r04 vs r03).

    Flat stays the layout everywhere else: unaligned D pads every
    neighbor's row up to 128 lanes in 3-D (1.28x HBM at D=100) and XLA
    prepends a whole-records layout-conversion copy to the serving
    program (both measured to OOM a 16 GB chip at 1.2M x 100d — the r4
    flat-records fix, api._pack_records)."""
    return dims % 128 == 0 and max_m % _SUBLANE_TILE[itemsize] == 0


def pin_serving_layout(vectors):
    """Pin an unaligned-D corpus to ROW-MAJOR on TPU backends.

    At D % 128 != 0, XLA's default layout for f32[N, D] is D-major —
    dense (no lane padding), which is why a 12.5M x 96d corpus occupies
    4.77 GB resident — but every serve kernel consumes row-major tiles,
    so EACH serve program (graph walk and exact sweep alike) carried a
    whole-corpus relayout copy as an HLO temp and re-paid it per call
    (measured r5: 0.787 GB per program at 1.5M x 96d, 5.96 GB at 12.5M
    — the reason the 12.5M serve programs ran within ~1 GB of HBM).

    Pinning row-major once trades +33% resident corpus (lane padding at
    96d) for ZERO relayout temps in every serve program, measured at
    1.5M x 96d: graph walk 25,058 -> 31,785 QPS (+27%), exact sweep
    14,806 -> 16,982 (+15%), results identical.  Donating insert
    programs specialize on the pinned argument layout, so mutations
    preserve it.  No-op at aligned D (default layout is already
    row-major-equivalent) and off TPU (CPU layouts are row-major).

    ``vectors`` may be a device array OR a host numpy array — passing
    the HOST array uploads straight into the pinned layout, avoiding
    the transient double-resident (dense upload + row-major copy +
    transpose workspace) that OOM'd the 12.5M load on device."""
    dims = vectors.shape[-1]
    if dims % 128 == 0 or jax.default_backend() not in ("tpu", "axon"):
        return vectors
    try:
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding

        nd = vectors.ndim
        sds = SingleDeviceSharding(jax.devices()[0])
        fmt = Format(Layout(major_to_minor=tuple(range(nd))), sds)
        cur = getattr(vectors, "format", None)
        if (cur is not None and
                cur.layout.major_to_minor == tuple(range(nd))):
            return vectors
        # one-shot device_put stages + transposes with whole-corpus
        # transients (measured OOM at 12.5M x 96d: dense 4.77 GB +
        # pinned 5.96 GB + transpose scratch); past ~2 GB of padded
        # bytes, relayout CHUNKED through a donated pinned buffer so
        # the scratch is one chunk instead of the corpus
        itemsize = jnp.dtype(vectors.dtype).itemsize
        padded = (int(np.prod(vectors.shape[:-1])) *
                  (-(-dims // 128) * 128) * itemsize)
        if padded <= (2 << 30):
            return jax.device_put(vectors, fmt)
        return _pin_chunked(jnp.asarray(vectors), fmt, sds)
    except Exception:  # pragma: no cover - layout API drift
        return vectors


def _pin_chunked(vectors, fmt, sds, chunk: int = 1_048_576):
    """Relayout a large corpus into ``fmt`` with bounded scratch: a
    layout-pinned zero buffer is built IN layout (constant fill, no
    transpose), then chunks of the source are transposed into it
    through one donated dynamic-update program (peak = source + pinned
    target + one chunk; measured 2.5 s for 12.5M x 96d).  The explicit
    in_shardings pin on the donated buffer is REQUIRED: without it jit
    relayouts the input to the default layout first, donation fails,
    and two whole-corpus buffers coexist (the OOM this replaced)."""
    import functools

    n = vectors.shape[0]
    chunk = min(chunk, n)
    out = jax.jit(lambda: jnp.zeros(vectors.shape, vectors.dtype),
                  out_shardings=fmt)()

    @functools.partial(jax.jit, donate_argnums=(0,),
                       in_shardings=(fmt, sds, None), out_shardings=fmt)
    def upd(buf, blk, start):
        return jax.lax.dynamic_update_slice_in_dim(buf, blk, start, 0)

    for lo in range(0, n, chunk):
        # overlapping-tail trick: the clamped last chunk re-covers rows
        # the previous one wrote, with identical values
        start = min(lo, n - chunk)
        out = upd(out, jax.lax.dynamic_slice_in_dim(
            vectors, start, chunk), start)
    return out


def empty_graph(capacity: int, dims: int, max_m: int,
                dtype=jnp.float32) -> GraphState:
    """Allocate an empty graph with the given capacity.

    Capacity is padded to a multiple of 32 so the search visited-bitmap
    (u32 words, mirroring hnswalg.cpp:45-50) covers it exactly; large
    graphs align to the exact-sweep tile LCM (see _round_capacity).
    """
    cap = _round_capacity(capacity)
    return GraphState(
        vectors=pin_serving_layout(jnp.zeros((cap, dims), dtype)),
        links=jnp.full((cap, max_m), -1, jnp.int32),
        link_counts=jnp.zeros((cap,), jnp.int32),
        deleted=jnp.zeros((cap,), jnp.bool_),
        n_nodes=jnp.int32(0),
    )


def grow_graph(graph: GraphState, new_capacity: int) -> GraphState:
    """Double-style capacity growth (the relation-extend analog,
    embedding.c:633-683). Host-side reallocation; device copy."""
    cap = _round_capacity(new_capacity)
    old = graph.capacity
    if cap <= old:
        return graph
    pad = cap - old
    return GraphState(
        # re-pin after the pad: the eager pad's output reverts to the
        # backend-default (D-major) layout at unaligned D
        vectors=pin_serving_layout(
            jnp.pad(graph.vectors, ((0, pad), (0, 0)))),
        links=jnp.pad(graph.links, ((0, pad), (0, 0)), constant_values=-1),
        link_counts=jnp.pad(graph.link_counts, (0, pad)),
        deleted=jnp.pad(graph.deleted, (0, pad)),
        n_nodes=graph.n_nodes,
    )
