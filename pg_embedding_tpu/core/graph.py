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


def empty_graph(capacity: int, dims: int, max_m: int,
                dtype=jnp.float32) -> GraphState:
    """Allocate an empty graph with the given capacity.

    Capacity is padded to a multiple of 32 so the search visited-bitmap
    (u32 words, mirroring hnswalg.cpp:45-50) covers it exactly; large
    graphs align to the exact-sweep tile LCM (see _round_capacity).
    """
    cap = _round_capacity(capacity)
    return GraphState(
        vectors=jnp.zeros((cap, dims), dtype),
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
        vectors=jnp.pad(graph.vectors, ((0, pad), (0, 0))),
        links=jnp.pad(graph.links, ((0, pad), (0, 0)), constant_values=-1),
        link_counts=jnp.pad(graph.link_counts, (0, pad)),
        deleted=jnp.pad(graph.deleted, (0, pad)),
        n_nodes=graph.n_nodes,
    )
