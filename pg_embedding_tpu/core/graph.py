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
