"""pg_embedding_tpu — a TPU-native approximate-nearest-neighbor (flat-NSW)
vector search engine, built from scratch in JAX/XLA/Pallas with the
capabilities of neondatabase/pg_embedding (the ``hnsw`` Postgres index
access method).

Capability map (reference -> here):
  SQL operators <-> / <=> / <~>      -> ops.distance.{l2,cosine,manhattan}_distance
  opclasses ann_{l2,cos,manhattan}_ops -> config.Metric + resolve_metric
  reloptions {dims,m,efconstruction,efsearch} -> config.HnswConfig
  CREATE INDEX / ambuild             -> api.HnswIndex.build
  aminsert                           -> api.HnswIndex.add
  amgettuple + progressive widening  -> api.HnswIndex.search
  ambulkdelete (tombstones)          -> api.HnswIndex.delete
  amvacuumcleanup                    -> api.HnswIndex.vacuum
  seq-scan exact ordering            -> api.HnswIndex.exact_search / ops.bruteforce
  WAL/page durability                -> api.HnswIndex.save / load
  (new, TPU-native) multi-chip shards -> parallel.sharded.ShardedHnswIndex
"""

from .config import HnswConfig, HnswConfigError, Metric, resolve_metric
from .ops.distance import (cosine_distance, l2_distance, manhattan_distance)
from .ops.bruteforce import exact_search
from .ops.pallas_bruteforce import pallas_exact_search
from .api import HnswIndex, TuneResult, TuneTargetMissed
from .parallel.sharded import ShardedHnswIndex
from .table import VectorTable

__version__ = "0.1.0"

__all__ = [
    "HnswConfig",
    "HnswConfigError",
    "Metric",
    "resolve_metric",
    "l2_distance",
    "cosine_distance",
    "manhattan_distance",
    "exact_search",
    "pallas_exact_search",
    "HnswIndex",
    "TuneResult",
    "TuneTargetMissed",
    "ShardedHnswIndex",
    "VectorTable",
    "__version__",
]
