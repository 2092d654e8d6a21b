#!/usr/bin/env python
"""One-time exact-kernel tile autotune at the BASELINE config points
(ROADMAP #2).  Run ON THE TPU; winners persist to the tile cache
(~/.cache/pg_embedding_tpu/exact_tiles.json or $PG_EMB_TUNE_DIR) and
every later pallas_exact_search call with those shapes picks them up.

Usage:  python benchmarks/autotune_tiles_run.py  [n_rows]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from pg_embedding_tpu import Metric  # noqa: E402
from pg_embedding_tpu.ops.pallas_bruteforce import (  # noqa: E402
    _tile_cache_path, autotune_tiles)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144

# the BASELINE config shape points: SIFT 128d L2, GloVe-100 cosine
# (pads to 128), GIST 960d L2, Deep 96d L2 (pads to 128 -> covered),
# each at the headline k=10
POINTS = [
    (128, Metric.L2),
    (128, Metric.COSINE),
    (960, Metric.L2),
]


def main():
    print(f"backend: {jax.default_backend()}; corpus {N} rows; "
          f"cache -> {_tile_cache_path()}", flush=True)
    for dims, metric in POINTS:
        t0 = time.time()
        print(f"=== {metric.name} {dims}d k=10 ===", flush=True)
        tq, tn, qps = autotune_tiles(dims, metric, k=10, n=N, verbose=True)
        print(f"  winner: tile_q={tq} tile_n={tn} at {qps:.0f} QPS "
              f"({time.time() - t0:.0f}s incl. compiles)", flush=True)


if __name__ == "__main__":
    main()
