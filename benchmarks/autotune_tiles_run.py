#!/usr/bin/env python
"""One-time exact-kernel tile autotune at the BASELINE config points
(ROADMAP #2).  Run ON THE TPU; winners persist to the tile cache
(~/.cache/pg_embedding_tpu/exact_tiles.json or $PG_EMB_TUNE_DIR) and
every later pallas_exact_search call with those shapes picks them up —
including nearby corpus sizes via the nearest-rows-bucket fallback.

Each (metric, dims) point is tuned at TWO corpus scales (128k and 1M
rows): the winning tile pair is scale-dependent, and these two buckets
bracket the headline bench (100k) and the BASELINE native-scale configs
(1M+).  To ship the results as factory calibration, run
tools/make_factory_tiles.py afterwards.

Usage:  python benchmarks/autotune_tiles_run.py  [n_rows ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from pg_embedding_tpu import Metric  # noqa: E402
from pg_embedding_tpu.ops.pallas_bruteforce import (  # noqa: E402
    _tile_cache_path, autotune_tiles)

NS = ([int(a) for a in sys.argv[1:]] if len(sys.argv) > 1
      else [131_072, 1_048_576])

# the BASELINE config shape points: SIFT 128d L2, GloVe-100 cosine
# (pads to 128), GIST 960d L2, Deep 96d L2 (pads to 128 -> covered),
# each at the headline k=10
POINTS = [
    (128, Metric.L2),
    (128, Metric.COSINE),
    (960, Metric.L2),
]


def main():
    print(f"backend: {jax.default_backend()}; corpora {NS}; "
          f"cache -> {_tile_cache_path()}", flush=True)
    for dims, metric in POINTS:
        for n in NS:
            t0 = time.time()
            print(f"=== {metric.name} {dims}d k=10 n={n} ===", flush=True)
            tq, tn, qps = autotune_tiles(dims, metric, k=10, n=n,
                                         verbose=True)
            print(f"  winner: tile_q={tq} tile_n={tn} at {qps:.0f} QPS "
                  f"({time.time() - t0:.0f}s incl. compiles)", flush=True)


if __name__ == "__main__":
    main()
