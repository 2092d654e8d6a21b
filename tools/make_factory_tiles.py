#!/usr/bin/env python
"""Promote the local measured tile cache to factory calibration.

Copies ~/.cache/pg_embedding_tpu/exact_tiles.json (or $PG_EMB_TUNE_DIR)
into pg_embedding_tpu/ops/exact_tiles_factory.json, duplicating each
entry across the "tpu" and "axon" backend prefixes — the tunneled axon
device IS a v5e, so a measurement under either backend name is valid for
both.  The factory file is the third precedence layer (explicit args >
user cache > factory > static table); committing it means a fresh
machine starts from measured tiles.

Usage: python tools/make_factory_tiles.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg_embedding_tpu.ops.pallas_bruteforce import _tile_cache_path  # noqa: E402

BACKENDS = ("tpu", "axon")


def main():
    src = _tile_cache_path()
    with open(src) as f:
        cache = json.load(f)
    out = {}
    for key, val in sorted(cache.items()):
        backend, rest = key.split(":", 1)
        for b in BACKENDS:
            out.setdefault(f"{b}:{rest}", val)
    dst = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "pg_embedding_tpu", "ops", "exact_tiles_factory.json")
    dst = os.path.normpath(dst)
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{src} ({len(cache)} entries) -> {dst} ({len(out)} entries)")


if __name__ == "__main__":
    main()
