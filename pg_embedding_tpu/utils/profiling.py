"""Tracing / profiling helpers — closing SURVEY.md §5's observability gap.

The reference has no instrumentation at all (its only counter is the build's
n_inserted, embedding.c:69).  Here:

  * ``trace(logdir)``     — context manager around ``jax.profiler`` producing
                            a TensorBoard-viewable device trace.
  * ``Timer``             — wall-clock phase timer with true device sync
                            (host materialization — on the axon TPU runtime,
                            ``block_until_ready`` does not actually block).
  * ``SearchStatsAgg``    — aggregates per-query kernel counters
                            (hops, distance evaluations) across calls.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (TensorBoard format) for the block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """Force device completion by materializing one leaf to host.

    On the axon TPU runtime ``jax.block_until_ready`` returns immediately;
    a host read is the only true synchronization point."""
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(leaves[-1])


class Timer:
    """Phase timer: ``with timer.phase("build"): ...`` accumulates seconds."""

    def __init__(self) -> None:
        self.seconds: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_tree=None):
        t0 = time.time()
        try:
            yield
        finally:
            if sync_tree is not None:
                sync(sync_tree)
            self.seconds[name] = self.seconds.get(name, 0.0) + time.time() - t0
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        return "; ".join(
            f"{k}: {v:.3f}s/{self.counts[k]}x" for k, v in
            sorted(self.seconds.items()))


class SearchStatsAgg:
    """Aggregate core.search.SearchStats across calls."""

    def __init__(self) -> None:
        self.n_queries = 0
        self.total_hops = 0
        self.total_dist_evals = 0
        self.max_hops = 0

    def add(self, stats) -> None:
        hops = np.asarray(stats.hops)
        evals = np.asarray(stats.dist_evals)
        self.n_queries += hops.size
        self.total_hops += int(hops.sum())
        self.total_dist_evals += int(evals.sum())
        self.max_hops = max(self.max_hops, int(hops.max()))

    def summary(self) -> Dict[str, float]:
        q = max(self.n_queries, 1)
        return {
            "queries": self.n_queries,
            "mean_hops": self.total_hops / q,
            "mean_dist_evals": self.total_dist_evals / q,
            "max_hops": self.max_hops,
        }
