"""utils.profiling coverage."""

import time

import numpy as np

from pg_embedding_tpu.utils.profiling import SearchStatsAgg, Timer, sync


def test_timer_phases():
    t = Timer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    assert t.counts["a"] == 2
    assert t.seconds["a"] >= 0.01
    assert "a:" in t.report() and "b:" in t.report()


def test_stats_agg():
    from pg_embedding_tpu.core.search import SearchStats

    agg = SearchStatsAgg()
    agg.add(SearchStats(hops=np.array([3, 5]), dist_evals=np.array([10, 20])))
    agg.add(SearchStats(hops=np.array([7]), dist_evals=np.array([30])))
    s = agg.summary()
    assert s["queries"] == 3
    assert s["mean_hops"] == 5
    assert s["max_hops"] == 7
    assert s["mean_dist_evals"] == 20


def test_sync_noop_on_host():
    import jax.numpy as jnp

    sync({"x": jnp.arange(4)})
    sync([])
