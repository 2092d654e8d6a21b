"""Native C++ engine vs the Python reference implementation: graph and
search parity across all metrics (the C++ engine is the bench baseline, so
its semantics must be pinned)."""

import numpy as np
import pytest

from pg_embedding_tpu.config import HnswConfig, Metric
from pg_embedding_tpu.core.refimpl import RefHnswIndex

cpu_ref = pytest.importorskip("pg_embedding_tpu.utils.cpu_ref")

if not cpu_ref.available():  # no toolchain
    pytest.skip("g++ unavailable", allow_module_level=True)


@pytest.mark.parametrize("metric", list(Metric))
def test_graph_and_search_parity(rng, metric):
    pts = rng.normal(size=(250, 12)).astype(np.float32)
    qs = rng.normal(size=(6, 12)).astype(np.float32)
    cfg = HnswConfig(dims=12, m=6, ef_construction=32, ef_search=24,
                     metric=metric)
    ri = RefHnswIndex(cfg)
    ri.build(pts, np.arange(250))
    ci = cpu_ref.CpuRefIndex(12, m=6, ef_construction=32,
                             metric=metric.value)
    ci.build(pts)

    mismatch = sum(1 for i in range(250)
                   if set(ri.links[i]) != set(ci.links(i).tolist()))
    assert mismatch <= 5, mismatch  # identical up to float tie-breaks

    for q in qs:
        py = [l for _, l in ri.search(q, 24)]
        _, cl = ci.search(q, 24)
        assert set(py) == set(cl.astype(np.int64).tolist())


def test_delete_parity(rng):
    pts = rng.normal(size=(100, 8)).astype(np.float32)
    ci = cpu_ref.CpuRefIndex(8, m=4, ef_construction=16)
    ci.build(pts)
    q = pts[3]
    _, l0 = ci.search(q, 10)
    assert ci.delete_label(int(l0[0])) == 1
    _, l1 = ci.search(q, 10)
    assert int(l0[0]) not in l1
    assert ci.delete_label(int(l0[0])) == 0  # already dead
