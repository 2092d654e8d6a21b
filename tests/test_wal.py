"""Write-ahead delta log — incremental durability (the GenericXLog analog,
embedding.c:651-686). The reference's crash safety is WAL replay; these
tests simulate crashes by discarding the in-memory index and restoring
snapshot + log."""

import os

import numpy as np
import pytest

from pg_embedding_tpu import HnswConfig, HnswIndex
from pg_embedding_tpu.wal import read_header, replay


@pytest.fixture()
def data(rng):
    pts = rng.normal(size=(200, 12)).astype(np.float32)
    qs = rng.normal(size=(8, 12)).astype(np.float32)
    return pts, qs


def _cfg():
    return HnswConfig(dims=12, m=6, ef_construction=24, ef_search=24)


def test_crash_recovery_full_cycle(tmp_path, data):
    """build + snapshot + add + delete + 'crash' + restore -> identical
    search results (VERDICT r1 item 6's done-criterion)."""
    pts, qs = data
    snap = str(tmp_path / "snap.npz")
    wal = str(tmp_path / "wal.bin")

    idx = HnswIndex(_cfg())
    idx.enable_wal(wal)
    idx.build(pts[:100], np.arange(100))
    idx.save(snap)                      # snapshot records the WAL offset
    idx.add(pts[100:150], np.arange(100, 150))      # post-snapshot inserts
    idx.delete(np.arange(10, 20))                   # post-snapshot deletes
    want = idx.search(qs, 10, mode="graph")

    # crash: the in-memory index is gone; only snapshot + WAL survive
    del idx

    back = HnswIndex.load(snap, wal=wal)
    assert back.n_nodes == 150
    assert int(np.asarray(back.graph.deleted).sum()) == 10
    got = back.search(qs, 10, mode="graph")
    np.testing.assert_array_equal(want[1], got[1])   # labels
    np.testing.assert_allclose(want[0], got[0], rtol=1e-5)  # dists
    assert (want[2] == got[2]).all()

    # the restored index keeps journaling: further ops survive another crash
    back.add(pts[150:160], np.arange(150, 160))
    want2 = back.search(qs, 10, mode="graph")
    del back
    again = HnswIndex.load(snap, wal=wal)
    assert again.n_nodes == 160
    got2 = again.search(qs, 10, mode="graph")
    np.testing.assert_array_equal(want2[1], got2[1])


def test_wal_without_snapshot_replays_everything(tmp_path, data):
    """A WAL enabled from creation can rebuild the index from scratch: load
    an EMPTY snapshot and replay the whole log."""
    pts, qs = data
    snap = str(tmp_path / "empty.npz")
    wal = str(tmp_path / "wal.bin")

    idx = HnswIndex(_cfg())
    idx.save(snap)                      # empty snapshot, no WAL yet => -1
    idx.enable_wal(wal)
    idx.add(pts[:80], np.arange(80))
    idx.delete(np.arange(5))
    want = idx.search(qs, 5, mode="graph")
    del idx

    back = HnswIndex.load(snap, wal=wal)
    assert back.n_nodes == 80
    got = back.search(qs, 5, mode="graph")
    np.testing.assert_array_equal(want[1], got[1])


def test_torn_tail_is_dropped(tmp_path, data):
    """A crash mid-append leaves a torn record; replay must stop cleanly at
    the last complete record."""
    pts, _ = data
    wal = str(tmp_path / "wal.bin")
    idx = HnswIndex(_cfg())
    idx.enable_wal(wal)
    idx.add(pts[:30], np.arange(30))
    idx.add(pts[30:60], np.arange(30, 60))
    size = os.path.getsize(wal)
    with open(wal, "r+b") as f:        # tear the second record
        f.truncate(size - 17)

    recs = list(replay(wal, 12))
    assert len(recs) == 1
    op, labels, vectors = recs[0]
    assert list(labels) == list(range(30))
    assert vectors.shape == (30, 12)


def test_wal_header_guard(tmp_path, data):
    """Appending with mismatched frozen options must be rejected (the
    metadata-guard discipline, embedding.c:594-602)."""
    pts, _ = data
    wal = str(tmp_path / "wal.bin")
    idx = HnswIndex(_cfg())
    idx.enable_wal(wal)
    idx.add(pts[:10], np.arange(10))
    assert read_header(wal)["dims"] == 12

    other = HnswIndex(HnswConfig(dims=16, m=6, ef_construction=24,
                                 ef_search=24))
    with pytest.raises(ValueError, match="frozen"):
        other.enable_wal(wal)


def test_delete_where_logs_labels(tmp_path, data):
    pts, _ = data
    wal = str(tmp_path / "wal.bin")
    idx = HnswIndex(_cfg())
    idx.enable_wal(wal)
    idx.add(pts[:40], np.arange(100, 140))
    mask = np.zeros(40, bool)
    mask[[3, 7]] = True
    idx.delete_where(mask)
    recs = list(replay(wal, 12))
    assert recs[-1][0] == 2
    assert sorted(recs[-1][1].tolist()) == [103, 107]
