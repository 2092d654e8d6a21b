"""Round-3 WAL lifecycle: truncation on save (checkpoint-bounded log,
the embedding.c:526-530 discipline), epoch crash-safety on either side of
the truncation, sharded WAL (per-insert durability applies to ALL
writers, embedding.c:651-686), and per-shard snapshot splitting."""

import os

import numpy as np
import pytest

from pg_embedding_tpu import HnswConfig, HnswIndex, ShardedHnswIndex
from pg_embedding_tpu.wal import WalWriter, read_header


@pytest.fixture()
def data(rng):
    pts = rng.normal(size=(200, 12)).astype(np.float32)
    qs = rng.normal(size=(8, 12)).astype(np.float32)
    return pts, qs


def _cfg():
    return HnswConfig(dims=12, m=6, ef_construction=24, ef_search=24)


def test_save_truncates_wal(tmp_path, data):
    pts, qs = data
    snap = str(tmp_path / "s.npz")
    wal = str(tmp_path / "w.bin")
    idx = HnswIndex(_cfg())
    idx.enable_wal(wal)
    idx.build(pts[:150], np.arange(150))
    size_before = os.path.getsize(wal)
    idx.save(snap)
    # the replayed prefix is gone; only a header remains
    assert os.path.getsize(wal) < size_before
    assert read_header(wal)["epoch"] == 1
    # recovery from the truncated log still works
    idx.add(pts[150:160], np.arange(150, 160))
    want = idx.search(qs, 5, mode="graph")
    del idx
    back = HnswIndex.load(snap, wal=wal)
    assert back.n_nodes == 160
    got = back.search(qs, 5, mode="graph")
    np.testing.assert_array_equal(want[1], got[1])
    # repeated save/load cycles keep bumping the epoch
    back.save(snap)
    assert read_header(wal)["epoch"] == 2
    again = HnswIndex.load(snap, wal=wal)
    assert again.n_nodes == 160


def test_save_without_truncation_keeps_log(tmp_path, data):
    pts, _ = data
    snap = str(tmp_path / "s.npz")
    wal = str(tmp_path / "w.bin")
    idx = HnswIndex(_cfg())
    idx.enable_wal(wal)
    idx.add(pts[:50], np.arange(50))
    size_before = os.path.getsize(wal)
    idx.save(snap, truncate_wal=False)
    assert os.path.getsize(wal) == size_before
    assert read_header(wal)["epoch"] == 0
    back = HnswIndex.load(snap, wal=wal)
    assert back.n_nodes == 50


def test_crash_between_snapshot_and_truncation(tmp_path, data, monkeypatch):
    """The snapshot is durable but the truncation never ran: the WAL is
    still at the old epoch, so load must replay from the OLD offset —
    no duplicates, no loss."""
    pts, qs = data
    snap = str(tmp_path / "s.npz")
    wal = str(tmp_path / "w.bin")
    idx = HnswIndex(_cfg())
    idx.enable_wal(wal)
    idx.build(pts[:100], np.arange(100))
    monkeypatch.setattr(WalWriter, "truncate",
                        lambda self, e: None)        # "crash" here
    idx.save(snap)
    assert read_header(wal)["epoch"] == 0            # truncation lost
    idx.add(pts[100:120], np.arange(100, 120))       # post-snapshot tail
    want = idx.search(qs, 5, mode="graph")
    del idx
    monkeypatch.undo()
    back = HnswIndex.load(snap, wal=wal)
    assert back.n_nodes == 120                        # tail replayed once
    got = back.search(qs, 5, mode="graph")
    np.testing.assert_array_equal(want[1], got[1])


def test_stale_snapshot_after_truncation_raises(tmp_path, data):
    """A snapshot older than the last truncation cannot be recovered with
    this WAL (its tail was reclaimed) — that must be an error, not silent
    data loss."""
    pts, _ = data
    old_snap = str(tmp_path / "old.npz")
    new_snap = str(tmp_path / "new.npz")
    wal = str(tmp_path / "w.bin")
    idx = HnswIndex(_cfg())
    idx.enable_wal(wal)
    idx.add(pts[:50], np.arange(50))
    idx.save(old_snap)                    # epoch 0 -> 1
    idx.add(pts[50:80], np.arange(50, 80))
    idx.save(new_snap)                    # epoch 1 -> 2; old tail reclaimed
    with pytest.raises(ValueError, match="LATER snapshot"):
        HnswIndex.load(old_snap, wal=wal)
    back = HnswIndex.load(new_snap, wal=wal)
    assert back.n_nodes == 80


def test_sharded_wal_crash_recovery(tmp_path, data):
    """Sharded tier: build + snapshot + add + delete + crash + restore ->
    identical results (the single-chip cycle, on the 8-device mesh)."""
    pts, qs = data
    snap = str(tmp_path / "s.npz")
    wal = str(tmp_path / "w.bin")
    idx = ShardedHnswIndex(_cfg())
    idx.enable_wal(wal)
    idx.build(pts[:100], np.arange(100))
    idx.save(snap)
    idx.add(pts[100:150], np.arange(100, 150))
    idx.delete(np.arange(10, 20))
    want = idx.search(qs, 10, mode="graph")
    del idx

    back = ShardedHnswIndex.load(snap, wal=wal)
    assert back.n_nodes == 150
    got = back.search(qs, 10, mode="graph")
    np.testing.assert_array_equal(want[1], got[1])
    np.testing.assert_allclose(want[0], got[0], rtol=1e-5)

    # keeps journaling after recovery
    back.add(pts[150:170], np.arange(150, 170))
    del back
    again = ShardedHnswIndex.load(snap, wal=wal)
    assert again.n_nodes == 170


def test_sharded_wal_writes_before_mutation(tmp_path, data):
    pts, _ = data
    wal = str(tmp_path / "w.bin")
    idx = ShardedHnswIndex(_cfg())
    idx.enable_wal(wal)
    idx.add(pts[:40], np.arange(40))
    from pg_embedding_tpu.wal import replay
    recs = list(replay(wal, 12))
    assert recs[0][0] == 1 and len(recs[0][1]) == 40
    idx.delete(np.arange(5))
    recs = list(replay(wal, 12))
    assert recs[-1][0] == 2
    assert sorted(recs[-1][1].tolist()) == list(range(5))


def test_per_shard_snapshot_split(tmp_path, data):
    pts, qs = data
    idx = ShardedHnswIndex(_cfg())
    idx.build(pts[:120], np.arange(120))
    idx.delete(np.arange(7))
    p = str(tmp_path / "split.npz")
    idx.save(p, per_shard=True)
    # manifest + one file per shard exist
    assert os.path.exists(p)
    for i in range(idx.n_shards):
        assert os.path.exists(str(tmp_path / f"split.shard{i}.npz"))
    want = idx.search(qs, 10, mode="graph")
    back = ShardedHnswIndex.load(p)
    assert back.n_nodes == 120
    got = back.search(qs, 10, mode="graph")
    np.testing.assert_array_equal(want[1], got[1])
    assert back.vacuum()["num_dead"] == 7
