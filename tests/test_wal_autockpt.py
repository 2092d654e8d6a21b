"""WAL auto-checkpoint policy (round 4): a size-triggered snapshot bounds
the log between manual saves — the library analog of Postgres checkpoints
reclaiming GenericXLog (embedding.c:526-530, 651-686).  The guarantee under
test: with ``auto_checkpoint_bytes=T``, the log never exceeds T plus one
call's payload, and crash-recovery from the auto-written snapshot + WAL
tail reproduces the full index."""

import os

import numpy as np
import pytest

from pg_embedding_tpu import HnswConfig, HnswIndex, ShardedHnswIndex


def _cfg():
    return HnswConfig(dims=16, m=8, ef_construction=32, ef_search=32)


def _batch(rng, n=64):
    return rng.normal(size=(n, 16)).astype(np.float32)


def test_auto_checkpoint_bounds_log(tmp_path, rng):
    wal = str(tmp_path / "w.wal")
    thresh = 1 << 14  # 16 KiB: a 64-row batch is 64*(8+64) = 4.6 KiB
    idx = HnswIndex(_cfg(), max_insert_batch=32)
    idx.enable_wal(wal, auto_checkpoint_bytes=thresh)
    batch_bytes = 64 * (8 + 4 * 16) + 5
    labels = 0
    for _ in range(12):
        idx.add(_batch(rng), np.arange(labels, labels + 64, dtype=np.uint64))
        labels += 64
        # bounded-log guarantee: threshold + one call's payload
        assert os.path.getsize(wal) <= thresh + batch_bytes
    # the trigger actually fired: a snapshot exists at the derived path
    snap = wal + ".ckpt.npz"
    assert os.path.exists(snap)


def test_auto_checkpoint_recovery(tmp_path, rng):
    """Crash after an auto-checkpoint + a few more writes: load(snapshot,
    wal=...) replays exactly the un-snapshotted tail."""
    wal = str(tmp_path / "w.wal")
    idx = HnswIndex(_cfg(), max_insert_batch=32)
    idx.enable_wal(wal, auto_checkpoint_bytes=1 << 13)
    labels = 0
    for _ in range(8):
        idx.add(_batch(rng), np.arange(labels, labels + 64, dtype=np.uint64))
        labels += 64
    idx.delete(np.arange(10, dtype=np.uint64))
    snap = wal + ".ckpt.npz"
    assert os.path.exists(snap)
    # simulate crash: reload from the auto snapshot + WAL tail
    rec = HnswIndex.load(snap, wal=wal)
    assert rec.n_nodes == idx.n_nodes
    assert rec.counters["n_deleted"] >= 0
    qs = _batch(rng, 8)
    d1, l1, v1 = idx.search(qs, 5, mode="graph")
    d2, l2, v2 = rec.search(qs, 5, mode="graph")
    np.testing.assert_array_equal(l1[v1], l2[v2])
    np.testing.assert_array_equal(d1[v1], d2[v2])


def test_auto_checkpoint_custom_snapshot_path(tmp_path, rng):
    wal = str(tmp_path / "w.wal")
    snap = str(tmp_path / "custom.npz")
    idx = HnswIndex(_cfg(), max_insert_batch=32)
    idx.enable_wal(wal, auto_checkpoint_bytes=1 << 12, snapshot_path=snap)
    idx.add(_batch(rng, 128), np.arange(128, dtype=np.uint64))
    assert os.path.exists(snap)
    # log was truncated back to a header-only file
    assert os.path.getsize(wal) < 1 << 12


def test_no_policy_means_unbounded(tmp_path, rng):
    """Default behavior unchanged: no auto snapshots, log only grows."""
    wal = str(tmp_path / "w.wal")
    idx = HnswIndex(_cfg(), max_insert_batch=32)
    idx.enable_wal(wal)
    for i in range(4):
        idx.add(_batch(rng), np.arange(i * 64, (i + 1) * 64,
                                       dtype=np.uint64))
    assert not os.path.exists(wal + ".ckpt.npz")


def test_sharded_auto_checkpoint(tmp_path, rng):
    wal = str(tmp_path / "s.wal")
    idx = ShardedHnswIndex(_cfg(), max_insert_batch=32)
    idx.enable_wal(wal, auto_checkpoint_bytes=1 << 13)
    labels = 0
    for _ in range(6):
        idx.add(_batch(rng), np.arange(labels, labels + 64, dtype=np.uint64))
        labels += 64
    snap = wal + ".ckpt.npz"
    assert os.path.exists(snap)
    assert os.path.getsize(wal) <= (1 << 13) + 64 * (8 + 4 * 16) + 5
    rec = ShardedHnswIndex.load(snap, wal=wal)
    assert rec.n_nodes == idx.n_nodes
    qs = _batch(rng, 8)
    d1, l1, v1 = idx.search(qs, 5, mode="graph")
    d2, l2, v2 = rec.search(qs, 5, mode="graph")
    np.testing.assert_array_equal(l1[v1], l2[v2])
