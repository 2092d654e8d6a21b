"""MURSIW thread-safety contract (round 4): single writer, concurrent
readers, reads never overlapping writes — the reference's page-0 lock
discipline (embedding.c:624-631) made explicit at the host API, plus the
donation rule (insert donates device buffers, so an overlapping read is
memory-unsafe, not merely stale).  Two-thread smokes: a writer streaming
inserts while readers search/save concurrently must never raise and must
always return internally-consistent results."""

import threading

import numpy as np
import pytest

from pg_embedding_tpu import HnswConfig, HnswIndex, ShardedHnswIndex
from pg_embedding_tpu.utils.locking import RWLock


def _cfg():
    return HnswConfig(dims=16, m=8, ef_construction=32, ef_search=32)


def test_rwlock_reentrant_write_then_read():
    lk = RWLock()
    with lk.write():
        with lk.read():      # save() inside add() (auto-checkpoint)
            with lk.write():
                pass


def test_rwlock_read_upgrade_refused():
    lk = RWLock()
    with lk.read():
        with pytest.raises(RuntimeError):
            with lk.write():
                pass


def test_rwlock_excludes_writer_during_reads():
    lk = RWLock()
    order = []
    started = threading.Event()
    release = threading.Event()

    def reader():
        with lk.read():
            started.set()
            release.wait(5)
            order.append("read-done")

    def writer():
        started.wait(5)
        with lk.write():
            order.append("write")

    t1 = threading.Thread(target=reader)
    t2 = threading.Thread(target=writer)
    t1.start(); t2.start()
    started.wait(5)
    release.set()
    t1.join(5); t2.join(5)
    assert order == ["read-done", "write"]


def test_writer_not_starved_by_spinning_readers():
    """Regression: without writer preference, back-to-back readers on few
    cores hold the read side forever (observed livelock on the one-core
    host).  The writer must finish while two readers spin."""
    lk = RWLock()
    stop = threading.Event()
    wrote = threading.Event()

    def reader():
        while not stop.is_set():
            with lk.read():
                pass

    def writer():
        for _ in range(5):
            with lk.write():
                pass
        wrote.set()

    rs = [threading.Thread(target=reader) for _ in range(2)]
    w = threading.Thread(target=writer)
    for t in rs:
        t.start()
    w.start()
    ok = wrote.wait(30)
    stop.set()
    w.join(5)
    for t in rs:
        t.join(5)
    assert ok, "writer starved by spinning readers"


def test_concurrent_reader_writer_smoke(rng):
    """Writer streams insert batches (pre-sized capacity: no growth
    compiles on the one-core CI host) while two readers search; every
    search must return valid, finite results."""
    idx = HnswIndex(_cfg(), max_insert_batch=32, initial_capacity=1024)
    idx.add(rng.normal(size=(256, 16)).astype(np.float32),
            np.arange(256, dtype=np.uint64))
    qs = rng.normal(size=(8, 16)).astype(np.float32)
    # warm both compiled programs before the threads race
    idx.search(qs, 5, mode="graph")
    errors = []
    stop = threading.Event()

    def writer():
        try:
            base = 256
            for _ in range(6):
                idx.add(rng.normal(size=(64, 16)).astype(np.float32),
                        np.arange(base, base + 64, dtype=np.uint64))
                base += 64
        except Exception as e:                      # pragma: no cover
            errors.append(e)
        finally:
            stop.set()

    def reader():
        try:
            while not stop.is_set():
                d, l, v = idx.search(qs, 5, mode="graph")
                assert np.isfinite(d[v]).all()
                assert v.any()
        except Exception as e:                      # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer)] + \
        [threading.Thread(target=reader) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    assert not errors, errors
    assert idx.n_nodes == 256 + 6 * 64


def test_concurrent_sharded_smoke(rng):
    idx = ShardedHnswIndex(_cfg(), max_insert_batch=32,
                           initial_capacity=512)
    idx.add(rng.normal(size=(256, 16)).astype(np.float32),
            np.arange(256, dtype=np.uint64))
    qs = rng.normal(size=(8, 16)).astype(np.float32)
    idx.search(qs, 5, mode="graph")   # warm compiles before racing
    errors = []
    stop = threading.Event()

    def writer():
        try:
            base = 256
            for _ in range(4):
                idx.add(rng.normal(size=(64, 16)).astype(np.float32),
                        np.arange(base, base + 64, dtype=np.uint64))
                base += 64
        except Exception as e:                      # pragma: no cover
            errors.append(e)
        finally:
            stop.set()

    def reader():
        try:
            while not stop.is_set():
                d, l, v = idx.search(qs, 5, mode="graph")
                assert np.isfinite(d[v]).all()
        except Exception as e:                      # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer),
               threading.Thread(target=reader)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    assert not errors, errors
    assert idx.n_nodes == 256 + 4 * 64
