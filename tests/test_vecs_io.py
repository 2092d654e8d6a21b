"""Native bulk vector-file loader (ROADMAP r3 #7): mmap'd multi-threaded
.fvecs/.bvecs/.ivecs reader feeding f32 staging buffers, with a numpy
fallback of identical semantics."""

import numpy as np
import pytest

from pg_embedding_tpu.utils.vecs_io import (VecsFile, native_available,
                                            write_vecs)

NATIVE_MODES = [False] + ([True] if native_available() else [])


@pytest.fixture(scope="module")
def files(tmp_path_factory, rng):
    d = tmp_path_factory.mktemp("vecs")
    f32 = rng.normal(size=(1000, 24)).astype(np.float32)
    u8 = rng.integers(0, 256, size=(1000, 24)).astype(np.uint8)
    i32 = rng.integers(-1000, 1000, size=(1000, 24)).astype(np.int32)
    paths = {"fvecs": str(d / "a.fvecs"), "bvecs": str(d / "a.bvecs"),
             "ivecs": str(d / "a.ivecs")}
    write_vecs(paths["fvecs"], f32)
    write_vecs(paths["bvecs"], u8)
    write_vecs(paths["ivecs"], i32)
    return paths, {"fvecs": f32, "bvecs": u8, "ivecs": i32}


@pytest.mark.parametrize("native", NATIVE_MODES)
@pytest.mark.parametrize("kind", ["fvecs", "bvecs", "ivecs"])
def test_roundtrip(files, kind, native):
    paths, data = files
    with VecsFile(paths[kind], native=native) as f:
        assert f.shape == (1000, 24)
        got = f.read()
        np.testing.assert_array_equal(got, data[kind].astype(np.float32))


@pytest.mark.parametrize("native", NATIVE_MODES)
def test_ranged_reads_and_getitem(files, native):
    paths, data = files
    ref = data["fvecs"]
    with VecsFile(paths["fvecs"], native=native) as f:
        np.testing.assert_array_equal(f.read(100, 50), ref[100:150])
        np.testing.assert_array_equal(f[950:2000], ref[950:])  # clamped
        np.testing.assert_array_equal(f[7], ref[7])
        np.testing.assert_array_equal(f[-1], ref[-1])
        assert f.read(1000, 10).shape == (0, 24)
        assert len(f) == 1000


@pytest.mark.parametrize("native", NATIVE_MODES)
def test_out_buffer_reuse(files, native):
    paths, data = files
    buf = np.empty((64, 24), np.float32)
    with VecsFile(paths["bvecs"], native=native) as f:
        got = f.read(10, 64, out=buf)
        assert got.base is buf or got is buf
        np.testing.assert_array_equal(got, data["bvecs"][10:74])
        with pytest.raises(ValueError):
            f.read(0, 64, out=np.empty((64, 24), np.float64))


@pytest.mark.parametrize("native", NATIVE_MODES)
def test_iter_batches_covers_all_rows(files, native):
    paths, data = files
    ref = data["ivecs"].astype(np.float32)
    seen = []
    with VecsFile(paths["ivecs"], native=native) as f:
        for start, block in f.iter_batches(384):  # ragged tail
            assert start == sum(len(s) for s in seen)
            seen.append(block.copy())  # buffers are reused — copy
    np.testing.assert_array_equal(np.concatenate(seen), ref)


def test_native_threads_match_single(files):
    if not native_available():
        pytest.skip("no toolchain")
    paths, data = files
    with VecsFile(paths["fvecs"], n_threads=8) as f8, \
            VecsFile(paths["fvecs"], n_threads=1) as f1:
        np.testing.assert_array_equal(f8.read(), f1.read())


def test_bad_files(tmp_path):
    p = str(tmp_path / "bad.fvecs")
    with open(p, "wb") as fh:
        fh.write(b"\x03\x00\x00\x00" + b"\x00" * 7)  # truncated row
    with pytest.raises(ValueError):
        VecsFile(p, native=False)
    if native_available():
        with pytest.raises(ValueError):
            VecsFile(p, native=True)
    with pytest.raises(ValueError):
        VecsFile(str(tmp_path / "x.weird"))


def test_feeds_index_build(files, rng):
    """End-to-end: stream a vecs file into HnswIndex.add (the ingest path
    the loader exists for)."""
    from pg_embedding_tpu import HnswConfig, HnswIndex

    paths, data = files
    idx = HnswIndex(HnswConfig(dims=24, m=8, ef_construction=32,
                               ef_search=32))
    with VecsFile(paths["fvecs"]) as f:
        for start, block in f.iter_batches(256):
            idx.add(block, np.arange(start, start + len(block)))
    assert idx.n_nodes == 1000
    q = data["fvecs"][:8]
    d, l, v = idx.search(q, 1)
    assert np.all(l[:, 0] == np.arange(8))  # self-query finds itself
