"""Bulk vector-file IO — the native ingest path for benchmark corpora.

The reference ingests rows through SQL inserts (embedding.c:556-604); at
SIFT1B/Deep1B scale the corpora ship as ``.fvecs``/``.bvecs``/``.ivecs``
files (every row = ``[int32 dim][dim elements]``), and feeding the TPU
staging buffers needs a reader that moves at memory speed.  The native
loader (csrc/vecs_loader.cpp, built on demand like the CPU reference
engine) mmaps the file — the page cache is the buffer pool, no read()
copies — and converts row ranges to contiguous f32 with a thread pool,
upcasting u8/i32 elements during the copy.

A pure-numpy fallback (strided memmap view) covers hosts without a
toolchain; same API, single-threaded.

    with VecsFile("sift1b.bvecs") as f:
        for start, batch in f.iter_batches(262_144):
            index.add(batch)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "csrc", "vecs_loader.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "csrc", "build")
_SO = os.path.join(_BUILD_DIR, "libvecs_loader.so")

_KINDS = {".fvecs": (0, np.float32), ".bvecs": (1, np.uint8),
          ".ivecs": (2, np.int32)}

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _compile() -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           _SRC, "-o", _SO, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", str(e))
        raise RuntimeError(f"failed to build vecs loader: {detail}")
    return _SO


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _compile()
        lib = ctypes.CDLL(_SO)
        lib.vecs_open.restype = ctypes.c_void_p
        lib.vecs_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.vecs_rows.restype = ctypes.c_int64
        lib.vecs_rows.argtypes = [ctypes.c_void_p]
        lib.vecs_dims.restype = ctypes.c_int32
        lib.vecs_dims.argtypes = [ctypes.c_void_p]
        lib.vecs_read.restype = ctypes.c_int64
        lib.vecs_read.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_int64,
                                  ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_int]
        lib.vecs_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except RuntimeError:
        return False


class VecsFile:
    """Reader for ``.fvecs``/``.bvecs``/``.ivecs`` files.

    Always yields contiguous float32 row blocks (the staging dtype);
    integer element kinds upcast during the native copy.
    """

    def __init__(self, path: str, *, n_threads: Optional[int] = None,
                 native: Optional[bool] = None) -> None:
        ext = os.path.splitext(path)[1].lower()
        if ext not in _KINDS:
            raise ValueError(
                f"unknown vector file extension {ext!r} "
                f"(expected one of {sorted(_KINDS)})")
        self.path = path
        self._kind, self._elem_dtype = _KINDS[ext]
        self.n_threads = n_threads or min(16, os.cpu_count() or 1)
        self._h = None
        self._mm = None
        use_native = native if native is not None else native_available()
        if use_native:
            lib = _load()
            h = lib.vecs_open(path.encode(), self._kind)
            if not h:
                raise ValueError(f"not a valid vecs file: {path}")
            self._lib = lib
            self._h = h
            self.n_rows = int(lib.vecs_rows(h))
            self.dims = int(lib.vecs_dims(h))
        else:
            # numpy fallback: strided view over a memmap
            raw = np.memmap(path, dtype=np.uint8, mode="r")
            if raw.size < 4:
                raise ValueError(f"not a valid vecs file: {path}")
            dims = int(raw[:4].view(np.int32)[0])
            row_bytes = 4 + dims * self._elem_dtype().itemsize
            if dims <= 0 or raw.size % row_bytes:
                raise ValueError(f"not a valid vecs file: {path}")
            self._mm = raw.reshape(-1, row_bytes)
            self.n_rows = self._mm.shape[0]
            self.dims = dims

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n_rows, self.dims)

    def read(self, start: int = 0, count: Optional[int] = None,
             out: Optional[np.ndarray] = None) -> np.ndarray:
        """Read ``count`` rows from ``start`` as f32[count, dims].  ``out``
        (optional, f32 C-contiguous) is filled in place — reusing one
        staging buffer across batches avoids per-batch allocation."""
        if count is None:
            count = self.n_rows - start
        count = max(0, min(count, self.n_rows - start))
        if out is None:
            out = np.empty((count, self.dims), np.float32)
        else:
            if (out.dtype != np.float32 or not out.flags.c_contiguous or
                    out.shape[0] < count or out.shape[1] != self.dims):
                raise ValueError("out must be C-contiguous f32[>=count, dims]")
        if count == 0:
            return out[:0]
        if self._h is not None:
            got = self._lib.vecs_read(
                self._h, start, count,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.n_threads)
            return out[:got]
        # the column slice is non-contiguous (row stride includes the dim
        # header) — compact to contiguous bytes before the dtype view
        block = np.ascontiguousarray(self._mm[start: start + count, 4:])
        out[:count] = block.view(self._elem_dtype).reshape(count, self.dims)
        return out[:count]

    def iter_batches(self, batch: int
                     ) -> Iterator[Tuple[int, np.ndarray]]:
        """Yield (start_row, f32 block) over the whole file, double-buffered
        so the NEXT batch converts while the caller consumes the current one
        (mirrors api.add's upload/insert overlap)."""
        if batch <= 0:
            raise ValueError("batch must be positive")
        bufs = (np.empty((batch, self.dims), np.float32),
                np.empty((batch, self.dims), np.float32))
        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(max_workers=1) as pool:
            nxt = pool.submit(self.read, 0, batch, bufs[0])
            start = 0
            i = 0
            while start < self.n_rows:
                block = nxt.result()
                n_start = start + block.shape[0]
                if n_start < self.n_rows:
                    nxt = pool.submit(self.read, n_start, batch,
                                      bufs[(i + 1) % 2])
                yield start, block
                start = n_start
                i += 1

    def __getitem__(self, key):
        if isinstance(key, slice):
            start, stop, step = key.indices(self.n_rows)
            if step != 1:
                return self.read(start, stop - start)[::step]
            return self.read(start, stop - start)
        if isinstance(key, (int, np.integer)):
            if key < 0:
                key += self.n_rows
            return self.read(int(key), 1)[0]
        raise TypeError(f"unsupported index: {key!r}")

    def __len__(self) -> int:
        return self.n_rows

    def close(self) -> None:
        if self._h is not None:
            self._lib.vecs_close(self._h)
            self._h = None
        self._mm = None

    def __enter__(self) -> "VecsFile":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def write_vecs(path: str, rows: np.ndarray) -> None:
    """Write rows in the *vecs layout matching the extension (test/bench
    helper; the big public corpora already ship in this format)."""
    ext = os.path.splitext(path)[1].lower()
    if ext not in _KINDS:
        raise ValueError(f"unknown vector file extension {ext!r}")
    _, dt = _KINDS[ext]
    rows = np.ascontiguousarray(rows, dt)
    n, d = rows.shape
    hdr = np.full((n, 1), d, np.int32)
    with open(path, "wb") as f:
        # interleave [dim][row] without a python loop: view rows as bytes
        rec = np.concatenate([hdr.view(np.uint8),
                              rows.view(np.uint8).reshape(n, -1)], axis=1)
        rec.tofile(f)
