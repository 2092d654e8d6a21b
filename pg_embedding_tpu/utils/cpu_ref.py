"""ctypes wrapper for the native CPU reference engine (csrc/hnsw_ref.cpp).

Compiles on first use (g++ -O3 -march=native) and caches the shared object
under csrc/build/.  Used by bench.py as the CPU baseline and by tests as a
fast large-scale oracle.  Falls back gracefully (raises RuntimeError) when no
toolchain is available — the pure-Python refimpl covers small-scale parity.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "csrc", "hnsw_ref.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "csrc", "build")
_SO = os.path.join(_BUILD_DIR, "libhnsw_ref.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _compile() -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", str(e))
        raise RuntimeError(f"failed to build CPU reference lib: {detail}")
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
        lib.hnsw_ref_create.restype = ctypes.c_void_p
        lib.hnsw_ref_create.argtypes = [ctypes.c_int] * 4
        lib.hnsw_ref_free.argtypes = [ctypes.c_void_p]
        lib.hnsw_ref_add.restype = ctypes.c_int
        lib.hnsw_ref_add.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_uint64]
        lib.hnsw_ref_build.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_float),
                                       ctypes.POINTER(ctypes.c_uint64),
                                       ctypes.c_int]
        lib.hnsw_ref_search.restype = ctypes.c_int
        lib.hnsw_ref_search.argtypes = [ctypes.c_void_p,
                                        ctypes.POINTER(ctypes.c_float),
                                        ctypes.c_int,
                                        ctypes.POINTER(ctypes.c_uint64),
                                        ctypes.POINTER(ctypes.c_float)]
        lib.hnsw_ref_n_nodes.restype = ctypes.c_int
        lib.hnsw_ref_n_nodes.argtypes = [ctypes.c_void_p]
        lib.hnsw_ref_delete_label.restype = ctypes.c_int
        lib.hnsw_ref_delete_label.argtypes = [ctypes.c_void_p,
                                              ctypes.c_uint64]
        lib.hnsw_ref_get_links.restype = ctypes.c_int
        lib.hnsw_ref_get_links.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                           ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return lib


def available() -> bool:
    try:
        _load()
        return True
    except RuntimeError:
        return False


class CpuRefIndex:
    """Native CPU flat-NSW index with pg_embedding algorithm semantics."""

    def __init__(self, dims: int, m: int = 100, ef_construction: int = 16,
                 metric: int = 0) -> None:
        self._lib = _load()
        self._h = self._lib.hnsw_ref_create(dims, m, ef_construction,
                                            int(metric))
        self.dims = dims
        self.m = m
        self.max_m = 2 * m

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.hnsw_ref_free(self._h)
            self._h = None

    def build(self, pts: np.ndarray, labels: Optional[np.ndarray] = None):
        pts = np.ascontiguousarray(pts, np.float32)
        n = pts.shape[0]
        if labels is None:
            labels = np.arange(n, dtype=np.uint64)
        labels = np.ascontiguousarray(labels, np.uint64)
        self._lib.hnsw_ref_build(
            self._h, pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), n)

    def add(self, pt: np.ndarray, label: int) -> int:
        pt = np.ascontiguousarray(pt, np.float32)
        return self._lib.hnsw_ref_add(
            self._h, pt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            int(label))

    def search(self, q: np.ndarray, ef: int) -> Tuple[np.ndarray, np.ndarray]:
        q = np.ascontiguousarray(q, np.float32)
        out_l = np.zeros(ef, np.uint64)
        out_d = np.zeros(ef, np.float32)
        cnt = self._lib.hnsw_ref_search(
            self._h, q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), ef,
            out_l.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            out_d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out_d[:cnt], out_l[:cnt]

    def delete_label(self, label: int) -> int:
        return self._lib.hnsw_ref_delete_label(self._h, int(label))

    def links(self, node: int) -> np.ndarray:
        out = np.zeros(self.max_m, np.int32)
        cnt = self._lib.hnsw_ref_get_links(
            self._h, node, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if cnt < 0:
            raise IndexError(node)
        return out[:cnt]

    @property
    def n_nodes(self) -> int:
        return self._lib.hnsw_ref_n_nodes(self._h)
