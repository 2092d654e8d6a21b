"""Dataset IO: .fvecs / .ivecs / .bvecs readers and writers.

The standard TexMex/BIGANN formats used by the BASELINE.md datasets
(SIFT1M, GIST1M, Deep*): each vector is stored as a little-endian int32
dimension count followed by `dim` elements (float32 / int32 / uint8).
Memory-maps for large files; supports bounded reads for streaming builds.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

_DTYPES = {".fvecs": np.float32, ".ivecs": np.int32, ".bvecs": np.uint8}


def _vec_format(path: str):
    ext = os.path.splitext(path)[1]
    if ext not in _DTYPES:
        raise ValueError(f"unknown vector-file extension: {path}")
    return _DTYPES[ext]


def read_vecs(path: str, count: Optional[int] = None,
              offset: int = 0) -> np.ndarray:
    """Read vectors from an .fvecs/.ivecs/.bvecs file.

    Args:
      path:   file path (extension selects the element type).
      count:  max vectors to read (default: all).
      offset: vectors to skip from the start.

    Returns an [n, dim] array of the file's element type.
    """
    dtype = _vec_format(path)
    elem = np.dtype(dtype).itemsize
    with open(path, "rb") as f:
        head = np.fromfile(f, dtype=np.int32, count=1)
        if head.size == 0:
            return np.zeros((0, 0), dtype)
        dim = int(head[0])
        if dim <= 0 or dim > (1 << 20):
            raise ValueError(f"corrupt vector file (dim={dim}): {path}")
    record = 4 + dim * elem
    size = os.path.getsize(path)
    if size % record != 0:
        raise ValueError(
            f"file size {size} is not a multiple of record size {record}"
            f" (dim={dim}): {path}")
    total = size // record
    start = min(offset, total)
    n = total - start if count is None else min(count, total - start)

    mm = np.memmap(path, dtype=np.uint8, mode="r",
                   offset=start * record, shape=(n * record,))
    raw = np.asarray(mm).reshape(n, record)
    dims = raw[:, :4].copy().view(np.int32).reshape(-1)
    if not (dims == dim).all():
        raise ValueError(f"inconsistent dims in {path}")
    return raw[:, 4:].copy().view(dtype).reshape(n, dim)


def write_vecs(path: str, vectors: np.ndarray) -> None:
    """Write an [n, dim] array in .fvecs/.ivecs/.bvecs format."""
    dtype = _vec_format(path)
    vectors = np.ascontiguousarray(vectors, dtype)
    n, dim = vectors.shape
    head = np.full((n, 1), dim, np.int32)
    with open(path, "wb") as f:
        out = np.concatenate(
            [head.view(np.uint8).reshape(n, 4),
             vectors.view(np.uint8).reshape(n, -1)], axis=1)
        out.tofile(f)


def synthetic_clustered(n: int, dims: int, n_centers: int = 1000,
                        center_scale: float = 4.0, seed: int = 0,
                        n_queries: int = 0):
    """Reproducible SIFT-like clustered synthetic corpus (the zero-egress
    stand-in for the BASELINE datasets): a mixture of Gaussians, queries
    drawn from the same mixture."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=center_scale,
                         size=(n_centers, dims)).astype(np.float32)
    pts = (centers[rng.integers(0, n_centers, n)] +
           rng.normal(size=(n, dims)).astype(np.float32))
    if n_queries:
        qs = (centers[rng.integers(0, n_centers, n_queries)] +
              rng.normal(size=(n_queries, dims)).astype(np.float32))
        return pts.astype(np.float32), qs.astype(np.float32)
    return pts.astype(np.float32)
