"""Product quantization — compressed vector codes for memory-bound serving.

The reference stores full f32 coordinates per node (embedding.c:224-231)
and has no compressed form at all; at TPU serving scale the traversal's
HBM footprint is the binding constraint (BASELINE.md profiling: the graph
walk is gather-TRANSACTION-bound, and packed neighbor records — the fix —
cost maxM * D bytes/node, 41GB at 10M x 128d x maxM=32 in int8).  PQ cuts
the per-dimension byte cost D/G-fold: D dims split into G contiguous
groups, each group encoded as the index of its nearest centroid among 256
learned per-group centroids (one byte per group).

TPU-native ADC: classic CPU PQ scans with a per-query lookup table
(sum over groups of LUT[g, code[g]] — scalar gathers).  Here decoding is a
table GATHER into registers followed by the standard MXU/VPU distance on
the reconstructed rows: the codebook is ~256*D floats (128KB at D=128, it
lives in VMEM), so "dequantize + dense distance" costs the same HBM bytes
as the LUT walk (just the codes) while keeping every distance on the
matrix/vector units — the same move the int8 exact8 sweep makes
(core/build._exact_candidates), one compression level further.

Training is plain per-group Lloyd k-means, all groups batched into one
[G, n, sub] x [G, 256, sub] MXU program per iteration.  L2 codebooks are
used for every metric: encode/decode is a pure compression layer, and the
serving paths rerank surfaced candidates with exact full-precision
distances (core/search._search_one), so metric semantics stay with the
reference's forms (distfunc.c:11-40).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

N_CENTROIDS = 256  # one byte per group — the PQ standard


def _group_view(vectors: jax.Array, groups: int) -> jax.Array:
    """[N, D] -> [G, N, D/G] (contiguous dim groups)."""
    n, d = vectors.shape
    if d % groups:
        raise ValueError(f"dims {d} not divisible by pq groups {groups}")
    return jnp.moveaxis(vectors.reshape(n, groups, d // groups), 1, 0)


@functools.partial(jax.jit, static_argnames=("groups", "iters"))
def train_pq(sample: jax.Array, *, groups: int, iters: int = 12,
             seed: int = 0) -> jax.Array:
    """Learn per-group codebooks with batched Lloyd k-means.

    Args:
      sample: f32[n, D] training rows (a few 10k-100k suffice; callers
              stride-sample large corpora).
      groups: G — number of contiguous dim groups (D % G == 0).
      iters:  Lloyd iterations (random-row init; empty clusters keep their
              previous centroid, the standard degenerate-case choice).
      seed:   PRNG seed for the init draw.

    Returns codebook f32[G, 256, D/G].
    """
    x = _group_view(sample.astype(jnp.float32), groups)   # [G, n, sub]
    n = x.shape[1]
    key = jax.random.PRNGKey(seed)
    # independent random-row init per group (sampling WITH replacement is
    # fine: duplicate centroids separate after one iteration unless the
    # data has < 256 distinct rows, in which case duplicates are harmless)
    init_idx = jax.random.randint(key, (groups, N_CENTROIDS), 0, n)
    cb = jnp.take_along_axis(x, init_idx[:, :, None], axis=1)  # [G, 256, sub]

    x_sq = jnp.sum(x * x, axis=2)                          # [G, n]

    def lloyd(_, cb):
        # assignment: argmin ||x - c||^2 = x2 - 2xc + c2, batched matmul
        xc = jnp.einsum("gns,gcs->gnc", x, cb,
                        preferred_element_type=jnp.float32)
        c_sq = jnp.sum(cb * cb, axis=2)                    # [G, 256]
        assign = jnp.argmin(x_sq[:, :, None] - 2.0 * xc + c_sq[:, None, :],
                            axis=2)                        # [G, n]
        # update: per-(group, centroid) mean via one-hot matmul (MXU)
        onehot = jax.nn.one_hot(assign, N_CENTROIDS, dtype=jnp.float32)
        sums = jnp.einsum("gnc,gns->gcs", onehot, x,
                          preferred_element_type=jnp.float32)
        counts = jnp.sum(onehot, axis=1)                   # [G, 256]
        new_cb = sums / jnp.maximum(counts, 1.0)[:, :, None]
        return jnp.where((counts > 0)[:, :, None], new_cb, cb)

    return jax.lax.fori_loop(0, iters, lloyd, cb)


def encode_block(vectors: jax.Array, codebook: jax.Array) -> jax.Array:
    """Nearest-centroid codes for one block: f32[n, D] -> uint8[n, G].
    Un-jitted core (also used inside chunked loops / shard_map)."""
    groups = codebook.shape[0]
    x = _group_view(vectors.astype(jnp.float32), groups)   # [G, n, sub]
    xc = jnp.einsum("gns,gcs->gnc", x, codebook,
                    preferred_element_type=jnp.float32)
    c_sq = jnp.sum(codebook * codebook, axis=2)
    # x_sq is constant across centroids — argmin doesn't need it
    assign = jnp.argmin(c_sq[:, None, :] - 2.0 * xc, axis=2)  # [G, n]
    return jnp.moveaxis(assign, 0, 1).astype(jnp.uint8)       # [n, G]


@functools.partial(jax.jit, static_argnames=("chunk",))
def pq_encode(vectors: jax.Array, codebook: jax.Array,
              rotation: jax.Array | None = None, *,
              chunk: int = 32768) -> jax.Array:
    """Chunked full-corpus encode: f32[N, D] -> uint8[N, G].  The [n, 256]
    score tile is the ephemeral cost; chunking bounds it regardless of N.
    ``rotation`` (OPQ) is applied per chunk, fused into the encode — no
    corpus-sized rotated copy ever materializes."""
    n = vectors.shape[0]
    groups = codebook.shape[0]
    if n <= chunk:
        x = vectors if rotation is None else (
            vectors.astype(jnp.float32) @ rotation)
        return encode_block(x, codebook)
    codes = jnp.zeros((n, groups), jnp.uint8)
    n_chunks = -(-n // chunk)

    def body(c, codes):
        start = jnp.minimum(c * chunk, n - chunk)
        block = jax.lax.dynamic_slice_in_dim(vectors, start, chunk, axis=0)
        if rotation is not None:
            block = block.astype(jnp.float32) @ rotation
        # overlapping rows from the clamped last chunk re-encode
        # identically, so the overwrite is a no-op
        return jax.lax.dynamic_update_slice(
            codes, encode_block(block, codebook), (start, 0))

    return jax.lax.fori_loop(0, n_chunks, body, codes)


@functools.partial(jax.jit, static_argnames=("chunk",))
def pack_pq_records(codes: jax.Array, links: jax.Array, *,
                    chunk: int = 65536) -> jax.Array:
    """Gather neighbor codes into FLAT packed records:
    uint8[cap, maxM * G], where row i's bytes [j*G:(j+1)*G] are the code of
    links[i, j].

    Flat, not [cap, maxM, G]: TPU arrays tile the minor dim to 128 lanes,
    so a G=16 minor dim would pad the records 8x in HBM (the 10M x 128d
    records ballooned from 5.1GB to 20.5GB and OOM'd — measured).  maxM*G
    is 128-aligned for every sane config, and the traversal reshapes the
    gathered [T, maxM*G] block back to [T*maxM, G] in registers
    (core/search._search_one handles both layouts identically).  Chunked
    over rows so the padded [chunk, maxM, G] gather intermediate stays
    bounded regardless of capacity."""
    cap, max_m = links.shape
    groups = codes.shape[1]
    chunk = min(chunk, cap)
    out = jnp.zeros((cap, max_m * groups), jnp.uint8)
    n_chunks = -(-cap // chunk)

    def body(c, out):
        start = jnp.minimum(c * chunk, cap - chunk)
        blk = jax.lax.dynamic_slice_in_dim(links, start, chunk, axis=0)
        rec = codes[jnp.maximum(blk, 0)].reshape(chunk, max_m * groups)
        return jax.lax.dynamic_update_slice(out, rec, (start, 0))

    return jax.lax.fori_loop(0, n_chunks, body, out)


@functools.partial(jax.jit, static_argnames=("groups", "iters", "pq_iters"))
def train_opq(sample: jax.Array, *, groups: int, iters: int = 8,
              pq_iters: int = 12, seed: int = 0):
    """OPQ-NP (Ge et al., CVPR'13): learn an orthogonal rotation R that
    redistributes variance/correlation across the dim groups before PQ —
    alternating (1) k-means in the rotated space with (2) the Procrustes
    solve min_R ||X R - decode(encode(X R))||_F over orthogonal R.

    Distances are rotation-invariant for L2/dot/cosine, so serving rotates
    the QUERY once (q @ R) and compares against decoded rows that already
    live in the rotated space; the exact rerank still runs in the original
    space (core/search._search_one).  Manhattan is NOT rotation-invariant
    — callers must not enable OPQ for it (api.py guards).

    Returns (rotation f32[D, D], codebook f32[G, 256, D/G]).
    """
    x = sample.astype(jnp.float32)
    d = x.shape[1]
    rot = jnp.eye(d, dtype=jnp.float32)

    def step(it, rot):
        y = x @ rot
        cb = train_pq(y, groups=groups, iters=4, seed=seed)
        yhat = pq_decode(encode_block(y, cb), cb)
        # Procrustes: argmin_R ||X R - Yhat||_F = U V^T, svd(X^T Yhat)
        u, _, vt = jnp.linalg.svd(x.T @ yhat, full_matrices=False)
        return u @ vt

    rot = jax.lax.fori_loop(0, iters, step, rot)
    cb = train_pq(x @ rot, groups=groups, iters=pq_iters, seed=seed)
    return rot, cb


def pq_decode(codes: jax.Array, codebook: jax.Array,
              dtype=jnp.float32) -> jax.Array:
    """Reconstruct rows from codes: uint8[..., G] -> dtype[..., D].
    Exact table-gather decode — the reference form (used by training and
    tests).  NOT for hot loops: a [n, G] two-level gather scalarizes on
    TPU (measured: the PQ traversal ran 10x slower than int8 packed with
    per-hop decode dominating, /tmp smoke 2026-08-19); serving paths use
    pq_decode_mxu below."""
    groups, _, sub = codebook.shape
    flat = codes.reshape(-1, groups).astype(jnp.int32)
    subvecs = codebook.astype(dtype)[
        jnp.arange(groups)[None, :], flat]                 # [n, G, sub]
    return subvecs.reshape(*codes.shape[:-1], groups * sub)


def pq_decode_mxu(codes: jax.Array, codebook: jax.Array,
                  dtype=None) -> jax.Array:
    """MXU decode for hot loops: one-hot(codes) einsum'd against the
    codebook — XLA fuses the one-hot generation into the dot, so nothing
    [n, G, 256]-sized ever reaches HBM (measured 1.4ms vs the gather's
    2.7ms at [262k, 16] standalone, and ~10x inside the vmapped traversal
    loop where the gather lowers far worse).  bf16 codebook rounding
    (<= 0.4% relative) is noise against PQ quantization error, and every
    consumer exact-reranks surfaced candidates in f32.  Returns f32.

    dtype resolves per backend at trace time: bf16 on TPU (MXU-native),
    f32 elsewhere — the CPU executor rejects BF16 x BF16 = F32 dots and
    has no MXU to feed anyway."""
    if dtype is None:
        dtype = (jnp.bfloat16 if jax.default_backend() not in ("cpu",)
                 else jnp.float32)
    groups, _, sub = codebook.shape
    flat = codes.reshape(-1, groups).astype(jnp.int32)
    oh = jax.nn.one_hot(flat, N_CENTROIDS, dtype=dtype)    # [n, G, 256]
    out = jnp.einsum("ngc,gcs->ngs", oh, codebook.astype(dtype),
                     preferred_element_type=jnp.float32)
    return out.reshape(*codes.shape[:-1], groups * sub)
