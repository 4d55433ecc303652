"""Fused similarity + top-k — the retrieval serving hot path.

The reference splits this across devices and libraries: GPU encode, then a
CPU NumPy matmul + full ``argsort`` per query (``src/clip/eval/metrics.py:30-34``,
``evaluator.py:115-143``), and at serving time a downloaded retriever does the
cosine scoring (``src/clip/clip_retrieval.py:26-37``). Here the whole path is
one device program:

    scores = alpha * (Q @ IMG^T) + (1 - alpha) * (Q @ TXT^T); top-k(scores)

Three implementations:

- ``similarity_topk_xla``   — jnp matmuls + ``lax.top_k`` (reference path,
  still fully on device; used on CPU and as the numerical oracle).
- ``fused_similarity_topk`` — Pallas TPU kernel: streams corpus tiles
  (both towers) through VMEM once, blends on the fly, and maintains a
  running top-k in VMEM scratch — the [Q, N] score matrix never touches HBM.
- ``sharded_similarity_topk`` — ``shard_map`` over a corpus-sharded mesh:
  local fused top-k per device, then an all-gather of the tiny [Q, k]
  candidates and a final merge. This is how a 43k (or 43M) corpus scales
  across chips: the heavy traffic stays local, only k winners ride ICI.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def alpha_column(alpha, n_queries: int) -> jax.Array:
    """Normalize a blend weight into an f32 ``[Q, 1]`` column.

    ``alpha`` may be a scalar (one blend for the whole batch — the
    reference's semantics) or a length-``Q`` sequence (per-query blends in
    ONE device program). Alpha is a RUNTIME operand throughout this module,
    never a compile-time constant: changing it re-executes, not re-compiles
    (on a remote-compile backend a fresh compile per alpha costs minutes).
    """
    a = jnp.asarray(alpha, jnp.float32)
    if a.ndim == 0:
        return jnp.full((n_queries, 1), a, jnp.float32)
    a = a.reshape(-1, 1)
    if a.shape[0] != n_queries:
        raise ValueError(f"alpha length {a.shape[0]} != query count {n_queries}")
    return a


def prefix_normalize(x: jax.Array, dim: int) -> jax.Array:
    """First ``dim`` coordinates, re-L2-normalized (f32 norm math).

    The Matryoshka serving primitive: for MRL-trained embeddings the prefix
    is itself a valid embedding, so candidate scan cost/HBM scales with
    ``dim`` while the host rerank restores full-dim scores. Normalizing a
    prefix of a normalized vector equals normalizing the prefix of the raw
    vector (the row scale cancels), so this composes with already-normalized
    stores. Zero rows (capacity padding) stay zero (guarded divide).
    """
    if not 0 < dim <= x.shape[-1]:
        raise ValueError(f"truncate dim {dim} not in 1..{x.shape[-1]}")
    t = x[..., :dim]
    n = jnp.linalg.norm(t.astype(jnp.float32), axis=-1, keepdims=True)
    return (t.astype(jnp.float32) / jnp.maximum(n, 1e-12)).astype(x.dtype)


def prefix_normalize_host(x, dim: int):
    """NumPy twin of :func:`prefix_normalize` for host-side corpus staging
    (the full-dim corpus never uploads when serving truncated)."""
    x = np.asarray(x)
    if not 0 < dim <= x.shape[-1]:
        raise ValueError(f"truncate dim {dim} not in 1..{x.shape[-1]}")
    t = x[..., :dim].astype(np.float32)
    n = np.linalg.norm(t, axis=-1, keepdims=True)
    return t / np.maximum(n, 1e-12)


# ---------------------------------------------------------------------------
# XLA reference path
# ---------------------------------------------------------------------------


def blended_scores(
    queries: jax.Array,
    img_emb: jax.Array,
    txt_emb: jax.Array,
    alpha,
    queries_txt: Optional[jax.Array] = None,
) -> jax.Array:
    """[Q, N] blended similarity: alpha * T2I + (1 - alpha) * T2T.

    ``alpha``: scalar or per-query (see :func:`alpha_column`);
    ``queries_txt`` optionally scores the text tower with a DISTINCT query
    embedding (fusion-head style serving) — defaults to ``queries``."""
    a = alpha_column(alpha, queries.shape[0])
    q_txt = queries if queries_txt is None else queries_txt
    t2i = jnp.dot(queries, img_emb.T, preferred_element_type=jnp.float32)
    t2t = jnp.dot(q_txt, txt_emb.T, preferred_element_type=jnp.float32)
    return a * t2i + (1.0 - a) * t2t


@functools.partial(jax.jit, static_argnames=("k",))
def similarity_topk_xla(
    queries: jax.Array,
    img_emb: jax.Array,
    txt_emb: jax.Array,
    k: int,
    alpha: float = 0.5,
    queries_txt: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    scores = blended_scores(queries, img_emb, txt_emb, alpha, queries_txt)
    return jax.lax.top_k(scores, k)


@functools.partial(jax.jit, static_argnames=("k", "segment"))
def similarity_topk_segmented(
    queries: jax.Array,
    img_emb: jax.Array,
    txt_emb: jax.Array,
    k: int,
    alpha: float = 0.5,
    segment: int = 4096,
    queries_txt: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact two-stage top-k: per-segment top-k, then a merge top-k.

    Lifts the fused kernel's k<=128 cap (its argmax-round merge is O(k) per
    tile): sorting cost drops from one top-k over N to ``n_seg`` independent
    top-min(k, seg) selections over ``seg`` plus one merge over
    ``n_seg * min(k, seg)``. Exact for every k: a segment holds only ``seg``
    elements, so keeping min(k, seg) of them loses nothing.
    """
    scores = blended_scores(queries, img_emb, txt_emb, alpha, queries_txt)  # [Q, N]
    return _segmented_topk_from_scores(scores, k, segment)


def _segmented_topk_from_scores(scores: jax.Array, k: int, segment: int) -> Tuple[jax.Array, jax.Array]:
    qn, n = scores.shape
    k = min(k, n)
    seg = min(segment, n)
    pad = (-n) % seg
    if pad:
        scores = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=_NEG_INF)
    n_seg = scores.shape[1] // seg
    k_local = min(k, seg)
    v1, i1 = jax.lax.top_k(scores.reshape(qn, n_seg, seg), k_local)
    i1 = i1 + (jnp.arange(n_seg, dtype=jnp.int32) * seg)[None, :, None]
    v2, pos = jax.lax.top_k(v1.reshape(qn, n_seg * k_local), k)
    idx = jnp.take_along_axis(i1.reshape(qn, n_seg * k_local), pos, axis=1)
    return v2, idx.astype(jnp.int32)


# ---------------------------------------------------------------------------
# int8 corpus packing
# ---------------------------------------------------------------------------


def quantize_corpus(emb: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-row int8: ``emb ~= q * scale``.

    Halves the corpus HBM footprint AND the top-k kernel's streaming
    traffic (the kernel is bandwidth-bound); per-row scales make the
    dequantization exact up to one rounding step per element. Returns
    ``(q int8 [N, D], scale f32 [N, 1])``.
    """
    emb = jnp.asarray(emb, jnp.float32)
    scale = jnp.max(jnp.abs(emb), axis=1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    return jnp.round(emb / scale).astype(jnp.int8), scale


def quantize_corpus_host(
    emb, mesh: Optional[Mesh] = None, axis: str = "data"
) -> Tuple[jax.Array, jax.Array]:
    """Host-side (NumPy) variant of :func:`quantize_corpus`.

    Quantizing on host means the full f32 corpus never touches device HBM —
    only the int8 buffers and scales are uploaded. That matters precisely
    when int8 packing is the point: a corpus sized to fit as int8 would OOM
    if staged on device in f32 first. With ``mesh``, the int8 buffers and
    scales upload directly row-sharded over ``axis`` (each device receives
    only its corpus shard).
    """
    import numpy as np

    emb = np.asarray(emb, np.float32)
    scale = np.maximum(np.max(np.abs(emb), axis=1, keepdims=True) / 127.0, 1e-12)
    q = np.round(emb / scale).astype(np.int8)
    scale = scale.astype(np.float32)
    if mesh is not None:
        sharding = NamedSharding(mesh, P(axis, None))
        return jax.device_put(q, sharding), jax.device_put(scale, sharding)
    return jnp.asarray(q), jnp.asarray(scale)


def dequantize_corpus(q: jax.Array, scale: jax.Array, dtype=jnp.float32) -> jax.Array:
    return (q.astype(jnp.float32) * scale).astype(dtype)


def random_rotation(dim: int, seed: int = 0):
    """Seeded random orthonormal rotation ``R [dim, dim]`` (f32 NumPy).

    Rotating both corpus rows and query embeddings by the same R leaves
    exact inner products unchanged (``(qR)(cR)^T = qc^T``) but spreads each
    row's energy evenly across coordinates, so symmetric per-row int4/int8
    grids and sign-bit sketches lose far less recall on anisotropic
    embeddings (real CLIP embeddings concentrate energy in few directions) —
    the classic random-rotation trick from LSH / OPQ (Ji et al.; Gong et
    al.). QR of a Gaussian with the R-diagonal sign fix makes the draw
    Haar-uniform and deterministic per seed.
    """
    import numpy as np

    rng = np.random.default_rng(np.uint64(seed) + 0x5EED)
    g = rng.standard_normal((dim, dim))
    q, r = np.linalg.qr(g)
    return (q * np.sign(np.diag(r))).astype(np.float32)


def blended_scores_q8(
    queries: jax.Array,
    img_q: jax.Array,
    img_scale: jax.Array,
    txt_q: jax.Array,
    txt_scale: jax.Array,
    alpha,
    queries_txt: Optional[jax.Array] = None,
) -> jax.Array:
    """[Q, N] blended scores over an int8 corpus, op-order-matched to the
    Pallas q8 kernel: raw dot at the query dtype (int8 -> bf16 conversion is
    exact), then per-corpus-row scales applied to the f32 score columns.
    ``queries_txt`` optionally scores the text tower with a distinct query
    embedding."""
    a = alpha_column(alpha, queries.shape[0])
    q_txt = queries if queries_txt is None else queries_txt
    img = img_q.astype(queries.dtype)
    txt = txt_q.astype(q_txt.dtype)
    t2i = jnp.dot(queries, img.T, preferred_element_type=jnp.float32)
    t2t = jnp.dot(q_txt, txt.T, preferred_element_type=jnp.float32)
    img_s = jnp.asarray(img_scale, jnp.float32).reshape(1, -1)
    txt_s = jnp.asarray(txt_scale, jnp.float32).reshape(1, -1)
    return a * (t2i * img_s) + (1.0 - a) * (t2t * txt_s)


@functools.partial(jax.jit, static_argnames=("k",))
def similarity_topk_xla_q8(
    queries: jax.Array,
    img_q: jax.Array,
    img_scale: jax.Array,
    txt_q: jax.Array,
    txt_scale: jax.Array,
    k: int,
    alpha: float = 0.5,
    queries_txt: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """XLA path over an int8 corpus (CPU serving / use_pallas=False)."""
    scores = blended_scores_q8(
        queries, img_q, img_scale, txt_q, txt_scale, alpha, queries_txt
    )
    return jax.lax.top_k(scores, k)


# ---------------------------------------------------------------------------
# int4 corpus packing (two values per byte — 4x corpus capacity per chip)
# ---------------------------------------------------------------------------
#
# Plane layout: packed byte column j holds dim j in the LOW nibble and dim
# j + D/2 in the HIGH nibble (both 4-bit two's complement), so unpacking is
# two contiguous [N, D/2] planes — no lane interleaving, which Mosaic cannot
# vectorize. Scoring splits the query the same way (q_lo = q[:, :D/2],
# q_hi = q[:, D/2:]): q . row == q_lo . lo + q_hi . hi, two half-width
# matmuls with the SAME total MACs as one full-width one. Per-row symmetric
# scales (max|x| / 7) dequantize exactly like the int8 path — only the
# original 4-bit rounding is lossy (~16x coarser than int8: a capacity/
# recall trade documented in tests/test_similarity_q4.py).


def quantize_corpus_host_q4(
    emb, mesh: Optional[Mesh] = None, axis: str = "data"
) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-row int4, nibble-packed: ``emb ~= unpack(q4) * scale``.

    Returns ``(packed int8 [N, D/2], scale f32 [N, 1])``. Quarter the f32
    corpus footprint (half of int8): the capacity mode for corpora that do
    not fit as int8. ``D`` must be even. Host-side like
    :func:`quantize_corpus_host` so the f32 corpus never stages in HBM;
    ``mesh`` uploads row-sharded over ``axis``.
    """
    import numpy as np

    emb = np.asarray(emb, np.float32)
    n, d = emb.shape
    if d % 2:
        raise ValueError(f"int4 packing needs an even embedding dim, got {d}")
    scale = np.maximum(np.max(np.abs(emb), axis=1, keepdims=True) / 7.0, 1e-12)
    q = np.clip(np.round(emb / scale), -8, 7).astype(np.int8)
    lo, hi = q[:, : d // 2], q[:, d // 2 :]
    packed = ((hi.astype(np.uint8) << 4) | (lo.astype(np.uint8) & 0xF)).view(np.int8)
    scale = scale.astype(np.float32)
    if mesh is not None:
        sharding = NamedSharding(mesh, P(axis, None))
        return jax.device_put(packed, sharding), jax.device_put(scale, sharding)
    return jnp.asarray(packed), jnp.asarray(scale)


def _unpack_q4(packed: jax.Array, dtype) -> Tuple[jax.Array, jax.Array]:
    """[N, D/2] packed int8 -> (lo, hi) planes in ``dtype`` (exact: 4-bit
    values fit every float mantissa). Shifts run in int32 (Mosaic-friendly);
    the low nibble sign-extends via the <<28 >>28 arithmetic-shift pair."""
    b = packed.astype(jnp.int32)
    hi = b >> 4  # b is sign-extended from int8, so this is [-8, 7]
    lo = (b << 28) >> 28
    return lo.astype(dtype), hi.astype(dtype)


def rerank_scores_host(queries, image, text, idx, alpha: float):
    """Exact f32 host rescore of fetched candidates — the one shared
    implementation of the two-tier rerank semantics (serving path
    ``CLIPRetrieval._rerank_host`` and the quality sweep measure it with
    the same code). ``queries`` [Q, D], ``image``/``text`` [N, D] f32 host
    rows, ``idx`` [Q, R] candidate rows (−1 = ann sentinel, masked to
    −inf). Returns ``(scores, idx)`` sorted descending with stable ties.
    """
    import os

    import numpy as np

    queries = np.asarray(queries, np.float32)
    idx = np.asarray(idx)
    s = None
    if os.environ.get("KEMR_NATIVE_RERANK"):
        # opt-in native single-pass kernel (native/rerank.cpp): ctypes
        # releases the GIL for the WHOLE rescore, so concurrent server
        # threads overlap on multi-core hosts. Single-threaded it measured
        # slightly SLOWER than the BLAS loop below (64 vs 49 ms at
        # [256, 80, 768] interleaved medians) — hence opt-in, not default.
        from ..native.rerank_wrapper import rerank_scores_native

        s = rerank_scores_native(
            queries, np.asarray(image), np.asarray(text), idx, alpha
        )
    if s is None:
        # per-query row gathers + BLAS matvec: a [R, D] slice stays
        # cache-resident; the old one-shot [Q, R, D] einsum gather (tens of
        # MB per tower) measured ~2.6x slower at serving shapes
        a = np.broadcast_to(
            np.asarray(alpha, np.float32).reshape(-1), (queries.shape[0],)
        )
        image = np.asarray(image)
        text = np.asarray(text)
        safe = np.maximum(idx, 0)
        s = np.empty(idx.shape, np.float32)
        for q in range(idx.shape[0]):
            rows = safe[q]
            s[q] = a[q] * (image[rows] @ queries[q]) + (1.0 - a[q]) * (
                text[rows] @ queries[q]
            )
        s = np.where(idx >= 0, s, -np.inf).astype(np.float32)
    order = np.argsort(-s, axis=1, kind="stable")
    return np.take_along_axis(s, order, 1), np.take_along_axis(idx, order, 1)


def dequantize_corpus_q4(packed: jax.Array, scale: jax.Array, dtype=jnp.float32) -> jax.Array:
    lo, hi = _unpack_q4(packed, jnp.float32)
    return (jnp.concatenate([lo, hi], axis=1) * scale).astype(dtype)


def blended_scores_q4(
    queries: jax.Array,
    img_p: jax.Array,
    img_scale: jax.Array,
    txt_p: jax.Array,
    txt_scale: jax.Array,
    alpha,
    queries_txt: Optional[jax.Array] = None,
) -> jax.Array:
    """[Q, N] blended scores over a nibble-packed int4 corpus, op-order-
    matched to the Pallas q4 kernel: unpack planes to the query dtype, one
    half-width dot per plane, per-row scales on the f32 score columns.
    ``queries_txt`` optionally scores the text tower with a distinct query
    embedding."""
    a = alpha_column(alpha, queries.shape[0])
    q_txt = queries if queries_txt is None else queries_txt
    d2 = img_p.shape[1]

    def plane_scores(q, packed):
        lo, hi = _unpack_q4(packed, q.dtype)
        return jnp.dot(q[:, :d2], lo.T, preferred_element_type=jnp.float32) + jnp.dot(
            q[:, d2:], hi.T, preferred_element_type=jnp.float32
        )

    t2i = plane_scores(queries, img_p)
    t2t = plane_scores(q_txt, txt_p)
    img_s = jnp.asarray(img_scale, jnp.float32).reshape(1, -1)
    txt_s = jnp.asarray(txt_scale, jnp.float32).reshape(1, -1)
    return a * (t2i * img_s) + (1.0 - a) * (t2t * txt_s)


@functools.partial(jax.jit, static_argnames=("k",))
def similarity_topk_xla_q4(
    queries: jax.Array,
    img_p: jax.Array,
    img_scale: jax.Array,
    txt_p: jax.Array,
    txt_scale: jax.Array,
    k: int,
    alpha: float = 0.5,
    queries_txt: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """XLA path over an int4 corpus (CPU serving / use_pallas=False)."""
    scores = blended_scores_q4(
        queries, img_p, img_scale, txt_p, txt_scale, alpha, queries_txt
    )
    return jax.lax.top_k(scores, k)


# ---------------------------------------------------------------------------
# Masked (filtered) search — uuid allow/deny lists as a runtime operand
# ---------------------------------------------------------------------------
#
# The reference has no filtered retrieval at all (its only "constraint" is
# the post-hoc SPARQL score bonus, ``src/retrieval.py:23-76``); production
# retrieval needs hard filters (tenant visibility, metadata predicates,
# knowledge-constrained search). The mask is a RUNTIME operand like alpha:
# a bool [N] row mask (shared across the batch) or [Q, N] (per-query) —
# changing the filter re-executes the compiled program, never re-compiles.
# Masked-out rows score -inf, and their top-k slots come back with the
# ann-style ``-1`` index sentinel so downstream uuid mapping skips them.
# Selection runs through the segmented exact top-k over the [Q, N] score
# matrix (the occasional-filter path does not need the streaming kernel;
# at 43k rows the matmul still dominates).


def normalize_mask(mask, n_queries: int, n_rows: int) -> jax.Array:
    """Normalize a row filter into a bool ``[1 or Q, N]`` mask.

    ``mask``: bool/int array of shape ``[N]`` (one filter for the whole
    batch) or ``[Q, N]`` (per-query filters in one device program). True =
    row eligible.
    """
    m = jnp.asarray(mask)
    if m.ndim == 1:
        m = m[None, :]
    if m.shape[-1] != n_rows or (m.shape[0] not in (1, n_queries)):
        raise ValueError(
            f"mask shape {m.shape} incompatible with {n_queries} queries x {n_rows} rows"
        )
    return m.astype(bool)


def _masked_topk_from_scores(scores, mask, k: int) -> Tuple[jax.Array, jax.Array]:
    scores = jnp.where(
        normalize_mask(mask, scores.shape[0], scores.shape[1]), scores, _NEG_INF
    )
    vals, idx = _segmented_topk_from_scores(scores, k, segment=4096)
    # fewer than k eligible rows: sentinel the dead slots like the ann path
    return vals, jnp.where(vals > _NEG_INF / 2, idx, -1)


@functools.partial(jax.jit, static_argnames=("k",))
def masked_similarity_topk(
    queries: jax.Array,
    img_emb: jax.Array,
    txt_emb: jax.Array,
    mask,
    k: int,
    alpha: float = 0.5,
) -> Tuple[jax.Array, jax.Array]:
    """Exact blended top-k restricted to ``mask``-eligible corpus rows."""
    return _masked_topk_from_scores(
        blended_scores(queries, img_emb, txt_emb, alpha), mask, k
    )


@functools.partial(jax.jit, static_argnames=("k",))
def masked_similarity_topk_q8(
    queries: jax.Array,
    img_q: jax.Array,
    img_scale: jax.Array,
    txt_q: jax.Array,
    txt_scale: jax.Array,
    mask,
    k: int,
    alpha: float = 0.5,
) -> Tuple[jax.Array, jax.Array]:
    """Masked top-k over an int8-packed corpus (same rounding as the q8 scan)."""
    return _masked_topk_from_scores(
        blended_scores_q8(queries, img_q, img_scale, txt_q, txt_scale, alpha), mask, k
    )


@functools.partial(jax.jit, static_argnames=("k",))
def masked_similarity_topk_q4(
    queries: jax.Array,
    img_p: jax.Array,
    img_scale: jax.Array,
    txt_p: jax.Array,
    txt_scale: jax.Array,
    mask,
    k: int,
    alpha: float = 0.5,
) -> Tuple[jax.Array, jax.Array]:
    """Masked top-k over a nibble-packed int4 corpus."""
    return _masked_topk_from_scores(
        blended_scores_q4(queries, img_p, img_scale, txt_p, txt_scale, alpha), mask, k
    )


def sharded_masked_similarity_topk(
    queries: jax.Array,
    corpus_args: Tuple[jax.Array, ...],
    mask,
    k: int,
    alpha,
    mesh: Mesh,
    axis: str = "data",
    mode: str = "exact",
) -> Tuple[jax.Array, jax.Array]:
    """Masked top-k over a row-sharded corpus: local masked top-k per device
    (the mask shards with the rows), all_gather the [Q, k] winners, final
    merge. ``corpus_args``: ``(img, txt)`` exact or ``(img, img_scale, txt,
    txt_scale)`` for ``mode`` in {"q8", "q4"}.
    """
    n = corpus_args[0].shape[0]
    n_shards = mesh.shape[axis]
    shard_n = n // n_shards
    k = min(k, n)
    k_local = min(k, shard_n)
    alpha_arr = alpha_column(alpha, queries.shape[0])
    mask2d = normalize_mask(mask, queries.shape[0], n)
    score_fn = {
        "exact": blended_scores,
        "q8": blended_scores_q8,
        "q4": blended_scores_q4,
    }[mode]

    def local(q, a, m, *c_args):
        scores = jnp.where(m, score_fn(q, *c_args, a), _NEG_INF)
        vals, idx = _segmented_topk_from_scores(scores, k_local, segment=4096)
        vals, idx = _merge_shard_winners(vals, idx, axis, shard_n, k)
        return vals, jnp.where(vals > _NEG_INF / 2, idx, -1)

    in_specs = (P(), P(), P(None, axis)) + (P(axis, None),) * len(corpus_args)
    fn = shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()), check_vma=False
    )
    return jax.jit(fn)(queries, alpha_arr, mask2d, *corpus_args)


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------


def _merge_topk(run_vals, run_idx, cand_vals, cand_idx, k: int):
    """Merge running top-k with a candidate tile via k unrolled argmax rounds.

    All shapes static: run_* [Q, K], cand_* [Q, T]. Returns new ([Q, K], [Q, K]).
    """
    vals = jnp.concatenate([run_vals, cand_vals], axis=1)  # [Q, K+T]
    idxs = jnp.concatenate([run_idx, cand_idx], axis=1)
    q, m = vals.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (q, m), 1)
    new_vals = []
    new_idxs = []
    for _ in range(k):
        best = jnp.max(vals, axis=1, keepdims=True)  # [Q, 1]
        pos = jnp.argmax(vals, axis=1)[:, None]  # [Q, 1] first max position
        onehot = col == pos
        best_idx = jnp.sum(jnp.where(onehot, idxs, 0), axis=1, keepdims=True)
        new_vals.append(best)
        new_idxs.append(best_idx)
        vals = jnp.where(onehot, _NEG_INF, vals)
    return jnp.concatenate(new_vals, axis=1), jnp.concatenate(new_idxs, axis=1)


def _fused_kernel(
    *refs,
    k: int,
    tile_n: int,
    corpus_n: int,
    mode: str,
):
    """Streaming blend + running top-k over corpus tiles (one body for the
    exact, int8-, and int4-corpus variants; they differ only in the tile
    dtype/unpacking and whether per-row scales multiply the score columns)."""
    if mode == "q4":
        (alpha_ref, q_img_lo, q_img_hi, q_txt_lo, q_txt_hi,
         img_ref, img_s_ref, txt_ref, txt_s_ref,
         vals_ref, idx_ref, vals_scr, idx_scr) = refs
    elif mode == "q8":
        (alpha_ref, q_img_ref, q_txt_ref, img_ref, img_s_ref, txt_ref, txt_s_ref,
         vals_ref, idx_ref, vals_scr, idx_scr) = refs
    else:
        (alpha_ref, q_img_ref, q_txt_ref, img_ref, txt_ref,
         vals_ref, idx_ref, vals_scr, idx_scr) = refs
    # per-query blend weights [Q, 1] — a runtime operand, so one compiled
    # program serves every alpha (and mixed alphas within one batch)
    a = alpha_ref[:]
    j = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    @pl.when(j == 0)
    def _init():
        vals_scr[:] = jnp.full_like(vals_scr, _NEG_INF)
        idx_scr[:] = jnp.zeros_like(idx_scr)

    dot = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if mode == "q4":
        # nibble-packed tiles: unpack the two planes in int32 (arithmetic
        # shifts sign-extend the 4-bit values), convert to the query dtype
        # (exact: |v| <= 8), one half-width dot per plane
        ql, qh = q_img_lo[:], q_img_hi[:]

        def plane_dot(ql, qh, packed_ref):
            b = packed_ref[:].astype(jnp.int32)
            hi = (b >> 4).astype(ql.dtype)
            lo = ((b << 28) >> 28).astype(ql.dtype)
            return dot(ql, lo) + dot(qh, hi)

        t2i = plane_dot(ql, qh, img_ref)
        t2t = plane_dot(q_txt_lo[:], q_txt_hi[:], txt_ref)
        scores = a * (t2i * img_s_ref[:]) + (1.0 - a) * (t2t * txt_s_ref[:])
    else:
        # dot at the stored/query precision with f32 accumulation: bf16 x
        # bf16 MXU products are exact for bf16 inputs; int8 tiles convert to
        # the query dtype exactly (|v| <= 127 fits the bf16 mantissa) so the
        # only loss in the quantized variant is the original int8 rounding
        qi = q_img_ref[:]
        qt = q_txt_ref[:]
        img = img_ref[:].astype(qi.dtype) if mode == "q8" else img_ref[:]
        txt = txt_ref[:].astype(qt.dtype) if mode == "q8" else txt_ref[:]
        t2i = dot(qi, img)
        t2t = dot(qt, txt)
        if mode == "q8":
            # per-corpus-row scales ride pre-transposed as [1, T] rows and
            # multiply the f32 score COLUMNS post-matmul
            scores = a * (t2i * img_s_ref[:]) + (1.0 - a) * (t2t * txt_s_ref[:])
        else:
            scores = a * t2i + (1.0 - a) * t2t  # [Q, T] f32

    qn = scores.shape[0]
    local_col = jax.lax.broadcasted_iota(jnp.int32, (qn, tile_n), 1)
    global_idx = local_col + j * tile_n
    # mask pad rows; also sanitize NaN scores (a NaN query embedding would
    # otherwise poison the argmax-merge into returning MASKED indices —
    # out of corpus range — instead of degrading gracefully)
    valid = (global_idx < corpus_n) & ~jnp.isnan(scores)
    scores = jnp.where(valid, scores, _NEG_INF)

    new_vals, new_idx = _merge_topk(vals_scr[:], idx_scr[:], scores, global_idx, k)
    vals_scr[:] = new_vals
    idx_scr[:] = new_idx

    @pl.when(j == n_tiles - 1)
    def _write():
        vals_ref[:] = vals_scr[:]
        idx_ref[:] = idx_scr[:]


# Query rows per fused-kernel invocation: the kernel's VMEM footprint
# (query blocks + [Q, K + tile_n] merge copies + interior temporaries)
# scales with Q, and Q=512 was measured to exceed the 16 MB scoped-vmem
# limit at L/14 shapes (16.34M). Bigger batches chunk over this bound —
# each chunk is a fresh full-corpus scan, so latency adds linearly, but
# any batch size now compiles.
_MAX_FUSED_Q = 256


def _fused_topk_call(
    queries_img, queries_txt, img, txt, scales, *, k, alpha, tile_n, interpret, corpus_bytes,
    mode=None,
):
    # alpha rides as a [Q, 1] runtime operand (padded with the query rows)
    """Shared scaffolding (tile sizing, padding, specs, pallas_call) for the
    exact, int8, and int4 fused top-k variants."""
    if mode is None:
        mode = "q8" if scales is not None else "exact"
    qn, d = queries_img.shape
    if qn > _MAX_FUSED_Q:
        # chunk the query axis: each chunk runs the kernel at its proven
        # shape (corpus arrays are traced operands, not closed-over consts)
        a = alpha_column(alpha, qn)
        pad = (-qn) % _MAX_FUSED_Q
        qi = jnp.pad(queries_img, ((0, pad), (0, 0)))
        qt = jnp.pad(queries_txt, ((0, pad), (0, 0)))
        ap = jnp.pad(a, ((0, pad), (0, 0)))
        n_chunks = qi.shape[0] // _MAX_FUSED_Q

        def one(args):
            ci, ct, ca = args
            return _fused_topk_call(
                ci, ct, img, txt, scales, k=k, alpha=ca, tile_n=tile_n,
                interpret=interpret, corpus_bytes=corpus_bytes, mode=mode,
            )

        vals, idx = jax.lax.map(one, (
            qi.reshape(n_chunks, _MAX_FUSED_Q, -1),
            qt.reshape(n_chunks, _MAX_FUSED_Q, -1),
            ap.reshape(n_chunks, _MAX_FUSED_Q, 1),
        ))
        return vals.reshape(-1, k)[:qn], idx.reshape(-1, k)[:qn]
    n = img.shape[0]
    tile_n = min(tile_n, max(128, 1 << (n - 1).bit_length()))
    # VMEM budget: the merge works on [Q, K + tile_n] f32+i32 copies; keep the
    # score block bounded so large query batches still fit (~256k elements)
    max_elems = 256 * 1024
    if qn * tile_n > max_elems:
        tile_n = max(128, (max_elems // qn) // 128 * 128)
    pad_n = (-n) % tile_n
    img_p = jnp.pad(img, ((0, pad_n), (0, 0)))
    txt_p = jnp.pad(txt, ((0, pad_n), (0, 0)))
    n_tiles = img_p.shape[0] // tile_n

    # sublane-align the query block (fp32 min tile is 8 x 128)
    alpha_col = alpha_column(alpha, qn)
    pad_q = (-qn) % 8
    if pad_q:
        queries_img = jnp.pad(queries_img, ((0, pad_q), (0, 0)))
        queries_txt = jnp.pad(queries_txt, ((0, pad_q), (0, 0)))
        alpha_col = jnp.pad(alpha_col, ((0, pad_q), (0, 0)))
    qn_p = qn + pad_q

    dc = img.shape[1]  # corpus lane width (= d/2 packed planes in q4 mode)
    corpus_spec = lambda: pl.BlockSpec((tile_n, dc), lambda j: (j, 0), memory_space=pltpu.VMEM)
    q_spec = lambda w: pl.BlockSpec((qn_p, w), lambda j: (0, 0), memory_space=pltpu.VMEM)
    alpha_spec = pl.BlockSpec((qn_p, 1), lambda j: (0, 0), memory_space=pltpu.VMEM)
    if mode == "q4":
        d2 = d // 2
        in_specs = [alpha_spec] + [q_spec(d2)] * 4
        operands = [
            alpha_col,
            queries_img[:, :d2], queries_img[:, d2:],
            queries_txt[:, :d2], queries_txt[:, d2:],
        ]
    else:
        in_specs = [alpha_spec, q_spec(d), q_spec(d)]
        operands = [alpha_col, queries_img, queries_txt]
    if scales is not None:
        img_s, txt_s = scales
        # scales as [1, N] rows so the kernel multiplies score COLUMNS
        img_s = jnp.pad(jnp.asarray(img_s, jnp.float32).reshape(1, -1), ((0, 0), (0, pad_n)))
        txt_s = jnp.pad(jnp.asarray(txt_s, jnp.float32).reshape(1, -1), ((0, 0), (0, pad_n)))
        scale_spec = lambda: pl.BlockSpec((1, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM)
        in_specs += [corpus_spec(), scale_spec(), corpus_spec(), scale_spec()]
        operands += [img_p, img_s, txt_p, txt_s]
    else:
        in_specs += [corpus_spec(), corpus_spec()]
        operands += [img_p, txt_p]

    kernel = functools.partial(
        _fused_kernel, k=k, tile_n=tile_n, corpus_n=n, mode=mode,
    )
    vals, idx = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((qn_p, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qn_p, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qn_p, k), jnp.float32),
            jax.ShapeDtypeStruct((qn_p, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((qn_p, k), jnp.float32),
            pltpu.VMEM((qn_p, k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * qn * d * n,
            bytes_accessed=corpus_bytes + 2 * qn * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return vals[:qn], idx[:qn]


def fused_similarity_topk_q8(
    queries_img: jax.Array,
    img_q: jax.Array,
    img_scale: jax.Array,
    txt_q: jax.Array,
    txt_scale: jax.Array,
    k: int,
    alpha: float = 0.5,
    queries_txt: Optional[jax.Array] = None,
    tile_n: int = 1024,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused blend + top-k over an int8-packed corpus (:func:`quantize_corpus`).

    Same selection semantics as :func:`fused_similarity_topk`; scores carry
    one quantization rounding step per corpus element (ranks stable to ~1e-2
    score tolerance). Big k (>128) routes through q8-native scores and the
    segmented exact selection (no full-corpus dequantization buffer).
    """
    if interpret is None:
        from .dispatch import on_tpu

        interpret = not on_tpu()
    if queries_txt is None:
        queries_txt = queries_img
    n = img_q.shape[0]
    k = min(k, n)
    if k > 128:
        q_txt = None if queries_txt is queries_img else queries_txt
        scores = blended_scores_q8(
            queries_img, img_q, img_scale, txt_q, txt_scale, alpha, q_txt
        )
        return _segmented_topk_from_scores(scores, k, segment=4096)
    return _fused_topk_call(
        queries_img, queries_txt, img_q, txt_q, (img_scale, txt_scale),
        k=k, alpha=alpha, tile_n=tile_n, interpret=interpret,
        corpus_bytes=2 * n * img_q.shape[1],
    )


def fused_similarity_topk_q4(
    queries_img: jax.Array,
    img_p: jax.Array,
    img_scale: jax.Array,
    txt_p: jax.Array,
    txt_scale: jax.Array,
    k: int,
    alpha: float = 0.5,
    queries_txt: Optional[jax.Array] = None,
    tile_n: int = 1024,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused blend + top-k over a nibble-packed int4 corpus
    (:func:`quantize_corpus_host_q4`).

    Same selection semantics as :func:`fused_similarity_topk`; scores carry
    one 4-bit rounding step per corpus element (coarser than int8 — the
    capacity mode: quarter the f32 HBM footprint and streaming traffic).
    Big k (>128) routes through q4-native scores and the segmented exact
    selection.
    """
    if interpret is None:
        from .dispatch import on_tpu

        interpret = not on_tpu()
    if queries_txt is None:
        queries_txt = queries_img
    n = img_p.shape[0]
    k = min(k, n)
    if k > 128:
        q_txt = None if queries_txt is queries_img else queries_txt
        scores = blended_scores_q4(
            queries_img, img_p, img_scale, txt_p, txt_scale, alpha, q_txt
        )
        return _segmented_topk_from_scores(scores, k, segment=4096)
    return _fused_topk_call(
        queries_img, queries_txt, img_p, txt_p, (img_scale, txt_scale),
        k=k, alpha=alpha, tile_n=tile_n, interpret=interpret,
        corpus_bytes=2 * n * img_p.shape[1], mode="q4",
    )


def fused_similarity_topk(
    queries_img: jax.Array,
    img_emb: jax.Array,
    txt_emb: jax.Array,
    k: int,
    alpha: float = 0.5,
    queries_txt: Optional[jax.Array] = None,
    tile_n: int = 1024,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Single-pass fused blend + top-k over the corpus axis.

    ``queries_img``: [Q, D] query embeddings scored against the image tower;
    ``queries_txt`` defaults to the same array (the reference blends one
    query embedding against both towers, ``clip_retrieval.py:39``).
    Returns ``(values [Q, k] f32, indices [Q, k] i32)``.
    """
    if interpret is None:
        from .dispatch import on_tpu

        interpret = not on_tpu()
    if queries_txt is None:
        queries_txt = queries_img
    n = img_emb.shape[0]
    k = min(k, n)
    if k > 128:
        # The argmax-round merge degrades past ~128 rounds; the segmented
        # two-stage selection is the fast exact path for big k.
        q_txt = None if queries_txt is queries_img else queries_txt
        return similarity_topk_segmented(
            queries_img, img_emb, txt_emb, k, alpha, queries_txt=q_txt
        )
    return _fused_topk_call(
        queries_img, queries_txt, img_emb, txt_emb, None,
        k=k, alpha=alpha, tile_n=tile_n, interpret=interpret,
        corpus_bytes=2 * n * img_emb.shape[1] * img_emb.dtype.itemsize,
    )


# ---------------------------------------------------------------------------
# Mesh-sharded corpus
# ---------------------------------------------------------------------------


def sharded_similarity_topk(
    queries: jax.Array,
    img_emb: jax.Array,
    txt_emb: jax.Array,
    k: int,
    alpha: float,
    mesh: Mesh,
    axis: str = "data",
    use_pallas: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k over a corpus sharded on ``axis``: local top-k, gather winners,
    final merge. Queries replicated; only [Q, k] per device crosses ICI.
    """
    n_shards = mesh.shape[axis]
    shard_n = img_emb.shape[0] // n_shards
    k = min(k, img_emb.shape[0])
    k_local = min(k, shard_n)  # a shard can only contribute shard_n winners
    alpha_arr = alpha_column(alpha, queries.shape[0])

    def local(q, a, img, txt):
        if use_pallas or (use_pallas is None and jax.default_backend() == "tpu" and k_local <= 128):  # noqa: E501 (mesh ops always run on the process backend)
            vals, idx = fused_similarity_topk(q, img, txt, k=k_local, alpha=a)
        elif k_local > 128:
            vals, idx = similarity_topk_segmented(q, img, txt, k=k_local, alpha=a)
        else:
            vals, idx = similarity_topk_xla(q, img, txt, k=k_local, alpha=a)
        return _merge_shard_winners(vals, idx, axis, shard_n, k)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis, None), P(axis, None)),
        out_specs=(P(), P()),
        # after all_gather + top_k the result is replicated, but the varying-
        # axis analysis cannot prove it; disable the check.
        check_vma=False,
    )
    return jax.jit(fn)(queries, alpha_arr, img_emb, txt_emb)


def _merge_shard_winners(vals, idx, axis: str, shard_n: int, k: int):
    """Global merge of per-shard top-k winners (inside shard_map): localize
    indices to global rows, gather every shard's [Q, k] candidates, and take
    the final top-k. Only [Q, k] per device crosses ICI."""
    offset = jax.lax.axis_index(axis).astype(jnp.int32) * shard_n
    idx = idx + offset
    all_vals = jax.lax.all_gather(vals, axis)  # [n_shards, Q, k]
    all_idx = jax.lax.all_gather(idx, axis)
    qn = vals.shape[0]
    flat_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(qn, -1)
    flat_idx = jnp.transpose(all_idx, (1, 0, 2)).reshape(qn, -1)
    best_vals, pos = jax.lax.top_k(flat_vals, k)
    best_idx = jnp.take_along_axis(flat_idx, pos, axis=1)
    return best_vals, best_idx


def sharded_similarity_topk_q8(
    queries: jax.Array,
    img_q: jax.Array,
    img_scale: jax.Array,
    txt_q: jax.Array,
    txt_scale: jax.Array,
    k: int,
    alpha: float,
    mesh: Mesh,
    axis: str = "data",
    use_pallas: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """:func:`sharded_similarity_topk` over an int8-packed corpus: each
    device holds only its int8 shard (+ per-row scales), so corpus capacity
    scales 2x per chip AND linearly with the mesh. Same merge: local top-k,
    all_gather the [Q, k] winners, final replicated top-k."""
    n_shards = mesh.shape[axis]
    shard_n = img_q.shape[0] // n_shards
    k = min(k, img_q.shape[0])
    k_local = min(k, shard_n)
    alpha_arr = alpha_column(alpha, queries.shape[0])

    def local(q, a, img, img_s, txt, txt_s):
        if use_pallas or (use_pallas is None and jax.default_backend() == "tpu"):
            # fused handles k_local > 128 internally (q8-native segmented)
            vals, idx = fused_similarity_topk_q8(
                q, img, img_s, txt, txt_s, k=k_local, alpha=a
            )
        else:
            vals, idx = similarity_topk_xla_q8(
                q, img, img_s, txt, txt_s, k=k_local, alpha=a
            )
        return _merge_shard_winners(vals, idx, axis, shard_n, k)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis, None), P(axis, None), P(axis, None), P(axis, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)(queries, alpha_arr, img_q, img_scale, txt_q, txt_scale)


def sharded_similarity_topk_q4(
    queries: jax.Array,
    img_p: jax.Array,
    img_scale: jax.Array,
    txt_p: jax.Array,
    txt_scale: jax.Array,
    k: int,
    alpha: float,
    mesh: Mesh,
    axis: str = "data",
    use_pallas: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """:func:`sharded_similarity_topk` over a nibble-packed int4 corpus:
    each device holds only its packed shard (+ per-row scales), so corpus
    capacity scales 4x per chip AND linearly with the mesh."""
    n_shards = mesh.shape[axis]
    shard_n = img_p.shape[0] // n_shards
    k = min(k, img_p.shape[0])
    k_local = min(k, shard_n)
    alpha_arr = alpha_column(alpha, queries.shape[0])

    def local(q, a, img, img_s, txt, txt_s):
        if use_pallas or (use_pallas is None and jax.default_backend() == "tpu"):
            vals, idx = fused_similarity_topk_q4(
                q, img, img_s, txt, txt_s, k=k_local, alpha=a
            )
        else:
            vals, idx = similarity_topk_xla_q4(
                q, img, img_s, txt, txt_s, k=k_local, alpha=a
            )
        return _merge_shard_winners(vals, idx, axis, shard_n, k)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis, None), P(axis, None), P(axis, None), P(axis, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)(queries, alpha_arr, img_p, img_scale, txt_p, txt_scale)
