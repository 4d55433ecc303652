"""Binary sign-sketch corpus: 1 bit per dimension, Hamming-distance scan.

The capacity frontier of the corpus-packing ladder (f32 -> int8 2x -> int4
4x -> binary 32x): each embedding row is reduced to its coordinate sign
bits, packed 32 per ``uint32`` word. The candidate scan scores queries
against the sketch with per-tower Hamming distances (``XOR`` +
``lax.population_count`` on the VPU — no MXU involvement, no ragged
shapes), mapped to a cosine proxy ``1 - 2 * hamming / dim`` so the usual
alpha blend applies, then the host-side exact rerank
(``CLIPRetrieval(rerank=True)``) rescores the fetched candidates from the
f32 store. Binary scores are CANDIDATE-GENERATION quality only — the
retriever refuses to serve them as final scores (rerank is mandatory).

Sign sketches preserve angular neighborhoods (the sign pattern is a
locality-sensitive hash for cosine similarity); with a modest rerank
over-fetch (4-8x) recall returns to ~1.0 on real embedding distributions —
measure on your own data with ``scripts/quality_sweep.py``.

No reference counterpart (the reference's corpus lives as f32 numpy,
SURVEY §2.2); this tier exists for corpora that outgrow int4.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jax import shard_map

from .similarity import (
    _merge_shard_winners,
    _segmented_topk_from_scores,
    alpha_column,
)

# chunk of corpus rows scored per step: bounds the [Q, chunk, words] XOR
# intermediate (256 queries x 4096 rows x 24 words x 4 B = ~100 MB)
_DEFAULT_CHUNK = 4096


def _bit_weights() -> jnp.ndarray:
    return (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))


def pack_sign_bits(emb: jax.Array) -> jax.Array:
    """Device packing: ``[N, D] -> uint32 [N, ceil(D/32)]`` of sign bits.

    Bit i of word w is ``emb[:, 32*w + i] > 0``; tail bits of the last word
    are zero. Zero vectors (capacity-pad rows) pack to all-zero words.
    """
    n, d = emb.shape
    pad = (-d) % 32
    bits = (emb > 0)
    if pad:
        bits = jnp.pad(bits, ((0, 0), (0, pad)))
    words = bits.reshape(n, -1, 32).astype(jnp.uint32)
    return (words * _bit_weights()).sum(axis=-1).astype(jnp.uint32)


def pack_sign_bits_host(
    emb, mesh: Optional[Mesh] = None, axis: str = "data"
) -> jax.Array:
    """Host (NumPy) packing, bit-identical to :func:`pack_sign_bits` — the
    full f32 corpus never stages in device HBM (only ~D/32 words per row
    upload). With ``mesh``, uploads row-sharded over ``axis``."""
    emb = np.asarray(emb)
    n, d = emb.shape
    pad = (-d) % 32
    bits = emb > 0
    if pad:
        bits = np.pad(bits, ((0, 0), (0, pad)))
    words = bits.reshape(n, -1, 32).astype(np.uint32)
    packed = (words << np.arange(32, dtype=np.uint32)).sum(axis=-1, dtype=np.uint32)
    if mesh is not None:
        return jax.device_put(packed, NamedSharding(mesh, P(axis, None)))
    return jnp.asarray(packed)


def hamming_scores(q_bits: jax.Array, c_bits: jax.Array, chunk: int = _DEFAULT_CHUNK) -> jax.Array:
    """``[Q, W] x [N, W] -> int32 [Q, N]`` Hamming distances, corpus-chunked
    so the XOR intermediate stays bounded."""
    qn, w = q_bits.shape
    n = c_bits.shape[0]

    def one(c):
        x = jnp.bitwise_xor(q_bits[:, None, :], c[None, :, :])
        return lax.population_count(x).astype(jnp.int32).sum(axis=-1)  # [Q, C]

    if n <= chunk:
        return one(c_bits)
    pad = (-n) % chunk
    if pad:
        # pad rows are all-ones words: maximal distance, never competitive
        c_bits = jnp.pad(c_bits, ((0, pad), (0, 0)), constant_values=np.uint32(0xFFFFFFFF))
    chunks = c_bits.reshape(-1, chunk, w)
    scores = lax.map(one, chunks)  # [n_chunks, Q, C]
    return jnp.moveaxis(scores, 0, 1).reshape(qn, -1)[:, :n]


@functools.partial(jax.jit, static_argnames=("dim", "k", "chunk"))
def hamming_topk(
    queries: jax.Array,
    cimg_bits: jax.Array,
    ctxt_bits: jax.Array,
    *,
    dim: int,
    k: int,
    alpha=0.5,
    chunk: int = _DEFAULT_CHUNK,
) -> Tuple[jax.Array, jax.Array]:
    """Blended sketch top-k: queries are real embeddings ``[Q, D]``
    (binarized on device), the corpus is packed sign bits. Returns
    ``(proxy_scores [Q, k], indices [Q, k])`` where the proxy is
    ``alpha * (1 - 2 ham_img / dim) + (1 - alpha) * (1 - 2 ham_txt / dim)``
    — monotone in the blend of per-tower angular similarities, NOT a
    cosine: rerank before serving."""
    q_bits = pack_sign_bits(queries)
    a = alpha_column(alpha, queries.shape[0])
    inv = 2.0 / float(dim)
    p_img = 1.0 - inv * hamming_scores(q_bits, cimg_bits, chunk).astype(jnp.float32)
    p_txt = 1.0 - inv * hamming_scores(q_bits, ctxt_bits, chunk).astype(jnp.float32)
    scores = a * p_img + (1.0 - a) * p_txt
    return _segmented_topk_from_scores(scores, k, segment=4096)


def sharded_hamming_topk(
    queries: jax.Array,
    cimg_bits: jax.Array,
    ctxt_bits: jax.Array,
    *,
    dim: int,
    k: int,
    alpha,
    mesh: Mesh,
    axis: str = "data",
    chunk: int = _DEFAULT_CHUNK,
) -> Tuple[jax.Array, jax.Array]:
    """:func:`hamming_topk` over a row-sharded sketch corpus: each device
    scans its local packed rows, and only the per-shard ``[Q, k]`` winners
    cross ICI for the final merge (same shape as
    ``similarity.sharded_similarity_topk``). Sketch capacity scales 32x per
    chip AND linearly with the mesh."""
    n_shards = mesh.shape[axis]
    n = cimg_bits.shape[0]
    shard_n = n // n_shards
    k = min(k, n)
    k_local = min(k, shard_n)
    q_bits = pack_sign_bits(queries)
    a = alpha_column(alpha, queries.shape[0])
    inv = 2.0 / float(dim)

    def local(qb, a, ci, ct):
        p_img = 1.0 - inv * hamming_scores(qb, ci, chunk).astype(jnp.float32)
        p_txt = 1.0 - inv * hamming_scores(qb, ct, chunk).astype(jnp.float32)
        scores = a * p_img + (1.0 - a) * p_txt
        vals, idx = _segmented_topk_from_scores(scores, k_local, segment=4096)
        return _merge_shard_winners(vals, idx, axis, shard_n, k)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis, None), P(axis, None)),
        out_specs=(P(), P()),
        check_vma=False,  # replicated after all_gather + top_k (unprovable)
    )
    return jax.jit(fn)(q_bits, a, cimg_bits, ctxt_bits)
