"""int4 (nibble-packed) corpus tests — the 4x-capacity packing mode.

Mirrors the int8 suite in ``tests/test_similarity.py``: pack/round-trip
bounds, op-order-matched oracle equality for the fused kernel, recall vs the
exact corpus, big-k fallback, sharded == dense, and the CLIPRetrieval
integration. Quantized-path testing rule (CLAUDE.md): oracle comparisons use
IDENTICAL op order — unpack to planes, half-width dots, per-row scales on
the f32 score columns.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.ops import similarity as S
from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime


def _corpus(rng, n=500, d=64, q=7):
    def norm(x):
        return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)

    return (
        norm(rng.standard_normal((q, d))),
        norm(rng.standard_normal((n, d))),
        norm(rng.standard_normal((n, d))),
    )


def _oracle_scores_q4(q, packed, scale):
    """Host mirror of blended_scores_q4's per-tower term (same op order)."""
    b = np.asarray(packed).astype(np.int32)
    hi = b >> 4
    lo = (b << 28) >> 28
    d2 = b.shape[1]
    raw = q[:, :d2] @ lo.T.astype(np.float32) + q[:, d2:] @ hi.T.astype(np.float32)
    return raw * np.asarray(scale).reshape(1, -1)


def test_quantize_q4_roundtrip(rng):
    emb = rng.standard_normal((64, 32)).astype(np.float32)
    packed, s = S.quantize_corpus_host_q4(emb)
    assert packed.dtype == jnp.int8 and packed.shape == (64, 16)
    assert s.shape == (64, 1)
    back = np.asarray(S.dequantize_corpus_q4(packed, s))
    step = np.asarray(s)
    assert (np.abs(back - emb) <= step / 2 + 1e-7).all()


def test_quantize_q4_odd_dim_rejected(rng):
    with pytest.raises(ValueError, match="even"):
        S.quantize_corpus_host_q4(rng.standard_normal((4, 33)).astype(np.float32))


def test_q4_nibble_layout(rng):
    """Byte j holds dim j (low nibble) and dim j + D/2 (high nibble)."""
    emb = rng.standard_normal((8, 16)).astype(np.float32)
    packed, s = S.quantize_corpus_host_q4(emb)
    ints = np.clip(np.round(emb / np.asarray(s)), -8, 7).astype(np.int8)
    b = np.asarray(packed).astype(np.int32)
    np.testing.assert_array_equal((b << 28) >> 28, ints[:, :8])
    np.testing.assert_array_equal(b >> 4, ints[:, 8:])


def test_fused_q4_matches_oracle(rng):
    """The q4 kernel selects exactly what the op-order-matched oracle does."""
    q, img, txt = _corpus(rng, n=700, q=5)
    img_p, img_s = S.quantize_corpus_host_q4(img)
    txt_p, txt_s = S.quantize_corpus_host_q4(txt)
    fv, fi = S.fused_similarity_topk_q4(
        jnp.asarray(q), img_p, img_s, txt_p, txt_s, k=9, alpha=0.6, interpret=True
    )
    scores = 0.6 * _oracle_scores_q4(q, img_p, img_s) + 0.4 * _oracle_scores_q4(
        q, txt_p, txt_s
    )
    xi = np.argsort(-scores, axis=1)[:, :9]
    xv = np.take_along_axis(scores, xi, axis=1)
    np.testing.assert_allclose(np.asarray(fv), xv, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(fi), xi)


def test_fused_q4_matches_xla_q4(rng):
    q, img, txt = _corpus(rng, n=500, q=6)
    img_p, img_s = S.quantize_corpus_host_q4(img)
    txt_p, txt_s = S.quantize_corpus_host_q4(txt)
    fv, fi = S.fused_similarity_topk_q4(
        jnp.asarray(q), img_p, img_s, txt_p, txt_s, k=10, alpha=0.7, interpret=True
    )
    xv, xi = S.similarity_topk_xla_q4(
        jnp.asarray(q), img_p, img_s, txt_p, txt_s, 10, 0.7
    )
    np.testing.assert_allclose(np.asarray(fv), np.asarray(xv), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(xi))


def test_q4_recall_vs_exact(rng):
    """4-bit rounding is coarse (16x int8) — the capacity/recall trade: on
    unstructured random embeddings (the HARD case) top-10 overlap stays
    high; real corpora cluster and do better."""
    q, img, txt = _corpus(rng, n=500, q=8)
    img_p, img_s = S.quantize_corpus_host_q4(img)
    txt_p, txt_s = S.quantize_corpus_host_q4(txt)
    fv, fi = S.fused_similarity_topk_q4(
        jnp.asarray(q), img_p, img_s, txt_p, txt_s, k=10, interpret=True
    )
    xv, xi = S.similarity_topk_xla(jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt), 10, 0.5)
    np.testing.assert_allclose(np.asarray(fv), np.asarray(xv), atol=0.12)
    overlap = [
        len(set(np.asarray(fi)[i].tolist()) & set(np.asarray(xi)[i].tolist()))
        for i in range(len(q))
    ]
    assert np.mean(overlap) >= 7.5, overlap


def test_fused_q4_big_k_falls_back(rng):
    q, img, txt = _corpus(rng, n=600, q=3)
    img_p, img_s = S.quantize_corpus_host_q4(img)
    txt_p, txt_s = S.quantize_corpus_host_q4(txt)
    fv, fi = S.fused_similarity_topk_q4(
        jnp.asarray(q), img_p, img_s, txt_p, txt_s, k=200, interpret=True
    )
    scores = 0.5 * _oracle_scores_q4(q, img_p, img_s) + 0.5 * _oracle_scores_q4(
        q, txt_p, txt_s
    )
    xi = np.argsort(-scores, axis=1)[:, :200]
    xv = np.take_along_axis(scores, xi, axis=1)
    np.testing.assert_allclose(np.asarray(fv), xv, rtol=1e-4, atol=1e-5)


def test_sharded_q4_matches_dense_q4(rng, devices8):
    """Sharded int4-corpus top-k == the dense XLA q4 path (same op order)."""
    rt = MeshRuntime.create()
    q, img, txt = _corpus(rng, n=512, q=6)
    img_p, img_s = S.quantize_corpus_host_q4(img, rt.mesh)
    txt_p, txt_s = S.quantize_corpus_host_q4(txt, rt.mesh)
    assert not img_p.sharding.is_fully_replicated  # rows really sharded
    sv, si = S.sharded_similarity_topk_q4(
        jnp.asarray(q), img_p, img_s, txt_p, txt_s, k=9, alpha=0.7, mesh=rt.mesh
    )
    xv, xi = S.similarity_topk_xla_q4(jnp.asarray(q), img_p, img_s, txt_p, txt_s, 9, 0.7)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(xv), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(xi))


def test_resolve_quantize_corpus():
    from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import (
        resolve_quantize_corpus,
    )

    assert resolve_quantize_corpus("") is False
    assert resolve_quantize_corpus("false") is False
    assert resolve_quantize_corpus("true") == "int8"
    assert resolve_quantize_corpus("int8") == "int8"
    assert resolve_quantize_corpus("int4") == "int4"
    with pytest.raises(ValueError):
        resolve_quantize_corpus("int2")
