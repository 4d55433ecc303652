"""Rotated quantization (``CLIPRetrieval(rotate=True)``) tests.

TPU-native extension: a seeded random orthonormal R rotates corpus rows at
staging and query embeddings inside the score program. Exact inner products
are invariant (``(qR)(cR)^T = qc^T``) but per-row energy spreads evenly
across coordinates, so symmetric per-row int4/int8 grids and sign-bit
sketches lose far less recall on ANISOTROPIC embeddings (real CLIP
embeddings concentrate energy in few directions) — the classic LSH/OPQ
random-rotation trick. Measured on the synthetic spectrum below: binary
recall@10 0.10 -> 0.88, int4 0.90 -> 0.96.

The host f32 store stays unrotated, so rerank and candidate rescoring keep
working in the original space — full-width-fetch rerank is therefore pinned
bit-identical to exact brute force THROUGH the rotation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
from knowledge_enhanced_multimodal_retrieval_tpu.ops.similarity import random_rotation
from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime
from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.clip_retrieval import (
    CLIPRetrieval,
)
from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.embedding_store import (
    EmbeddingStore,
)
from tests.test_retrieval_engine import MERGES

N, D = 384, 64
SPECTRUM = 2.0 ** (-np.arange(D) / 3.0)  # strongly anisotropic rows


def _aniso(rng, n):
    v = rng.standard_normal((n, D)) * SPECTRUM
    return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)


@pytest.fixture(scope="module")
def world(devices8):
    tok = CLIPTokenizer(MERGES)
    arch = M.CLIPArch(D, 32, 1, 32, 16, 16, tok.vocab_size, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    store = EmbeddingStore(
        image=_aniso(rng, N),
        text=_aniso(rng, N),
        uuids=[f"u{i:05d}" for i in range(N)],
    )
    q = _aniso(rng, 24)
    return model, params, tok, store, q


def _uuid_lists(results):
    return [[r["uuid"] for r in res] for res in results]


def _recall(results, gold):
    hits = [
        len(set(g) & set(r)) / len(g)
        for g, r in zip(gold, _uuid_lists(results))
    ]
    return float(np.mean(hits))


def test_rotation_matrix_orthonormal_and_deterministic():
    r0 = random_rotation(48, seed=3)
    np.testing.assert_allclose(r0 @ r0.T, np.eye(48), atol=1e-5)
    np.testing.assert_array_equal(r0, random_rotation(48, seed=3))
    assert not np.allclose(r0, random_rotation(48, seed=4))


def test_rotation_recovers_anisotropic_recall(world):
    """The headline property: rotation rescues packed-mode recall on
    energy-concentrated embeddings (binary sketches are the extreme case —
    low-energy coordinate signs are pure noise without it)."""
    model, params, tok, store, q = world
    exact = CLIPRetrieval(model, params, tok, store, top_k=10)
    gold = _uuid_lists(exact.retrieval_embeddings_batch(q, alpha=0.6))

    def recall(**kw):
        ret = CLIPRetrieval(model, params, tok, store, top_k=10, **kw)
        return _recall(ret.retrieval_embeddings_batch(q, alpha=0.6), gold)

    bin_kw = dict(quantize_corpus="binary", rerank=True, rerank_factor=2)
    plain_bin, rot_bin = recall(**bin_kw), recall(rotate=True, **bin_kw)
    assert plain_bin <= 0.5, plain_bin  # the un-rotated sketch is broken here
    assert rot_bin >= 0.7, rot_bin
    plain_q4, rot_q4 = (
        recall(quantize_corpus="int4"),
        recall(quantize_corpus="int4", rotate=True),
    )
    assert rot_q4 >= plain_q4, (plain_q4, rot_q4)
    assert rot_q4 >= 0.9, rot_q4


def test_rotated_full_fetch_rerank_is_exact(world):
    """rerank with factor*k >= corpus restores the exact f32 ranking THROUGH
    the rotation (host rescoring runs in the original, unrotated space)."""
    model, params, tok, store, q = world
    exact = CLIPRetrieval(model, params, tok, store, top_k=8)
    gold = exact.retrieval_embeddings_batch(q[:6], alpha=0.5)
    rot = CLIPRetrieval(
        model, params, tok, store, top_k=8,
        quantize_corpus="int8", rotate=True, rerank=True, rerank_factor=N,
    )
    got = rot.retrieval_embeddings_batch(q[:6], alpha=0.5)
    for g, r in zip(gold, got):
        assert [x["uuid"] for x in g] == [x["uuid"] for x in r]
        np.testing.assert_allclose(
            [x["score"] for x in g], [x["score"] for x in r], atol=1e-5
        )


def test_rotate_text_queries_and_determinism(world):
    """The text path rotates inside the same program; two instances with the
    same seed serve identical results."""
    model, params, tok, store, _ = world
    kw = dict(quantize_corpus="int8", rotate=True, rotate_seed=11, top_k=6)
    a = CLIPRetrieval(model, params, tok, store, **kw)
    b = CLIPRetrieval(model, params, tok, store, **kw)
    queries = ["hello cat", "green vase", "world trees"]
    ra, rb = a.retrieval_batch(queries), b.retrieval_batch(queries)
    assert _uuid_lists(ra) == _uuid_lists(rb)
    for x, y in zip(ra, rb):
        np.testing.assert_array_equal(
            [r["score"] for r in x], [r["score"] for r in y]
        )
    # a different seed rotates differently (rounding-level differences in
    # scores at minimum)
    c = CLIPRetrieval(
        model, params, tok, store, quantize_corpus="int8", rotate=True,
        rotate_seed=12, top_k=6,
    )
    rc = c.retrieval_batch(queries)
    assert any(
        [r["score"] for r in x] != [r["score"] for r in y]
        for x, y in zip(ra, rc)
    )


def test_rotate_composes_with_shard_queries(world):
    model, params, tok, store, q = world
    kw = dict(quantize_corpus="int8", rotate=True, top_k=6)
    plain = CLIPRetrieval(model, params, tok, store, **kw)
    qdp = CLIPRetrieval(
        model, params, tok, store, rt=MeshRuntime.create(), shard_queries=True, **kw
    )
    a = plain.retrieval_embeddings_batch(q[:7], alpha=0.4)
    b = qdp.retrieval_embeddings_batch(q[:7], alpha=0.4)
    assert _uuid_lists(a) == _uuid_lists(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(
            [r["score"] for r in x], [r["score"] for r in y], atol=1e-5
        )


def test_rotate_composes_with_shard_corpus(world):
    model, params, tok, store, q = world
    kw = dict(quantize_corpus="int8", rotate=True, top_k=6)
    plain = CLIPRetrieval(model, params, tok, store, **kw)
    sc = CLIPRetrieval(
        model, params, tok, store, rt=MeshRuntime.create(), shard_corpus=True, **kw
    )
    a = plain.retrieval_embeddings_batch(q[:5], alpha=0.4)
    b = sc.retrieval_embeddings_batch(q[:5], alpha=0.4)
    assert _uuid_lists(a) == _uuid_lists(b)


def test_rotate_filtered_full_fetch_matches_exact_filter(world):
    """Masked search rotates the same way; with full-fetch rerank the
    filtered ranking matches the exact retriever's filtered ranking."""
    model, params, tok, store, q = world
    allow = [f"u{i:05d}" for i in range(0, N, 3)]
    exact = CLIPRetrieval(model, params, tok, store, top_k=5)
    rot = CLIPRetrieval(
        model, params, tok, store, top_k=5,
        quantize_corpus="int8", rotate=True, rerank=True, rerank_factor=N,
    )
    a = exact.retrieval_filtered_embeddings_batch(q[:5], allow_uuids=allow)
    b = rot.retrieval_filtered_embeddings_batch(q[:5], allow_uuids=allow)
    assert _uuid_lists(a) == _uuid_lists(b)
    for res in b:
        assert all(r["uuid"] in set(allow) for r in res)


def test_rotate_composes_with_matryoshka(world):
    """truncate_dim + rotate: R acts in the staged prefix space; full-fetch
    rerank restores the exact FULL-dim ranking either way."""
    model, params, tok, store, q = world
    kw = dict(truncate_dim=16, rerank=True, rerank_factor=N, top_k=6)
    plain = CLIPRetrieval(model, params, tok, store, quantize_corpus="int8", **kw)
    rot = CLIPRetrieval(
        model, params, tok, store, quantize_corpus="int8", rotate=True, **kw
    )
    a = plain.retrieval_embeddings_batch(q[:5], alpha=0.5)
    b = rot.retrieval_embeddings_batch(q[:5], alpha=0.5)
    assert _uuid_lists(a) == _uuid_lists(b)


def test_rotate_survives_live_updates(world):
    """add_documents re-stages the corpus through the same rotation."""
    model, params, tok, store, q = world
    rng = np.random.default_rng(23)
    ret = CLIPRetrieval(
        model, params, tok, store, top_k=5, quantize_corpus="int8",
        rotate=True, capacity_multiple=16,
    )
    ret.add_documents(_aniso(rng, 2), _aniso(rng, 2), ["new-1", "new-2"])
    fresh = CLIPRetrieval(
        model, params, tok,
        store.with_added(
            np.asarray(ret.store.image[N : N + 2]),
            np.asarray(ret.store.text[N : N + 2]),
            ["new-1", "new-2"],
        ),
        top_k=5, quantize_corpus="int8", rotate=True,
    )
    a = ret.retrieval_embeddings_batch(q[:4])
    b = fresh.retrieval_embeddings_batch(q[:4])
    assert _uuid_lists(a) == _uuid_lists(b)


def test_opq_rotation_orthonormal_and_improves_reconstruction(world):
    """OPQ (learned rotation) is orthonormal, deterministic per seed, and
    beats the random rotation on ITS OWN objective: PQ reconstruction error
    of the rotated rows under freshly trained codebooks."""
    from knowledge_enhanced_multimodal_retrieval_tpu.ops.pq import (
        _pq_encode_decode_host,
        train_opq_rotation,
        train_pq_codebooks,
    )

    _, _, _, store, _ = world
    rows = np.concatenate([store.image, store.text], axis=0)
    m = D // 8
    r_opq = train_opq_rotation(rows, m=m, seed=0)
    np.testing.assert_allclose(r_opq @ r_opq.T, np.eye(D), atol=1e-4)
    np.testing.assert_array_equal(r_opq, train_opq_rotation(rows, m=m, seed=0))

    def recon_err(r):
        xr = rows @ r
        cb = train_pq_codebooks(xr, m=m, seed=99)
        return float(np.mean((xr - _pq_encode_decode_host(xr, cb)) ** 2))

    err_opq, err_rand = recon_err(r_opq), recon_err(random_rotation(D, seed=0))
    assert err_opq < err_rand, (err_opq, err_rand)


def test_opq_serving_recall_and_exact_rerank(world):
    """rotate='opq' serves through the same seam as the random rotation:
    recall at least matches it, and full-fetch rerank stays exact THROUGH
    the learned rotation (host store unrotated)."""
    model, params, tok, store, q = world
    exact = CLIPRetrieval(model, params, tok, store, top_k=10)
    gold = _uuid_lists(exact.retrieval_embeddings_batch(q, alpha=0.6))

    def recall(**kw):
        ret = CLIPRetrieval(
            model, params, tok, store, top_k=10, quantize_corpus="pq", **kw
        )
        return _recall(ret.retrieval_embeddings_batch(q, alpha=0.6), gold)

    r_rand, r_opq = recall(rotate=True), recall(rotate="opq")
    assert r_opq + 0.02 >= r_rand, (r_rand, r_opq)
    assert r_opq >= 0.8, r_opq

    full = CLIPRetrieval(
        model, params, tok, store, top_k=8,
        quantize_corpus="pq", rotate="opq", rerank=True, rerank_factor=N,
    )
    gold8 = exact.retrieval_embeddings_batch(q[:5], alpha=0.5, top_k=8)
    got = full.retrieval_embeddings_batch(q[:5], alpha=0.5)
    for g, r in zip(gold8, got):
        assert [x["uuid"] for x in g] == [x["uuid"] for x in r]
        np.testing.assert_allclose(
            [x["score"] for x in g], [x["score"] for x in r], atol=1e-5
        )


def test_opq_refusals(world):
    model, params, tok, store, _ = world
    with pytest.raises(ValueError, match="requires quantize_corpus='pq'"):
        CLIPRetrieval(
            model, params, tok, store, rotate="opq", quantize_corpus="int8"
        )
    with pytest.raises(ValueError, match="unknown rotate mode"):
        CLIPRetrieval(
            model, params, tok, store, rotate="bogus", quantize_corpus="pq"
        )


def test_rotate_refusals(world):
    model, params, tok, store, _ = world
    with pytest.raises(ValueError, match="rotate requires a packed corpus"):
        CLIPRetrieval(model, params, tok, store, rotate=True)
    with pytest.raises(ValueError, match="rotate does not compose with ann"):
        CLIPRetrieval(
            model, params, tok, store, rotate=True,
            quantize_corpus="int8", ann="ivf", ann_nlist=4,
        )
