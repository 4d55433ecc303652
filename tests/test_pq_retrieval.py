"""Product-quantized corpus tier through ``CLIPRetrieval(quantize_corpus="pq")``.

TPU-native extension (no reference counterpart — its corpus lives as f32
numpy, ``src/clip/clip_retrieval.py:26-37``): binary-sketch footprint (~30x
f32 capacity) at approximate-inner-product score quality. Composition seams
pinned here: rerank (full-width fetch == exact brute force), rotate,
shard_corpus, shard_queries, filtered search, matryoshka, live updates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime
from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.clip_retrieval import (
    CLIPRetrieval,
)
from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.embedding_store import (
    EmbeddingStore,
)
from tests.test_retrieval_engine import MERGES

N, D = 384, 64


def _clustered(rng, n, clusters=16):
    centers = rng.standard_normal((clusters, D)).astype(np.float32)
    v = centers[rng.integers(0, clusters, n)] + 0.2 * rng.standard_normal(
        (n, D)
    ).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def world(devices8):
    tok = CLIPTokenizer(MERGES)
    arch = M.CLIPArch(D, 32, 1, 32, 16, 16, tok.vocab_size, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    store = EmbeddingStore(
        image=_clustered(rng, N),
        text=_clustered(rng, N),
        uuids=[f"u{i:05d}" for i in range(N)],
    )
    q = _clustered(rng, 24)
    return model, params, tok, store, q


def _uuid_lists(results):
    return [[r["uuid"] for r in res] for res in results]


def _recall(results, gold):
    return float(
        np.mean(
            [len(set(g) & set(r)) / len(g) for g, r in zip(gold, _uuid_lists(results))]
        )
    )


def test_pq_recall_vs_exact(world):
    model, params, tok, store, q = world
    exact = CLIPRetrieval(model, params, tok, store, top_k=10)
    gold = _uuid_lists(exact.retrieval_embeddings_batch(q, alpha=0.6))
    pq = CLIPRetrieval(model, params, tok, store, top_k=10, quantize_corpus="pq")
    r = _recall(pq.retrieval_embeddings_batch(q, alpha=0.6), gold)
    assert r >= 0.85, r


def test_pq_full_fetch_rerank_is_exact(world):
    """rerank with factor*k >= corpus restores the exact f32 ranking: PQ
    scores only ever GENERATE candidates, the host f32 store rescores."""
    model, params, tok, store, q = world
    exact = CLIPRetrieval(model, params, tok, store, top_k=8)
    gold = exact.retrieval_embeddings_batch(q[:6], alpha=0.5)
    pq = CLIPRetrieval(
        model, params, tok, store, top_k=8,
        quantize_corpus="pq", rerank=True, rerank_factor=N,
    )
    got = pq.retrieval_embeddings_batch(q[:6], alpha=0.5)
    for g, r in zip(gold, got):
        assert [x["uuid"] for x in g] == [x["uuid"] for x in r]
        np.testing.assert_allclose(
            [x["score"] for x in g], [x["score"] for x in r], atol=1e-5
        )


def test_pq_text_queries_and_determinism(world):
    model, params, tok, store, _ = world
    kw = dict(quantize_corpus="pq", top_k=6)
    a = CLIPRetrieval(model, params, tok, store, **kw)
    b = CLIPRetrieval(model, params, tok, store, **kw)
    queries = ["hello cat", "green vase", "world trees"]
    ra, rb = a.retrieval_batch(queries), b.retrieval_batch(queries)
    assert _uuid_lists(ra) == _uuid_lists(rb)
    for x, y in zip(ra, rb):
        np.testing.assert_array_equal(
            [r["score"] for r in x], [r["score"] for r in y]
        )


def test_pq_composes_with_rotate(world):
    """rotate=True stages codebooks in the rotated space (OPQ-lite); recall
    stays high and full-fetch rerank still restores the exact ranking."""
    model, params, tok, store, q = world
    exact = CLIPRetrieval(model, params, tok, store, top_k=8)
    gold = exact.retrieval_embeddings_batch(q[:6], alpha=0.5)
    rot = CLIPRetrieval(
        model, params, tok, store, top_k=8,
        quantize_corpus="pq", rotate=True, rerank=True, rerank_factor=N,
    )
    got = rot.retrieval_embeddings_batch(q[:6], alpha=0.5)
    for g, r in zip(gold, got):
        assert [x["uuid"] for x in g] == [x["uuid"] for x in r]


def test_pq_composes_with_shard_corpus(world):
    model, params, tok, store, q = world
    kw = dict(quantize_corpus="pq", top_k=6)
    plain = CLIPRetrieval(model, params, tok, store, **kw)
    sc = CLIPRetrieval(
        model, params, tok, store, rt=MeshRuntime.create(), shard_corpus=True, **kw
    )
    a = plain.retrieval_embeddings_batch(q[:5], alpha=0.4)
    b = sc.retrieval_embeddings_batch(q[:5], alpha=0.4)
    assert _uuid_lists(a) == _uuid_lists(b)


def test_pq_composes_with_shard_queries(world):
    model, params, tok, store, q = world
    kw = dict(quantize_corpus="pq", top_k=6)
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


def test_pq_filtered_search(world):
    model, params, tok, store, q = world
    allow = [f"u{i:05d}" for i in range(0, N, 3)]
    exact = CLIPRetrieval(model, params, tok, store, top_k=5)
    pq = CLIPRetrieval(
        model, params, tok, store, top_k=5,
        quantize_corpus="pq", rerank=True, rerank_factor=N,
    )
    a = exact.retrieval_filtered_embeddings_batch(q[:5], allow_uuids=allow)
    b = pq.retrieval_filtered_embeddings_batch(q[:5], allow_uuids=allow)
    assert _uuid_lists(a) == _uuid_lists(b)
    for res in b:
        assert all(r["uuid"] in set(allow) for r in res)


def test_pq_filtered_sharded(world):
    model, params, tok, store, q = world
    allow = [f"u{i:05d}" for i in range(0, N, 2)]
    kw = dict(quantize_corpus="pq", top_k=5)
    plain = CLIPRetrieval(model, params, tok, store, **kw)
    sc = CLIPRetrieval(
        model, params, tok, store, rt=MeshRuntime.create(), shard_corpus=True, **kw
    )
    a = plain.retrieval_filtered_embeddings_batch(q[:4], allow_uuids=allow)
    b = sc.retrieval_filtered_embeddings_batch(q[:4], allow_uuids=allow)
    assert _uuid_lists(a) == _uuid_lists(b)


def test_pq_composes_with_matryoshka(world):
    """truncate_dim + pq: codebooks train in the staged prefix space (pq_m
    follows the prefix width); full-fetch rerank restores full-dim exact."""
    model, params, tok, store, q = world
    exact = CLIPRetrieval(model, params, tok, store, top_k=6)
    gold = exact.retrieval_embeddings_batch(q[:5], alpha=0.5)
    pq = CLIPRetrieval(
        model, params, tok, store, top_k=6,
        quantize_corpus="pq", truncate_dim=32, pq_m=4,
        rerank=True, rerank_factor=N,
    )
    got = pq.retrieval_embeddings_batch(q[:5], alpha=0.5)
    for g, r in zip(gold, got):
        assert [x["uuid"] for x in g] == [x["uuid"] for x in r]


def test_pq_survives_live_updates(world):
    """add_documents retrains the codebooks on the rebuilt corpus; the
    result matches a fresh build over the same rows (deterministic seed)."""
    model, params, tok, store, q = world
    rng = np.random.default_rng(29)
    ret = CLIPRetrieval(
        model, params, tok, store, top_k=5, quantize_corpus="pq",
        capacity_multiple=16,
    )
    new_i, new_t = _clustered(rng, 2), _clustered(rng, 2)
    ret.add_documents(new_i, new_t, ["new-1", "new-2"])
    fresh = CLIPRetrieval(
        model, params, tok,
        store.with_added(new_i, new_t, ["new-1", "new-2"]),
        top_k=5, quantize_corpus="pq", capacity_multiple=16,
    )
    a = ret.retrieval_embeddings_batch(q[:4])
    b = fresh.retrieval_embeddings_batch(q[:4])
    assert _uuid_lists(a) == _uuid_lists(b)


def test_ivf_pq_wide_probe_guardrail(world):
    """IVF-PQ batch searches past the ADC lookup budget raise with the
    estimated cost instead of silently serving ~1 s/batch (the scalarized
    per-query LUT walk); narrow probes / single queries stay under budget,
    and the guard is tunable/disable-able (ann_max_batch_lookups)."""
    model, params, tok, store, q = world
    r = CLIPRetrieval(
        model, params, tok, store, top_k=5,
        ann="ivf", ann_nlist=8, ann_nprobe=8,
        quantize_corpus="pq", pq_m=8,
        ann_max_batch_lookups=20_000,
    )
    # single query: 1 * 8 * cap * 8 lookups — under the budget, serves fine
    assert r.retrieval_embeddings_batch(q[:1], alpha=0.5)[0]
    # a 24-query batch at full probe blows the budget -> explicit refusal
    with pytest.raises(ValueError, match="wide-probe"):
        r.retrieval_embeddings_batch(q, alpha=0.5)
    with pytest.raises(ValueError, match="wide-probe"):
        r.retrieval_batch(["hello cat"] * 24)
    # same config with the guard disabled serves the batch (slowly)
    r_off = CLIPRetrieval(
        model, params, tok, store, top_k=5,
        ann="ivf", ann_nlist=8, ann_nprobe=8,
        quantize_corpus="pq", pq_m=8,
        ann_max_batch_lookups=0,
    )
    assert len(r_off.retrieval_embeddings_batch(q, alpha=0.5)) == 24
    # non-pq ivf tiers never consult the budget (dense-einsum probes)
    r_i8 = CLIPRetrieval(
        model, params, tok, store, top_k=5,
        ann="ivf", ann_nlist=8, ann_nprobe=8,
        quantize_corpus="int8", ann_max_batch_lookups=1,
    )
    assert len(r_i8.retrieval_embeddings_batch(q, alpha=0.5)) == 24


def test_pq_refusals(world):
    model, params, tok, store, _ = world
    # pq + ann='ivf' (IVF-PQ) and int4 + ann='ivf' (IVFSQ4) are supported
    # compositions (tests/test_ann.py); binary stays refused (Hamming proxy)
    with pytest.raises(ValueError, match="does not compose with ann"):
        CLIPRetrieval(
            model, params, tok, store, quantize_corpus="binary", ann="ivf",
            ann_nlist=4, rerank=True,
        )
    with pytest.raises(ValueError, match="divide"):
        CLIPRetrieval(model, params, tok, store, quantize_corpus="pq", pq_m=7)
