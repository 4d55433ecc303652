"""Host-side exact rerank tests (CLIPRetrieval(rerank=True)).

Two-tier serving: the device scans the PACKED corpus (int8/int4/IVF) and
over-fetches rerank_factor x k candidates; the f32 corpus already resident
in host RAM (EmbeddingStore) rescores those rows exactly. With a fetch wide
enough to contain the true winners, the final top-k equals the exact
brute-force ranking bit-for-bit in f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.data.datasets import (
    DataPipeline,
    make_synthetic_source,
)
from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime
from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.clip_retrieval import CLIPRetrieval
from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.embedding_store import EmbeddingStore
from tests.test_retrieval_engine import MERGES


@pytest.fixture(scope="module")
def world(devices8):
    tok = CLIPTokenizer(MERGES)
    arch = M.CLIPArch(16, 32, 1, 32, 16, 16, tok.vocab_size, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    src = make_synthetic_source(48, image_size=32)
    pipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=2)
    rt = MeshRuntime.create()
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.embedding_store import (
        build_embedding_store,
    )

    store = build_embedding_store(model, params, pipe, rt, batch_size=16)
    return model, params, tok, store, rt


@pytest.mark.parametrize("packing", ["int8", "int4", "binary"])
def test_rerank_recovers_exact_ranking(world, packing):
    """Packed corpus + full-width rerank == the exact retriever, exactly:
    fetching factor*k >= n candidates makes the rerank a complete exact
    rescore, so quantization cannot affect the final list at all."""
    model, params, tok, store, rt = world
    exact = CLIPRetrieval(model, params, tok, store, top_k=10)
    packed = CLIPRetrieval(
        model, params, tok, store, top_k=10,
        quantize_corpus=packing, rerank=True, rerank_factor=8,  # 80 >= 48 rows
    )
    for query in ("hello cat", "green vase"):
        a = exact.retrieval(query, alpha=0.5)
        b = packed.retrieval(query, alpha=0.5)
        assert [x["uuid"] for x in a] == [x["uuid"] for x in b]
        np.testing.assert_allclose(
            [x["score"] for x in a], [x["score"] for x in b], atol=1e-5
        )


def test_rerank_narrow_fetch_improves_int4(world):
    """Even a narrow fetch (factor 2) reranks what it sees: overlap with the
    exact top-k is >= the raw int4 ordering's (rerank can only fix, never
    break, the fetched candidates' order)."""
    model, params, tok, store, rt = world
    exact = CLIPRetrieval(model, params, tok, store, top_k=10)
    raw = CLIPRetrieval(model, params, tok, store, top_k=10, quantize_corpus="int4")
    rr = CLIPRetrieval(
        model, params, tok, store, top_k=10,
        quantize_corpus="int4", rerank=True, rerank_factor=2,
    )
    q = "hello cat"
    top_exact = [x["uuid"] for x in exact.retrieval(q)]
    top_raw = [x["uuid"] for x in raw.retrieval(q)]
    top_rr = [x["uuid"] for x in rr.retrieval(q)]
    overlap = lambda xs: len(set(xs) & set(top_exact))  # noqa: E731
    assert overlap(top_rr) >= overlap(top_raw)
    # reranked scores are the exact f32 scores for the rows it returns
    exact_by_uuid = {x["uuid"]: x["score"] for x in exact.retrieval(q, top_k=48)}
    for x in rr.retrieval(q):
        assert x["score"] == pytest.approx(exact_by_uuid[x["uuid"]], abs=1e-5)


def test_rerank_composes_with_ann(world):
    """IVF + int8 + rerank: full probe + full-width rerank == exact."""
    model, params, tok, store, rt = world
    exact = CLIPRetrieval(model, params, tok, store, top_k=8)
    r = CLIPRetrieval(
        model, params, tok, store, top_k=8,
        ann="ivf", ann_nlist=4, ann_nprobe=4, quantize_corpus="int8",
        rerank=True, rerank_factor=6,  # 48 = every row
    )
    a = exact.retrieval("hello cat")
    b = r.retrieval("hello cat")
    assert [x["uuid"] for x in a] == [x["uuid"] for x in b]


def test_rerank_embedding_and_image_paths(world):
    """Rerank applies to embedding-direct and image queries too."""
    model, params, tok, store, rt = world
    rr = CLIPRetrieval(
        model, params, tok, store, top_k=5,
        quantize_corpus="int4", rerank=True, rerank_factor=10,
    )
    out = rr.retrieval_embeddings_batch(store.image[:3], alpha=1.0)
    for i, results in enumerate(out):
        assert results[0]["uuid"] == store.uuids[i]
        assert results[0]["score"] == pytest.approx(1.0, abs=1e-5)
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    assert len(rr.retrieval_image(img)) == 5


def test_rerank_streaming_batches(world):
    """retrieval_batches (pipelined) rides the same rerank path."""
    model, params, tok, store, rt = world
    exact = CLIPRetrieval(model, params, tok, store, top_k=6)
    rr = CLIPRetrieval(
        model, params, tok, store, top_k=6,
        quantize_corpus="int8", rerank=True, rerank_factor=8,
    )
    batches = [["hello cat", "green vase"], ["old temple"]]
    got = [r for batch in rr.retrieval_batches(batches) for r in batch]
    want = [r for batch in exact.retrieval_batches(batches) for r in batch]
    assert [[x["uuid"] for x in r] for r in got] == [[x["uuid"] for x in r] for r in want]


def test_rerank_with_exact_corpus_is_consistent(world):
    """rerank over an exact (unpacked) corpus returns the same top-k (it
    only upgrades score precision bf16 -> f32)."""
    model, params, tok, store, rt = world
    base = CLIPRetrieval(model, params, tok, store, top_k=10)
    rr = CLIPRetrieval(model, params, tok, store, top_k=10, rerank=True)
    a = base.retrieval("hello cat")
    b = rr.retrieval("hello cat")
    assert {x["uuid"] for x in a} == {x["uuid"] for x in b}


def test_rerank_composes_with_sharded_corpus(world):
    """rerank x shard_corpus x int8: sharded search returns GLOBAL row ids,
    so the host rescore maps them through the one whole host store."""
    model, params, tok, store, rt = world
    exact = CLIPRetrieval(model, params, tok, store, top_k=6)
    rr = CLIPRetrieval(
        model, params, tok, store, top_k=6, rt=rt, shard_corpus=True,
        quantize_corpus="int8", rerank=True, rerank_factor=8,
    )
    a = exact.retrieval("hello cat")
    b = rr.retrieval("hello cat")
    assert [x["uuid"] for x in a] == [x["uuid"] for x in b]
    np.testing.assert_allclose(
        [x["score"] for x in a], [x["score"] for x in b], atol=1e-5
    )


def test_warmup_composes_with_packed_corpus(world):
    """warmup() precompiles the int4 + rerank search program too."""
    model, params, tok, store, rt = world
    r = CLIPRetrieval(
        model, params, tok, store, top_k=5, quantize_corpus="int4",
        rerank=True, rerank_factor=4,
    )
    assert r.warmup([2], alpha=0.5) == 1
    assert len(r.retrieval_batch(["hello cat", "green vase"])) == 2


def test_rerank_factor_validation(world):
    model, params, tok, store, rt = world
    with pytest.raises(ValueError, match="rerank_factor"):
        CLIPRetrieval(model, params, tok, store, rerank=True, rerank_factor=0)


def test_warmup_precompiles_buckets(world):
    """warmup() executes one program per (batch, seq-bucket) and the warmed
    shapes then serve without tracing again (jit cache hit)."""
    model, params, tok, store, rt = world
    r = CLIPRetrieval(model, params, tok, store, top_k=5)
    n = r.warmup([1, 4], alpha=0.5)
    assert n == 2  # tiny arch: one seq bucket (context 16)
    traced = r._search_program._cache_size() if hasattr(r._search_program, "_cache_size") else None
    assert r.retrieval("hello cat", alpha=0.5)  # warmed single-query path
    if traced is not None:
        assert r._search_program._cache_size() == traced  # no new compile


def test_warmup_image_program(world):
    model, params, tok, store, rt = world
    r = CLIPRetrieval(model, params, tok, store, top_k=5)
    n = r.warmup([2], alpha=0.5, image=True)
    assert n == 2  # text bucket + image program
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8) for _ in range(2)]
    assert len(r.retrieval_image_batch(imgs)) == 2


def test_warmup_validates_batch_size(world):
    model, params, tok, store, rt = world
    r = CLIPRetrieval(model, params, tok, store, top_k=5)
    with pytest.raises(ValueError, match="batch size"):
        r.warmup([0])


def test_rerank_survives_live_update(world):
    """After add_documents, rerank maps candidates through the NEW store."""
    model, params, tok, store, rt = world
    rr = CLIPRetrieval(
        model, params, tok, store, top_k=5,
        quantize_corpus="int8", rerank=True, rerank_factor=8,
        capacity_multiple=16,
    )
    rng = np.random.default_rng(9)
    new = rng.standard_normal((2, store.dim)).astype(np.float32)
    new /= np.linalg.norm(new, axis=1, keepdims=True)
    rr.add_documents(new, new, ["new-a", "new-b"])
    out = rr.retrieval_embeddings_batch(new[:1], alpha=1.0)[0]
    assert out[0]["uuid"] == "new-a"
    assert out[0]["score"] == pytest.approx(1.0, abs=1e-5)
