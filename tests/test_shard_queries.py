"""Query data parallelism (``CLIPRetrieval(shard_queries=True)``) tests.

TPU-native extension (the reference serves single queries on one GPU,
``src/retrieval.py:79``): query batches shard over the mesh's data axis
while params + corpus replicate on every device, so serving THROUGHPUT
scales linearly with the mesh — the dual of ``shard_corpus`` (which scales
corpus CAPACITY). The mode is a ``shard_map`` inside the same compiled
search programs; batches that don't divide the axis size pad inside jit.

Every test pins the sharded results against the unsharded retriever —
identical uuids and scores across corpus modes (exact / int8 / int4 /
binary+rerank / IVF / matryoshka), query modalities (text / embedding),
and the filtered path.
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

QUERIES = ["hello cat", "green vase", "a", "world trees"] * 3 + ["odd batch"]  # 13


def _norm(x):
    return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)


@pytest.fixture(scope="module")
def world(devices8):
    tok = CLIPTokenizer(MERGES)
    arch = M.CLIPArch(16, 32, 1, 32, 16, 16, tok.vocab_size, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    n, d = 48, arch.embed_dim
    store = EmbeddingStore(
        image=_norm(rng.standard_normal((n, d))),
        text=_norm(rng.standard_normal((n, d))),
        uuids=[f"uuid-{i:06d}" for i in range(n)],
    )
    return model, params, tok, store, MeshRuntime.create()


def _assert_same_results(a, b, atol=1e-5):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert [r["uuid"] for r in x] == [r["uuid"] for r in y]
        np.testing.assert_allclose(
            [r["score"] for r in x], [r["score"] for r in y], atol=atol
        )


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(),
        dict(quantize_corpus=True),
        dict(quantize_corpus="int4"),
        dict(quantize_corpus="binary", rerank=True, rerank_factor=8),
        dict(rerank=True, rerank_factor=4),
        dict(truncate_dim=8),
    ],
    ids=["exact", "int8", "int4", "binary+rerank", "rerank", "matryoshka"],
)
def test_query_dp_matches_unsharded(world, kwargs):
    """Sharded-query search == single-device search, every corpus mode.

    13 queries over 8 devices also exercises the in-jit pad-and-slice path.
    """
    model, params, tok, store, rt = world
    plain = CLIPRetrieval(model, params, tok, store, top_k=10, **kwargs)
    qdp = CLIPRetrieval(
        model, params, tok, store, top_k=10, rt=rt, shard_queries=True, **kwargs
    )
    _assert_same_results(
        plain.retrieval_batch(QUERIES, alpha=0.6),
        qdp.retrieval_batch(QUERIES, alpha=0.6),
    )


def test_query_dp_ivf_matches_unsharded(world):
    model, params, tok, store, rt = world
    kw = dict(top_k=5, ann="ivf", ann_nlist=4, ann_nprobe=4)
    plain = CLIPRetrieval(model, params, tok, store, **kw)
    qdp = CLIPRetrieval(model, params, tok, store, rt=rt, shard_queries=True, **kw)
    _assert_same_results(
        plain.retrieval_batch(QUERIES[:6]), qdp.retrieval_batch(QUERIES[:6])
    )


def test_query_dp_per_query_alphas(world):
    """Mixed per-query blends ride ONE sharded program, matching unsharded."""
    model, params, tok, store, rt = world
    plain = CLIPRetrieval(model, params, tok, store, top_k=6)
    qdp = CLIPRetrieval(model, params, tok, store, top_k=6, rt=rt, shard_queries=True)
    alphas = [0.1, 0.4, 0.7, 1.0, 0.5]
    _assert_same_results(
        plain.retrieval_batch(QUERIES[:5], alpha=alphas),
        qdp.retrieval_batch(QUERIES[:5], alpha=alphas),
    )


def test_query_dp_filtered(world):
    """Shared [N] mask replicates; results match the unsharded filter."""
    model, params, tok, store, rt = world
    plain = CLIPRetrieval(model, params, tok, store, top_k=5)
    qdp = CLIPRetrieval(model, params, tok, store, top_k=5, rt=rt, shard_queries=True)
    allow = [f"uuid-{i:06d}" for i in range(0, 48, 2)]
    a = plain.retrieval_filtered_batch(QUERIES[:5], allow_uuids=allow, top_k=5)
    b = qdp.retrieval_filtered_batch(QUERIES[:5], allow_uuids=allow, top_k=5)
    _assert_same_results(a, b)


def test_query_dp_embedding_direct(world):
    """Embedding-direct queries (visual-search path) shard the same way."""
    model, params, tok, store, rt = world
    rng = np.random.default_rng(3)
    q = _norm(rng.standard_normal((7, store.dim)))
    plain = CLIPRetrieval(model, params, tok, store, top_k=8)
    qdp = CLIPRetrieval(model, params, tok, store, top_k=8, rt=rt, shard_queries=True)
    _assert_same_results(
        plain.retrieval_embeddings_batch(q), qdp.retrieval_embeddings_batch(q)
    )


def test_query_dp_committed_inputs(world):
    """Device-committed query embeddings (e.g. another single-device
    program's output) must replicate inside the sharded paths instead of
    raising 'incompatible devices' — both the plain embedding-direct and
    the filtered embedding-direct entry points."""
    model, params, tok, store, rt = world
    rng = np.random.default_rng(5)
    q = _norm(rng.standard_normal((5, store.dim)))
    committed = jax.device_put(jnp.asarray(q), jax.devices()[0])
    plain = CLIPRetrieval(model, params, tok, store, top_k=6)
    qdp = CLIPRetrieval(model, params, tok, store, top_k=6, rt=rt, shard_queries=True)
    _assert_same_results(
        plain.retrieval_embeddings_batch(q),
        qdp.retrieval_embeddings_batch(committed),
    )
    allow = [f"uuid-{i:06d}" for i in range(0, 48, 3)]
    _assert_same_results(
        plain.retrieval_filtered_embeddings_batch(q, allow_uuids=allow),
        qdp.retrieval_filtered_embeddings_batch(committed, allow_uuids=allow),
    )


def test_query_dp_live_updates_stay_replicated(world):
    """add_documents rebuilds the replicated corpus state; search still serves."""
    model, params, tok, store, rt = world
    rng = np.random.default_rng(11)
    qdp = CLIPRetrieval(
        model, params, tok, store, top_k=5, rt=rt,
        shard_queries=True, capacity_multiple=16,
    )
    qdp.add_documents(
        _norm(rng.standard_normal((3, store.dim))),
        _norm(rng.standard_normal((3, store.dim))),
        ["new-1", "new-2", "new-3"],
    )
    plain = CLIPRetrieval(
        model, params, tok,
        store.with_added(*(np.asarray(a) for a in (qdp.store.image[48:51], qdp.store.text[48:51])), ["new-1", "new-2", "new-3"]),
        top_k=5,
    )
    _assert_same_results(
        plain.retrieval_batch(QUERIES[:3]), qdp.retrieval_batch(QUERIES[:3])
    )


def test_query_dp_excludes_shard_corpus(world):
    model, params, tok, store, rt = world
    with pytest.raises(ValueError, match="shard_queries and shard_corpus"):
        CLIPRetrieval(
            model, params, tok, store, rt=rt, shard_queries=True, shard_corpus=True
        )


def test_query_dp_single_query_and_exact_multiple(world):
    """Batch sizes of 1 (full pad) and exactly 8 (no pad) both serve."""
    model, params, tok, store, rt = world
    plain = CLIPRetrieval(model, params, tok, store, top_k=4)
    qdp = CLIPRetrieval(model, params, tok, store, top_k=4, rt=rt, shard_queries=True)
    _assert_same_results(
        [plain.retrieval("hello cat")], [qdp.retrieval("hello cat")]
    )
    _assert_same_results(
        plain.retrieval_batch(QUERIES[:8]), qdp.retrieval_batch(QUERIES[:8])
    )
