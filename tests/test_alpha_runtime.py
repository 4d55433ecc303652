"""Runtime (per-query) alpha tests.

Alpha is a runtime operand of every search program — never a compile-time
constant — so (a) changing the blend re-executes instead of re-compiling,
and (b) a batch can mix per-query blends in ONE device program. Pinned
invariant: a per-query alpha vector gives exactly the same results as
running each query alone with its scalar alpha.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.ops import similarity as S
from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime
from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import ann


def _corpus(rng, n=300, d=64, q=4):
    norm = lambda x: (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)  # noqa: E731
    return (
        norm(rng.standard_normal((q, d))),
        norm(rng.standard_normal((n, d))),
        norm(rng.standard_normal((n, d))),
    )


ALPHAS = [0.2, 0.5, 0.8, 1.0]


def _per_query_equals_scalar(search_fn, q, k):
    """Batched per-query-alpha results == per-row scalar-alpha runs."""
    bv, bi = search_fn(jnp.asarray(q), np.asarray(ALPHAS, np.float32))
    for row, a in enumerate(ALPHAS):
        sv, si = search_fn(jnp.asarray(q[row : row + 1]), a)
        np.testing.assert_array_equal(np.asarray(bi)[row], np.asarray(si)[0])
        np.testing.assert_allclose(
            np.asarray(bv)[row], np.asarray(sv)[0], rtol=1e-5, atol=1e-6
        )


def test_xla_per_query_alpha(rng):
    q, img, txt = _corpus(rng)
    _per_query_equals_scalar(
        lambda qq, a: S.similarity_topk_xla(qq, jnp.asarray(img), jnp.asarray(txt), 7, a),
        q, 7,
    )


def test_fused_per_query_alpha(rng):
    q, img, txt = _corpus(rng)
    _per_query_equals_scalar(
        lambda qq, a: S.fused_similarity_topk(
            qq, jnp.asarray(img), jnp.asarray(txt), k=7, alpha=a, interpret=True
        ),
        q, 7,
    )


def test_fused_q8_per_query_alpha(rng):
    q, img, txt = _corpus(rng)
    iq, isc = S.quantize_corpus_host(img)
    tq, tsc = S.quantize_corpus_host(txt)
    _per_query_equals_scalar(
        lambda qq, a: S.fused_similarity_topk_q8(
            qq, iq, isc, tq, tsc, k=7, alpha=a, interpret=True
        ),
        q, 7,
    )


def test_fused_q4_per_query_alpha(rng):
    q, img, txt = _corpus(rng)
    ip, isc = S.quantize_corpus_host_q4(img)
    tp, tsc = S.quantize_corpus_host_q4(txt)
    _per_query_equals_scalar(
        lambda qq, a: S.fused_similarity_topk_q4(
            qq, ip, isc, tp, tsc, k=7, alpha=a, interpret=True
        ),
        q, 7,
    )


def test_sharded_per_query_alpha(rng, devices8):
    rt = MeshRuntime.create()
    q, img, txt = _corpus(rng, n=512)
    _per_query_equals_scalar(
        lambda qq, a: S.sharded_similarity_topk(
            qq, jnp.asarray(img), jnp.asarray(txt), k=7, alpha=a, mesh=rt.mesh
        ),
        q, 7,
    )


def test_ivf_per_query_alpha(rng):
    q, img, txt = _corpus(rng, n=256)
    index = ann.build_ivf_index(img, txt, 8)
    _per_query_equals_scalar(
        lambda qq, a: ann.ivf_search(qq, index, k=7, nprobe=8, alpha=a),  # full probe
        q, 7,
    )


def test_alpha_length_mismatch_raises(rng):
    q, img, txt = _corpus(rng, q=4)
    with pytest.raises(ValueError, match="alpha length"):
        S.similarity_topk_xla(jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt), 5, [0.5, 0.5])


def test_alpha_is_not_a_compile_dimension(rng):
    """Two different scalar alphas reuse ONE compiled program."""
    q, img, txt = _corpus(rng)

    @jax.jit
    def program(qq, a):
        return S.similarity_topk_xla(qq, jnp.asarray(img), jnp.asarray(txt), 5, a)

    program(jnp.asarray(q), jnp.float32(0.3))
    n0 = program._cache_size()
    program(jnp.asarray(q), jnp.float32(0.9))
    assert program._cache_size() == n0


def test_retriever_mixed_alpha_batch(world_retriever):
    """CLIPRetrieval.retrieval_batch with per-query alphas == per-query
    scalar calls, through the full serving path."""
    r = world_retriever
    queries = ["hello cat", "green vase", "old temple"]
    alphas = [0.2, 0.5, 0.9]
    mixed = r.retrieval_batch(queries, alpha=alphas)
    for q, a, got in zip(queries, alphas, mixed):
        want = r.retrieval(q, alpha=a)
        assert [x["uuid"] for x in got] == [x["uuid"] for x in want]


def test_http_per_request_alpha():
    """?alpha= rides the shared micro-batch; 400 when the hook is absent."""
    import json as json_mod
    import threading
    import urllib.error
    from urllib.request import urlopen

    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import RetrievalHTTPServer

    seen = []

    def alphas_batch_fn(queries, alphas):
        seen.append((list(queries), list(alphas)))
        return [[{"uuid": f"{q}@{a}", "score": 1.0}] for q, a in zip(queries, alphas)]

    with RetrievalHTTPServer(
        lambda qs: [[] for _ in qs], port=0, max_wait_ms=300.0,  # wide window: 1-core runner must not split the batch
        alphas_batch_fn=alphas_batch_fn,
    ) as srv:
        base = "http://{}:{}".format(*srv.address)
        out = {}

        def get(name, url):
            out[name] = json_mod.load(urlopen(url, timeout=10))

        # two concurrent requests with DIFFERENT alphas share one batch
        t1 = threading.Thread(target=get, args=("a", f"{base}/search?q=x&alpha=0.3"))
        t2 = threading.Thread(target=get, args=("b", f"{base}/search?q=y&alpha=0.8"))
        t1.start(), t2.start()
        t1.join(10), t2.join(10)
        assert out["a"]["results"][0]["uuid"] == "x@0.3"
        assert out["b"]["results"][0]["uuid"] == "y@0.8"
        assert len(seen) == 1  # ONE batch despite mixed alphas
        # missing alpha -> None passed to the hook (engine default)
        got = json_mod.load(urlopen(f"{base}/search?q=z", timeout=10))
        assert got["results"][0]["uuid"] == "z@None"
        # bad alpha -> 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            urlopen(f"{base}/search?q=x&alpha=wide", timeout=10)
        assert ei.value.code == 400
        # non-finite alpha -> 400 (would poison every blended score)
        with pytest.raises(urllib.error.HTTPError) as ei:
            urlopen(f"{base}/search?q=x&alpha=nan", timeout=10)
        assert ei.value.code == 400

    # without the hook: ?alpha= is a clean 400, plain search still works
    with RetrievalHTTPServer(
        lambda qs: [[{"uuid": q, "score": 1.0}] for q in qs], port=0, max_wait_ms=1.0
    ) as srv:
        base = "http://{}:{}".format(*srv.address)
        assert json_mod.load(urlopen(f"{base}/search?q=x", timeout=10))["results"]
        with pytest.raises(urllib.error.HTTPError) as ei:
            urlopen(f"{base}/search?q=x&alpha=0.5", timeout=10)
        assert ei.value.code == 400


@pytest.fixture(scope="module")
def world_retriever(devices8):
    from knowledge_enhanced_multimodal_retrieval_tpu.data.datasets import (
        DataPipeline,
        make_synthetic_source,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.clip_retrieval import (
        CLIPRetrieval,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.embedding_store import (
        build_embedding_store,
    )
    from tests.test_retrieval_engine import MERGES

    tok = CLIPTokenizer(MERGES)
    arch = M.CLIPArch(16, 32, 1, 32, 16, 16, tok.vocab_size, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    src = make_synthetic_source(40, image_size=32)
    pipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=2)
    rt = MeshRuntime.create()
    store = build_embedding_store(model, params, pipe, rt, batch_size=16)
    return CLIPRetrieval(model, params, tok, store, top_k=10)
