"""Filtered / constrained retrieval tests.

TPU-native extension (the reference has no hard filters — its only
constraint mechanism is the post-hoc SPARQL score bonus,
``src/retrieval.py:23-76``): a bool row mask rides the compiled search
program as a RUNTIME operand, so changing the allow/deny filter re-executes
without recompiling; masked-out slots surface as the ``-1`` index sentinel.
Covers the ops layer (exact/q8/q4/sharded masked top-k vs oracles) and the
``CLIPRetrieval`` API (allow/deny uuid lists, per-query candidate scoring,
composition with packing / sharding / rerank).
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
from knowledge_enhanced_multimodal_retrieval_tpu.ops import similarity as S
from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime
from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.clip_retrieval import (
    CLIPRetrieval,
)
from tests.test_retrieval_engine import MERGES


def _corpus(rng, n=300, d=64, q=5):
    def norm(x):
        return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)

    return (
        norm(rng.standard_normal((q, d))),
        norm(rng.standard_normal((n, d))),
        norm(rng.standard_normal((n, d))),
    )


def _oracle(scores: np.ndarray, mask: np.ndarray, k: int):
    """Masked top-k oracle: -1 sentinel where fewer than k rows eligible."""
    s = np.where(mask, scores, -np.inf)
    idx = np.argsort(-s, axis=1)[:, :k]
    vals = np.take_along_axis(s, idx, axis=1)
    return vals, np.where(np.isfinite(vals), idx, -1)


# ---------------------------------------------------------------------------
# ops layer
# ---------------------------------------------------------------------------


def test_masked_topk_matches_oracle(rng):
    q, img, txt = _corpus(rng)
    mask = rng.random(img.shape[0]) < 0.4
    k = 12
    vals, idx = S.masked_similarity_topk(
        jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt), mask, k=k, alpha=0.7
    )
    ov, oi = _oracle(0.7 * q @ img.T + 0.3 * q @ txt.T, mask[None, :], k)
    np.testing.assert_array_equal(np.asarray(idx), oi)
    np.testing.assert_allclose(np.asarray(vals), ov, rtol=1e-5, atol=1e-6)


def test_masked_topk_per_query_masks(rng):
    """[Q, N] mask: each query sees a different eligible subset."""
    q, img, txt = _corpus(rng, q=4)
    mask = rng.random((4, img.shape[0])) < 0.3
    vals, idx = S.masked_similarity_topk(
        jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt), mask, k=8, alpha=0.5
    )
    ov, oi = _oracle(0.5 * (q @ img.T + q @ txt.T), mask, 8)
    np.testing.assert_array_equal(np.asarray(idx), oi)
    for qi in range(4):
        ok = np.asarray(idx)[qi][np.asarray(idx)[qi] >= 0]
        assert mask[qi][ok].all()


def test_masked_topk_sentinels_when_underfull(rng):
    """Fewer eligible rows than k: the dead slots carry idx == -1."""
    q, img, txt = _corpus(rng, q=2)
    mask = np.zeros(img.shape[0], bool)
    mask[[5, 17, 200]] = True
    vals, idx = S.masked_similarity_topk(
        jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt), mask, k=10, alpha=0.5
    )
    idx = np.asarray(idx)
    assert (idx[:, 3:] == -1).all()
    assert set(idx[:, :3].ravel()) == {5, 17, 200}


def test_masked_topk_q8_matches_q8_oracle(rng):
    """Same op order as the q8 scorer -> bit-exact index agreement."""
    q, img, txt = _corpus(rng)
    img_q, img_s = map(np.asarray, S.quantize_corpus(jnp.asarray(img)))
    txt_q, txt_s = map(np.asarray, S.quantize_corpus(jnp.asarray(txt)))
    mask = rng.random(img.shape[0]) < 0.5
    k = 9
    vals, idx = S.masked_similarity_topk_q8(
        jnp.asarray(q), jnp.asarray(img_q), jnp.asarray(img_s),
        jnp.asarray(txt_q), jnp.asarray(txt_s), mask, k=k, alpha=0.6,
    )
    scores = np.asarray(
        S.blended_scores_q8(
            jnp.asarray(q), jnp.asarray(img_q), jnp.asarray(img_s),
            jnp.asarray(txt_q), jnp.asarray(txt_s), 0.6,
        )
    )
    ov, oi = _oracle(scores, mask[None, :], k)
    np.testing.assert_array_equal(np.asarray(idx), oi)
    np.testing.assert_allclose(np.asarray(vals), ov, rtol=1e-5, atol=1e-6)


def test_masked_topk_q4_matches_q4_oracle(rng):
    q, img, txt = _corpus(rng, n=256)
    img_p, img_s = S.quantize_corpus_host_q4(img)
    txt_p, txt_s = S.quantize_corpus_host_q4(txt)
    mask = rng.random(img.shape[0]) < 0.5
    k = 7
    vals, idx = S.masked_similarity_topk_q4(
        jnp.asarray(q), img_p, img_s, txt_p, txt_s, mask, k=k, alpha=0.4
    )
    scores = np.asarray(
        S.blended_scores_q4(jnp.asarray(q), img_p, img_s, txt_p, txt_s, 0.4)
    )
    ov, oi = _oracle(scores, mask[None, :], k)
    np.testing.assert_array_equal(np.asarray(idx), oi)


@pytest.mark.parametrize("mode", ["exact", "q8"])
def test_sharded_masked_matches_unsharded(rng, devices8, mode):
    """8-way row-sharded masked top-k == the single-device masked result."""
    rt = MeshRuntime.create()
    q, img, txt = _corpus(rng, n=320, q=3)
    mask = rng.random((3, img.shape[0])) < 0.35
    k = 11
    if mode == "exact":
        args = (jnp.asarray(img), jnp.asarray(txt))
        lv, li = S.masked_similarity_topk(
            jnp.asarray(q), *args, mask, k=k, alpha=0.5
        )
    else:
        img_q, img_s = S.quantize_corpus(jnp.asarray(img))
        txt_q, txt_s = S.quantize_corpus(jnp.asarray(txt))
        args = (img_q, img_s, txt_q, txt_s)
        lv, li = S.masked_similarity_topk_q8(
            jnp.asarray(q), *args, mask, k=k, alpha=0.5
        )
    sv, si = S.sharded_masked_similarity_topk(
        jnp.asarray(q), args, mask, k=k, alpha=0.5, mesh=rt.mesh, mode=mode
    )
    np.testing.assert_allclose(np.asarray(sv), np.asarray(lv), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(li))


def test_normalize_mask_validates_shape(rng):
    with pytest.raises(ValueError):
        S.normalize_mask(np.ones(10, bool), n_queries=2, n_rows=12)
    with pytest.raises(ValueError):
        S.normalize_mask(np.ones((3, 12), bool), n_queries=2, n_rows=12)
    assert S.normalize_mask(np.ones(12, bool), 2, 12).shape == (1, 12)


# ---------------------------------------------------------------------------
# CLIPRetrieval API
# ---------------------------------------------------------------------------


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


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(),
        dict(quantize_corpus=True),
        dict(quantize_corpus="int4"),
        dict(rerank=True, rerank_factor=8),
    ],
    ids=["exact", "int8", "int4", "rerank"],
)
def test_allowlist_restricts_results(world, kwargs):
    """Allow-list search returns exactly the best-scoring allowed uuids, in
    the same order the unfiltered retriever ranks them."""
    model, params, tok, store, rt = world
    r = CLIPRetrieval(model, params, tok, store, top_k=48, **kwargs)
    full = r.retrieval("hello cat", alpha=0.5)  # full ranking, all 48 rows
    allow = {x["uuid"] for x in full[::3]}  # every 3rd row, arbitrary subset
    got = r.retrieval_filtered("hello cat", allow_uuids=allow, alpha=0.5, top_k=5)
    want = [x for x in full if x["uuid"] in allow][:5]
    assert [x["uuid"] for x in got] == [x["uuid"] for x in want]
    np.testing.assert_allclose(
        [x["score"] for x in got], [x["score"] for x in want], atol=1e-5
    )


def test_denylist_excludes(world):
    model, params, tok, store, rt = world
    r = CLIPRetrieval(model, params, tok, store, top_k=10)
    full = r.retrieval("green vase")
    deny = {full[0]["uuid"], full[2]["uuid"]}
    got = r.retrieval_filtered("green vase", deny_uuids=deny, top_k=10)
    assert not deny & {x["uuid"] for x in got}
    want = [x["uuid"] for x in full if x["uuid"] not in deny][:8]
    assert [x["uuid"] for x in got][: len(want)] == want


def test_filtered_underfull_returns_short_lists(world):
    model, params, tok, store, rt = world
    r = CLIPRetrieval(model, params, tok, store, top_k=10)
    allow = [f"uuid-{i:06d}" for i in (1, 7)] + ["not-a-real-uuid"]
    got = r.retrieval_filtered("hello", allow_uuids=allow)
    assert {x["uuid"] for x in got} == {"uuid-000001", "uuid-000007"}
    assert len(got) == 2  # unknown uuid ignored, no sentinels leak


def test_filtered_batch_per_query_shared_mask(world):
    model, params, tok, store, rt = world
    r = CLIPRetrieval(model, params, tok, store, top_k=5)
    allow = [f"uuid-{i:06d}" for i in range(0, 48, 2)]
    batches = r.retrieval_filtered_batch(
        ["hello cat", "world"], allow_uuids=allow, top_k=5
    )
    assert len(batches) == 2
    for res in batches:
        assert len(res) == 5
        assert all(x["uuid"] in set(allow) for x in res)


def test_filtered_sharded_matches_unsharded(world):
    model, params, tok, store, rt = world
    plain = CLIPRetrieval(model, params, tok, store, top_k=6)
    sharded = CLIPRetrieval(
        model, params, tok, store, top_k=6, rt=rt, shard_corpus=True
    )
    allow = [f"uuid-{i:06d}" for i in range(5, 40)]
    a = plain.retrieval_filtered("hello cat", allow_uuids=allow)
    b = sharded.retrieval_filtered("hello cat", allow_uuids=allow)
    assert [x["uuid"] for x in a] == [x["uuid"] for x in b]
    np.testing.assert_allclose(
        [x["score"] for x in a], [x["score"] for x in b], atol=1e-5
    )


def test_filtered_requires_filter_and_rejects_ivf(world):
    model, params, tok, store, rt = world
    r = CLIPRetrieval(model, params, tok, store, top_k=5)
    with pytest.raises(ValueError):
        r.retrieval_filtered("hello")  # neither allow nor deny
    ivf = CLIPRetrieval(model, params, tok, store, top_k=5, ann="ivf", ann_nlist=4)
    with pytest.raises(ValueError):
        ivf.retrieval_filtered("hello", allow_uuids=["uuid-000001"])


def test_filtered_embedding_direct(world):
    """Embedding-direct filtered search == text filtered search for the
    same query embedding (visual-search composition point)."""
    model, params, tok, store, rt = world
    r = CLIPRetrieval(model, params, tok, store, top_k=5)
    allow = [f"uuid-{i:06d}" for i in range(0, 48, 3)]
    q = np.asarray(r.encode_queries(["hello cat"]), np.float32)
    a = r.retrieval_filtered_embeddings_batch(q, allow_uuids=allow)[0]
    b = r.retrieval_filtered("hello cat", allow_uuids=allow)
    assert [x["uuid"] for x in a] == [x["uuid"] for x in b]


def test_candidates_batch_scores_exactly(world):
    """Per-query candidate scoring == the exact retriever's scores for
    those uuids, in descending order; unknown uuids ignored; works in ivf
    mode (host path, no cluster probing)."""
    model, params, tok, store, rt = world
    for kwargs in (dict(), dict(ann="ivf", ann_nlist=4)):
        r = CLIPRetrieval(model, params, tok, store, top_k=48, **kwargs)
        exact = CLIPRetrieval(model, params, tok, store, top_k=48)
        full = {x["uuid"]: x["score"] for x in exact.retrieval("hello cat")}
        cands = [
            ["uuid-000003", "uuid-000011", "nope", "uuid-000040"],
            ["uuid-000001"],
        ]
        out = r.retrieval_candidates_batch(["hello cat", "world"], cands, top_k=10)
        assert {x["uuid"] for x in out[0]} == {"uuid-000003", "uuid-000011", "uuid-000040"}
        scores = [x["score"] for x in out[0]]
        assert scores == sorted(scores, reverse=True)
        for x in out[0]:
            np.testing.assert_allclose(x["score"], full[x["uuid"]], atol=1e-5)
        assert [x["uuid"] for x in out[1]] == ["uuid-000001"]


def test_candidates_batch_validates_lengths(world):
    model, params, tok, store, rt = world
    r = CLIPRetrieval(model, params, tok, store, top_k=5)
    with pytest.raises(ValueError):
        r.retrieval_candidates_batch(["a", "b"], [["uuid-000001"]])


# ---------------------------------------------------------------------------
# RetrievalEngine + HTTP daemon
# ---------------------------------------------------------------------------


def _mk_engine(world, kg_uuid, top_k=40):
    import json as _json

    from knowledge_enhanced_multimodal_retrieval_tpu.knowledge import (
        FakeKGSparqlClient,
        FakeLLMClient,
        Text2SparqlRetrieval,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.engine import (
        RetrievalEngine,
    )

    model, params, tok, store, rt = world
    clip_r = CLIPRetrieval(model, params, tok, store, top_k=top_k)
    llm_json = {
        "distinct": True,
        "variables": [{"termType": "Variable", "value": "DigitalArtefact"}],
        "branches": [{"line": {"s": "DigitalArtefact", "p": "http://crm/P1", "o": "X_1",
                               "sType": ["http://kg/DigitalArtefact"]}}],
    }
    llm = FakeLLMClient({}, default=_json.dumps(llm_json))
    kg = FakeKGSparqlClient(entities={}, artefacts=[f"http://kg/artefact/{kg_uuid}"])
    return RetrievalEngine(clip_r, Text2SparqlRetrieval(llm, kg))


def test_engine_filtered_applies_bonus_within_allowed(world):
    """Hard filter restricts the pool; the SPARQL bonus reorders within it
    with the same alpha*clip + beta arithmetic as retrieve_text."""
    engine = _mk_engine(world, "uuid-000025")
    full = engine.retrieve_text_noknowledge("hello cat", threshold=-10)
    allow = [x["uuid"] for x in full[:10]] + ["uuid-000025"]
    out = engine.retrieve_text_filtered("hello cat", allow_uuids=allow, threshold=-10)
    assert set(x["uuid"] for x in out) <= set(allow)
    base = {x["uuid"]: x["score"] for x in full}
    got = {x["uuid"]: x["score"] for x in out}
    assert got["uuid-000025"] == pytest.approx(round(0.8 * base["uuid-000025"] + 0.2, 4), abs=2e-4)
    other = next(u for u in got if u != "uuid-000025")
    assert got[other] == pytest.approx(round(0.8 * base[other], 4), abs=2e-4)


def test_engine_filtered_without_t2s(world):
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.engine import (
        RetrievalEngine,
    )

    model, params, tok, store, rt = world
    engine = RetrievalEngine(
        CLIPRetrieval(model, params, tok, store, top_k=10), t2s_retriever=None
    )
    out = engine.retrieve_text_filtered(
        "hello cat", deny_uuids=["uuid-000000"], threshold=-10
    )
    assert out and "uuid-000000" not in {x["uuid"] for x in out}


def test_engine_constrained_scores_only_kg_hits(world):
    """Constrained mode: the KG hit is the ONLY result, scored
    alpha*clip + beta (every candidate is a SPARQL hit by construction)."""
    engine = _mk_engine(world, "uuid-000025")
    base = {x["uuid"]: x["score"] for x in engine.retrieve_text_noknowledge("hello cat", threshold=-10)}
    out = engine.retrieve_text_constrained("hello cat", threshold=-10)
    assert [x["uuid"] for x in out] == ["uuid-000025"]
    assert out[0]["score"] == pytest.approx(round(0.8 * base["uuid-000025"] + 0.2, 4), abs=2e-4)


def test_engine_constrained_fallback_on_empty_kg(world):
    """KG returns nothing: fallback=True degrades to plain CLIP ranking
    (alpha-scaled), fallback=False returns []."""
    engine = _mk_engine(world, "uuid-000025")
    engine.t2s_retriever = type("T", (), {"retrieval": staticmethod(lambda q: [])})()
    out = engine.retrieve_text_constrained("hello cat", threshold=-10)
    plain = engine.retrieve_text_noknowledge("hello cat", threshold=-10)
    assert [x["uuid"] for x in out[:5]] == [x["uuid"] for x in plain[:5]]
    assert engine.retrieve_text_constrained("hello cat", fallback=False, threshold=-10) == []


def test_engine_constrained_requires_t2s(world):
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.engine import (
        RetrievalEngine,
    )

    model, params, tok, store, rt = world
    engine = RetrievalEngine(
        CLIPRetrieval(model, params, tok, store, top_k=5), t2s_retriever=None
    )
    with pytest.raises(ValueError):
        engine.retrieve_text_constrained("hello")


def test_http_filtered_and_candidates_routes():
    """POST /search with allow/deny/candidates routes to the hooks; missing
    hooks -> 501; malformed filter payloads -> 400."""
    import json as _json
    import urllib.error
    from urllib.request import Request, urlopen

    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import (
        RetrievalHTTPServer,
    )

    calls = {}

    def batch_fn(queries):
        return [[{"uuid": f"hit-{q}", "score": 1.0}] for q in queries]

    def filtered_fn(queries, alphas, allow, deny):
        calls["filtered"] = (list(queries), list(alphas), allow, deny)
        return [[{"uuid": "filtered", "score": 0.5}] for _ in queries]

    def candidates_fn(queries, cands, alphas):
        calls["cands"] = (list(queries), [list(c) for c in cands], list(alphas))
        return [[{"uuid": c[0], "score": 0.4}] if c else [] for c in cands]

    def post(base, payload, path="/search"):
        req = Request(
            base + path, data=_json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        return _json.load(urlopen(req, timeout=10))

    with RetrievalHTTPServer(
        batch_fn, port=0, max_wait_ms=1.0,
        filtered_batch_fn=filtered_fn, candidates_batch_fn=candidates_fn,
    ) as srv:
        base = "http://%s:%d" % srv.address
        out = post(base, {"query": "vase", "allow_uuids": ["u1", "u2"], "alpha": 0.7})
        assert out["results"][0]["uuid"] == "filtered"
        assert calls["filtered"] == (["vase"], [0.7], ["u1", "u2"], None)

        out = post(base, {"queries": ["a", "b"], "deny_uuids": ["u3"]})
        assert len(out["results"]) == 2
        assert calls["filtered"][3] is None or calls["filtered"][2] is None

        out = post(base, {"query": "vase", "candidates": ["c1", "c2"]})
        assert out["results"][0]["uuid"] == "c1"
        assert calls["cands"][1] == [["c1", "c2"]]

        out = post(base, {"queries": ["a", "b"], "candidates": [["c1"], ["c2"]]})
        assert [r[0]["uuid"] for r in out["results"]] == ["c1", "c2"]

        for bad in (
            {"query": "v", "allow_uuids": ["u"], "candidates": [["c"]]},
            {"query": "v", "allow_uuids": "not-a-list"},
            {"queries": ["a", "b"], "candidates": [["c1"]]},  # length mismatch
        ):
            with pytest.raises(urllib.error.HTTPError) as ei:
                post(base, bad)
            assert ei.value.code == 400

    with RetrievalHTTPServer(batch_fn, port=0, max_wait_ms=1.0) as srv:
        base = "http://%s:%d" % srv.address
        for payload in (
            {"query": "v", "allow_uuids": ["u"]},
            {"query": "v", "candidates": ["c"]},
        ):
            with pytest.raises(urllib.error.HTTPError) as ei:
                post(base, payload)
            assert ei.value.code == 501
