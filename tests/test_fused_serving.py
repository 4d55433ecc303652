"""Learned-fusion serving (CLIPRetrieval.retrieval_fused_batch +
FusionModel.candidate_scores).

TPU-native extension closing a reference gap: the reference trains 6 fusion
heads (``src/clip/model/fusion_model.py``) but never serves them — its
serving path is the fixed linear blend. Here stage-1 fetches blended top-
(factor·k) candidates on device and stage-2 rescoring runs a TRAINED head
over the candidates' exact f32 store rows, in every corpus mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.models.fusion_heads import FusionModel
from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.clip_retrieval import (
    CLIPRetrieval,
)


def _normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.mark.parametrize("fusion_type", ["linear", "simple_gated", "bilinear"])
def test_candidate_scores_match_full_matrix(rng, fusion_type):
    """candidate_scores == the [N, M] scores matrix gathered at the
    candidate columns (same head semantics, per-query candidate sets)."""
    d = 16
    fm = FusionModel(fusion_type, embed_dim=d)
    params = fm.init(jax.random.PRNGKey(0))
    q = jnp.asarray(_normed(rng, 4, d))
    img = jnp.asarray(_normed(rng, 12, d))
    tgt = jnp.asarray(_normed(rng, 12, d))
    full = np.asarray(fm.scores(params, q, img, tgt))  # [4, 12]
    cand = np.stack([rng.permutation(12)[:5] for _ in range(4)])  # [4, 5]
    got = np.asarray(
        fm.candidate_scores(
            params, q, jnp.asarray(np.asarray(img)[cand]), jnp.asarray(np.asarray(tgt)[cand])
        )
    )
    want = np.take_along_axis(full, cand, axis=1)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


@pytest.fixture(scope="module")
def world(devices8):
    from knowledge_enhanced_multimodal_retrieval_tpu.data.datasets import (
        DataPipeline,
        make_synthetic_source,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.embedding_store import (
        build_embedding_store,
    )
    from tests.test_retrieval_engine import MERGES

    tok = CLIPTokenizer(MERGES)
    arch = M.CLIPArch(16, 32, 1, 32, 16, 16, tok.vocab_size, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    src = make_synthetic_source(48, image_size=32)
    pipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=2)
    rt = MeshRuntime.create()
    store = build_embedding_store(model, params, pipe, rt, batch_size=16)
    return model, params, tok, store, rt


@pytest.mark.parametrize("quantize_corpus", [False, True, "int4"],
                         ids=["bf16", "int8", "int4"])
def test_fused_serving_big_k_fetch(rng, devices8, quantize_corpus):
    """Stage-1 candidate fetch past the fused kernel's 128 cap (factor*k >
    128) must route through the segmented selection in every packing —
    the r3 NotImplementedError is lifted. Full fetch => the head's exact
    full-corpus ranking."""
    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.embedding_store import (
        EmbeddingStore,
    )
    from tests.test_retrieval_engine import MERGES

    tok = CLIPTokenizer(MERGES)
    arch = M.CLIPArch(16, 32, 1, 32, 16, 16, tok.vocab_size, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    n = 300
    store = EmbeddingStore(
        _normed(rng, n, 16), _normed(rng, n, 16), [f"u{i}" for i in range(n)]
    )
    fm = FusionModel("linear", embed_dim=16)
    fparams = fm.init(jax.random.PRNGKey(1))
    r = CLIPRetrieval(
        model, params, tok, store, top_k=64, quantize_corpus=quantize_corpus
    )
    got = r.retrieval_fused_batch(["hello cat"], fm, fparams, top_k=64, factor=8)[0]
    assert len(got) == 64  # fetch = min(8 * 64, 300) = 300 > 128
    want = _head_oracle(r, fm, fparams, ["hello cat"], store, n)[0][:64]
    assert [x["uuid"] for x in got] == [f"u{i}" for i in want]


def _head_oracle(r, fm, fparams, queries, store, n):
    """Full-corpus head ranking computed densely (the serving ground truth)."""
    q = np.asarray(r.encode_queries(queries), np.float32)
    full = np.asarray(
        fm.scores(fparams, jnp.asarray(q), jnp.asarray(store.image[:n]), jnp.asarray(store.text[:n]))
    )
    return np.argsort(-full, axis=1, kind="stable")


@pytest.mark.parametrize(
    "kwargs", [dict(), dict(quantize_corpus=True), dict(ann="ivf", ann_nlist=4)],
    ids=["exact", "int8", "ivf"],
)
def test_fused_serving_full_fetch_equals_head_ranking(world, kwargs):
    """factor*k >= corpus: stage-2 IS the head's exact full ranking,
    regardless of how stage-1 packed/probed the corpus."""
    model, params, tok, store, rt = world
    fm = FusionModel("simple_gated", embed_dim=16)
    fparams = fm.init(jax.random.PRNGKey(1))
    r = CLIPRetrieval(model, params, tok, store, top_k=6, **kwargs)
    queries = ["hello cat", "world"]
    if kwargs.get("ann") == "ivf":
        # full fetch needs every row probed
        r.calibrate_nprobe(target_recall=1.0, k=10, sample=16)
    got = r.retrieval_fused_batch(queries, fm, fparams, top_k=6, factor=8)
    oracle = _head_oracle(r, fm, fparams, queries, store, 48)
    uuids = store.uuids
    for qi, res in enumerate(got):
        want = [uuids[i] for i in oracle[qi][:6]]
        assert [x["uuid"] for x in res] == want


def test_fused_serving_narrow_fetch_subset(world):
    """Narrow fetch (factor 1): results come from the stage-1 candidate set,
    reranked by the head."""
    model, params, tok, store, rt = world
    fm = FusionModel("linear", embed_dim=16)
    fparams = fm.init(jax.random.PRNGKey(2))
    r = CLIPRetrieval(model, params, tok, store, top_k=5)
    stage1 = {x["uuid"] for x in r.retrieval("hello cat", top_k=5)}
    fused = r.retrieval_fused("hello cat", fm, fparams, top_k=5, factor=1)
    assert {x["uuid"] for x in fused} == stage1  # same set, head-reordered
    scores = [x["score"] for x in fused]
    assert scores == sorted(scores, reverse=True)


def test_save_load_fusion_head_roundtrip(tmp_path, rng):
    from knowledge_enhanced_multimodal_retrieval_tpu.train.fusion_trainer import (
        load_fusion_head,
        save_fusion_head,
    )

    d = 16
    fm = FusionModel("simple_gated_with_bias", embed_dim=d)
    params = fm.init(jax.random.PRNGKey(3))
    path = str(tmp_path / "head.npz")
    save_fusion_head(path, fm, params)
    fm2, params2 = load_fusion_head(path)
    assert fm2.fusion_type == "simple_gated_with_bias" and fm2.embed_dim == d
    q = jnp.asarray(_normed(rng, 3, d))
    i = jnp.asarray(_normed(rng, 5, d))
    t = jnp.asarray(_normed(rng, 5, d))
    np.testing.assert_array_equal(
        np.asarray(fm.scores(params, q, i, t)), np.asarray(fm2.scores(params2, q, i, t))
    )


class _FakeT2S:
    def __init__(self, hits):
        self.hits = hits

    def retrieval(self, query):
        return self.hits


def test_engine_fused_applies_sparql_bonus(world):
    """Engine-level fused retrieval: head scores get the same alpha/beta
    SPARQL-membership fusion and threshold as retrieve_text."""
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.engine import RetrievalEngine
    from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import FusionConfig

    model, params, tok, store, rt = world
    fm = FusionModel("simple_gated", embed_dim=16)
    fparams = fm.init(jax.random.PRNGKey(4))
    r = CLIPRetrieval(model, params, tok, store, top_k=6)
    head_only = r.retrieval_fused_batch(["hello cat"], fm, fparams, alpha=0.5, factor=8)[0]
    boosted_uuid = head_only[-1]["uuid"]  # bottom candidate gets the bonus

    engine = RetrievalEngine(r, _FakeT2S([boosted_uuid]), FusionConfig())
    with pytest.raises(ValueError):
        engine.retrieve_text_fused("hello cat")
    engine.set_fusion_head(fm, fparams, factor=8)
    got = engine.retrieve_text_fused("hello cat")
    want = sorted(
        (
            {"uuid": x["uuid"],
             "score": round(0.8 * x["score"] + 0.2 * (x["uuid"] == boosted_uuid), 4)}
            for x in head_only
        ),
        key=lambda x: x["score"], reverse=True,
    )
    want = [x for x in want if x["score"] >= 0.0]  # default threshold
    assert got == want


def test_cli_train_fusion_and_serve_head(tmp_path, devices8, capsys, monkeypatch):
    """Full lifecycle: train a head on synthetic data, save the artifact,
    serve it via --fusion.head_params (CLI answer path)."""
    import json
    import os

    from knowledge_enhanced_multimodal_retrieval_tpu.cli import common as CC
    from knowledge_enhanced_multimodal_retrieval_tpu.cli.precompute import main as precompute
    from knowledge_enhanced_multimodal_retrieval_tpu.cli.serve import main as serve
    from knowledge_enhanced_multimodal_retrieval_tpu.cli.train_fusion import main as train_fusion
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M

    monkeypatch.setitem(
        M.ARCHS, "tiny", M.CLIPArch(16, 32, 1, 32, 16, 16, 600, 32, 2, 1, vision_heads=2)
    )
    head_path = os.path.join(tmp_path, "head.npz")
    report = train_fusion([
        "--out", head_path,
        "--data.dataset=synthetic:24",
        "--data.image_size=32",
        "--data.context_length=16",
        "--model.name=tiny",
        "--eval.batch_size=8",
        "--fusion.head=linear",
        "--train.epochs=1",
        "--train.batch_size=8",
    ])
    assert os.path.exists(head_path)
    assert os.path.exists(os.path.join(tmp_path, "head.metrics.json"))
    assert "FUSION_MRR" in report["fusion"]

    store_path = os.path.join(tmp_path, "store.npz")
    precompute([
        "--data.dataset=synthetic:24",
        "--data.image_size=32",
        "--data.context_length=16",
        "--model.name=tiny",
        "--eval.batch_size=8",
        "--out", store_path,
    ])
    monkeypatch.setattr(
        "knowledge_enhanced_multimodal_retrieval_tpu.cli.serve.build_tokenizer",
        lambda cfg: CC._tiny_tokenizer(),
    )
    serve([
        "--model.name=tiny",
        "--store", store_path,
        "--query", "hello cat",
        f"--fusion.head_params={head_path}",
        "--fusion.factor=2",
    ])
    out_text = capsys.readouterr().out
    payload = json.loads(out_text[out_text.index("{") :])
    assert payload["query"] == "hello cat"
    scores = [x["score"] for x in payload["results"]]
    assert scores == sorted(scores, reverse=True) and len(scores) > 0


def test_http_fused_search(world):
    """POST /search {"fused": true} routes through the fused hook; 501
    when no head is wired; 400 when combined with filters."""
    import json as json_mod
    from urllib.request import Request, urlopen
    from urllib.error import HTTPError

    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.http_server import (
        RetrievalHTTPServer,
    )

    model, params, tok, store, rt = world
    fm = FusionModel("linear", embed_dim=16)
    fparams = fm.init(jax.random.PRNGKey(5))
    r = CLIPRetrieval(model, params, tok, store, top_k=5)

    def batch_fn(queries):
        return r.retrieval_batch(list(queries))

    def fused_batch_fn(queries, alphas):
        resolved = [0.5 if a is None else float(a) for a in alphas]
        return r.retrieval_fused_batch(list(queries), fm, fparams, alpha=resolved)

    def post(base, body, expect_error=None):
        req = Request(
            f"{base}/search", data=json_mod.dumps(body).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        if expect_error is None:
            return json_mod.load(urlopen(req, timeout=30))
        with pytest.raises(HTTPError) as e:
            urlopen(req, timeout=30)
        assert e.value.code == expect_error

    with RetrievalHTTPServer(
        batch_fn, port=0, max_wait_ms=1.0, fused_batch_fn=fused_batch_fn
    ) as srv:
        base = "http://%s:%d" % srv.address
        out = post(base, {"query": "hello cat", "fused": True, "n": 5})
        want = r.retrieval_fused("hello cat", fm, fparams, top_k=5)
        assert out["results"] == [
            {"uuid": x["uuid"], "score": pytest.approx(x["score"])} for x in want
        ]
        post(base, {"query": "x", "fused": True, "allow_uuids": ["u"]}, expect_error=400)

    with RetrievalHTTPServer(batch_fn, port=0, max_wait_ms=1.0) as srv:
        base = "http://%s:%d" % srv.address
        post(base, {"query": "x", "fused": True}, expect_error=501)


def test_fused_serving_trained_head_end_to_end(world, devices8):
    """Close the loop: train a head on frozen embeddings, then serve it."""
    from knowledge_enhanced_multimodal_retrieval_tpu.eval.evaluator import EncodedDataset
    from knowledge_enhanced_multimodal_retrieval_tpu.train.fusion_trainer import (
        train_fusion_head,
    )

    model, params, tok, store, rt = world
    rng = np.random.default_rng(0)
    n = len(store)
    enc = EncodedDataset(
        image=np.asarray(store.image, np.float32),
        query=_normed(rng, n, 16),
        target=np.asarray(store.text, np.float32),
        uuids=list(store.uuids),
    )
    fm = FusionModel("simple_gated_with_bias", embed_dim=16)
    fparams, history = train_fusion_head(fm, enc, epochs=2, batch_size=16)
    assert np.isfinite(history["loss"]).all()
    r = CLIPRetrieval(model, params, tok, store, top_k=5)
    out = r.retrieval_fused("hello cat", fm, fparams, top_k=5, factor=4)
    assert len(out) == 5 and all(np.isfinite(x["score"]) for x in out)
