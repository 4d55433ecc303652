"""Incremental corpus updates: add/remove documents on a live retriever.

The reference's corpus is frozen at precompute time (its retriever artifact
reads a static ``data/embeddings`` dir, ``src/clip/clip_retrieval.py:26-37``);
this suite pins the beyond-reference live-update API: store immutability,
rebuild-equivalence for every corpus mode (exact, int8, sharded, ivf),
capacity-bucket program reuse, pad-row exactness, and serving during updates.
"""

import threading

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
from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import (
    CLIPRetrieval,
    EmbeddingStore,
    build_embedding_store,
)

MERGES = [("c", "a"), ("ca", "t</w>"), ("h", "e"), ("he", "l")]


@pytest.fixture(scope="module")
def world(devices8):
    tok = CLIPTokenizer(MERGES)
    arch = M.CLIPArch(16, 32, 1, 32, 16, 16, tok.vocab_size, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    src = make_synthetic_source(40, image_size=32)
    pipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=2)
    rt = MeshRuntime.create()
    store = build_embedding_store(model, params, pipe, rt, batch_size=16)
    return model, params, tok, store, rt


def _new_rows(dim, n, seed=7):
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((n, dim)).astype(np.float32)
    txt = rng.standard_normal((n, dim)).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    return img, txt, [f"new-{i}" for i in range(n)]


# -- store-level ---------------------------------------------------------------


def test_store_with_added(world):
    _, _, _, store, _ = world
    img, txt, uuids = _new_rows(store.dim, 3)
    bigger = store.with_added(img, txt, uuids)
    assert len(bigger) == len(store) + 3
    assert bigger.uuids[-3:] == uuids
    np.testing.assert_allclose(bigger.image[-3:], img, atol=1e-6)
    # original untouched (stores are immutable)
    assert len(store) == 40


def test_store_with_added_rejects_dup_and_bad_shape(world):
    _, _, _, store, _ = world
    img, txt, _ = _new_rows(store.dim, 2)
    with pytest.raises(ValueError, match="duplicate"):
        store.with_added(img, txt, [store.uuids[0], "fresh"])
    with pytest.raises(ValueError, match="duplicate"):
        store.with_added(img, txt, ["same", "same"])
    with pytest.raises(ValueError, match="shape"):
        store.with_added(img[:, :-1], txt[:, :-1], ["a", "b"])
    with pytest.raises(ValueError, match="zero-norm"):
        store.with_added(np.zeros_like(img), txt, ["a", "b"])


def test_store_with_added_renormalizes(world):
    _, _, _, store, _ = world
    img, txt, uuids = _new_rows(store.dim, 2)
    bigger = store.with_added(img * 5.0, txt * 0.2, uuids)
    np.testing.assert_allclose(
        np.linalg.norm(bigger.image[-2:], axis=1), 1.0, atol=1e-6
    )


def test_store_with_removed(world):
    _, _, _, store, _ = world
    drop = [store.uuids[0], store.uuids[17]]
    smaller = store.with_removed(drop)
    assert len(smaller) == 38 and not set(drop) & set(smaller.uuids)
    # remaining rows stay aligned
    i_old = store.uuids.index(smaller.uuids[5])
    np.testing.assert_array_equal(smaller.image[5], store.image[i_old])
    with pytest.raises(KeyError, match="unknown"):
        store.with_removed(["nope"])


# -- retriever-level: rebuild equivalence per corpus mode ------------------------


def _assert_same_results(a, b):
    for ra, rb in zip(a, b):
        assert [x["uuid"] for x in ra] == [x["uuid"] for x in rb]
        np.testing.assert_allclose(
            [x["score"] for x in ra], [x["score"] for x in rb], atol=1e-5
        )


@pytest.mark.parametrize("mode", ["exact", "int8_corpus"])
def test_add_remove_matches_rebuild(world, mode):
    model, params, tok, store, rt = world
    kw = dict(top_k=8, quantize_corpus=(mode == "int8_corpus"))
    r = CLIPRetrieval(model, params, tok, store, **kw)
    img, txt, uuids = _new_rows(store.dim, 5)
    r.add_documents(img, txt, uuids)
    fresh = CLIPRetrieval(model, params, tok, store.with_added(img, txt, uuids), **kw)
    queries = ["hello cat", "ca he"]
    _assert_same_results(r.retrieval_batch(queries), fresh.retrieval_batch(queries))

    r.remove_documents([store.uuids[0], uuids[0]])
    fresh2 = CLIPRetrieval(
        model, params, tok,
        store.with_added(img, txt, uuids).with_removed([store.uuids[0], uuids[0]]),
        **kw,
    )
    res = r.retrieval_batch(queries)
    _assert_same_results(res, fresh2.retrieval_batch(queries))
    gone = {store.uuids[0], uuids[0]}
    assert all(x["uuid"] not in gone for row in res for x in row)


def test_add_remove_sharded(world):
    model, params, tok, store, rt = world
    r = CLIPRetrieval(model, params, tok, store, top_k=6, rt=rt, shard_corpus=True)
    img, txt, uuids = _new_rows(store.dim, 3)
    r.add_documents(img, txt, uuids)
    fresh = CLIPRetrieval(
        model, params, tok, store.with_added(img, txt, uuids),
        top_k=6, rt=rt, shard_corpus=True,
    )
    _assert_same_results(r.retrieval_batch(["hello cat"]), fresh.retrieval_batch(["hello cat"]))
    assert not r.corpus_img.sharding.is_fully_replicated


def test_add_rebuilds_ivf_index(world):
    model, params, tok, store, rt = world
    kw = dict(top_k=5, ann="ivf", ann_nlist=4, ann_nprobe=4)  # nprobe==nlist => exact
    r = CLIPRetrieval(model, params, tok, store, **kw)
    exact = CLIPRetrieval(model, params, tok, store, top_k=5)
    img, txt, uuids = _new_rows(store.dim, 4)
    r.add_documents(img, txt, uuids)
    exact2 = CLIPRetrieval(model, params, tok, store.with_added(img, txt, uuids), top_k=5)
    _assert_same_results(
        r.retrieval_batch(["hello cat"]), exact2.retrieval_batch(["hello cat"])
    )
    # and the pre-update exact ranking differs once new rows can win
    assert exact.retrieval("hello cat") is not None


# -- capacity buckets ------------------------------------------------------------


def test_capacity_bucket_reuses_device_shapes(world):
    model, params, tok, store, rt = world
    r = CLIPRetrieval(model, params, tok, store, top_k=5, capacity_multiple=16)
    assert r.corpus_img.shape[0] == 48  # 40 -> next multiple of 16
    shape_before = r.corpus_img.shape
    img, txt, uuids = _new_rows(store.dim, 8)
    r.add_documents(img, txt, uuids)  # 48 real rows: still in the 48 bucket
    assert r.corpus_img.shape == shape_before
    img2, txt2, uuids2 = _new_rows(store.dim, 1, seed=9)
    r.add_documents(img2, txt2, ["new-extra"])  # 49 -> crosses into the 64 bucket
    assert r.corpus_img.shape[0] == 64


def test_same_bucket_update_reuses_compiled_program(world):
    """k_fetch must not track the live pad count: a same-bucket add/remove
    would otherwise change the program's static k -> full recompile, which
    is exactly what capacity_multiple exists to avoid."""
    model, params, tok, store, rt = world
    r = CLIPRetrieval(model, params, tok, store, top_k=5, capacity_multiple=16)
    r.retrieval("hello cat")
    compiled = r._search_program._cache_size()
    img, txt, uuids = _new_rows(store.dim, 3, seed=21)
    r.add_documents(img, txt, uuids)  # 43 rows: same 48 bucket, pads 8 -> 5
    r.retrieval("hello cat")
    r.remove_documents([uuids[0]])  # pads 5 -> 6
    r.retrieval("hello cat")
    assert r._search_program._cache_size() == compiled


def test_streaming_results_truncate_to_top_k(world):
    """The engine streaming path must not leak the pad-slack over-fetch."""
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import RetrievalEngine

    model, params, tok, store, rt = world
    r = CLIPRetrieval(model, params, tok, store, top_k=5, capacity_multiple=64)
    engine = RetrievalEngine(r, t2s_retriever=None)
    batches = [["hello cat", "ca he"], ["hel ca"]]
    out = list(engine.retrieve_text_noknowledge_batches(batches))
    assert [len(b) for b in out] == [2, 1]
    assert all(len(res) == 5 for b in out for res in b)
    # and matches the non-streaming batch API exactly
    flat = [res for b in out for res in b]
    direct = engine.retrieve_text_noknowledge_batch(["hello cat", "ca he", "hel ca"])
    for a, b in zip(flat, direct):
        assert [x["uuid"] for x in a] == [x["uuid"] for x in b]


def test_ann_remove_below_derived_nlist_does_not_wedge(world):
    """Shrinking the corpus can rebuild with derived nlist < ann_nprobe;
    the probe clamps to full (exact) instead of wedging remove_documents."""
    model, params, tok, store, rt = world
    r = CLIPRetrieval(model, params, tok, store, top_k=5, ann="ivf", ann_nprobe=6)
    # 40 rows -> nlist = 6 >= nprobe; drop to 25 rows -> derived nlist = 5
    r.remove_documents(store.uuids[:15])
    assert r._corpus.nprobe == 5  # clamped to the rebuilt nlist (= exact)
    res = r.retrieval("hello cat")
    assert len(res) == 5 and all(x["uuid"] not in set(store.uuids[:15]) for x in res)


def test_pad_rows_never_displace_negative_matches(world):
    """With pad rows scoring 0, negative-scoring real matches must still
    make the top-k (search over-fetches by the pad count and filters)."""
    model, params, tok, store, rt = world
    probe = CLIPRetrieval(model, params, tok, store, top_k=1)
    q = np.asarray(probe.encode_queries(["hello cat"]), np.float32)[0]
    # corpus where half the rows anti-align with the query: their blended
    # scores are strictly negative, i.e. BELOW the pad rows' 0
    rng = np.random.default_rng(11)
    pos = q + 0.25 * rng.standard_normal((20, store.dim)).astype(np.float32)
    neg = -q + 0.25 * rng.standard_normal((20, store.dim)).astype(np.float32)
    rows = np.concatenate([pos, neg])
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    synth = EmbeddingStore(image=rows, text=rows.copy(), uuids=[f"s-{i}" for i in range(40)])
    k = len(synth)  # request every row: forces pads into the raw top-k window
    r = CLIPRetrieval(model, params, tok, synth, top_k=k, capacity_multiple=64)
    assert len(r.store) == 64  # 24 pad rows on device
    base = CLIPRetrieval(model, params, tok, synth, top_k=k)
    _assert_same_results(r.retrieval_batch(["hello cat"]), base.retrieval_batch(["hello cat"]))
    res = r.retrieval("hello cat")
    assert len(res) == k and min(x["score"] for x in res) < 0


def test_http_live_ingest_end_to_end(world):
    """Ingest through the HTTP daemon, then find the document via /search."""
    import json
    from urllib.request import Request, urlopen

    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.http_server import (
        RetrievalHTTPServer,
    )

    model, params, tok, store, rt = world
    r = CLIPRetrieval(model, params, tok, store, top_k=5, capacity_multiple=16)
    q = np.asarray(r.encode_queries(["hello cat"]), np.float32)[0]

    with RetrievalHTTPServer(
        r.retrieval_batch, port=0, max_wait_ms=5.0,
        add_documents_fn=r.add_documents, remove_documents_fn=r.remove_documents,
    ) as srv:
        base = "http://{}:{}".format(*srv.address)
        before = json.load(urlopen(f"{base}/search?q=hello%20cat", timeout=30))
        assert before["results"][0]["uuid"] != "hot-doc"
        req = Request(
            f"{base}/documents",
            data=json.dumps({"documents": [{
                "uuid": "hot-doc",
                "image_embedding": q.tolist(),
                "text_embedding": q.tolist(),
            }]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        assert json.load(urlopen(req, timeout=30)) == {"added": 1}
        after = json.load(urlopen(f"{base}/search?q=hello%20cat", timeout=30))
        assert after["results"][0]["uuid"] == "hot-doc"
        req = Request(
            f"{base}/documents", data=json.dumps({"uuids": ["hot-doc"]}).encode(),
            headers={"Content-Type": "application/json"}, method="DELETE",
        )
        assert json.load(urlopen(req, timeout=30)) == {"removed": 1}
        gone = json.load(urlopen(f"{base}/search?q=hello%20cat", timeout=30))
        assert gone["results"][0]["uuid"] == before["results"][0]["uuid"]


# -- serving during updates --------------------------------------------------------


def test_concurrent_search_and_update(world):
    model, params, tok, store, rt = world
    r = CLIPRetrieval(model, params, tok, store, top_k=5, capacity_multiple=16)
    errors = []
    stop = threading.Event()

    def searcher():
        while not stop.is_set():
            try:
                res = r.retrieval("hello cat")
                assert res and all("uuid" in x for x in res)
            except Exception as e:  # noqa: BLE001
                errors.append(e)
                return

    t = threading.Thread(target=searcher)
    t.start()
    try:
        for i in range(6):
            img, txt, _ = _new_rows(store.dim, 2, seed=100 + i)
            r.add_documents(img, txt, [f"c{i}-a", f"c{i}-b"])
            r.remove_documents([f"c{i}-a"])
    finally:
        stop.set()
        t.join(timeout=30)
    assert not errors
    assert len(r.store.uuids) >= 40  # 40 original + survivors (+ pads)


def test_save_store_snapshot_roundtrip(world, tmp_path):
    """Live-ingested documents survive a snapshot -> reload cycle; the
    snapshot excludes capacity pads and writes atomically."""
    import os

    model, params, tok, store, rt = world
    r = CLIPRetrieval(model, params, tok, store, top_k=5, capacity_multiple=16)
    rng = np.random.default_rng(4)
    new = rng.standard_normal((3, store.dim)).astype(np.float32)
    new /= np.linalg.norm(new, axis=1, keepdims=True)
    r.add_documents(new, new, ["snap-a", "snap-b", "snap-c"])
    path = os.path.join(tmp_path, "snap.npz")
    n = r.save_store(path)
    assert n == len(store) + 3
    loaded = EmbeddingStore.load(path)
    assert len(loaded) == n
    assert not any(u.startswith("__pad_") for u in loaded.uuids)
    assert loaded.uuids[-3:] == ["snap-a", "snap-b", "snap-c"]
    # a retriever restarted from the snapshot retrieves the ingested doc
    r2 = CLIPRetrieval(model, params, tok, loaded, top_k=5)
    out = r2.retrieval_embeddings_batch(new[:1], alpha=1.0)[0]
    assert out[0]["uuid"] == "snap-a"


def test_http_snapshot_endpoint():
    import json as json_mod
    import urllib.error
    from urllib.request import Request, urlopen

    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import RetrievalHTTPServer

    calls = []
    batch_fn = lambda qs: [[] for _ in qs]  # noqa: E731
    with RetrievalHTTPServer(
        batch_fn, port=0, max_wait_ms=1.0,
        snapshot_fn=lambda: calls.append(1) or {"path": "x.npz", "rows": 7},
    ) as srv:
        base = "http://{}:{}".format(*srv.address)
        req = Request(f"{base}/snapshot", data=b"{}", headers={"Content-Type": "application/json"})
        out = json_mod.load(urlopen(req, timeout=10))
        assert out == {"saved": True, "path": "x.npz", "rows": 7} and calls == [1]
    with RetrievalHTTPServer(batch_fn, port=0, max_wait_ms=1.0) as srv:
        base = "http://{}:{}".format(*srv.address)
        req = Request(f"{base}/snapshot", data=b"{}", headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urlopen(req, timeout=10)
        assert ei.value.code == 501
