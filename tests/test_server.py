"""MicroBatcher tests (retrieval/server.py): request aggregation, ordering,
error propagation, shutdown — plus an end-to-end pass over a real engine."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import MicroBatcher


def test_batches_aggregate_concurrent_requests():
    calls = []

    def batch_fn(queries):
        calls.append(list(queries))
        return [[{"uuid": q}] for q in queries]

    with MicroBatcher(batch_fn, max_batch=64, max_wait_ms=50.0) as mb:
        futs = [mb.submit(f"q{i}") for i in range(20)]
        results = [f.result(timeout=10) for f in futs]
    assert [r[0]["uuid"] for r in results] == [f"q{i}" for i in range(20)]
    # 20 near-simultaneous submits must NOT become 20 device calls
    assert mb.stats["served"] == 20
    assert mb.stats["batches"] == len(calls) < 20


def test_pad_to_bucket_shapes():
    """Dispatched batch sizes are powers of two (one compile per bucket on
    jit backends), results sliced back to the real request count."""
    sizes = []

    def batch_fn(queries):
        sizes.append(len(queries))
        return [[{"uuid": q}] for q in queries]

    with MicroBatcher(batch_fn, max_batch=64, max_wait_ms=40.0) as mb:
        futs = [mb.submit(f"q{i}") for i in range(11)]
        out = [f.result(timeout=10)[0]["uuid"] for f in futs]
    assert out == [f"q{i}" for i in range(11)]
    assert all(s & (s - 1) == 0 for s in sizes), sizes  # powers of two
    assert mb.stats["served"] == 11


def test_max_batch_splits():
    sizes = []

    def batch_fn(queries):
        sizes.append(len(queries))
        return [[] for _ in queries]

    with MicroBatcher(batch_fn, max_batch=4, max_wait_ms=200.0) as mb:
        futs = [mb.submit(str(i)) for i in range(10)]
        for f in futs:
            f.result(timeout=10)
    assert max(sizes) <= 4 and sum(sizes) == 10


def test_error_propagates_to_all_waiters():
    def batch_fn(queries):
        raise ValueError("backend down")

    with MicroBatcher(batch_fn, max_batch=8, max_wait_ms=20.0) as mb:
        futs = [mb.submit(str(i)) for i in range(3)]
        for f in futs:
            with pytest.raises(ValueError, match="backend down"):
                f.result(timeout=10)
    # the worker survives an erroring batch (next submit before close worked)


def test_close_rejects_new_work():
    mb = MicroBatcher(lambda qs: [[] for _ in qs])
    mb.close()
    with pytest.raises(RuntimeError):
        mb.submit("x")


def test_http_server_endpoints():
    """GET/POST /search + /healthz over a fake backend, concurrent clients."""
    import json
    from urllib.request import Request, urlopen

    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import RetrievalHTTPServer

    def batch_fn(queries):
        return [[{"uuid": f"hit-{q}", "score": 1.0}] for q in queries]

    with RetrievalHTTPServer(batch_fn, port=0, max_wait_ms=10.0) as srv:
        host, port = srv.address
        base = f"http://{host}:{port}"
        health = json.load(urlopen(f"{base}/healthz", timeout=10))
        assert health["ok"] is True

        out = json.load(urlopen(f"{base}/search?q=vase&n=5", timeout=10))
        assert out["results"][0]["uuid"] == "hit-vase"

        req = Request(
            f"{base}/search",
            data=json.dumps({"queries": ["a", "b", "c"]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        out = json.load(urlopen(req, timeout=10))
        assert [r[0]["uuid"] for r in out["results"]] == ["hit-a", "hit-b", "hit-c"]

        # concurrent GETs aggregate through the batcher
        hits = []

        def client(i):
            hits.append(json.load(urlopen(f"{base}/search?q=q{i}", timeout=30))["results"][0]["uuid"])

        threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert sorted(hits) == sorted(f"hit-q{i}" for i in range(8))

        # error surface: missing q
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as ei:
            urlopen(f"{base}/search", timeout=10)
        assert ei.value.code == 400


def test_http_healthz_health_fn_503():
    """An extra liveness source (multi-host stall detection) flips /healthz
    to 503 when it reports ok=False — orchestrator restart hook."""
    import json
    import urllib.error
    from urllib.request import urlopen

    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import RetrievalHTTPServer

    state = {"ok": True}

    def batch_fn(queries):
        return [[] for _ in queries]

    def health_fn():
        return {"ok": state["ok"], "multihost": {"stalled": not state["ok"]}}

    with RetrievalHTTPServer(batch_fn, port=0, health_fn=health_fn) as srv:
        host, port = srv.address
        base = f"http://{host}:{port}"
        payload = json.load(urlopen(f"{base}/healthz", timeout=10))
        assert payload["ok"] is True and payload["multihost"]["stalled"] is False
        state["ok"] = False
        with pytest.raises(urllib.error.HTTPError) as ei:
            urlopen(f"{base}/healthz", timeout=10)
        assert ei.value.code == 503
        body = json.loads(ei.value.read())
        assert body["ok"] is False and body["multihost"]["stalled"] is True


def test_threaded_callers_end_to_end(devices8):
    """Concurrent callers through a real engine: fewer device batches than
    queries, every caller gets its own correct top hit."""
    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import (
        CLIPRetrieval,
        EmbeddingStore,
        RetrievalEngine,
    )

    tok = CLIPTokenizer([("c", "a"), ("ca", "t</w>"), ("h", "e"), ("he", "l")])
    arch = M.CLIPArch(16, 32, 1, 32, 16, 16, tok.vocab_size, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    norm = lambda x: (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)
    store = EmbeddingStore(
        image=norm(rng.standard_normal((50, 16))),
        text=norm(rng.standard_normal((50, 16))),
        uuids=[f"u{i}" for i in range(50)],
    )
    engine = RetrievalEngine(CLIPRetrieval(model, params, tok, store, top_k=5))
    expected = engine.retrieve_text_noknowledge("hello cat")[0]["uuid"]

    with MicroBatcher(engine.retrieve_text_noknowledge_batch, max_batch=16, max_wait_ms=30.0) as mb:
        out = []

        def caller():
            out.append(mb.retrieve("hello cat", timeout=60)[0]["uuid"])

        threads = [threading.Thread(target=caller) for _ in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert out == [expected] * 12
    assert mb.stats["batches"] < 12


def test_cancelled_future_does_not_kill_worker():
    """A caller cancelling its future must not crash the worker thread
    (resolving a cancelled Future raises InvalidStateError)."""
    release = threading.Event()

    def batch_fn(queries):
        release.wait(5)
        return [[{"uuid": q}] for q in queries]

    with MicroBatcher(batch_fn, max_batch=4, max_wait_ms=1.0) as mb:
        f1 = mb.submit("a")
        cancelled = f1.cancel()  # pending future: cancellable
        release.set()
        # the worker must survive and serve subsequent requests
        f2 = mb.submit("b")
        assert f2.result(timeout=10) == [{"uuid": "b"}]
    if cancelled:
        assert f1.cancelled()


def test_close_drains_stranded_futures():
    """No submit() may strand its caller forever across a close() race —
    the future either resolves, errors, or close() fails it."""
    def batch_fn(queries):
        return [[] for _ in queries]

    mb = MicroBatcher(batch_fn, max_batch=4, max_wait_ms=1.0)
    futs = [mb.submit(str(i)) for i in range(8)]
    mb.close()
    for f in futs:
        # must terminate promptly one way or another
        try:
            f.result(timeout=5)
        except Exception:
            pass
        assert f.done()


def test_http_bad_n_returns_400():
    import json as json_mod
    from urllib.request import urlopen
    from urllib.error import HTTPError

    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.http_server import RetrievalHTTPServer

    def batch_fn(queries):
        return [[{"uuid": "u", "score": 1.0}] for _ in queries]

    with RetrievalHTTPServer(batch_fn, port=0, max_wait_ms=1.0) as srv:
        host, port = srv.address
        with pytest.raises(HTTPError) as ei:
            urlopen(f"http://{host}:{port}/search?q=x&n=abc")
        assert ei.value.code == 400
        with pytest.raises(HTTPError) as ei:
            urlopen(f"http://{host}:{port}/search?q=x&n=-2")
        assert ei.value.code == 400
        # valid n still works
        body = json_mod.loads(urlopen(f"http://{host}:{port}/search?q=x&n=1").read())
        assert body["results"] == [{"uuid": "u", "score": 1.0}]


def test_http_document_endpoints():
    """POST/DELETE /documents: update hooks, validation, error mapping."""
    import json as json_mod
    from urllib.error import HTTPError
    from urllib.request import Request, urlopen

    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.http_server import RetrievalHTTPServer

    calls = []

    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.embedding_store import (
        DuplicateUUIDError,
    )

    def add_fn(img, txt, uuids):
        if "dup" in uuids:
            raise DuplicateUUIDError("duplicate uuids: ['dup']")
        if img.shape[1] != 2:
            raise ValueError(f"expected image/text of shape (n, 2); got {img.shape}")
        calls.append(("add", img.shape, txt.shape, list(uuids)))

    def remove_fn(uuids):
        if "ghost" in uuids:
            raise KeyError("unknown uuids: ['ghost']")
        calls.append(("remove", list(uuids)))

    def batch_fn(queries):
        return [[] for _ in queries]

    def post(base, path, payload, method="POST"):
        req = Request(
            f"{base}{path}", data=json_mod.dumps(payload).encode(),
            headers={"Content-Type": "application/json"}, method=method,
        )
        return json_mod.load(urlopen(req, timeout=10))

    with RetrievalHTTPServer(
        batch_fn, port=0, max_wait_ms=1.0,
        add_documents_fn=add_fn, remove_documents_fn=remove_fn,
    ) as srv:
        base = "http://{}:{}".format(*srv.address)
        doc = {"uuid": "d1", "image_embedding": [1.0, 0.0], "text_embedding": [0.0, 1.0]}
        assert post(base, "/documents", {"documents": [doc]}) == {"added": 1}
        assert post(base, "/documents", {"uuids": ["d1"]}, "DELETE") == {"removed": 1}
        assert calls == [("add", (1, 2), (1, 2), ["d1"]), ("remove", ["d1"])]

        for payload, code, method in [
            ({"documents": []}, 400, "POST"),  # empty list
            ({"documents": [{"uuid": "x"}]}, 400, "POST"),  # missing embeddings
            ({"documents": [dict(doc, uuid="dup")]}, 409, "POST"),  # duplicate
            # wrong embedding dimensionality: malformed payload, NOT conflict
            ({"documents": [{"uuid": "d9", "image_embedding": [1.0, 0.0, 0.0],
                             "text_embedding": [0.0, 1.0, 0.0]}]}, 400, "POST"),
            ({"uuids": []}, 400, "DELETE"),
            ({"uuids": ["ghost"]}, 404, "DELETE"),
        ]:
            with pytest.raises(HTTPError) as ei:
                post(base, "/documents", payload, method)
            assert ei.value.code == code, (payload, method)

    # without hooks the endpoints answer 501 (search-only deployment)
    with RetrievalHTTPServer(batch_fn, port=0, max_wait_ms=1.0) as srv:
        base = "http://{}:{}".format(*srv.address)
        with pytest.raises(HTTPError) as ei:
            post(base, "/documents", {"documents": [doc]})
        assert ei.value.code == 501
        with pytest.raises(HTTPError) as ei:
            post(base, "/documents", {"uuids": ["d1"]}, "DELETE")
        assert ei.value.code == 501


def test_http_image_search():
    """POST /search_image: base64 decode, per-request preprocess isolation,
    501 when not wired, 400 on bad base64 / bad image."""
    import base64
    import json as json_mod
    import urllib.error
    from urllib.request import Request, urlopen

    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import RetrievalHTTPServer

    def post(base, path, payload):
        req = Request(
            f"{base}{path}", data=json_mod.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        return json_mod.load(urlopen(req, timeout=10))

    def batch_fn(queries):
        return [[] for _ in queries]

    # not wired -> 501
    with RetrievalHTTPServer(batch_fn, port=0, max_wait_ms=1.0) as srv:
        base = "http://{}:{}".format(*srv.address)
        with pytest.raises(urllib.error.HTTPError) as ei:
            post(base, "/search_image", {"image": base64.b64encode(b"x").decode()})
        assert ei.value.code == 501

    # image_batch_fn without per-request decode isolation is a footgun
    # (one corrupt image would 502 the whole shared micro-batch): rejected
    with pytest.raises(ValueError, match="image_preprocess_fn"):
        RetrievalHTTPServer(batch_fn, port=0, image_batch_fn=lambda x: x)

    def image_batch_fn(imgs):
        # imgs arrive preprocessed (here: upper-cased by the fake preprocess)
        return [[{"uuid": f"img-{b.decode()}", "score": 1.0}] for b in imgs]

    def preprocess_fn(blobs):
        out = []
        for b in blobs:
            if b == b"corrupt":
                raise ValueError("cannot decode")
            out.append(b.upper())
        return out

    with RetrievalHTTPServer(
        batch_fn, port=0, max_wait_ms=1.0,
        image_batch_fn=image_batch_fn, image_preprocess_fn=preprocess_fn,
    ) as srv:
        base = "http://{}:{}".format(*srv.address)
        b64 = lambda b: base64.b64encode(b).decode()  # noqa: E731
        out = post(base, "/search_image", {"image": b64(b"cat")})
        assert out["results"][0]["uuid"] == "img-CAT"  # single image -> one list
        out = post(base, "/search_image", {"images": [b64(b"a"), b64(b"b")], "n": 1})
        assert [r[0]["uuid"] for r in out["results"]] == ["img-A", "img-B"]
        # bad base64 -> 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            post(base, "/search_image", {"image": "not-base64!!!"})
        assert ei.value.code == 400
        # preprocess failure (corrupt image) -> 400, isolated to this request
        with pytest.raises(urllib.error.HTTPError) as ei:
            post(base, "/search_image", {"image": b64(b"corrupt")})
        assert ei.value.code == 400
        # the server still serves after the failure
        out = post(base, "/search_image", {"image": b64(b"ok")})
        assert out["results"][0]["uuid"] == "img-OK"
        # missing payload -> 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            post(base, "/search_image", {})
        assert ei.value.code == 400
        # /healthz reports the image batcher alongside the text one
        health = json_mod.load(urlopen(f"{base}/healthz", timeout=10))
        assert health["image_stats"]["served"] >= 4


def test_http_raw_document_ingest():
    """POST /documents with base64 images + texts encodes server-side."""
    import base64
    import json as json_mod
    import urllib.error
    from urllib.request import Request, urlopen

    import numpy as np

    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import RetrievalHTTPServer

    added = []

    def add_fn(img, txt, uuids):
        added.append((img.shape, txt.shape, list(uuids)))

    def encode_fn(blobs, texts):
        if any(b == b"corrupt" for b in blobs):
            raise ValueError("cannot decode image")
        n = len(blobs)
        return np.ones((n, 4), np.float32), np.ones((n, 4), np.float32)

    def post(base, payload):
        req = Request(
            f"{base}/documents", data=json_mod.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        return json_mod.load(urlopen(req, timeout=10))

    b64 = lambda b: base64.b64encode(b).decode()  # noqa: E731
    batch_fn = lambda qs: [[] for _ in qs]  # noqa: E731
    with RetrievalHTTPServer(
        batch_fn, port=0, max_wait_ms=1.0,
        add_documents_fn=add_fn, encode_documents_fn=encode_fn,
    ) as srv:
        base = "http://{}:{}".format(*srv.address)
        out = post(base, {"documents": [
            {"uuid": "r1", "image": b64(b"img1"), "text": "a vase"},
            {"uuid": "r2", "image": b64(b"img2"), "text": "a coin"},
        ]})
        assert out == {"added": 2}
        assert added[-1] == ((2, 4), (2, 4), ["r1", "r2"])
        # mixed raw + embedding form in one request -> 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            post(base, {"documents": [
                {"uuid": "a", "image": b64(b"x"), "text": "t"},
                {"uuid": "b", "image_embedding": [1, 0], "text_embedding": [0, 1]},
            ]})
        assert ei.value.code == 400
        # corrupt image -> 400 (client data error, not 502)
        with pytest.raises(urllib.error.HTTPError) as ei:
            post(base, {"documents": [{"uuid": "c", "image": b64(b"corrupt"), "text": "t"}]})
        assert ei.value.code == 400

    # raw form without the encode hook -> 501
    with RetrievalHTTPServer(batch_fn, port=0, max_wait_ms=1.0, add_documents_fn=add_fn) as srv:
        base = "http://{}:{}".format(*srv.address)
        with pytest.raises(urllib.error.HTTPError) as ei:
            post(base, {"documents": [{"uuid": "d", "image": b64(b"x"), "text": "t"}]})
        assert ei.value.code == 501


def test_http_metrics_endpoint_and_idempotent_close():
    """GET /metrics renders Prometheus text; close() twice is a no-op."""
    import json as json_mod
    from urllib.request import urlopen

    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import RetrievalHTTPServer

    def batch_fn(queries):
        return [[{"uuid": q, "score": 1.0}] for q in queries]

    srv = RetrievalHTTPServer(
        batch_fn, port=0, max_wait_ms=1.0,
        image_batch_fn=lambda imgs: [[] for _ in imgs],
        image_preprocess_fn=lambda blobs: blobs,
    )
    with srv:
        base = "http://{}:{}".format(*srv.address)
        json_mod.load(urlopen(f"{base}/search?q=x", timeout=10))
        body = urlopen(f"{base}/metrics", timeout=10).read().decode()
        assert 'kemr_requests_served_total{modality="text"} 1' in body
        assert 'kemr_requests_served_total{modality="image"} 0' in body
        assert "# TYPE kemr_request_latency_ms summary" in body
        assert 'quantile="0.5"' in body
    srv.close()  # second close (after __exit__'s) must be a clean no-op


def test_http_close_without_start_does_not_deadlock():
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.http_server import RetrievalHTTPServer

    srv = RetrievalHTTPServer(lambda qs: [[] for _ in qs], port=0, max_wait_ms=1.0)
    done = threading.Event()

    def _close():
        srv.close()
        done.set()

    t = threading.Thread(target=_close, daemon=True)
    t.start()
    assert done.wait(5), "close() on a never-started server deadlocked"


def test_latency_stats_and_backpressure():
    """stats reports p50/p95/p99 request latency; max_pending load-sheds
    with Overloaded instead of queueing without bound."""
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import Overloaded

    release = threading.Event()

    def batch_fn(queries):
        release.wait(10)
        return [[{"uuid": q}] for q in queries]

    mb = MicroBatcher(batch_fn, max_batch=2, max_wait_ms=1.0, max_pending=3)
    futs = [mb.submit(str(i)) for i in range(3)]  # fills the pending budget
    with pytest.raises(Overloaded):
        mb.submit("overflow")
    assert mb.stats["rejected"] == 1
    assert mb.stats["pending"] == 3
    release.set()
    for f in futs:
        f.result(timeout=10)
    stats = mb.stats
    assert stats["pending"] == 0
    assert stats["latency_ms"]["n"] == 3
    assert stats["latency_ms"]["p50"] <= stats["latency_ms"]["p99"]
    # budget freed: submissions accepted again
    assert mb.retrieve("again", timeout=10) == [{"uuid": "again"}]
    mb.close()


def test_http_backpressure_returns_503():
    import json as json_mod
    from urllib.error import HTTPError
    from urllib.request import urlopen

    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.http_server import RetrievalHTTPServer

    release = threading.Event()

    def batch_fn(queries):
        release.wait(10)
        return [[] for _ in queries]

    with RetrievalHTTPServer(batch_fn, port=0, max_wait_ms=1.0, max_pending=1) as srv:
        host, port = srv.address
        codes = []

        def client():
            try:
                urlopen(f"http://{host}:{port}/search?q=x", timeout=30)
                codes.append(200)
            except HTTPError as e:
                codes.append(e.code)

        threads = [threading.Thread(target=client) for _ in range(4)]
        for t in threads:
            t.start()
            time.sleep(0.1)  # ensure the first occupies the pending slot
        release.set()
        for t in threads:
            t.join()
        assert 503 in codes and 200 in codes, codes
        health = json_mod.loads(urlopen(f"http://{host}:{port}/healthz").read())
        assert health["stats"]["rejected"] >= 1


def test_http_result_cache_hit_and_invalidation():
    """Repeated (query, alpha) pairs skip the backend; corpus mutations
    invalidate, and an in-flight search cannot repopulate stale results."""
    import json as json_mod
    from urllib.request import Request, urlopen

    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import RetrievalHTTPServer

    calls = []

    def batch_fn(queries):
        calls.append(list(queries))
        return [[{"uuid": f"v{len(calls)}-{q}", "score": 1.0}] for q in queries]

    def post(base, path, payload, method="POST"):
        req = Request(
            f"{base}{path}", data=json_mod.dumps(payload).encode(),
            headers={"Content-Type": "application/json"}, method=method,
        )
        return json_mod.load(urlopen(req, timeout=10))

    with RetrievalHTTPServer(
        batch_fn, port=0, max_wait_ms=1.0, result_cache_size=8,
        add_documents_fn=lambda img, txt, uuids: None,
    ) as srv:
        base = "http://{}:{}".format(*srv.address)
        a = json_mod.load(urlopen(f"{base}/search?q=vase", timeout=10))
        b = json_mod.load(urlopen(f"{base}/search?q=vase", timeout=10))
        assert a == b and len(calls) == 1  # second request never hit the backend
        # corpus mutation invalidates the cache
        doc = {"uuid": "d1", "image_embedding": [1.0, 0.0], "text_embedding": [0.0, 1.0]}
        post(base, "/documents", {"documents": [doc]})
        c = json_mod.load(urlopen(f"{base}/search?q=vase", timeout=10))
        assert len(calls) == 2 and c["results"][0]["uuid"] == "v2-vase"


def test_length_bucketing_splits_micro_batches():
    """With a length_bucket_fn each dispatched batch is single-bucket, the
    widest bucket dispatches first, and every caller still gets its own
    result."""
    calls = []

    def batch_fn(queries):
        calls.append(list(queries))
        return [[{"uuid": q}] for q in queries]

    bucket = lambda q: 32 if len(q) > 6 else 16  # noqa: E731

    with MicroBatcher(
        batch_fn, max_batch=64, max_wait_ms=200.0,
        pad_to_bucket=False, length_bucket_fn=bucket,
    ) as mb:
        queries = ["short"] * 5 + ["a much longer query"] * 3 + ["tiny"] * 2
        futs = [mb.submit(q) for q in queries]
        results = [f.result(timeout=10) for f in futs]
    assert [r[0]["uuid"] for r in results] == queries
    # every dispatched group is single-bucket
    for call in calls:
        assert len({bucket(q) for q in call}) == 1, call
    # both buckets were served, wide group first within its micro-batch
    first_two = [bucket(c[0]) for c in calls[:2]]
    assert set(first_two) == {16, 32}
    assert first_two[0] == 32
    assert mb.stats["served"] == 10


def test_length_bucketing_bucket_fn_errors_stay_per_request():
    """A bucket fn that raises must not kill the worker — the queries fall
    into a shared group and batch_fn decides their fate."""

    def batch_fn(queries):
        return [[{"uuid": q}] for q in queries]

    def bad_bucket(q):
        if q == "boom":
            raise ValueError("no bucket")
        return 16

    with MicroBatcher(
        batch_fn, max_wait_ms=50.0, pad_to_bucket=False, length_bucket_fn=bad_bucket
    ) as mb:
        futs = [mb.submit(q) for q in ("boom", "ok")]
        results = [f.result(timeout=10) for f in futs]
    assert [r[0]["uuid"] for r in results] == ["boom", "ok"]
    # and the batcher still serves after the bucket-fn failure
    assert mb.stats["served"] == 2
