"""MultiHostRetrieval facade contracts (single-process mesh — the broadcast
degenerates to a copy, so the full protocol runs without subprocesses).

Covers the round-3 advisor findings: blocked routes must fail at CALL time
(never at attribute access — the HTTP daemon collects callables eagerly at
startup), must raise ValueError (mapped to graceful HTTP 400/501), must
include the collective-launching batch routes, and concurrent coordinator
searches must serialize on the lockstep lock instead of interleaving
broadcasts. Reference context: serving daemon around
``/root/reference/src/retrieval.py:79`` (single-process only there).
"""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import (
    CLIPRetrieval,
    EmbeddingStore,
)
from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.multihost import (
    MultiHostRetrieval,
    MultiHostSearch,
)


@pytest.fixture(scope="module")
def facade_world(devices8):
    tok = CLIPTokenizer([("c", "a"), ("ca", "t</w>"), ("h", "e"), ("he", "l")])
    arch = M.CLIPArch(16, 32, 1, 32, 16, 16, tok.vocab_size, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)

    def normed(n, d):
        x = rng.standard_normal((n, d)).astype(np.float32)
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    store = EmbeddingStore(normed(48, 16), normed(48, 16), [f"u{i}" for i in range(48)])
    inner = CLIPRetrieval(model, params, tok, store, top_k=5)
    mh = MultiHostSearch(inner, batch=8)
    return MultiHostRetrieval(mh), inner, store


def test_blocked_routes_fail_at_call_not_access(facade_world):
    """Eager wiring (the HTTP daemon grabs callables at startup) must not
    crash: attribute access returns a stub; only INVOKING it raises, and it
    raises ValueError (-> HTTP 400), not RuntimeError (-> 500)."""
    facade, _, _ = facade_world
    for name in MultiHostRetrieval._BLOCKED:
        fn = getattr(facade, name)  # must not raise
        assert callable(fn)
        with pytest.raises(ValueError, match="multi-host"):
            fn()


def test_collective_batch_routes_blocked(facade_world):
    """retrieval_batches / retrieval_fused_batch would launch collectives
    outside the lockstep protocol — they must be in _BLOCKED."""
    assert "retrieval_batches" in MultiHostRetrieval._BLOCKED
    assert "retrieval_fused_batch" in MultiHostRetrieval._BLOCKED


def test_facade_matches_inner_and_serializes_threads(facade_world):
    """Concurrent coordinator searches (the daemon's text + image batcher
    threads) serialize on the lockstep lock; results match the plain
    retriever exactly."""
    facade, inner, store = facade_world
    q = store.image[:12]
    want = inner.retrieval_embeddings_batch(q, alpha=0.7)

    results = [None, None]

    def run(slot):
        results[slot] = facade.retrieval_embeddings_batch(q, alpha=0.7)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
        assert not t.is_alive()
    for got in results:
        assert [[r["uuid"] for r in row] for row in got] == [
            [r["uuid"] for r in row] for row in want
        ]


def test_stop_idempotent_then_search_raises(facade_world):
    facade, inner, store = facade_world
    mh = MultiHostSearch(inner, batch=4)
    f = MultiHostRetrieval(mh)
    f.stop()
    f.stop()  # idempotent
    with pytest.raises(RuntimeError, match="stopped"):
        f.retrieval_embeddings_batch(store.image[:2])


def test_stall_detection_health(facade_world):
    """A work item stuck in the collective past stall_timeout_s flips
    health() to ok=False (the dead-follower signature — collectives cannot
    be aborted from Python, so detection + orchestrator restart IS the
    failure story). Wired to /healthz as a 503 by the serving daemon."""
    import time

    _, inner, store = facade_world
    mh = MultiHostSearch(inner, batch=4, stall_timeout_s=0.05)
    assert mh.health()["ok"] and not mh.stalled

    release = threading.Event()
    orig_run = mh._run

    def slow_run(payload):
        release.wait(timeout=30)
        return orig_run(payload)

    mh._run = slow_run
    t = threading.Thread(
        target=lambda: mh.search_embeddings(store.image[:2]), daemon=True
    )
    t.start()
    deadline = time.monotonic() + 10
    while not mh.stalled and time.monotonic() < deadline:
        time.sleep(0.01)
    h = mh.health()
    assert mh.stalled and h["ok"] is False
    assert h["multihost"]["inflight_s"] is not None
    release.set()
    t.join(timeout=30)
    assert not t.is_alive()
    assert mh.health()["ok"] and mh._work_items == 1


def test_top_k_override_rejected(facade_world):
    facade, _, store = facade_world
    with pytest.raises(ValueError, match="fixed-k"):
        facade.retrieval_batch(["hello"], top_k=9)
