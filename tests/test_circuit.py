"""Circuit breaker tests (knowledge/circuit.py)."""

import threading

import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.knowledge.circuit import (
    CircuitBreakerRetrieval,
)


class FlakyRetriever:
    """Scripted inner: each call pops the next behavior ('ok' or 'fail')."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = 0

    def retrieval(self, query):
        self.calls += 1
        action = self.script.pop(0) if self.script else "ok"
        if action == "fail":
            raise ConnectionError("endpoint down")
        return [f"uuid-{query}"]


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_closed_passes_through_and_failures_reset():
    inner = FlakyRetriever(["ok", "fail", "ok"])
    cb = CircuitBreakerRetrieval(inner, failure_threshold=3)
    assert cb.retrieval("a") == ["uuid-a"]
    assert cb.retrieval("b") == []  # single failure degrades, circuit stays closed
    assert cb.state == "closed"
    assert cb.retrieval("c") == ["uuid-c"]
    assert cb.stats["consecutive_failures"] == 0  # success resets the count


def test_opens_after_threshold_and_fast_fails():
    clock = FakeClock()
    inner = FlakyRetriever(["fail"] * 3)
    cb = CircuitBreakerRetrieval(inner, failure_threshold=3, cooldown_s=10, clock=clock)
    for _ in range(3):
        assert cb.retrieval("q") == []
    assert cb.state == "open" and inner.calls == 3
    # while open: no inner calls at all (no network timeout per query)
    for _ in range(5):
        assert cb.retrieval("q") == []
    assert inner.calls == 3
    assert cb.stats["fast_fails"] == 5 and cb.stats["trips"] == 1


def test_half_open_trial_success_closes():
    clock = FakeClock()
    inner = FlakyRetriever(["fail", "fail", "ok", "ok"])
    cb = CircuitBreakerRetrieval(inner, failure_threshold=2, cooldown_s=10, clock=clock)
    cb.retrieval("q"), cb.retrieval("q")
    assert cb.state == "open"
    clock.t = 11.0  # cooldown elapsed -> half-open
    assert cb.state == "half-open"
    assert cb.retrieval("q") == ["uuid-q"]  # trial call passes through
    assert cb.state == "closed"
    assert cb.retrieval("q") == ["uuid-q"]


def test_half_open_trial_failure_reopens():
    clock = FakeClock()
    inner = FlakyRetriever(["fail", "fail", "fail"])
    cb = CircuitBreakerRetrieval(inner, failure_threshold=2, cooldown_s=10, clock=clock)
    cb.retrieval("q"), cb.retrieval("q")
    clock.t = 11.0
    assert cb.retrieval("q") == []  # trial fails
    assert cb.state == "open" and cb.stats["trips"] == 2
    assert cb.retrieval("q") == [] and inner.calls == 3  # fast-fail again
    clock.t = 22.0
    assert cb.state == "half-open"  # second cooldown elapsed


def test_half_open_admits_one_trial_under_concurrency():
    """Only ONE trial call reaches the inner while half-open; the rest
    fast-fail instead of stampeding a barely-recovered endpoint."""
    clock = FakeClock()
    release = threading.Event()
    calls = []

    class Blocking:
        def retrieval(self, query):
            calls.append(query)
            if query == "trip":
                raise ConnectionError("down")
            release.wait(timeout=10)
            return ["ok"]

    cb = CircuitBreakerRetrieval(Blocking(), failure_threshold=1, cooldown_s=5, clock=clock)
    cb.retrieval("trip")
    clock.t = 6.0  # half-open
    results = {}

    def call(name):
        results[name] = cb.retrieval(name)

    t1 = threading.Thread(target=call, args=("first",))
    t1.start()
    import time as _t

    for _ in range(100):  # wait until the trial is in flight
        if calls[-1:] == ["first"]:
            break
        _t.sleep(0.01)
    t2 = threading.Thread(target=call, args=("second",))
    t2.start()
    t2.join(timeout=10)
    assert results["second"] == []  # fast-failed, did NOT reach the inner
    release.set()
    t1.join(timeout=10)
    assert results["first"] == ["ok"]
    assert calls == ["trip", "first"]


def test_engine_integration_fast_path():
    """The engine serves CLIP-only results while the circuit is open."""
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.engine import RetrievalEngine

    class FakeClip:
        def retrieval(self, query, alpha=0.5, top_k=None):
            return [{"uuid": "u1", "score": 0.9}]

    clock = FakeClock()
    inner = FlakyRetriever(["fail"])
    cb = CircuitBreakerRetrieval(inner, failure_threshold=1, cooldown_s=10, clock=clock)
    engine = RetrievalEngine(FakeClip(), cb)
    out = engine.retrieve_text("q")  # trips the breaker, still returns CLIP hits
    assert out[0]["uuid"] == "u1"
    out2 = engine.retrieve_text("q")  # open: fast CLIP-only
    assert out2[0]["uuid"] == "u1" and inner.calls == 1


def test_validation():
    with pytest.raises(ValueError, match="failure_threshold"):
        CircuitBreakerRetrieval(FlakyRetriever([]), failure_threshold=0)
    with pytest.raises(ValueError, match="cooldown"):
        CircuitBreakerRetrieval(FlakyRetriever([]), cooldown_s=0)


# -- CachedRetrieval ----------------------------------------------------------


def test_cache_hits_skip_inner():
    from knowledge_enhanced_multimodal_retrieval_tpu.knowledge.circuit import CachedRetrieval

    inner = FlakyRetriever(["ok"] * 10)
    clock = FakeClock()
    c = CachedRetrieval(inner, maxsize=8, ttl_s=100, clock=clock)
    assert c.retrieval("q") == ["uuid-q"]
    assert c.retrieval("q") == ["uuid-q"]
    assert inner.calls == 1
    assert c.stats == {"hits": 1, "misses": 1, "size": 1}


def test_cache_ttl_expiry_and_invalidate():
    from knowledge_enhanced_multimodal_retrieval_tpu.knowledge.circuit import CachedRetrieval

    inner = FlakyRetriever(["ok"] * 10)
    clock = FakeClock()
    c = CachedRetrieval(inner, ttl_s=10, clock=clock)
    c.retrieval("q")
    clock.t = 11.0
    c.retrieval("q")  # expired -> re-fetch
    assert inner.calls == 2
    c.retrieval("q")  # fresh again
    assert inner.calls == 2
    c.invalidate()
    c.retrieval("q")
    assert inner.calls == 3


def test_cache_lru_eviction():
    from knowledge_enhanced_multimodal_retrieval_tpu.knowledge.circuit import CachedRetrieval

    inner = FlakyRetriever(["ok"] * 20)
    c = CachedRetrieval(inner, maxsize=2, ttl_s=100)
    c.retrieval("a"), c.retrieval("b")
    c.retrieval("a")  # refresh a's recency
    c.retrieval("c")  # evicts b (least recent)
    assert c.stats["size"] == 2
    c.retrieval("a")  # hit
    c.retrieval("b")  # miss (evicted)
    assert inner.calls == 4  # a, b, c, b-again


def test_cache_caches_empty_results():
    from knowledge_enhanced_multimodal_retrieval_tpu.knowledge.circuit import CachedRetrieval

    class Empty:
        calls = 0

        def retrieval(self, q):
            self.calls += 1
            return []

    inner = Empty()
    c = CachedRetrieval(inner, ttl_s=100)
    assert c.retrieval("q") == [] and c.retrieval("q") == []
    assert inner.calls == 1


def test_cache_composes_with_breaker():
    """cache(breaker(inner)): hits bypass the breaker; misses trip it."""
    from knowledge_enhanced_multimodal_retrieval_tpu.knowledge.circuit import (
        CachedRetrieval,
        CircuitBreakerRetrieval,
    )

    clock = FakeClock()
    inner = FlakyRetriever(["ok", "fail", "fail"])
    c = CachedRetrieval(CircuitBreakerRetrieval(inner, failure_threshold=2, cooldown_s=10, clock=clock), ttl_s=100, clock=clock)
    assert c.retrieval("good") == ["uuid-good"]
    assert c.retrieval("bad1") == [] and c.retrieval("bad2") == []  # trips
    assert c.retrieval("good") == ["uuid-good"]  # cached despite open circuit
    assert inner.calls == 3


def test_cache_validation():
    from knowledge_enhanced_multimodal_retrieval_tpu.knowledge.circuit import CachedRetrieval

    with pytest.raises(ValueError, match="maxsize"):
        CachedRetrieval(FlakyRetriever([]), maxsize=0)
    with pytest.raises(ValueError, match="ttl"):
        CachedRetrieval(FlakyRetriever([]), ttl_s=0)


def test_breaker_raise_on_degrade():
    from knowledge_enhanced_multimodal_retrieval_tpu.knowledge.circuit import (
        CircuitBreakerRetrieval,
        KnowledgeUnavailable,
    )

    clock = FakeClock()
    inner = FlakyRetriever(["fail"])
    cb = CircuitBreakerRetrieval(
        inner, failure_threshold=1, cooldown_s=10, clock=clock, raise_on_degrade=True
    )
    with pytest.raises(KnowledgeUnavailable):
        cb.retrieval("q")  # real failure raises
    with pytest.raises(KnowledgeUnavailable):
        cb.retrieval("q")  # open fast-fail raises too
    assert inner.calls == 1


def test_cache_never_stores_degraded_results():
    """A KG blip must not pin popular queries to empty knowledge for the
    whole TTL: degraded answers pass through as [] but are NOT cached."""
    from knowledge_enhanced_multimodal_retrieval_tpu.knowledge.circuit import (
        CachedRetrieval,
        CircuitBreakerRetrieval,
    )

    clock = FakeClock()
    inner = FlakyRetriever(["fail", "ok", "ok"])
    cb = CircuitBreakerRetrieval(
        inner, failure_threshold=1, cooldown_s=10, clock=clock, raise_on_degrade=True
    )
    c = CachedRetrieval(cb, ttl_s=300, clock=clock)
    assert c.retrieval("q") == []  # outage: degraded, engine-compatible
    assert c.stats["size"] == 0  # NOT cached
    clock.t = 11.0  # breaker half-open; trial succeeds
    assert c.retrieval("q") == ["uuid-q"]  # real answer now
    assert c.stats["size"] == 1
    assert c.retrieval("q") == ["uuid-q"] and inner.calls == 2  # cached


def test_straggler_success_does_not_close_open_circuit():
    """A slow call admitted before the trip must not re-close an OPEN
    circuit mid-outage (only a half-open trial, or a closed-state success,
    resets it)."""
    import time as _t

    release = threading.Event()
    clock = FakeClock()

    class Mixed:
        calls = 0

        def retrieval(self, q):
            self.calls += 1
            if q == "slow-ok":
                release.wait(timeout=10)
                return ["ok"]
            raise ConnectionError("down")

    inner = Mixed()
    cb = CircuitBreakerRetrieval(inner, failure_threshold=1, cooldown_s=100, clock=clock)
    results = {}
    t = threading.Thread(target=lambda: results.update(slow=cb.retrieval("slow-ok")))
    t.start()
    for _ in range(100):  # wait for the slow call to be in flight
        if inner.calls >= 1:
            break
        _t.sleep(0.01)
    cb.retrieval("fail-now")  # trips the breaker while slow-ok is in flight
    assert cb.state == "open"
    release.set()
    t.join(timeout=10)
    assert results["slow"] == ["ok"]  # the straggler still got its answer
    assert cb.state == "open"  # ...but did NOT re-close the circuit
    assert cb.retrieval("q") == [] and inner.calls == 2  # still fast-failing
