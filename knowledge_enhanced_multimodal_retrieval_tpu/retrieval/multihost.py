"""Multi-host sharded serving: one corpus spread over several hosts' chips.

The reference serves from a single process (``src/retrieval.py:79``); past
one host's HBM the framework shards the packed corpus over a GLOBAL mesh
spanning processes — each process stages its addressable shard of the same
host-side :class:`EmbeddingStore` (``jax.device_put`` with a cross-process
``NamedSharding``; verified on this JAX) and every search runs as ONE
lockstep collective program (the per-shard scan + winner ``all_gather``
merge of ``ops.similarity.sharded_similarity_topk`` — only ``[Q, k]``
winners cross DCN/ICI).

The operational constraint of multi-process JAX is that EVERY process must
enter the same program with the same operands in the same order. This
module provides the minimal frontend/follower protocol that guarantees it:

- the **coordinator** (process 0) owns the request stream: each call to
  :meth:`MultiHostSearch.search_embeddings` broadcasts one fixed-shape work
  item (flag, padded query block, alpha, count) over
  ``jax.experimental.multihost_utils`` and then every process — itself
  included — executes the sharded search; results are replicated, so the
  coordinator can return them to its caller immediately.
- **followers** run :meth:`MultiHostSearch.serve` — block on the next
  broadcast, execute, repeat — until the coordinator's :meth:`stop`
  sentinel (flag 0) arrives.

Single-process meshes work too (the broadcast degenerates to a copy), so
the same deployment script scales from one host to many. Durable contract:
the payload shape is fixed at construction (``batch_size`` x store dim), so
every process compiles exactly one search program; the coordinator pads
short batches and slices the padding back off.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

__all__ = ["MultiHostSearch", "MultiHostRetrieval"]


class MultiHostSearch:
    """Lockstep frontend/follower wrapper around a sharded retriever.

    ``retrieval`` is a :class:`CLIPRetrieval` built identically on every
    process over the same global-mesh :class:`MeshRuntime` (typically with
    ``shard_corpus=True`` and a packed ``quantize_corpus`` mode). ``batch``
    fixes the broadcast block's query count; searches larger than ``batch``
    split into multiple lockstep steps.
    """

    _FLAG_STOP = 0
    _FLAG_WORK = 1

    def __init__(self, retrieval, batch: int = 32, stall_timeout_s: float = 120.0):
        import threading

        import jax

        if batch < 1:
            raise ValueError(f"batch must be >= 1, got {batch}")
        self.r = retrieval
        self.batch = int(batch)
        self.dim = int(np.asarray(retrieval.store.image).shape[1])
        self._proc = jax.process_index()
        self._stopped = False
        # the HTTP daemon runs separate text/image MicroBatcher worker
        # threads; their concurrent broadcasts would interleave against the
        # followers' single sequential serve() loop and mismatch/deadlock
        # the collective — every broadcast+execute critical section is
        # strictly serialized on the coordinator
        self._lock = threading.Lock()
        # FAILURE MODE (inherent to lockstep SPMD): a dead/partitioned
        # follower leaves the coordinator blocked INSIDE a collective with
        # no way to time out or abort it from Python — the standard JAX
        # multi-process contract. What the framework CAN do is detect the
        # stall: every work item stamps _inflight_since, and health()
        # reports ok=False once one has been in flight past
        # ``stall_timeout_s`` (0 disables). The serving daemon wires this
        # into /healthz so an orchestrator's liveness probe restarts the
        # job — the recovery story, since collectives cannot be cancelled.
        self.stall_timeout_s = float(stall_timeout_s)
        self._inflight_since: Optional[float] = None
        self._work_items = 0

    # -- protocol plumbing ----------------------------------------------------

    def _zeros(self) -> Dict[str, np.ndarray]:
        return {
            "flag": np.zeros((), np.int32),
            "q": np.zeros((self.batch, self.dim), np.float32),
            "alpha": np.full((self.batch,), 0.5, np.float32),  # per-query blend
            "count": np.zeros((), np.int32),
        }

    def _broadcast(self, payload: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        from jax.experimental import multihost_utils

        out = multihost_utils.broadcast_one_to_all(payload)
        return {k: np.asarray(v) for k, v in out.items()}

    def _run(self, payload: Dict[str, np.ndarray]) -> List[List[Dict]]:
        count = int(payload["count"])
        # alpha rides as a per-query vector (a runtime operand of the one
        # compiled program — scalar and mixed blends share it)
        results = self.r.retrieval_embeddings_batch(
            payload["q"], alpha=payload["alpha"]
        )
        return results[:count]

    # -- coordinator API --------------------------------------------------------

    @property
    def is_coordinator(self) -> bool:
        return self._proc == 0

    def search_embeddings(
        self, q_emb, alpha=0.5
    ) -> List[List[Dict]]:
        """Broadcast + execute one search over the sharded corpus.

        Coordinator-only; ``q_emb`` [Q, D] L2-normalized query embeddings
        (any Q — blocks of ``batch`` run in sequence); ``alpha`` a scalar
        or per-query sequence. Returns one ranked ``[{"uuid", "score"}]``
        list per query, exactly like
        ``CLIPRetrieval.retrieval_embeddings_batch``.
        """
        self._require_coordinator("search_embeddings")
        q = np.asarray(q_emb, np.float32)
        if q.ndim != 2 or q.shape[1] != self.dim:
            raise ValueError(f"queries must be [Q, {self.dim}], got {q.shape}")
        a = np.broadcast_to(np.asarray(alpha, np.float32), (q.shape[0],))
        out: List[List[Dict]] = []
        for lo in range(0, q.shape[0], self.batch):
            block = q[lo : lo + self.batch]
            payload = self._zeros()
            payload["flag"] = np.int32(self._FLAG_WORK)
            payload["q"][: block.shape[0]] = block
            payload["alpha"][: block.shape[0]] = a[lo : lo + block.shape[0]]
            payload["count"] = np.int32(block.shape[0])
            with self._lock:  # one lockstep work item at a time
                if self._stopped:
                    raise RuntimeError("multi-host serving already stopped")
                import time

                self._inflight_since = time.monotonic()
                try:
                    out.extend(self._run(self._broadcast(payload)))
                    self._work_items += 1
                finally:
                    self._inflight_since = None
        return out

    # -- failure detection --------------------------------------------------------

    @property
    def stalled(self) -> bool:
        """True when a lockstep work item has been in flight longer than
        ``stall_timeout_s`` — the signature of a dead/partitioned follower
        (the collective blocks forever; it cannot be aborted from Python)."""
        since = self._inflight_since
        if since is None or self.stall_timeout_s <= 0:
            return False
        import time

        return (time.monotonic() - since) > self.stall_timeout_s

    def health(self) -> Dict:
        """Liveness report for the daemon's ``/healthz`` (ok=False past the
        stall timeout -> HTTP 503 -> the orchestrator restarts the job)."""
        since = self._inflight_since
        import time

        return {
            "ok": not self.stalled,
            "multihost": {
                "stalled": self.stalled,
                "inflight_s": None if since is None else round(time.monotonic() - since, 1),
                "stall_timeout_s": self.stall_timeout_s,
                "work_items": self._work_items,
                "stopped": self._stopped,
            },
        }

    def search_texts(self, queries, alpha=0.5) -> List[List[Dict]]:
        """Tokenize + encode on the coordinator, then broadcast embeddings
        (followers never need the query text)."""
        self._require_coordinator("search_texts")
        q = np.asarray(self.r.encode_queries(list(queries)), np.float32)
        return self.search_embeddings(q, alpha=alpha)

    def stop(self) -> None:
        """Release every follower's :meth:`serve` loop (idempotent)."""
        self._require_coordinator("stop")
        with self._lock:
            if self._stopped:
                return
            payload = self._zeros()
            payload["flag"] = np.int32(self._FLAG_STOP)
            self._broadcast(payload)
            self._stopped = True

    def _require_coordinator(self, what: str) -> None:
        if not self.is_coordinator:
            raise RuntimeError(
                f"{what} is coordinator-only (process 0); this is process "
                f"{self._proc} — run serve() here instead"
            )

    # -- follower API -----------------------------------------------------------

    def serve(self, max_steps: Optional[int] = None) -> int:
        """Follower loop: execute broadcast work items until the stop
        sentinel (or ``max_steps``). Returns the number of searches served.

        Every process other than the coordinator must sit in this loop
        whenever the coordinator may search — a missing follower deadlocks
        the collective (the standard SPMD contract).
        """
        if self.is_coordinator:
            raise RuntimeError("the coordinator drives searches; serve() is for followers")
        served = 0
        while max_steps is None or served < max_steps:
            payload = self._broadcast(self._zeros())
            if int(payload["flag"]) == self._FLAG_STOP:
                break
            self._run(payload)
            served += 1
        return served


class MultiHostRetrieval:
    """Drop-in ``CLIPRetrieval`` facade for the COORDINATOR that routes
    every device search through the lockstep protocol.

    ``RetrievalEngine`` (and the HTTP daemon's callables) only ever see
    this object, so the whole single-host serving surface — text, batch,
    per-query alphas, visual search — works over a multi-host corpus
    unchanged. Routes that would launch a collective the followers don't
    know to join (filtered search, warmup) and corpus mutation (followers
    would not restage) raise instead of deadlocking the mesh. Host-only
    helpers (tokenizer, preprocess, candidate rescoring on the host store)
    delegate to the wrapped retriever.
    """

    _BLOCKED = (
        "add_documents", "remove_documents", "set_store", "encode_documents",
        "retrieval_filtered", "retrieval_filtered_batch",
        "retrieval_filtered_embeddings_batch", "warmup",
        "search_batch", "search_batches_pipelined", "calibrate_nprobe",
        # collective-launching batch routes that would bypass the lockstep
        # protocol and hang the mesh if delegated to the inner retriever
        "retrieval_batches", "retrieval_fused_batch",
    )

    def __init__(self, mh: MultiHostSearch):
        self._mh = mh
        self._inner = mh.r

    def retrieval(self, query: str, alpha=0.5, top_k=None) -> List[Dict]:
        return self.retrieval_batch([query], alpha=alpha, top_k=top_k)[0]

    def retrieval_batch(self, queries, alpha=0.5, top_k=None) -> List[List[Dict]]:
        self._check_top_k(top_k)
        return self._mh.search_texts(list(queries), alpha=alpha)

    def retrieval_embeddings_batch(self, q_emb, alpha=0.5, top_k=None) -> List[List[Dict]]:
        self._check_top_k(top_k)
        return self._mh.search_embeddings(q_emb, alpha=alpha)

    def retrieval_image_batch(self, images, alpha=0.5, top_k=None) -> List[List[Dict]]:
        # decode/preprocess + image encode are process-local; only the
        # corpus scan is a collective
        q = self._inner.encode_images(self._inner.preprocess_images(images))
        return self.retrieval_embeddings_batch(q, alpha=alpha, top_k=top_k)

    def retrieval_image(self, image, alpha=0.5, top_k=None) -> List[Dict]:
        return self.retrieval_image_batch([image], alpha=alpha, top_k=top_k)[0]

    def stop(self) -> None:
        self._mh.stop()

    def _check_top_k(self, top_k) -> None:
        if top_k is not None and int(top_k) != self._inner.top_k:
            raise ValueError(
                "multi-host serving compiles one fixed-k program; construct "
                f"the retriever with top_k={top_k} instead of overriding per call"
            )

    def __getattr__(self, name: str):
        if name in self._BLOCKED:
            # return a stub that raises on INVOCATION, not on attribute
            # access: eager wiring (e.g. the HTTP daemon collecting
            # callables at startup) must not crash the whole server, and
            # ValueError maps to a graceful HTTP 400 in the request hooks
            def _blocked(*_a, **_k):
                raise ValueError(
                    f"CLIPRetrieval.{name} is not available under multi-host "
                    "serving: it would mutate per-process corpus state or "
                    "launch a collective the follower processes don't know "
                    "to join"
                )

            _blocked.__name__ = f"blocked_{name}"
            return _blocked
        return getattr(self._inner, name)
