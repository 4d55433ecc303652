"""Serving entry point: knowledge-enhanced retrieval queries.

The reference's serving usage (``README.md:139-142``) instantiates
``RetrievalEngine()`` and calls ``retrieve_text``. This CLI loads a
precomputed embedding store, wires the Text2SPARQL retriever against the
configured endpoints (or runs CLIP-only when they're absent), and answers
one query or an interactive loop:

    python -m knowledge_enhanced_multimodal_retrieval_tpu.cli.serve \
        --store=data/embeddings/store.npz --model.name=ViT-L/14 \
        [--query="madonna and child"] [--fusion.alpha=0.8]
"""

from __future__ import annotations

import json
import sys

from ..retrieval.clip_retrieval import CLIPRetrieval
from ..retrieval.embedding_store import EmbeddingStore
from ..retrieval.engine import RetrievalEngine
from ..utils.config import (
    Endpoints,
    config_from_argv,
    resolve_encoder,
    resolve_quantize_corpus,
)
from ..utils.logging_utils import setup_logger
from .common import maybe_enable_compile_cache, build_model_and_params, build_tokenizer, pop_flag


def build_engine(cfg, store_path: str, kg_path: str = "") -> RetrievalEngine:
    model, params = build_model_and_params(cfg)
    tokenizer = build_tokenizer(cfg)
    store = EmbeddingStore.load(store_path, mmap=cfg.eval.mmap_store)
    # eval.encoder selects the query-encode path: flax (exact module tower),
    # fast (fused bf16 serving towers), int8 (fastest, W8A8 — scores within
    # ~1%); eval.quantize_corpus packs the corpus int8 (half the HBM
    # footprint) or int4 (quarter — the capacity mode). "fast"/"int8" are honored explicitly even off-TPU (the
    # serving towers run their XLA reference blocks there), matching the
    # precompute CLI's behavior for the same flag.
    use_fast, quantize = resolve_encoder(cfg.eval.encoder)
    rt = None
    if cfg.eval.shard_corpus or cfg.eval.shard_queries:
        from .common import build_runtime

        rt = build_runtime(cfg)
    clip_r = CLIPRetrieval(
        model, params, tokenizer, store,
        use_fused_encoder=use_fast,
        quantize=quantize,
        quantize_corpus=resolve_quantize_corpus(cfg.eval.quantize_corpus),
        rt=rt,
        shard_corpus=cfg.eval.shard_corpus,
        shard_queries=cfg.eval.shard_queries,
        ann=cfg.eval.ann or None,
        ann_nlist=cfg.eval.ann_nlist or None,
        ann_nprobe=cfg.eval.ann_nprobe,
        ann_index_path=cfg.eval.ann_index or None,
        ann_max_batch_lookups=cfg.eval.ann_max_batch_lookups,
        capacity_multiple=cfg.eval.capacity_multiple,
        rerank=cfg.eval.rerank,
        rerank_factor=cfg.eval.rerank_factor,
        truncate_dim=cfg.eval.truncate_dim,
        rotate=(cfg.eval.rotate_mode if cfg.eval.rotate else False),
        rotate_seed=cfg.eval.rotate_seed,
        pq_m=cfg.eval.pq_m,
        pq_aniso_t=cfg.eval.pq_aniso_t,
    )

    t2s = None
    env = Endpoints.from_env()
    has_kg = bool(kg_path) or bool(env.sparql_endpoint)
    if has_kg and env.mistral_api_key and env.mistral_agent_id:
        from ..knowledge.clients import HTTPSparqlClient, MistralAgentClient
        from ..knowledge.text2sparql import Text2SparqlRetrieval

        from ..knowledge.circuit import CachedRetrieval, CircuitBreakerRetrieval

        if kg_path:
            # --kg: in-process SPARQL engine over a local triple file
            # (.json / .nt) — the knowledge half needs no GraphDB endpoint
            from ..knowledge.kg import LocalKGSparqlClient

            sparql_client = LocalKGSparqlClient(kg_path)
        else:
            sparql_client = HTTPSparqlClient()

        # raise_errors=True: the breaker needs to SEE failures; it degrades
        # them to [] itself (and fast-fails while the endpoints stay down).
        # The TTL'd cache sits outside so popular queries skip the LLM + KG
        # round trips across batches.
        # raise_on_degrade=True: the cache must SEE degradation so a KG blip
        # is never cached as a legitimate empty answer for the whole TTL
        t2s = CachedRetrieval(
            CircuitBreakerRetrieval(
                Text2SparqlRetrieval(
                    MistralAgentClient(), sparql_client, raise_errors=True
                ),
                raise_on_degrade=True,
            )
        )
    engine = RetrievalEngine(clip_r, t2s, cfg.fusion)
    if cfg.fusion.head_params:
        # learned-fusion serving: a trained head artifact (cli.train_fusion)
        # rescores stage-1 candidates; plain /search keeps the linear blend,
        # fused retrieval is served where requested (CLI answers, HTTP
        # {"fused": true})
        from ..train.fusion_trainer import load_fusion_head

        fm, fparams = load_fusion_head(cfg.fusion.head_params)
        engine.set_fusion_head(fm, fparams, factor=cfg.fusion.factor)
    return engine


def main(argv=None) -> None:
    args = list(sys.argv[1:] if argv is None else argv)
    batch_mode = "--batch" in args
    if batch_mode:
        args.remove("--batch")
    store_path = pop_flag(args, "--store", "data/embeddings/store.npz")
    # local knowledge graph (.json/.nt triples) served by the in-process
    # SPARQL engine instead of a remote GraphDB endpoint
    kg_path = pop_flag(args, "--kg", "")
    query = pop_flag(args, "--query")
    http_port = pop_flag(args, "--http")
    if http_port is not None:
        http_port = int(http_port)
    # bind address for the daemon (containers usually need 0.0.0.0)
    http_host = pop_flag(args, "--http-host", "127.0.0.1")
    # 0 = queue without bound; >0 = load-shed (HTTP 503) past that many
    # pending requests, keeping tail latency bounded under overload
    max_pending = int(pop_flag(args, "--max-pending", "0"))
    # comma-separated batch-size buckets to precompile before serving (the
    # first request of a cold bucket pays a full jit compile — minutes on a
    # relay backend); should mirror the MicroBatcher's power-of-two buckets
    warmup = pop_flag(args, "--warmup")
    # opt-in HTTP result cache (entries = (query, alpha) pairs; invalidated
    # on every corpus mutation): popular queries skip the device entirely
    cache_results = int(pop_flag(args, "--cache-results", "0"))
    # opt-in seq-length bucketing of the HTTP micro-batches (short queries
    # keep their cheap compiled program instead of paying the batch max's)
    bucket_queries = "--bucket-queries" in args
    if bucket_queries:
        args.remove("--bucket-queries")
    # multi-host lockstep serving: every process of a jax.distributed job
    # runs this same command; the corpus shards across their devices
    # (requires --eval.shard_corpus=true), followers join the broadcast
    # loop, the coordinator serves queries/HTTP as usual
    multihost = "--multihost" in args
    if multihost:
        args.remove("--multihost")
    mh_batch = int(pop_flag(args, "--multihost-batch", "32"))
    cfg = config_from_argv(args)
    maybe_enable_compile_cache(cfg)
    logger = setup_logger("kemr_tpu.cli.serve")
    if multihost and warmup:
        # warmup launches search collectives directly — followers are not
        # in the broadcast loop yet, so the mesh would deadlock
        raise ValueError("--warmup does not compose with --multihost")
    if multihost and cfg.fusion.head_params:
        raise ValueError(
            "--fusion.head_params does not compose with --multihost "
            "(fused rescoring uses candidate routes outside the broadcast)"
        )
    if multihost:
        # no-op when the launcher already initialized jax.distributed;
        # KEMR_NUM_PROCESSES-driven init otherwise (parallel/mesh.py)
        from ..parallel.mesh import runtime_init

        runtime_init()
    engine = build_engine(cfg, store_path, kg_path=kg_path)
    mode = "knowledge-enhanced" if engine.t2s_retriever else "CLIP-only (no KG endpoints configured)"
    logger.info("engine ready: %s", mode)
    mh = None
    if multihost:
        import jax

        from ..retrieval.multihost import MultiHostRetrieval, MultiHostSearch

        mh = MultiHostSearch(engine.clip_retriever, batch=mh_batch)
        if not mh.is_coordinator:
            logger.info(
                "multihost follower (process %d/%d): joining lockstep serving",
                jax.process_index(), jax.process_count(),
            )
            served = mh.serve()
            logger.info("multihost follower done after %d searches", served)
            return
        logger.info(
            "multihost coordinator: corpus sharded over %d processes",
            jax.process_count(),
        )
        engine.clip_retriever = MultiHostRetrieval(mh)
        # release the followers however the coordinator exits (stop() is
        # idempotent; the clean exit paths below also call it explicitly)
        import atexit

        atexit.register(mh.stop)
    if warmup:
        import time as _time

        sizes = [int(x) for x in warmup.split(",") if x.strip()]
        t0 = _time.monotonic()
        # the daemon always wires /search_image, so warm its program too
        n = engine.clip_retriever.warmup(
            sizes, alpha=cfg.fusion.alpha_clip, image=http_port is not None
        )
        logger.info(
            "warmed %d programs for batch buckets %s in %.1fs",
            n, sizes, _time.monotonic() - t0,
        )

    if http_port is not None:
        # HTTP daemon: concurrent clients aggregate through the MicroBatcher
        from ..retrieval.http_server import RetrievalHTTPServer

        batch_fn = (
            engine.retrieve_text_batch if engine.t2s_retriever
            else engine.retrieve_text_noknowledge_batch
        )

        # per-request blend (?alpha=): None falls back to the configured
        # default; mixed alphas ride one micro-batch (runtime operand)
        default_alpha = cfg.fusion.alpha_clip

        def alphas_batch_fn(queries, alphas):
            resolved = [default_alpha if a is None else float(a) for a in alphas]
            return batch_fn(queries, alpha_clip=resolved)

        def _resolve_alphas(alphas):
            return [default_alpha if a is None else float(a) for a in alphas]

        # hard filters (allow/deny uuid lists) — exact-scan corpora only;
        # under ann='ivf' the hook raises ValueError -> HTTP 400. Multi-host
        # serving blocks filtered search (a collective the followers don't
        # know to join) — None makes the daemon answer 501, not 500
        filtered_batch_fn = None
        if mh is None:
            def filtered_batch_fn(queries, alphas, allow, deny):
                return engine.retrieve_text_filtered_batch(
                    queries, allow, deny, alpha_clip=_resolve_alphas(alphas)
                )

        # caller-supplied per-query candidate sets, scored exactly on the
        # host store (works in every corpus mode incl. ivf)
        def candidates_batch_fn(queries, candidates, alphas):
            return engine.clip_retriever.retrieval_candidates_batch(
                queries, candidates, alpha=_resolve_alphas(alphas)
            )

        # learned-fusion rescoring ({"fused": true}) — only when a trained
        # head artifact is configured (--fusion.head_params)
        fused_batch_fn = None
        if engine.fusion_head is not None:
            def fused_batch_fn(queries, alphas):
                return engine.retrieve_text_fused_batch(
                    queries, alpha_clip=_resolve_alphas(alphas)
                )

        server = RetrievalHTTPServer(
            batch_fn, host=http_host, port=http_port, max_pending=max_pending,
            result_cache_size=cache_results,
            alphas_batch_fn=alphas_batch_fn,
            # live corpus ingest/retire (POST/DELETE /documents); searches
            # keep serving the old corpus until the update swaps in.
            # Corpus mutation is single-host only (multi-host followers
            # would not restage their shards) — None -> HTTP 501
            add_documents_fn=(
                None if mh is not None else engine.clip_retriever.add_documents
            ),
            remove_documents_fn=(
                None if mh is not None else engine.clip_retriever.remove_documents
            ),
            # raw-artifact ingest: POST /documents with base64 images +
            # target texts encodes server-side (no offline precompute)
            encode_documents_fn=(
                None if mh is not None else engine.clip_retriever.encode_documents
            ),
            # POST /snapshot persists the live corpus back to the store file
            # (atomic replace) so ingested documents survive restarts
            snapshot_fn=None if mh is not None else (lambda: {
                "path": store_path,
                "rows": engine.clip_retriever.save_store(store_path),
            }),
            # visual search (POST /search_image): decode/preprocess on the
            # request thread, batch the encode+search device program
            image_batch_fn=engine.retrieve_image_batch,
            image_preprocess_fn=engine.clip_retriever.preprocess_images,
            filtered_batch_fn=filtered_batch_fn,
            candidates_batch_fn=candidates_batch_fn,
            fused_batch_fn=fused_batch_fn,
            # --bucket-queries: split micro-batches by seq bucket so short
            # queries keep their cheap compiled program (encode cost is
            # linear in the batch's LONGEST query's bucket)
            length_bucket_fn=(
                engine.clip_retriever.seq_bucket if bucket_queries else None
            ),
            # multi-host lockstep stall detection: a dead follower blocks
            # the coordinator inside a collective forever (not abortable
            # from Python) — /healthz flips to 503 past the stall timeout
            # so the orchestrator's liveness probe restarts the job
            health_fn=mh.health if mh is not None else None,
        )
        logger.info(
            "serving HTTP on %s:%d (/search, /search_image, /documents, "
            "/healthz, /metrics)",
            *server.address,
        )
        # graceful SIGTERM (the normal orchestrator stop signal): the
        # handler only asks serve_forever to return (shutdown() would
        # deadlock called from THIS thread's suspended signal frame, so it
        # runs on a helper); the FULL close — socket + batcher drain — then
        # runs on the main thread, which keeps the process alive until the
        # drain completes (a daemon helper would die with the process).
        import signal
        import threading as _threading

        def _stop(signum, frame):
            logger.info("signal %d: draining and shutting down", signum)
            _threading.Thread(target=server.request_shutdown, daemon=True).start()

        signal.signal(signal.SIGTERM, _stop)
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            server.close()
            if mh is not None:
                mh.stop()
        return

    def answer(q: str) -> None:
        # a configured fusion head (--fusion.head_params) takes over scoring;
        # otherwise the reference's linear blend
        if engine.fusion_head is not None:
            results = engine.retrieve_text_fused(q)
        elif engine.t2s_retriever:
            results = engine.retrieve_text(q)
        else:
            results = engine.retrieve_text_noknowledge(q)
        print(json.dumps({"query": q, "results": results[:20]}, indent=2))

    def answer_batch(qs) -> None:
        if engine.fusion_head is not None:
            batches = engine.retrieve_text_fused_batch(qs)
        elif engine.t2s_retriever:
            batches = engine.retrieve_text_batch(qs)
        else:
            batches = engine.retrieve_text_noknowledge_batch(qs)
        for q, results in zip(qs, batches):
            print(json.dumps({"query": q, "results": results[:20]}, indent=2))

    try:
        if query is not None:
            answer(query)
            return
        if batch_mode:
            # drain stdin and answer everything in one device program
            queries = [line.strip() for line in sys.stdin if line.strip()]
            if queries:
                answer_batch(queries)
            return
        for line in sys.stdin:
            q = line.strip()
            if not q:
                continue
            answer(q)
    finally:
        if mh is not None:
            mh.stop()


if __name__ == "__main__":
    main()
