"""North-star benchmark: fused T2I+T2T queries/sec/chip @ 43k corpus.

Measures the serving hot path end to end on the real chip (BASELINE.json):
ViT-L/14 text-tower query encoding (77-token context, bf16 compute) + the
blended two-tower similarity + top-k over a 43,000 x 768 corpus, per batch of
queries.

``vs_baseline`` compares against the *reference pipeline's design* measured
on the same hardware: per-batch unfused encode, full [Q, N] score-matrix
materialization, then the reference's host-side NumPy full-argsort ranking
(``/root/reference/src/clip/eval/metrics.py:30-34`` runs ranking on CPU after
a device encode; ``evaluator.py:115-143`` round-trips embeddings to host per
batch). The reference publishes no numbers of its own (BASELINE.md), so the
naive-port path is the baseline the TPU-native design is scored against.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "queries/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _probe_backend(attempts: int = 3, timeout_s: int = 150, sleep_s: int = 60) -> bool:
    """True if the default JAX backend initializes AND executes a program.

    Backend init on the tunneled TPU can hang *indefinitely* when the relay
    is down (observed: ``jax.devices()`` blocking forever), which would turn
    this bench into silence instead of its one JSON line. Probe in a
    SUBPROCESS with a timeout so this process never touches a hung backend;
    retry a few times because relay dropouts are often transient.
    """
    code = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((8, 8), jnp.bfloat16);"
        "print('BACKEND_OK', float(jax.jit(lambda a: (a @ a).sum())(x)))"
    )
    for attempt in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=timeout_s,
            )
            if "BACKEND_OK" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if attempt + 1 < attempts:
            time.sleep(sleep_s)
    return False


# Timing on the tunneled TPU is subtle: block_until_ready does not reliably
# await remote execution, and identical in-flight calls can be coalesced.
# The robust method used here chains K pipeline iterations through a data
# dependency inside ONE jitted lax.scan (the device must execute them
# serially) and forces a host fetch of the result; per-iteration time is the
# slope between two K values, which cancels dispatch + fetch overhead.
NUM_INPUT_VARIANTS = 8


def _build(corpus_n: int, batch: int, model_name: str):
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.models.clip import l2_normalize

    model = M.build_model(model_name, dtype=jnp.bfloat16)
    arch = model.arch
    # Text tower params only would suffice; init the full model for realism.
    params = M.init_params(model, jax.random.PRNGKey(0))

    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import trim_to_bucket

    rng = np.random.default_rng(0)
    ids_variants = []
    for _ in range(NUM_INPUT_VARIANTS):
        ids = np.zeros((batch, arch.context_length), np.int32)
        # realistic serving queries: 8-30 BPE tokens (short user sentences)
        lengths = rng.integers(8, 31, batch)
        ids[:, 0] = arch.vocab_size - 2
        for i, L in enumerate(lengths):
            ids[i, 1 : 1 + L] = rng.integers(1, arch.vocab_size - 2, L)
            ids[i, 1 + L] = arch.vocab_size - 1
        # bucketed trim (exact math: causal mask + EOT pooling)
        ids_variants.append(jnp.asarray(trim_to_bucket(ids)))

    def norm(x):
        return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)

    corpus_img = jnp.asarray(norm(rng.standard_normal((corpus_n, arch.embed_dim))), jnp.bfloat16)
    corpus_txt = jnp.asarray(norm(rng.standard_normal((corpus_n, arch.embed_dim))), jnp.bfloat16)

    def encode(params, ids):
        return l2_normalize(model.apply({"params": params}, ids, method=M.CLIP.encode_text))

    return model, params, ids_variants, corpus_img, corpus_txt, encode


def _retry(fn, what: str, attempts: int = 3, backoff_s: float = 30.0):
    """Run fn() with retries; returns (result, None) or (None, error_str).

    Relay compile drops ("response body closed", "Broken pipe") are transient
    (CLAUDE.md: "just re-run") and killed the round-3 bench at a single
    candidate's warmup compile. With the persistent compile cache enabled,
    retries are near-free for everything already compiled.
    """
    err = None
    for attempt in range(attempts):
        try:
            return fn(), None
        except Exception as e:  # noqa: BLE001 — any failure must degrade, not crash
            err = f"{type(e).__name__}: {e}"
            short = err.splitlines()[0][:200]
            print(f"bench: {what} attempt {attempt + 1}/{attempts} failed: {short}",
                  file=sys.stderr)
            if attempt + 1 < attempts:
                time.sleep(backoff_s * (attempt + 1))
    return None, err


def _scan_timer(pipeline, params, ids0, cimg, ctxt, k_iters: int) -> float:
    """Wall time of k_iters serially-dependent pipeline executions (one jit)."""
    import functools

    @functools.partial(jax.jit, static_argnames=("length",))
    def loop(params, ids0, cimg, ctxt, length):
        n_mod = jax.tree_util.tree_leaves(ids0)[0].shape[0]

        def body(carry, _):
            # data-dependent input permutation (ids0 may be a tuple of
            # per-seq-bucket groups — roll each)
            ids = jax.tree_util.tree_map(lambda a: jnp.roll(a, carry, axis=0), ids0)
            vals, idx = pipeline(params, ids, cimg, ctxt)
            return idx[0, 0] % n_mod, vals[0, 0]
        _, outs = jax.lax.scan(body, jnp.int32(0), None, length=length)
        return outs

    np.asarray(loop(params, ids0, cimg, ctxt, k_iters))  # warmup/compile
    t0 = time.perf_counter()
    np.asarray(loop(params, ids0, cimg, ctxt, k_iters))  # fetch forces real sync
    return time.perf_counter() - t0


def _time_both(pipeline, params, ids_variants, cimg, ctxt, iters: int):
    """(slope, absolute) per-iteration device times via the two-K method.

    The slope cancels dispatch/fetch overhead (the honest number at real
    sizes); the absolute ``t2/k2`` includes it but stays meaningful when
    tiny --quick programs put the slope inside timing noise. Callers must
    pick ONE metric for all candidates so comparisons stay commensurable.
    """
    k1 = max(2, iters // 5)
    k2 = max(k1 + 4, iters)
    t1 = _scan_timer(pipeline, params, ids_variants[0], cimg, ctxt, k1)
    t2 = _scan_timer(pipeline, params, ids_variants[0], cimg, ctxt, k2)
    return (t2 - t1) / (k2 - k1), t2 / k2


def _time(pipeline, params, ids_variants, cimg, ctxt, iters: int, warmup: int = 0) -> float:
    slope, absolute = _time_both(pipeline, params, ids_variants, cimg, ctxt, iters)
    return slope if slope >= 20e-6 else absolute


def _engine_throughput(model, params, corpus_img, corpus_txt, args) -> float:
    """q/s through RetrievalEngine.retrieve_text_noknowledge_batch."""
    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import (
        CLIPRetrieval,
        EmbeddingStore,
        RetrievalEngine,
    )

    # Synthetic BPE table (no network egress -> no real CLIP vocab); token
    # ids are small but the tokenize cost per word is representative.
    words = ["cat", "hel", "hello", "ca", "he"]
    tok = CLIPTokenizer([("c", "a"), ("ca", "t</w>"), ("h", "e"), ("he", "l")])
    rng = np.random.default_rng(1)
    query_sets = [
        [" ".join(rng.choice(words, size=rng.integers(4, 12))) for _ in range(args.batch)]
        for _ in range(4)
    ]

    store = EmbeddingStore(
        image=np.asarray(corpus_img, np.float32),
        text=np.asarray(corpus_txt, np.float32),
        uuids=[f"uuid-{i:06d}" for i in range(corpus_img.shape[0])],
    )
    on_tpu = jax.default_backend() == "tpu"
    retriever = CLIPRetrieval(
        model, params, tok, store, top_k=args.k, corpus_dtype=jnp.bfloat16, use_pallas=on_tpu
    )
    engine = RetrievalEngine(retriever, t2s_retriever=None)

    engine.retrieve_text_noknowledge_batch(query_sets[0])  # warmup/compile
    iters = max(4, args.iters // 4)
    t0 = time.perf_counter()
    for i in range(iters):
        engine.retrieve_text_noknowledge_batch(query_sets[i % len(query_sets)])
    sync_qps = args.batch / ((time.perf_counter() - t0) / iters)

    # steady-state serving: double-buffered batches (dispatch overlaps fetch)
    stream = [query_sets[i % len(query_sets)] for i in range(iters * 2)]
    t0 = time.perf_counter()
    n_done = sum(len(r) for r in engine.retrieve_text_noknowledge_batches(stream))
    pipe_qps = n_done / (time.perf_counter() - t0)
    return sync_qps, pipe_qps


def _vision_throughput(model, params, args) -> float:
    """Images/sec through the int8 fast vision tower (batch 64)."""
    from knowledge_enhanced_multimodal_retrieval_tpu.models.fast_encode import (
        encode_image_fast,
        make_vision_plan,
    )

    plan = make_vision_plan(params, quantize="int8")
    arch = model.arch
    rng = np.random.default_rng(3)
    vb = 64
    images = [
        jnp.asarray(
            rng.standard_normal((vb, arch.image_resolution, arch.image_resolution, 3)),
            jnp.float32,
        )
    ]
    dummy = jnp.zeros((8, 8), jnp.bfloat16)

    def pipeline(plan, imgs, cimg, ctxt):
        e = encode_image_fast(arch, plan, imgs)
        return e[:, :16], (e[:, :16] * 100).astype(jnp.int32)

    t = _time(pipeline, plan, images, dummy, dummy, iters=max(4, args.iters // 5))
    return round(vb / t, 1)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", type=int, default=43_000)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--model", default="ViT-L/14")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--quick", action="store_true", help="tiny sizes for smoke-testing")
    args = p.parse_args()

    # persistent client-side compile cache: the relay does NOT share its
    # compile cache across processes, so without this every bench run
    # re-pays every L/14 remote compile (minutes each). Survives restarts.
    from knowledge_enhanced_multimodal_retrieval_tpu.ops.dispatch import (
        enable_compile_cache,
    )

    enable_compile_cache(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

    if args.quick:
        args.corpus, args.batch, args.iters, args.model = 4096, 64, 5, "ViT-B/32"

    # Degrade rather than hang: if the TPU relay is unreachable (backend init
    # blocks forever), fall back to a reduced-size CPU run so the driver still
    # gets its one JSON line. The probe runs BEFORE this process first touches
    # the backend, in a subprocess it can always time out.
    degraded = None
    if os.environ.get("JAX_PLATFORMS", "axon") != "cpu" and not _probe_backend():
        jax.config.update("jax_platforms", "cpu")
        degraded = "tpu-relay-unreachable; cpu fallback at reduced sizes"
        args.corpus, args.batch, args.iters = min(args.corpus, 4096), min(args.batch, 64), 5
        args.model = "ViT-B/32"
        print(f"bench: {degraded}", file=sys.stderr)

    from knowledge_enhanced_multimodal_retrieval_tpu.ops.similarity import (
        fused_similarity_topk,
        similarity_topk_xla,
    )

    model, params, ids_variants, corpus_img, corpus_txt, encode = _build(args.corpus, args.batch, args.model)

    from knowledge_enhanced_multimodal_retrieval_tpu.models.clip import l2_normalize
    from knowledge_enhanced_multimodal_retrieval_tpu.models.fast_encode import (
        encode_text_fast,
        make_text_plan,
    )

    # --- TPU-native path: encode + fused blend/top-k in one jitted program ---
    def native(params, ids, cimg, ctxt):
        q = encode(params, ids).astype(cimg.dtype)
        return fused_similarity_topk(q, cimg, ctxt, k=args.k, alpha=args.alpha, interpret=False)

    def native_xla(params, ids, cimg, ctxt):
        q = encode(params, ids).astype(cimg.dtype)
        return similarity_topk_xla(q, cimg, ctxt, k=args.k, alpha=args.alpha)

    def native_fused_enc(plan, ids, cimg, ctxt):
        q = l2_normalize(encode_text_fast(model.arch, plan, ids)).astype(cimg.dtype)
        return fused_similarity_topk(q, cimg, ctxt, k=args.k, alpha=args.alpha, interpret=False)

    # int8*/int4* = opt-in W8A8 / packed-corpus quantization (int8 scores
    # within ~1% of bf16; int4 is the 4x-capacity mode); every other
    # candidate is exact math
    QUANTIZED = {
        "int8-encoder+topk", "int8-enc+int8-corpus", "int8-enc+int4-corpus",
        "int8+length-bucketed", "int4+length-bucketed",
    }
    on_tpu = jax.default_backend() == "tpu"
    extra_ids = {}  # per-candidate ids operand overrides (bucketed groups)
    if on_tpu:
        from knowledge_enhanced_multimodal_retrieval_tpu.ops.similarity import (
            fused_similarity_topk_q4,
            fused_similarity_topk_q8,
            quantize_corpus,
            quantize_corpus_host_q4,
        )

        # fused-block Pallas encoder plans (one-time weight packing)
        plan = make_text_plan(params)
        plan_q8 = make_text_plan(params, quantize="int8")
        cimg_q, cimg_s = quantize_corpus(corpus_img)
        ctxt_q, ctxt_s = quantize_corpus(corpus_txt)
        cimg_q4, cimg_s4 = quantize_corpus_host_q4(np.asarray(corpus_img, np.float32))
        ctxt_q4, ctxt_s4 = quantize_corpus_host_q4(np.asarray(corpus_txt, np.float32))

        # packed corpora AND their per-row scales ride via the cimg/ctxt args
        # of the timing loop as (packed, scales) pairs — never close over
        # corpus-sized arrays in jit on the relay (413 errors; the scales
        # grow linearly with corpus rows)
        def native_q8_corpus(plan, ids, cimg, ctxt):
            q = l2_normalize(encode_text_fast(model.arch, plan, ids)).astype(jnp.bfloat16)
            return fused_similarity_topk_q8(
                q, cimg[0], cimg[1], ctxt[0], ctxt[1], k=args.k, alpha=args.alpha
            )

        def native_q4_corpus(plan, ids, cimg, ctxt):
            q = l2_normalize(encode_text_fast(model.arch, plan, ids)).astype(jnp.bfloat16)
            return fused_similarity_topk_q4(
                q, cimg[0], cimg[1], ctxt[0], ctxt[1], k=args.k, alpha=args.alpha
            )

        candidates = [
            ("int8-enc+int8-corpus", native_q8_corpus, plan_q8,
             (cimg_q, cimg_s), (ctxt_q, ctxt_s)),
            ("int8-enc+int4-corpus", native_q4_corpus, plan_q8,
             (cimg_q4, cimg_s4), (ctxt_q4, ctxt_s4)),
            ("int8-encoder+topk", native_fused_enc, plan_q8, corpus_img, corpus_txt),
            ("fused-encoder+topk", native_fused_enc, plan, corpus_img, corpus_txt),
            ("fused-pallas", native, params, corpus_img, corpus_txt),
            ("xla", native_xla, params, corpus_img, corpus_txt),
        ]

        # length-bucketed dispatch (serve --bucket-queries): the SAME 256
        # queries split by seq bucket — short queries (<= 14 tokens) ride
        # the 16-bucket program at half the encode cost, each group padded
        # to its power-of-two batch (overcounted rows are computed but only
        # the real args.batch queries count toward qps). Same math, better
        # scheduling — a legitimate serving strategy, timed as one program.
        def _split_groups(ids_np):
            # minimal LEGAL padding per group (row count x seq must tile the
            # fused kernels' 256-row tile) — steady-state serving fills its
            # buckets, so minimal padding is the honest steady-state shape
            ids_np = np.asarray(ids_np)
            used = ids_np.shape[1] - 1 - np.argmax((ids_np != 0)[:, ::-1], axis=1) + 1
            groups = []
            for b in (16, ids_np.shape[1]):
                rows = ids_np[(used <= b) if b == 16 else (used > 16)][:, :b]
                if rows.shape[0] == 0:
                    continue
                n, mult = rows.shape[0], max(1, 256 // b)
                target = -(-n // mult) * mult
                if target > n:
                    rows = np.concatenate([rows, np.repeat(rows[-1:], target - n, 0)])
                groups.append(jnp.asarray(rows))
            return tuple(groups)

        ids_grouped = _split_groups(ids_variants[0])
        if len(ids_grouped) == 2:
            def _bucketed(topk_fn):
                def f(plan, ids_pair, cimg_pack, ctxt_pack):
                    outs = []
                    for ids_g in ids_pair:
                        q = l2_normalize(encode_text_fast(model.arch, plan, ids_g)).astype(jnp.bfloat16)
                        outs.append(topk_fn(q, cimg_pack, ctxt_pack))
                    # couple EVERY group into the fetched [0, 0] elements: a
                    # plain concatenation lets XLA dead-code-eliminate whole
                    # groups the timer's single fetched element never reads
                    # (measured: an impossible 2.5 ms/batch)
                    vals = sum(o[0][:1, :1] for o in outs)
                    idx = sum(o[1][:1, :1] for o in outs)
                    return vals, idx
                return f

            native_bucketed = _bucketed(
                lambda q, ci, ct: fused_similarity_topk_q8(
                    q, ci[0], ci[1], ct[0], ct[1], k=args.k, alpha=args.alpha
                )
            )
            native_bucketed_q4 = _bucketed(
                lambda q, ci, ct: fused_similarity_topk_q4(
                    q, ci[0], ci[1], ct[0], ct[1], k=args.k, alpha=args.alpha
                )
            )
            extra_ids["int8+length-bucketed"] = ids_grouped
            extra_ids["int4+length-bucketed"] = ids_grouped
            candidates.append(
                ("int8+length-bucketed", native_bucketed, plan_q8,
                 (cimg_q, cimg_s), (ctxt_q, ctxt_s))
            )
            candidates.append(
                ("int4+length-bucketed", native_bucketed_q4, plan_q8,
                 (cimg_q4, cimg_s4), (ctxt_q4, ctxt_s4))
            )
    else:
        candidates = [("xla", native_xla, params, corpus_img, corpus_txt)]
    slopes, absolutes, failed_candidates = {}, {}, {}
    for name, fn, p, ci, ct in candidates:
        ids_op = [extra_ids.get(name, ids_variants[0])]
        pair, err = _retry(
            lambda: _time_both(fn, p, ids_op, ci, ct, iters=args.iters),
            what=f"candidate {name}",
        )
        if pair is None:
            failed_candidates[name] = err
            continue
        slopes[name], absolutes[name] = pair
    if not slopes:
        print(json.dumps({
            "metric": "fused T2I+T2T queries/sec/chip",
            "value": 0.0,
            "unit": "queries/sec/chip",
            "vs_baseline": 0.0,
            "detail": {"error": "every candidate failed after retries",
                       "failed_candidates": failed_candidates,
                       "backend": jax.default_backend()},
        }))
        return
    # one metric for ALL candidates: slopes normally; if any slope sank
    # into timing noise (tiny --quick programs), absolute times throughout —
    # mixing metrics would crown the wrong winner
    times = absolutes if min(slopes.values()) < 20e-6 else slopes
    best_name = min(times, key=times.get)
    native_time = times[best_name]
    qps = args.batch / native_time
    # fastest EXACT-math pipeline, reported alongside so precision changes
    # are never conflated with speedups across runs (None if every exact
    # candidate degraded this run)
    exact_times = {k: v for k, v in times.items() if k not in QUANTIZED}
    exact_name = min(exact_times, key=exact_times.get) if exact_times else None

    # --- reference-design baseline on the same chip: unfused encode, full ---
    # score matrix to host, NumPy full argsort ranking (metrics.py:30-34).
    encode_jit = jax.jit(encode)
    cimg32 = np.asarray(corpus_img, np.float32)
    ctxt32 = np.asarray(corpus_txt, np.float32)

    def reference_design(params, ids):
        q = np.asarray(encode_jit(params, ids))  # device->host round trip per batch
        scores = args.alpha * (q @ cimg32.T) + (1 - args.alpha) * (q @ ctxt32.T)
        top = np.argsort(-scores, axis=1)[:, : args.k]  # full argsort, reference path
        return top

    def _measure_reference():
        ref_iters = max(2, args.iters // 6)
        reference_design(params, ids_variants[0])  # warmup encode compile
        t0 = time.perf_counter()
        for i in range(ref_iters):
            reference_design(params, ids_variants[i % len(ids_variants)])
        return args.batch / ((time.perf_counter() - t0) / ref_iters)

    ref_qps, ref_err = _retry(_measure_reference, what="reference-design baseline")
    if ref_qps is None:
        # last chip-measured value (BENCH_r02.json) so vs_baseline stays a
        # number; flagged in detail so the run is auditable
        failed_candidates["reference-design"] = ref_err
        ref_qps = 215.3

    # --- engine-level throughput: the public batch API end to end ------------
    # (RetrievalEngine.retrieve_text_noknowledge_batch: host tokenize ->
    # device encode + fused blend/top-k -> host result dicts). Every call
    # fetches [Q, k] to host, so wall timing is honest here.
    engine_pair, engine_err = _retry(
        lambda: _engine_throughput(model, params, corpus_img, corpus_txt, args),
        what="engine throughput",
    )
    if engine_pair is None:
        failed_candidates["engine-api"] = engine_err
        engine_sync_qps = engine_pipe_qps = None
    else:
        engine_sync_qps, engine_pipe_qps = engine_pair

    # --- vision-tower encode throughput (corpus precompute rate) -------------
    vision_img_s = None
    if not args.quick:
        vision_img_s, _ = _retry(
            lambda: _vision_throughput(model, params, args),
            what="vision throughput", attempts=2,
        )  # auxiliary; never fail the headline bench

    result = {
        "metric": f"fused T2I+T2T queries/sec/chip ({args.model}, corpus={args.corpus}, batch={args.batch}, k={args.k})",
        "value": round(qps, 1),
        "unit": "queries/sec/chip",
        "vs_baseline": round(qps / ref_qps, 2),
        "detail": {
            "backend": jax.default_backend(),
            "impl": best_name,
            "batch_latency_ms": round(native_time * 1e3, 3),
            "impl_times_ms": {k: round(v * 1e3, 3) for k, v in times.items()},
            # int8 = opt-in W8A8 dynamic quantization (scores within ~1% of
            # the bf16 path; see tests/test_retrieval_engine.py)
            "quantized_impls": sorted(QUANTIZED & times.keys()),
            "exact_impl": exact_name,
            "exact_qps": round(args.batch / exact_times[exact_name], 1) if exact_name else None,
            "exact_batch_latency_ms": round(exact_times[exact_name] * 1e3, 3) if exact_name else None,
            "reference_design_qps": round(ref_qps, 1),
            "engine_api_qps": round(engine_sync_qps, 1) if engine_sync_qps else None,
            "engine_pipelined_qps": round(engine_pipe_qps, 1) if engine_pipe_qps else None,
            # candidates/stages that failed all retries this run (empty = clean)
            "failed_candidates": failed_candidates,
            # image encode rate (int8 fast path, batch 64) — the corpus
            # precompute throughput; None under --quick or on failure
            "vision_img_per_s_int8": vision_img_s,
            # non-None only when the TPU relay was unreachable and the bench
            # fell back to CPU at reduced sizes — the value is then NOT
            # comparable to chip runs
            "degraded": degraded,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # noqa: BLE001 — the one-JSON-line contract
        # holds even on terminal failure: the driver must record a
        # number-shaped artifact, never a bare traceback (VERDICT r3 §weak 7)
        import traceback

        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            "metric": "fused T2I+T2T queries/sec/chip",
            "value": 0.0,
            "unit": "queries/sec/chip",
            "vs_baseline": 0.0,
            "detail": {"error": f"{type(exc).__name__}: {exc}"[:500]},
        }))
