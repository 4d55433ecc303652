"""End-to-end HTTP daemon benchmark (VERDICT r4 #5).

Drives the deployable artifact — ``retrieval.http_server.RetrievalHTTPServer``
wrapping the production L/14 int8+length-bucketed serving program — with N
concurrent HTTP callers (text + image mix) and records q/s, p50/p95/p99
end-to-end latency, and the MicroBatcher's dispatched-batch-size histogram.

This is the daemon counterpart of the library-level serving bench
(``bench.py``): it includes real HTTP framing, the MicroBatcher, result
slicing, and JSON serialization. Expected ceiling on the relay chip is the
~one-round-trip-per-batch engine floor (~2.5k q/s, CLAUDE.md); on this
1-core build VM the Python client threads also share the single core with
the server, so the number here is a FLOOR for a real multicore host.

Replaces the reference's per-query, library-only serving path
(``/root/reference/src/retrieval.py:79``) with a deployable measured one.

Run: python scripts/daemon_bench.py [--model ViT-L/14] [--corpus 43000]
        [--clients 32] [--requests-per-client 40] [--image-frac 0.1]
        [--out DAEMON_BENCH.json]
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("KEMR_FORCE_CPU"):  # smoke-test lane (axon is latched pre-import)
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def _make_queries(rng, n):
    words = ["cat", "hello", "ca", "he", "painting", "madonna", "portrait",
             "landscape", "bronze", "statue", "manuscript", "tapestry"]
    out = []
    for _ in range(n):
        k = int(rng.integers(2, 10))
        out.append(" ".join(rng.choice(words, size=k)))
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ViT-L/14")
    p.add_argument("--corpus", type=int, default=43000)
    p.add_argument("--clients", type=int, default=32)
    p.add_argument("--requests-per-client", type=int, default=40)
    p.add_argument("--image-frac", type=float, default=0.1)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--max-batch", type=int, default=256)
    p.add_argument("--max-wait-ms", type=float, default=4.0)
    p.add_argument("--out", default="DAEMON_BENCH.json")
    p.add_argument("--quick", action="store_true", help="tiny arch smoke run")
    args = p.parse_args()

    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.ops.dispatch import (
        enable_compile_cache,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import (
        CLIPRetrieval,
        EmbeddingStore,
        RetrievalEngine,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.http_server import (
        RetrievalHTTPServer,
    )

    enable_compile_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

    if args.quick:
        M.ARCHS.setdefault(
            "bench-tiny", M.CLIPArch(16, 32, 1, 32, 16, 16, 600, 32, 2, 1, vision_heads=2)
        )
        args.model, args.corpus = "bench-tiny", 2048
        args.clients, args.requests_per_client = 8, 6

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)

    print(f"building {args.model} + {args.corpus}-row store ...", flush=True)
    model = M.build_model(args.model, dtype=jax.numpy.bfloat16)
    params = M.init_params(model, jax.random.PRNGKey(0))
    # synthetic BPE merges (no network egress -> no real CLIP vocab); token
    # ids stay far below the arch vocab (OOB gathers on TPU return garbage)
    tok = CLIPTokenizer([("c", "a"), ("ca", "t</w>"), ("h", "e"), ("he", "l")])

    def norm(x):
        return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-9)

    d = model.arch.embed_dim
    store = EmbeddingStore(
        image=norm(rng.standard_normal((args.corpus, d))).astype(np.float32),
        text=norm(rng.standard_normal((args.corpus, d))).astype(np.float32),
        uuids=[f"uuid-{i:06d}" for i in range(args.corpus)],
    )
    # the production winner config: int8 fused encoder + int8 packed corpus,
    # sequence-bucketed dispatch (bench.py's int8+length-bucketed candidate).
    # The fused kernels need lane-aligned widths (128) — the --quick tiny
    # arch rides the flax towers instead.
    fused_ok = on_tpu and model.arch.text_width % 128 == 0
    retriever = CLIPRetrieval(
        model, params, tok, store, top_k=args.k,
        use_fused_encoder=fused_ok, quantize="int8" if fused_ok else None,
        quantize_corpus=on_tpu, use_pallas=on_tpu,
    )
    engine = RetrievalEngine(retriever, t2s_retriever=None)

    # warm the (batch-bucket x seq-bucket) program grid BEFORE accepting
    # traffic — the first request of a cold signature pays a full remote
    # compile (minutes on the relay; bucketing exists so this grid is small).
    # Micro-batches pad to powers of two, so the full pow2 ladder up to
    # max_batch can occur under bursty concurrency — warm all of it (the
    # persistent compile cache makes this one-time per shape).
    sizes, b = [], 1
    while b <= args.max_batch:
        sizes.append(b)
        b *= 2
    img_sizes = [s for s in sizes if s <= 64]  # image batcher caps at 64
    print(f"warming buckets {sizes} (+image {img_sizes}) ...", flush=True)
    t0 = time.time()
    nprog = retriever.warmup(sizes, alpha=0.5)
    if args.image_frac > 0:
        nprog += retriever.warmup(img_sizes, alpha=0.5, image=True)
    print(f"  {nprog} programs in {time.time() - t0:.1f}s", flush=True)

    server = RetrievalHTTPServer(
        engine.retrieve_text_noknowledge_batch,
        host="127.0.0.1", port=0,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        default_n=args.k,
        image_batch_fn=engine.retrieve_image_batch,
        image_preprocess_fn=retriever.preprocess_images,
        length_bucket_fn=retriever.seq_bucket,
    )

    queries = _make_queries(rng, 512)
    s = model.arch.image_resolution
    # real PNG blobs: the server decodes + preprocesses on the request
    # thread (production cost, measured honestly on this 1-core host)
    import io

    from PIL import Image

    img_blobs = []
    for _ in range(8):
        im = Image.fromarray(rng.integers(0, 255, (s, s, 3), dtype=np.uint8), "RGB")
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        img_blobs.append(base64.b64encode(buf.getvalue()).decode())

    import urllib.request

    def get(path):
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
            return json.loads(r.read())

    def post(path, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())

    with server:
        port = server.address[1]
        print(f"daemon on :{port}; driving {args.clients} clients x "
              f"{args.requests_per_client} requests "
              f"({args.image_frac:.0%} images) ...", flush=True)
        assert get("/healthz")["ok"]

        lat_text, lat_img, errors = [], [], []
        lock = threading.Lock()
        start_barrier = threading.Barrier(args.clients + 1)

        def client(cid):
            crng = np.random.default_rng(cid)
            start_barrier.wait()
            for i in range(args.requests_per_client):
                is_img = crng.random() < args.image_frac
                t0 = time.perf_counter()
                try:
                    if is_img:
                        out = post("/search_image",
                                   {"image": img_blobs[int(crng.integers(0, len(img_blobs)))],
                                    "n": args.k})
                        ok = bool(out["results"])
                    else:
                        q = queries[int(crng.integers(0, len(queries)))]
                        out = post("/search", {"query": q, "n": args.k})
                        ok = bool(out["results"])
                    dt = time.perf_counter() - t0
                    with lock:
                        (lat_img if is_img else lat_text).append(dt)
                        if not ok:
                            errors.append("empty result")
                except Exception as e:  # noqa: BLE001
                    with lock:
                        errors.append(f"{type(e).__name__}: {e}")

        threads = [threading.Thread(target=client, args=(i,)) for i in range(args.clients)]
        for t in threads:
            t.start()
        start_barrier.wait()
        t0 = time.perf_counter()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        stats = server.batcher.stats
        img_stats = (server.image_batcher.stats
                     if getattr(server, "image_batcher", None) else {})

    total = len(lat_text) + len(lat_img)

    def pct(lats):
        if not lats:
            return {}
        ls = sorted(lats)
        q = lambda p: ls[min(len(ls) - 1, int(p * len(ls)))]  # noqa: E731
        return {"p50_ms": round(q(0.5) * 1e3, 1), "p95_ms": round(q(0.95) * 1e3, 1),
                "p99_ms": round(q(0.99) * 1e3, 1), "mean_ms": round(statistics.mean(ls) * 1e3, 1),
                "n": len(ls)}

    result = {
        "metric": f"HTTP daemon throughput ({args.model}, int8+bucketed, "
                  f"{args.clients} clients)",
        "value": round(total / wall, 1),
        "unit": "requests/sec end-to-end",
        "detail": {
            "backend": jax.default_backend(),
            "corpus_rows": args.corpus,
            "wall_s": round(wall, 2),
            "requests_total": total,
            "errors": errors[:10],
            "error_count": len(errors),
            "text": pct(lat_text),
            "image": pct(lat_img),
            "text_batcher": stats,
            "image_batcher": img_stats,
            "note": "1-core build VM: client threads share the core with "
                    "the server; real hosts are ~10x on the host side. "
                    "Ceiling = relay RTT per micro-batch.",
        },
    }
    line = json.dumps(result)
    print(line)
    with open(args.out, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
