"""Corpus-scale serving bench: top-k scan throughput and recall at 1M+ rows.

The reference's corpus is ~43k rows (SURVEY.md §6); this measures the
framework's production story — the packing ladder at 10–25x that scale on
ONE chip. Only the candidate scan depends on corpus size (encode is
corpus-independent), so this times the top-k programs directly with
bench.py's serially-dependent scan timing (honest on the relay chip) and
reports recall@10 of each tier against the exact f32 blend computed on
host.

Run: python scripts/scale_bench.py [--rows 1000000]
      [--exact] (adds the bf16 exact tier: 2x the upload+HBM of int8)
      [--ivf-rows 250000] (opt-in IVF tiers on a clustered corpus)

Synthetic corpus: unit rows with a planted low-rank structure; queries are
noisy copies of corpus rows (so recall@10 has signal to find and ties are
rare). HBM per tier (two towers, D=768, N=1M): bf16 3.1 GB, int8 1.5 GB,
int4 0.8 GB, pq(m=96) 0.2 GB.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax

if os.environ.get("KEMR_FORCE_CPU"):  # smoke-test lane (axon is latched pre-import)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from bench import _retry, _time
from knowledge_enhanced_multimodal_retrieval_tpu.ops.pq import (
    fused_pq_topk,
    pack_pq_host,
    pq_similarity_topk,
    train_pq_codebooks,
)
from knowledge_enhanced_multimodal_retrieval_tpu.ops.similarity import (
    fused_similarity_topk,
    fused_similarity_topk_q4,
    fused_similarity_topk_q8,
    quantize_corpus_host,
    quantize_corpus_host_q4,
)

DUMMY = jnp.zeros((8, 8), jnp.bfloat16)


def _normed(rng, n, d, rank=32):
    """Unit rows with shared low-rank structure (realistic anisotropy)."""
    basis = rng.standard_normal((rank, d)).astype(np.float32)
    x = rng.standard_normal((n, rank)).astype(np.float32) @ basis
    x += 0.3 * rng.standard_normal((n, d)).astype(np.float32)
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-9)


def _recall_at(ids, exact_ids, k=10):
    return float(
        np.mean([
            len(set(ids[i, :k].tolist()) & set(exact_ids[i, :k].tolist())) / k
            for i in range(ids.shape[0])
        ])
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=1_000_000)
    p.add_argument("--ivf-rows", type=int, default=0,
                   help="opt-in IVF tier row count (0 = off). IVF tiers "
                   "run on a separate CLUSTERED synthetic corpus — "
                   "recall-per-probe is a property of corpus cluster "
                   "structure, and the flat tiers' low-rank corpus has "
                   "none, which would make the IVF rows look bad for the "
                   "wrong reason")
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--pq-m", type=int, default=0, help="default dim/8")
    p.add_argument("--exact", action="store_true", help="add the bf16 tier")
    p.add_argument("--json", action="store_true", help="one JSON line out")
    p.add_argument("--out", default="SCALE_BENCH.json",
                   help="artifact path (empty string disables the write)")
    args = p.parse_args()
    n, d, b, k = args.rows, args.dim, args.batch, args.k
    m = args.pq_m or d // 8

    # Persistent compile cache: retries after a transient relay compile drop
    # are then near-free (same plumbing as bench.py — the r3 bench died on
    # exactly one such drop).
    from knowledge_enhanced_multimodal_retrieval_tpu.ops.dispatch import (
        enable_compile_cache,
    )

    enable_compile_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

    rng = np.random.default_rng(0)
    print(f"generating corpus [{n}, {d}] x2 towers + {b} queries ...", flush=True)
    img = _normed(rng, n, d)
    txt = _normed(rng, n, d)
    tgt = rng.choice(n, size=b, replace=False)
    q = img[tgt] + 0.25 * rng.standard_normal((b, d)).astype(np.float32)
    q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-9)

    print("host exact ground truth ...", flush=True)
    t0 = time.time()
    s = args.alpha * (q @ img.T) + (1 - args.alpha) * (q @ txt.T)
    exact_ids = np.argsort(-s, axis=1)[:, : max(10, k)]
    print(f"  {time.time() - t0:.1f}s", flush=True)

    qd = jnp.asarray(q, jnp.bfloat16)
    results = {}
    failed = {}

    def tier(name, fn, *operands, hbm_bytes, truth=None):
        # operands ride as ARGUMENTS, never jit closure constants (the relay
        # serializes closure constants into the compile request — 413s)
        ops = tuple(
            jnp.asarray(o) if not isinstance(o, jax.Array) else o for o in operands
        )

        def pipeline(ops, qq, c0, c1):
            return fn(qq, *ops, k=k, alpha=args.alpha)

        def run():
            # recall first (one run), then honest timing
            _, ids = jax.jit(pipeline)(ops, qd, DUMMY, DUMMY)
            rec = _recall_at(np.asarray(ids), exact_ids if truth is None else truth)
            ts = sorted(_time(pipeline, ops, [qd], DUMMY, DUMMY, iters=args.iters)
                        for _ in range(3))
            return ts[1], rec

        pair, err = _retry(run, what=f"tier {name}")
        if pair is None:
            failed[name] = err
            print(f"{name:>12}: FAILED ({err.splitlines()[0][:160]})", flush=True)
            return
        lat, rec = pair
        results[name] = {
            "latency_ms": round(lat * 1e3, 3),
            "qps": round(b / lat, 1),
            "recall@10": round(rec, 4),
            "hbm_gb": round(hbm_bytes / 2**30, 3),
        }
        print(f"{name:>12}: {lat * 1e3:8.2f} ms/batch-{b}  "
              f"{b / lat:9.1f} q/s  recall@10 {rec:.3f}  "
              f"HBM {hbm_bytes / 2**30:.2f} GB", flush=True)

    print("staging int8 ...", flush=True)
    iq, isc = quantize_corpus_host(img)
    tq, tsc = quantize_corpus_host(txt)
    tier("int8", fused_similarity_topk_q8, iq, isc, tq, tsc,
         hbm_bytes=2 * n * d + 2 * n * 4)
    del iq, tq

    print("staging int4 ...", flush=True)
    ip4, is4 = quantize_corpus_host_q4(img)
    tp4, ts4 = quantize_corpus_host_q4(txt)
    tier("int4", fused_similarity_topk_q4, ip4, is4, tp4, ts4,
         hbm_bytes=n * d + 2 * n * 4)
    del ip4, tp4

    print(f"staging pq m={m} (train + encode) ...", flush=True)
    cb_i = train_pq_codebooks(img, m=m)
    cb_t = train_pq_codebooks(txt, m=m)
    ic, is_p = pack_pq_host(img, cb_i)
    tc, ts_p = pack_pq_host(txt, cb_t)

    def pq_fn(qq, ic, is_p, tc, ts_p, cbi, cbt, k, alpha):
        return pq_similarity_topk(qq.astype(jnp.float32), ic, is_p, tc, ts_p,
                                  cbi, cbt, k=k, alpha=alpha)

    tier("pq", pq_fn, ic, is_p, tc, ts_p, jnp.asarray(cb_i), jnp.asarray(cb_t),
         hbm_bytes=2 * n * m + 2 * n * 4)
    del ic, tc

    if args.exact:
        print("staging bf16 exact ...", flush=True)
        tier("bf16", fused_similarity_topk,
             jnp.asarray(img, jnp.bfloat16), jnp.asarray(txt, jnp.bfloat16),
             hbm_bytes=4 * n * d)

    if args.ivf_rows:
        from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.ann import (
            build_ivf_index,
            ivf_search,
            probed_fraction,
        )

        # clustered corpus (blobs tight enough that noise*sqrt(D) << 1 —
        # the regime where IVF recall-per-probe means something); queries
        # perturb corpus rows
        ni = min(args.ivf_rows, n)
        nc = max(64, ni // 256)
        centers = _normed(rng, nc, d, rank=min(d, 128))
        own = rng.integers(0, nc, ni)
        img_i = centers[own] + 0.02 * rng.standard_normal((ni, d)).astype(np.float32)
        img_i /= np.maximum(np.linalg.norm(img_i, axis=1, keepdims=True), 1e-9)
        txt_i = centers[own] + 0.02 * rng.standard_normal((ni, d)).astype(np.float32)
        txt_i /= np.maximum(np.linalg.norm(txt_i, axis=1, keepdims=True), 1e-9)
        qi = img_i[rng.choice(ni, size=b, replace=False)]
        qi += 0.05 * rng.standard_normal((b, d)).astype(np.float32)
        qi /= np.maximum(np.linalg.norm(qi, axis=1, keepdims=True), 1e-9)
        qd = jnp.asarray(qi, jnp.bfloat16)  # tier() encodes from qd

        nlist = max(64, int(2 * np.sqrt(ni)) // 64 * 64)
        nprobe = max(4, nlist // 32)
        s_i = args.alpha * (qi @ img_i.T) + (1 - args.alpha) * (qi @ txt_i.T)
        exact_i = np.argsort(-s_i, axis=1)[:, : max(10, k)]
        for quant in ("int8", "int4", "pq"):
            # the pq probe's LUT walk is a PER-ELEMENT gather (B * nprobe *
            # cap * m lookups — XLA scalarizes varying-index gathers on
            # TPU), so it is only fast at narrow probes; int8/int4 probes
            # are dense einsums over the gathered rows and take full-width
            # probes in stride
            npq = min(nprobe, 8) if quant == "pq" else nprobe
            print(f"building ivf-{quant} at {ni} rows (nlist={nlist}, "
                  f"nprobe={npq}) ...", flush=True)
            t0 = time.time()
            index = build_ivf_index(img_i, txt_i, nlist, quantize=quant,
                                    train_rows=min(ni, 131072))
            print(f"  build {time.time() - t0:.1f}s  "
                  f"probed fraction {probed_fraction(index, npq):.3f}", flush=True)

            def ivf_fn(qq, ci, ct, pi, pt, pr, si, st, cbi, cbt, k, alpha,
                       _np=npq, _ispq=(quant == "pq")):
                from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.ann import (
                    IVFIndex,
                )

                # scalar-zero placeholders keep the arg structure; the mode
                # flag decides whether they are real codebooks
                idx = IVFIndex(ci, ct, pi, pt, pr, 0.0, si, st,
                               cbi if _ispq else None, cbt if _ispq else None)
                return ivf_search(qq.astype(jnp.float32), idx, k=k,
                                  nprobe=_np, alpha=alpha)

            name = f"ivf-{quant}@{ni // 1000}k"
            opera = [index.centroids_img, index.centroids_txt,
                     index.packed_img, index.packed_txt, index.packed_rows,
                     index.packed_img_scale, index.packed_txt_scale]
            opera += [index.cb_img, index.cb_txt] if quant == "pq" else [
                jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)]
            tier(name, ivf_fn, *opera, truth=exact_i,
                 hbm_bytes=int(index.packed_img.size * index.packed_img.dtype.itemsize * 2))

    payload = {"rows": n, "dim": d, "batch": b, "k": k,
               "backend": jax.default_backend(),
               "tiers": results, "failed_tiers": failed}
    print(json.dumps(payload))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
