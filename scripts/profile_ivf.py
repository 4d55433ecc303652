"""IVF probe vs brute-force scan at scale on the real chip.

Honest timing per the repo ledger: every iteration is serially dependent
(a scalar of the previous output perturbs the next query batch inside one
``lax.scan``) and the result is fetched, so the relay cannot coalesce or
DCE anything; medians over repeats.

Usage: python scripts/profile_ivf.py [--n 262144] [--batch 8] [--repeats 7]

The IVF win is LOW-BATCH serving on BIG corpora: probe traffic per query is
``nprobe·cap/N`` of the corpus, so when ``batch × probed_fraction < 1`` the
probe reads less HBM than one brute pass. At batch 256 on 43k rows the
fused brute scan wins (see bench.py) — this script is the other regime.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def median_time(fn, repeats):
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        float(np.asarray(out[0]).ravel()[0])  # real host fetch
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=262144)
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--nlist", type=int, default=512)
    p.add_argument("--nprobe", type=int, default=16)
    p.add_argument("--iters", type=int, default=8, help="chained steps per timing")
    p.add_argument("--repeats", type=int, default=7)
    args = p.parse_args()

    from knowledge_enhanced_multimodal_retrieval_tpu.ops.similarity import (
        fused_similarity_topk_q8,
        quantize_corpus_host,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.ann import (
        build_ivf_index,
        ivf_search,
        probed_fraction,
    )

    rng = np.random.default_rng(0)
    norm = lambda x: x / np.linalg.norm(x, axis=1, keepdims=True)  # noqa: E731
    centers = norm(rng.standard_normal((256, args.d))).astype(np.float32)
    which = rng.integers(0, 256, args.n)
    img = norm(centers[which] + 0.1 * rng.standard_normal((args.n, args.d))).astype(np.float32)
    txt = norm(centers[which] + 0.1 * rng.standard_normal((args.n, args.d))).astype(np.float32)
    q0 = jnp.asarray(norm(rng.standard_normal((args.batch, args.d))).astype(np.float32))

    print(f"corpus {args.n} x {args.d}, batch {args.batch}, k {args.k}", flush=True)

    # --- brute force, int8-packed (the capacity-comparable baseline) ------
    ci, si = quantize_corpus_host(img)
    ct, st = quantize_corpus_host(txt)

    @jax.jit
    def brute_chain(q, ci, si, ct, st):
        def step(qc, _):
            v, i = fused_similarity_topk_q8(
                qc.astype(jnp.bfloat16), ci, si, ct, st, k=args.k, alpha=0.5
            )
            qc = qc + 1e-12 * v[0, 0]  # serial dependency
            return qc, (v[0, 0], i[0, 0])
        _, (vs, _) = jax.lax.scan(step, q, None, length=args.iters)
        return vs

    t = median_time(lambda: brute_chain(q0, ci, si, ct, st), args.repeats)
    brute_ms = t / args.iters * 1e3
    print(f"brute int8 full scan: {brute_ms:.2f} ms/batch", flush=True)

    # --- IVF int8 ----------------------------------------------------------
    t0 = time.time()
    index = build_ivf_index(img, txt, nlist=args.nlist, quantize="int8", seed=1)
    print(f"ivf int8 build: {time.time()-t0:.1f}s cap={index.cap} "
          f"spill={index.spill_fraction:.3f} "
          f"probed_fraction={probed_fraction(index, args.nprobe):.4f}", flush=True)
    arrays = (index.centroids_img, index.centroids_txt, index.packed_img,
              index.packed_txt, index.packed_rows,
              index.packed_img_scale, index.packed_txt_scale,
              index.cb_img, index.cb_txt)

    def ivf_chain_fn(nprobe):
        @jax.jit
        def chain(q, ci_, ct_, pi, pt, pr, si_, st_, cbi, cbt):
            from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.ann import IVFIndex
            idx = IVFIndex(ci_, ct_, pi, pt, pr, 0.0, si_, st_, cbi, cbt)
            def step(qc, _):
                v, i = ivf_search(qc, idx, k=args.k, nprobe=nprobe, alpha=0.5)
                return qc + 1e-12 * v[0, 0], (v[0, 0], i[0, 0])
            _, (vs, _) = jax.lax.scan(step, q, None, length=args.iters)
            return vs
        return chain

    for nprobe in (args.nprobe, 4 * args.nprobe):
        chain = ivf_chain_fn(min(nprobe, index.nlist))
        t = median_time(lambda: chain(q0, *arrays), args.repeats)
        print(f"ivf int8 nprobe={nprobe}: {t / args.iters * 1e3:.2f} ms/batch "
              f"({brute_ms / (t / args.iters * 1e3):.1f}x vs brute)", flush=True)

    # --- IVF-PQ (residual codes, ~30x capacity) ----------------------------
    t0 = time.time()
    ivfpq = build_ivf_index(img, txt, nlist=args.nlist, quantize="pq", seed=1)
    print(f"ivf-pq build: {time.time()-t0:.1f}s codes={ivfpq.packed_img.shape}", flush=True)
    arrays_pq = (ivfpq.centroids_img, ivfpq.centroids_txt, ivfpq.packed_img,
                 ivfpq.packed_txt, ivfpq.packed_rows,
                 ivfpq.packed_img_scale, ivfpq.packed_txt_scale,
                 ivfpq.cb_img, ivfpq.cb_txt)
    chain = ivf_chain_fn(min(args.nprobe, ivfpq.nlist))
    t = median_time(lambda: chain(q0, *arrays_pq), args.repeats)
    print(f"ivf-pq nprobe={args.nprobe}: {t / args.iters * 1e3:.2f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
