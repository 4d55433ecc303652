#!/usr/bin/env python
"""Measure the PQ corpus scan against the other packing tiers on the chip.

    python scripts/profile_pq.py [--n 43000] [--d 768] [--q 256] [--k 20]

Honest timing per the ledger rules: serially-dependent iterations inside one
compiled lax.scan (the next iteration's input depends on the previous
top-k's winner, so XLA cannot DCE or coalesce), a real host fetch at the
end, MEDIANS of repeated runs. Corpus arrays ride as operands (never jit
closure constants on the relay).
"""

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from knowledge_enhanced_multimodal_retrieval_tpu.ops.dispatch import (  # noqa: E402
    enable_compile_cache,
)

# reruns of this script reuse compiled programs (the relay's own compile
# cache is not shared across client processes)
enable_compile_cache("/tmp/kemr_compile_cache")

from knowledge_enhanced_multimodal_retrieval_tpu.ops.pq import (  # noqa: E402
    fused_pq_topk,
    pack_pq_host,
    pq_similarity_topk_xla,
    train_pq_codebooks,
)
from knowledge_enhanced_multimodal_retrieval_tpu.ops.similarity import (  # noqa: E402
    fused_similarity_topk,
    fused_similarity_topk_q4,
    fused_similarity_topk_q8,
    quantize_corpus_host,
    quantize_corpus_host_q4,
)


def median_time(fn, q, ops, iters, reps=5):
    @jax.jit
    def loop(q, *ops):
        def body(carry, _):
            qq = jnp.roll(q, carry, axis=0)
            vals, idx = fn(qq, *ops)
            return idx[0, 0] % q.shape[0], vals[0, 0]

        _, outs = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return outs

    np.asarray(loop(q, *ops))  # compile + warmup
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(loop(q, *ops))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / iters


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=43000)
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--q", type=int, default=256)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args(argv)

    rng = np.random.default_rng(0)
    norm = lambda x: (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)  # noqa: E731
    img = norm(rng.standard_normal((args.n, args.d)))
    txt = norm(rng.standard_normal((args.n, args.d)))
    q = jnp.asarray(norm(rng.standard_normal((args.q, args.d))), jnp.bfloat16)
    k = args.k

    rows = []

    cimg = jnp.asarray(img, jnp.bfloat16)
    ctxt = jnp.asarray(txt, jnp.bfloat16)
    t = median_time(
        lambda qq, a, b: fused_similarity_topk(qq, a, b, k=k), q, (cimg, ctxt), args.iters
    )
    rows.append(("bf16 exact", t, 2 * args.d))

    (i8i, s8i), (i8t, s8t) = quantize_corpus_host(img), quantize_corpus_host(txt)
    t = median_time(
        lambda qq, a, sa, b, sb: fused_similarity_topk_q8(qq, a, sa, b, sb, k=k),
        q, (i8i, s8i, i8t, s8t), args.iters,
    )
    rows.append(("int8", t, args.d + 4))

    (i4i, s4i), (i4t, s4t) = quantize_corpus_host_q4(img), quantize_corpus_host_q4(txt)
    t = median_time(
        lambda qq, a, sa, b, sb: fused_similarity_topk_q4(qq, a, sa, b, sb, k=k),
        q, (i4i, s4i, i4t, s4t), args.iters,
    )
    rows.append(("int4", t, args.d // 2 + 4))

    m = args.d // 8
    t0 = time.perf_counter()
    cb_i = train_pq_codebooks(img, m=m)
    cb_t = train_pq_codebooks(txt, m=m)
    train_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    (pi, psi), (pt, pst) = pack_pq_host(img, cb_i), pack_pq_host(txt, cb_t)
    pack_s = time.perf_counter() - t0
    cbi_j, cbt_j = jnp.asarray(cb_i), jnp.asarray(cb_t)
    t = median_time(
        lambda qq, a, sa, b, sb, ca, cb: pq_similarity_topk_xla(qq, a, sa, b, sb, ca, cb, k=k),
        q, (pi, psi, pt, pst, cbi_j, cbt_j), args.iters,
    )
    rows.append((f"pq m={m} xla", t, m + 4))
    t = median_time(
        lambda qq, a, sa, b, sb, ca, cb: fused_pq_topk(qq, a, sa, b, sb, ca, cb, k=k),
        q, (pi, psi, pt, pst, cbi_j, cbt_j), args.iters,
    )
    rows.append((f"pq m={m} adc", t, m + 4))

    print(f"top-k @ [{args.n}, {args.d}] x2 towers, batch {args.q}, k={k} "
          f"(medians of 5 x {args.iters} chained iters on {jax.devices()[0].platform})")
    for name, tt, bpr in rows:
        print(f"  {name:12} {tt * 1e3:7.2f} ms/batch   {bpr:6d} B/row/tower")
    print(f"pq codebook train {train_s:.1f}s, pack {pack_s:.1f}s (host, one-time staging)")


if __name__ == "__main__":
    main()
