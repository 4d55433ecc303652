"""Break down the serving program: fused encode vs fused top-k on-chip.

Uses bench.py's serially-dependent scan timing (honest on the relay chip).
Run: python scripts/profile_serving.py [--batch 256] [--corpus 43000]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _build, _time
from knowledge_enhanced_multimodal_retrieval_tpu.models.clip import l2_normalize
from knowledge_enhanced_multimodal_retrieval_tpu.models.fast_encode import (
    encode_text_fast,
    make_text_plan,
)
from knowledge_enhanced_multimodal_retrieval_tpu.ops.similarity import (
    fused_similarity_topk,
    fused_similarity_topk_q8,
    quantize_corpus,
)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", type=int, default=43_000)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--model", default="ViT-L/14")
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    model, params, ids_variants, cimg, ctxt, _ = _build(args.corpus, args.batch, args.model)
    plan = make_text_plan(params)
    plan_q8 = make_text_plan(params, quantize="int8")

    def encode_only(plan, ids, cimg, ctxt):
        q = l2_normalize(encode_text_fast(model.arch, plan, ids)).astype(cimg.dtype)
        # fold the query back to a [Q, k]-shaped output so the scan-timer
        # state threading matches the full pipeline's signature
        # idx must depend on the encode output so the scan's carry keeps a
        # real data dependence (otherwise XLA hoists the loop-invariant body)
        idx = (q[:, : args.k].astype(jnp.float32) * 1000.0).astype(jnp.int32)
        return q[:, : args.k].astype(jnp.float32), idx

    def topk_only(plan, ids, cimg, ctxt):
        # ids participates only via a cheap cast so encode is excluded
        q = l2_normalize(
            jnp.broadcast_to(ids[:, :1].astype(cimg.dtype), (ids.shape[0], cimg.shape[1]))
            + cimg[: ids.shape[0]]
        )
        return fused_similarity_topk(q, cimg, ctxt, k=args.k, alpha=0.5)

    def full(plan, ids, cimg, ctxt):
        q = l2_normalize(encode_text_fast(model.arch, plan, ids)).astype(cimg.dtype)
        return fused_similarity_topk(q, cimg, ctxt, k=args.k, alpha=0.5)

    cimg_q, cimg_s = quantize_corpus(cimg)
    ctxt_q, ctxt_s = quantize_corpus(ctxt)

    # queries at the SERVING dtype (bf16) — f32 queries would force the q8
    # tiles to upcast and the dot to run at half MXU rate, mis-stating the
    # split; the int8 corpus rides via the cimg/ctxt loop args (never close
    # over big arrays in jit on the relay)
    def full_q8corpus(plan, ids, cimg, ctxt):
        q = l2_normalize(encode_text_fast(model.arch, plan, ids)).astype(jnp.bfloat16)
        return fused_similarity_topk_q8(q, cimg, cimg_s, ctxt, ctxt_s, k=args.k, alpha=0.5)

    def topk_q8_only(plan, ids, cimg, ctxt):
        q = l2_normalize(
            jnp.broadcast_to(ids[:, :1].astype(jnp.bfloat16), (ids.shape[0], cimg.shape[1]))
            + cimg[: ids.shape[0]].astype(jnp.bfloat16)
        )
        return fused_similarity_topk_q8(q, cimg, cimg_s, ctxt, ctxt_s, k=args.k, alpha=0.5)

    for name, fn, p, ci, ct in [
        ("encode_only", encode_only, plan, cimg, ctxt),
        ("topk_only", topk_only, plan, cimg, ctxt),
        ("topk_q8c", topk_q8_only, plan, cimg_q, ctxt_q),
        ("full", full, plan, cimg, ctxt),
        ("encode_q8", encode_only, plan_q8, cimg, ctxt),
        ("full_q8", full, plan_q8, cimg, ctxt),
        ("full_q8_q8c", full_q8corpus, plan_q8, cimg_q, ctxt_q),
    ]:
        t = _time(fn, p, ids_variants, ci, ct, iters=args.iters)
        print(f"{name:12s} {t * 1e3:8.3f} ms  ({args.batch / t:9.1f} q/s)")


if __name__ == "__main__":
    main()
