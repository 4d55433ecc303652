"""Vision-tower encode throughput vs batch size (VERDICT r4 #2).

Every recorded vision number was batch 64 (`scripts/profile_vision.py`);
embed+pool (~4 ms) and 24 per-layer kernel launches amortize with batch, so
for a THROUGHPUT metric (corpus precompute — the reference's hot loop 1,
``/root/reference/src/clip/eval/evaluator.py:115-137``) the batch axis is
the standard lever. Measures `encode_image_fast` int8 (and optionally bf16)
at batch 64/128/256, medians of >= 5 chained runs per point, and writes
VISION_SWEEP.json.

Run: python scripts/vision_batch_sweep.py [--model ViT-L/14]
        [--batches 64,128,256] [--bf16] [--medians 5]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("KEMR_FORCE_CPU"):  # smoke-test lane (axon is latched pre-import)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from bench import _retry, _time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ViT-L/14")
    p.add_argument("--batches", default="64,128,256")
    p.add_argument("--bf16", action="store_true", help="also sweep the bf16 tower")
    p.add_argument("--medians", type=int, default=5)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--out", default="VISION_SWEEP.json")
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.models.fast_encode import (
        encode_image_fast,
        make_vision_plan,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.ops.dispatch import (
        enable_compile_cache,
    )

    enable_compile_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

    if args.quick:
        M.ARCHS.setdefault(
            "bench-tiny", M.CLIPArch(16, 32, 1, 32, 16, 16, 600, 32, 2, 1, vision_heads=2)
        )
        args.model, args.batches, args.medians, args.iters = "bench-tiny", "4,8", 2, 3

    model = M.build_model(args.model, dtype=jnp.bfloat16)
    arch = model.arch
    params = M.init_params(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    dummy = jnp.zeros((8, 8), jnp.bfloat16)

    quantizations = ["int8"] + (["bf16"] if args.bf16 else [])
    plans = {q: make_vision_plan(params, quantize=None if q == "bf16" else q)
             for q in quantizations}

    results = {}
    for q in quantizations:
        for b in [int(x) for x in args.batches.split(",")]:
            imgs = [jnp.asarray(
                rng.standard_normal((b, arch.image_resolution, arch.image_resolution, 3)),
                jnp.float32,
            )]

            def pipeline(plan, im, cimg, ctxt):
                e = encode_image_fast(arch, plan, im)
                return e[:, :16], (e[:, :16] * 100).astype(jnp.int32)

            def measure(_b=b, _q=q, _imgs=imgs):
                ts = [
                    _time(pipeline, plans[_q], _imgs, dummy, dummy, iters=args.iters)
                    for _ in range(args.medians)
                ]
                return statistics.median(ts), ts

            pair, err = _retry(measure, what=f"{q} batch {b}")
            key = f"{q}@{b}"
            if pair is None:
                results[key] = {"error": err.splitlines()[0][:200]}
                print(f"{key:>10}: FAILED {err.splitlines()[0][:120]}", flush=True)
                continue
            med, ts = pair
            results[key] = {
                "ms_per_batch": round(med * 1e3, 2),
                "img_per_s": round(b / med, 1),
                "runs_ms": [round(t * 1e3, 2) for t in ts],
            }
            print(f"{key:>10}: {med * 1e3:8.2f} ms/batch  {b / med:8.1f} img/s  "
                  f"(runs {' '.join(f'{t * 1e3:.1f}' for t in ts)})", flush=True)

    payload = {"model": args.model, "backend": jax.default_backend(),
               "medians_of": args.medians, "results": results,
               "generated_unix": int(time.time())}
    print(json.dumps(payload))
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
