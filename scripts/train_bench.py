"""Honest train-step throughput artifact (VERDICT r3 #7).

Measures the fine-tuning hot loop — the reference's only hot loop
(``/root/reference/src/clip/train/trainer.py:144-228``) — on the default
backend with the repo's documented defenses against the time-shared relay
chip: MEDIAN of >= 15 serially-dependent steps (each step's state feeds the
next, and a loss-scalar host fetch per step forces real execution), plus
MFU from the compiled program's own cost_analysis FLOPs so program
efficiency is separated from chip-sharing noise.

    python scripts/train_bench.py [--model ViT-B/32] [--batch 64]
        [--steps 15] [--remat] [--out TRAIN_BENCH.json]

Prints one JSON line and writes it to ``--out`` (default TRAIN_BENCH.json).
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
import jax.numpy as jnp
import numpy as np

# TPU v5e (1 chip) peak dense bf16 — nominal spec for the MFU denominator;
# the relay chip's measured chained-matmul ceiling is ~176 TFLOP/s
# (CLAUDE.md), reported alongside as mfu_vs_measured.
PEAK_BF16_FLOPS = 197e12
MEASURED_BF16_FLOPS = 176e12


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ViT-B/32")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--steps", type=int, default=15)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--out", default="TRAIN_BENCH.json")
    p.add_argument("--quick", action="store_true", help="tiny arch smoke run")
    args = p.parse_args()

    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.ops.dispatch import (
        enable_compile_cache,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime
    from knowledge_enhanced_multimodal_retrieval_tpu.parallel.sharding import (
        host_local_batch_to_global,
        replicated,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.train.trainer import (
        make_optimizer,
        make_train_step,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import TrainConfig

    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    )

    if args.quick:
        M.ARCHS.setdefault(
            "bench-tiny", M.CLIPArch(16, 32, 1, 32, 16, 16, 600, 32, 2, 1, vision_heads=2)
        )
        args.model, args.batch, args.steps = "bench-tiny", 8, 6

    cfg = TrainConfig(batch_size=args.batch)
    model = M.build_model(args.model, dtype=jnp.bfloat16, remat=args.remat)
    arch = model.arch
    params = M.init_params(model, jax.random.PRNGKey(0))
    rt = MeshRuntime.create()
    optimizer = make_optimizer(cfg, steps_per_epoch=100, params=params)
    state = {
        "params": jax.device_put(params, replicated(rt.mesh)),
        "opt_state": jax.device_put(optimizer.init(params), replicated(rt.mesh)),
        "step": jnp.zeros((), jnp.int32),
    }
    step_fn = make_train_step(model, optimizer, cfg, rt)

    rng = np.random.default_rng(0)
    B, S, L = args.batch, arch.image_resolution, arch.context_length
    host_batch = {
        "images": rng.standard_normal((B, S, S, 3)).astype(np.float32),
        "query_ids": _ids(rng, B, L, arch.vocab_size),
        "target_ids": _ids(rng, B, L, arch.vocab_size),
    }
    batch = host_local_batch_to_global(host_batch, rt.mesh, rt.data_axes)

    # program FLOPs from the compiled step itself (not a hand model) —
    # lower BEFORE the first donated execution invalidates `state`
    flops = None
    try:
        cost = step_fn.lower(state, batch).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass  # cost_analysis is best-effort on some backends

    # warmup = compile + first execution (state is donated: rebind!)
    state, m = step_fn(state, batch)
    float(m["loss"])

    times = []
    for _ in range(max(15, args.steps) if not args.quick else args.steps):
        t0 = time.perf_counter()
        state, m = step_fn(state, batch)
        loss = float(m["loss"])  # host fetch: the step truly executed
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)

    tokens_per_step = B * 2 * L + B * arch.grid_size**2  # text ids + image patches
    result = {
        "metric": f"train step wall time ({args.model}, batch={B}, remat={args.remat})",
        "value": round(med * 1e3, 1),
        "unit": "ms/step (median)",
        "detail": {
            "backend": jax.default_backend(),
            "steps_timed": len(times),
            "step_ms_median": round(med * 1e3, 1),
            "step_ms_min": round(min(times) * 1e3, 1),
            "step_ms_max": round(max(times) * 1e3, 1),
            "examples_per_s": round(B / med, 1),
            "tokens_per_s": round(tokens_per_step / med, 1),
            "program_tflops_per_step": round(flops / 1e12, 2) if flops else None,
            "mfu_vs_peak": round(flops / med / PEAK_BF16_FLOPS, 4) if flops else None,
            "mfu_vs_measured_ceiling": (
                round(flops / med / MEASURED_BF16_FLOPS, 4) if flops else None
            ),
            "loss_final": loss,
            "note": "median of serially-dependent steps with per-step loss "
                    "fetch; the relay chip is time-shared, trust the median",
        },
    }
    line = json.dumps(result)
    print(line)
    with open(args.out, "w") as f:
        f.write(line + "\n")


def _ids(rng, b: int, length: int, vocab: int) -> np.ndarray:
    ids = np.zeros((b, length), np.int32)
    ids[:, 0] = vocab - 2
    n = rng.integers(3, length - 1, b)
    for i, k in enumerate(n):
        ids[i, 1 : 1 + k] = rng.integers(1, vocab - 2, k)
        ids[i, 1 + k] = vocab - 1
    return ids


if __name__ == "__main__":
    main()
