"""Honest train-step throughput artifact (VERDICT r3 #7, extended r5).

Measures the fine-tuning hot loop — the reference's only hot loop
(``/root/reference/src/clip/train/trainer.py:144-228``) — on the default
backend with the repo's documented defenses against the time-shared relay
chip: MEDIAN of >= 15 serially-dependent steps (each step's state feeds the
next, and a loss-scalar host fetch per step forces real execution), plus
MFU from the compiled program's own cost_analysis FLOPs so program
efficiency is separated from chip-sharing noise.

Single entry:
    python scripts/train_bench.py [--model ViT-B/32] [--batch 64]
        [--steps 15] [--remat] [--out TRAIN_BENCH.json]

MFU curve (r5): ``--sweep`` runs the batch ladder 64/128/256 on ViT-B/32
plus one ViT-L/14+remat point, writing every entry into one artifact.
``--breakdown`` adds a per-section wall/FLOPs split (image tower fwd, text
towers fwd, fwd+loss, fwd+bwd, full step) for the first entry — sections
are timed as ONE scan-chained jitted program each (the relay coalesces
identical in-flight executions; chaining defeats that).

Prints one JSON line and writes the artifact to ``--out``
(default TRAIN_BENCH.json).
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

# TPU v5e (1 chip) peak dense bf16 — nominal spec for the MFU denominator;
# the relay chip's measured chained-matmul ceiling is ~176 TFLOP/s
# (CLAUDE.md), reported alongside as mfu_vs_measured.
PEAK_BF16_FLOPS = 197e12
MEASURED_BF16_FLOPS = 176e12


def _ids(rng, b: int, length: int, vocab: int) -> np.ndarray:
    ids = np.zeros((b, length), np.int32)
    ids[:, 0] = vocab - 2
    n = rng.integers(3, length - 1, b)
    for i, k in enumerate(n):
        ids[i, 1 : 1 + k] = rng.integers(1, vocab - 2, k)
        ids[i, 1 + k] = vocab - 1
    return ids


def _flops_of(lowerable, *args) -> float | None:
    try:
        cost = lowerable.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:
        return None  # cost_analysis is best-effort on some backends


def _median_chain(fn_jit, length: int, *args, repeats: int = 3) -> float:
    """Median wall time per iteration of a scan-chained program.

    ``fn_jit(*args, length=k)`` must run k serially-dependent iterations and
    return something fetchable. One warmup (compile), then ``repeats`` timed
    runs; returns the median per-iteration seconds. Two-length slope is
    overkill here — the chains are long enough (>= 8) that launch overhead
    amortizes below the chip-sharing noise floor.
    """
    np.asarray(jax.tree_util.tree_leaves(fn_jit(*args, length=2))[0])
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn_jit(*args, length=length))[0])
        ts.append((time.perf_counter() - t0) / length)
    return statistics.median(ts)


def _section_breakdown(model, params, batch, steps: int) -> dict:
    """Wall + FLOPs per pipeline section, each as one chained program.

    Sections nest (fwd+loss includes towers; fwd+bwd includes fwd+loss), so
    subtracting adjacent entries isolates backward and optimizer cost.
    """
    import functools

    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.models.clip import l2_normalize
    from knowledge_enhanced_multimodal_retrieval_tpu.train.losses import (
        joint_contrastive_loss,
    )

    images = batch["images"].astype(jnp.bfloat16)
    q_ids, t_ids = batch["query_ids"], batch["target_ids"]

    def img_fwd(p, x):
        return l2_normalize(model.apply({"params": p}, x, method=M.CLIP.encode_image))

    def txt2_fwd(p, q, t):
        qe = l2_normalize(model.apply({"params": p}, q, method=M.CLIP.encode_text))
        te = l2_normalize(model.apply({"params": p}, t, method=M.CLIP.encode_text))
        return qe, te

    def fwd_loss(p, x, q, t):
        ie = img_fwd(p, x)
        qe, te = txt2_fwd(p, q, t)
        loss, _ = joint_contrastive_loss(ie, qe, te)
        return loss

    grad_fn = jax.value_and_grad(fwd_loss)

    @functools.partial(jax.jit, static_argnames=("length",))
    def chain_img(p, x, length):
        def body(c, _):
            out = img_fwd(p, x + c * 1e-6)
            return out[0, 0].astype(jnp.float32), ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=length)
        return c

    @functools.partial(jax.jit, static_argnames=("length",))
    def chain_txt(p, q, t, length):
        def body(c, _):
            # data dependence via a rolled id batch (ids are integers; a
            # scalar perturbation would change token values)
            qe, te = txt2_fwd(p, jnp.roll(q, c, axis=0), t)
            return (qe[0, 0] > te[0, 0]).astype(jnp.int32), ()
        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=length)
        return c

    @functools.partial(jax.jit, static_argnames=("length",))
    def chain_loss(p, x, q, t, length):
        def body(c, _):
            return fwd_loss(p, x + c * 1e-6, q, t).astype(jnp.float32), ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=length)
        return c

    @functools.partial(jax.jit, static_argnames=("length",))
    def chain_grad(p, x, q, t, length):
        def body(c, _):
            loss, _g = grad_fn(p, x + c * 1e-6, q, t)
            # fold EVERY gradient leaf into the carry — feeding only one
            # leaf back lets XLA dead-code-eliminate the other gradient
            # branches (first run measured an impossible 512 TFLOP/s)
            gsum = sum(jnp.sum(l).astype(jnp.float32)
                       for l in jax.tree_util.tree_leaves(_g))
            return (loss + gsum * 1e-9).astype(jnp.float32), ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=length)
        return c

    n = max(8, steps)
    out = {}
    out["image_tower_fwd_ms"] = round(_median_chain(chain_img, n, params, images) * 1e3, 2)
    out["text_towers_fwd_ms"] = round(_median_chain(chain_txt, n, params, q_ids, t_ids) * 1e3, 2)
    out["fwd_loss_ms"] = round(_median_chain(chain_loss, n, params, images, q_ids, t_ids) * 1e3, 2)
    out["fwd_bwd_ms"] = round(_median_chain(chain_grad, n, params, images, q_ids, t_ids) * 1e3, 2)
    out["flops_fwd_loss"] = _flops_of(jax.jit(fwd_loss), params, images, q_ids, t_ids)
    out["flops_fwd_bwd"] = _flops_of(jax.jit(grad_fn), params, images, q_ids, t_ids)
    return out


def run_entry(model_name: str, batch: int, remat: bool, steps: int,
              breakdown: bool = False) -> dict:
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
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

    cfg = TrainConfig(batch_size=batch)
    model = M.build_model(model_name, dtype=jnp.bfloat16, remat=remat)
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
    B, S, L = batch, arch.image_resolution, arch.context_length
    host_batch = {
        "images": rng.standard_normal((B, S, S, 3)).astype(np.float32),
        "query_ids": _ids(rng, B, L, arch.vocab_size),
        "target_ids": _ids(rng, B, L, arch.vocab_size),
    }
    batch_g = host_local_batch_to_global(host_batch, rt.mesh, rt.data_axes)

    # program FLOPs from the compiled step itself (not a hand model) —
    # lower BEFORE the first donated execution invalidates `state`
    flops = _flops_of(step_fn, state, batch_g)
    extra = (
        _section_breakdown(model, state["params"], batch_g, steps)
        if breakdown else None
    )

    # warmup = compile + first execution (state is donated: rebind!)
    state, m = step_fn(state, batch_g)
    float(m["loss"])

    step_chained = None
    if breakdown:
        # device-only step cost: N steps chained inside ONE program (state
        # is the scan carry), one fetch at the end — separates the per-step
        # relay round trip (~55-80 ms, CLAUDE.md) from the device step.
        # Donation is inert under the scan trace, so the carry doubles the
        # live state — fine at B/32, why this stays off the L/14 entry.
        import functools

        @functools.partial(jax.jit, static_argnames=("length",))
        def chain_steps(state, batch, length):
            def body(s, _):
                s2, mm = step_fn(s, batch)
                return s2, mm["loss"]
            _, losses = jax.lax.scan(body, state, None, length=length)
            return losses[-1]

        try:
            float(chain_steps(state, batch_g, length=2))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(chain_steps(state, batch_g, length=8))
                ts.append((time.perf_counter() - t0) / 8)
            step_chained = round(statistics.median(ts) * 1e3, 2)
        except Exception as e:  # noqa: BLE001 — breakdown extras must degrade
            print(f"chained-step timing failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        state, m = step_fn(state, batch_g)
        loss = float(m["loss"])  # host fetch: the step truly executed
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)

    tokens_per_step = B * 2 * L + B * arch.grid_size**2  # text ids + image patches
    entry = {
        "model": model_name,
        "batch": B,
        "remat": remat,
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
    }
    if extra:
        if step_chained is not None:
            extra["step_chained_ms"] = step_chained
        entry["breakdown"] = extra
    return entry


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ViT-B/32")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--steps", type=int, default=15)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--out", default="TRAIN_BENCH.json")
    p.add_argument("--quick", action="store_true", help="tiny arch smoke run")
    p.add_argument("--sweep", action="store_true",
                   help="MFU curve: B/32 at batch 64/128/256 + L/14@64+remat")
    p.add_argument("--breakdown", action="store_true",
                   help="per-section wall/FLOPs split on the first entry")
    p.add_argument("--skip-l14", action="store_true",
                   help="sweep without the L/14 point (10-15 min compile)")
    args = p.parse_args()

    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.ops.dispatch import (
        enable_compile_cache,
    )

    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    )

    if args.quick:
        M.ARCHS.setdefault(
            "bench-tiny", M.CLIPArch(16, 32, 1, 32, 16, 16, 600, 32, 2, 1, vision_heads=2)
        )
        args.model, args.batch, args.steps = "bench-tiny", 8, 6

    if args.sweep and not args.quick:
        plan = [
            ("ViT-B/32", 64, False),
            ("ViT-B/32", 128, False),
            ("ViT-B/32", 256, False),
        ]
        if not args.skip_l14:
            plan.append(("ViT-L/14", 64, True))  # no-remat L/14 bs64 OOMs (CLAUDE.md)
    else:
        plan = [(args.model, args.batch, args.remat)]

    entries = []
    for i, (model_name, batch, remat) in enumerate(plan):
        print(f"== {model_name} batch={batch} remat={remat} ==", flush=True)
        try:
            entry = run_entry(model_name, batch, remat,
                              max(15, args.steps) if not args.quick else args.steps,
                              breakdown=args.breakdown and i == 0)
        except Exception as e:  # noqa: BLE001 — a failed point degrades, not crashes
            entry = {"model": model_name, "batch": batch, "remat": remat,
                     "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(entry), flush=True)
        entries.append(entry)

    ok = [e for e in entries if "error" not in e]
    head = ok[0] if ok else {}
    result = {
        "metric": "train step wall time "
                  f"({head.get('model')}, batch={head.get('batch')}, "
                  f"remat={head.get('remat')})",
        "value": head.get("step_ms_median"),
        "unit": "ms/step (median)",
        "detail": {
            "backend": jax.default_backend(),
            "entries": entries,
            "note": "median of serially-dependent steps with per-step loss "
                    "fetch; the relay chip is time-shared, trust the median",
        },
    }
    line = json.dumps(result)
    print(line)
    with open(args.out, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
