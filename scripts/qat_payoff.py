"""QAT payoff measurement (VERDICT r4 #4): does training through the int8
rounding buy serving quality vs plain post-training quantization?

Two IDENTICAL runs (same arch/seed/data/steps) of the contrastive trainer —
``qat=False`` (PTQ baseline) vs ``qat=True`` — then both checkpoints deploy
through the SAME int8 serving path (``models/fast_encode`` with
``quantize="int8"``; off-TPU this runs its XLA reference blocks — identical
math, so the quality deltas measured here are backend-independent).

Reported per run:
- ``score_mae``: mean |int8 blended score - own-f32 blended score| over the
  full query x corpus matrix (serving fidelity to the run's own model);
- ``recall10_vs_f32``: recall@10 of the int8 ranking against the run's own
  f32 ranking (does quantization change what the model retrieves?);
- ``recall10_truth_f32`` / ``recall10_truth_int8``: absolute recall@10 of
  the ground-truth pair (did QAT cost full-precision quality?);
- ``final_loss``: train loss tail (QAT must not destabilize training).

The payoff claim is the DELTA between runs: QAT should shrink
score_mae / raise recall10_vs_f32 without hurting the truth-recall or the
loss. A ~zero delta is an honest negative result (int8 W8A8 rounding is
already within noise at these widths).

Anchors the int8 serving path that replaces the reference's fp32-only eval
(``/root/reference/src/clip/eval/evaluator.py:91``).

Run: python scripts/qat_payoff.py [--epochs 12] [--pairs 256] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("KEMR_FORCE_CPU"):  # smoke-test lane (axon is latched pre-import)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def _recall_at(ids, truth, k=10):
    return float(np.mean([truth[i] in set(ids[i, :k].tolist()) for i in range(len(truth))]))


def _overlap_at(ids_a, ids_b, k=10):
    return float(np.mean([
        len(set(ids_a[i, :k].tolist()) & set(ids_b[i, :k].tolist())) / k
        for i in range(ids_a.shape[0])
    ]))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pairs", type=int, default=256)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (quality deltas are "
                   "backend-independent; keeps the chip free)")
    p.add_argument("--out", default="QAT_PAYOFF.json")
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.quick:
        args.pairs, args.epochs, args.batch = 48, 2, 16

    from knowledge_enhanced_multimodal_retrieval_tpu.data.datasets import (
        DataPipeline,
        make_synthetic_source,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.models.clip import l2_normalize
    from knowledge_enhanced_multimodal_retrieval_tpu.models.fast_encode import (
        encode_image_fast,
        encode_text_fast,
        make_text_plan,
        make_vision_plan,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.train import trainer as T
    from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import TrainConfig

    # width-64 4-layer towers: small enough to train on any backend in
    # minutes, wide enough that int8 rounding error is not pure noise
    merges = [("c", "a"), ("ca", "t</w>"), ("h", "e"), ("he", "l"), ("l", "o")]
    tok = CLIPTokenizer(merges)
    arch = M.CLIPArch(
        embed_dim=64, image_resolution=32, vision_layers=4, vision_width=64,
        vision_patch_size=16, context_length=32, vocab_size=tok.vocab_size,
        text_width=64, text_heads=4, text_layers=4, vision_heads=4,
    )

    src = make_synthetic_source(args.pairs, image_size=32)
    pipe = DataPipeline(src, tok, image_size=32, context_length=32, num_workers=0)

    def train_run(qat: bool):
        import tempfile

        model = M.CLIP(arch, dtype=jnp.float32)
        params = M.init_params(model, jax.random.PRNGKey(0))
        with tempfile.TemporaryDirectory() as td:
            cfg = TrainConfig(
                batch_size=args.batch, epochs=args.epochs, lr=args.lr, qat=qat,
                warmup_steps=5, seed=0, checkpoint_dir=os.path.join(td, "ckpt"),
            )
            trainer = T.CLIPTrainer(model, params, pipe, None, cfg, out_dir=td)
            state = trainer.state
            order = np.arange(args.pairs)
            losses = []
            step_rng = np.random.default_rng(0)
            for _ in range(args.epochs):
                step_rng.shuffle(order)
                for i in range(0, args.pairs - args.batch + 1, args.batch):
                    db = trainer._device_batch(
                        pipe.make_batch(order[i : i + args.batch].tolist())
                    )
                    state, metrics = trainer.train_step(state, db)
                    losses.append(float(metrics["loss"]))
        tail = statistics.mean(losses[-5:])
        return model, jax.device_get(state["params"]), losses, tail

    def eval_run(model, params):
        """Serving-quality metrics for one trained checkpoint."""
        # full corpus batch (pairs is a power-of-two-friendly size)
        batch = pipe.make_batch(list(range(args.pairs)))
        images = jnp.asarray(batch.images)
        q_ids = jnp.asarray(batch.query_ids)
        t_ids = jnp.asarray(batch.target_ids)

        # f32 oracle towers (the run's own model, flax path)
        enc_t = jax.jit(lambda p, ids: l2_normalize(
            model.apply({"params": p}, ids, method=M.CLIP.encode_text)))
        enc_i = jax.jit(lambda p, im: l2_normalize(
            model.apply({"params": p}, im, method=M.CLIP.encode_image)))
        q32 = np.asarray(enc_t(params, q_ids), np.float32)
        t32 = np.asarray(enc_t(params, t_ids), np.float32)
        i32 = np.asarray(enc_i(params, images), np.float32)

        # int8 serving towers (same path the daemon deploys)
        tplan = make_text_plan(params, quantize="int8")
        vplan = make_vision_plan(params, quantize="int8")
        q8 = np.asarray(l2_normalize(encode_text_fast(arch, tplan, q_ids)), np.float32)
        t8 = np.asarray(l2_normalize(encode_text_fast(arch, tplan, t_ids)), np.float32)
        i8 = np.asarray(l2_normalize(encode_image_fast(arch, vplan, images)), np.float32)

        a = args.alpha
        s32 = a * (q32 @ i32.T) + (1 - a) * (q32 @ t32.T)
        s8 = a * (q8 @ i8.T) + (1 - a) * (q8 @ t8.T)
        ids32 = np.argsort(-s32, axis=1)
        ids8 = np.argsort(-s8, axis=1)
        truth = np.arange(args.pairs)
        return {
            "score_mae": round(float(np.mean(np.abs(s8 - s32))), 5),
            "score_max_err": round(float(np.max(np.abs(s8 - s32))), 5),
            "recall10_vs_f32": round(_overlap_at(ids8, ids32), 4),
            "recall10_truth_f32": round(_recall_at(ids32, truth), 4),
            "recall10_truth_int8": round(_recall_at(ids8, truth), 4),
        }

    out = {}
    for name, qat in (("ptq", False), ("qat", True)):
        print(f"== training run: {name} (qat={qat}) ==", flush=True)
        model, params, losses, tail = train_run(qat)
        metrics = eval_run(model, params)
        metrics["final_loss_mean5"] = round(tail, 4)
        metrics["first_loss"] = round(losses[0], 4)
        metrics["steps"] = len(losses)
        out[name] = metrics
        print(json.dumps({name: metrics}), flush=True)

    delta = {
        "score_mae_change": round(out["qat"]["score_mae"] - out["ptq"]["score_mae"], 5),
        "recall10_vs_f32_change": round(
            out["qat"]["recall10_vs_f32"] - out["ptq"]["recall10_vs_f32"], 4),
        "recall10_truth_int8_change": round(
            out["qat"]["recall10_truth_int8"] - out["ptq"]["recall10_truth_int8"], 4),
        "final_loss_change": round(
            out["qat"]["final_loss_mean5"] - out["ptq"]["final_loss_mean5"], 4),
    }
    payload = {
        "metric": "QAT vs PTQ int8 serving quality (tiny CLIP, synthetic pairs)",
        "backend": jax.default_backend(),
        "config": {"pairs": args.pairs, "epochs": args.epochs,
                   "batch": args.batch, "lr": args.lr},
        "runs": out,
        "delta_qat_minus_ptq": delta,
    }
    print(json.dumps(payload))
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
