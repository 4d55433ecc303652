"""Evaluation entry point.

Covers the reference's evaluator CLI family with one command
(``python -m src.clip.eval.evaluator`` / ``evaluator_baseline`` /
``evaluator_hf`` / ``scripts/baselines/run_clip_base_*.sh`` — SURVEY §2.13):
zero-shot when no checkpoint is given; any supported checkpoint format
(OpenAI .pt / HF CLIPModel / framework .npz) otherwise; optional
Text2SPARQL fusion sweep from a results JSON.

    python -m knowledge_enhanced_multimodal_retrieval_tpu.cli.evaluate \
        --model.name=ViT-B/32 [--model.checkpoint=...] \
        [--data.dataset=synthetic:128] [--eval.output_dir=experiments] \
        [--t2s_results=path.json]
"""

from __future__ import annotations

import json
import os
import sys

from ..eval.evaluator import run_full_evaluation
from ..utils.config import config_from_argv
from ..utils.logging_utils import setup_logger
from .common import maybe_enable_compile_cache, build_model_and_params, build_pipeline, build_runtime, pop_flag


def main(argv=None) -> dict:
    args = list(sys.argv[1:] if argv is None else argv)
    t2s_path = pop_flag(args, "--t2s_results")
    cfg = config_from_argv(args)
    maybe_enable_compile_cache(cfg)
    logger = setup_logger("kemr_tpu.cli.evaluate")

    model, params = build_model_and_params(cfg, rng_seed=cfg.eval.seed)
    rt = build_runtime(cfg)
    pipe = build_pipeline(cfg, cfg.data.split_test)
    t2s_results = json.load(open(t2s_path)) if t2s_path else None

    tag = "finetuned" if cfg.model.checkpoint else "zeroshot"
    out = os.path.join(cfg.eval.output_dir, f"eval_{cfg.model.name.replace('/', '-')}_{tag}.json")
    report = run_full_evaluation(
        model,
        params,
        pipe,
        rt,
        batch_size=cfg.eval.batch_size,
        k_values=cfg.eval.ks,
        t2i_weight=cfg.eval.t2i_weight,
        t2t_weight=cfg.eval.t2t_weight,
        text2sparql_results=t2s_results,
        output_json=out,
        encoder=cfg.eval.encoder,
    )
    logger.info("saved %s", out)
    for key, value in report["per_task"].items():
        logger.info("%s = %.4f", key, value)
    return report


if __name__ == "__main__":
    main()
