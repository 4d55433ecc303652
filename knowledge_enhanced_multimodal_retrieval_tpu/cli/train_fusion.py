"""Stage-2 fusion-head training entry point.

The reference ships ``src/clip/train/train_fusion.py`` but it is a broken
near-duplicate of the fusion evaluator (bad import, no optimizer — SURVEY
§2.14); this CLI is the working stage it implies: encode a dataset with a
(frozen, optionally fine-tuned) CLIP model, train one of the six heads on the
frozen embeddings, evaluate it blockwise against the 0.5/0.5 linear baseline,
and save a self-describing ``.npz`` head artifact servable via
``cli.serve --fusion.head_params=<path>``.

    python -m knowledge_enhanced_multimodal_retrieval_tpu.cli.train_fusion \
        --out=experiments/head.npz --fusion.head=simple_gated \
        --model.name=ViT-L/14 [--model.checkpoint=...] \
        [--data.dataset=synthetic:128] [--train.epochs=10] [--train.lr=1e-3]
"""

from __future__ import annotations

import json
import os
import sys

from ..eval.evaluator import encode_dataset
from ..models.fusion_heads import FusionModel
from ..train.fusion_trainer import (
    evaluate_fusion_model,
    save_fusion_head,
    train_fusion_head,
)
from ..utils.config import config_from_argv, resolve_encoder
from ..utils.logging_utils import setup_logger
from .common import maybe_enable_compile_cache, build_model_and_params, build_pipeline, build_runtime, pop_flag


def main(argv=None) -> dict:
    args = list(sys.argv[1:] if argv is None else argv)
    out_path = pop_flag(args, "--out", "experiments/fusion_head.npz")
    cfg = config_from_argv(args)
    maybe_enable_compile_cache(cfg)
    logger = setup_logger("kemr_tpu.cli.train_fusion")

    model, params = build_model_and_params(cfg, rng_seed=cfg.eval.seed)
    rt = build_runtime(cfg)
    use_fast, quantize = resolve_encoder(cfg.eval.encoder)

    def encode(split):
        pipe = build_pipeline(cfg, split)
        return encode_dataset(
            model, params, pipe, rt,
            batch_size=cfg.eval.batch_size, use_fast=use_fast, quantize=quantize,
        )

    enc_train = encode(cfg.data.split_train)
    fm = FusionModel(cfg.fusion.head, embed_dim=enc_train.query.shape[1])
    logger.info(
        "training %s head on %d frozen-embedding rows",
        cfg.fusion.head, enc_train.query.shape[0],
    )
    fparams, history = train_fusion_head(
        fm, enc_train,
        epochs=cfg.train.epochs,
        batch_size=cfg.train.batch_size,
        lr=cfg.train.lr,
        temperature=cfg.train.temperature,
        seed=cfg.train.seed,
    )

    enc_test = encode(cfg.data.split_test)
    report = evaluate_fusion_model(
        fm, fparams, enc_test, k_values=cfg.eval.ks,
        baseline_weights=(cfg.eval.t2i_weight, cfg.eval.t2t_weight),
    )

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    save_fusion_head(out_path, fm, fparams)
    metrics_path = os.path.splitext(out_path)[0] + ".metrics.json"
    with open(metrics_path, "w") as f:
        json.dump({"history": history, "eval": report}, f, indent=2, default=float)
    logger.info("saved head -> %s, metrics -> %s", out_path, metrics_path)
    for key in ("fusion", "baseline"):
        mrr = report[key].get(f"{'FUSION' if key == 'fusion' else 'BASELINE'}_MRR")
        logger.info("%s MRR = %s", key, mrr)
    return report


if __name__ == "__main__":
    main()
