"""Distillation entry point: big fine-tuned teacher -> small serving student.

Beyond-reference extension (see ``train/distill.py``). Two stages in one
command:

1. **Teacher encode** (skipped when ``--teacher-embeddings`` points at an
   existing artifact): the teacher model encodes the train split once —
   optionally through the int8 serving towers (``--teacher-encoder=int8``)
   — and the embeddings are saved row-aligned with uuids.
2. **Student training**: ``CLIPTrainer`` with ``distill_teacher`` set, so
   the step minimizes the similarity-matrix KL to the teacher (plus the
   optional direct cosine term when dims match). Early stopping monitors
   the STUDENT's validation MRR — quality, not loss.

    python -m knowledge_enhanced_multimodal_retrieval_tpu.cli.distill \
        --model.name=ViT-B/32 \
        --teacher-name=ViT-L/14 --teacher-checkpoint=ckpt_best.npz \
        [--teacher-encoder=int8] [--teacher-embeddings=teacher_train.npz] \
        [--train.distill_embed_weight=0]   # required across embed dims
"""

from __future__ import annotations

import dataclasses
import os
import sys

from ..eval.evaluator import encode_dataset
from ..train.distill import load_encoded_dataset, save_encoded_dataset
from ..train.trainer import CLIPTrainer
from ..utils.config import config_from_argv, resolve_encoder
from ..utils.logging_utils import setup_logger
from .common import maybe_enable_compile_cache, build_model_and_params, build_pipeline, build_runtime, pop_flag


def main(argv=None) -> dict:
    args = list(sys.argv[1:] if argv is None else argv)
    teacher_name = pop_flag(args, "--teacher-name")
    teacher_ckpt = pop_flag(args, "--teacher-checkpoint", "")
    teacher_encoder = pop_flag(args, "--teacher-encoder", "flax")
    teacher_path = pop_flag(args, "--teacher-embeddings", "")
    cfg = config_from_argv(args)
    maybe_enable_compile_cache(cfg)
    logger = setup_logger("kemr_tpu.cli.distill")

    rt = build_runtime(cfg)
    out_dir = cfg.eval.output_dir
    os.makedirs(out_dir, exist_ok=True)

    if not (teacher_path and os.path.exists(teacher_path)):
        if not teacher_name:
            raise ValueError(
                "need --teacher-name (+ --teacher-checkpoint) to encode the "
                "teacher, or --teacher-embeddings pointing at an existing artifact"
            )
        teacher_cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model, name=teacher_name, checkpoint=teacher_ckpt, adapters=""
            ),
        )
        teacher_model, teacher_params = build_model_and_params(
            teacher_cfg, rng_seed=cfg.train.seed
        )
        use_fast, quantize = resolve_encoder(teacher_encoder)
        pipe = build_pipeline(cfg, cfg.data.split_train)
        logger.info(
            "encoding teacher %s over %s (%s towers)",
            teacher_name, cfg.data.split_train, teacher_encoder,
        )
        enc = encode_dataset(
            teacher_model, teacher_params, pipe, rt,
            batch_size=cfg.eval.batch_size, use_fast=use_fast, quantize=quantize,
        )
        teacher_path = teacher_path or os.path.join(out_dir, "teacher_train.npz")
        save_encoded_dataset(teacher_path, enc)
        logger.info("saved %d teacher rows -> %s", len(enc.uuids), teacher_path)
        del teacher_model, teacher_params  # the student loop never needs them
    else:
        enc = load_encoded_dataset(teacher_path)
        logger.info("loaded %d teacher rows from %s", len(enc.uuids), teacher_path)

    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, distill_teacher=teacher_path)
    )
    model, params = build_model_and_params(cfg, rng_seed=cfg.train.seed)
    train_pipe = build_pipeline(cfg, cfg.data.split_train)
    val_pipe = (
        build_pipeline(cfg, cfg.data.split_val)
        if not cfg.data.dataset.startswith("synthetic:")
        else train_pipe
    )
    trainer = CLIPTrainer(model, params, train_pipe, val_pipe, cfg.train, rt, out_dir=out_dir)
    result = trainer.train()
    logger.info(
        "distilled %s: best val %.4f @ epoch %d",
        cfg.model.name, result["best_metric"], result["best_epoch"],
    )
    return dict(result, teacher_embeddings=teacher_path)


if __name__ == "__main__":
    main()
