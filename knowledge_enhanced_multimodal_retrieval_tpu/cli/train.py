"""Fine-tuning entry point.

TPU-native replacement for ``python -m src.clip.train.trainer`` +
``scripts/fine-tuning/train.sh`` (reference ``trainer.py:528-600``):

    python -m knowledge_enhanced_multimodal_retrieval_tpu.cli.train \
        --model.name=ViT-L/14 --train.epochs=20 --train.lr=5e-6 \
        [--config base.json] [--data.dataset=synthetic:256]
"""

from __future__ import annotations

import sys

from ..train.trainer import CLIPTrainer
from ..utils.config import config_from_argv
from ..utils.logging_utils import setup_logger
from .common import maybe_enable_compile_cache, build_model_and_params, build_pipeline, build_runtime


def main(argv=None) -> dict:
    cfg = config_from_argv(sys.argv[1:] if argv is None else argv)
    maybe_enable_compile_cache(cfg)
    logger = setup_logger("kemr_tpu.cli.train")
    logger.info("training %s on %s", cfg.model.name, cfg.data.dataset)

    model, params = build_model_and_params(cfg, rng_seed=cfg.train.seed)
    rt = build_runtime(cfg)
    train_pipe = build_pipeline(cfg, cfg.data.split_train)
    val_pipe = build_pipeline(cfg, cfg.data.split_val) if not cfg.data.dataset.startswith("synthetic:") else train_pipe

    trainer = CLIPTrainer(model, params, train_pipe, val_pipe, cfg.train, rt, out_dir=cfg.eval.output_dir)
    result = trainer.train()
    logger.info("done: best %.4f @ epoch %d", result["best_metric"], result["best_epoch"])
    if trainer.lora:
        # the shippable per-domain artifact: the tiny adapter tree (merge
        # with the base via train.lora.load_adapters + lora_merge, or
        # evaluate/export trainer.eval_params())
        import os

        from ..train import checkpoint as ckpt
        from ..train.lora import save_adapters

        # ship the BEST epoch's adapters (the metric the result reports),
        # not the final epoch's — early stopping runs patience epochs past
        # the best before the loop breaks
        adapters = trainer.state["params"]
        if ckpt.checkpoint_exists(cfg.train.checkpoint_dir, "best"):
            ckpt.wait_for_checkpoints()  # async save may still be in flight
            best_state, _ = ckpt.load_checkpoint(
                cfg.train.checkpoint_dir, "best", trainer.state
            )
            adapters = best_state["params"]
        path = os.path.join(cfg.eval.output_dir, "lora_adapters.npz")
        save_adapters(path, adapters, {
            "rank": cfg.train.lora_rank,
            "alpha": cfg.train.lora_alpha,
            "targets": cfg.train.lora_targets,
            "model": cfg.model.name,
        })
        logger.info("saved LoRA adapters to %s", path)
        result = dict(result, adapters_path=path)
    return result


if __name__ == "__main__":
    main()
