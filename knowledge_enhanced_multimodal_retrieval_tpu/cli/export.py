"""Export trained weights back to the torch ecosystem.

The reference's artifacts are torch-shaped: OpenAI-layout ``.pt`` checkpoints
(``src/clip/model/clip_model.py:78-121``) and the published HF ``CLIPModel``
(``src/clip/eval/evaluator_hf.py:276-284``). This CLI closes the loop — a
model fine-tuned HERE exports to either format (or flat ``.npz``), so
reference-stack users can consume TPU-trained weights unchanged:

    # from an Orbax training checkpoint
    python -m knowledge_enhanced_multimodal_retrieval_tpu.cli.export \
        --model.name=ViT-L/14 --train-dir experiments/train/ckpt \
        --role best --format hf --out exported/clip-hf

    # re-layout any importable checkpoint (npz / OpenAI .pt / HF)
    python -m ...cli.export --model.name=ViT-B/32 \
        --model.checkpoint=weights.npz --format openai --out weights.pt
"""

from __future__ import annotations

import os
import sys

from ..models import clip as clip_mod
from ..models.convert import export_hf_checkpoint, load_clip_params, save_openai_pt, save_params_npz
from ..train.checkpoint import load_params_only
from ..utils.config import config_from_argv
from ..utils.logging_utils import setup_logger
from .common import maybe_enable_compile_cache, pop_flag

FORMATS = ("hf", "openai", "npz")


def main(argv=None) -> str:
    args = list(sys.argv[1:] if argv is None else argv)
    out = pop_flag(args, "--out")
    fmt = pop_flag(args, "--format", "hf")
    train_dir = pop_flag(args, "--train-dir")
    role = pop_flag(args, "--role", "best")
    if fmt not in FORMATS:
        raise ValueError(f"--format must be one of {FORMATS}, got {fmt!r}")
    if not out:
        raise ValueError("--out is required")
    cfg = config_from_argv(args)
    maybe_enable_compile_cache(cfg)
    logger = setup_logger("kemr_tpu.cli.export")

    if train_dir:
        params = load_params_only(train_dir, role)
    elif cfg.model.checkpoint:
        params = load_clip_params(cfg.model.checkpoint)
    else:
        raise ValueError("provide --train-dir or --model.checkpoint")
    if cfg.model.adapters:
        # merge LoRA adapters before re-layout: exports the ADAPTED model
        # in whichever torch-ecosystem format is requested
        from .common import merge_adapters

        params = merge_adapters(cfg.model.adapters, params)
        logger.info("merged LoRA adapters from %s", cfg.model.adapters)

    if fmt == "hf":
        # named variants pin the head counts; otherwise infer everything
        # (incl. heads = width // 64, the OpenAI convention) from the weights
        arch = clip_mod.ARCHS.get(cfg.model.name) or clip_mod.arch_from_params(params)
        export_hf_checkpoint(params, arch, out)
    elif fmt == "openai":
        os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
        save_openai_pt(params, out)
    else:
        os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
        save_params_npz(params, out)
    logger.info("exported %s-format checkpoint to %s", fmt, out)
    return out


if __name__ == "__main__":
    main()
