"""Precompute the serving corpus embedding store.

Produces the artifact the serving engine loads (the reference instead ships
precomputed embeddings in an HF repo consumed by downloaded code,
``src/clip/clip_retrieval.py:26-37``):

    python -m knowledge_enhanced_multimodal_retrieval_tpu.cli.precompute \
        --model.name=ViT-L/14 --model.checkpoint=... \
        --out=data/embeddings/store.npz
"""

from __future__ import annotations

import os
import sys

from ..retrieval.embedding_store import build_embedding_store
from ..utils.config import config_from_argv, resolve_encoder
from ..utils.logging_utils import setup_logger
from .common import maybe_enable_compile_cache, build_model_and_params, build_pipeline, build_runtime


def main(argv=None) -> str:
    args = list(sys.argv[1:] if argv is None else argv)
    out = "data/embeddings/store.npz"
    if "--out" in args:
        i = args.index("--out")
        out = args[i + 1]
        del args[i : i + 2]
    cfg = config_from_argv(args)
    maybe_enable_compile_cache(cfg)
    logger = setup_logger("kemr_tpu.cli.precompute")

    model, params = build_model_and_params(cfg)
    rt = build_runtime(cfg)
    pipe = build_pipeline(cfg, cfg.data.split_test)
    use_fast, quantize = resolve_encoder(cfg.eval.encoder)
    store = build_embedding_store(
        model, params, pipe, rt, batch_size=cfg.eval.batch_size,
        use_fast=use_fast, quantize=quantize,
    )
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    store.save(out)
    logger.info("saved %d x %d embedding store to %s", len(store), store.dim, out)
    return out


if __name__ == "__main__":
    main()
