"""Mine hard negatives for contrastive fine-tuning.

Offline half of the hard-negative training loop (``train/negatives.py`` —
no reference counterpart; the reference only ever trains with in-batch
random negatives, ``src/clip/train/losses.py:11-63``):

    python -m knowledge_enhanced_multimodal_retrieval_tpu.cli.mine_negatives \
        --model.name=ViT-L/14 --model.checkpoint=... \
        --out=data/negatives.npz --k=16 --by=query

encodes the TRAINING split with the current model, finds each example's
top-k highest-scoring non-gold target texts (``--by=query`` anchors on the
query embedding — the T2T hard case; ``--by=image`` anchors on the image —
the T2I hard case), and saves the fingerprinted index table that
``--train.hard_negatives=<out>`` consumes.
"""

from __future__ import annotations

import os
import sys

from ..eval.evaluator import encode_dataset
from ..train.negatives import mine_hard_negatives, save_negatives
from ..utils.config import config_from_argv, resolve_encoder
from ..utils.logging_utils import setup_logger
from .common import (
    build_model_and_params,
    build_pipeline,
    build_runtime,
    maybe_enable_compile_cache,
)


def _pop(args, flag, default):
    if flag in args:
        i = args.index(flag)
        val = args[i + 1]
        del args[i : i + 2]
        return val
    return default


def main(argv=None) -> str:
    args = list(sys.argv[1:] if argv is None else argv)
    out = _pop(args, "--out", "data/negatives.npz")
    k = int(_pop(args, "--k", "16"))
    by = _pop(args, "--by", "query")
    if by not in ("query", "image"):
        raise SystemExit(f"--by must be 'query' or 'image', got {by!r}")
    cfg = config_from_argv(args)
    maybe_enable_compile_cache(cfg)
    logger = setup_logger("kemr_tpu.cli.mine_negatives")

    model, params = build_model_and_params(cfg)
    rt = build_runtime(cfg)
    pipe = build_pipeline(cfg, cfg.data.split_train)
    use_fast, quantize = resolve_encoder(cfg.eval.encoder)
    enc = encode_dataset(
        model, params, pipe, rt, batch_size=cfg.eval.batch_size,
        use_fast=use_fast, quantize=quantize,
    )
    anchors = enc.query if by == "query" else enc.image
    idx = mine_hard_negatives(anchors, enc.target, k)
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    save_negatives(out, idx, enc.uuids, meta={"by": by, "k": k})
    logger.info("mined [%d, %d] hard-negative table (by=%s) -> %s", *idx.shape, by, out)
    return out


if __name__ == "__main__":
    main()
