#!/usr/bin/env bash
# Evaluate the best fine-tuned checkpoint on the test split
# (reference scripts/fine-tuning/eval.sh:26-38).
set -euo pipefail
python -m knowledge_enhanced_multimodal_retrieval_tpu.cli.evaluate \
  --model.name=ViT-L/14 \
  --model.checkpoint="${CLIP_CHECKPOINT:?set CLIP_CHECKPOINT to the converted best checkpoint}" \
  --data.dataset="${DATASET:-xuemduan/reevaluate-image-text-pairs}" "$@"
