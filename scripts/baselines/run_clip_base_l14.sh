#!/usr/bin/env bash
# Zero-shot ViT-L/14 baseline (reference scripts/baselines/run_clip_base_l14.sh).
set -euo pipefail
python -m knowledge_enhanced_multimodal_retrieval_tpu.cli.evaluate \
  --model.name=ViT-L/14 --model.checkpoint="${OPENAI_L14_CHECKPOINT:-}" \
  --data.dataset="${DATASET:-xuemduan/reevaluate-image-text-pairs}" "$@"
