#!/usr/bin/env bash
# Zero-shot ViT-B/32 baseline (reference scripts/baselines/run_clip_base_b32.sh:12-23).
set -euo pipefail
python -m knowledge_enhanced_multimodal_retrieval_tpu.cli.evaluate \
  --model.name=ViT-B/32 --model.checkpoint="${OPENAI_B32_CHECKPOINT:-}" \
  --data.dataset="${DATASET:-xuemduan/reevaluate-image-text-pairs}" "$@"
