#!/usr/bin/env bash
# Real-artifact parity runbook: one command from dropped CLIP artifacts to
# PARITY_RESULTS.json (tokenizer goldens -> converter cosine -> full R@K).
#
# Usage:
#   CLIP_BPE_PATH=/path/bpe_simple_vocab_16e6.txt.gz \
#   CLIP_PT_PATH=/path/ViT-L-14.pt \
#   [CLIP_HF_PATH=/path/hf_clip_dir] \
#   scripts/real_parity.sh <dataset-name-or-local-dir> [extra --flags]
#
# Smoke test (no artifacts needed): scripts/real_parity.sh --dry-run
set -euo pipefail
cd "$(dirname "$0")/.."

DATASET="${1:-}"
shift || true
ARGS=()
if [ "$DATASET" = "--dry-run" ]; then
  ARGS+=(--dry-run)
elif [ -n "$DATASET" ]; then
  ARGS+=("--data.dataset=$DATASET")
fi

exec python -m knowledge_enhanced_multimodal_retrieval_tpu.cli.parity \
  --out PARITY_RESULTS.json \
  --eval.compile_cache .jax_cache \
  "${ARGS[@]}" "$@"
