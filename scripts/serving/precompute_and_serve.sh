#!/usr/bin/env bash
# Build the corpus embedding store, then serve knowledge-enhanced queries.
set -euo pipefail
STORE="${STORE:-data/embeddings/store.npz}"
python -m knowledge_enhanced_multimodal_retrieval_tpu.cli.precompute \
  --model.name=ViT-L/14 --model.checkpoint="${CLIP_CHECKPOINT:-}" \
  --data.dataset="${DATASET:-xuemduan/reevaluate-image-text-pairs}" --out "$STORE"
exec python -m knowledge_enhanced_multimodal_retrieval_tpu.cli.serve --store "$STORE" "$@"
