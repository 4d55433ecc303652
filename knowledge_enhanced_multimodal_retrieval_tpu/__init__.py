"""TPU-native knowledge-enhanced multimodal retrieval framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
``REEVALUATE/knowledge_enhanced_multimodal_retrieval`` (reference mounted at
``/root/reference``): CLIP (ViT-B/32, ViT-B/16, ViT-L/14, ViT-L/14@336px)
image/text encoding,
batch-sharded corpus embedding over a TPU mesh, fused on-device similarity +
top-k ranking, joint T2I+T2T contrastive fine-tuning, score-level and learned
fusion, a Text2SPARQL knowledge module, and a knowledge-enhanced
``RetrievalEngine`` serving API.

Subpackages
-----------
- ``utils``      — config, logging, data splits (reference L1, SURVEY §2.16-2.18)
- ``parallel``   — mesh/runtime bootstrap, sharding helpers (replaces NCCL DDP)
- ``ops``        — Pallas TPU kernels + XLA ops (attention, similarity/top-k, image)
- ``models``     — CLIP towers, fusion heads, checkpoint conversion
- ``data``       — BPE tokenizer, datasets, batching
- ``train``      — losses, pjit data-parallel trainer
- ``eval``       — metrics engine, evaluators, score-level fusion
- ``knowledge``  — Sparnatural JSON→SPARQL compiler, entity linking, clients
- ``retrieval``  — embedding store, CLIP retriever, RetrievalEngine
- ``baselines``  — zero-shot / text-model baselines
- ``datagen``    — offline corpus generation (captioning, text merging)
"""

__version__ = "0.1.0"
