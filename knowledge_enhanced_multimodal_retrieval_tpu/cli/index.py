"""Offline IVF index builder.

Clustering + packing are the expensive index-build steps at corpus scale;
this CLI runs them once — on whatever box has the store — and writes the
fingerprinted cache the serving daemon loads instantly
(``serve --eval.ann=ivf --eval.ann_index=ivf.npz``):

    python -m knowledge_enhanced_multimodal_retrieval_tpu.cli.index \
        --store store.npz --out ivf.npz \
        [--eval.ann_nlist=256] [--eval.quantize_corpus=int8]

The index binds to the store by content fingerprint: serving a different
(or updated) store with this cache triggers an automatic rebuild instead of
silently wrong results.
"""

from __future__ import annotations

import sys

import numpy as np

from ..retrieval.ann import build_ivf_index, corpus_fingerprint, save_ivf_index
from ..retrieval.embedding_store import EmbeddingStore
from ..utils.config import config_from_argv, resolve_quantize_corpus
from ..utils.logging_utils import setup_logger
from .common import maybe_enable_compile_cache, pop_flag


def main(argv=None) -> str:
    args = list(sys.argv[1:] if argv is None else argv)
    store_path = pop_flag(args, "--store")
    out = pop_flag(args, "--out")
    # --calibrate=<target recall>: after building, sweep nprobe on a sample
    # of the store's own text rows and report the smallest width that meets
    # the target (pass it to serving as --eval.ann_nprobe)
    calibrate = pop_flag(args, "--calibrate")
    calibrate_k = int(pop_flag(args, "--calibrate-k", "10"))
    calibrate_sample = int(pop_flag(args, "--calibrate-sample", "256"))
    if not store_path or not out:
        raise ValueError("--store and --out are required")
    cfg = config_from_argv(args)
    maybe_enable_compile_cache(cfg)
    logger = setup_logger("kemr_tpu.cli.index")

    store = EmbeddingStore.load(store_path, mmap=cfg.eval.mmap_store)
    nlist = cfg.eval.ann_nlist or max(1, int(np.sqrt(len(store))))
    quantize = resolve_quantize_corpus(cfg.eval.quantize_corpus)
    if quantize == "binary":
        raise ValueError("IVF composes with int8, int4, or pq corpus packing")
    logger.info("clustering %d rows into %d lists%s", len(store), nlist,
                f" ({quantize}-packed)" if quantize else "")
    index = build_ivf_index(
        store.image, store.text, nlist,
        quantize=quantize or None,
        pq_m=cfg.eval.pq_m or None,
    )
    fp = corpus_fingerprint(store.image, store.text)
    save_ivf_index(out, index, fingerprint=fp)
    logger.info(
        "saved index to %s (nlist=%d cap=%d spill=%.3f)",
        out, index.nlist, index.cap, index.spill_fraction,
    )
    if calibrate is not None:
        from ..retrieval.ann import calibrate_nprobe

        rng = np.random.default_rng(0)
        rows = rng.choice(len(store), size=min(calibrate_sample, len(store)), replace=False)
        result = calibrate_nprobe(
            index, np.asarray(store.text[rows], np.float32),
            store.image, store.text,
            k=calibrate_k, target_recall=float(calibrate),
        )
        for r in result["report"]:
            logger.info("  nprobe=%-4d recall@%d=%.4f", r["nprobe"], calibrate_k, r["recall"])
        logger.info(
            "recommended probe width: serve with --eval.ann_nprobe=%d "
            "(recall@%d %.4f >= target %s)",
            result["nprobe"], calibrate_k, result["achieved"], calibrate,
        )
    return out


if __name__ == "__main__":
    main()
