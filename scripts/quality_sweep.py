#!/usr/bin/env python
"""Quality sweep CLI: what do the corpus packing modes cost on YOUR data?

    python scripts/quality_sweep.py --store data/embeddings/store.npz \
        [--queries 256] [--k 10] [--alpha 0.5] [--nprobes 4,8,16]
    python scripts/quality_sweep.py --synthetic 4096,512   # no store needed

Prints a table of recall@k / top-1-retention / score-MAE versus exact brute
force for int8, int4, their host-rerank variants, and (optionally) IVF probe
widths, plus one JSON line for scripting. Queries are a random sample of the
store's text-tower rows (the serving query is a text embedding).
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def _force_cpu():
    """Run the sweep on host CPU (the measurements are exact-math quality
    numbers, not perf): useful when the TPU is busy or absent. Must run
    before the first jax device touch; works under a latched platform."""
    import jax

    jax.config.update("jax_platforms", "cpu")

from knowledge_enhanced_multimodal_retrieval_tpu.eval.quality import (  # noqa: E402
    format_table,
    quality_sweep,
)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--store", help="EmbeddingStore .npz (image/text towers + uuids)")
    p.add_argument("--synthetic", help="N,D synthetic corpus instead of a store")
    p.add_argument("--queries", type=int, default=256)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--rerank-factor", type=int, default=4)
    p.add_argument("--nprobes", default="", help="comma-separated IVF probe widths")
    p.add_argument(
        "--truncate-dims", default="",
        help="comma-separated Matryoshka prefix widths (eval.truncate_dim)",
    )
    p.add_argument(
        "--rotate", action="store_true",
        help="add +rot rows (CLIPRetrieval(rotate=True) packing space)",
    )
    p.add_argument(
        "--pq-aniso-t", type=float, default=0.0,
        help="add pq+aniso rows (score-aware codebooks at this threshold, "
        "CLIPRetrieval(pq_aniso_t=t); 0.2 is the standard point)",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true", help="run on host CPU")
    args = p.parse_args(argv)
    if args.cpu:
        _force_cpu()

    rng = np.random.default_rng(args.seed)
    if args.synthetic:
        n, d = (int(x) for x in args.synthetic.split(","))
        norm = lambda x: x / np.linalg.norm(x, axis=1, keepdims=True)  # noqa: E731
        image = norm(rng.standard_normal((n, d))).astype(np.float32)
        text = norm(rng.standard_normal((n, d))).astype(np.float32)
    elif args.store:
        from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.embedding_store import (
            EmbeddingStore,
        )

        store = EmbeddingStore.load(args.store)
        image, text = np.asarray(store.image), np.asarray(store.text)
    else:
        p.error("need --store or --synthetic")

    q = text[rng.choice(len(text), min(args.queries, len(text)), replace=False)]
    nprobes = tuple(int(x) for x in args.nprobes.split(",") if x.strip())
    tdims = tuple(int(x) for x in args.truncate_dims.split(",") if x.strip())
    rows = quality_sweep(
        image, text, q, k=args.k, alpha=args.alpha,
        rerank_factor=args.rerank_factor, nprobes=nprobes,
        truncate_dims=tdims, rotate=args.rotate, rotate_seed=args.seed,
        pq_aniso_t=args.pq_aniso_t,
    )
    print(format_table(rows))
    print(json.dumps({"k": args.k, "alpha": args.alpha, "rows": rows}))


if __name__ == "__main__":
    main()
