#!/usr/bin/env python
"""Serving-config autotuner CLI: the cheapest packing meeting a recall target.

    python scripts/autotune.py --store data/embeddings/store.npz \
        [--recall-target 0.98] [--k 10] [--alpha 0.5] [--no-rerank]
    python scripts/autotune.py --synthetic 4096,512 --recall-target 0.95

Measures the packing ladder (int8/int4/binary x rotation x host rerank) on
YOUR embeddings via the quality sweep, picks the highest-capacity rung that
meets the target, and prints the serve-CLI flags that enable it plus one
JSON line for scripting.
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def _force_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--store", help="EmbeddingStore .npz (image/text towers + uuids)")
    p.add_argument("--synthetic", help="N,D synthetic corpus instead of a store")
    p.add_argument("--recall-target", type=float, default=0.98)
    p.add_argument("--queries", type=int, default=256)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--rerank-factor", type=int, default=4)
    p.add_argument("--no-rerank", action="store_true", help="exclude host-rerank configs")
    p.add_argument("--no-rotate", action="store_true", help="exclude rotated configs")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true", help="run on host CPU")
    args = p.parse_args(argv)
    if args.cpu:
        _force_cpu()

    from knowledge_enhanced_multimodal_retrieval_tpu.eval.autotune import (  # noqa: E402
        recommend_config,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.eval.quality import (  # noqa: E402
        format_table,
    )

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

    rec = recommend_config(
        image, text,
        recall_target=args.recall_target, k=args.k, alpha=args.alpha,
        rerank_factor=args.rerank_factor, rerank_ok=not args.no_rerank,
        rotate=not args.no_rotate, rotate_seed=args.seed,
        n_queries=args.queries, seed=args.seed,
    )
    print(format_table(rec["rows"]))
    print()
    print(f"recommendation: {rec['config']}  "
          f"(recall@{rec['k']} {rec['predicted_recall_at_k']:.4f} >= {rec['recall_target']}, "
          f"{rec['capacity_multiplier']:.0f}x corpus capacity/chip)")
    print(f"serve flags: {rec['serve_flags'] or '(defaults — exact corpus)'}")
    print(json.dumps({k: v for k, v in rec.items() if k != "rows"}))


if __name__ == "__main__":
    main()
