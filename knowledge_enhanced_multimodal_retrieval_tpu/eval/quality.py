"""Retrieval-quality sweep across corpus packings — "should I enable int4?"

The packed-corpus modes (int8 = 2x capacity, int4 = 4x, IVF = sublinear
probing, host rerank) trade precision or probe width for capacity/latency.
This module measures exactly what each trade costs ON YOUR EMBEDDINGS:
top-k agreement against the exact brute-force ranking, top-1 retention,
and score error — the numbers behind the CLIPRetrieval knobs
(``quantize_corpus``, ``ann``, ``rerank``). The reference has no analogue
(it ships one exact path, ``src/clip/clip_retrieval.py:26-37``).

Run ``python scripts/quality_sweep.py --store store.npz`` for the CLI.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..ops.similarity import (
    prefix_normalize_host,
    quantize_corpus_host,
    quantize_corpus_host_q4,
    rerank_scores_host,
    similarity_topk_xla,
    similarity_topk_xla_q4,
    similarity_topk_xla_q8,
)
from ..retrieval.ann import build_ivf_index, ivf_search


def _agreement(exact_idx: np.ndarray, got_idx: np.ndarray) -> Dict[str, float]:
    q, k = exact_idx.shape
    overlap = np.mean(
        [len(set(exact_idx[i]) & set(got_idx[i][got_idx[i] >= 0])) / k for i in range(q)]
    )
    top1 = np.mean(exact_idx[:, 0] == got_idx[:, 0])
    return {"recall_at_k": float(overlap), "top1_retained": float(top1)}


def quality_sweep(
    image: np.ndarray,
    text: np.ndarray,
    queries: np.ndarray,
    *,
    k: int = 10,
    alpha: float = 0.5,
    rerank_factor: int = 4,
    nprobes: Sequence[int] = (),
    nlist: Optional[int] = None,
    truncate_dims: Sequence[int] = (),
    rotate: bool = False,
    rotate_seed: int = 0,
    pq_aniso_t: float = 0.0,
) -> List[Dict]:
    """Measure each packing mode against exact brute force.

    ``image``/``text`` [N, D] L2-normalized corpus towers, ``queries``
    [Q, D] L2-normalized query embeddings. Returns one row per config:
    ``{"config", "recall_at_k", "top1_retained", "score_mae"}``
    (score_mae over the rows both rankings agree on; 0 for exact).
    ``nprobes`` adds IVF rows (``nlist`` defaults to sqrt(N)).
    ``rotate`` adds ``+rot`` rows: the packed scans rerun on rotated
    corpus/queries (``CLIPRetrieval(rotate=True)``) — on anisotropic
    embeddings the rotated rows recover most of the packing recall loss.
    ``pq_aniso_t`` adds ``pq+aniso`` rows (score-aware codebooks,
    ``CLIPRetrieval(pq_aniso_t=t)`` — typically halves score_mae at equal
    bitrate; training is the slow part, so the rows are opt-in).
    """
    image = np.asarray(image, np.float32)
    text = np.asarray(text, np.float32)
    queries = np.asarray(queries, np.float32)
    n = image.shape[0]
    k = min(k, n)
    qj = jnp.asarray(queries)

    ev, ei = similarity_topk_xla(qj, jnp.asarray(image), jnp.asarray(text), k, alpha)
    ev, ei = np.asarray(ev), np.asarray(ei)
    exact_score = {
        (qi, int(r)): float(v) for qi, (rr, vv) in enumerate(zip(ei, ev)) for r, v in zip(rr, vv)
    }

    def score_mae(idx, vals):
        diffs = [
            abs(exact_score[(qi, int(r))] - float(v))
            for qi, (rr, vv) in enumerate(zip(np.asarray(idx), np.asarray(vals)))
            for r, v in zip(rr, vv)
            if (qi, int(r)) in exact_score
        ]
        # None (JSON null), not NaN: the CLI promises a parseable JSON line
        return float(np.mean(diffs)) if diffs else None

    rows = [{"config": "exact", "recall_at_k": 1.0, "top1_retained": 1.0, "score_mae": 0.0}]

    kf = min(rerank_factor * k, n)
    from ..ops.binary_sketch import hamming_topk, pack_sign_bits_host

    # (suffix, corpus/query views): "" = as-is; "+rot" = the rotated space
    # CLIPRetrieval(rotate=True) scans (exact scores invariant, packing
    # roundings differ). Rerank always rescores with the ORIGINAL towers —
    # same as serving (the host store stays unrotated).
    spaces = [("", image, text, queries, qj)]
    if rotate:
        from ..ops.similarity import random_rotation

        rot = random_rotation(image.shape[1], rotate_seed)
        spaces.append(
            ("+rot", image @ rot, text @ rot, queries @ rot, jnp.asarray(queries @ rot))
        )

    for suffix, im, tx, qs, qjs in spaces:
        i8 = quantize_corpus_host(im), quantize_corpus_host(tx)
        i4 = quantize_corpus_host_q4(im), quantize_corpus_host_q4(tx)
        for name, fn, packs in (
            ("int8", similarity_topk_xla_q8, i8),
            ("int4", similarity_topk_xla_q4, i4),
        ):
            (ci, si), (ct, st) = packs
            v, i = fn(qjs, ci, si, ct, st, k, alpha)
            rows.append({
                "config": name + suffix,
                **_agreement(ei, np.asarray(i)), "score_mae": score_mae(i, v),
            })
            # + host rerank: fetch rerank_factor*k, exact-rescore, keep k
            # (the SAME implementation the serving path uses)
            _, i = fn(qjs, ci, si, ct, st, kf, alpha)
            rv, ri = rerank_scores_host(queries, image, text, i, alpha)
            rv, ri = rv[:, :k], ri[:, :k]
            rows.append({
                "config": f"{name}{suffix}+rerank{rerank_factor}x",
                **_agreement(ei, ri), "score_mae": score_mae(ri, rv),
            })

        # product quantization (~30x capacity at binary footprint): codebooks
        # train per space (rotated rows get rotated codebooks — OPQ-lite,
        # exactly what CLIPRetrieval(quantize_corpus="pq", rotate=True) does)
        from ..ops.pq import pack_pq_host, pq_similarity_topk, train_pq_codebooks

        m = max(1, im.shape[1] // 8)
        cb_i = train_pq_codebooks(im, m=m)
        cb_t = train_pq_codebooks(tx, m=m)
        (pi, psi), (pt, pst) = pack_pq_host(im, cb_i), pack_pq_host(tx, cb_t)
        cbi_j, cbt_j = jnp.asarray(cb_i), jnp.asarray(cb_t)
        v, i = pq_similarity_topk(qjs, pi, psi, pt, pst, cbi_j, cbt_j, k, alpha)
        rows.append({
            "config": "pq" + suffix,
            **_agreement(ei, np.asarray(i)), "score_mae": score_mae(i, v),
        })
        _, i = pq_similarity_topk(qjs, pi, psi, pt, pst, cbi_j, cbt_j, kf, alpha)
        rv, ri = rerank_scores_host(queries, image, text, i, alpha)
        rv, ri = rv[:, :k], ri[:, :k]
        rows.append({
            "config": f"pq{suffix}+rerank{rerank_factor}x",
            **_agreement(ei, ri), "score_mae": score_mae(ri, rv),
        })

        # score-aware PQ (opt-in, base space only): anisotropic codebooks +
        # coordinate-descent codes — same kernels/footprint as pq, the
        # score_mae column is where the win shows
        if pq_aniso_t and suffix == "":
            from ..ops.pq import train_pq_codebooks_anisotropic

            acb_i = train_pq_codebooks_anisotropic(im, m=m, t=pq_aniso_t)
            acb_t = train_pq_codebooks_anisotropic(tx, m=m, t=pq_aniso_t)
            (api, apsi) = pack_pq_host(im, acb_i, aniso_t=pq_aniso_t)
            (apt, apst) = pack_pq_host(tx, acb_t, aniso_t=pq_aniso_t)
            acbi_j, acbt_j = jnp.asarray(acb_i), jnp.asarray(acb_t)
            v, i = pq_similarity_topk(qjs, api, apsi, apt, apst, acbi_j, acbt_j, k, alpha)
            rows.append({
                "config": "pq+aniso",
                **_agreement(ei, np.asarray(i)), "score_mae": score_mae(i, v),
            })
            _, i = pq_similarity_topk(qjs, api, apsi, apt, apst, acbi_j, acbt_j, kf, alpha)
            rv, ri = rerank_scores_host(queries, image, text, i, alpha)
            rv, ri = rv[:, :k], ri[:, :k]
            rows.append({
                "config": f"pq+aniso+rerank{rerank_factor}x",
                **_agreement(ei, ri), "score_mae": score_mae(ri, rv),
            })

        # binary sketch (32x capacity): candidate quality with and without
        # the mandatory-in-serving rerank (raw rows show why it's enforced)
        bi, bt = pack_sign_bits_host(im), pack_sign_bits_host(tx)
        d = im.shape[1]
        v, i = hamming_topk(qjs, bi, bt, dim=d, k=k, alpha=alpha)
        rows.append({
            "config": "binary" + suffix,
            **_agreement(ei, np.asarray(i)), "score_mae": score_mae(i, v),
        })
        _, i = hamming_topk(qjs, bi, bt, dim=d, k=kf, alpha=alpha)
        rv, ri = rerank_scores_host(queries, image, text, i, alpha)
        rv, ri = rv[:, :k], ri[:, :k]
        rows.append({
            "config": f"binary{suffix}+rerank{rerank_factor}x",
            **_agreement(ei, ri), "score_mae": score_mae(ri, rv),
        })

    if rotate:
        # OPQ (pq-only): the LEARNED rotation (ops.pq.train_opq_rotation)
        # instead of the random one — what CLIPRetrieval(rotate="opq",
        # quantize_corpus="pq") serves. Rerank rescoring stays original-space.
        from ..ops.pq import (
            pack_pq_host, pq_similarity_topk, train_opq_rotation, train_pq_codebooks,
        )

        m = max(1, image.shape[1] // 8)
        r_opq = train_opq_rotation(
            np.concatenate([image, text], axis=0), m=m, seed=rotate_seed
        )
        im, tx = image @ r_opq, text @ r_opq
        qjs = jnp.asarray(queries @ r_opq)
        cb_i, cb_t = train_pq_codebooks(im, m=m), train_pq_codebooks(tx, m=m)
        (pi, psi), (pt, pst) = pack_pq_host(im, cb_i), pack_pq_host(tx, cb_t)
        cbi_j, cbt_j = jnp.asarray(cb_i), jnp.asarray(cb_t)
        v, i = pq_similarity_topk(qjs, pi, psi, pt, pst, cbi_j, cbt_j, k, alpha)
        rows.append({
            "config": "pq+opq",
            **_agreement(ei, np.asarray(i)), "score_mae": score_mae(i, v),
        })
        _, i = pq_similarity_topk(qjs, pi, psi, pt, pst, cbi_j, cbt_j, kf, alpha)
        rv, ri = rerank_scores_host(queries, image, text, i, alpha)
        rv, ri = rv[:, :k], ri[:, :k]
        rows.append({
            "config": f"pq+opq+rerank{rerank_factor}x",
            **_agreement(ei, ri), "score_mae": score_mae(ri, rv),
        })

    # Matryoshka prefixes (CLIPRetrieval(truncate_dim=d)): candidate quality
    # of the d-dim scan, raw and with the serving rerank. Meaningful recall
    # needs MRL-trained embeddings (train.matryoshka_dims); on vanilla
    # embeddings these rows show what truncation costs unmitigated.
    for d in truncate_dims:
        if not 0 < d <= image.shape[1]:
            raise ValueError(f"truncate dim {d} not in 1..{image.shape[1]}")
        ti = prefix_normalize_host(image, d)
        tt = prefix_normalize_host(text, d)
        tq = jnp.asarray(prefix_normalize_host(queries, d))
        v, i = similarity_topk_xla(tq, jnp.asarray(ti), jnp.asarray(tt), k, alpha)
        rows.append({"config": f"trunc{d}", **_agreement(ei, np.asarray(i)), "score_mae": score_mae(i, v)})
        _, i = similarity_topk_xla(tq, jnp.asarray(ti), jnp.asarray(tt), kf, alpha)
        rv, ri = rerank_scores_host(queries, image, text, i, alpha)
        rv, ri = rv[:, :k], ri[:, :k]
        rows.append({
            "config": f"trunc{d}+rerank{rerank_factor}x",
            **_agreement(ei, ri), "score_mae": score_mae(ri, rv),
        })

    if nprobes:
        index = build_ivf_index(image, text, nlist or max(1, int(np.sqrt(n))))
        for p in nprobes:
            p = min(p, index.nlist)
            v, i = ivf_search(qj, index, k=k, nprobe=p, alpha=alpha)
            rows.append({
                "config": f"ivf-nprobe{p}/{index.nlist}",
                **_agreement(ei, np.asarray(i)), "score_mae": score_mae(i, v),
            })
    return rows


def format_table(rows: List[Dict]) -> str:
    head = f"{'config':24} {'recall@k':>9} {'top1':>6} {'score_mae':>10}"
    lines = [head, "-" * len(head)]
    for r in rows:
        mae = "-" if r["score_mae"] is None else f"{r['score_mae']:.5f}"
        lines.append(
            f"{r['config']:24} {r['recall_at_k']:9.4f} {r['top1_retained']:6.3f} {mae:>10}"
        )
    return "\n".join(lines)
