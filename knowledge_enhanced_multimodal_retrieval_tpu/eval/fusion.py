"""Score-level fusion of CLIP similarity with Text2SPARQL KG hits.

Re-design of the reference's three fusion strategies
(``src/clip/eval/fusion.py``): UUID/URI bookkeeping happens once on the host
(string work), producing a sparse hit structure; the numeric combine is a
vectorized device expression instead of the reference's per-query Python
loops (``fusion.py:66-82,119-132,183-205``).

Strategies (same formulas, same defaults):
- weighted  : ``alpha * S + w_sparql * I[hit]`` with weight renormalization
  when they don't sum to 1 (``fusion.py:22-85``);
- additive  : ``S + delta * I[hit]`` (``fusion.py:88-132``);
- adaptive  : ``S + delta * omega(|R(q)|) * I[hit]`` with result-set-size
  decay omega over thresholds {1: 1.0, 5: 0.8, 20: 0.5, 50: 0.3, inf: 0.1}
  (``fusion.py:135-206``);

URIs are mapped to UUIDs by last path segment (``fusion.py:76``).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .metrics import compute_mrr_and_mean_rank, compute_recall_at_k

DEFAULT_SIZE_THRESHOLDS: Tuple[Tuple[float, float], ...] = (
    (1, 1.0),
    (5, 0.8),
    (20, 0.5),
    (50, 0.3),
    (float("inf"), 0.1),
)


def uri_to_uuid(uri: str) -> str:
    """Last path segment of a URI, or the string itself (fusion.py:76)."""
    return uri.split("/")[-1] if "/" in uri else uri


def build_hit_matrix(
    text2sparql_results: Mapping[str, Sequence[str]],
    query_uuids: Sequence[str],
    artefact_uuids: Sequence[str],
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side: binary hit matrix [Q, N] + per-query SPARQL result-set size.

    The size counts *all* returned URIs, matching the reference's
    ``len(sparql_artefacts)`` (including URIs not in the corpus,
    ``fusion.py:185-186``).
    """
    artefact_to_idx = {u: i for i, u in enumerate(artefact_uuids)}
    hits = np.zeros((len(query_uuids), len(artefact_uuids)), np.float32)
    sizes = np.zeros((len(query_uuids),), np.int32)
    for qi, quuid in enumerate(query_uuids):
        uris = text2sparql_results.get(quuid, [])
        sizes[qi] = len(uris)
        for uri in uris:
            idx = artefact_to_idx.get(uri_to_uuid(uri))
            if idx is not None:
                hits[qi, idx] = 1.0
    return hits, sizes


def build_hit_indices(
    text2sparql_results: Mapping[str, Sequence[str]],
    query_uuids: Sequence[str],
    artefact_uuids: Sequence[str],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sparse hit representation: per-query corpus indices, padded.

    Returns ``(idx [Q, H] int32, mask [Q, H] f32, sizes [Q] int32)`` where H
    is the max hit count (>= 1). The dense [Q, N] hit matrix this replaces
    is 7.4 GB fp32 at 43k x 43k; the sparse form is O(Q * H). Indices are
    dedup'd so a scatter-add applies each bonus once (same semantics as
    ``build_hit_matrix``'s assignment).
    """
    artefact_to_idx = {u: i for i, u in enumerate(artefact_uuids)}
    per_q = []
    sizes = np.zeros((len(query_uuids),), np.int32)
    for qi, quuid in enumerate(query_uuids):
        uris = text2sparql_results.get(quuid, [])
        sizes[qi] = len(uris)
        hit = {artefact_to_idx[u] for u in map(uri_to_uuid, uris) if u in artefact_to_idx}
        per_q.append(sorted(hit))
    h = max((len(x) for x in per_q), default=0) or 1
    idx = np.zeros((len(per_q), h), np.int32)
    mask = np.zeros((len(per_q), h), np.float32)
    for qi, xs in enumerate(per_q):
        idx[qi, : len(xs)] = xs
        mask[qi, : len(xs)] = 1.0
    return idx, mask, sizes


@jax.jit
def _weighted_fusion_block_ranks(
    qb, tgt, img, hit_idx_b, hit_mask_b, start, w_t2i, w_t2t, alpha, sparql_weight
):
    """Diagonal ranks for one stripe of
    ``alpha * (w_t2i * Q@I^T + w_t2t * Q@T^T) + sparql_weight * I[hit]``.

    All scalars traced: one compiled kernel serves the whole sweep grid.
    """
    sim = w_t2i * jnp.dot(qb, img.T, preferred_element_type=jnp.float32)
    sim = sim + w_t2t * jnp.dot(qb, tgt.T, preferred_element_type=jnp.float32)
    sim = alpha * sim
    rows = jnp.arange(qb.shape[0])
    sim = sim.at[rows[:, None], hit_idx_b].add(sparql_weight * hit_mask_b)
    cols = jnp.clip(start + rows, 0, sim.shape[1] - 1)
    diag_vals = sim[rows, cols]
    return 1 + jnp.sum(sim > diag_vals[:, None], axis=1).astype(jnp.int32)


def weighted_fusion_ranks_blocked(
    query_emb,
    target_emb,
    image_emb,
    hit_idx: np.ndarray,
    hit_mask: np.ndarray,
    t2i_weight: float,
    t2t_weight: float,
    alpha: float,
    sparql_weight: float,
    block: int = 1024,
) -> jax.Array:
    """Diagonal ranks of the weighted CLIP x SPARQL fusion, blockwise.

    The fused [N, N] matrix is never materialized — each stripe blends,
    applies the sparse hit bonus via scatter-add, ranks, and is discarded.
    Scale-safe form of ``weighted_fusion`` + ``evaluate_retrieval`` for the
    43k-corpus sweep (reference ``evaluator.py:164-218``).
    """
    q = jnp.asarray(query_emb)
    t = jnp.asarray(target_emb)
    i = jnp.asarray(image_emb)
    hit_idx = jnp.asarray(hit_idx)
    hit_mask = jnp.asarray(hit_mask)
    n = q.shape[0]
    scalars = (
        jnp.float32(t2i_weight),
        jnp.float32(t2t_weight),
        jnp.float32(alpha),
        jnp.float32(sparql_weight),
    )
    out = []
    for start in range(0, n, block):
        stop = min(start + block, n)
        qb, hib, hmb = q[start:stop], hit_idx[start:stop], hit_mask[start:stop]
        pad = block - (stop - start)
        if pad:
            qb = jnp.pad(qb, ((0, pad), (0, 0)))
            hib = jnp.pad(hib, ((0, pad), (0, 0)))
            hmb = jnp.pad(hmb, ((0, pad), (0, 0)))
        ranks = _weighted_fusion_block_ranks(qb, t, i, hib, hmb, start, *scalars)
        out.append(ranks[: stop - start])
    return jnp.concatenate(out)


def _omega(sizes: jax.Array, thresholds: Tuple[Tuple[float, float], ...]) -> jax.Array:
    """Result-set-size decay: smallest threshold >= size wins; 0 for empty."""
    omega = jnp.zeros(sizes.shape, jnp.float32)
    for threshold, weight in sorted(thresholds, reverse=True):
        omega = jnp.where(sizes <= threshold, weight, omega)
    return jnp.where(sizes == 0, 0.0, omega)


def weighted_fusion(
    clip_similarity_matrix,
    text2sparql_results: Mapping[str, Sequence[str]],
    query_uuids: Sequence[str],
    artefact_uuids: Sequence[str],
    alpha: float = 0.7,
    sparql_weight: float = 0.3,
) -> jax.Array:
    """``alpha * S + w * I[hit]`` with renormalization (fusion.py:22-85)."""
    sim = jnp.asarray(clip_similarity_matrix)
    _check_shapes(sim, query_uuids, artefact_uuids)
    total = alpha + sparql_weight
    if not np.isclose(total, 1.0):
        alpha, sparql_weight = alpha / total, sparql_weight / total
    hits, _ = build_hit_matrix(text2sparql_results, query_uuids, artefact_uuids)
    return alpha * sim + sparql_weight * jnp.asarray(hits)


def additive_bonus_fusion(
    clip_similarity_matrix,
    text2sparql_results: Mapping[str, Sequence[str]],
    query_uuids: Sequence[str],
    artefact_uuids: Sequence[str],
    delta: float = 0.5,
) -> jax.Array:
    """``S + delta * I[hit]`` (fusion.py:88-132)."""
    sim = jnp.asarray(clip_similarity_matrix)
    _check_shapes(sim, query_uuids, artefact_uuids)
    hits, _ = build_hit_matrix(text2sparql_results, query_uuids, artefact_uuids)
    return sim + delta * jnp.asarray(hits)


def adaptive_additive_fusion(
    clip_similarity_matrix,
    text2sparql_results: Mapping[str, Sequence[str]],
    query_uuids: Sequence[str],
    artefact_uuids: Sequence[str],
    delta: float = 0.5,
    size_thresholds: Optional[Mapping[float, float]] = None,
) -> jax.Array:
    """``S + delta * omega(|R(q)|) * I[hit]`` (fusion.py:135-206)."""
    sim = jnp.asarray(clip_similarity_matrix)
    _check_shapes(sim, query_uuids, artefact_uuids)
    thresholds = (
        tuple(sorted(size_thresholds.items())) if size_thresholds is not None else DEFAULT_SIZE_THRESHOLDS
    )
    hits, sizes = build_hit_matrix(text2sparql_results, query_uuids, artefact_uuids)
    omega = _omega(jnp.asarray(sizes), thresholds)
    return sim + delta * omega[:, None] * jnp.asarray(hits)


def fuse_clip_and_text2sparql(
    clip_similarity_matrix,
    text2sparql_results: Mapping[str, Sequence[str]],
    query_uuids: Sequence[str],
    artefact_uuids: Sequence[str],
    fusion_strategy: str = "weighted",
    fusion_params: Optional[Dict] = None,
) -> jax.Array:
    """Strategy dispatcher (fusion.py:209-275)."""
    p = fusion_params or {}
    if fusion_strategy == "weighted":
        return weighted_fusion(
            clip_similarity_matrix, text2sparql_results, query_uuids, artefact_uuids,
            alpha=p.get("alpha", 0.7), sparql_weight=p.get("sparql_weight", 0.3),
        )
    if fusion_strategy == "additive":
        return additive_bonus_fusion(
            clip_similarity_matrix, text2sparql_results, query_uuids, artefact_uuids,
            delta=p.get("delta", 0.5),
        )
    if fusion_strategy == "adaptive":
        return adaptive_additive_fusion(
            clip_similarity_matrix, text2sparql_results, query_uuids, artefact_uuids,
            delta=p.get("delta", 0.5), size_thresholds=p.get("size_thresholds"),
        )
    raise ValueError(f"Unknown fusion strategy: {fusion_strategy}")


def evaluate_retrieval(similarity_matrix) -> Dict[str, float]:
    """Convenience metric printer over a fused matrix (fusion.py:6-20)."""
    metrics: Dict[str, float] = {}
    metrics.update(compute_recall_at_k(similarity_matrix))
    metrics.update(compute_mrr_and_mean_rank(similarity_matrix))
    return metrics


def _check_shapes(sim, query_uuids, artefact_uuids) -> None:
    if sim.shape[0] != len(query_uuids):
        raise ValueError(f"similarity rows ({sim.shape[0]}) != query_uuids ({len(query_uuids)})")
    if sim.shape[1] != len(artefact_uuids):
        raise ValueError(f"similarity cols ({sim.shape[1]}) != artefact_uuids ({len(artefact_uuids)})")
