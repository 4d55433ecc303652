"""Retrieval metrics engine — Recall@K, MRR, Mean Rank — on device.

API and semantics mirror the reference's NumPy engine
(``src/clip/eval/metrics.py``): percent-scaled Recall@K and MRR, raw Mean
Rank, diagonal ground truth, ``T2I``/``I2T``/``T2T`` key prefixes
(``T2I_R@1``, ``T2I_MRR``, ``T2I_Mean_Rank``, ... — ``metrics.py:13-252``),
plus the weighted T2I+T2T "final" variant (``:119-162``), the fused-matrix
variant (``:165-185``), and the MRR-only fast path used for early stopping
(``:256-282``).

TPU-first redesign: the reference computes a full ``argsort`` per row on the
CPU (``metrics.py:30-34`` — its own fast path is commented out). Here the
rank of the diagonal element is computed directly as
``1 + #{j : s_ij > s_ii}`` — one vectorized comparison instead of an
O(N log N) sort — and everything stays on device as one jitted program.
Ties with the diagonal score (probability-zero for float similarities) are
resolved optimistically; the reference's unstable quicksort leaves tie order
unspecified, so parity holds within float tolerance.
"""

from __future__ import annotations

import functools
from typing import Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_KS = (1, 5, 10, 20)
DEFAULT_TASKS = ("T2I", "I2T", "T2T")


# ---------------------------------------------------------------------------
# Core rank computation (device)
# ---------------------------------------------------------------------------


def diagonal_ranks(similarity: jax.Array) -> jax.Array:
    """1-based rank of the diagonal entry within each row, [N] int32.

    ``rank_i = 1 + #{j : s_ij > s_ii}`` — sort-free, one pass.
    """
    diag = jnp.diagonal(similarity)[:, None]
    return 1 + jnp.sum(similarity > diag, axis=1).astype(jnp.int32)


def _rank_metrics(ranks: jax.Array, ks: Sequence[int], recall: bool, mrr: bool) -> Dict[str, jax.Array]:
    out: Dict[str, jax.Array] = {}
    if recall:
        for k in ks:
            out[f"R@{k}"] = jnp.mean((ranks <= k).astype(jnp.float32)) * 100.0
    if mrr:
        out["MRR"] = jnp.mean(1.0 / ranks.astype(jnp.float32)) * 100.0
        out["Mean_Rank"] = jnp.mean(ranks.astype(jnp.float32))
    return out


# ---------------------------------------------------------------------------
# Public API (reference-parity signatures)
# ---------------------------------------------------------------------------


def compute_recall_at_k(similarity, k_values: Sequence[int] = DEFAULT_KS) -> Dict[str, float]:
    """Recall@K percentages for an [N, M] similarity matrix (metrics.py:13-44)."""
    ranks = diagonal_ranks(jnp.asarray(similarity))
    return _to_float(_rank_metrics(ranks, k_values, recall=True, mrr=False))


def compute_mrr_and_mean_rank(similarity) -> Dict[str, float]:
    """MRR (%) and Mean Rank (metrics.py:47-76)."""
    ranks = diagonal_ranks(jnp.asarray(similarity))
    return _to_float(_rank_metrics(ranks, (), recall=False, mrr=True))


def metrics_from_ranks(
    ranks,
    k_values: Sequence[int] = DEFAULT_KS,
    compute_recall: bool = True,
    compute_mrr: bool = True,
) -> Dict[str, float]:
    """Full metric dict (R@K / MRR / Mean_Rank) from precomputed 1-based ranks."""
    return _to_float(_rank_metrics(jnp.asarray(ranks), tuple(k_values), compute_recall, compute_mrr))


# Above this many similarity-matrix elements, rank blockwise instead of
# materializing [N, M] at once (43k x 43k fp32 = 7.4 GB would not be a
# polite use of one chip's HBM).
_BLOCK_THRESHOLD = 64 * 1024 * 1024
_RANK_BLOCK = 1024


def compute_retrieval_metrics(
    query_embeddings,
    candidate_embeddings,
    prefix: str = "",
    k_values: Sequence[int] = DEFAULT_KS,
    compute_recall: bool = True,
    compute_mrr: bool = True,
) -> Dict[str, float]:
    """Metrics from normalized embeddings: sim = Q @ C^T (metrics.py:79-116).

    Large corpora are ranked in query blocks: each block computes its
    [B, M] similarity stripe, counts scores above the diagonal entry, and
    discards the stripe — peak memory O(B*M) instead of O(N*M).
    """
    q = jnp.asarray(query_embeddings)
    c = jnp.asarray(candidate_embeddings)
    if q.shape[0] * c.shape[0] > _BLOCK_THRESHOLD:
        ranks = diagonal_ranks_blocked(q, c)
        return _prefixed(_to_float(_rank_metrics(ranks, tuple(k_values), compute_recall, compute_mrr)), prefix)
    m = _jit_embedding_metrics(q, c, ks=tuple(k_values), recall=compute_recall, mrr=compute_mrr)
    return _prefixed(_to_float(m), prefix)


@functools.partial(jax.jit, static_argnames=("ks", "recall", "mrr"))
def _jit_embedding_metrics(q, c, ks: Tuple[int, ...], recall: bool, mrr: bool):
    sim = q @ c.T
    return _rank_metrics(diagonal_ranks(sim), ks, recall, mrr)


@jax.jit
def _block_ranks(q_block, c, start):
    sim = jnp.dot(q_block, c.T, preferred_element_type=jnp.float32)  # [B, M]
    # diagonal entries come from the stripe itself so the comparison uses the
    # exact same accumulation as the dense path (bitwise-identical ranks)
    rows = jnp.arange(q_block.shape[0])
    cols = jnp.clip(start + rows, 0, sim.shape[1] - 1)
    diag_vals = sim[rows, cols]
    return 1 + jnp.sum(sim > diag_vals[:, None], axis=1).astype(jnp.int32)


def diagonal_ranks_blocked(q: jax.Array, c: jax.Array, block: int = _RANK_BLOCK) -> jax.Array:
    """Diagonal ranks without materializing the full similarity matrix.

    Blocks stay on device; one concatenated fetch at the end (host round
    trips through the TPU relay are expensive)."""
    n = q.shape[0]
    out = []
    for start in range(0, n, block):
        stop = min(start + block, n)
        qb = q[start:stop]
        pad = block - (stop - start)
        if pad:
            qb = jnp.pad(qb, ((0, pad), (0, 0)))
        out.append(_block_ranks(qb, c, start)[: stop - start])
    return jnp.concatenate(out)


@jax.jit
def _blended_block_ranks(q_block, t, i, start, w_t2i, w_t2t):
    """Diagonal ranks for one query stripe of the blended matrix.

    Weights are traced scalars so one compiled kernel serves every sweep
    cell; ``start`` is traced so every stripe shares the compile too.
    """
    sim = w_t2i * jnp.dot(q_block, i.T, preferred_element_type=jnp.float32)
    sim = sim + w_t2t * jnp.dot(q_block, t.T, preferred_element_type=jnp.float32)
    rows = jnp.arange(q_block.shape[0])
    cols = jnp.clip(start + rows, 0, sim.shape[1] - 1)
    diag_vals = sim[rows, cols]
    return 1 + jnp.sum(sim > diag_vals[:, None], axis=1).astype(jnp.int32)


def blended_diagonal_ranks_blocked(
    q: jax.Array,
    t: jax.Array,
    i: jax.Array,
    t2i_weight: float,
    t2t_weight: float,
    block: Optional[int] = None,
) -> jax.Array:
    """Ranks of the diagonal of ``w_t2i * Q@I^T + w_t2t * Q@T^T``, blockwise:
    peak memory O(block * N) instead of O(N^2)."""
    block = block or _RANK_BLOCK
    n = q.shape[0]
    w_t2i = jnp.float32(t2i_weight)
    w_t2t = jnp.float32(t2t_weight)
    out = []
    for start in range(0, n, block):
        stop = min(start + block, n)
        qb = q[start:stop]
        pad = block - (stop - start)
        if pad:
            qb = jnp.pad(qb, ((0, pad), (0, 0)))
        ranks = _blended_block_ranks(qb, t, i, start, w_t2i, w_t2t)
        out.append(ranks[: stop - start])
    return jnp.concatenate(out)


def compute_retrieval_metrics_final(
    query_embeddings,
    target_embeddings,
    image_embeddings,
    prefix: str = "",
    k_values: Sequence[int] = DEFAULT_KS,
    compute_recall: bool = True,
    compute_mrr: bool = True,
    t2i_weight: float = 0.5,
    t2t_weight: float = 0.5,
) -> Dict[str, float]:
    """Weighted T2I+T2T blended-matrix metrics (metrics.py:119-162).

    Corpora past ``_BLOCK_THRESHOLD`` elements rank blockwise — the blended
    [N, N] matrix (7.4 GB fp32 at 43k) is never materialized.
    """
    q = jnp.asarray(query_embeddings)
    t = jnp.asarray(target_embeddings)
    i = jnp.asarray(image_embeddings)
    if q.shape[0] * i.shape[0] > _BLOCK_THRESHOLD:
        ranks = blended_diagonal_ranks_blocked(q, t, i, t2i_weight, t2t_weight)
        m = _rank_metrics(ranks, tuple(k_values), compute_recall, compute_mrr)
        return _prefixed(_to_float(m), prefix)
    m = _jit_final_metrics(
        q,
        t,
        i,
        ks=tuple(k_values),
        recall=compute_recall,
        mrr=compute_mrr,
        t2i_weight=float(t2i_weight),
        t2t_weight=float(t2t_weight),
    )
    return _prefixed(_to_float(m), prefix)


@functools.partial(jax.jit, static_argnames=("ks", "recall", "mrr", "t2i_weight", "t2t_weight"))
def _jit_final_metrics(q, t, i, ks, recall, mrr, t2i_weight, t2t_weight):
    sim = t2i_weight * (q @ i.T) + t2t_weight * (q @ t.T)
    return _rank_metrics(diagonal_ranks(sim), ks, recall, mrr)


def compute_retrieval_metrics_fusion(
    similarity_matrix,
    prefix: str = "",
    k_values: Sequence[int] = DEFAULT_KS,
    compute_recall: bool = True,
    compute_mrr: bool = True,
) -> Dict[str, float]:
    """Metrics from a precomputed (fused) similarity matrix (metrics.py:165-185)."""
    ranks = diagonal_ranks(jnp.asarray(similarity_matrix))
    return _prefixed(_to_float(_rank_metrics(ranks, k_values, compute_recall, compute_mrr)), prefix)


def compute_all_retrieval_metrics(
    query_embeddings,
    target_embeddings,
    image_embeddings,
    k_values: Sequence[int] = DEFAULT_KS,
    tasks: Sequence[str] = DEFAULT_TASKS,
    compute_recall: bool = True,
    compute_mrr: bool = True,
) -> Dict[str, float]:
    """Three-task dispatcher (metrics.py:188-252):

    - T2I: query -> image
    - I2T: image -> target
    - T2T: query -> target
    """
    metrics: Dict[str, float] = {}
    pairs = {
        "T2I": (query_embeddings, image_embeddings),
        "I2T": (image_embeddings, target_embeddings),
        "T2T": (query_embeddings, target_embeddings),
    }
    for task in tasks:
        q, c = pairs[task]
        metrics.update(
            compute_retrieval_metrics(q, c, prefix=task, k_values=k_values, compute_recall=compute_recall, compute_mrr=compute_mrr)
        )
    return metrics


def compute_training_metrics(
    query_embeddings,
    target_embeddings,
    image_embeddings,
    tasks: Sequence[str] = DEFAULT_TASKS,
) -> Dict[str, float]:
    """MRR-only fast path for in-training validation (metrics.py:256-282)."""
    return compute_all_retrieval_metrics(
        query_embeddings, target_embeddings, image_embeddings, tasks=tasks, compute_recall=False, compute_mrr=True
    )


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _prefixed(metrics: Dict[str, float], prefix: str) -> Dict[str, float]:
    if not prefix:
        return metrics
    return {f"{prefix}_{k}": v for k, v in metrics.items()}


def _to_float(metrics: Mapping[str, jax.Array]) -> Dict[str, float]:
    return {k: float(v) for k, v in metrics.items()}


def average_mrr(metrics: Mapping[str, float], tasks: Sequence[str] = DEFAULT_TASKS) -> float:
    """Average MRR across tasks — the reference's early-stop signal
    (``trainer.py:332-351``)."""
    vals = [metrics[f"{t}_MRR"] for t in tasks if f"{t}_MRR" in metrics]
    return float(np.mean(vals)) if vals else 0.0
