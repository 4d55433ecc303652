"""Text-only retrieval baselines (MPNet / E5 / GTE — SURVEY §2.15).

Re-design of ``baselines/evaluate_text_models.py``: the sentence encoder is
behind a protocol (sentence-transformers, the framework's own CLIP text
tower, or a test fake), and the per-rank Python loops
(``evaluate_text_models.py:193-224``) become one vectorized grouped-rank
computation on device.

Evaluation protocol (``evaluate_text_models.py:96-283``):
- every artifact has 5 text variants;
- *single* mode: variant 0 queries the pool of variants 1-4 of every
  artifact (N queries x 4N candidates);
- *multi* mode: each variant v queries the other 4 variants' pool, metrics
  averaged over all 5 query roles;
- grouped ground truth: a query "hits" at the rank of its artifact's
  best-scoring candidate.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Protocol, Sequence

import jax.numpy as jnp
import numpy as np

from ..eval.metrics import DEFAULT_KS

DESC_KEY_MAP = {
    "content": "content_descriptions",
    "metadata": "metadata_descriptions",
    "hybrid_o1": "hybrid_descriptions",
    "hybrid_o2": "hybrid_descriptions",
}


class TextEncoder(Protocol):
    def encode(self, texts: Sequence[str]) -> np.ndarray:
        """Return [N, D] L2-normalized embeddings."""
        ...


class SentenceTransformerEncoder:
    """sentence-transformers wrapper (``evaluate_text_models.py:145-152``)."""

    def __init__(self, model_name: str, device: str = "cpu", batch_size: int = 32):
        from sentence_transformers import SentenceTransformer

        self.model = SentenceTransformer(model_name, device=device)
        self.batch_size = batch_size

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        emb = self.model.encode(
            list(texts), batch_size=self.batch_size, show_progress_bar=False, normalize_embeddings=True
        )
        emb = np.asarray(emb, np.float32)
        return emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)


class HashTextEncoder:
    """Deterministic offline encoder for tests: same text -> same embedding."""

    def __init__(self, dim: int = 32):
        self.dim = dim

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        import hashlib

        out = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            digest = hashlib.md5(t.encode()).digest() * ((self.dim * 4) // 16 + 1)
            out[i] = np.frombuffer(digest[: self.dim * 4], np.uint8)[:: 4].astype(np.float32)
        out += 1e-3
        return out / np.linalg.norm(out, axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# Variant loading (TextOnlyDataset, evaluate_text_models.py:28-81)
# ---------------------------------------------------------------------------


def load_text_variants(
    uuids: Sequence[str],
    text_folder: str,
    description_type: str,
    num_variants: int = 5,
) -> List[List[str]]:
    """Per-uuid list of ``num_variants`` texts (missing/blank -> '')."""
    folder = Path(text_folder)
    key = DESC_KEY_MAP[description_type]
    out: List[List[str]] = []
    for uuid in uuids:
        texts = [""] * num_variants
        try:
            with open(folder / f"{uuid}.json", encoding="utf-8") as f:
                descriptions = json.load(f).get(key, [])
            for i in range(num_variants):
                if i < len(descriptions) and str(descriptions[i]).strip():
                    texts[i] = descriptions[i]
        except Exception:
            pass
        out.append(texts)
    return out


# ---------------------------------------------------------------------------
# Grouped-rank metrics (vectorized replacement for the per-rank loops)
# ---------------------------------------------------------------------------


def grouped_retrieval_metrics(
    similarity: np.ndarray,  # [N, M]
    col_to_group: np.ndarray,  # [M] int: candidate column -> artifact index
    k_values: Sequence[int] = DEFAULT_KS,
    prefix: str = "T2T",
) -> Dict[str, float]:
    """Rank of each query's best same-artifact candidate, fully vectorized.

    ``rank_i = 1 + #{j : s_ij > max_{j in group i} s_ij}`` — the position of
    the first matching artifact in the reference's argsort walk
    (``evaluate_text_models.py:193-224``) up to tie order.
    """
    sim = jnp.asarray(similarity)
    groups = jnp.asarray(col_to_group)
    n = sim.shape[0]
    row_ids = jnp.arange(n)[:, None]
    mask = groups[None, :] == row_ids  # [N, M]
    best = jnp.max(jnp.where(mask, sim, -jnp.inf), axis=1)  # [N]
    ranks = 1 + jnp.sum(sim > best[:, None], axis=1)
    metrics = {f"{prefix}_R@{k}": float(jnp.mean((ranks <= k).astype(jnp.float32)) * 100) for k in k_values}
    metrics[f"{prefix}_MRR"] = float(jnp.mean(1.0 / ranks.astype(jnp.float32)) * 100)
    metrics[f"{prefix}_Mean_Rank"] = float(jnp.mean(ranks.astype(jnp.float32)))
    return metrics


# ---------------------------------------------------------------------------
# Evaluation modes
# ---------------------------------------------------------------------------


def _pool(embeddings_by_variant: List[np.ndarray], exclude_variant: int) -> tuple:
    """Candidate pool of all variants except one: [(N*(V-1)), D] + group map.

    Column order is artifact-major (artifact 0's variants first), matching
    the reference's pool construction (``evaluate_text_models.py:179-186``).
    """
    v = len(embeddings_by_variant)
    n = embeddings_by_variant[0].shape[0]
    cols = []
    groups = []
    for artifact in range(n):
        for vi in range(v):
            if vi != exclude_variant:
                cols.append(embeddings_by_variant[vi][artifact])
                groups.append(artifact)
    return np.stack(cols), np.asarray(groups, np.int32)


def evaluate_text_model(
    encoder: TextEncoder,
    texts_per_artifact: Sequence[Sequence[str]],
    mode: str = "multi",
    k_values: Sequence[int] = DEFAULT_KS,
) -> Dict[str, float]:
    """Run the single/multi variant-retrieval protocol."""
    num_variants = len(texts_per_artifact[0])
    embeddings_by_variant = [
        encoder.encode([t[v] for t in texts_per_artifact]) for v in range(num_variants)
    ]

    if mode == "single":
        pool, groups = _pool(embeddings_by_variant, exclude_variant=0)
        sim = embeddings_by_variant[0] @ pool.T
        return grouped_retrieval_metrics(sim, groups, k_values)

    if mode != "multi":
        raise ValueError(f"unknown mode {mode!r}")

    # multi: average the *sample-level* statistics over all 5 query roles
    # (the reference pools per-sample recalls/ranks, :229-278)
    ranks_all = []
    for qv in range(num_variants):
        pool, groups = _pool(embeddings_by_variant, exclude_variant=qv)
        sim = jnp.asarray(embeddings_by_variant[qv] @ pool.T)
        g = jnp.asarray(groups)
        mask = g[None, :] == jnp.arange(sim.shape[0])[:, None]
        best = jnp.max(jnp.where(mask, sim, -jnp.inf), axis=1)
        ranks_all.append(np.asarray(1 + jnp.sum(sim > best[:, None], axis=1)))
    ranks = np.concatenate(ranks_all)
    metrics = {f"T2T_R@{k}": float(np.mean(ranks <= k) * 100) for k in k_values}
    metrics["T2T_MRR"] = float(np.mean(1.0 / ranks) * 100)
    metrics["T2T_Mean_Rank"] = float(np.mean(ranks))
    return metrics


# ---------------------------------------------------------------------------
# Query -> target LM baseline (reference evaluator_lm.py — SURVEY §2.13d)
# ---------------------------------------------------------------------------


def evaluate_lm_query_target(
    encoder: TextEncoder,
    queries: Sequence[str],
    targets: Sequence[str],
    k_values: Sequence[int] = DEFAULT_KS,
    prefix: str = "T2T",
    mrr_only: bool = False,
) -> Dict[str, float]:
    """T2T retrieval with a text-only model: encode queries and targets,
    diagonal ground truth (``evaluator_lm.py:41-132``; the MRR-only training
    variant is ``:136-165``)."""
    from ..eval.metrics import compute_retrieval_metrics

    if len(queries) != len(targets):
        raise ValueError("queries and targets must be aligned")
    q = encoder.encode(queries)
    t = encoder.encode(targets)
    return compute_retrieval_metrics(
        q, t, prefix=prefix, k_values=k_values, compute_recall=not mrr_only, compute_mrr=True
    )
