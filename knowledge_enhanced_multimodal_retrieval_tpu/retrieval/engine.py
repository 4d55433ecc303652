"""RetrievalEngine: the public knowledge-enhanced serving API.

API parity with the reference (``src/retrieval.py:11-107``):

- ``retrieve_text(query, alpha=0.8, beta=0.2, alpha_clip=0.5, threshold=0)``
  — CLIP results fused with Text2SPARQL UUID hits by
  ``score = alpha * clip + beta * 1[uuid in sparql]``, sorted descending,
  scores rounded to 4 decimals, threshold-filtered (``:23-95``);
- ``retrieve_text_noknowledge(...)`` — CLIP-only variant (``:97-107``).

Construction is dependency-injected (CLIP retriever + Text2SPARQL retriever)
instead of env-driven singletons, so the engine runs against fakes offline
and against live endpoints in production.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from ..utils.config import FusionConfig
from .clip_retrieval import CLIPRetrieval


class RetrievalEngine:
    def __init__(self, clip_retriever: CLIPRetrieval, t2s_retriever=None, fusion: FusionConfig = FusionConfig()):
        self.clip_retriever = clip_retriever
        self.t2s_retriever = t2s_retriever
        self.fusion = fusion

    # -- fusion (src/retrieval.py:23-76) --------------------------------------

    @staticmethod
    def _fuse_clip_sparql_linear(
        clip_results: List[Dict],
        sparql_results: Sequence[str],
        alpha: float = 0.8,
        beta: float = 0.2,
    ) -> List[Dict]:
        """Linear fusion without normalization: CLIP cosine scores are already
        bounded, so min-max rescaling would only boost irrelevant results."""
        if not clip_results:
            return []
        sparql_set = set(sparql_results)
        fused = [
            {
                "uuid": item["uuid"],
                "score": round(alpha * item["score"] + beta * (1.0 if item["uuid"] in sparql_set else 0.0), 4),
            }
            for item in clip_results
        ]
        fused.sort(key=lambda x: x["score"], reverse=True)
        return fused

    # -- public API ------------------------------------------------------------

    def retrieve_text(
        self,
        query: str,
        alpha: Optional[float] = None,
        beta: Optional[float] = None,
        alpha_clip: Optional[float] = None,
        threshold: Optional[float] = None,
    ) -> List[Dict]:
        """Knowledge-enhanced retrieval (src/retrieval.py:79-95)."""
        alpha = self.fusion.alpha if alpha is None else alpha
        beta = self.fusion.beta if beta is None else beta
        alpha_clip = self.fusion.alpha_clip if alpha_clip is None else alpha_clip
        threshold = self.fusion.threshold if threshold is None else threshold

        clip_results = self.clip_retriever.retrieval(query, alpha=alpha_clip)
        t2s_results = self.t2s_retriever.retrieval(query) if self.t2s_retriever is not None else []
        fused = self._fuse_clip_sparql_linear(clip_results, t2s_results, alpha=alpha, beta=beta)
        return [
            {"uuid": item["uuid"], "score": item["score"]}
            for item in fused
            if item.get("score", 0) >= threshold
        ]

    def retrieve_text_noknowledge(
        self,
        query: str,
        alpha: Optional[float] = None,
        beta: Optional[float] = None,
        alpha_clip: Optional[float] = None,
        threshold: Optional[float] = None,
    ) -> List[Dict]:
        """CLIP-only retrieval (src/retrieval.py:97-107)."""
        alpha_clip = self.fusion.alpha_clip if alpha_clip is None else alpha_clip
        threshold = self.fusion.threshold if threshold is None else threshold
        results = self.clip_retriever.retrieval(query, alpha=alpha_clip)
        return [
            {"uuid": item["uuid"], "score": item["score"]}
            for item in results
            if item.get("score", 0) >= threshold
        ]
