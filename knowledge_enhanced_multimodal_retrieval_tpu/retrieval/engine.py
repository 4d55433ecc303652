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
        return self._apply_threshold(fused, threshold)

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
        return self._apply_threshold(results, threshold)

    # -- batch API (TPU-native extension; the reference is single-query,
    # src/retrieval.py:79, leaving the chip idle between queries) -------------

    def retrieve_text_batch(
        self,
        queries: Sequence[str],
        alpha: Optional[float] = None,
        beta: Optional[float] = None,
        alpha_clip: Optional[float] = None,
        threshold: Optional[float] = None,
        max_workers: int = 8,
    ) -> List[List[Dict]]:
        """Knowledge-enhanced retrieval for a batch of queries.

        CLIP scoring runs as ONE device program for the whole batch;
        Text2SPARQL calls (network-bound LLM + KG round trips) fan out over
        a thread pool. Per-query semantics are identical to
        :meth:`retrieve_text`. ``alpha_clip`` may be a scalar or a
        per-query sequence — the blend is a runtime operand of the one
        compiled program, so mixed blends batch together.
        """
        alpha = self.fusion.alpha if alpha is None else alpha
        beta = self.fusion.beta if beta is None else beta
        alpha_clip = self.fusion.alpha_clip if alpha_clip is None else alpha_clip
        threshold = self.fusion.threshold if threshold is None else threshold

        clip_lists = self.clip_retriever.retrieval_batch(queries, alpha=alpha_clip)
        if self.t2s_retriever is None:
            t2s_lists: List[Sequence[str]] = [[] for _ in queries]
        else:
            import concurrent.futures as cf

            # Dedupe before the network fan-out: the MicroBatcher pads
            # batches by echoing the last query (bucketed jit shapes), and
            # real traffic repeats popular queries — each distinct query
            # costs an LLM + SPARQL round trip, so pay it once per batch.
            unique = list(dict.fromkeys(queries))
            with cf.ThreadPoolExecutor(max_workers=max_workers) as pool:
                per_unique = dict(zip(unique, pool.map(self.t2s_retriever.retrieval, unique)))
            t2s_lists = [per_unique[q] for q in queries]
        out: List[List[Dict]] = []
        for clip_results, t2s_results in zip(clip_lists, t2s_lists):
            fused = self._fuse_clip_sparql_linear(clip_results, t2s_results, alpha=alpha, beta=beta)
            out.append(self._apply_threshold(fused, threshold))
        return out

    def retrieve_text_noknowledge_batch(
        self,
        queries: Sequence[str],
        alpha: Optional[float] = None,
        beta: Optional[float] = None,
        alpha_clip=None,
        threshold: Optional[float] = None,
    ) -> List[List[Dict]]:
        """CLIP-only batch retrieval — the measured q/s/chip path.

        ``alpha_clip``: scalar or per-query sequence (mixed blends ride one
        device program)."""
        alpha_clip = self.fusion.alpha_clip if alpha_clip is None else alpha_clip
        threshold = self.fusion.threshold if threshold is None else threshold
        clip_lists = self.clip_retriever.retrieval_batch(queries, alpha=alpha_clip)
        return [self._apply_threshold(results, threshold) for results in clip_lists]

    # -- visual search (TPU-native extension; the reference has no image-
    # query path — its corpus towers only ever meet text queries) -------------

    def retrieve_image(
        self,
        image,
        alpha_clip: Optional[float] = None,
        threshold: Optional[float] = None,
    ) -> List[Dict]:
        """Image-query retrieval over the same corpus (CLIP-only: Text2SPARQL
        has no image modality, so there is no knowledge fusion to apply).

        ``image`` as accepted by :meth:`CLIPRetrieval.preprocess_images`
        (PIL / bytes / path / array). ``alpha_clip`` blends the image
        embedding against the corpus image vs text towers (1.0 = pure
        image-to-image similarity).
        """
        return self.retrieve_image_batch([image], alpha_clip, threshold)[0]

    def retrieve_image_batch(
        self,
        images: Sequence,
        alpha_clip: Optional[float] = None,
        threshold: Optional[float] = None,
    ) -> List[List[Dict]]:
        """Batched visual search — one device program for the whole batch."""
        alpha_clip = self.fusion.alpha_clip if alpha_clip is None else alpha_clip
        threshold = self.fusion.threshold if threshold is None else threshold
        lists = self.clip_retriever.retrieval_image_batch(images, alpha=alpha_clip)
        return [self._apply_threshold(results, threshold) for results in lists]

    def retrieve_text_noknowledge_batches(
        self,
        query_batches,
        alpha_clip: Optional[float] = None,
        threshold: Optional[float] = None,
    ):
        """Streaming CLIP-only retrieval over an iterable of query batches.

        Keeps one device program in flight (double buffering): batch i+1's
        tokenize+dispatch overlaps batch i's result fetch + host dict
        building — the steady-state serving mode.
        Yields one ``List[List[Dict]]`` per input batch, in order.
        """
        alpha_clip = self.fusion.alpha_clip if alpha_clip is None else alpha_clip
        threshold = self.fusion.threshold if threshold is None else threshold
        # retrieval_batches maps each batch through the corpus snapshot its
        # search ran on (uuid-correct under live updates) and truncates the
        # over-fetched pad slack back to top_k
        for results in self.clip_retriever.retrieval_batches(query_batches, alpha=alpha_clip):
            yield [self._apply_threshold(r, threshold) for r in results]

    @staticmethod
    def _apply_threshold(results: List[Dict], threshold: float) -> List[Dict]:
        return [
            {"uuid": item["uuid"], "score": item["score"]}
            for item in results
            if item.get("score", 0) >= threshold
        ]
