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
        self.fusion_head = None  # (FusionModel, params) via set_fusion_head
        self._fusion_factor = 4

    def set_fusion_head(self, fm, params, factor: int = 4) -> None:
        """Attach a trained fusion head (``models.fusion_heads.FusionModel``
        + params, e.g. from ``train.fusion_trainer.load_fusion_head``) so
        :meth:`retrieve_text_fused` can serve it. ``factor`` sets the stage-1
        candidate over-fetch (``factor * top_k`` rows rescored per query)."""
        self.fusion_head = (fm, params)
        self._fusion_factor = factor

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
        t2s_lists = self._t2s_batch(queries, max_workers)
        out: List[List[Dict]] = []
        for clip_results, t2s_results in zip(clip_lists, t2s_lists):
            fused = self._fuse_clip_sparql_linear(clip_results, t2s_results, alpha=alpha, beta=beta)
            out.append(self._apply_threshold(fused, threshold))
        return out

    def _t2s_batch(self, queries: Sequence[str], max_workers: int = 8) -> List[Sequence[str]]:
        """Text2SPARQL uuid hits for a batch (thread-pool network fan-out).

        Dedupes before the fan-out: the MicroBatcher pads batches by echoing
        the last query (bucketed jit shapes), and real traffic repeats
        popular queries — each distinct query costs an LLM + SPARQL round
        trip, so pay it once per batch. ``[[] ...]`` when no retriever.
        """
        if self.t2s_retriever is None:
            return [[] for _ in queries]
        import concurrent.futures as cf

        unique = list(dict.fromkeys(queries))
        with cf.ThreadPoolExecutor(max_workers=max_workers) as pool:
            per_unique = dict(zip(unique, pool.map(self.t2s_retriever.retrieval, unique)))
        return [per_unique[q] for q in queries]

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

    # -- filtered / knowledge-constrained retrieval (TPU-native extension;
    # the reference's only constraint mechanism is the post-hoc SPARQL score
    # bonus, src/retrieval.py:23-76 — it has no hard filters) -----------------

    def retrieve_text_filtered(
        self,
        query: str,
        allow_uuids=None,
        deny_uuids=None,
        alpha: Optional[float] = None,
        beta: Optional[float] = None,
        alpha_clip: Optional[float] = None,
        threshold: Optional[float] = None,
    ) -> List[Dict]:
        """Knowledge-enhanced retrieval restricted by uuid allow/deny lists
        (tenant visibility, metadata predicates). Only eligible documents can
        appear; the SPARQL bonus then reorders within them exactly like
        :meth:`retrieve_text`. Needs an exact corpus scan (not ``ann='ivf'``)."""
        return self.retrieve_text_filtered_batch(
            [query], allow_uuids, deny_uuids, alpha, beta, alpha_clip, threshold
        )[0]

    def retrieve_text_filtered_batch(
        self,
        queries: Sequence[str],
        allow_uuids=None,
        deny_uuids=None,
        alpha: Optional[float] = None,
        beta: Optional[float] = None,
        alpha_clip=None,
        threshold: Optional[float] = None,
        max_workers: int = 8,
    ) -> List[List[Dict]]:
        """Batched filtered retrieval: one masked device program for the
        whole batch (the filter rides as a runtime operand — no recompile);
        Text2SPARQL fans out over threads when configured."""
        alpha = self.fusion.alpha if alpha is None else alpha
        beta = self.fusion.beta if beta is None else beta
        alpha_clip = self.fusion.alpha_clip if alpha_clip is None else alpha_clip
        threshold = self.fusion.threshold if threshold is None else threshold
        clip_lists = self.clip_retriever.retrieval_filtered_batch(
            queries, allow_uuids, deny_uuids, alpha=alpha_clip
        )
        t2s_lists = self._t2s_batch(queries, max_workers)
        return [
            self._apply_threshold(
                self._fuse_clip_sparql_linear(c, t, alpha=alpha, beta=beta), threshold
            )
            for c, t in zip(clip_lists, t2s_lists)
        ]

    def retrieve_text_constrained(
        self,
        query: str,
        alpha: Optional[float] = None,
        beta: Optional[float] = None,
        alpha_clip: Optional[float] = None,
        threshold: Optional[float] = None,
        fallback: bool = True,
    ) -> List[Dict]:
        """Knowledge-CONSTRAINED retrieval: the hard-filter dual of
        :meth:`retrieve_text`'s soft bonus — only the Text2SPARQL uuid hits
        are scored (exact f32, host path, any corpus mode incl. IVF), so the
        knowledge graph defines the candidate set and CLIP ranks within it.
        When the KG returns nothing, ``fallback=True`` degrades to
        :meth:`retrieve_text` (availability over strictness); ``False``
        returns ``[]``. Scores fuse as ``alpha*clip + beta`` (every candidate
        is a SPARQL hit by construction), so magnitudes stay comparable with
        :meth:`retrieve_text` output."""
        return self.retrieve_text_constrained_batch(
            [query], alpha, beta, alpha_clip, threshold, fallback
        )[0]

    def retrieve_text_constrained_batch(
        self,
        queries: Sequence[str],
        alpha: Optional[float] = None,
        beta: Optional[float] = None,
        alpha_clip=None,
        threshold: Optional[float] = None,
        fallback: bool = True,
        max_workers: int = 8,
    ) -> List[List[Dict]]:
        if self.t2s_retriever is None:
            raise ValueError("constrained retrieval needs a Text2SPARQL retriever")
        alpha = self.fusion.alpha if alpha is None else alpha
        beta = self.fusion.beta if beta is None else beta
        alpha_clip = self.fusion.alpha_clip if alpha_clip is None else alpha_clip
        threshold = self.fusion.threshold if threshold is None else threshold
        t2s_lists = self._t2s_batch(queries, max_workers)
        clip_lists = self.clip_retriever.retrieval_candidates_batch(
            queries, t2s_lists, alpha=alpha_clip
        )
        out: List[List[Dict]] = []
        empties = [i for i, t in enumerate(t2s_lists) if not t]
        fb: Dict[int, List[Dict]] = {}
        if fallback and empties:
            fb_alpha = (
                [alpha_clip[i] for i in empties]
                if isinstance(alpha_clip, (list, tuple)) else alpha_clip
            )
            fb_lists = self.clip_retriever.retrieval_batch(
                [queries[i] for i in empties], alpha=fb_alpha
            )
            fb = dict(zip(empties, fb_lists))
        for i, (clip_results, t2s_results) in enumerate(zip(clip_lists, t2s_lists)):
            if not t2s_results:
                fused = self._fuse_clip_sparql_linear(fb.get(i, []), [], alpha=alpha, beta=beta)
            else:
                fused = self._fuse_clip_sparql_linear(
                    clip_results, t2s_results, alpha=alpha, beta=beta
                )
            out.append(self._apply_threshold(fused, threshold))
        return out

    # -- learned-fusion serving (TPU-native extension; the reference trains
    # six fusion heads but its serving path is only the fixed linear blend,
    # src/retrieval.py:79 — the trained heads are never reachable) ------------

    def retrieve_text_fused(
        self,
        query: str,
        alpha: Optional[float] = None,
        beta: Optional[float] = None,
        alpha_clip: Optional[float] = None,
        threshold: Optional[float] = None,
    ) -> List[Dict]:
        """Retrieval scored by the attached TRAINED fusion head: stage-1
        fetches blended top-(factor·k) candidates on device, stage-2 rescoring
        runs the head over their exact f32 store rows, then the Text2SPARQL
        membership bonus and threshold apply exactly as in
        :meth:`retrieve_text` (``alpha * head_score + beta * hit``)."""
        return self.retrieve_text_fused_batch(
            [query], alpha, beta, alpha_clip, threshold
        )[0]

    def retrieve_text_fused_batch(
        self,
        queries: Sequence[str],
        alpha: Optional[float] = None,
        beta: Optional[float] = None,
        alpha_clip: Optional[float] = None,
        threshold: Optional[float] = None,
        max_workers: int = 8,
    ) -> List[List[Dict]]:
        if self.fusion_head is None:
            raise ValueError("no fusion head attached — call set_fusion_head first")
        fm, fparams = self.fusion_head
        alpha = self.fusion.alpha if alpha is None else alpha
        beta = self.fusion.beta if beta is None else beta
        alpha_clip = self.fusion.alpha_clip if alpha_clip is None else alpha_clip
        threshold = self.fusion.threshold if threshold is None else threshold
        clip_lists = self.clip_retriever.retrieval_fused_batch(
            queries, fm, fparams, alpha=alpha_clip, factor=self._fusion_factor
        )
        t2s_lists = self._t2s_batch(queries, max_workers)
        return [
            self._apply_threshold(
                self._fuse_clip_sparql_linear(c, t, alpha=alpha, beta=beta), threshold
            )
            for c, t in zip(clip_lists, t2s_lists)
        ]

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
