"""CLIP retriever: query text -> ranked corpus matches.

Serving-path equivalent of the reference's hub-downloaded retriever
(``src/clip/clip_retrieval.py:10-40``: encode query, cosine against
precomputed corpus embeddings, alpha-blend T2I/T2T, return
``[{"uuid", "score"}]``) — but fully in-repo and TPU-resident: the corpus
lives on device, query encode + fused blend + top-k run as one jitted
program (``ops.similarity``), and a mesh-sharded path covers corpora larger
than one chip.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.tokenizer import CLIPTokenizer, trim_to_bucket
from ..models.clip import CLIP, l2_normalize
from ..ops.similarity import fused_similarity_topk, sharded_similarity_topk, similarity_topk_xla
from ..parallel.mesh import MeshRuntime
from .embedding_store import EmbeddingStore


class CLIPRetrieval:
    """Query-text retrieval over a precomputed :class:`EmbeddingStore`."""

    def __init__(
        self,
        model: CLIP,
        params,
        tokenizer: CLIPTokenizer,
        store: EmbeddingStore,
        top_k: int = 100,
        corpus_dtype=jnp.float32,
        rt: Optional[MeshRuntime] = None,
        shard_corpus: bool = False,
        use_pallas: Optional[bool] = None,
    ):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.top_k = min(top_k, len(store))
        self.rt = rt
        self.shard_corpus = shard_corpus and rt is not None
        self.use_pallas = use_pallas

        if self.shard_corpus:
            store = store.padded(rt.num_data)
        self.store = store
        mesh = rt.mesh if self.shard_corpus else None
        self.corpus_img, self.corpus_txt = store.device_arrays(corpus_dtype, mesh)

        self._encode = jax.jit(
            lambda p, ids: l2_normalize(model.apply({"params": p}, ids, method=CLIP.encode_text))
        )

    # -- core ----------------------------------------------------------------

    def encode_queries(self, queries: Sequence[str]) -> jax.Array:
        ids = self.tokenizer(list(queries), context_length=self.model.arch.context_length)
        # Bucketed sequence trim: causal mask + EOT pooling make trailing-pad
        # compute pure waste; short serving queries encode ~2x faster.
        ids = trim_to_bucket(ids)
        return self._encode(self.params, jnp.asarray(ids))

    def search_batch(self, queries: Sequence[str], alpha: float = 0.5, top_k: Optional[int] = None):
        """Batched search: returns (values [Q, k], indices [Q, k])."""
        k = min(top_k or self.top_k, len(self.store))
        q = self.encode_queries(queries).astype(self.corpus_img.dtype)
        if self.shard_corpus:
            return sharded_similarity_topk(
                q, self.corpus_img, self.corpus_txt, k=k, alpha=alpha, mesh=self.rt.mesh,
                use_pallas=self.use_pallas,
            )
        if self.use_pallas:
            return fused_similarity_topk(q, self.corpus_img, self.corpus_txt, k=k, alpha=alpha)
        return similarity_topk_xla(q, self.corpus_img, self.corpus_txt, k=k, alpha=alpha)

    # -- reference-parity API --------------------------------------------------

    def retrieval(self, query: str, alpha: float = 0.5, top_k: Optional[int] = None) -> List[Dict]:
        """Single-query search -> ``[{"uuid", "score"}]`` sorted descending
        (reference ``clip_retrieval.py:39-40`` / retriever ``search``)."""
        vals, idx = self.search_batch([query], alpha=alpha, top_k=top_k)
        vals = np.asarray(vals)[0]
        idx = np.asarray(idx)[0]
        out = []
        for v, i in zip(vals, idx):
            uuid = self.store.uuids[int(i)]
            if uuid.startswith("__pad_"):
                continue
            out.append({"uuid": uuid, "score": float(v)})
        return out
