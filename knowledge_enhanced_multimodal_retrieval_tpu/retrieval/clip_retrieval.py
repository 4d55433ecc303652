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

import dataclasses
import functools
import threading
from dataclasses import dataclass
from typing import Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..data.tokenizer import DEFAULT_BUCKETS as _WARMUP_BUCKETS
from ..data.tokenizer import CLIPTokenizer, trim_to_bucket
from ..models.clip import CLIP, l2_normalize
from ..models.fast_encode import encode_text_fast, make_text_plan
from ..ops.binary_sketch import (
    hamming_topk,
    pack_sign_bits_host,
    sharded_hamming_topk,
)
from ..ops.dispatch import on_tpu
from ..ops.pq import (
    masked_pq_similarity_topk,
    pack_pq_host,
    pq_similarity_topk,
    sharded_masked_pq_similarity_topk,
    sharded_pq_similarity_topk,
    train_opq_rotation,
    train_pq_codebooks,
)
from ..ops.similarity import (
    alpha_column,
    prefix_normalize,
    prefix_normalize_host,
    fused_similarity_topk,
    fused_similarity_topk_q4,
    fused_similarity_topk_q8,
    masked_similarity_topk,
    masked_similarity_topk_q4,
    masked_similarity_topk_q8,
    quantize_corpus_host,
    quantize_corpus_host_q4,
    random_rotation,
    sharded_masked_similarity_topk,
    sharded_similarity_topk,
    sharded_similarity_topk_q4,
    sharded_similarity_topk_q8,
    similarity_topk_xla,
    similarity_topk_xla_q4,
    similarity_topk_xla_q8,
)
from ..parallel.mesh import MeshRuntime
from ..parallel.sharding import batch_sharding
from .ann import _SUBLANE as _CAP_SUBLANE
from .ann import IVFIndex, build_ivf_index, ivf_search, sharded_ivf_search
from .embedding_store import EmbeddingStore


@dataclass(frozen=True)
class _CorpusState:
    """Everything search reads that depends on the corpus, as ONE object.

    The search path loads ``self._corpus`` exactly once per call, so a
    concurrent :meth:`CLIPRetrieval.set_store` (corpus update while serving)
    is an atomic reference swap — no request ever sees a half-updated mix of
    arrays, scales, and uuids.
    """

    store: EmbeddingStore  # capacity-padded; row-aligned with the device arrays
    n_real: int  # rows before padding
    corpus_img: object  # device array (bf16/f32 or int8) — None in ann mode
    corpus_txt: object
    corpus_img_scale: object  # int8 per-row scales, else None
    corpus_txt_scale: object
    ivf_arrays: object  # packed IVF pytree in ann mode, else None
    ann_spill_fraction: float
    top_k: int  # ctor-requested k clamped to the real row count
    nprobe: int  # ann probe width clamped to the (possibly rebuilt) nlist


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
        shard_queries: bool = False,
        use_pallas: Optional[bool] = None,
        use_fused_encoder: Optional[bool] = None,
        quantize: Optional[str] = None,
        quantize_corpus: bool = False,
        ann: Optional[str] = None,
        ann_nlist: Optional[int] = None,
        ann_nprobe: int = 8,
        ann_capacity_factor: float = 1.5,
        ann_index_path: Optional[str] = None,
        ann_max_batch_lookups: float = 1e7,
        capacity_multiple: int = 1,
        rerank: bool = False,
        rerank_factor: int = 4,
        truncate_dim: int = 0,
        rotate: bool = False,
        rotate_seed: int = 0,
        pq_m: int = 0,
        pq_aniso_t: float = 0.0,
    ):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self._requested_top_k = top_k
        self.rt = rt
        # Device-array rows round up to this multiple, so corpus updates
        # (add_documents/remove_documents) within the same capacity bucket
        # reuse the compiled search program — on a jit backend a new corpus
        # shape means a full recompile (minutes on the relay). 1 = exact
        # current-size arrays (no slack).
        self.capacity_multiple = max(1, int(capacity_multiple))
        self.shard_corpus = shard_corpus and rt is not None
        # Query data parallelism (throughput scaling): queries shard over the
        # mesh's data axis while params + corpus REPLICATE on every device —
        # each chip encodes and scans its own query slice, so q/s scales
        # linearly with the mesh (the dual of shard_corpus, which scales
        # CAPACITY by splitting the corpus and keeping queries replicated).
        # Implemented as shard_map inside the same compiled programs; batch
        # padding to the axis size happens inside jit (no extra dispatches).
        self.shard_queries = shard_queries and rt is not None
        if self.shard_queries and self.shard_corpus:
            raise ValueError(
                "shard_queries and shard_corpus both shard over the mesh's "
                "data axis — pick one (capacity vs throughput scaling)"
            )
        if (self.shard_corpus or self.shard_queries) and getattr(rt, "dcn_axis", None):
            raise ValueError(
                "serving shards over ONE intra-slice data axis; a multi-slice "
                "(dcn) mesh is a training layout — serve each slice with its "
                "own single-slice MeshRuntime"
            )
        # None = auto: the fused Pallas path on TPU (it IS the product path),
        # the XLA path elsewhere
        self.use_pallas = on_tpu() if use_pallas is None else use_pallas
        # Fused-block Pallas encoder (models.fast_encode): one-time bf16
        # weight packing + VMEM-resident transformer blocks. ~1.5x lower
        # encode latency than the flax/XLA tower at serving shapes.
        if use_fused_encoder is None:
            from ..models.fast_encode import fused_encoder_supported

            # auto also requires an arch the fused kernels can tile (128-lane
            # widths) — tiny test models degrade to the flax tower
            use_fused_encoder = (
                self.use_pallas and on_tpu() and not self.shard_corpus
                and fused_encoder_supported(model.arch)
            )
        if quantize is not None and not use_fused_encoder:
            raise ValueError("quantize requires use_fused_encoder=True")
        self.use_fused_encoder = use_fused_encoder
        self.quantize = quantize
        # plan dtype mirrors the model's compute dtype (bf16 in serving);
        # quantize="int8" additionally packs projection weights as W8A8
        # dynamic int8 (~2x MXU throughput, opt-in — see models.fast_encode)
        self._text_plan = (
            make_text_plan(params, dtype=model.dtype, quantize=quantize)
            if use_fused_encoder
            else None
        )

        # corpus packing: False = exact (bf16/f32), "int8" (True) = half the
        # HBM footprint, "int4" = quarter (nibble-packed), "pq" = ~30x
        # (product-quantization codes + per-row scales — binary footprint at
        # far better recall, ops.pq), "binary" = 32x sign sketches. See
        # ops.similarity quantize_corpus_host[_q4] / ops.pq / ops.binary_sketch.
        if quantize_corpus is True:
            quantize_corpus = "int8"
        if quantize_corpus not in (False, None, "int8", "int4", "pq", "binary"):
            raise ValueError(
                f"unknown quantize_corpus mode {quantize_corpus!r} "
                "(expected False, True/'int8', 'int4', 'pq', or 'binary')"
            )
        # product-quantization subspace count (0 = dim/8, ~8 dims per code);
        # must divide the staged width (truncate_dim if set, else store.dim)
        self.pq_m = int(pq_m)
        # Score-aware (anisotropic / ScaNN-objective) PQ: weight the
        # residual component PARALLEL to each row eta(t)x in codebook
        # training and code assignment (ops.pq.train_pq_codebooks_
        # anisotropic) — measured to roughly HALVE the score error on the
        # true top-k at equal bitrate (the scores users see and the
        # engine thresholds on), recall neutral-to-positive. 0 = off;
        # t=0.2 is the standard operating point. Serving kernels are
        # unchanged (only the codebook/code VALUES differ).
        self.pq_aniso_t = float(pq_aniso_t)
        if self.pq_aniso_t and quantize_corpus != "pq":
            raise ValueError("pq_aniso_t requires quantize_corpus='pq'")
        if self.pq_aniso_t and ann is not None:
            # IVF-PQ codes model residuals; the anisotropic loss weights
            # directions of the ORIGINAL rows — not wired up (yet)
            raise ValueError("pq_aniso_t does not compose with ann")
        if self.pq_aniso_t and rotate == "opq":
            raise ValueError(
                "pq_aniso_t and rotate='opq' train conflicting objectives "
                "(score-aware vs reconstruction) — pick one"
            )
        self.quantize_corpus = quantize_corpus or False
        if self.quantize_corpus == "binary":
            # sign-sketch candidate tier (ops.binary_sketch): 32x capacity,
            # Hamming proxy scores — candidate-generation only, so the host
            # exact rerank is MANDATORY and the composition set is narrow
            if not rerank:
                raise ValueError(
                    "quantize_corpus='binary' serves Hamming proxy scores — "
                    "set rerank=True (host exact rescoring) to use it"
                )
            if ann is not None:
                raise ValueError("quantize_corpus='binary' does not compose with ann")

        # Matryoshka serving (opt-in, for MRL-trained models —
        # train.matryoshka_dims): the corpus stages as the first
        # truncate_dim coordinates, prefix-re-normalized ON HOST, and query
        # embeddings truncate the same way inside the search program. HBM
        # footprint and candidate-scan traffic scale with the prefix width;
        # composes with the whole packing ladder (int8/int4/binary) and
        # rerank restores full-dim exact final scores. 0 = off.
        if truncate_dim < 0:
            raise ValueError(f"truncate_dim must be >= 0, got {truncate_dim}")
        if truncate_dim and truncate_dim > store.dim:
            raise ValueError(
                f"truncate_dim {truncate_dim} exceeds the store width {store.dim}"
            )
        if truncate_dim and ann is not None:
            # the IVF disk-cache config check doesn't record the prefix
            # width — refuse rather than risk serving a stale full-dim index
            raise ValueError("truncate_dim does not compose with ann")
        self.truncate_dim = int(truncate_dim)

        # Rotated quantization (opt-in, for packed corpora): a seeded random
        # orthonormal R rotates corpus rows at staging (host) and query
        # embeddings inside the score program. Exact inner products are
        # invariant, but per-row energy spreads evenly across coordinates,
        # so int4/int8 grids and sign sketches lose far less recall on
        # anisotropic embeddings — the LSH/OPQ random-rotation trick. The
        # host f32 store stays UNROTATED: rerank and candidate rescoring
        # keep working in the original space.
        rotate_mode = rotate if isinstance(rotate, str) else ("random" if rotate else None)
        if rotate_mode not in (None, "random", "opq"):
            raise ValueError(
                f"unknown rotate mode {rotate!r} (expected bool, 'random' or 'opq')"
            )
        self.rotate = rotate_mode is not None
        self.rotate_mode = rotate_mode
        self._rot_np = self._rot = None
        if self.rotate:
            if not quantize_corpus:
                raise ValueError(
                    "rotate requires a packed corpus mode (quantize_corpus="
                    "'int8'|'int4'|'pq'|'binary') — it only changes "
                    "quantization rounding, exact scans gain nothing"
                )
            if ann is not None:
                raise ValueError("rotate does not compose with ann")
            dim = int(truncate_dim) or store.dim
            if rotate_mode == "opq":
                # OPQ: learn the rotation that minimizes PQ reconstruction
                # error on THIS corpus (ops.pq.train_opq_rotation) — only
                # meaningful for codebook packing; the other packed modes
                # keep the data-free random rotation. Trained ONCE at
                # construction; live updates keep R (codebooks retrain on
                # every rebuild, which is where the data-dependence lives).
                if quantize_corpus != "pq":
                    raise ValueError(
                        "rotate='opq' learns a PQ-reconstruction rotation — "
                        "it requires quantize_corpus='pq' (use rotate=True "
                        "for the random rotation on int8/int4/binary)"
                    )
                rows = np.concatenate(
                    [np.asarray(store.image, np.float32),
                     np.asarray(store.text, np.float32)], axis=0
                )
                if truncate_dim:
                    rows = prefix_normalize_host(rows, int(truncate_dim))
                self._rot_np = train_opq_rotation(
                    rows, m=self.pq_m or max(1, dim // 8), seed=rotate_seed
                )
            else:
                self._rot_np = random_rotation(dim, rotate_seed)

        # opt-in ANN mode (retrieval/ann.py): IVF cluster probing instead of
        # the exact brute-force scan — the scaling path for corpora where a
        # full pass per query is too much HBM traffic (or for single-query
        # latency). Exact paths stay the default.
        if ann not in (None, "ivf"):
            raise ValueError(f"unknown ann mode {ann!r} (expected None or 'ivf')")
        # ann='ivf' composes with int8, int4 (IVFSQ4), and pq (IVF-PQ)
        # packing; binary raised above (Hamming proxy, not inner products)
        # Host-side exact rerank (opt-in): the device program over-fetches
        # rerank_factor * k candidates from the packed/approximate corpus,
        # then the f32 corpus ALREADY RESIDENT IN HOST RAM (EmbeddingStore)
        # rescores just those rows exactly and re-sorts. The classic
        # two-tier serving shape: packed corpus on-chip for the big scan
        # (int8 = 2x, int4 = 4x capacity), exact rows on the host for final
        # precision — quantization rounding can no longer reorder the final
        # top-k (given the winners were fetched). With an exact device
        # corpus it still upgrades bf16 score rounding to f32.
        if rerank_factor < 1:
            raise ValueError(f"rerank_factor must be >= 1, got {rerank_factor}")
        self.rerank = bool(rerank)
        self.rerank_factor = int(rerank_factor)
        self.ann = ann
        self.ann_nprobe = ann_nprobe
        self._ann_nlist = ann_nlist
        self._ann_capacity_factor = ann_capacity_factor
        # IVF-PQ wide-probe guardrail: the per-query ADC LUT walk is a
        # varying-index gather XLA SCALARIZES on TPU (~1e8 lookups/s
        # measured), so a batch costs ~B*nprobe*cap*m / 1e8 seconds —
        # batch-256 at wide probes measured ~1 s/batch. Searches whose
        # estimated lookup count exceeds this budget raise instead of
        # silently serving at that latency (ivf+int8/int4 is the wide-probe
        # batch answer: dense einsums over the gathered rows, ~3.8 ms at
        # the same shape). 1e7 lookups ~= 100 ms/batch. <= 0 disables.
        self.ann_max_batch_lookups = float(ann_max_batch_lookups or 0)
        # disk cache for the built IVF index (clustering + packing are the
        # expensive steps at scale): consulted ONCE at construction — loaded
        # when fresh (corpus fingerprint + config checks), rebuilt and
        # re-saved otherwise. Live updates rebuild in memory WITHOUT
        # re-saving (a multi-GB synchronous write per single-doc update
        # would serialize updates behind disk I/O); a restart after updates
        # fingerprint-mismatches and rebuilds once.
        if ann_index_path and not str(ann_index_path).endswith(".npz"):
            ann_index_path = str(ann_index_path) + ".npz"
        self.ann_index_path = ann_index_path
        self._index_cache_armed = ann_index_path is not None
        self.corpus_dtype = corpus_dtype
        self._update_lock = threading.Lock()
        self._install_corpus(store)
        if self._rot_np is not None:
            # the query-side rotation rides every score program as an
            # OPERAND (never a jit closure constant on the relay)
            self._rot = jnp.asarray(self._rot_np)
            if self.shard_queries:
                self._rot = jax.device_put(self._rot, self.rt.replicated_sharding())

        def _encode_fn(p, ids):
            if self.use_fused_encoder:
                return l2_normalize(encode_text_fast(model.arch, p, ids))
            return l2_normalize(model.apply({"params": p}, ids, method=CLIP.encode_text))

        self._enc_params = self._text_plan if self.use_fused_encoder else params
        if self.shard_queries:
            # replicate the encoder params over the mesh once (committed
            # placement): mixing device-0-committed params into a mesh-wide
            # shard_map program is an error in JAX
            self._enc_params = jax.device_put(
                self._enc_params, self.rt.replicated_sharding()
            )
        self._encode = jax.jit(_encode_fn)

        def _qdp(body, args, sharded, **statics):
            """Run ``body`` query-data-parallel over the mesh's data axis.

            ``args``: the program operands; ``sharded``: positions whose
            leading axis is the query axis (ids / q / alpha / per-query
            mask) — they shard ``P(data)``, everything else (params, corpus,
            scales) replicates ``P()``. The query axis pads to a multiple of
            the axis size and the pad slices back off, all INSIDE the
            enclosing jit — one compiled program, no extra dispatches.
            """
            mesh, axis = self.rt.mesh, self.rt.data_axis
            n = self.rt.num_data
            args = list(args)
            nq = args[sharded[0]].shape[0]
            pad = (-nq) % n
            if pad:
                for i in sharded:
                    a = args[i]
                    reps = (pad,) + (1,) * (a.ndim - 1)
                    args[i] = jnp.concatenate([a, jnp.tile(a[:1], reps)], axis=0)
            specs = tuple(
                P(axis) if i in sharded else P() for i in range(len(args))
            )
            fn = shard_map(
                functools.partial(body, **statics),
                mesh=mesh, in_specs=specs, out_specs=P(axis), check_vma=False,
            )
            out = fn(*args)
            return jax.tree.map(lambda o: o[:nq], out) if pad else out

        self._qdp = _qdp

        # The FULL search (encode -> blend -> top-k) as ONE jitted program:
        # eager op dispatch costs a full host<->device round trip per op,
        # which dwarfs the ~1 ms of device compute on a tunneled chip. One
        # compile per (ids-bucket, k, alpha) signature, cached after.
        # scales ride as ARGUMENTS (never close over arrays in jit on the
        # relay: constants serialize into the remote-compile request)
        def _score_fn(
            q, cimg, ctxt, cimg_s, ctxt_s, alpha, rot, *, k: int, nprobe: int
        ):
            """Blend + top-k of query embeddings ``q`` against the corpus —
            shared by the text program (which encodes first) and the
            embedding-direct program (image queries / precomputed vectors)."""
            if self.truncate_dim:
                # Matryoshka scan: queries truncate to the corpus' staged
                # prefix width inside the same jitted program
                q = prefix_normalize(q, self.truncate_dim)
            if rot is not None:
                # rotated quantization: queries meet the R-rotated packed
                # corpus in the rotated space (exact scores invariant)
                q = q.astype(jnp.float32) @ rot
            if self.ann == "ivf":
                # cimg carries the packed index pytree (passed as an
                # argument — index arrays must never be jit constants on
                # the relay); scales are None unless quantize_corpus
                ci, ct, pi, pt, pr, si, st, cbi, cbt = cimg
                index = IVFIndex(ci, ct, pi, pt, pr, 0.0, si, st, cbi, cbt)
                if self.shard_corpus:
                    return sharded_ivf_search(
                        q, index, k=k, nprobe=nprobe,
                        mesh=self.rt.mesh, alpha=alpha,
                    )
                return ivf_search(q, index, k=k, nprobe=nprobe, alpha=alpha)
            if self.quantize_corpus == "binary":
                # sketch scan -> proxy scores; the retrieval wrappers rerank
                # the fetched candidates exactly (rerank=True is enforced)
                dim = self.truncate_dim or int(self._corpus.store.image.shape[1])
                if self.shard_corpus:
                    return sharded_hamming_topk(
                        q.astype(jnp.float32), cimg, ctxt,
                        dim=dim, k=k, alpha=alpha, mesh=self.rt.mesh,
                    )
                return hamming_topk(
                    q.astype(jnp.float32), cimg, ctxt, dim=dim, k=k, alpha=alpha,
                )
            if self.quantize_corpus == "pq":
                # decode-and-matmul over codebook codes (ops.pq): codebooks
                # ride inside the (cimg, ctxt) operand tuples
                q = q.astype(model.dtype)
                codes_i, cb_i = cimg
                codes_t, cb_t = ctxt
                if self.shard_corpus:
                    return sharded_pq_similarity_topk(
                        q, codes_i, cimg_s, codes_t, ctxt_s, cb_i, cb_t,
                        k=k, alpha=alpha, mesh=self.rt.mesh,
                    )
                return pq_similarity_topk(
                    q, codes_i, cimg_s, codes_t, ctxt_s, cb_i, cb_t, k=k, alpha=alpha
                )
            if self.quantize_corpus:
                q = q.astype(model.dtype)
                sharded, fused, xla = (
                    (sharded_similarity_topk_q4, fused_similarity_topk_q4, similarity_topk_xla_q4)
                    if self.quantize_corpus == "int4"
                    else (sharded_similarity_topk_q8, fused_similarity_topk_q8, similarity_topk_xla_q8)
                )
                if self.shard_corpus:
                    return sharded(
                        q, cimg, cimg_s, ctxt, ctxt_s, k=k, alpha=alpha,
                        mesh=self.rt.mesh, use_pallas=self.use_pallas,
                    )
                if self.use_pallas:
                    return fused(q, cimg, cimg_s, ctxt, ctxt_s, k=k, alpha=alpha)
                return xla(q, cimg, cimg_s, ctxt, ctxt_s, k=k, alpha=alpha)
            q = q.astype(cimg.dtype)
            if self.shard_corpus:
                return sharded_similarity_topk(
                    q, cimg, ctxt, k=k, alpha=alpha, mesh=self.rt.mesh, use_pallas=self.use_pallas
                )
            if self.use_pallas:
                return fused_similarity_topk(q, cimg, ctxt, k=k, alpha=alpha)
            return similarity_topk_xla(q, cimg, ctxt, k=k, alpha=alpha)

        def _search_body(
            params, ids, cimg, ctxt, cimg_s, ctxt_s, alpha, rot, *, k: int, nprobe: int
        ):
            q = _encode_fn(params, ids)
            vals, idx = _score_fn(
                q, cimg, ctxt, cimg_s, ctxt_s, alpha, rot, k=k, nprobe=nprobe
            )
            # host rerank needs the query embeddings; ship them with the
            # winners ([Q, D] extra fetch — trivial next to the search).
            # Unrotated on purpose: the host f32 store rescores in the
            # original space.
            return (vals, idx, q) if self.rerank else (vals, idx)

        def _search_program(
            params, ids, cimg, ctxt, cimg_s, ctxt_s, alpha, rot, *, k: int, nprobe: int
        ):
            args = (params, ids, cimg, ctxt, cimg_s, ctxt_s, alpha, rot)
            if self.shard_queries:
                return _qdp(_search_body, args, (1, 6), k=k, nprobe=nprobe)
            return _search_body(*args, k=k, nprobe=nprobe)

        self._search_program = jax.jit(
            _search_program, static_argnames=("k", "nprobe")
        )

        # embedding-direct search: same corpus scoring, the caller supplies
        # L2-normalized [Q, D] query embeddings (image queries, cached or
        # federated query vectors) instead of token ids
        def _score_program_emb(
            q, cimg, ctxt, cimg_s, ctxt_s, alpha, rot, *, k: int, nprobe: int
        ):
            args = (q, cimg, ctxt, cimg_s, ctxt_s, alpha, rot)
            if self.shard_queries:
                return _qdp(_score_fn, args, (0, 5), k=k, nprobe=nprobe)
            return _score_fn(*args, k=k, nprobe=nprobe)

        self._search_program_emb = jax.jit(
            _score_program_emb, static_argnames=("k", "nprobe")
        )

        # filtered search: a bool row mask rides as a RUNTIME operand (like
        # alpha) — changing the allow/deny filter re-executes, never
        # re-compiles. Masked-out slots come back with the -1 idx sentinel.
        def _score_fn_masked(q, cimg, ctxt, cimg_s, ctxt_s, alpha, mask, rot, *, k: int):
            if self.truncate_dim:
                q = prefix_normalize(q, self.truncate_dim)
            if rot is not None:
                q = q.astype(jnp.float32) @ rot
            if self.quantize_corpus == "binary":
                raise ValueError(
                    "filtered search is not supported over a binary-sketch "
                    "corpus — use candidate scoring (retrieval_candidates_batch)"
                )
            if self.quantize_corpus == "pq":
                q = q.astype(model.dtype)
                codes_i, cb_i = cimg
                codes_t, cb_t = ctxt
                if self.shard_corpus:
                    return sharded_masked_pq_similarity_topk(
                        q, codes_i, cimg_s, codes_t, ctxt_s, cb_i, cb_t, mask,
                        k=k, alpha=alpha, mesh=self.rt.mesh,
                    )
                return masked_pq_similarity_topk(
                    q, codes_i, cimg_s, codes_t, ctxt_s, cb_i, cb_t, mask,
                    k=k, alpha=alpha,
                )
            if self.quantize_corpus:
                q = q.astype(model.dtype)
                mode = "q4" if self.quantize_corpus == "int4" else "q8"
                if self.shard_corpus:
                    return sharded_masked_similarity_topk(
                        q, (cimg, cimg_s, ctxt, ctxt_s), mask, k=k, alpha=alpha,
                        mesh=self.rt.mesh, mode=mode,
                    )
                fn = masked_similarity_topk_q4 if mode == "q4" else masked_similarity_topk_q8
                return fn(q, cimg, cimg_s, ctxt, ctxt_s, mask, k=k, alpha=alpha)
            q = q.astype(cimg.dtype)
            if self.shard_corpus:
                return sharded_masked_similarity_topk(
                    q, (cimg, ctxt), mask, k=k, alpha=alpha,
                    mesh=self.rt.mesh, mode="exact",
                )
            return masked_similarity_topk(q, cimg, ctxt, mask, k=k, alpha=alpha)

        def _masked_body(
            params, ids, cimg, ctxt, cimg_s, ctxt_s, alpha, mask, rot, *, k: int
        ):
            q = _encode_fn(params, ids)
            vals, idx = _score_fn_masked(
                q, cimg, ctxt, cimg_s, ctxt_s, alpha, mask, rot, k=k
            )
            return (vals, idx, q) if self.rerank else (vals, idx)

        def _mask_is_per_query(mask, nq: int) -> bool:
            # a [Q, N] mask shards with the queries; [N] / [1, N] replicate
            m = jnp.asarray(mask)
            return m.ndim == 2 and m.shape[0] == nq and m.shape[0] != 1

        def _search_program_masked(
            params, ids, cimg, ctxt, cimg_s, ctxt_s, alpha, mask, rot, *, k: int
        ):
            args = (
                params, ids, cimg, ctxt, cimg_s, ctxt_s, alpha,
                jnp.asarray(mask), rot,
            )
            if self.shard_queries:
                sharded = (1, 6, 7) if _mask_is_per_query(mask, ids.shape[0]) else (1, 6)
                return _qdp(_masked_body, args, sharded, k=k)
            return _masked_body(*args, k=k)

        self._search_program_masked = jax.jit(
            _search_program_masked, static_argnames=("k",)
        )

        def _score_program_masked_emb(
            q, cimg, ctxt, cimg_s, ctxt_s, alpha, mask, rot, *, k: int
        ):
            args = (q, cimg, ctxt, cimg_s, ctxt_s, alpha, jnp.asarray(mask), rot)
            if self.shard_queries:
                sharded = (0, 5, 6) if _mask_is_per_query(mask, q.shape[0]) else (0, 5)
                return _qdp(_score_fn_masked, args, sharded, k=k)
            return _score_fn_masked(*args, k=k)

        self._search_program_masked_emb = jax.jit(
            _score_program_masked_emb, static_argnames=("k",)
        )
        self._encode_image = None  # built lazily on first image query

    # -- corpus state ----------------------------------------------------------

    def _pad_multiple(self) -> int:
        """Device rows round up to this (capacity bucket x mesh shards)."""
        return self.capacity_multiple * (self.rt.num_data if self.shard_corpus else 1)

    def _install_corpus(self, store: EmbeddingStore) -> None:
        """Build all corpus-derived device state and swap it in atomically."""
        if len(store) == 0:
            raise ValueError("empty corpus")
        n_real = len(store)
        mesh = self.rt.mesh if self.shard_corpus else None
        if self.ann == "ivf":
            nlist = self._ann_nlist or max(1, int(np.sqrt(n_real)))
            if self.shard_corpus:
                # clusters shard over the mesh: nlist snaps to the nearest
                # workable multiple of the axis size (<= corpus rows)
                n_shards = self.rt.num_data
                nlist = min(-(-nlist // n_shards) * n_shards, (n_real // n_shards) * n_shards)
                if nlist < n_shards:
                    raise ValueError(
                        f"corpus of {n_real} rows cannot shard {n_shards} ways in ann mode"
                    )
            index = self._load_or_build_index(store, nlist, mesh)
            if self.ann_nprobe < 1:
                raise ValueError(f"ann_nprobe must be >= 1, got {self.ann_nprobe}")
            # clamp rather than raise: a corpus-shrinking update can rebuild
            # with a smaller derived nlist, and nprobe == nlist is simply an
            # exact probe — raising here would wedge remove_documents forever
            nprobe = min(self.ann_nprobe, index.nlist)
            state = _CorpusState(
                store=store, n_real=n_real,
                corpus_img=None, corpus_txt=None,
                corpus_img_scale=None, corpus_txt_scale=None,
                ivf_arrays=(
                    index.centroids_img, index.centroids_txt,
                    index.packed_img, index.packed_txt, index.packed_rows,
                    index.packed_img_scale, index.packed_txt_scale,
                    index.cb_img, index.cb_txt,
                ),
                ann_spill_fraction=index.spill_fraction,
                top_k=min(self._requested_top_k, n_real),
                nprobe=nprobe,
            )
        else:
            # pad device rows to the capacity bucket (pad rows are zero
            # vectors: score exactly 0, filtered from results by sentinel
            # uuid) so same-bucket updates reuse the compiled program; the
            # sharded path additionally needs a row multiple of the mesh
            padded = store.padded(self._pad_multiple())
            if self.truncate_dim:
                # Matryoshka staging: the device only ever sees the first
                # truncate_dim coordinates (prefix-re-normalized on host);
                # the full-dim f32 store stays host-side for rerank /
                # candidate rescoring. Zero pad rows stay zero.
                src_img = prefix_normalize_host(padded.image, self.truncate_dim)
                src_txt = prefix_normalize_host(padded.text, self.truncate_dim)
            else:
                src_img, src_txt = padded.image, padded.text
            if self._rot_np is not None:
                # rotated quantization: pack the R-rotated rows (rotation
                # preserves norms, so zero pad rows stay zero); the host f32
                # store keeps the ORIGINAL space for rerank/candidates
                src_img = np.asarray(src_img, np.float32) @ self._rot_np
                src_txt = np.asarray(src_txt, np.float32) @ self._rot_np
            if self.quantize_corpus == "binary":
                # sign bits packed on host (32x smaller than f32): only
                # ~D/32 uint32 words per row ever upload; zero pad rows
                # pack to all-zero words
                cimg = pack_sign_bits_host(src_img, mesh)
                ctxt = pack_sign_bits_host(src_txt, mesh)
                cimg_s = ctxt_s = None
            elif self.quantize_corpus == "pq":
                # product quantization (ops.pq): per-tower codebooks train
                # on the staged rows (post truncate/rotate — rotation is the
                # OPQ-lite trick), codes + per-row scales upload (~30x
                # smaller than f32), the KB-sized codebooks replicate and
                # ride every score program as OPERANDS. Zero pad rows pack
                # to scale 0 (score exactly 0). Live updates retrain the
                # codebooks on rebuild (this whole branch re-runs).
                dim = src_img.shape[1]
                m = self.pq_m or max(1, dim // 8)
                src_img = np.asarray(src_img, np.float32)
                src_txt = np.asarray(src_txt, np.float32)
                if self.pq_aniso_t:
                    # score-aware codebooks + coordinate-descent assignment
                    # (ops.pq.train_pq_codebooks_anisotropic) — the serving
                    # kernels are identical, only the values differ
                    from ..ops.pq import train_pq_codebooks_anisotropic

                    cb_i = train_pq_codebooks_anisotropic(
                        src_img, m=m, t=self.pq_aniso_t
                    )
                    cb_t = train_pq_codebooks_anisotropic(
                        src_txt, m=m, t=self.pq_aniso_t
                    )
                else:
                    cb_i = train_pq_codebooks(src_img, m=m)
                    cb_t = train_pq_codebooks(src_txt, m=m)
                codes_i, cimg_s = pack_pq_host(src_img, cb_i, mesh, aniso_t=self.pq_aniso_t)
                codes_t, ctxt_s = pack_pq_host(src_txt, cb_t, mesh, aniso_t=self.pq_aniso_t)
                cimg = (codes_i, jnp.asarray(cb_i))
                ctxt = (codes_t, jnp.asarray(cb_t))
            elif self.quantize_corpus:
                # int8/int4 per-row packing, quantized ON HOST so the full
                # f32 corpus never stages in device HBM (a corpus sized to
                # fit packed would OOM in f32) — only packed buffers + scales
                # upload, row-sharded over the mesh when corpus is sharded
                quantizer = (
                    quantize_corpus_host_q4
                    if self.quantize_corpus == "int4"
                    else quantize_corpus_host
                )
                cimg, cimg_s = quantizer(src_img, mesh)
                ctxt, ctxt_s = quantizer(src_txt, mesh)
            elif self.truncate_dim:
                cimg = jnp.asarray(src_img, self.corpus_dtype)
                ctxt = jnp.asarray(src_txt, self.corpus_dtype)
                if mesh is not None:
                    sharding = batch_sharding(mesh, 2, "data")
                    cimg = jax.device_put(cimg, sharding)
                    ctxt = jax.device_put(ctxt, sharding)
                cimg_s = ctxt_s = None
            else:
                cimg, ctxt = padded.device_arrays(self.corpus_dtype, mesh)
                cimg_s = ctxt_s = None
            state = _CorpusState(
                store=padded, n_real=n_real,
                corpus_img=cimg, corpus_txt=ctxt,
                corpus_img_scale=cimg_s, corpus_txt_scale=ctxt_s,
                ivf_arrays=None, ann_spill_fraction=0.0,
                top_k=min(self._requested_top_k, n_real),
                nprobe=0,
            )
        if self.shard_queries:
            # replicate the corpus-side device state over the mesh (committed
            # placement — the query-DP shard_map programs need every operand
            # on every mesh device)
            rep = self.rt.replicated_sharding()
            put = lambda x: x if x is None else jax.device_put(x, rep)
            state = dataclasses.replace(
                state,
                corpus_img=put(state.corpus_img),
                corpus_txt=put(state.corpus_txt),
                corpus_img_scale=put(state.corpus_img_scale),
                corpus_txt_scale=put(state.corpus_txt_scale),
                ivf_arrays=put(state.ivf_arrays),
            )
        self._corpus = state  # atomic reference swap — see _CorpusState

    def _load_or_build_index(self, store: EmbeddingStore, nlist: int, mesh):
        import os

        from .ann import corpus_fingerprint, load_ivf_index, save_ivf_index

        use_cache, self._index_cache_armed = self._index_cache_armed, False
        fp = corpus_fingerprint(store.image, store.text) if use_cache else None
        if use_cache and os.path.exists(self.ann_index_path):
            try:
                index = load_ivf_index(
                    self.ann_index_path, mesh=mesh, expected_fingerprint=fp
                )
                # the CONFIG must match the cached file too, or retuned
                # nlist/capacity/dtype flags would be silently ignored
                expected_cap = max(
                    _CAP_SUBLANE,
                    -(-int(np.ceil(self._ann_capacity_factor * len(store) / nlist)) // _CAP_SUBLANE)
                    * _CAP_SUBLANE,
                )
                quantize = self.quantize_corpus or None  # 'int8'|'int4'|'pq'|None
                expected_m = (
                    (self.pq_m or max(1, store.dim // 8)) if quantize == "pq" else None
                )
                config_ok = (
                    index.mode == (quantize or "exact")
                    and index.nlist == nlist
                    and index.cap >= expected_cap
                    and (
                        quantize != "pq"
                        or index.packed_img.shape[-1] == expected_m
                    )
                    and (
                        quantize is not None
                        or index.packed_img.dtype == jnp.dtype(self.corpus_dtype)
                    )
                )
                if config_ok:
                    return index
            except Exception:  # truncated/corrupt/stale/bad mesh: rebuild
                pass
        index = build_ivf_index(
            store.image, store.text, nlist,
            capacity_factor=self._ann_capacity_factor, dtype=self.corpus_dtype,
            quantize=self.quantize_corpus or None,
            pq_m=self.pq_m or None,
            mesh=mesh,
        )
        if use_cache:
            save_ivf_index(self.ann_index_path, index, fingerprint=fp)
        return index

    # corpus-derived views (all read the one _CorpusState reference)
    @property
    def store(self) -> EmbeddingStore:
        return self._corpus.store

    @property
    def top_k(self) -> int:
        return self._corpus.top_k

    @property
    def corpus_img(self):
        return self._corpus.corpus_img

    @property
    def corpus_txt(self):
        return self._corpus.corpus_txt

    @property
    def corpus_img_scale(self):
        return self._corpus.corpus_img_scale

    @property
    def corpus_txt_scale(self):
        return self._corpus.corpus_txt_scale

    @property
    def ann_spill_fraction(self) -> float:
        return self._corpus.ann_spill_fraction

    @property
    def _ivf_arrays(self):
        return self._corpus.ivf_arrays

    # -- incremental corpus updates ---------------------------------------------
    # The reference's corpus is frozen at precompute time; these let a live
    # deployment ingest/retire artifacts. Concurrent searches keep serving
    # the OLD corpus until the new state swaps in (single reference write);
    # updates themselves serialize on a lock. Within one capacity bucket
    # (``capacity_multiple``) the device-array shapes are unchanged, so the
    # compiled search program is reused; crossing a bucket (or any update in
    # ann mode, which re-clusters) triggers one recompile at next search.

    def set_store(self, store: EmbeddingStore) -> None:
        """Replace the corpus wholesale (rebuilds device state, then swaps)."""
        with self._update_lock:
            self._install_corpus(store)

    def add_documents(
        self, image: np.ndarray, text: np.ndarray, uuids: Sequence[str]
    ) -> None:
        """Append documents (L2-normalized [n, D] tower embeddings + uuids)."""
        with self._update_lock:
            self._install_corpus(self._corpus_real_store().with_added(image, text, uuids))

    def remove_documents(self, uuids: Sequence[str]) -> None:
        """Retire documents by uuid (unknown uuids raise KeyError)."""
        with self._update_lock:
            self._install_corpus(self._corpus_real_store().with_removed(uuids))

    def save_store(self, path: str) -> int:
        """Persist the CURRENT corpus (incl. live-ingested documents, minus
        capacity pads) to ``path`` atomically; returns the row count.

        Live updates only mutate device/host state — without a snapshot a
        restart reloads the original store file and every ingested artifact
        is lost. Serialize against concurrent updates so the snapshot is a
        consistent corpus version.
        """
        with self._update_lock:
            store = self._corpus_real_store()
        store.save(path)
        return len(store)

    def _corpus_real_store(self) -> EmbeddingStore:
        """The corpus without capacity-pad sentinel rows."""
        c = self._corpus
        if len(c.store) == c.n_real:
            return c.store
        return EmbeddingStore(
            image=c.store.image[: c.n_real],
            text=c.store.text[: c.n_real],
            uuids=c.store.uuids[: c.n_real],
        )

    # -- core ----------------------------------------------------------------

    def encode_queries(self, queries: Sequence[str]) -> jax.Array:
        ids = self.tokenizer(list(queries), context_length=self.model.arch.context_length)
        # Bucketed sequence trim: causal mask + EOT pooling make trailing-pad
        # compute pure waste; short serving queries encode ~2x faster.
        ids = trim_to_bucket(ids)
        return self._encode(self._enc_params, jnp.asarray(ids))

    def _tokenize(self, queries: Sequence[str]) -> np.ndarray:
        ids = self.tokenizer(list(queries), context_length=self.model.arch.context_length)
        return trim_to_bucket(ids)

    def seq_bucket(self, query: str) -> int:
        """The seq bucket this query encodes at (for the MicroBatcher's
        length bucketing: grouping same-bucket queries keeps short queries
        on their cheap compiled program instead of paying the batch
        maximum's)."""
        return int(self._tokenize([query]).shape[1])

    def search_batch(self, queries: Sequence[str], alpha: float = 0.5, top_k: Optional[int] = None):
        """Batched search: returns (values [Q, k_fetch], indices [Q, k_fetch]).

        ``k_fetch >= k``: when the corpus carries capacity-pad rows, search
        over-fetches by the bucket slack so pad rows cannot displace real
        winners — filter/truncate via :meth:`results_from_topk` (or use
        :meth:`retrieval_batch`, which does both). The returned arrays are
        device futures (async dispatch); ``np.asarray`` to synchronize.
        With ``rerank=True`` the tuple carries a third element (the [Q, D]
        query embeddings) and ``k_fetch`` also covers the rerank
        over-fetch; the raw device ordering is NOT reranked — use
        :meth:`retrieval_batch` for reranked results.
        """
        return self._search_state(self._corpus, queries, alpha, top_k)

    _ADC_LOOKUPS_PER_S = 1e8  # measured TPU rate of the scalarized LUT walk

    def _check_pq_probe_cost(self, c: _CorpusState, batch: int) -> None:
        """Refuse IVF-PQ searches whose ADC lookup count blows the budget.

        Applies only to ``ann='ivf'`` + ``quantize_corpus='pq'``: per-query
        ADC tables make the probe a ``B * nprobe * cap * m`` varying-index
        gather that XLA scalarizes on TPU (~1e8 lookups/s) — wide-probe
        batches degrade to ~1 s/batch with no error. Narrow probes and
        single-query latency stay under any sane budget; batch serving at
        wide probes must either shrink ``ann_nprobe``, switch the lists to
        int8/int4 packing (dense einsums — the measured wide-probe answer),
        or explicitly raise ``ann_max_batch_lookups``.
        """
        if (
            self.ann != "ivf"
            or self.quantize_corpus != "pq"
            or self.ann_max_batch_lookups <= 0
        ):
            return
        codes = c.ivf_arrays[2]  # packed_img: [nlist, cap, M] uint8 PQ codes
        cap, m = int(codes.shape[1]), int(codes.shape[2])
        est = float(batch) * c.nprobe * cap * m
        if est > self.ann_max_batch_lookups:
            est_ms = est / self._ADC_LOOKUPS_PER_S * 1e3
            raise ValueError(
                f"IVF-PQ wide-probe batch refused: ~{est:.2g} ADC lookups "
                f"(batch={batch} x nprobe={c.nprobe} x cap={cap} x m={m}) "
                f"~= {est_ms:.0f} ms/batch on TPU (scalarized gather) vs the "
                f"ann_max_batch_lookups budget of {self.ann_max_batch_lookups:.2g} "
                f"(~{self.ann_max_batch_lookups / self._ADC_LOOKUPS_PER_S * 1e3:.0f} ms). "
                "Options: lower ann_nprobe or the batch size, use "
                "quantize_corpus='int8'/'int4' with ann='ivf' (dense-einsum "
                "probes — the fast wide-probe tier), or raise "
                "ann_max_batch_lookups to accept the latency."
            )

    def _search_state(
        self, c: _CorpusState, queries: Sequence[str], alpha: float, top_k: Optional[int]
    ):
        k = min(top_k or c.top_k, c.n_real)
        k_fetch = self._k_fetch(c, k)
        ids = self._tokenize(queries)
        self._check_pq_probe_cost(c, len(queries))
        cimg = c.ivf_arrays if self.ann == "ivf" else c.corpus_img
        return self._search_program(
            self._enc_params, jnp.asarray(ids), cimg, c.corpus_txt,
            c.corpus_img_scale, c.corpus_txt_scale,
            alpha_column(alpha, len(queries)), self._rot,
            k=k_fetch, nprobe=c.nprobe,
        )

    def _k_fetch(self, c: _CorpusState, k: int) -> int:
        """Fetch width for a top-``k`` request against corpus state ``c``.

        Pad rows score exactly 0 (zero vectors), which would displace
        negative-scoring real matches from the top-k; over-fetch past the
        pads so after sentinel filtering k REAL winners always survive.
        The slack is the bucket's MAXIMUM pad count (not the current one):
        k_fetch must stay constant across same-bucket updates or every
        add/remove would change the program's static k -> full recompile,
        defeating capacity_multiple (minutes per compile on the relay).
        """
        if self.rerank:
            # over-fetch candidates for the host rerank; clamp to real rows
            # via len(store) below (stable within a capacity bucket)
            k = k * self.rerank_factor
        if self.ann == "ivf":
            return min(k, c.n_real) if self.rerank else k  # no pad rows
        max_pads = self._pad_multiple() - 1
        return min(k + max_pads, len(c.store))

    # -- warmup (TPU-native extension) -------------------------------------------

    def warmup(
        self,
        batch_sizes: Sequence[int],
        *,
        alpha: float = 0.5,
        top_k: Optional[int] = None,
        seq_buckets: Optional[Sequence[int]] = None,
        image: bool = False,
    ) -> int:
        """Precompile the search program for the given shape buckets.

        On a jit backend the FIRST request of every (batch-bucket,
        seq-bucket, k) signature pays a full compile — minutes on the relay
        chip — so a production daemon should warm the buckets its traffic
        will hit before accepting connections. ``batch_sizes`` should
        mirror the MicroBatcher's power-of-two buckets; ``top_k`` must
        match the production value (static in the compiled program), while
        ``alpha`` is a runtime operand — any blend reuses the warmed
        program. ``image=True`` additionally warms the image-query program
        per batch size. Returns the number of programs executed.
        """
        c = self._corpus
        k = min(top_k or c.top_k, c.n_real)
        ctx = self.model.arch.context_length
        buckets = sorted({b for b in (seq_buckets or _WARMUP_BUCKETS) if b <= ctx}) or [ctx]
        cimg = c.ivf_arrays if self.ann == "ivf" else c.corpus_img
        count = 0
        for b in batch_sizes:
            if b < 1:
                raise ValueError(f"warmup batch size must be >= 1, got {b}")
            for s in buckets:
                ids = np.ones((int(b), int(s)), np.int32)
                out = self._search_program(
                    self._enc_params, jnp.asarray(ids), cimg, c.corpus_txt,
                    c.corpus_img_scale, c.corpus_txt_scale,
                    alpha_column(alpha, int(b)), self._rot,
                    k=self._k_fetch(c, k), nprobe=c.nprobe,
                )
                jax.block_until_ready(out)
                count += 1
            if image:
                size = self.model.arch.image_resolution
                pixels = np.zeros((int(b), size, size, 3), np.float32)
                out = self._search_state_emb(c, self.encode_images(pixels), alpha, top_k)
                jax.block_until_ready(out)
                count += 1
        return count

    # -- IVF auto-calibration (TPU-native extension) -----------------------------

    def calibrate_nprobe(
        self,
        queries: Optional[Sequence[str]] = None,
        q_emb=None,
        *,
        target_recall: float = 0.95,
        k: Optional[int] = None,
        alpha: float = 0.5,
        sample: int = 256,
        seed: int = 0,
        apply: bool = True,
    ) -> dict:
        """Auto-tune the IVF probe width to a recall target (ann mode only).

        Sweeps doubling nprobe values, measuring recall@k on a calibration
        query set against the exact f32 ranking (host towers are the ground
        truth). Queries come from, in priority order: ``q_emb`` ([Q, D]
        embeddings), ``queries`` (encoded on device), or ``sample`` corpus
        text rows (the store's own distribution — the right default when no
        query log exists yet). ``apply=True`` swaps the chosen width into
        the live corpus state atomically (searches at a new nprobe compile
        their program on first use). Returns the
        :func:`retrieval.ann.calibrate_nprobe` report plus the applied width.
        """
        if self.ann != "ivf":
            raise ValueError("calibrate_nprobe needs ann='ivf'")
        from .ann import calibrate_nprobe as _calibrate

        c = self._corpus
        if q_emb is None:
            if queries is not None:
                q_emb = np.asarray(self.encode_queries(queries), np.float32)
            else:
                rng = np.random.default_rng(seed)
                rows = rng.choice(c.n_real, size=min(sample, c.n_real), replace=False)
                q_emb = np.asarray(c.store.text[rows], np.float32)
        k = min(k or c.top_k, c.n_real)

        def search_fn(q, kk, nprobe):
            # the retriever's own compiled program (sharded-aware); one
            # compile per distinct nprobe, cached for later serving
            return self._search_program_emb(
                jnp.asarray(q), c.ivf_arrays, c.corpus_txt,
                c.corpus_img_scale, c.corpus_txt_scale,
                alpha_column(alpha, q.shape[0]), None, k=kk, nprobe=nprobe,
            )

        index_view = self._index_view(c)
        result = _calibrate(
            index_view, q_emb, c.store.image[: c.n_real], c.store.text[: c.n_real],
            k=k, alpha=alpha, target_recall=target_recall, search_fn=search_fn,
        )
        if apply and result["nprobe"] != c.nprobe:
            import dataclasses as _dc

            self.ann_nprobe = result["nprobe"]  # future rebuilds inherit it
            # atomic swap; a concurrent _install_corpus may race, in which
            # case the new corpus was calibrated-for anyway (same policy:
            # clamp to its nlist)
            self._corpus = _dc.replace(c, nprobe=min(result["nprobe"], index_view.nlist))
        return result

    def _index_view(self, c: _CorpusState) -> IVFIndex:
        """The corpus state's IVF arrays as an :class:`IVFIndex` (ann mode)."""
        ci, ct, pi, pt, pr, si, st, cbi, cbt = c.ivf_arrays
        return IVFIndex(ci, ct, pi, pt, pr, c.ann_spill_fraction, si, st, cbi, cbt)

    # -- host-side exact rerank (TPU-native extension) ---------------------------

    def _rerank_host(
        self, c: _CorpusState, q, vals, idx, alpha
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Exactly rescore the fetched candidates against the f32 host corpus.

        ``q`` [Q, D] query embeddings, ``idx`` [Q, R] candidate rows (−1 =
        ann sentinel). The store's f32 rows are authoritative: packed-corpus
        rounding (int8/int4) and bf16 score rounding disappear from the
        final ordering. Pad rows are zero vectors (score 0), filtered
        downstream by uuid exactly like the device path.
        """
        from ..ops.similarity import rerank_scores_host

        return rerank_scores_host(q, c.store.image, c.store.text, idx, alpha)

    def _finish_results(
        self, c: _CorpusState, out, alpha, k: int, q_emb=None
    ) -> List[List[Dict]]:
        """Device program output -> per-query result dicts (rerank-aware)."""
        if self.rerank:
            if q_emb is None:
                vals, idx, q = out
            else:
                (vals, idx), q = out, q_emb
            vals, idx = self._rerank_host(c, q, vals, idx, alpha)
        else:
            vals, idx = out
        return self.results_from_topk(
            np.asarray(vals, np.float32), np.asarray(idx), _state=c, top_k=k
        )

    # -- image / embedding queries (TPU-native extension) -----------------------
    # The reference serves text queries only (``src/retrieval.py:79``), but
    # the precomputed corpus supports visual search for free: encode an image
    # through the vision tower and blend it against both corpus towers with
    # the SAME score program (the blend is linear in the query embedding).
    # ``alpha=1.0`` is pure image-to-image search; intermediate values mix in
    # the text tower. Embedding-direct search also serves cached or
    # externally computed query vectors.

    def _build_image_encoder(self):
        from ..models.fast_encode import encode_image_fast, make_vision_plan

        if self.use_fused_encoder:
            enc_params = make_vision_plan(
                self.params, dtype=self.model.dtype, quantize=self.quantize
            )
            fn = lambda p, px: l2_normalize(encode_image_fast(self.model.arch, p, px))
        else:
            enc_params = self.params
            fn = lambda p, px: l2_normalize(
                self.model.apply({"params": p}, px, method=CLIP.encode_image)
            )
        if self.shard_queries:
            # mesh-replicated placement so the encoded queries feed the
            # query-DP score program without a device-set mismatch
            enc_params = jax.device_put(enc_params, self.rt.replicated_sharding())
        return jax.jit(fn), enc_params

    def encode_images(self, pixels) -> jax.Array:
        """Preprocessed pixel batch [B, S, S, 3] -> L2-normalized [B, D].

        Uses the same encoder tier as text queries (flax / fused bf16 / W8A8
        int8); the vision plan is built lazily on the first image query so
        text-only deployments pay nothing.
        """
        if self._encode_image is None:
            self._encode_image = self._build_image_encoder()
        fn, enc_params = self._encode_image
        return fn(enc_params, jnp.asarray(pixels))

    def preprocess_images(self, images) -> np.ndarray:
        """Decode + preprocess a heterogeneous image batch to [B, S, S, 3].

        Accepts PIL images, encoded bytes, file paths, raw HWC uint8 arrays
        — or already-preprocessed float32 [S, S, 3] arrays, passed through
        unchanged.
        """
        from ..data.preprocess import preprocess_pil

        size = self.model.arch.image_resolution
        out = []
        for im in images:
            if (
                isinstance(im, np.ndarray)
                and im.dtype == np.float32
                and im.shape == (size, size, 3)
            ):
                out.append(im)
            else:
                out.append(preprocess_pil(im, size=size))
        return np.stack(out)

    def encode_documents(
        self, images: Sequence, texts: Sequence[str]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Encode raw documents into store-ready rows: ``(image_emb,
        text_emb)`` L2-normalized f32 ``[n, D]``.

        The image rows ride the vision tower exactly like
        :func:`build_embedding_store`'s precompute; the text rows encode the
        document's ``target_text`` through the same text tower queries use.
        Feed straight into :meth:`add_documents` — live ingest of raw
        artifacts without an offline precompute pass.
        """
        if len(images) != len(texts):
            raise ValueError(f"{len(images)} images vs {len(texts)} texts")
        n = len(images)
        if n == 0:
            raise ValueError("no documents")
        # bucket the batch to the next power of two (echoing the last row):
        # on a jit backend every DISTINCT ingest size would otherwise be a
        # fresh minutes-long remote compile (the same rule the MicroBatcher
        # applies to query batches)
        bucket = 1 << (n - 1).bit_length()
        pixels = self.preprocess_images(images)
        pad = bucket - n
        if pad:
            pixels = np.concatenate([pixels, np.repeat(pixels[-1:], pad, axis=0)])
            texts = list(texts) + [texts[-1]] * pad
        img = np.asarray(self.encode_images(pixels), np.float32)[:n]
        txt = np.asarray(self.encode_queries(list(texts)), np.float32)[:n]
        return img, txt

    def search_embeddings_batch(
        self, q_emb, alpha: float = 0.5, top_k: Optional[int] = None
    ):
        """Batched search from L2-normalized [Q, D] query embeddings —
        the embedding-direct twin of :meth:`search_batch` (same over-fetch
        semantics; filter via :meth:`results_from_topk`)."""
        return self._search_state_emb(self._corpus, q_emb, alpha, top_k)

    def _search_state_emb(
        self, c: _CorpusState, q_emb, alpha: float, top_k: Optional[int]
    ):
        k = min(top_k or c.top_k, c.n_real)
        cimg = c.ivf_arrays if self.ann == "ivf" else c.corpus_img
        q_emb = jnp.asarray(q_emb)
        self._check_pq_probe_cost(c, int(q_emb.shape[0]))
        if self.shard_queries:
            # externally supplied embeddings may be committed to one device;
            # replicate so the mesh-wide program accepts them
            q_emb = jax.device_put(q_emb, self.rt.replicated_sharding())
        return self._search_program_emb(
            q_emb, cimg, c.corpus_txt,
            c.corpus_img_scale, c.corpus_txt_scale,
            alpha_column(alpha, q_emb.shape[0]), self._rot,
            k=self._k_fetch(c, k), nprobe=c.nprobe,
        )

    def retrieval_embeddings_batch(
        self, q_emb, alpha: float = 0.5, top_k: Optional[int] = None
    ) -> List[List[Dict]]:
        """Embedding-direct search -> one ``[{"uuid", "score"}]`` per query."""
        c = self._corpus  # one snapshot: search and uuid mapping stay aligned
        k = min(top_k or c.top_k, c.n_real)
        out = self._search_state_emb(c, q_emb, alpha, top_k)
        return self._finish_results(
            c, out, alpha, k, q_emb=np.asarray(q_emb, np.float32)
        )

    def retrieval_image_batch(
        self, images: Sequence, alpha: float = 0.5, top_k: Optional[int] = None
    ) -> List[List[Dict]]:
        """Visual search: a batch of images -> ranked corpus matches each.

        ``images`` as accepted by :meth:`preprocess_images`. ``alpha``
        blends the image-embedding similarity against the corpus image
        tower (T2I-analog) vs text tower: 1.0 = pure image-to-image.
        """
        q = self.encode_images(self.preprocess_images(images))
        return self.retrieval_embeddings_batch(q, alpha=alpha, top_k=top_k)

    def retrieval_image(
        self, image, alpha: float = 0.5, top_k: Optional[int] = None
    ) -> List[Dict]:
        """Single-image visual search -> ``[{"uuid", "score"}]`` descending."""
        return self.retrieval_image_batch([image], alpha=alpha, top_k=top_k)[0]

    def search_batches_pipelined(
        self,
        query_batches: Iterable[Sequence[str]],
        alpha: float = 0.5,
        top_k: Optional[int] = None,
        depth: int = 4,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Stream batches keeping up to ``depth`` device programs in flight.

        While batch i's [Q, k] winners are fetched (the expensive part on a
        tunneled chip), later batches are already tokenized and dispatched —
        steady-state throughput approaches max(device, host) instead of
        their sum. Yields ``(values, indices)`` numpy pairs in order.
        """
        from collections import deque

        pending: deque = deque()
        for queries in query_batches:
            pending.append(self.search_batch(queries, alpha=alpha, top_k=top_k))
            if len(pending) >= max(1, depth):
                vals, idx = pending.popleft()[:2]
                yield np.asarray(vals), np.asarray(idx)
        while pending:
            vals, idx = pending.popleft()[:2]
            yield np.asarray(vals), np.asarray(idx)

    def retrieval_batches(
        self,
        query_batches: Iterable[Sequence[str]],
        alpha: float = 0.5,
        top_k: Optional[int] = None,
        depth: int = 4,
    ) -> Iterator[List[List[Dict]]]:
        """Streamed :meth:`retrieval_batch`: pipelined dispatch, one result
        list per query, in order.

        Each batch's winners map through the SAME corpus snapshot its search
        ran on, so results stay uuid-correct under concurrent
        :meth:`add_documents`/:meth:`remove_documents`, and each list
        truncates to the requested ``top_k`` after pad filtering.
        """
        from collections import deque

        pending: deque = deque()

        def dispatch(queries):
            c = self._corpus
            k = min(top_k or c.top_k, c.n_real)
            return c, k, self._search_state(c, queries, alpha, top_k)

        def finish(item):
            c, k, out = item
            return self._finish_results(c, out, alpha, k)

        for queries in query_batches:
            pending.append(dispatch(queries))
            if len(pending) >= max(1, depth):
                yield finish(pending.popleft())
        while pending:
            yield finish(pending.popleft())

    # -- filtered search (TPU-native extension) ----------------------------------
    # The reference has no hard filters — its only constraint mechanism is
    # the post-hoc SPARQL score bonus (``src/retrieval.py:23-76``).
    # Production retrieval needs them (tenant visibility, metadata
    # predicates, knowledge-constrained search): the bool row mask is a
    # runtime operand of a dedicated compiled program, so changing the
    # filter re-executes — never re-compiles. Pad rows are always masked, so
    # the filtered path needs no pad over-fetch.

    def _mask_from_uuids(
        self,
        c: _CorpusState,
        allow_uuids: Optional[Iterable[str]],
        deny_uuids: Optional[Iterable[str]],
    ) -> np.ndarray:
        """Bool row mask over the padded store (pads always False).

        Unknown uuids in either list are ignored — a filter is a predicate
        over the corpus, not a membership assertion (retired documents may
        legitimately linger in caller-side ACLs).
        """
        if allow_uuids is None and deny_uuids is None:
            raise ValueError("filtered search needs allow_uuids and/or deny_uuids")
        uuids = c.store.uuids
        if allow_uuids is not None:
            allowed = set(allow_uuids)
            mask = np.fromiter((u in allowed for u in uuids), bool, len(uuids))
        else:
            mask = np.fromiter(
                (not u.startswith("__pad_") for u in uuids), bool, len(uuids)
            )
        if deny_uuids is not None:
            denied = set(deny_uuids)
            if denied:
                mask &= np.fromiter((u not in denied for u in uuids), bool, len(uuids))
        return mask

    def _k_fetch_masked(self, c: _CorpusState, k: int) -> int:
        # pads are masked out (never displace winners); only rerank over-fetches
        return min(k * self.rerank_factor, len(c.store)) if self.rerank else k

    def search_filtered_batch(
        self,
        queries: Sequence[str],
        allow_uuids: Optional[Iterable[str]] = None,
        deny_uuids: Optional[Iterable[str]] = None,
        alpha: float = 0.5,
        top_k: Optional[int] = None,
    ):
        """Batched search restricted by uuid allow/deny lists (raw winners).

        Returns the same device-future tuple as :meth:`search_batch`;
        filtered-out slots carry the ``-1`` index sentinel when fewer than k
        rows are eligible. Requires an exact corpus scan (``ann='ivf'``
        probes clusters and cannot honor arbitrary row predicates — use
        :meth:`retrieval_candidates_batch` for small per-query allow-lists
        in ann mode).
        """
        c = self._corpus
        return self._search_filtered_state(c, queries, allow_uuids, deny_uuids, alpha, top_k)

    def _search_filtered_state(
        self, c: _CorpusState, queries, allow_uuids, deny_uuids, alpha, top_k
    ):
        if self.ann == "ivf":
            raise ValueError(
                "filtered search needs an exact corpus scan (ann='ivf' probes "
                "clusters); use retrieval_candidates_batch for allow-lists in ann mode"
            )
        k = min(top_k or c.top_k, c.n_real)
        mask = self._mask_from_uuids(c, allow_uuids, deny_uuids)
        ids = self._tokenize(queries)
        return self._search_program_masked(
            self._enc_params, jnp.asarray(ids), c.corpus_img, c.corpus_txt,
            c.corpus_img_scale, c.corpus_txt_scale,
            alpha_column(alpha, len(queries)), jnp.asarray(mask), self._rot,
            k=self._k_fetch_masked(c, k),
        )

    def retrieval_filtered_batch(
        self,
        queries: Sequence[str],
        allow_uuids: Optional[Iterable[str]] = None,
        deny_uuids: Optional[Iterable[str]] = None,
        alpha: float = 0.5,
        top_k: Optional[int] = None,
    ) -> List[List[Dict]]:
        """Filtered batched search -> one ``[{"uuid", "score"}]`` per query.

        Only rows passing the filter can appear; queries with fewer than
        ``top_k`` eligible rows return shorter lists. Composes with every
        exact corpus mode (bf16/f32, int8, int4, mesh-sharded) and with
        ``rerank=True``.
        """
        c = self._corpus
        k = min(top_k or c.top_k, c.n_real)
        out = self._search_filtered_state(c, queries, allow_uuids, deny_uuids, alpha, top_k)
        return self._finish_results(c, out, alpha, k)

    def retrieval_filtered(
        self,
        query: str,
        allow_uuids: Optional[Iterable[str]] = None,
        deny_uuids: Optional[Iterable[str]] = None,
        alpha: float = 0.5,
        top_k: Optional[int] = None,
    ) -> List[Dict]:
        """Single-query filtered search -> ``[{"uuid", "score"}]`` descending."""
        return self.retrieval_filtered_batch(
            [query], allow_uuids, deny_uuids, alpha=alpha, top_k=top_k
        )[0]

    def retrieval_filtered_embeddings_batch(
        self,
        q_emb,
        allow_uuids: Optional[Iterable[str]] = None,
        deny_uuids: Optional[Iterable[str]] = None,
        alpha: float = 0.5,
        top_k: Optional[int] = None,
    ) -> List[List[Dict]]:
        """Filtered embedding-direct search (image queries route here via
        :meth:`encode_images`)."""
        c = self._corpus
        if self.ann == "ivf":
            raise ValueError(
                "filtered search needs an exact corpus scan (ann='ivf' probes clusters)"
            )
        k = min(top_k or c.top_k, c.n_real)
        mask = self._mask_from_uuids(c, allow_uuids, deny_uuids)
        q_emb = jnp.asarray(q_emb)
        if self.shard_queries:
            # externally supplied embeddings may be committed to one device;
            # replicate so the mesh-wide program accepts them (mirrors
            # _search_state_emb)
            q_emb = jax.device_put(q_emb, self.rt.replicated_sharding())
        out = self._search_program_masked_emb(
            q_emb, c.corpus_img, c.corpus_txt,
            c.corpus_img_scale, c.corpus_txt_scale,
            alpha_column(alpha, q_emb.shape[0]), jnp.asarray(mask), self._rot,
            k=self._k_fetch_masked(c, k),
        )
        return self._finish_results(
            c, out, alpha, k, q_emb=np.asarray(q_emb, np.float32)
        )

    def retrieval_candidates_batch(
        self,
        queries: Sequence[str],
        candidates: Sequence[Sequence[str]],
        alpha: float = 0.5,
        top_k: Optional[int] = None,
    ) -> List[List[Dict]]:
        """Exact scoring restricted to per-query candidate uuid lists.

        The knowledge-constrained serving mode: score query i against ONLY
        ``candidates[i]`` (e.g. its Text2SPARQL hits). Queries encode on
        device as one program; the scoring itself runs on the host f32
        store via the shared rerank kernel (:func:`ops.similarity.
        rerank_scores_host`) — candidate sets are small (tens of uuids), so
        a device round trip per distinct set shape would cost more than the
        arithmetic, and the host path works in EVERY corpus mode including
        ``ann='ivf'``. Unknown uuids are ignored; scores are exact f32
        (no packing rounding). Returns one descending ``[{"uuid",
        "score"}]`` per query.
        """
        from ..ops.similarity import rerank_scores_host

        if len(queries) != len(candidates):
            raise ValueError(f"{len(queries)} queries vs {len(candidates)} candidate lists")
        c = self._corpus
        k = min(top_k or c.top_k, c.n_real)
        row_of = {u: i for i, u in enumerate(c.store.uuids[: c.n_real])}
        width = max(1, max((len(cd) for cd in candidates), default=1))
        idx = np.full((len(queries), width), -1, np.int64)
        for qi, cand in enumerate(candidates):
            rows = [row_of[u] for u in dict.fromkeys(cand) if u in row_of]
            idx[qi, : len(rows)] = rows
        q = np.asarray(self.encode_queries(queries), np.float32)
        vals, idx = rerank_scores_host(q, c.store.image, c.store.text, idx, alpha)
        return self.results_from_topk(
            np.asarray(vals, np.float32), idx, _state=c, top_k=k
        )

    # -- learned-fusion serving (TPU-native extension) ----------------------------
    # The reference trains 6 fusion heads but never serves them (its serving
    # path is the fixed linear blend, ``src/retrieval.py:79``); this closes
    # the loop: stage-1 blended top-(factor*k) candidate fetch on device,
    # stage-2 rescoring with a TRAINED head over the candidates' exact f32
    # store rows. Works in every corpus mode (packed, sharded, ivf) — the
    # head sees exact embeddings regardless of how stage-1 packed them.

    def retrieval_fused_batch(
        self,
        queries: Sequence[str],
        fusion,
        fusion_params,
        alpha: float = 0.5,
        top_k: Optional[int] = None,
        factor: int = 4,
    ) -> List[List[Dict]]:
        """Two-tier learned-fusion search -> ``[{"uuid", "score"}]`` lists.

        ``fusion``: a :class:`models.fusion_heads.FusionModel`;
        ``fusion_params``: trained head params
        (:func:`train.fusion_trainer.train_fusion_head` output). ``alpha``
        steers only the stage-1 candidate fetch; the head defines the final
        scores. ``factor * top_k`` candidates are fetched per query — with
        ``factor*k >= corpus``, the result is the head's exact full-corpus
        ranking.
        """
        c = self._corpus
        k = min(top_k or c.top_k, c.n_real)
        fetch = min(factor * k, c.n_real)
        q = self.encode_queries(queries)
        out = self._search_state_emb(c, q, alpha, fetch)
        vals, idx = (out[0], out[1]) if self.rerank else out
        idx = np.asarray(idx)
        q_np = np.asarray(q, np.float32)
        safe = np.maximum(idx, 0)
        img = np.asarray(c.store.image[safe], np.float32)  # [Q, R, D] exact rows
        tgt = np.asarray(c.store.text[safe], np.float32)
        scores = np.asarray(
            fusion.candidate_scores(fusion_params, q_np, img, tgt), np.float32
        )
        # sentinels (-1) and pad rows (>= n_real, zero vectors) never rank
        scores = np.where((idx >= 0) & (idx < c.n_real), scores, -np.inf)
        order = np.argsort(-scores, axis=1, kind="stable")
        return self.results_from_topk(
            np.take_along_axis(scores, order, 1),
            np.take_along_axis(idx, order, 1),
            _state=c, top_k=k,
        )

    def retrieval_fused(
        self, query: str, fusion, fusion_params, alpha: float = 0.5,
        top_k: Optional[int] = None, factor: int = 4,
    ) -> List[Dict]:
        """Single-query learned-fusion search."""
        return self.retrieval_fused_batch(
            [query], fusion, fusion_params, alpha=alpha, top_k=top_k, factor=factor
        )[0]

    # -- reference-parity API --------------------------------------------------

    def results_from_topk(
        self,
        vals: np.ndarray,
        idx: np.ndarray,
        _state: Optional[_CorpusState] = None,
        top_k: Optional[int] = None,
    ) -> List[List[Dict]]:
        """[Q, k] winners -> per-query ``[{"uuid", "score"}]`` lists.

        Maps row indices through the current corpus; callers that interleave
        searches with :meth:`add_documents`/:meth:`remove_documents` should
        prefer :meth:`retrieval_batch`, which maps through the same corpus
        snapshot the search ran on. ``top_k`` truncates each filtered list
        (search over-fetches when the corpus carries pad rows).
        """
        uuids = (_state or self._corpus).store.uuids
        results: List[List[Dict]] = []
        for row_vals, row_idx in zip(vals, idx):
            out = []
            for v, i in zip(row_vals.tolist(), row_idx.tolist()):
                if i < 0:  # ann sentinel: fewer than k probed candidates
                    continue
                uuid = uuids[i]
                if uuid.startswith("__pad_"):
                    continue
                out.append({"uuid": uuid, "score": v})
                if top_k is not None and len(out) >= top_k:
                    break
            results.append(out)
        return results

    def retrieval_batch(
        self, queries: Sequence[str], alpha: float = 0.5, top_k: Optional[int] = None
    ) -> List[List[Dict]]:
        """Batched search -> one ``[{"uuid", "score"}]`` list per query.

        The whole batch rides a single device program (encode + fused
        blend + top-k); only the [Q, k] winners come back to the host.
        """
        c = self._corpus  # one snapshot: search and uuid mapping stay aligned
        k = min(top_k or c.top_k, c.n_real)
        out = self._search_state(c, queries, alpha, top_k)
        return self._finish_results(c, out, alpha, k)

    def retrieval(self, query: str, alpha: float = 0.5, top_k: Optional[int] = None) -> List[Dict]:
        """Single-query search -> ``[{"uuid", "score"}]`` sorted descending
        (reference ``clip_retrieval.py:39-40`` / retriever ``search``)."""
        return self.retrieval_batch([query], alpha=alpha, top_k=top_k)[0]
