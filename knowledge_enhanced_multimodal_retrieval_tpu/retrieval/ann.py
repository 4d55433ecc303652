"""IVF approximate-nearest-neighbor index: sublinear corpus probing.

The reference scores every query against the FULL corpus (the downloaded
retriever's cosine scan, ``src/clip/clip_retrieval.py:26-37``) — exact, and
the right call at 43k rows where one fused brute-force pass costs ~1.4 ms
(``ops/similarity``). This module is the framework's scaling path past
brute force: at 10M+ rows, or for low-batch/low-latency serving, an
inverted-file (IVF) index probes only the most promising clusters.

TPU-native design — static shapes end to end:

- **Spherical k-means on device**: Lloyd iterations are two matmuls per
  step (assign = argmax of ``x @ c.T`` on the MXU, update = one-hot-matmul
  segment sum) inside one ``lax.fori_loop``; centroids re-normalize each
  iteration (inner-product geometry, embeddings are L2-normalized).
- **Cluster-major packed storage with fixed capacity**: every cluster owns
  ``cap`` padded rows (``[nlist, cap, D]``), so probing is a static-shape
  ``jnp.take`` + batched einsum — no ragged gathers, no data-dependent
  shapes, nothing XLA cannot tile. Rows that overflow a full cluster spill
  to their next-best cluster at build time (host-side greedy; total
  capacity is sized so every row is indexed exactly once).
- **Two-tower blend folds into the probe**: the serving score is
  ``α·(q·img) + (1−α)·(q·txt)`` (``retrieval/clip_retrieval.py``), which is
  linear in the corpus rows — so clustering runs in the CONCATENATED
  ``[img ; txt]`` space and one index serves every runtime ``α``.
- **One jitted search program**: centroid scores → top-``nprobe`` →
  gather packed clusters → blended scores → masked top-k, matching
  ``fused_similarity_topk`` semantics on the probed subset.

Accuracy contract: ``nprobe == nlist`` degrades to exact brute force
(pinned in ``tests/test_ann.py``); recall-vs-exact is measured there on
clustered synthetic data. Probing ``p`` of ``nlist`` clusters reads ~``p/
nlist`` of the corpus per query — the win over brute force appears when
``batch × probed fraction < 1`` (single-query serving, huge corpora).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_SUBLANE = 8  # f32 sublane multiple for the packed cap axis


def _maxmin_init(x: jax.Array, nlist: int, key: jax.Array) -> jax.Array:
    """Farthest-point (greedy k-means++-style) seeding on device.

    Start from one random row; each next seed is the row with the LOWEST
    max cosine similarity to the chosen set — coverage-first seeding that
    avoids dropping several seeds into one dense blob (random choice does,
    and Lloyd rarely recovers: the blob splits while a distant cluster goes
    unseeded, hurting IVF recall-per-probe). One ``x @ c`` per step on the
    MXU: O(nlist * N * D) total, trivial at index-build time.
    """
    n, d = x.shape
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-9)
    first = jax.random.randint(key, (), 0, n)
    cent = jnp.zeros((nlist, d), jnp.float32).at[0].set(xn[first])
    max_sim = xn @ xn[first]

    def step(i, carry):
        cent, max_sim = carry
        nxt = jnp.argmin(max_sim)
        c = xn[nxt]
        return cent.at[i].set(c), jnp.maximum(max_sim, xn @ c)

    cent, _ = jax.lax.fori_loop(1, nlist, step, (cent, max_sim))
    return cent


def kmeans_spherical(
    x: jax.Array, nlist: int, iters: int = 10, seed: int = 0, init: str = "maxmin"
) -> jax.Array:
    """Spherical k-means: returns L2-normalized centroids ``[nlist, D]``.

    ``x`` ``[N, D]`` (rows need not be normalized; centroids are). Empty
    clusters keep their previous centroid. ``init``: ``"maxmin"``
    (farthest-point seeding, the default — see :func:`_maxmin_init`) or
    ``"random"`` (uniform row sample).
    """
    n = x.shape[0]
    if nlist > n:
        raise ValueError(f"nlist {nlist} > rows {n}")
    if init not in ("maxmin", "random"):
        raise ValueError(f"unknown init {init!r}: expected 'maxmin' or 'random'")
    x = jnp.asarray(x, jnp.float32)
    key = jax.random.PRNGKey(seed)
    if init == "maxmin":
        init = _maxmin_init(x, nlist, key)
    else:
        init = x[jax.random.choice(key, n, (nlist,), replace=False)]
        init = init / jnp.maximum(jnp.linalg.norm(init, axis=1, keepdims=True), 1e-9)

    def step(_, c):
        assign = jnp.argmax(x @ c.T, axis=1)  # [N]
        onehot = jax.nn.one_hot(assign, nlist, dtype=jnp.float32)  # [N, nlist]
        sums = onehot.T @ x  # [nlist, D]
        counts = onehot.sum(0)[:, None]
        c_new = jnp.where(counts > 0, sums, c)
        return c_new / jnp.maximum(jnp.linalg.norm(c_new, axis=1, keepdims=True), 1e-9)

    return jax.lax.fori_loop(0, iters, step, init)


def _pack_with_spill(pref: np.ndarray, nlist: int, cap: int) -> np.ndarray:
    """Greedy cluster packing, vectorized by preference round.

    ``pref`` [N, nlist] = cluster ids sorted best-first per row. Round ``j``
    lets every still-unassigned row claim a free slot in its ``j``-th-choice
    cluster (earlier rows win ties within a round); leftovers spill to round
    ``j+1``. Row-by-row Python was O(N * nlist) interpreted work — hours at
    10M rows; this is a handful of O(m log m) numpy rounds (few rounds
    suffice in practice: most rows land on their first choice).
    Returns ``packed_rows`` [nlist, cap] int32 with -1 padding; every row
    indexed exactly once while total capacity >= N (same contract as the
    scalar loop; only inter-round tie order differs).
    """
    n = pref.shape[0]
    if nlist * cap < n:
        raise ValueError(f"capacity {nlist}x{cap} < rows {n}")
    packed = np.full((nlist, cap), -1, np.int64)
    fill = np.zeros(nlist, np.int64)
    unassigned = np.arange(n)
    for j in range(nlist):
        if unassigned.size == 0:
            break
        choice = pref[unassigned, j]  # j-th choice of each leftover row
        order = np.argsort(choice, kind="stable")  # groups rows by cluster,
        rows = unassigned[order]  # preserving row order within a cluster
        choice = choice[order]
        # rank of each row within its cluster's claimants this round
        first = np.searchsorted(choice, choice, side="left")
        rank = np.arange(rows.size) - first
        free = cap - fill[choice]
        take = rank < free
        c_taken, r_taken = choice[take], rows[take]
        packed[c_taken, fill[c_taken] + rank[take]] = r_taken
        fill += np.bincount(c_taken, minlength=nlist)
        unassigned = rows[~take]
    if unassigned.size:  # pragma: no cover — impossible while capacity >= n
        raise RuntimeError("no free slot found")
    return packed.astype(np.int32)


@dataclasses.dataclass
class IVFIndex:
    """Packed two-tower IVF index (all arrays device-resident).

    With ``packed_*_scale`` set (and no codebooks), ``packed_img``/
    ``packed_txt`` hold symmetric per-row int8 (same rounding as
    ``ops.similarity.quantize_corpus``) and the probe dequantizes by applying
    the gathered per-row scales to the score columns — the index HBM
    footprint (and probe traffic) halves. A last axis of ``D/2`` instead of
    ``D`` marks nibble-packed int4 (same plane layout as
    ``ops.similarity.quantize_corpus_host_q4`` — the FAISS ``IVFSQ4`` rung):
    quarter footprint, the probe unpacks the two planes in registers.

    With ``cb_img``/``cb_txt`` set (IVF-PQ, the FAISS ``IndexIVFPQ`` shape),
    ``packed_img``/``packed_txt`` hold uint8 PQ codes ``[nlist, cap, M]``
    (directions; ``ops.pq.pq_encode_host``) and ``packed_*_scale`` the
    per-row norms — ~30x f32 capacity AND sublinear probing, scores via
    per-query ADC lookup tables on the probed rows only.
    """

    centroids_img: jax.Array  # [nlist, D] f32
    centroids_txt: jax.Array  # [nlist, D] f32
    packed_img: jax.Array  # [nlist, cap, D] (f32/bf16/int8) or [nlist, cap, M] uint8 codes
    packed_txt: jax.Array  # [nlist, cap, D] / [nlist, cap, M]
    packed_rows: jax.Array  # [nlist, cap] int32, -1 = empty slot
    spill_fraction: float  # diagnostic: rows not in their best cluster
    packed_img_scale: Optional[jax.Array] = None  # [nlist, cap] f32 per-row scales
    packed_txt_scale: Optional[jax.Array] = None
    cb_img: Optional[jax.Array] = None  # [M, K, ds] f32 PQ codebooks (pq mode)
    cb_txt: Optional[jax.Array] = None

    @property
    def nlist(self) -> int:
        return self.packed_rows.shape[0]

    @property
    def cap(self) -> int:
        return self.packed_rows.shape[1]

    @property
    def is_pq(self) -> bool:
        return self.cb_img is not None

    @property
    def is_int4(self) -> bool:
        """Nibble-packed int4 tiles: the packed last axis is D/2 (scales set,
        no codebooks). Shape-based so save/load needs no schema change."""
        return (
            self.packed_img_scale is not None
            and self.cb_img is None
            and self.packed_img.shape[-1] * 2 == self.centroids_img.shape[-1]
        )

    @property
    def quantized(self) -> bool:
        """int8-packed tiles (per-row scales, NO codebooks, full-width)."""
        return (
            self.packed_img_scale is not None
            and self.cb_img is None
            and not self.is_int4
        )

    @property
    def mode(self) -> str:
        if self.is_pq:
            return "pq"
        if self.is_int4:
            return "int4"
        return "int8" if self.quantized else "exact"


def build_ivf_index(
    image: np.ndarray,
    text: np.ndarray,
    nlist: int,
    *,
    capacity_factor: float = 1.5,
    iters: int = 10,
    seed: int = 0,
    dtype=jnp.float32,
    quantize: Optional[str] = None,
    train_rows: Optional[int] = None,
    mesh=None,
    shard_axis: str = "data",
    kmeans_init: str = "maxmin",
    pq_m: Optional[int] = None,
) -> IVFIndex:
    """Cluster the corpus and pack it cluster-major.

    ``image``/``text`` ``[N, D]`` L2-normalized tower embeddings (as in
    :class:`EmbeddingStore`). Clustering runs on the concatenated
    ``[img ; txt]`` rows so the index is valid for every blend ``α``;
    ``capacity_factor`` sizes each cluster at ``factor · N / nlist`` slots
    (sublane-rounded) — larger means fewer spills, more padding FLOPs.

    ``quantize="int8"`` packs symmetric per-row int8 + scales (half the
    index memory/probe traffic; same rounding as the exact int8 corpus).
    ``quantize="int4"`` packs nibble-paired int4 + scales (QUARTER the
    footprint — the FAISS ``IVFSQ4`` rung between int8 and pq; same plane
    layout and rounding as the flat int4 corpus,
    ``ops.similarity.quantize_corpus_host_q4``; ``D`` must be even).
    ``quantize="pq"`` packs uint8 product-quantization codes + per-row
    norms (IVF-PQ — ~30x capacity and sublinear probing; per-tower
    codebooks train on the corpus, ``pq_m`` subspaces, default D/8; same
    encoder as the flat PQ corpus, ``ops.pq.pq_encode_host``).
    ``train_rows`` subsamples k-means training (assignment still covers
    every row) — standard practice when the full corpus is too big to
    stage on one device in f32. ``mesh`` shards the index over the
    ``shard_axis`` cluster dimension (``nlist`` must divide by the axis
    size); pair with :func:`sharded_ivf_search`.
    """
    n, d = image.shape
    if text.shape != image.shape:
        raise ValueError(f"tower shape mismatch: {image.shape} vs {text.shape}")
    if quantize not in (None, "int8", "int4", "pq"):
        raise ValueError(f"unknown quantize mode {quantize!r}")
    if mesh is not None and nlist % mesh.shape[shard_axis] != 0:
        raise ValueError(
            f"nlist {nlist} must divide by mesh axis {shard_axis!r}={mesh.shape[shard_axis]}"
        )
    img_np, txt_np = np.asarray(image, np.float32), np.asarray(text, np.float32)
    xc_np = np.concatenate([img_np, txt_np], axis=1)
    if train_rows is not None and train_rows < n:
        train = xc_np[np.random.default_rng(seed).choice(n, train_rows, replace=False)]
    else:
        train = xc_np
    cent = kmeans_spherical(jnp.asarray(train), nlist, iters=iters, seed=seed, init=kmeans_init)

    # host-side packing: per-row cluster preference (best-first), greedy spill
    scores = xc_np @ np.asarray(cent).T  # [N, nlist]
    pref = np.argsort(-scores, axis=1)
    cap = int(np.ceil(capacity_factor * n / nlist))
    cap = max(_SUBLANE, -(-cap // _SUBLANE) * _SUBLANE)
    while nlist * cap < n:
        cap += _SUBLANE
    packed_rows = _pack_with_spill(pref, nlist, cap)
    best = pref[:, 0]
    row_cluster = np.empty(n, np.int64)
    for c in range(nlist):
        members = packed_rows[c][packed_rows[c] >= 0]
        row_cluster[members] = c
    spill_fraction = float(np.mean(row_cluster != best)) if n else 0.0

    gather = np.where(packed_rows >= 0, packed_rows, 0)
    zero_mask = (packed_rows < 0)[..., None]
    img_scale = txt_scale = None
    cb_i = cb_t = None
    if quantize == "pq":
        # IVF-PQ with RESIDUAL encoding (FAISS ``by_residual`` — the reason
        # IVFPQ beats flat PQ at equal code budget): the coarse centroid
        # absorbs the cluster structure and the codes only model the small
        # residual ``x − c(owning cluster)``, so 256 centroids per subspace
        # spend their capacity on local detail instead of re-describing the
        # global layout. Scoring adds the centroid dot back:
        # ``q·x ≈ q·c + scale·Σ_m LUT[m, codes[m]]`` — the ``q·c`` term is
        # the probe's centroid score, already computed, so residual is a
        # FREE quality edge. Measured vs flat PQ at equal code budget
        # ([20k, 256] m=32, real chip): recall@10 0.32 → 0.39 on clustered
        # data, parity on isotropic data; compose rerank=True when the
        # corpus is near-duplicate-heavy (ties resolve below any code
        # resolution). Residuals pack with the SAME
        # norm+direction encoder as the flat PQ tier
        # (``ops.pq.pq_encode_host``); empty slots pack to scale 0 and the
        # row-sentinel mask kills their centroid term.
        from ..ops.pq import pq_encode_host, train_pq_codebooks

        m = pq_m or max(1, d // 8)
        cent_np = np.asarray(cent)
        half_i, half_t = cent_np[:, :d], cent_np[:, d:]
        # per-slot residual w.r.t. the OWNING (packed) cluster — spilled
        # rows encode against the cluster that actually serves them
        res_i = np.where(zero_mask, 0.0, img_np[gather] - half_i[:, None, :])
        res_t = np.where(zero_mask, 0.0, txt_np[gather] - half_t[:, None, :])
        live = (packed_rows >= 0).ravel()
        cb_i = train_pq_codebooks(res_i.reshape(-1, d)[live], m=m)
        cb_t = train_pq_codebooks(res_t.reshape(-1, d)[live], m=m)
        img_c, img_s = pq_encode_host(res_i.reshape(-1, d), cb_i)
        txt_c, txt_s = pq_encode_host(res_t.reshape(-1, d), cb_t)
        packed_img = img_c.reshape(nlist, cap, m)
        packed_txt = txt_c.reshape(nlist, cap, m)
        img_scale = np.where(packed_rows < 0, 0.0, img_s[:, 0].reshape(nlist, cap))
        txt_scale = np.where(packed_rows < 0, 0.0, txt_s[:, 0].reshape(nlist, cap))
        img_scale = img_scale.astype(np.float32)
        txt_scale = txt_scale.astype(np.float32)
        pack_dtype = jnp.uint8
    elif quantize in ("int8", "int4"):
        # the SAME quantizers as the exact int8/int4 corpus paths, so the
        # packed representation matches them bit for bit (pinned in
        # tests/test_ann.py). int4 nibble-pairs dims (j, j + D/2) into one
        # byte — a zero byte unpacks to two zero nibbles, so empty slots
        # mask identically to the int8 case.
        from ..ops.similarity import quantize_corpus_host, quantize_corpus_host_q4

        quant_fn = quantize_corpus_host if quantize == "int8" else quantize_corpus_host_q4

        def qpack(x):
            q, s = quant_fn(x)
            return np.asarray(q), np.asarray(s, np.float32)[:, 0]

        img_q, img_s = qpack(img_np)
        txt_q, txt_s = qpack(txt_np)
        packed_img = np.where(zero_mask, np.int8(0), img_q[gather])
        packed_txt = np.where(zero_mask, np.int8(0), txt_q[gather])
        img_scale = np.where(packed_rows < 0, 0.0, img_s[gather]).astype(np.float32)
        txt_scale = np.where(packed_rows < 0, 0.0, txt_s[gather]).astype(np.float32)
        pack_dtype = jnp.int8
    else:
        packed_img = np.where(zero_mask, 0.0, img_np[gather])
        packed_txt = np.where(zero_mask, 0.0, txt_np[gather])
        pack_dtype = dtype

    cent = np.asarray(cent)
    half = cent[:, :d], cent[:, d:]
    put = _cluster_put(mesh, shard_axis)
    return IVFIndex(
        centroids_img=put(jnp.asarray(half[0])),
        centroids_txt=put(jnp.asarray(half[1])),
        packed_img=put(jnp.asarray(packed_img, pack_dtype)),
        packed_txt=put(jnp.asarray(packed_txt, pack_dtype)),
        packed_rows=put(jnp.asarray(packed_rows)),
        spill_fraction=spill_fraction,
        packed_img_scale=None if img_scale is None else put(jnp.asarray(img_scale)),
        packed_txt_scale=None if txt_scale is None else put(jnp.asarray(txt_scale)),
        # KB-sized codebooks replicate (never shard) — every device decodes
        cb_img=None if cb_i is None else jnp.asarray(cb_i),
        cb_txt=None if cb_t is None else jnp.asarray(cb_t),
    )


def _cluster_put(mesh, axis: str):
    """device_put sharded on the leading (cluster) dim, or identity."""
    if mesh is None:
        return lambda x: x
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return put


def ivf_search(
    queries: jax.Array,
    index: IVFIndex,
    *,
    k: int,
    nprobe: int,
    alpha=0.5,
) -> Tuple[jax.Array, jax.Array]:
    """Probe the top-``nprobe`` clusters; return ``(values, row_ids)``.

    Semantics of ``ops.similarity.similarity_topk_xla`` restricted to the
    probed rows: scores are ``α·(q·img) + (1−α)·(q·txt)``, descending;
    ``row_ids`` are original corpus rows (−1 where fewer than ``k`` valid
    candidates were probed). ``alpha`` is a runtime operand (scalar or
    per-query); wrap in ``jax.jit`` with static ``k``/``nprobe``.
    """
    from ..ops.similarity import alpha_column

    nlist = index.nlist
    if not 1 <= nprobe <= nlist:
        raise ValueError(f"nprobe {nprobe} out of range [1, {nlist}]")
    a = alpha_column(alpha, queries.shape[0])  # [B, 1] f32
    compute_dtype = (
        index.packed_img.dtype if index.mode == "exact" else queries.dtype
    )
    q = queries.astype(compute_dtype)
    cs_i = (q @ index.centroids_img.T.astype(q.dtype)).astype(jnp.float32)
    cs_t = (q @ index.centroids_txt.T.astype(q.dtype)).astype(jnp.float32)
    cs = a * cs_i + (1.0 - a) * cs_t
    _, probe = jax.lax.top_k(cs.astype(jnp.float32), nprobe)  # [B, nprobe]

    rows = jnp.take(index.packed_rows, probe, axis=0)  # [B, nprobe, cap]
    if index.is_pq:
        # IVF-PQ residual ADC: codes model ``x − c(owning cluster)`` (see
        # build_ivf_index), so the slot score is the probed cluster's
        # centroid dot (already in cs_i/cs_t) plus the residual LUT walk.
        # LUTs are bf16 with f32 accumulation in subspace order — one LUT
        # value gathered per code is exactly one one-hot MXU product, the
        # same rounding as ops.pq.blended_scores_pq_adc (the test oracle).
        # The walk is a [B, P] vectorized gather per subspace. REGIME NOTE:
        # XLA scalarizes varying-index gathers on TPU (~1e8 lookups/s), so
        # the walk costs ~B*P*m lookups per batch — fast for the designed
        # regime (narrow probes / low-batch latency; P = nprobe*cap <<
        # corpus), but at batch 256 with wide probes it dominates (measured
        # ~1 s at B=256, P=1920, m=96). For wide-probe batch serving use
        # int8/int4 lists (dense einsums over the gathered rows).
        from ..ops.pq import pq_luts

        b = queries.shape[0]
        p_rows = nprobe * index.cap
        qf = q.astype(jnp.float32)

        def adc(packed_codes, cb, scale, cs_tower):
            lut = pq_luts(qf, cb)  # [M, Q, K] bf16
            codes = jnp.take(packed_codes, probe, axis=0)  # [B, nprobe, cap, M]
            c = codes.reshape(b, p_rows, -1).astype(jnp.int32)
            m = lut.shape[0]

            def body(mm, acc):
                lut_m = jax.lax.dynamic_index_in_dim(
                    lut, mm, 0, keepdims=False
                ).astype(jnp.float32)  # [Q, K]
                return acc + jnp.take_along_axis(lut_m, c[:, :, mm], axis=1)

            acc = jax.lax.fori_loop(0, m, body, jnp.zeros((b, p_rows), jnp.float32))
            s = jnp.take(scale, probe, axis=0).reshape(b, p_rows)
            # + q·c of the probed cluster, broadcast over its cap slots
            coarse = jnp.take_along_axis(cs_tower, probe, axis=1)  # [B, nprobe]
            return (acc * s).reshape(b, nprobe, index.cap) + coarse[:, :, None]

        s_img = adc(index.packed_img, index.cb_img, index.packed_img_scale, cs_i)
        s_txt = adc(index.packed_txt, index.cb_txt, index.packed_txt_scale, cs_t)
        a3 = a[:, :, None]
        s = a3 * s_img + (1.0 - a3) * s_txt
    elif index.is_int4:
        # int4 tiles: gather the packed [B, nprobe, cap, D/2] bytes, unpack
        # the two nibble planes in registers (exact int->float casts), and
        # split the query the same way: q·row == q_lo·lo + q_hi·hi — the
        # same plane math as the flat int4 corpus
        # (ops.similarity.blended_scores_q4); per-row scales fold into the
        # score columns post-matmul.
        from ..ops.similarity import _unpack_q4

        d2 = index.packed_img.shape[-1]
        q_lo, q_hi = q[:, :d2], q[:, d2:]
        si = jnp.take(index.packed_img_scale, probe, axis=0)  # [B, nprobe, cap]
        st = jnp.take(index.packed_txt_scale, probe, axis=0)

        def q4_scores(packed, q_lo, q_hi):
            p = jnp.take(packed, probe, axis=0)  # [B, nprobe, cap, D/2] bytes
            lo, hi = _unpack_q4(p, q.dtype)
            return (
                jnp.einsum("bd,bpcd->bpc", q_lo, lo)
                + jnp.einsum("bd,bpcd->bpc", q_hi, hi)
            ).astype(jnp.float32)

        s_img = q4_scores(index.packed_img, q_lo, q_hi) * si
        s_txt = q4_scores(index.packed_txt, q_lo, q_hi) * st
        a3 = a[:, :, None]
        s = a3 * s_img + (1.0 - a3) * s_txt
    elif index.quantized:
        pi = jnp.take(index.packed_img, probe, axis=0)  # [B, nprobe, cap, D]
        pt = jnp.take(index.packed_txt, probe, axis=0)
        # int8 tiles: the int8->f dtype cast is exact; per-row scales fold
        # into the score columns post-matmul (same math as the exact int8
        # corpus path in ops.similarity.blended_scores_q8)
        si = jnp.take(index.packed_img_scale, probe, axis=0)  # [B, nprobe, cap]
        st = jnp.take(index.packed_txt_scale, probe, axis=0)
        s_img = jnp.einsum("bd,bpcd->bpc", q, pi.astype(q.dtype)).astype(jnp.float32) * si
        s_txt = jnp.einsum("bd,bpcd->bpc", q, pt.astype(q.dtype)).astype(jnp.float32) * st
        a3 = a[:, :, None]  # [B, 1, 1] broadcast over (probe, cap)
        s = a3 * s_img + (1.0 - a3) * s_txt
    else:
        pi = jnp.take(index.packed_img, probe, axis=0)  # [B, nprobe, cap, D]
        pt = jnp.take(index.packed_txt, probe, axis=0)
        a3 = a[:, :, None].astype(pi.dtype) if pi.dtype != jnp.float32 else a[:, :, None]
        s = a3 * jnp.einsum("bd,bpcd->bpc", q, pi) + (1.0 - a3) * jnp.einsum(
            "bd,bpcd->bpc", q, pt
        )
    s = jnp.where(rows >= 0, s.astype(jnp.float32), -jnp.inf)
    b = queries.shape[0]
    flat_s = s.reshape(b, -1)
    flat_rows = rows.reshape(b, -1)
    kk = min(k, flat_s.shape[1])
    vals, pos = jax.lax.top_k(flat_s, kk)
    ids = jnp.take_along_axis(flat_rows, pos, axis=1)
    ids = jnp.where(jnp.isfinite(vals), ids, -1)
    if kk < k:  # pad to the requested k (tiny-index edge)
        vals = jnp.pad(vals, ((0, 0), (0, k - kk)), constant_values=-jnp.inf)
        ids = jnp.pad(ids, ((0, 0), (0, k - kk)), constant_values=-1)
    return vals, ids


def sharded_ivf_search(
    queries: jax.Array,
    index: IVFIndex,
    *,
    k: int,
    nprobe: int,
    mesh,
    alpha: float = 0.5,
    axis: str = "data",
) -> Tuple[jax.Array, jax.Array]:
    """IVF probe over an index cluster-sharded on ``axis`` of ``mesh``.

    TPU-native scaling shape (mirrors ``sharded_similarity_topk``): each
    device keeps ``nlist/n`` clusters resident, probes its local best
    ``ceil(nprobe/n)`` of them (queries replicated, probe entirely local),
    and only the ``[Q, k]`` winners cross ICI for the final merge — probe
    traffic stays on-device and perfectly load-balanced (no straggler from
    a hot shard). The probe set is therefore the best-per-shard rather than
    the global top-``nprobe`` — a balanced approximation; ``nprobe ==
    nlist`` still probes EVERY cluster and degrades to exact brute force
    (pinned in ``tests/test_ann.py``). ``packed_rows`` hold global row ids,
    so no index localization is needed at merge.
    """
    from ..ops.similarity import alpha_column

    fn = _sharded_ivf_program(
        mesh, axis, k, nprobe, index.mode, index.nlist, index.cap
    )
    has_scales = index.packed_img_scale is not None
    si = index.packed_img_scale if has_scales else jnp.zeros((), jnp.float32)
    st = index.packed_txt_scale if has_scales else jnp.zeros((), jnp.float32)
    cbi = index.cb_img if index.is_pq else jnp.zeros((), jnp.float32)
    cbt = index.cb_txt if index.is_pq else jnp.zeros((), jnp.float32)
    return fn(
        queries, alpha_column(alpha, queries.shape[0]),
        index.centroids_img, index.centroids_txt,
        index.packed_img, index.packed_txt, index.packed_rows, si, st, cbi, cbt,
    )


@functools.lru_cache(maxsize=128)
def _sharded_ivf_program(mesh, axis, k, nprobe, mode, nlist, cap):
    """The jitted shard_map program, cached per static signature so repeat
    callers retrace/recompile only on genuinely new shapes (a Mesh is
    hashable; a fresh jit wrapper per call would never hit the jit cache)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    has_scales = mode in ("int8", "int4", "pq")
    is_pq = mode == "pq"
    n_shards = mesh.shape[axis]
    nlist_local = nlist // n_shards
    nprobe_local = min(-(-nprobe // n_shards), nlist_local)
    k_local = min(k, nlist_local * cap)
    spec3 = P(axis, None, None)
    spec2 = P(axis, None)

    def local(q, a, ci, ct, pi, pt, pr, si, st, cbi, cbt):
        li = IVFIndex(
            centroids_img=ci, centroids_txt=ct, packed_img=pi, packed_txt=pt,
            packed_rows=pr, spill_fraction=0.0,
            # without scales/codebooks, the operands ride as scalar-zero
            # placeholders (a pytree None would change the arg structure)
            packed_img_scale=si if has_scales else None,
            packed_txt_scale=st if has_scales else None,
            cb_img=cbi if is_pq else None,
            cb_txt=cbt if is_pq else None,
        )
        vals, ids = ivf_search(q, li, k=k_local, nprobe=nprobe_local, alpha=a)
        all_vals = jax.lax.all_gather(vals, axis)  # [n_shards, Q, k_local]
        all_ids = jax.lax.all_gather(ids, axis)
        b = q.shape[0]
        flat_v = jnp.transpose(all_vals, (1, 0, 2)).reshape(b, -1)
        flat_i = jnp.transpose(all_ids, (1, 0, 2)).reshape(b, -1)
        kk = min(k, flat_v.shape[1])
        best_v, pos = jax.lax.top_k(flat_v, kk)
        best_i = jnp.take_along_axis(flat_i, pos, axis=1)
        best_i = jnp.where(jnp.isfinite(best_v), best_i, -1)
        if kk < k:
            best_v = jnp.pad(best_v, ((0, 0), (0, k - kk)), constant_values=-jnp.inf)
            best_i = jnp.pad(best_i, ((0, 0), (0, k - kk)), constant_values=-1)
        return best_v, best_i

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), spec2, spec2, spec3, spec3, spec2,
                  spec2 if has_scales else P(), spec2 if has_scales else P(),
                  P(), P()),  # codebooks (or placeholders) replicate
        out_specs=(P(), P()),
        check_vma=False,  # replicated after all_gather+top_k; see sharded_similarity_topk
    )
    return jax.jit(fn)


def corpus_fingerprint(image, text) -> str:
    """Content fingerprint binding an index to ITS corpus.

    Shapes + float64 PER-ROW SUMS (every element contributes, so changing
    any row — including ones a strided sample would skip — changes the
    fingerprint) + a strided raw-byte sample (guards sum-preserving edits).
    One streaming pass over data the index build reads anyway; never hashes
    gigabytes through sha1 directly."""
    import hashlib

    h = hashlib.sha1()
    for arr in (image, text):
        arr = np.ascontiguousarray(np.asarray(arr, np.float32))
        h.update(str(arr.shape).encode())
        h.update(arr.sum(axis=1, dtype=np.float64).tobytes())
        stride = max(1, arr.shape[0] // 64)
        h.update(arr[::stride].tobytes())
    return h.hexdigest()


def save_ivf_index(path: str, index: IVFIndex, fingerprint: Optional[str] = None) -> None:
    """Persist a built index as one ``.npz`` (clustering + packing are the
    expensive build steps at scale; a serving restart should reload, not
    rebuild). Sharded indices save from host copies; reload with ``mesh=``
    to re-place. ``fingerprint`` (from :func:`corpus_fingerprint`) lets
    :func:`load_ivf_index` refuse an index built for a different corpus."""
    if not str(path).endswith(".npz"):
        # np.savez appends ".npz" to bare paths, which would desync the
        # cache's existence check from the file actually written
        raise ValueError(f"index path must end with .npz, got {path!r}")
    arrays = {}
    if fingerprint is not None:
        arrays["fingerprint"] = np.frombuffer(fingerprint.encode(), np.uint8)
    arrays |= {
        "centroids_img": np.asarray(index.centroids_img),
        "centroids_txt": np.asarray(index.centroids_txt),
        "packed_img": np.asarray(index.packed_img),
        "packed_txt": np.asarray(index.packed_txt),
        "packed_rows": np.asarray(index.packed_rows),
        "spill_fraction": np.float32(index.spill_fraction),
    }
    if index.packed_img_scale is not None:
        arrays["packed_img_scale"] = np.asarray(index.packed_img_scale)
        arrays["packed_txt_scale"] = np.asarray(index.packed_txt_scale)
    if index.is_pq:
        arrays["cb_img"] = np.asarray(index.cb_img)
        arrays["cb_txt"] = np.asarray(index.cb_txt)
    # atomic: temp file + rename, so a kill mid-save never leaves a
    # truncated cache that crashes the next startup
    import os
    import tempfile

    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_ivf_index(
    path: str,
    mesh=None,
    shard_axis: str = "data",
    expected_fingerprint: Optional[str] = None,
) -> IVFIndex:
    """Load a :func:`save_ivf_index` artifact; ``mesh`` re-places it
    cluster-sharded over ``shard_axis`` (``nlist`` must divide the axis).
    ``expected_fingerprint`` rejects an index built for a different corpus
    (or saved without one)."""
    with np.load(path) as data:
        if expected_fingerprint is not None:
            got = (
                bytes(data["fingerprint"]).decode() if "fingerprint" in data else None
            )
            if got != expected_fingerprint:
                raise ValueError(
                    f"index fingerprint mismatch for {path!r}: the index was "
                    "built for a different corpus (rebuild it)"
                )
        if mesh is not None and data["packed_rows"].shape[0] % mesh.shape[shard_axis]:
            raise ValueError(
                f"nlist {data['packed_rows'].shape[0]} must divide by mesh "
                f"axis {shard_axis!r}={mesh.shape[shard_axis]}"
            )
        put = _cluster_put(mesh, shard_axis)
        scaled = "packed_img_scale" in data
        is_pq = "cb_img" in data
        return IVFIndex(
            centroids_img=put(jnp.asarray(data["centroids_img"])),
            centroids_txt=put(jnp.asarray(data["centroids_txt"])),
            packed_img=put(jnp.asarray(data["packed_img"])),
            packed_txt=put(jnp.asarray(data["packed_txt"])),
            packed_rows=put(jnp.asarray(data["packed_rows"])),
            spill_fraction=float(data["spill_fraction"]),
            packed_img_scale=put(jnp.asarray(data["packed_img_scale"])) if scaled else None,
            packed_txt_scale=put(jnp.asarray(data["packed_txt_scale"])) if scaled else None,
            cb_img=jnp.asarray(data["cb_img"]) if is_pq else None,  # replicated
            cb_txt=jnp.asarray(data["cb_txt"]) if is_pq else None,
        )


def calibrate_nprobe(
    index: IVFIndex,
    queries,
    image,
    text,
    *,
    k: int = 10,
    alpha: float = 0.5,
    target_recall: float = 0.95,
    search_fn=None,
) -> dict:
    """Auto-tune the probe width: the smallest ``nprobe`` whose recall@k
    against the exact f32 ranking meets ``target_recall``.

    The reference exposes no ANN at all (every query is a full scan); FAISS
    users hand-tune nprobe per dataset. This sweeps doubling probe widths
    (1, 2, 4, ... nlist) on a calibration query sample, measuring recall@k
    against the exact blended ranking computed on the host f32 towers, and
    stops at the first width that meets the target (recall is monotone in
    nprobe up to tie-breaking noise). Returns
    ``{"nprobe", "achieved", "report": [{"nprobe", "recall"}, ...]}`` —
    ``nprobe`` falls back to ``nlist`` (exact probe) when even a full sweep
    misses the target, so the result is always servable.

    ``queries`` [Q, D] L2-normalized query embeddings; ``image``/``text``
    [N, D] host f32 rows (the ground truth). ``search_fn(q, k, nprobe)``
    overrides the probe implementation (e.g. a retriever's compiled
    program); the default jits :func:`ivf_search` with the index arrays
    passed as arguments (never jit constants — relay rule).
    """
    import functools

    q = np.asarray(queries, np.float32)
    image = np.asarray(image, np.float32)
    text = np.asarray(text, np.float32)
    n = image.shape[0]
    k = min(k, n)
    s = alpha * q @ image.T + (1.0 - alpha) * q @ text.T
    exact = np.argpartition(-s, kth=k - 1, axis=1)[:, :k]  # order-free: recall is a set metric

    if search_fn is None:

        @functools.partial(jax.jit, static_argnames=("k", "nprobe"))
        def _run(qq, ci, ct, pi, pt, pr, si, st, cbi, cbt, *, k, nprobe):
            idx = IVFIndex(ci, ct, pi, pt, pr, 0.0, si, st, cbi, cbt)
            return ivf_search(qq, idx, k=k, nprobe=nprobe, alpha=alpha)

        def search_fn(qq, kk, nprobe):
            return _run(
                jnp.asarray(qq), index.centroids_img, index.centroids_txt,
                index.packed_img, index.packed_txt, index.packed_rows,
                index.packed_img_scale, index.packed_txt_scale,
                index.cb_img, index.cb_txt,
                k=kk, nprobe=nprobe,
            )

    sweep = []
    p = 1
    while True:
        sweep.append(min(p, index.nlist))
        if sweep[-1] >= index.nlist:
            break
        p *= 2

    exact_sets = [set(row.tolist()) for row in exact]
    report = []
    chosen = None
    for nprobe in sweep:
        _, ids = search_fn(q, k, nprobe)
        ids = np.asarray(ids)
        hits = sum(
            len(exact_sets[i] & set(r[r >= 0].tolist())) for i, r in enumerate(ids)
        )
        recall = hits / (len(exact_sets) * k) if exact_sets else 1.0
        report.append({"nprobe": int(nprobe), "recall": float(recall)})
        if recall >= target_recall:
            chosen = int(nprobe)
            break
    if chosen is None:
        chosen = index.nlist  # exact probe: always meets any target
    return {"nprobe": chosen, "achieved": report[-1]["recall"], "report": report}


def probed_fraction(index: IVFIndex, nprobe: int, n_rows: Optional[int] = None) -> float:
    """Fraction of the (padded) corpus one query reads — the ANN speedup
    lever: HBM traffic per query scales with this instead of 1.0."""
    total = index.nlist * index.cap if n_rows is None else n_rows
    return min(1.0, nprobe * index.cap / max(1, total))
