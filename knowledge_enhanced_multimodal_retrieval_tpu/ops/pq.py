"""Product-quantized corpus: codebook codes + decode-and-matmul scan.

The capacity tier between int4 and the binary sketch on the packing ladder
(f32 -> int8 2x -> int4 4x -> **pq ~30x** -> binary 32x): each embedding row
splits into ``M`` subvectors and every subvector is replaced by the index of
its nearest centroid in a 256-entry per-subspace codebook (classic product
quantization, Jegou et al. 2011). A 768-dim f32 row (3072 B) becomes
``M`` uint8 codes + one f32 row scale (M=96 default: 100 B) — binary-sketch
footprint, but scores are approximate INNER PRODUCTS (serveable like int4),
not Hamming proxies, and measured recall is far higher than sign bits.

TPU-native scoring is **decode-and-matmul**, not the classic LUT/ADC walk:
per corpus chunk, gather the centroid rows out of the (tiny, VMEM-resident)
codebooks — one embedding-style row gather — reconstruct ``[chunk, D]``, and
run the full-width MXU dot against the query block. Same FLOPs as the exact
scan (the fused top-k at product shapes is compute/merge-bound, not
HBM-bound — CLAUDE.md int4 measurements), but corpus HBM traffic and
capacity improve ~30x, and the arithmetic is exactly the oracle's
``q @ recon.T`` so tests can pin it bit-for-bit.

Per-row scales make capacity-pad rows exact: a zero row packs to
``scale = 0`` and scores exactly 0 like every other tier (codes are
irrelevant), and real rows keep their norm outside the codebook so the
codebooks only ever model DIRECTIONS.

No reference counterpart (the reference's corpus lives as f32 numpy,
``src/clip/clip_retrieval.py:26-37`` / SURVEY §2.2); composes with the
seeded random rotation (``rotate=True``) exactly like int4/int8 — rotation
spreads energy across subspaces, the OPQ-lite trick.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .similarity import (
    _merge_shard_winners,
    _merge_topk,
    _segmented_topk_from_scores,
    alpha_column,
    normalize_mask,
)

_NEG_INF = float(jnp.finfo(jnp.float32).min)

# corpus rows reconstructed per scoring step: bounds the decoded [chunk, D]
# intermediate (4096 x 768 bf16 = 6 MB) while keeping the MXU dot wide
_DECODE_CHUNK = 4096


def train_pq_codebooks(
    rows,
    m: int,
    k: int = 256,
    iters: int = 12,
    seed: int = 0,
    train_rows: int = 8192,
) -> np.ndarray:
    """Host k-means per subspace: ``[N, D] -> codebooks [M, K, ds]`` f32.

    Rows are treated as DIRECTIONS (callers pass L2-normalized embeddings;
    zero rows are dropped from training). Each of the ``m`` subspaces of
    width ``ds = D/m`` gets an independent ``k``-centroid Lloyd fit on (a
    ``train_rows`` subsample of) the corpus — per-subspace problems are tiny
    ([train_rows, ds] with ds ~ 8), so host BLAS handles production corpora
    in seconds. Deterministic per seed. ``k`` clamps to the available
    training rows and must stay <= 256 (codes are uint8).
    """
    rows = np.asarray(rows, np.float32)
    n, d = rows.shape
    if d % m:
        raise ValueError(f"pq subspaces m={m} must divide the embedding dim {d}")
    if k > 256:
        raise ValueError(f"pq codebook size k={k} exceeds uint8 codes (max 256)")
    live = rows[np.linalg.norm(rows, axis=1) > 0]
    if live.shape[0] == 0:
        raise ValueError("cannot train pq codebooks on an all-zero corpus")
    rng = np.random.default_rng(np.uint64(seed) + 0x9C)
    if live.shape[0] > train_rows:
        live = live[rng.choice(live.shape[0], train_rows, replace=False)]
    k = min(k, live.shape[0])
    ds = d // m
    sub = live.reshape(live.shape[0], m, ds)  # [N, M, ds]
    codebooks = np.empty((m, k, ds), np.float32)
    for j in range(m):
        x = sub[:, j, :]  # [N, ds]
        cent = x[rng.choice(x.shape[0], k, replace=False)].copy()
        for _ in range(iters):
            # argmin ||x - c||^2 == argmax (x.c - 0.5 ||c||^2)
            aff = x @ cent.T - 0.5 * np.sum(cent * cent, axis=1)[None, :]
            assign = np.argmax(aff, axis=1)
            onehot = np.zeros((x.shape[0], k), np.float32)
            onehot[np.arange(x.shape[0]), assign] = 1.0
            counts = onehot.sum(axis=0)  # [K]
            sums = onehot.T @ x  # [K, ds]
            empty = counts == 0
            cent = np.where(
                empty[:, None], cent, sums / np.maximum(counts, 1.0)[:, None]
            )
            if empty.any():
                # re-seed dead centroids onto random data rows
                cent[empty] = x[rng.choice(x.shape[0], int(empty.sum()))]
        codebooks[j] = cent
    return codebooks


def anisotropic_eta(t: float, dim: int) -> float:
    """The parallel/orthogonal residual weight ratio ``η`` for score-aware
    (anisotropic) quantization at score threshold ``t`` (Guo et al., ICML
    2020, "Accelerating Large-Scale Inference with Anisotropic Vector
    Quantization" — the ScaNN objective): for unit-norm datapoints and
    queries that matter above cosine ``t``, η = (d−1)·t²/(1−t²). ``t=0.2``
    is the paper's default operating point."""
    if not 0.0 < t < 1.0:
        raise ValueError(f"anisotropic threshold t must be in (0, 1), got {t}")
    return float((dim - 1) * t * t / (1.0 - t * t))


def _aniso_assign(
    dirs: np.ndarray, codebooks: np.ndarray, eta: float, passes: int,
    codes: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Coordinate-descent code assignment under the anisotropic loss.

    The score-aware loss couples subspaces through the parallel residual
    ``(r·x̂)² = (Σ_m (c_m − x_m)·x_m)²`` (``x̂`` is the unit row, so its
    ``m``-th block IS ``x_m``), so codes cannot be chosen independently per
    subspace like vanilla PQ — each pass sweeps the subspaces, re-picking
    one code with the others' parallel contribution ``ρ₋ₘ`` held fixed:

        loss_m(k) = ‖c_k − x_m‖² + (η−1)·(ρ₋ₘ + (c_k − x_m)·x_m)²

    Returns ``(codes [N, M] int32, d_cur [N, M], ρ [N])`` where ``d_cur[m]
    = (c_code − x_m)·x_m`` and ``ρ = Σ_m d_cur[m]`` (the parallel residual
    dot) — callers reuse them for the codebook update. Vectorized numpy:
    one ``[N, K]`` affinity per (pass, subspace)."""
    n, d = dirs.shape
    m_sub, k, ds = codebooks.shape
    xb = dirs.reshape(n, m_sub, ds)
    xnorm2 = np.einsum("nmd,nmd->nm", xb, xb)  # [N, M] block sq-norms
    if codes is None:
        # warm start: vanilla independent assignment (η=1 solution)
        codes = np.empty((n, m_sub), np.int32)
        for j in range(m_sub):
            aff = xb[:, j, :] @ codebooks[j].T - 0.5 * np.sum(
                codebooks[j] * codebooks[j], axis=1
            )[None, :]
            codes[:, j] = np.argmax(aff, axis=1)
    else:
        codes = codes.astype(np.int32).copy()
    d_cur = np.empty((n, m_sub), np.float32)
    for j in range(m_sub):
        d_cur[:, j] = (
            np.einsum("nd,nd->n", codebooks[j][codes[:, j]], xb[:, j, :])
            - xnorm2[:, j]
        )
    rho = d_cur.sum(axis=1)  # [N]
    rows_idx = np.arange(n)
    for _ in range(passes):
        for j in range(m_sub):
            dot = xb[:, j, :] @ codebooks[j].T  # [N, K]
            cb2 = np.sum(codebooks[j] * codebooks[j], axis=1)[None, :]
            l2 = cb2 - 2.0 * dot + xnorm2[:, j][:, None]
            dk = dot - xnorm2[:, j][:, None]  # (c − x_m)·x_m
            rho_minus = rho - d_cur[:, j]
            loss = l2 + (eta - 1.0) * np.square(rho_minus[:, None] + dk)
            new = np.argmin(loss, axis=1)
            codes[:, j] = new
            d_cur[:, j] = dk[rows_idx, new]
            rho = rho_minus + d_cur[:, j]
    return codes, d_cur, rho


def train_pq_codebooks_anisotropic(
    rows,
    m: int,
    k: int = 256,
    t: float = 0.2,
    eta: Optional[float] = None,
    iters: int = 8,
    passes: int = 2,
    seed: int = 0,
    train_rows: int = 8192,
) -> np.ndarray:
    """Score-aware PQ codebooks (ScaNN's anisotropic objective).

    Vanilla PQ minimizes reconstruction MSE, but for INNER-PRODUCT serving
    the residual component PARALLEL to the datapoint is what biases scores
    for the queries that matter (those scoring high on it); the orthogonal
    component averages out. The anisotropic loss weights parallel error
    ``η``× (``η`` from :func:`anisotropic_eta`; ``t=0.2`` default), trained
    by alternating coordinate-descent assignment (:func:`_aniso_assign`)
    with the closed-form per-centroid update — a ``ds × ds`` ridge solve:

        [|S|·I + (η−1)·Σ_S x_m x_mᵀ] c = Σ_S x_m + (η−1)·Σ_S (‖x_m‖² − ρ₋ₘ)·x_m

    Drop-in with the vanilla trainer: the returned codebooks feed the SAME
    encoders and serving kernels (ADC Pallas / XLA — only the values
    change). Encode with :func:`pq_encode_host_anisotropic` so assignment
    uses the same loss. Deterministic per seed. No reference counterpart.
    """
    rows = np.asarray(rows, np.float32)
    n, d = rows.shape
    if d % m:
        raise ValueError(f"pq subspaces m={m} must divide the embedding dim {d}")
    if k > 256:
        raise ValueError(f"pq codebook size k={k} exceeds uint8 codes (max 256)")
    if eta is None:
        eta = anisotropic_eta(t, d)
    norms = np.linalg.norm(rows, axis=1)
    live = rows[norms > 0] / norms[norms > 0][:, None]
    if live.shape[0] == 0:
        raise ValueError("cannot train pq codebooks on an all-zero corpus")
    rng = np.random.default_rng(np.uint64(seed) + 0xA9C)
    if live.shape[0] > train_rows:
        live = live[rng.choice(live.shape[0], train_rows, replace=False)]
    k = min(k, live.shape[0])
    ds = d // m
    # vanilla Lloyd warm start keeps the alternation stable
    cb = train_pq_codebooks(live, m, k=k, iters=4, seed=seed, train_rows=live.shape[0])
    xb = live.reshape(live.shape[0], m, ds)
    xnorm2 = np.einsum("nmd,nmd->nm", xb, xb)
    eye = np.eye(ds, dtype=np.float32)
    codes = None
    for _ in range(iters):
        codes, d_cur, rho = _aniso_assign(live, cb, eta, passes, codes)
        for j in range(m):
            onehot = np.zeros((live.shape[0], k), np.float32)
            onehot[np.arange(live.shape[0]), codes[:, j]] = 1.0
            counts = onehot.sum(axis=0)  # [K]
            x = xb[:, j, :]
            rho_minus = rho - d_cur[:, j]
            # optimize=True: contract (nd,ne->nde) then one [K,N]@[N,ds²]
            # BLAS matmul — the default path is orders slower at N=8192
            sxx = np.einsum("nk,nd,ne->kde", onehot, x, x, optimize=True)
            sx = onehot.T @ x  # [K, ds]
            w = xnorm2[:, j] - rho_minus  # [N]
            swx = onehot.T @ (w[:, None] * x)  # [K, ds]
            a = counts[:, None, None] * eye[None] + (eta - 1.0) * sxx
            a += 1e-6 * eye[None]  # ridge: empty/degenerate groups stay solvable
            b = sx + (eta - 1.0) * swx
            new_c = np.linalg.solve(a, b[..., None])[..., 0].astype(np.float32)
            empty = counts == 0
            if empty.any():
                new_c[empty] = x[rng.choice(x.shape[0], int(empty.sum()))]
            cb[j] = new_c
            # keep d_cur/rho consistent with the moved centroids
            d_cur[:, j] = (
                np.einsum("nd,nd->n", cb[j][codes[:, j]], x) - xnorm2[:, j]
            )
        rho = d_cur.sum(axis=1)
    return cb


def pq_encode_host_anisotropic(
    rows, codebooks: np.ndarray, t: float = 0.2, eta: Optional[float] = None,
    passes: int = 3,
) -> Tuple[np.ndarray, np.ndarray]:
    """Anisotropic-loss encode: like :func:`pq_encode_host` (codes quantize
    the row DIRECTION, ``scale = ‖row‖``, zero rows pack to scale 0) but the
    code assignment runs the coordinate-descent sweep of
    :func:`_aniso_assign` under the same η used in training — independent
    per-subspace argmin would silently optimize the wrong (MSE) objective."""
    rows = np.asarray(rows, np.float32)
    n, d = rows.shape
    m, k, ds = codebooks.shape
    if m * ds != d:
        raise ValueError(f"codebooks [{m}, {k}, {ds}] do not tile dim {d}")
    if eta is None:
        eta = anisotropic_eta(t, d)
    norms = np.linalg.norm(rows, axis=1, keepdims=True)
    dirs = rows / np.maximum(norms, 1e-12)
    codes = np.empty((n, m), np.uint8)
    for lo in range(0, n, 65536):
        hi = min(n, lo + 65536)
        c, _, _ = _aniso_assign(dirs[lo:hi], codebooks, eta, passes)
        codes[lo:hi] = c.astype(np.uint8)
    scale = norms.astype(np.float32)
    scale[norms[:, 0] == 0] = 0.0
    return codes, scale


def _pq_encode_decode_host(x: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Host encode+reconstruct ``[N, D]`` under per-subspace codebooks
    (assignment math identical to :func:`pack_pq_host`, rows taken as-is)."""
    n, d = x.shape
    m, k, ds = codebooks.shape
    sub = x.reshape(n, m, ds)
    recon = np.empty_like(x)
    half_c2 = 0.5 * np.sum(codebooks * codebooks, axis=2)  # [M, K]
    for j in range(m):
        aff = sub[:, j, :] @ codebooks[j].T - half_c2[j][None, :]
        recon[:, j * ds : (j + 1) * ds] = codebooks[j][np.argmax(aff, axis=1)]
    return recon


def train_opq_rotation(
    rows,
    m: int,
    k: int = 256,
    opq_iters: int = 10,
    kmeans_iters: int = 4,
    seed: int = 0,
    train_rows: int = 8192,
) -> np.ndarray:
    """Learn an orthonormal rotation minimizing PQ reconstruction error.

    Non-parametric OPQ (Ge et al., CVPR 2013): starting from the seeded
    random rotation, alternate (a) a short per-subspace k-means fit of the
    PQ codebooks in the rotated space with (b) the orthogonal Procrustes
    update ``R = U V^T`` from ``svd(X^T Y)``, where ``Y`` is the current
    reconstruction of the rotated rows — the rotation that best aligns the
    data with what the codebooks can express. Beats the random rotation
    exactly where PQ hurts most: correlated/anisotropic subspaces.

    ``rows`` [N, D] corpus rows (both towers stacked — serving rotates
    queries ONCE, so one R must serve both packed towers); zero rows drop
    and the rest train as DIRECTIONS, matching :func:`pack_pq_host`.
    Host-side, deterministic per seed; subsampled to ``train_rows``.
    Returns ``R [D, D]`` f32 — exact inner products are invariant, so it
    drops into the ``rotate=`` seam unchanged.
    """
    rows = np.asarray(rows, np.float32)
    norms = np.linalg.norm(rows, axis=1, keepdims=True)
    live = rows[norms[:, 0] > 0] / np.maximum(norms[norms[:, 0] > 0], 1e-12)
    if live.shape[0] == 0:
        raise ValueError("cannot train an OPQ rotation on an all-zero corpus")
    d = live.shape[1]
    if d % m:
        raise ValueError(f"pq subspaces m={m} must divide the embedding dim {d}")
    rng = np.random.default_rng(np.uint64(seed) + 0x09C)
    if live.shape[0] > train_rows:
        live = live[rng.choice(live.shape[0], train_rows, replace=False)]
    from .similarity import random_rotation

    r = random_rotation(d, seed)
    for t in range(opq_iters):
        xr = live @ r
        cb = train_pq_codebooks(
            xr, m, k=k, iters=kmeans_iters, seed=seed + t,
            train_rows=xr.shape[0],
        )
        recon = _pq_encode_decode_host(xr, cb)
        # min_R ||X R - Y||_F over orthogonal R: R = U V^T of svd(X^T Y)
        u, _, vt = np.linalg.svd(live.T @ recon, full_matrices=False)
        r = np.ascontiguousarray((u @ vt).astype(np.float32))
    return r


def pq_encode_host(rows, codebooks: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host encode ``[N, D]`` rows -> ``(codes uint8 [N, M], scale f32 [N, 1])``.

    ``recon(row) = scale * concat_m codebooks[m, codes[m]]`` where the codes
    quantize the row's DIRECTION (row / ||row||) and ``scale = ||row||``.
    Zero rows (capacity padding) pack to ``scale = 0`` — they score exactly
    0 regardless of codes, matching every other packing tier. Pure numpy so
    both the flat PQ corpus (:func:`pack_pq_host`) and the IVF-PQ packer
    (``retrieval.ann.build_ivf_index(quantize="pq")``) share one encoder.
    """
    rows = np.asarray(rows, np.float32)
    n, d = rows.shape
    m, k, ds = codebooks.shape
    if m * ds != d:
        raise ValueError(f"codebooks [{m}, {k}, {ds}] do not tile dim {d}")
    norms = np.linalg.norm(rows, axis=1, keepdims=True)  # [N, 1]
    dirs = rows / np.maximum(norms, 1e-12)
    sub = dirs.reshape(n, m, ds)
    codes = np.empty((n, m), np.uint8)
    # chunk rows so the [chunk, K] affinity stays cache-friendly
    half_c2 = 0.5 * np.sum(codebooks * codebooks, axis=2)  # [M, K]
    for lo in range(0, n, 65536):
        hi = min(n, lo + 65536)
        for j in range(m):
            aff = sub[lo:hi, j, :] @ codebooks[j].T - half_c2[j][None, :]
            codes[lo:hi, j] = np.argmax(aff, axis=1).astype(np.uint8)
    scale = norms.astype(np.float32)
    scale[norms[:, 0] == 0] = 0.0
    return codes, scale


def pack_pq_host(
    rows,
    codebooks: np.ndarray,
    mesh: Optional[Mesh] = None,
    axis: str = "data",
    aniso_t: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """:func:`pq_encode_host` + device upload (row-sharded with ``mesh``).

    ``aniso_t > 0`` assigns codes under the score-aware loss instead
    (:func:`pq_encode_host_anisotropic`) — pair with codebooks from
    :func:`train_pq_codebooks_anisotropic` at the same ``t``."""
    if aniso_t:
        codes, scale = pq_encode_host_anisotropic(rows, codebooks, t=aniso_t)
    else:
        codes, scale = pq_encode_host(rows, codebooks)
    if mesh is not None:
        sharding = NamedSharding(mesh, P(axis, None))
        return jax.device_put(codes, sharding), jax.device_put(scale, sharding)
    return jnp.asarray(codes), jnp.asarray(scale)


def decode_pq(codes: jax.Array, scale: jax.Array, codebooks: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Reconstruct ``[N, D]`` rows from codes (the scoring decode, unchunked).

    Decode happens in ``dtype`` (bf16 on the serving path — the codebook
    cast is the only rounding beyond the PQ assignment itself); the per-row
    scale applies in f32.
    """
    m, k, ds = codebooks.shape
    flat = codebooks.reshape(m * k, ds).astype(dtype)
    idx = codes.astype(jnp.int32) + (jnp.arange(m, dtype=jnp.int32) * k)[None, :]
    recon = flat[idx].reshape(codes.shape[0], m * ds)  # [N, D] gather
    return (recon.astype(jnp.float32) * scale).astype(dtype)


def _tower_scores_pq(q, codes, scale, codebooks, chunk: int) -> jax.Array:
    """``[Q, D] x (codes [N, M], scale [N, 1]) -> f32 [Q, N]``.

    Decode-and-matmul, corpus-chunked: gather centroid rows for a chunk,
    MXU dot at the query dtype with f32 accumulation, then the per-row
    scales multiply the score COLUMNS (identical op order to the q8/q4
    scans, and to :func:`decode_pq` + matmul — the oracle in tests).
    """
    qn = q.shape[0]
    n = codes.shape[0]
    m, k, ds = codebooks.shape
    flat = codebooks.reshape(m * k, ds).astype(q.dtype)
    offs = (jnp.arange(m, dtype=jnp.int32) * k)[None, :]

    def one(args):
        c, s = args  # [C, M] uint8, [C, 1] f32
        recon = flat[c.astype(jnp.int32) + offs].reshape(c.shape[0], m * ds)
        dots = jnp.dot(q, recon.T, preferred_element_type=jnp.float32)
        return dots * s.reshape(1, -1)  # [Q, C]

    if n <= chunk:
        return one((codes, scale))
    pad = (-n) % chunk
    if pad:
        codes = jnp.pad(codes, ((0, pad), (0, 0)))
        scale = jnp.pad(scale, ((0, pad), (0, 0)))  # pad scale 0 -> score 0
    n_chunks = codes.shape[0] // chunk
    scores = lax.map(
        one,
        (codes.reshape(n_chunks, chunk, m), scale.reshape(n_chunks, chunk, 1)),
    )  # [n_chunks, Q, C]
    return jnp.moveaxis(scores, 0, 1).reshape(qn, -1)[:, :n]


def blended_scores_pq(
    queries: jax.Array,
    img_codes: jax.Array,
    img_scale: jax.Array,
    txt_codes: jax.Array,
    txt_scale: jax.Array,
    cb_img: jax.Array,
    cb_txt: jax.Array,
    alpha,
    chunk: int = _DECODE_CHUNK,
) -> jax.Array:
    """[Q, N] blended scores over a product-quantized corpus."""
    a = alpha_column(alpha, queries.shape[0])
    t2i = _tower_scores_pq(queries, img_codes, img_scale, cb_img, chunk)
    t2t = _tower_scores_pq(queries, txt_codes, txt_scale, cb_txt, chunk)
    return a * t2i + (1.0 - a) * t2t


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def pq_similarity_topk_xla(
    queries: jax.Array,
    img_codes: jax.Array,
    img_scale: jax.Array,
    txt_codes: jax.Array,
    txt_scale: jax.Array,
    cb_img: jax.Array,
    cb_txt: jax.Array,
    k: int,
    alpha=0.5,
    chunk: int = _DECODE_CHUNK,
) -> Tuple[jax.Array, jax.Array]:
    """XLA blended top-k over a PQ corpus (decode-and-matmul scores).

    The CPU-serving path and the big-k fallback; gather-bound on TPU
    (measured 24.7 ms vs the ADC kernel's MXU-bound scan at product
    shapes). Codebooks are runtime OPERANDS (never jit closure constants —
    relay rule), queries are real embeddings.
    """
    n = img_codes.shape[0]
    scores = blended_scores_pq(
        queries, img_codes, img_scale, txt_codes, txt_scale, cb_img, cb_txt, alpha, chunk
    )
    return _segmented_topk_from_scores(scores, min(k, n), segment=4096)


def pq_similarity_topk(
    queries: jax.Array,
    img_codes: jax.Array,
    img_scale: jax.Array,
    txt_codes: jax.Array,
    txt_scale: jax.Array,
    cb_img: jax.Array,
    cb_txt: jax.Array,
    k: int,
    alpha=0.5,
    chunk: int = _DECODE_CHUNK,
    use_pallas: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Blended top-k over a PQ corpus, dispatched by backend and k.

    TPU: the fused ADC Pallas kernel for k <= 64 (10.05 ms vs 25.1 decode
    at product shapes; the merge's VMEM stack caps k, see _FUSED_PQ_K_CAP),
    the XLA ADC formulation + segmented top-k for
    larger k (18.2 ms vs 28.4 decode at k=512 — still MXU-bound, no
    gathers). Elsewhere: the decode-and-matmul path (host BLAS handles the
    gathers fine, and it is the bit-exact oracle of the packed math).
    """
    if use_pallas is None:
        from .dispatch import on_tpu

        use_pallas = on_tpu()
    if use_pallas and k <= _FUSED_PQ_K_CAP:
        return fused_pq_topk(
            queries, img_codes, img_scale, txt_codes, txt_scale,
            cb_img, cb_txt, k=k, alpha=alpha,
        )
    if use_pallas:
        return pq_similarity_topk_adc(
            queries, img_codes, img_scale, txt_codes, txt_scale,
            cb_img, cb_txt, k=k, alpha=alpha,
        )
    return pq_similarity_topk_xla(
        queries, img_codes, img_scale, txt_codes, txt_scale,
        cb_img, cb_txt, k, alpha, chunk,
    )


@functools.partial(jax.jit, static_argnames=("k",))
def pq_similarity_topk_adc(
    queries: jax.Array,
    img_codes: jax.Array,
    img_scale: jax.Array,
    txt_codes: jax.Array,
    txt_scale: jax.Array,
    cb_img: jax.Array,
    cb_txt: jax.Array,
    k: int,
    alpha=0.5,
) -> Tuple[jax.Array, jax.Array]:
    """Big-k TPU path: XLA ADC scores (one-hot MXU matmuls, no gathers) +
    segmented two-stage top-k. Same selection semantics as the decode path;
    scores carry the ADC bf16-LUT rounding instead of decode's bf16
    centroids (both tolerance-pinned in tests)."""
    n = img_codes.shape[0]
    scores = blended_scores_pq_adc(
        queries, img_codes, img_scale, txt_codes, txt_scale, cb_img, cb_txt, alpha
    )
    return _segmented_topk_from_scores(scores, min(k, n), segment=4096)


# ---------------------------------------------------------------------------
# ADC Pallas kernel — asymmetric distance computation as one-hot MXU matmuls
# ---------------------------------------------------------------------------
#
# The classic PQ scan walks a [M, K] lookup table per query (LUT/ADC); the
# walk is a scalar gather, which TPUs hate (the XLA decode path measured
# 24.7 ms/batch-256 at 43k x 768 — gather-bound). TPU-native formulation:
#
#   scores[q, n] = scale_n * sum_m LUT[m, q, codes[n, m]]
#                = scale_n * sum_m (LUT[m] @ onehot(codes[:, m]).T)[q, n]
#
# i.e. per subspace, one [Q, K] x [K, T] matmul whose RHS is the one-hot
# expansion of the code column — built in VMEM by an iota-compare (never
# touching HBM) and fed straight to the MXU. 16x more FLOPs than the
# decode-dot (K=256 one-hot columns vs ds=8 dense), but they are DENSE MXU
# flops with zero gathers; HBM traffic is just the codes (~100 B/row).
# The running top-k merge is the same VMEM scratch scheme as
# similarity._fused_kernel.

_PQ_TILE_N = 512

# Fused-kernel k cap on real hardware (r5): the argmax-round merge's Mosaic
# stack grows ~linearly in k and is nearly TILE-INDEPENDENT (chip-measured:
# k=40/t=512 -> 20.69 MiB, k=128/t=256 -> 52.73 MiB, k=128/t=128 ->
# 52.12 MiB — halving the tile bought almost nothing). k<=20 fits Mosaic's
# ~16 MiB default budget (the verified product shape); 20<k<=64 compiles
# under the raised 48 MiB limit (~0.5 MiB/k extrapolates to ~33 MiB at 64);
# k>64 exceeds the wide budget at any tile and routes to the XLA ADC +
# segmented top-k path (18.2 ms at k=512/43k rows — still MXU-bound).
_FUSED_PQ_K_CAP = 64


def _pq_adc_kernel(
    alpha_ref, lut_i_ref, lut_t_ref, ci_ref, ct_ref, si_ref, st_ref,
    vals_ref, idx_ref, acc_i, acc_t, vals_scr, idx_scr,
    *, k: int, tile_n: int, corpus_n: int, n_k: int, n_groups: int, group: int,
):
    j = pl.program_id(0)
    m = pl.program_id(1)
    n_tiles = pl.num_programs(0)

    @pl.when((j == 0) & (m == 0))
    def _init_run():
        vals_scr[:] = jnp.full_like(vals_scr, _NEG_INF)
        idx_scr[:] = jnp.zeros_like(idx_scr)

    @pl.when(m == 0)
    def _init_acc():
        acc_i[:] = jnp.zeros_like(acc_i)
        acc_t[:] = jnp.zeros_like(acc_t)

    iota = jax.lax.broadcasted_iota(jnp.int32, (n_k, tile_n), 0)
    dot = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # `group` subspaces per grid step (the code block's sublane dim must be
    # 8-divisible): static unroll; codes ride as int8 (uint8 values wrap
    # negative; & 0xFF recovers)
    for i in range(group):
        codes_i = ci_ref[i : i + 1, :].astype(jnp.int32) & 0xFF  # [1, T]
        oh_i = (iota == codes_i).astype(jnp.bfloat16)  # [K, T]
        acc_i[:] += dot(lut_i_ref[i], oh_i)
        codes_t = ct_ref[i : i + 1, :].astype(jnp.int32) & 0xFF
        oh_t = (iota == codes_t).astype(jnp.bfloat16)
        acc_t[:] += dot(lut_t_ref[i], oh_t)

    @pl.when(m == n_groups - 1)
    def _merge():
        a = alpha_ref[:]
        scores = a * (acc_i[:] * si_ref[:]) + (1.0 - a) * (acc_t[:] * st_ref[:])
        qn = scores.shape[0]
        local_col = jax.lax.broadcasted_iota(jnp.int32, (qn, tile_n), 1)
        global_idx = local_col + j * tile_n
        valid = (global_idx < corpus_n) & ~jnp.isnan(scores)
        scores = jnp.where(valid, scores, _NEG_INF)
        new_vals, new_idx = _merge_topk(vals_scr[:], idx_scr[:], scores, global_idx, k)
        vals_scr[:] = new_vals
        idx_scr[:] = new_idx

    @pl.when((j == n_tiles - 1) & (m == n_groups - 1))
    def _write():
        vals_ref[:] = vals_scr[:]
        idx_ref[:] = idx_scr[:]


def pq_luts(queries: jax.Array, codebooks: jax.Array) -> jax.Array:
    """``[Q, D] x [M, K, ds] -> bf16 LUT [M, Q, K]``.

    ``LUT[m, q, k] = q_sub[q, m] . cb[m, k]`` in f32, cast to bf16 (the MXU
    operand dtype — the one rounding the ADC path adds beyond PQ itself).
    Tiny: Q*M*K*ds flops, [M, Q, K] bf16 ~ 12 MB at product shapes.
    """
    m, n_k, ds = codebooks.shape
    q_sub = queries.astype(jnp.float32).reshape(queries.shape[0], m, ds)
    lut = jnp.einsum(
        "qmd,mkd->mqk", q_sub, codebooks.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return lut.astype(jnp.bfloat16)


def blended_scores_pq_adc(
    queries: jax.Array,
    img_codes: jax.Array,
    img_scale: jax.Array,
    txt_codes: jax.Array,
    txt_scale: jax.Array,
    cb_img: jax.Array,
    cb_txt: jax.Array,
    alpha,
) -> jax.Array:
    """XLA reference of the ADC kernel's exact math (the oracle in tests):
    bf16 LUT x bf16 one-hot matmuls, f32 accumulation in subspace order,
    per-row scales on the f32 score columns, then the alpha blend."""
    a = alpha_column(alpha, queries.shape[0])

    def tower(codes, scale, cb):
        lut = pq_luts(queries, cb)  # [M, Q, K]
        m, qn, n_k = lut.shape
        c = codes.astype(jnp.int32) & 0xFF  # [N, M]

        def body(mm, acc):
            oh = jax.nn.one_hot(c[:, mm], n_k, dtype=jnp.bfloat16).T  # [K, N]
            return acc + jax.lax.dot_general(
                lax.dynamic_index_in_dim(lut, mm, 0, keepdims=False), oh,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )

        acc = lax.fori_loop(
            0, m, body, jnp.zeros((qn, codes.shape[0]), jnp.float32)
        )
        return acc * scale.reshape(1, -1)

    t2i = tower(img_codes, img_scale, cb_img)
    t2t = tower(txt_codes, txt_scale, cb_txt)
    return a * t2i + (1.0 - a) * t2t


def fused_pq_topk(
    queries: jax.Array,
    img_codes: jax.Array,
    img_scale: jax.Array,
    txt_codes: jax.Array,
    txt_scale: jax.Array,
    cb_img: jax.Array,
    cb_txt: jax.Array,
    k: int,
    alpha=0.5,
    tile_n: int = _PQ_TILE_N,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused ADC scan + running top-k over a PQ corpus (k <= 64 on TPU;
    interpret mode allows up to 128).

    Selection semantics match the other fused kernels (running VMEM top-k,
    argmax-round merge); scores match :func:`blended_scores_pq_adc` exactly.
    """
    if interpret is None:
        from .dispatch import on_tpu

        interpret = not on_tpu()
    n, m = img_codes.shape
    mk, n_k, ds = cb_img.shape
    if mk != m:
        raise ValueError(f"codebooks [{mk}] do not match codes [{m}] subspaces")
    if k > 128:
        raise ValueError("fused_pq_topk caps k at 128 (argmax-round merge)")
    if not interpret and k > _FUSED_PQ_K_CAP:
        # the merge's Mosaic stack exceeds even the raised 48 MiB budget
        # past this k (chip-measured, see _FUSED_PQ_K_CAP) — refuse clearly
        # instead of a compile-time VMEM OOM; pq_similarity_topk routes
        # big k to the XLA ADC + segmented top-k path
        raise ValueError(
            f"fused_pq_topk supports k <= {_FUSED_PQ_K_CAP} on TPU "
            f"(got k={k}); use pq_similarity_topk (routes to the ADC path)"
        )
    k = min(k, n)

    lut_i = pq_luts(queries, cb_img)  # [M, Q, K] bf16
    lut_t = pq_luts(queries, cb_txt)
    qn = queries.shape[0]
    alpha_col = alpha_column(alpha, qn)

    # sublane-align the query axis (bf16 LUT blocks want 16-row multiples)
    pad_q = (-qn) % 16
    if pad_q:
        lut_i = jnp.pad(lut_i, ((0, 0), (0, pad_q), (0, 0)))
        lut_t = jnp.pad(lut_t, ((0, 0), (0, pad_q), (0, 0)))
        alpha_col = jnp.pad(alpha_col, ((0, pad_q), (0, 0)))
    qn_p = qn + pad_q
    # lane-align the one-hot K axis (bf16 min tile 16 x 128)
    pad_k = (-n_k) % 128
    if pad_k:
        lut_i = jnp.pad(lut_i, ((0, 0), (0, 0), (0, pad_k)))
        lut_t = jnp.pad(lut_t, ((0, 0), (0, 0), (0, pad_k)))
    n_k_p = n_k + pad_k

    tile_n = min(tile_n, max(128, 1 << (n - 1).bit_length()))
    # VMEM plan (r5, see _FUSED_PQ_K_CAP): the merge's Mosaic stack is
    # ~linear in k and tile-independent. k<=20 keeps the verified
    # default-budget compile; beyond that raise the scoped-VMEM limit to
    # 48 MiB (the band chip-verified for the fused-block kernels).
    vmem_limit = None if k <= 20 else 48 * 2**20
    pad_n = (-n) % tile_n
    # codes transpose to [M, N] so each grid step loads one lane-contiguous
    # code row; int8 view (values > 127 wrap, recovered by & 0xFF in-kernel)
    ci = jnp.pad(img_codes, ((0, pad_n), (0, 0))).astype(jnp.int8).T
    ct = jnp.pad(txt_codes, ((0, pad_n), (0, 0))).astype(jnp.int8).T
    si = jnp.pad(
        jnp.asarray(img_scale, jnp.float32).reshape(1, -1), ((0, 0), (0, pad_n))
    )
    st = jnp.pad(
        jnp.asarray(txt_scale, jnp.float32).reshape(1, -1), ((0, 0), (0, pad_n))
    )
    n_tiles = ci.shape[1] // tile_n
    # subspaces per grid step: the code block's sublane dim must divide by 8
    # or equal M; 8 also amortizes the grid/step overhead 8x
    group = 8 if m % 8 == 0 else m
    n_groups = m // group

    lut_spec = pl.BlockSpec(
        (group, qn_p, n_k_p), lambda j, mm: (mm, 0, 0), memory_space=pltpu.VMEM
    )
    code_spec = pl.BlockSpec(
        (group, tile_n), lambda j, mm: (mm, j), memory_space=pltpu.VMEM
    )
    scale_spec = pl.BlockSpec(
        (1, tile_n), lambda j, mm: (0, j), memory_space=pltpu.VMEM
    )
    alpha_spec = pl.BlockSpec(
        (qn_p, 1), lambda j, mm: (0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec((qn_p, k), lambda j, mm: (0, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _pq_adc_kernel, k=k, tile_n=tile_n, corpus_n=n, n_k=n_k_p,
        n_groups=n_groups, group=group,
    )
    vals, idx = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_groups),
        in_specs=[alpha_spec, lut_spec, lut_spec, code_spec, code_spec, scale_spec, scale_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((qn_p, k), jnp.float32),
            jax.ShapeDtypeStruct((qn_p, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((qn_p, tile_n), jnp.float32),
            pltpu.VMEM((qn_p, tile_n), jnp.float32),
            pltpu.VMEM((qn_p, k), jnp.float32),
            pltpu.VMEM((qn_p, k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_limit,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * qn_p * n_k_p * (n + pad_n) * m,
            bytes_accessed=2 * (n + pad_n) * m + 2 * lut_i.size * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(alpha_col, lut_i, lut_t, ci, ct, si, st)
    return vals[:qn], idx[:qn]


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def masked_pq_similarity_topk(
    queries: jax.Array,
    img_codes: jax.Array,
    img_scale: jax.Array,
    txt_codes: jax.Array,
    txt_scale: jax.Array,
    cb_img: jax.Array,
    cb_txt: jax.Array,
    mask,
    k: int,
    alpha=0.5,
    chunk: int = _DECODE_CHUNK,
) -> Tuple[jax.Array, jax.Array]:
    """Filtered top-k over a PQ corpus: runtime bool row mask, ``-1`` idx
    sentinels on dead slots (same semantics as ``masked_similarity_topk``)."""
    n = img_codes.shape[0]
    scores = blended_scores_pq(
        queries, img_codes, img_scale, txt_codes, txt_scale, cb_img, cb_txt, alpha, chunk
    )
    scores = jnp.where(normalize_mask(mask, scores.shape[0], n), scores, _NEG_INF)
    vals, idx = _segmented_topk_from_scores(scores, min(k, n), segment=4096)
    return vals, jnp.where(vals > _NEG_INF / 2, idx, -1)


def sharded_masked_pq_similarity_topk(
    queries: jax.Array,
    img_codes: jax.Array,
    img_scale: jax.Array,
    txt_codes: jax.Array,
    txt_scale: jax.Array,
    cb_img: jax.Array,
    cb_txt: jax.Array,
    mask,
    k: int,
    alpha,
    mesh: Mesh,
    axis: str = "data",
    chunk: int = _DECODE_CHUNK,
) -> Tuple[jax.Array, jax.Array]:
    """Filtered PQ top-k over a row-sharded code corpus (the mask shards
    with the rows; ``-1`` sentinels on dead slots like the other tiers)."""
    n_shards = mesh.shape[axis]
    n = img_codes.shape[0]
    shard_n = n // n_shards
    k = min(k, n)
    k_local = min(k, shard_n)
    a = alpha_column(alpha, queries.shape[0])
    mask2d = normalize_mask(mask, queries.shape[0], n)

    def local(q, a, m, ci, si, ct, st, cbi, cbt):
        scores = jnp.where(m, blended_scores_pq(q, ci, si, ct, st, cbi, cbt, a, chunk), _NEG_INF)
        vals, idx = _segmented_topk_from_scores(scores, k_local, segment=4096)
        vals, idx = _merge_shard_winners(vals, idx, axis, shard_n, k)
        return vals, jnp.where(vals > _NEG_INF / 2, idx, -1)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(), P(), P(None, axis),
            P(axis, None), P(axis, None), P(axis, None), P(axis, None),
            P(), P(),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)(
        queries, a, mask2d, img_codes, img_scale, txt_codes, txt_scale, cb_img, cb_txt
    )


def sharded_pq_similarity_topk(
    queries: jax.Array,
    img_codes: jax.Array,
    img_scale: jax.Array,
    txt_codes: jax.Array,
    txt_scale: jax.Array,
    cb_img: jax.Array,
    cb_txt: jax.Array,
    k: int,
    alpha,
    mesh: Mesh,
    axis: str = "data",
    chunk: int = _DECODE_CHUNK,
) -> Tuple[jax.Array, jax.Array]:
    """PQ top-k over a row-sharded code corpus: each device decodes and
    scans only its local codes (codebooks replicate — they are KB-sized),
    and only the per-shard ``[Q, k]`` winners cross ICI for the merge.
    Corpus capacity scales ~30x per chip AND linearly with the mesh."""
    n_shards = mesh.shape[axis]
    n = img_codes.shape[0]
    shard_n = n // n_shards
    k = min(k, n)
    k_local = min(k, shard_n)
    a = alpha_column(alpha, queries.shape[0])

    def local(q, a, ci, si, ct, st, cbi, cbt):
        if jax.default_backend() == "tpu" and k_local <= 128:
            vals, idx = fused_pq_topk(q, ci, si, ct, st, cbi, cbt, k=k_local, alpha=a)
        elif jax.default_backend() == "tpu":
            scores = blended_scores_pq_adc(q, ci, si, ct, st, cbi, cbt, a)
            vals, idx = _segmented_topk_from_scores(scores, k_local, segment=4096)
        else:
            scores = blended_scores_pq(q, ci, si, ct, st, cbi, cbt, a, chunk)
            vals, idx = _segmented_topk_from_scores(scores, k_local, segment=4096)
        return _merge_shard_winners(vals, idx, axis, shard_n, k)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(), P(), P(axis, None), P(axis, None), P(axis, None), P(axis, None),
            P(), P(),
        ),
        out_specs=(P(), P()),
        check_vma=False,  # replicated after all_gather + top_k (unprovable)
    )
    return jax.jit(fn)(
        queries, a, img_codes, img_scale, txt_codes, txt_scale, cb_img, cb_txt
    )
