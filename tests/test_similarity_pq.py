"""Product-quantized corpus tier (ops/pq.py).

Quantized-path testing rule (CLAUDE.md): oracle comparisons use IDENTICAL
op order — the oracle decodes with the same ``decode_pq`` dtype path and
applies scales to score columns exactly like the chunked scan.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.ops.pq import (
    blended_scores_pq,
    blended_scores_pq_adc,
    decode_pq,
    fused_pq_topk,
    masked_pq_similarity_topk,
    pack_pq_host,
    pq_similarity_topk,
    sharded_pq_similarity_topk,
    train_pq_codebooks,
)
from knowledge_enhanced_multimodal_retrieval_tpu.ops.similarity import (
    _segmented_topk_from_scores,
    blended_scores,
)
from knowledge_enhanced_multimodal_retrieval_tpu.parallel.mesh import (
    MeshRuntime,
)
from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import MeshConfig


def _rows(n, d, seed=0, clusters=0):
    rng = np.random.default_rng(seed)
    if clusters:
        centers = rng.standard_normal((clusters, d)).astype(np.float32)
        x = centers[rng.integers(0, clusters, n)] + 0.15 * rng.standard_normal(
            (n, d)
        ).astype(np.float32)
    else:
        x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


M, D = 8, 64


@pytest.fixture(scope="module")
def packed():
    img = _rows(300, D, seed=1, clusters=12)
    txt = _rows(300, D, seed=2, clusters=12)
    cb_img = train_pq_codebooks(img, m=M, k=32, iters=8, seed=0)
    cb_txt = train_pq_codebooks(txt, m=M, k=32, iters=8, seed=1)
    ci, si = pack_pq_host(img, cb_img)
    ct, st = pack_pq_host(txt, cb_txt)
    return img, txt, cb_img, cb_txt, ci, si, ct, st


def test_codebook_shapes_and_determinism():
    rows = _rows(200, D, seed=3)
    a = train_pq_codebooks(rows, m=M, k=16, iters=5, seed=7)
    b = train_pq_codebooks(rows, m=M, k=16, iters=5, seed=7)
    assert a.shape == (M, 16, D // M)
    np.testing.assert_array_equal(a, b)
    c = train_pq_codebooks(rows, m=M, k=16, iters=5, seed=8)
    assert not np.array_equal(a, c)


def test_codebook_guards():
    rows = _rows(64, D)
    with pytest.raises(ValueError, match="divide"):
        train_pq_codebooks(rows, m=7)
    with pytest.raises(ValueError, match="uint8"):
        train_pq_codebooks(rows, m=M, k=512)
    with pytest.raises(ValueError, match="all-zero"):
        train_pq_codebooks(np.zeros((8, D)), m=M)
    cb = train_pq_codebooks(rows, m=M, k=8)
    with pytest.raises(ValueError, match="tile"):
        pack_pq_host(np.zeros((4, D + M)), cb)


def test_pack_assigns_nearest_centroid(packed):
    img, _, cb_img, _, ci, si, _, _ = packed
    codes = np.asarray(ci)
    ds = D // M
    sub = img.reshape(img.shape[0], M, ds)
    for j in range(M):
        d2 = ((sub[:, j, :, None] - cb_img[j].T[None]) ** 2).sum(axis=1)  # [N, K]
        np.testing.assert_array_equal(codes[:, j], np.argmin(d2, axis=1))
    # normalized rows: scale == 1
    np.testing.assert_allclose(np.asarray(si), 1.0, atol=1e-5)


def test_zero_pad_rows_score_zero(packed):
    img, txt, cb_img, cb_txt, *_ = packed
    padded_img = np.concatenate([img[:32], np.zeros((8, D), np.float32)])
    padded_txt = np.concatenate([txt[:32], np.zeros((8, D), np.float32)])
    ci, si = pack_pq_host(padded_img, cb_img)
    ct, st = pack_pq_host(padded_txt, cb_txt)
    assert np.all(np.asarray(si)[32:] == 0)
    q = jnp.asarray(_rows(4, D, seed=9))
    s = blended_scores_pq(q, ci, si, ct, st, jnp.asarray(cb_img), jnp.asarray(cb_txt), 0.5)
    np.testing.assert_array_equal(np.asarray(s)[:, 32:], 0.0)


def test_scores_match_decode_oracle(packed):
    """Chunked decode-and-matmul == one-shot decode + blended_scores, exactly
    (same dtype path, same scale op order)."""
    _, _, cb_img, cb_txt, ci, si, ct, st = packed
    q = jnp.asarray(_rows(16, D, seed=10), jnp.float32)
    cbi, cbt = jnp.asarray(cb_img), jnp.asarray(cb_txt)
    got = blended_scores_pq(q, ci, si, ct, st, cbi, cbt, 0.3, chunk=64)
    # oracle with the SCAN's op order: dot the decoded DIRECTIONS, then the
    # per-row scales multiply the f32 score columns (scale-inside-recon is
    # one f32 ulp off — the op-ORDER rule from tests/test_fast_encode.py)
    ones = jnp.ones_like(si)
    dir_i = decode_pq(ci, ones, cbi, q.dtype)
    dir_t = decode_pq(ct, ones, cbt, q.dtype)
    t2i = jnp.dot(q, dir_i.T, preferred_element_type=jnp.float32) * si.reshape(1, -1)
    t2t = jnp.dot(q, dir_t.T, preferred_element_type=jnp.float32) * st.reshape(1, -1)
    want = 0.3 * t2i + 0.7 * t2t
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_topk_matches_oracle(packed):
    _, _, cb_img, cb_txt, ci, si, ct, st = packed
    q = jnp.asarray(_rows(8, D, seed=11))
    cbi, cbt = jnp.asarray(cb_img), jnp.asarray(cb_txt)
    vals, idx = pq_similarity_topk(q, ci, si, ct, st, cbi, cbt, k=10, alpha=0.6)
    scores = blended_scores_pq(q, ci, si, ct, st, cbi, cbt, 0.6)
    ovals, oidx = _segmented_topk_from_scores(scores, 10, 4096)
    # values to float tolerance (jit fuses the eager oracle differently by
    # an ulp); the SELECTION must agree exactly
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ovals), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(oidx))


def test_recall_on_clustered_data(packed):
    """PQ recall@10 vs exact must be high on clustered (realistic) rows —
    and beat the binary sketch's random-vector floor by a wide margin."""
    img, txt, cb_img, cb_txt, ci, si, ct, st = packed
    q = jnp.asarray(_rows(32, D, seed=12, clusters=12))
    _, idx = pq_similarity_topk(
        q, ci, si, ct, st, jnp.asarray(cb_img), jnp.asarray(cb_txt), k=10
    )
    exact = blended_scores(q, jnp.asarray(img), jnp.asarray(txt), 0.5)
    _, eidx = jax.lax.top_k(exact, 10)
    hits = [
        len(set(np.asarray(idx)[i]) & set(np.asarray(eidx)[i])) / 10
        for i in range(32)
    ]
    assert np.mean(hits) >= 0.8, np.mean(hits)


def test_per_query_alpha(packed):
    _, _, cb_img, cb_txt, ci, si, ct, st = packed
    q = jnp.asarray(_rows(4, D, seed=13))
    cbi, cbt = jnp.asarray(cb_img), jnp.asarray(cb_txt)
    alphas = jnp.asarray([0.1, 0.4, 0.7, 1.0])
    vals, idx = pq_similarity_topk(q, ci, si, ct, st, cbi, cbt, k=5, alpha=alphas)
    for i, a in enumerate(np.asarray(alphas)):
        v1, i1 = pq_similarity_topk(
            q[i : i + 1], ci, si, ct, st, cbi, cbt, k=5, alpha=float(a)
        )
        np.testing.assert_array_equal(np.asarray(idx)[i], np.asarray(i1)[0])
        np.testing.assert_allclose(np.asarray(vals)[i], np.asarray(v1)[0], rtol=1e-6)


def test_masked_sentinels(packed):
    _, _, cb_img, cb_txt, ci, si, ct, st = packed
    q = jnp.asarray(_rows(3, D, seed=14))
    cbi, cbt = jnp.asarray(cb_img), jnp.asarray(cb_txt)
    mask = np.zeros(ci.shape[0], bool)
    mask[:4] = True  # only 4 eligible rows, k=6 -> two dead slots
    vals, idx = masked_pq_similarity_topk(
        q, ci, si, ct, st, cbi, cbt, mask, k=6
    )
    idx = np.asarray(idx)
    assert np.all(idx[:, 4:] == -1)
    assert np.all((idx[:, :4] >= 0) & (idx[:, :4] < 4))


def test_adc_kernel_matches_adc_oracle(packed):
    """The Pallas ADC kernel (interpret mode) selects exactly what its XLA
    one-hot-matmul oracle selects, values to float tolerance."""
    _, _, cb_img, cb_txt, ci, si, ct, st = packed
    q = jnp.asarray(_rows(12, D, seed=20))
    cbi, cbt = jnp.asarray(cb_img), jnp.asarray(cb_txt)
    vals, idx = fused_pq_topk(
        q, ci, si, ct, st, cbi, cbt, k=9, alpha=0.35, interpret=True, tile_n=128
    )
    scores = blended_scores_pq_adc(q, ci, si, ct, st, cbi, cbt, 0.35)
    ovals, oidx = _segmented_topk_from_scores(scores, 9, 4096)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(oidx))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ovals), rtol=1e-5, atol=1e-6)


def test_bigk_adc_path_matches_oracle(packed):
    """The big-k TPU route (ADC scores + segmented top-k) selects what the
    ADC score oracle selects — any k, no kernel cap."""
    from knowledge_enhanced_multimodal_retrieval_tpu.ops.pq import (
        pq_similarity_topk_adc,
    )

    _, _, cb_img, cb_txt, ci, si, ct, st = packed
    q = jnp.asarray(_rows(6, D, seed=22))
    cbi, cbt = jnp.asarray(cb_img), jnp.asarray(cb_txt)
    k = 160  # > the fused kernel's 128 cap
    vals, idx = pq_similarity_topk_adc(q, ci, si, ct, st, cbi, cbt, k=k, alpha=0.5)
    scores = blended_scores_pq_adc(q, ci, si, ct, st, cbi, cbt, 0.5)
    ovals, oidx = _segmented_topk_from_scores(scores, min(k, ci.shape[0]), 4096)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(oidx))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ovals), rtol=1e-5)


def test_adc_scores_close_to_decode_scores(packed):
    """ADC (bf16 LUT) and decode-and-matmul (bf16 centroids) are two
    roundings of the same math — scores agree to bf16 tolerance."""
    _, _, cb_img, cb_txt, ci, si, ct, st = packed
    q = jnp.asarray(_rows(8, D, seed=21))
    cbi, cbt = jnp.asarray(cb_img), jnp.asarray(cb_txt)
    adc = blended_scores_pq_adc(q, ci, si, ct, st, cbi, cbt, 0.5)
    dec = blended_scores_pq(q, ci, si, ct, st, cbi, cbt, 0.5)
    np.testing.assert_allclose(np.asarray(adc), np.asarray(dec), atol=2e-2)


def test_adc_kernel_per_query_alpha_and_pads(packed):
    img, txt, cb_img, cb_txt, *_ = packed
    padded_img = np.concatenate([img[:40], np.zeros((8, D), np.float32)])
    padded_txt = np.concatenate([txt[:40], np.zeros((8, D), np.float32)])
    ci, si = pack_pq_host(padded_img, cb_img)
    ct, st = pack_pq_host(padded_txt, cb_txt)
    q = jnp.asarray(_rows(4, D, seed=22))
    cbi, cbt = jnp.asarray(cb_img), jnp.asarray(cb_txt)
    alphas = jnp.asarray([0.0, 0.3, 0.8, 1.0])
    vals, idx = fused_pq_topk(
        q, ci, si, ct, st, cbi, cbt, k=6, alpha=alphas, interpret=True, tile_n=128
    )
    scores = blended_scores_pq_adc(q, ci, si, ct, st, cbi, cbt, alphas)
    ovals, oidx = _segmented_topk_from_scores(scores, 6, 4096)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(oidx))
    # zero pad rows score 0 in the kernel too (scale 0), and never beat
    # positive real winners
    assert np.asarray(vals).min() >= 0.0 or np.all(np.asarray(idx) < 40)


def test_sharded_matches_unsharded(packed):
    _, _, cb_img, cb_txt, ci, si, ct, st = packed
    # 300 rows don't split 8 ways evenly; use the first 296
    n = 296
    ci, si, ct, st = ci[:n], si[:n], ct[:n], st[:n]
    q = jnp.asarray(_rows(6, D, seed=15))
    cbi, cbt = jnp.asarray(cb_img), jnp.asarray(cb_txt)
    rt = MeshRuntime.create(MeshConfig(data_parallel=8))
    svals, sidx = sharded_pq_similarity_topk(
        q, ci, si, ct, st, cbi, cbt, k=7, alpha=0.5, mesh=rt.mesh
    )
    vals, idx = pq_similarity_topk(q, ci, si, ct, st, cbi, cbt, k=7, alpha=0.5)
    np.testing.assert_allclose(np.asarray(svals), np.asarray(vals), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(sidx), np.asarray(idx))


def test_fused_k_cap_refusal_and_routing(packed):
    """On real hardware the fused kernel's merge stack caps k at 64
    (chip-measured r5: k=40 needs the raised 48 MiB scoped-VMEM limit,
    k=128 exceeds it at any tile). The kernel must refuse k > cap clearly
    when not interpreting, and pq_similarity_topk must route such k to the
    ADC + segmented top-k path instead."""
    from knowledge_enhanced_multimodal_retrieval_tpu.ops.pq import _FUSED_PQ_K_CAP

    img, txt, cb_img, cb_txt, ci, si, ct, st = packed
    q = jnp.asarray(_rows(4, D, seed=9), jnp.float32)
    with pytest.raises(ValueError, match="k <= 64"):
        fused_pq_topk(
            q, ci, si, ct, st, cb_img, cb_txt,
            k=_FUSED_PQ_K_CAP + 1, interpret=False,
        )
    # the dispatcher serves the same k via the ADC path (any backend)
    vals, idx = pq_similarity_topk(
        q, ci, si, ct, st, cb_img, cb_txt, k=_FUSED_PQ_K_CAP + 1,
    )
    assert vals.shape == (4, _FUSED_PQ_K_CAP + 1)
    assert bool((np.asarray(idx) >= 0).all())
