import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.ops import similarity as S
from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime


def _corpus(rng, n=500, d=64, q=7):
    def norm(x):
        return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)

    return (
        norm(rng.standard_normal((q, d))),
        norm(rng.standard_normal((n, d))),
        norm(rng.standard_normal((n, d))),
    )


def test_blended_scores_formula(rng):
    q, img, txt = _corpus(rng, n=20, q=3)
    out = np.asarray(S.blended_scores(jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt), 0.8))
    expected = 0.8 * (q @ img.T) + 0.2 * (q @ txt.T)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("alpha", [0.0, 0.5, 0.8, 1.0])
def test_fused_matches_xla(rng, alpha):
    q, img, txt = _corpus(rng, n=500, q=7)
    k = 10
    xv, xi = S.similarity_topk_xla(jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt), k, alpha)
    fv, fi = S.fused_similarity_topk(
        jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt), k=k, alpha=alpha, tile_n=128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(xi))
    np.testing.assert_allclose(np.asarray(fv), np.asarray(xv), rtol=1e-5, atol=1e-6)


def test_fused_nondivisible_corpus(rng):
    q, img, txt = _corpus(rng, n=333, q=5)
    fv, fi = S.fused_similarity_topk(
        jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt), k=7, alpha=0.5, tile_n=128, interpret=True
    )
    xv, xi = S.similarity_topk_xla(jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt), 7, 0.5)
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(xi))
    assert (np.asarray(fi) < 333).all()


def test_fused_separate_query_towers(rng):
    """queries_txt different from queries_img (learned-fusion use case)."""
    q1, img, txt = _corpus(rng, n=256, q=4)
    q2 = q1[::-1].copy()
    fv, fi = S.fused_similarity_topk(
        jnp.asarray(q1), jnp.asarray(img), jnp.asarray(txt), k=5, alpha=0.6,
        queries_txt=jnp.asarray(q2), tile_n=128, interpret=True,
    )
    scores = 0.6 * (q1 @ img.T) + 0.4 * (q2 @ txt.T)
    ref_idx = np.argsort(-scores, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(fi), ref_idx)


def test_fused_large_k_falls_back(rng):
    q, img, txt = _corpus(rng, n=300, q=3)
    fv, fi = S.fused_similarity_topk(jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt), k=200, alpha=0.5)
    assert fv.shape == (3, 200)


@pytest.mark.parametrize("k,n,segment", [(200, 3000, 512), (512, 3000, 512), (512, 43_0, 512), (129, 1000, 4096)])
def test_segmented_topk_oracle(rng, k, n, segment):
    """Exact two-stage selection must match direct lax.top_k for k > 128,
    including k > segment and non-divisible corpus sizes."""
    q, img, txt = _corpus(rng, n=n, q=5)
    sv, si = S.similarity_topk_segmented(
        jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt), k=k, alpha=0.6, segment=segment
    )
    kk = min(k, n)
    xv, xi = S.similarity_topk_xla(jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt), kk, 0.6)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(xv), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(xi))


def test_fused_routes_big_k_to_segmented(rng):
    """fused_similarity_topk(k>128) must produce exact results via the
    segmented path (oracle = full argsort)."""
    q, img, txt = _corpus(rng, n=2000, q=4)
    fv, fi = S.fused_similarity_topk(jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt), k=300, alpha=0.5)
    scores = 0.5 * (q @ img.T) + 0.5 * (q @ txt.T)
    ref_idx = np.argsort(-scores, axis=1)[:, :300]
    np.testing.assert_array_equal(np.asarray(fi), ref_idx)


@pytest.mark.parametrize("mode", ["bf16", "q8", "q4"])
def test_big_k_distinct_query_towers_oracle(mode, rng):
    """k=512 with queries_txt != queries_img routes through the segmented
    path in every corpus packing (the r3 NotImplementedError is lifted).
    Oracle = direct lax.top_k on the op-order-matched blended scores."""
    q1, img, txt = _corpus(rng, n=1500, q=5)
    q2 = q1[::-1].copy()
    k = 512
    j1, j2 = jnp.asarray(q1), jnp.asarray(q2)
    if mode == "bf16":
        fv, fi = S.fused_similarity_topk(
            j1, jnp.asarray(img), jnp.asarray(txt), k=k, alpha=0.6, queries_txt=j2
        )
        scores = S.blended_scores(j1, jnp.asarray(img), jnp.asarray(txt), 0.6, j2)
    elif mode == "q8":
        img_q, img_s = S.quantize_corpus(jnp.asarray(img))
        txt_q, txt_s = S.quantize_corpus(jnp.asarray(txt))
        fv, fi = S.fused_similarity_topk_q8(
            j1, img_q, img_s, txt_q, txt_s, k=k, alpha=0.6, queries_txt=j2
        )
        scores = S.blended_scores_q8(j1, img_q, img_s, txt_q, txt_s, 0.6, j2)
    else:
        img_p, img_s = S.quantize_corpus_host_q4(img)
        txt_p, txt_s = S.quantize_corpus_host_q4(txt)
        fv, fi = S.fused_similarity_topk_q4(
            j1, img_p, img_s, txt_p, txt_s, k=k, alpha=0.6, queries_txt=j2
        )
        scores = S.blended_scores_q4(j1, img_p, img_s, txt_p, txt_s, 0.6, j2)
    xv, xi = jax.lax.top_k(scores, k)
    np.testing.assert_allclose(np.asarray(fv), np.asarray(xv), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(xi))


def test_sharded_big_k_matches_dense(rng, devices8):
    rt = MeshRuntime.create()
    q, img, txt = _corpus(rng, n=2048, q=4)
    sv, si = S.sharded_similarity_topk(
        jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt), k=200, alpha=0.7, mesh=rt.mesh
    )
    xv, xi = S.similarity_topk_xla(jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt), 200, 0.7)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(xv), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(xi))


def test_sharded_matches_dense(rng, devices8):
    rt = MeshRuntime.create()
    q, img, txt = _corpus(rng, n=512, q=6)
    sv, si = S.sharded_similarity_topk(
        jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt), k=9, alpha=0.7, mesh=rt.mesh
    )
    xv, xi = S.similarity_topk_xla(jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt), 9, 0.7)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(xv), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(xi))


def test_sharded_q8_matches_dense_q8(rng, devices8):
    """Sharded int8-corpus top-k == the dense XLA q8 path (same op order)."""
    rt = MeshRuntime.create()
    q, img, txt = _corpus(rng, n=512, q=6)
    img_q, img_s = S.quantize_corpus_host(img)
    txt_q, txt_s = S.quantize_corpus_host(txt)
    sv, si = S.sharded_similarity_topk_q8(
        jnp.asarray(q), img_q, img_s, txt_q, txt_s, k=9, alpha=0.7, mesh=rt.mesh
    )
    xv, xi = S.similarity_topk_xla_q8(jnp.asarray(q), img_q, img_s, txt_q, txt_s, 9, 0.7)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(xv), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(xi))


def test_sharded_q8_big_k(rng, devices8):
    """k > shard contribution and > 128: q8-native segmented local path."""
    rt = MeshRuntime.create()
    q, img, txt = _corpus(rng, n=2048, q=4)
    img_q, img_s = S.quantize_corpus_host(img, rt.mesh)
    txt_q, txt_s = S.quantize_corpus_host(txt, rt.mesh)
    assert not img_q.sharding.is_fully_replicated  # rows really sharded
    sv, si = S.sharded_similarity_topk_q8(
        jnp.asarray(q), img_q, img_s, txt_q, txt_s, k=200, alpha=0.7, mesh=rt.mesh
    )
    xv, xi = S.similarity_topk_xla_q8(jnp.asarray(q), img_q, img_s, txt_q, txt_s, 200, 0.7)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(xv), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(xi))


def test_fused_nan_query_stays_in_range(rng):
    """A NaN query embedding must degrade (in-range indices, -inf values),
    never emit masked out-of-corpus indices that crash uuid mapping."""
    q, img, txt = _corpus(rng, n=24, q=2)
    q[0, :] = np.nan
    fv, fi = S.fused_similarity_topk(
        jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt), k=5, interpret=True
    )
    fi = np.asarray(fi)
    assert ((fi >= 0) & (fi < 24)).all(), fi
    # NaN row degrades to the mask sentinel (float32 min) everywhere
    assert (np.asarray(fv)[0] <= np.finfo(np.float32).min).all()
    # the clean row is unaffected
    xv, xi = S.similarity_topk_xla(jnp.asarray(q[1:]), jnp.asarray(img), jnp.asarray(txt), 5, 0.5)
    np.testing.assert_array_equal(fi[1], np.asarray(xi)[0])


def test_topk_values_sorted_desc(rng):
    q, img, txt = _corpus(rng, n=200, q=2)
    fv, _ = S.fused_similarity_topk(jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt), k=8, interpret=True)
    v = np.asarray(fv)
    assert (np.diff(v, axis=1) <= 1e-7).all()


def test_fused_k_larger_than_corpus(rng):
    q, img, txt = _corpus(rng, n=20, q=3)
    fv, fi = S.fused_similarity_topk(jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt), k=50, interpret=True)
    assert fv.shape == (3, 20)  # clamped to corpus size
    assert sorted(np.asarray(fi)[0].tolist()) == list(range(20))


def test_fused_large_query_batch(rng):
    """Q=512 chunks over _MAX_FUSED_Q (VMEM bound) and matches the oracle."""
    q, img, txt = _corpus(rng, n=2048, d=64, q=512)
    fv, fi = S.fused_similarity_topk(jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt), k=5, interpret=True)
    xv, xi = S.similarity_topk_xla(jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt), 5, 0.5)
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(xi))


def test_fused_chunked_per_query_alpha_and_tail(rng, monkeypatch):
    """Query chunking keeps per-query alphas row-aligned, handles a tail
    chunk (Q not a multiple of the bound), q8 path included."""
    monkeypatch.setattr(S, "_MAX_FUSED_Q", 8)
    q, img, txt = _corpus(rng, n=300, d=32, q=21)  # 21 = 2 chunks + tail 5
    alphas = rng.uniform(0.0, 1.0, 21).astype(np.float32)
    fv, fi = S.fused_similarity_topk(
        jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt),
        k=6, alpha=alphas, tile_n=128, interpret=True,
    )
    xv, xi = S.similarity_topk_xla(jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt), 6, alphas)
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(xi))
    np.testing.assert_allclose(np.asarray(fv), np.asarray(xv), rtol=1e-5, atol=1e-6)

    iq, isc = S.quantize_corpus(jnp.asarray(img))
    tq, tsc = S.quantize_corpus(jnp.asarray(txt))
    qv, qi = S.fused_similarity_topk_q8(
        jnp.asarray(q), iq, isc, tq, tsc, k=6, alpha=alphas, tile_n=128, interpret=True
    )
    ov, oi = S.similarity_topk_xla_q8(jnp.asarray(q), iq, isc, tq, tsc, 6, alphas)
    np.testing.assert_array_equal(np.asarray(qi), np.asarray(oi))
    np.testing.assert_allclose(np.asarray(qv), np.asarray(ov), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# int8 corpus
# ---------------------------------------------------------------------------


def test_quantize_corpus_roundtrip(rng):
    emb = rng.standard_normal((64, 32)).astype(np.float32)
    q, s = S.quantize_corpus(jnp.asarray(emb))
    assert q.dtype == jnp.int8 and s.shape == (64, 1)
    back = np.asarray(S.dequantize_corpus(q, s))
    step = np.asarray(s)
    assert (np.abs(back - emb) <= step / 2 + 1e-7).all()


def test_fused_q8_matches_dequantized_oracle(rng):
    """The q8 kernel must select exactly what an op-order-matched oracle
    selects: raw int8 dot, then per-column scale — quantization error lives
    in the data, not the kernel. (A dequantize-then-dot oracle differs by
    f32 ulps, which can swap near-tied indices.)"""
    q, img, txt = _corpus(rng, n=700, q=5)
    img_q, img_s = S.quantize_corpus(jnp.asarray(img))
    txt_q, txt_s = S.quantize_corpus(jnp.asarray(txt))
    fv, fi = S.fused_similarity_topk_q8(
        jnp.asarray(q), img_q, img_s, txt_q, txt_s, k=9, alpha=0.6, interpret=True
    )
    t2i = (q @ np.asarray(img_q, np.float32).T) * np.asarray(img_s).reshape(1, -1)
    t2t = (q @ np.asarray(txt_q, np.float32).T) * np.asarray(txt_s).reshape(1, -1)
    scores = (0.6 * t2i + 0.4 * t2t).astype(np.float32)
    xi = np.argsort(-scores, axis=1)[:, :9]
    xv = np.take_along_axis(scores, xi, axis=1)
    np.testing.assert_allclose(np.asarray(fv), xv, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(fi), xi)


def test_fused_q8_close_to_exact(rng):
    """Against the exact fp corpus: scores within quantization tolerance and
    high top-k overlap (normalized embeddings -> error ~1/127)."""
    q, img, txt = _corpus(rng, n=500, q=6)
    img_q, img_s = S.quantize_corpus(jnp.asarray(img))
    txt_q, txt_s = S.quantize_corpus(jnp.asarray(txt))
    fv, fi = S.fused_similarity_topk_q8(
        jnp.asarray(q), img_q, img_s, txt_q, txt_s, k=10, interpret=True
    )
    xv, xi = S.similarity_topk_xla(jnp.asarray(q), jnp.asarray(img), jnp.asarray(txt), 10, 0.5)
    np.testing.assert_allclose(np.asarray(fv), np.asarray(xv), atol=0.02)
    overlap = [
        len(set(np.asarray(fi)[i].tolist()) & set(np.asarray(xi)[i].tolist()))
        for i in range(6)
    ]
    assert min(overlap) >= 8, overlap


def test_fused_q8_big_k_falls_back(rng):
    q, img, txt = _corpus(rng, n=600, q=3)
    img_q, img_s = S.quantize_corpus(jnp.asarray(img))
    txt_q, txt_s = S.quantize_corpus(jnp.asarray(txt))
    fv, fi = S.fused_similarity_topk_q8(
        jnp.asarray(q), img_q, img_s, txt_q, txt_s, k=200, interpret=True
    )
    xv, xi = S.similarity_topk_xla(
        jnp.asarray(q), S.dequantize_corpus(img_q, img_s), S.dequantize_corpus(txt_q, txt_s), 200, 0.5
    )
    np.testing.assert_allclose(np.asarray(fv), np.asarray(xv), rtol=1e-5, atol=1e-6)
