"""Score-aware (anisotropic / ScaNN-objective) PQ: trainer, coordinate-descent
assignment, retriever integration. Reference has no counterpart (its corpus is
raw f32 numpy, ``src/clip/clip_retrieval.py:26-37``); the method is Guo et
al., ICML 2020."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.ops.pq import (
    _aniso_assign,
    anisotropic_eta,
    pack_pq_host,
    pq_encode_host,
    pq_encode_host_anisotropic,
    train_pq_codebooks,
    train_pq_codebooks_anisotropic,
)


def _energy_decay_rows(rng, n, d, tau=25.0):
    """Anisotropic-energy rows (the regime score-aware training targets)."""
    x = rng.standard_normal((n, d)).astype(np.float32)
    x *= np.exp(-np.arange(d) / tau).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_eta_formula_and_validation():
    assert anisotropic_eta(0.2, 257) == pytest.approx(256 * 0.04 / 0.96)
    for bad in (0.0, 1.0, -0.1, 2.0):
        with pytest.raises(ValueError, match="threshold"):
            anisotropic_eta(bad, 64)


def test_eta_one_reduces_to_vanilla_assignment():
    """η=1 kills the parallel-residual term — the coordinate descent must
    pick exactly the independent per-subspace argmin (vanilla PQ codes)."""
    rng = np.random.default_rng(0)
    rows = _energy_decay_rows(rng, 300, 64)
    cb = train_pq_codebooks(rows, m=8, seed=0)
    want, _ = pq_encode_host(rows, cb)
    got, _, _ = _aniso_assign(rows, cb, eta=1.0, passes=2)
    np.testing.assert_array_equal(got.astype(np.uint8), want)


def test_coordinate_descent_never_increases_loss():
    rng = np.random.default_rng(1)
    rows = _energy_decay_rows(rng, 200, 64)
    cb = train_pq_codebooks(rows, m=8, seed=0)
    eta = anisotropic_eta(0.2, 64)

    def loss(codes):
        m, k, ds = cb.shape
        recon = cb.reshape(m * k, ds)[
            codes.astype(np.int32) + (np.arange(m) * k)[None, :]
        ].reshape(rows.shape[0], -1)
        r = recon - rows
        par = np.einsum("nd,nd->n", r, rows)  # rows are unit
        return float(np.sum(r * r) + (eta - 1.0) * np.sum(par * par))

    c0, _, _ = _aniso_assign(rows, cb, eta, passes=0)  # vanilla warm start
    c1, _, _ = _aniso_assign(rows, cb, eta, passes=1)
    c2, _, _ = _aniso_assign(rows, cb, eta, passes=3)
    assert loss(c1) <= loss(c0) + 1e-4
    assert loss(c2) <= loss(c1) + 1e-4


def test_trainer_deterministic_and_shapes():
    rng = np.random.default_rng(2)
    rows = _energy_decay_rows(rng, 400, 64)
    a = train_pq_codebooks_anisotropic(rows, m=8, k=32, seed=3, iters=3)
    b = train_pq_codebooks_anisotropic(rows, m=8, k=32, seed=3, iters=3)
    assert a.shape == (8, 32, 8) and a.dtype == np.float32
    np.testing.assert_array_equal(a, b)
    with pytest.raises(ValueError, match="divide"):
        train_pq_codebooks_anisotropic(rows, m=7)
    with pytest.raises(ValueError, match="uint8"):
        train_pq_codebooks_anisotropic(rows, m=8, k=300)


def test_aniso_halves_winner_score_error():
    """The headline property: on energy-concentrated rows the score error
    on the TRUE top-k (what users see, what the engine thresholds on)
    drops substantially vs vanilla PQ at the same bitrate."""
    rng = np.random.default_rng(3)
    rows = _energy_decay_rows(rng, 1500, 128)
    q = rows[rng.integers(0, 1500, 48)] + 0.05 * rng.standard_normal(
        (48, 128)
    ).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    def winner_mae(cb, codes, scale):
        m, k, ds = cb.shape
        recon = cb.reshape(m * k, ds)[
            codes.astype(np.int32) + (np.arange(m) * k)[None, :]
        ].reshape(rows.shape[0], -1) * scale
        s_approx = q @ recon.T
        s_exact = q @ rows.T
        bi = np.argsort(-s_exact, axis=1)[:, :10]
        return float(np.mean(np.abs(
            np.take_along_axis(s_approx, bi, 1) - np.take_along_axis(s_exact, bi, 1)
        )))

    cb_v = train_pq_codebooks(rows, m=16, seed=0)
    cv, sv = pq_encode_host(rows, cb_v)
    cb_a = train_pq_codebooks_anisotropic(rows, m=16, seed=0, iters=4)
    ca, sa = pq_encode_host_anisotropic(rows, cb_a)
    mae_v = winner_mae(cb_v, np.asarray(cv), np.asarray(sv))
    mae_a = winner_mae(cb_a, ca, sa)
    assert mae_a < 0.75 * mae_v, (mae_a, mae_v)


def test_encode_zero_rows_and_scale():
    rng = np.random.default_rng(4)
    rows = _energy_decay_rows(rng, 100, 64) * 2.5  # non-unit norms
    rows[7] = 0.0  # capacity-pad-style zero row
    cb = train_pq_codebooks_anisotropic(rows, m=8, seed=0, iters=2)
    codes, scale = pq_encode_host_anisotropic(rows, cb)
    assert codes.shape == (100, 8) and codes.dtype == np.uint8
    assert scale[7, 0] == 0.0
    live = np.delete(np.arange(100), 7)
    np.testing.assert_allclose(
        scale[live, 0], np.linalg.norm(rows[live], axis=1), rtol=1e-5
    )


def test_pack_pq_host_aniso_path():
    rng = np.random.default_rng(5)
    rows = _energy_decay_rows(rng, 120, 64)
    cb = train_pq_codebooks_anisotropic(rows, m=8, seed=0, iters=2)
    codes, scale = pack_pq_host(rows, cb, aniso_t=0.2)
    want, wscale = pq_encode_host_anisotropic(rows, cb, t=0.2)
    np.testing.assert_array_equal(np.asarray(codes), want)
    np.testing.assert_allclose(np.asarray(scale), wscale, rtol=1e-6)


# -- retriever integration -------------------------------------------------


def test_clip_retrieval_pq_aniso(devices8):
    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import (
        CLIPRetrieval,
        EmbeddingStore,
    )

    tok = CLIPTokenizer([("c", "a"), ("ca", "t</w>"), ("h", "e"), ("he", "l")])
    arch = M.CLIPArch(16, 32, 1, 32, 16, 16, tok.vocab_size, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((40, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb2 = rng.standard_normal((40, 16)).astype(np.float32)
    emb2 /= np.linalg.norm(emb2, axis=1, keepdims=True)
    store = EmbeddingStore(emb, emb2, [f"u{i}" for i in range(40)])

    r = CLIPRetrieval(
        model, params, tok, store, top_k=5,
        quantize_corpus="pq", pq_m=4, pq_aniso_t=0.2,
    )
    got = r.retrieval("hello cat", alpha=0.5)
    scores = [x["score"] for x in got]
    assert len(got) == 5 and scores == sorted(scores, reverse=True)

    # rerank restores exact ordering through the aniso-packed corpus
    exact = CLIPRetrieval(model, params, tok, store, top_k=5)
    want = exact.retrieval("hello cat", alpha=0.5)
    rr = CLIPRetrieval(
        model, params, tok, store, top_k=5,
        quantize_corpus="pq", pq_m=4, pq_aniso_t=0.2,
        rerank=True, rerank_factor=8,
    )
    got = rr.retrieval("hello cat", alpha=0.5)
    assert [x["uuid"] for x in got] == [x["uuid"] for x in want]

    # refusals
    with pytest.raises(ValueError, match="requires quantize_corpus='pq'"):
        CLIPRetrieval(model, params, tok, store, pq_aniso_t=0.2)
    with pytest.raises(ValueError, match="does not compose with ann"):
        CLIPRetrieval(
            model, params, tok, store, quantize_corpus="pq",
            pq_aniso_t=0.2, ann="ivf",
        )
    with pytest.raises(ValueError, match="conflicting objectives"):
        CLIPRetrieval(
            model, params, tok, store, quantize_corpus="pq",
            pq_aniso_t=0.2, rotate="opq",
        )


def test_quality_sweep_aniso_rows(devices8):
    from knowledge_enhanced_multimodal_retrieval_tpu.eval.quality import quality_sweep

    rng = np.random.default_rng(6)
    img = _energy_decay_rows(rng, 200, 32)
    txt = _energy_decay_rows(rng, 200, 32)
    q = img[rng.integers(0, 200, 16)]
    rows = quality_sweep(img, txt, q, k=5, pq_aniso_t=0.2)
    configs = [r["config"] for r in rows]
    assert "pq+aniso" in configs and "pq+aniso+rerank4x" in configs
    aniso = next(r for r in rows if r["config"] == "pq+aniso")
    assert 0.0 <= aniso["recall_at_k"] <= 1.0
