"""IVF ANN index (retrieval/ann.py): packing invariants, exactness at full
probe, recall on clustered data, blend-alpha semantics, edge cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.ann import (
    IVFIndex,
    build_ivf_index,
    ivf_search,
    kmeans_spherical,
    probed_fraction,
)


def _normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _clustered(rng, n, d, n_blobs):
    """Blobby data: points concentrated around random directions."""
    centers = _normed(rng, n_blobs, d)
    which = rng.integers(0, n_blobs, n)
    x = centers[which] + 0.15 * rng.standard_normal((n, d)).astype(np.float32)
    return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)


def _brute(q, img, txt, alpha, k):
    s = alpha * (q @ img.T) + (1 - alpha) * (q @ txt.T)
    idx = np.argsort(-s, axis=1)[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


def test_kmeans_centroids_normalized_and_converge():
    rng = np.random.default_rng(0)
    x = _clustered(rng, 400, 16, 8)
    c = np.asarray(kmeans_spherical(jnp.asarray(x), 8, iters=15))
    np.testing.assert_allclose(np.linalg.norm(c, axis=1), 1.0, rtol=1e-5)
    # blobby data: most points should sit close to their centroid (noise
    # 0.15 at d=16 caps the attainable cosine at ~0.86 even for a perfect
    # clustering: |center + eps| ~ sqrt(1 + 0.15^2 * 16))
    best = (x @ c.T).max(axis=1)
    assert float(np.median(best)) > 0.8


def test_every_row_indexed_exactly_once():
    rng = np.random.default_rng(1)
    img, txt = _normed(rng, 300, 16), _normed(rng, 300, 16)
    index = build_ivf_index(img, txt, nlist=8, capacity_factor=1.3, seed=0)
    rows = np.asarray(index.packed_rows).ravel()
    present = rows[rows >= 0]
    assert sorted(present.tolist()) == list(range(300))
    assert 0.0 <= index.spill_fraction <= 1.0


def test_tight_capacity_spills_but_indexes_all():
    rng = np.random.default_rng(2)
    # all rows near one direction -> everything wants the same cluster
    base = _normed(rng, 1, 16)
    img = base + 0.01 * rng.standard_normal((64, 16)).astype(np.float32)
    img = (img / np.linalg.norm(img, axis=1, keepdims=True)).astype(np.float32)
    index = build_ivf_index(img, img.copy(), nlist=4, capacity_factor=1.0, seed=0)
    rows = np.asarray(index.packed_rows).ravel()
    assert sorted(rows[rows >= 0].tolist()) == list(range(64))
    assert index.spill_fraction > 0  # the hot cluster overflowed


def test_full_probe_is_exact():
    rng = np.random.default_rng(3)
    img, txt = _normed(rng, 256, 24), _normed(rng, 256, 24)
    q = _normed(rng, 7, 24)
    index = build_ivf_index(img, txt, nlist=8, seed=1)
    vals, ids = ivf_search(jnp.asarray(q), index, k=10, nprobe=index.nlist, alpha=0.6)
    bv, bi = _brute(q, img, txt, 0.6, 10)
    np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids), bi)


@pytest.mark.parametrize("alpha", [0.0, 0.5, 1.0])
def test_recall_on_clustered_data(alpha):
    rng = np.random.default_rng(4)
    img = _clustered(rng, 2000, 32, 24)
    txt = _clustered(rng, 2000, 32, 24)
    # queries = perturbed corpus rows (the serving situation)
    sel = rng.integers(0, 2000, 16)
    q = img[sel] if alpha >= 0.5 else txt[sel]
    q = q + 0.05 * rng.standard_normal(q.shape).astype(np.float32)
    q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)

    index = build_ivf_index(img, txt, nlist=32, capacity_factor=1.5, seed=2)
    # extreme alphas fight the concat-space clustering (single-tower
    # geometry) — the general-purpose index needs a wider probe there
    nprobe = 8 if alpha == 0.5 else 12
    vals, ids = ivf_search(jnp.asarray(q), index, k=10, nprobe=nprobe, alpha=alpha)
    _, bi = _brute(q, img, txt, alpha, 10)
    hits = np.mean([
        len(set(np.asarray(ids)[i].tolist()) & set(bi[i].tolist())) / 10
        for i in range(len(q))
    ])
    assert hits >= 0.8, f"recall@10 {hits:.2f} too low (alpha={alpha})"
    assert probed_fraction(index, nprobe) < 0.5  # and it probed a subset


def test_search_is_jittable_and_descending():
    rng = np.random.default_rng(5)
    img, txt = _normed(rng, 200, 16), _normed(rng, 200, 16)
    index = build_ivf_index(img, txt, nlist=8, seed=3)
    q = jnp.asarray(_normed(rng, 4, 16))
    fn = jax.jit(lambda q_: ivf_search(q_, index, k=5, nprobe=3))
    vals, ids = fn(q)
    vals = np.asarray(vals)
    assert vals.shape == (4, 5) and np.all(np.diff(vals, axis=1) <= 1e-6)
    assert np.asarray(ids).min() >= 0  # plenty of valid candidates


def test_small_probe_pads_with_sentinels():
    rng = np.random.default_rng(6)
    img, txt = _normed(rng, 20, 8), _normed(rng, 20, 8)
    index = build_ivf_index(img, txt, nlist=4, capacity_factor=1.0, seed=0)
    vals, ids = ivf_search(jnp.asarray(_normed(rng, 2, 8)), index, k=50, nprobe=1)
    ids = np.asarray(ids)
    vals = np.asarray(vals)
    assert ids.shape == (2, 50)
    assert (ids == -1).any()  # fewer than 50 probed candidates
    assert np.all(np.isneginf(vals[ids == -1]))


def test_validation_errors():
    rng = np.random.default_rng(7)
    img, txt = _normed(rng, 40, 8), _normed(rng, 40, 8)
    with pytest.raises(ValueError, match="nlist"):
        kmeans_spherical(jnp.asarray(img), 100)
    with pytest.raises(ValueError, match="mismatch"):
        build_ivf_index(img, txt[:20], nlist=4)
    index = build_ivf_index(img, txt, nlist=4)
    with pytest.raises(ValueError, match="nprobe"):
        ivf_search(jnp.asarray(img[:2]), index, k=5, nprobe=9)


# -- CLIPRetrieval integration -------------------------------------------------


def test_clip_retrieval_ivf_mode(devices8):
    """ann='ivf' through the serving retriever: full probe == exact path."""
    import jax.numpy as jnp

    from knowledge_enhanced_multimodal_retrieval_tpu.data.datasets import (
        DataPipeline,
        make_synthetic_source,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import (
        CLIPRetrieval,
        build_embedding_store,
    )

    tok = CLIPTokenizer([("c", "a"), ("ca", "t</w>"), ("h", "e"), ("he", "l")])
    arch = M.CLIPArch(16, 32, 1, 32, 16, 16, tok.vocab_size, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    src = make_synthetic_source(40, image_size=32)
    pipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=2)
    rt = MeshRuntime.create()
    store = build_embedding_store(model, params, pipe, rt, batch_size=16)

    exact = CLIPRetrieval(model, params, tok, store, top_k=10)
    ann_full = CLIPRetrieval(
        model, params, tok, store, top_k=10,
        ann="ivf", ann_nlist=4, ann_nprobe=4,
    )
    want = exact.retrieval("hello cat", alpha=0.5)
    got = ann_full.retrieval("hello cat", alpha=0.5)
    assert [r["uuid"] for r in got] == [r["uuid"] for r in want]
    np.testing.assert_allclose(
        [r["score"] for r in got], [r["score"] for r in want], rtol=1e-4, atol=1e-5
    )

    # partial probe: results are a subset of the corpus, sorted, spill known
    ann_p = CLIPRetrieval(
        model, params, tok, store, top_k=10,
        ann="ivf", ann_nlist=4, ann_nprobe=2,
    )
    res = ann_p.retrieval("hello cat")
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True) and len(res) > 0
    assert 0.0 <= ann_p.ann_spill_fraction <= 1.0


def test_clip_retrieval_ivf_validation(devices8):
    import jax.numpy as jnp

    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import (
        CLIPRetrieval,
        EmbeddingStore,
    )

    tok = CLIPTokenizer([("c", "a"), ("ca", "t</w>")])
    arch = M.CLIPArch(16, 32, 1, 32, 16, 16, tok.vocab_size, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    emb = _normed(rng, 24, 16)
    store = EmbeddingStore(emb, emb.copy(), [f"uuid-{i}" for i in range(24)])
    with pytest.raises(ValueError, match="unknown ann"):
        CLIPRetrieval(model, params, tok, store, ann="hnsw")
    with pytest.raises(ValueError, match="compose"):
        CLIPRetrieval(model, params, tok, store, ann="ivf", quantize_corpus=True)
