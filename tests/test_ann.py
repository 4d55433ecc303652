"""IVF ANN index (retrieval/ann.py): packing invariants, exactness at full
probe, recall on clustered data, blend-alpha semantics, edge cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import ann
from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.ann import (
    IVFIndex,
    build_ivf_index,
    ivf_search,
    kmeans_spherical,
    probed_fraction,
    sharded_ivf_search,
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


def _brute_q8(q, img, txt, alpha, k):
    """Exact scores over the int8-quantized rows (the int8 ANN oracle)."""

    def q8(x):
        scale = np.maximum(np.max(np.abs(x), axis=1, keepdims=True) / 127.0, 1e-12)
        return np.round(x / scale).astype(np.int8), scale

    iq, is_ = q8(img)
    tq, ts = q8(txt)
    s = alpha * (q @ (iq.astype(np.float32) * is_).T) + (1 - alpha) * (
        q @ (tq.astype(np.float32) * ts).T
    )
    idx = np.argsort(-s, axis=1)[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


def test_int8_index_full_probe_matches_q8_oracle():
    rng = np.random.default_rng(8)
    img, txt = _normed(rng, 256, 24), _normed(rng, 256, 24)
    q = _normed(rng, 6, 24)
    index = build_ivf_index(img, txt, nlist=8, seed=1, quantize="int8")
    assert index.quantized and index.packed_img.dtype == jnp.int8
    vals, ids = ivf_search(jnp.asarray(q), index, k=10, nprobe=index.nlist, alpha=0.6)
    bv, bi = _brute_q8(q, img, txt, 0.6, 10)
    np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids), bi)
    # and the int8 rankings track the exact f32 brute force closely
    _, bi_f32 = _brute(q, img, txt, 0.6, 10)
    overlap = np.mean([
        len(set(bi[i].tolist()) & set(bi_f32[i].tolist())) / 10 for i in range(len(q))
    ])
    assert overlap >= 0.9


def _brute_q4(q, img, txt, alpha, k):
    """Exact scores over int4-dequantized rows (the int4 ANN oracle — same
    rounding as ops.similarity.quantize_corpus_host_q4)."""

    def dq4(x):
        scale = np.maximum(np.max(np.abs(x), axis=1, keepdims=True) / 7.0, 1e-12)
        return np.clip(np.round(x / scale), -8, 7).astype(np.float32) * scale

    s = alpha * (q @ dq4(img).T) + (1 - alpha) * (q @ dq4(txt).T)
    idx = np.argsort(-s, axis=1)[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


def test_int4_index_full_probe_matches_q4_oracle():
    rng = np.random.default_rng(8)
    img, txt = _normed(rng, 256, 24), _normed(rng, 256, 24)
    q = _normed(rng, 6, 24)
    index = build_ivf_index(img, txt, nlist=8, seed=1, quantize="int4")
    assert index.is_int4 and index.mode == "int4" and not index.quantized
    assert index.packed_img.shape[-1] == 12  # nibble-packed D/2 bytes
    vals, ids = ivf_search(jnp.asarray(q), index, k=10, nprobe=index.nlist, alpha=0.6)
    bv, bi = _brute_q4(q, img, txt, 0.6, 10)
    np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids), bi)
    # int4 rankings still track the exact f32 brute force (coarser than int8)
    _, bi_f32 = _brute(q, img, txt, 0.6, 10)
    overlap = np.mean([
        len(set(bi[i].tolist()) & set(bi_f32[i].tolist())) / 10 for i in range(len(q))
    ])
    assert overlap >= 0.6


def test_int4_build_requires_even_dim():
    rng = np.random.default_rng(8)
    img, txt = _normed(rng, 64, 15), _normed(rng, 64, 15)
    with pytest.raises(ValueError, match="even"):
        build_ivf_index(img, txt, nlist=4, quantize="int4")


def test_train_rows_subsample_still_exact_at_full_probe():
    rng = np.random.default_rng(9)
    img, txt = _normed(rng, 300, 16), _normed(rng, 300, 16)
    q = _normed(rng, 4, 16)
    index = build_ivf_index(img, txt, nlist=8, seed=2, train_rows=64)
    vals, ids = ivf_search(jnp.asarray(q), index, k=8, nprobe=index.nlist)
    bv, bi = _brute(q, img, txt, 0.5, 8)
    np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids), bi)


# -- IVF-PQ (pq-packed inverted lists; FAISS IndexIVFPQ shape) ------------------


def _brute_pq_adc(q, index, alpha, k):
    """Host oracle of the IVF-PQ full-probe ranking: per-tower flat ADC scan
    (ops.pq.blended_scores_pq_adc — identical per-element math to the probe's
    LUT walk) over the index's OWN packed residual codes, plus the owning
    cluster's centroid dot (residual encoding), mapped back to row ids."""
    from knowledge_enhanced_multimodal_retrieval_tpu.ops.pq import (
        blended_scores_pq_adc,
    )

    nlist, cap, m = index.packed_img.shape
    ci = jnp.asarray(index.packed_img).reshape(nlist * cap, m)
    ct = jnp.asarray(index.packed_txt).reshape(nlist * cap, m)
    si = jnp.asarray(index.packed_img_scale).reshape(nlist * cap, 1)
    st = jnp.asarray(index.packed_txt_scale).reshape(nlist * cap, 1)
    qj = jnp.asarray(q)
    # alpha=1 / alpha=0 isolate the per-tower residual ADC sums
    t2i = np.asarray(
        blended_scores_pq_adc(qj, ci, si, ct, st, index.cb_img, index.cb_txt, 1.0)
    )
    t2t = np.asarray(
        blended_scores_pq_adc(qj, ci, si, ct, st, index.cb_img, index.cb_txt, 0.0)
    )
    cluster = np.repeat(np.arange(nlist), cap)  # owning cluster per slot
    cs_i = np.asarray(q, np.float32) @ np.asarray(index.centroids_img).T
    cs_t = np.asarray(q, np.float32) @ np.asarray(index.centroids_txt).T
    s = alpha * (cs_i[:, cluster] + t2i) + (1.0 - alpha) * (cs_t[:, cluster] + t2t)
    rows = np.asarray(index.packed_rows).ravel()
    s = np.where(rows[None, :] >= 0, s, -np.inf)
    pos = np.argsort(-s, axis=1)[:, :k]
    return np.take_along_axis(s, pos, axis=1), rows[pos]


def test_pq_index_full_probe_matches_adc_oracle():
    rng = np.random.default_rng(13)
    img, txt = _normed(rng, 256, 32), _normed(rng, 256, 32)
    q = _normed(rng, 6, 32)
    index = build_ivf_index(img, txt, nlist=8, seed=1, quantize="pq", pq_m=8)
    assert index.is_pq and index.mode == "pq"
    assert index.packed_img.dtype == jnp.uint8
    assert index.packed_img.shape[-1] == 8  # M codes per row, not D floats
    vals, ids = ivf_search(jnp.asarray(q), index, k=10, nprobe=index.nlist, alpha=0.6)
    bv, bi = _brute_pq_adc(q, index, 0.6, 10)
    np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids), bi)


def test_pq_index_default_m_is_dim_over_8():
    rng = np.random.default_rng(14)
    img, txt = _normed(rng, 64, 32), _normed(rng, 64, 32)
    index = build_ivf_index(img, txt, nlist=4, seed=0, quantize="pq")
    assert index.packed_img.shape[-1] == 4  # 32 / 8


def test_pq_index_recall_on_clustered_data():
    rng = np.random.default_rng(15)
    img = _clustered(rng, 2000, 32, 24)
    txt = _clustered(rng, 2000, 32, 24)
    sel = rng.integers(0, 2000, 16)
    q = img[sel] + 0.05 * rng.standard_normal((16, 32)).astype(np.float32)
    q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
    index = build_ivf_index(img, txt, nlist=32, seed=2, quantize="pq", pq_m=8)
    vals, ids = ivf_search(jnp.asarray(q), index, k=10, nprobe=8, alpha=0.5)
    _, bi = _brute(q, img, txt, 0.5, 10)
    hits = np.mean([
        len(set(np.asarray(ids)[i].tolist()) & set(bi[i].tolist())) / 10
        for i in range(len(q))
    ])
    # PQ rounding stacks on the probe approximation — still most of the
    # exact top-10 at a quarter of the corpus probed
    assert hits >= 0.6, f"ivf-pq recall@10 {hits:.2f} too low"
    assert probed_fraction(index, 8) < 0.5


def test_sharded_ivf_pq_full_probe_matches_unsharded(devices8):
    from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime

    rt = MeshRuntime.create()
    rng = np.random.default_rng(16)
    img, txt = _normed(rng, 320, 32), _normed(rng, 320, 32)
    q = _normed(rng, 5, 32)
    index = build_ivf_index(
        img, txt, nlist=16, seed=3, quantize="pq", pq_m=8, mesh=rt.mesh
    )
    assert not index.packed_img.sharding.is_fully_replicated
    vals, ids = sharded_ivf_search(
        jnp.asarray(q), index, k=10, nprobe=index.nlist, mesh=rt.mesh, alpha=0.4
    )
    bv, bi = _brute_pq_adc(q, index, 0.4, 10)
    np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids), bi)


def test_pq_index_save_load_roundtrip(tmp_path):
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.ann import (
        load_ivf_index,
        save_ivf_index,
    )

    rng = np.random.default_rng(17)
    img, txt = _normed(rng, 128, 32), _normed(rng, 128, 32)
    q = _normed(rng, 4, 32)
    index = build_ivf_index(img, txt, nlist=8, seed=4, quantize="pq", pq_m=8)
    path = str(tmp_path / "ivfpq.npz")
    save_ivf_index(path, index)
    loaded = load_ivf_index(path)
    assert loaded.is_pq and loaded.packed_img.shape == index.packed_img.shape
    v0, i0 = ivf_search(jnp.asarray(q), index, k=8, nprobe=4)
    v1, i1 = ivf_search(jnp.asarray(q), loaded, k=8, nprobe=4)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)


@pytest.mark.parametrize("quantize", [None, "int8", "int4"])
def test_sharded_ivf_full_probe_exact(devices8, quantize):
    """Cluster-sharded IVF over the 8-device mesh: probing every cluster
    (nprobe == nlist) equals brute force, winners merge across shards."""
    from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime

    rt = MeshRuntime.create()
    rng = np.random.default_rng(10)
    img, txt = _normed(rng, 320, 16), _normed(rng, 320, 16)
    q = _normed(rng, 5, 16)
    index = build_ivf_index(
        img, txt, nlist=16, seed=3, quantize=quantize, mesh=rt.mesh
    )
    assert not index.packed_img.sharding.is_fully_replicated
    vals, ids = sharded_ivf_search(
        jnp.asarray(q), index, k=10, nprobe=index.nlist, mesh=rt.mesh, alpha=0.4
    )
    if quantize == "int8":
        bv, bi = _brute_q8(q, img, txt, 0.4, 10)
    elif quantize == "int4":
        bv, bi = _brute_q4(q, img, txt, 0.4, 10)
    else:
        bv, bi = _brute(q, img, txt, 0.4, 10)
    np.testing.assert_allclose(np.asarray(vals), bv, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids), bi)


def test_sharded_ivf_partial_probe_balanced(devices8):
    """Partial probe: ceil(nprobe/n) clusters per shard, valid sorted
    results with decent recall on clustered data."""
    from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime

    rt = MeshRuntime.create()
    rng = np.random.default_rng(11)
    img = _clustered(rng, 1600, 32, 24)
    txt = _clustered(rng, 1600, 32, 24)
    sel = rng.integers(0, 1600, 12)
    q = img[sel] + 0.05 * rng.standard_normal((12, 32)).astype(np.float32)
    q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
    index = build_ivf_index(img, txt, nlist=32, seed=4, mesh=rt.mesh)
    vals, ids = sharded_ivf_search(
        jnp.asarray(q), index, k=10, nprobe=16, mesh=rt.mesh, alpha=0.5
    )
    vals, ids = np.asarray(vals), np.asarray(ids)
    assert np.all(np.diff(vals[np.isfinite(vals).all(1)], axis=1) <= 1e-6)
    _, bi = _brute(q, img, txt, 0.5, 10)
    hits = np.mean([
        len(set(ids[i][ids[i] >= 0].tolist()) & set(bi[i].tolist())) / 10
        for i in range(len(q))
    ])
    assert hits >= 0.8, f"sharded recall@10 {hits:.2f}"


def test_build_rejects_undivisible_nlist(devices8):
    from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime

    rt = MeshRuntime.create()
    rng = np.random.default_rng(12)
    img = _normed(rng, 64, 8)
    with pytest.raises(ValueError, match="divide"):
        build_ivf_index(img, img.copy(), nlist=6, mesh=rt.mesh)
    with pytest.raises(ValueError, match="quantize"):
        build_ivf_index(img, img.copy(), nlist=8, quantize="fp8")


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


def test_clip_retrieval_ivf_composes_with_int8_and_sharding(devices8):
    """ann='ivf' x quantize_corpus x shard_corpus: every combination serves,
    and full-probe rankings match the corresponding exact path."""
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
    src = make_synthetic_source(48, image_size=32)
    pipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=2)
    rt = MeshRuntime.create()
    store = build_embedding_store(model, params, pipe, rt, batch_size=16)

    exact = CLIPRetrieval(model, params, tok, store, top_k=8)
    want = [r["uuid"] for r in exact.retrieval("hello cat", alpha=0.5)]

    for kw in (
        dict(quantize_corpus=True),
        dict(rt=rt, shard_corpus=True),
        dict(rt=rt, shard_corpus=True, quantize_corpus=True),
    ):
        r = CLIPRetrieval(
            model, params, tok, store, top_k=8,
            ann="ivf", ann_nlist=8, ann_nprobe=8, **kw,
        )
        got = r.retrieval("hello cat", alpha=0.5)
        # int8 variants quantize the corpus rows: rankings track the exact
        # path; pure sharding is exact
        if kw.get("quantize_corpus"):
            assert len(set(g["uuid"] for g in got) & set(want)) >= 7, kw
            assert got[0]["uuid"] == want[0], kw
        else:
            assert [g["uuid"] for g in got] == want, kw

    # live update composes too: re-clusters the sharded int8 index
    r.add_documents(
        np.asarray(exact.encode_queries(["hello cat"]), np.float32),
        np.asarray(exact.encode_queries(["hello cat"]), np.float32),
        ["hot-doc"],
    )
    assert r.retrieval("hello cat", alpha=0.5)[0]["uuid"] == "hot-doc"


def test_clip_retrieval_ivfpq_mode(devices8):
    """ann='ivf' x quantize_corpus='pq' (IVF-PQ) through the retriever:
    serves sorted valid results; with full probe + host rerank the final
    ranking is EXACT (candidates cover the top-k, f32 rescoring wins)."""
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
    src = make_synthetic_source(48, image_size=32)
    pipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=2)
    rt = MeshRuntime.create()
    store = build_embedding_store(model, params, pipe, rt, batch_size=16)

    exact = CLIPRetrieval(model, params, tok, store, top_k=5)
    want = exact.retrieval("hello cat", alpha=0.5)

    ivfpq = CLIPRetrieval(
        model, params, tok, store, top_k=5,
        ann="ivf", ann_nlist=8, ann_nprobe=4, quantize_corpus="pq", pq_m=4,
    )
    got = ivfpq.retrieval("hello cat", alpha=0.5)
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True) and len(got) > 0

    # full probe + rerank: candidates cover the whole corpus, host f32
    # rescoring restores the exact ordering bit for bit
    reranked = CLIPRetrieval(
        model, params, tok, store, top_k=5,
        ann="ivf", ann_nlist=8, ann_nprobe=8, quantize_corpus="pq", pq_m=4,
        rerank=True, rerank_factor=10,
    )
    got = reranked.retrieval("hello cat", alpha=0.5)
    assert [r["uuid"] for r in got] == [r["uuid"] for r in want]
    np.testing.assert_allclose(
        [r["score"] for r in got], [r["score"] for r in want], rtol=1e-5, atol=1e-6
    )

    # sharded IVF-PQ: the build is deterministic per seed, so the sharded
    # full probe must reproduce the unsharded full-probe ranking exactly
    # (codes shard cluster-major, codebooks ride replicated)
    full = CLIPRetrieval(
        model, params, tok, store, top_k=5,
        ann="ivf", ann_nlist=8, ann_nprobe=8, quantize_corpus="pq", pq_m=4,
    )
    sharded = CLIPRetrieval(
        model, params, tok, store, top_k=5,
        ann="ivf", ann_nlist=8, ann_nprobe=8, quantize_corpus="pq", pq_m=4,
        rt=rt, shard_corpus=True,
    )
    want_s = full.retrieval("hello cat", alpha=0.5)
    got_s = sharded.retrieval("hello cat", alpha=0.5)
    assert [r["uuid"] for r in got_s] == [r["uuid"] for r in want_s]

    # live update: re-clusters, retrains residual codebooks, and the new
    # doc (the query's own embedding) wins top-1
    emb = np.asarray(exact.encode_queries(["hello cat"]), np.float32)
    ivfpq.add_documents(emb, emb.copy(), ["hot-doc"])
    assert ivfpq.retrieval("hello cat", alpha=0.5)[0]["uuid"] == "hot-doc"


def test_clip_retrieval_ivf_int4_mode(devices8):
    """ann='ivf' x quantize_corpus='int4' (the IVFSQ4 rung) through the
    retriever: serves sorted valid results; full probe + host rerank is
    EXACT; sharded full probe reproduces the unsharded ranking; live
    updates rebuild the nibble-packed lists."""
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
    src = make_synthetic_source(48, image_size=32)
    pipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=2)
    rt = MeshRuntime.create()
    store = build_embedding_store(model, params, pipe, rt, batch_size=16)

    exact = CLIPRetrieval(model, params, tok, store, top_k=5)
    want = exact.retrieval("hello cat", alpha=0.5)

    ivf4 = CLIPRetrieval(
        model, params, tok, store, top_k=5,
        ann="ivf", ann_nlist=8, ann_nprobe=4, quantize_corpus="int4",
    )
    got = ivf4.retrieval("hello cat", alpha=0.5)
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True) and len(got) > 0

    # full probe + rerank: candidates cover the whole corpus, host f32
    # rescoring restores the exact ordering
    reranked = CLIPRetrieval(
        model, params, tok, store, top_k=5,
        ann="ivf", ann_nlist=8, ann_nprobe=8, quantize_corpus="int4",
        rerank=True, rerank_factor=10,
    )
    got = reranked.retrieval("hello cat", alpha=0.5)
    assert [r["uuid"] for r in got] == [r["uuid"] for r in want]
    np.testing.assert_allclose(
        [r["score"] for r in got], [r["score"] for r in want], rtol=1e-5, atol=1e-6
    )

    # sharded int4 IVF: deterministic build, so the sharded full probe must
    # reproduce the unsharded full-probe ranking exactly
    full = CLIPRetrieval(
        model, params, tok, store, top_k=5,
        ann="ivf", ann_nlist=8, ann_nprobe=8, quantize_corpus="int4",
    )
    sharded = CLIPRetrieval(
        model, params, tok, store, top_k=5,
        ann="ivf", ann_nlist=8, ann_nprobe=8, quantize_corpus="int4",
        rt=rt, shard_corpus=True,
    )
    want_s = full.retrieval("hello cat", alpha=0.5)
    got_s = sharded.retrieval("hello cat", alpha=0.5)
    assert [r["uuid"] for r in got_s] == [r["uuid"] for r in want_s]

    # live update: re-clusters and repacks nibbles; the new doc (the
    # query's own embedding) wins top-1
    emb = np.asarray(exact.encode_queries(["hello cat"]), np.float32)
    ivf4.add_documents(emb, emb.copy(), ["hot-doc"])
    assert ivf4.retrieval("hello cat", alpha=0.5)[0]["uuid"] == "hot-doc"


def test_clip_retrieval_ivf_shard_too_small(devices8):
    import jax.numpy as jnp

    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import (
        CLIPRetrieval,
        EmbeddingStore,
    )

    tok = CLIPTokenizer([("c", "a")])
    arch = M.CLIPArch(16, 32, 1, 32, 16, 16, tok.vocab_size, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    emb = _normed(rng, 4, 16)  # fewer rows than mesh devices
    store = EmbeddingStore(emb, emb.copy(), [f"u{i}" for i in range(4)])
    rt = MeshRuntime.create()
    with pytest.raises(ValueError, match="cannot shard"):
        CLIPRetrieval(model, params, tok, store, ann="ivf", rt=rt, shard_corpus=True)


def test_kmeans_maxmin_init_covers_blobs():
    """Farthest-point seeding: with nlist == blob count on well-separated
    blobs, every blob receives a seed (random seeding usually doubles up),
    so Lloyd converges with one centroid per blob and zero spill."""
    rng = np.random.default_rng(3)
    blobs = 12
    centers = rng.standard_normal((blobs, 24))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[np.repeat(np.arange(blobs), 50)] + 0.03 * rng.standard_normal((blobs * 50, 24))
    x = (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)
    cent = np.asarray(ann.kmeans_spherical(jnp.asarray(x), blobs, iters=8, init="maxmin"))
    # each true blob center has a centroid within the blob's radius
    sims = centers @ cent.T  # [blobs, nlist]
    assert (sims.max(axis=1) > 0.98).all()


def test_kmeans_init_validation():
    rng = np.random.default_rng(0)
    x = jnp.asarray(_normed(rng, 32, 8))
    with pytest.raises(ValueError, match="init"):
        ann.kmeans_spherical(x, 4, init="fancy")


def test_build_accepts_random_init():
    rng = np.random.default_rng(0)
    img, txt = _normed(rng, 64, 8), _normed(rng, 64, 8)
    index = ann.build_ivf_index(img, txt, 4, kmeans_init="random")
    assert index.nlist == 4


def test_index_save_load_roundtrip(tmp_path, devices8):
    """Persisted index reloads bit-identical (both precisions) and a mesh
    reload re-places cluster-sharded with identical search results."""
    import os

    from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime

    rng = np.random.default_rng(0)
    img, txt = _normed(rng, 96, 16), _normed(rng, 96, 16)
    q = _normed(rng, 5, 16)
    for quant in (None, "int8", "int4"):
        index = ann.build_ivf_index(img, txt, 8, quantize=quant)
        path = os.path.join(tmp_path, f"ivf_{quant}.npz")
        ann.save_ivf_index(path, index)
        loaded = ann.load_ivf_index(path)
        assert loaded.quantized == (quant == "int8")
        assert loaded.mode == (quant or "exact")  # int4 detected from shape
        v1, i1 = ann.ivf_search(jnp.asarray(q), index, k=5, nprobe=3)
        v2, i2 = ann.ivf_search(jnp.asarray(q), loaded, k=5, nprobe=3)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        # mesh reload: cluster-sharded, same results via the sharded probe
        rt = MeshRuntime.create()
        sharded = ann.load_ivf_index(path, mesh=rt.mesh)
        assert not sharded.packed_rows.sharding.is_fully_replicated
        v3, i3 = ann.sharded_ivf_search(
            jnp.asarray(q), sharded, k=5, nprobe=8, mesh=rt.mesh
        )
        vf, if_ = ann.ivf_search(jnp.asarray(q), index, k=5, nprobe=8)
        np.testing.assert_array_equal(np.asarray(i3), np.asarray(if_))


def test_index_load_rejects_bad_mesh(tmp_path, devices8):
    import os

    from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime

    rng = np.random.default_rng(0)
    img, txt = _normed(rng, 64, 16), _normed(rng, 64, 16)
    index = ann.build_ivf_index(img, txt, 6)  # 6 clusters, 8-device mesh
    path = os.path.join(tmp_path, "ivf.npz")
    ann.save_ivf_index(path, index)
    rt = MeshRuntime.create()
    with pytest.raises(ValueError, match="divide"):
        ann.load_ivf_index(path, mesh=rt.mesh)


def test_retriever_ann_index_cache(tmp_path, devices8, monkeypatch):
    """ann_index_path: first construction builds + saves; a 'restart' loads
    the cache (no rebuild); a corpus change invalidates the fingerprint and
    rebuilds; identical results either way."""
    import os

    from knowledge_enhanced_multimodal_retrieval_tpu.data.datasets import (
        DataPipeline,
        make_synthetic_source,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import clip_retrieval as CR
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.embedding_store import (
        build_embedding_store,
    )
    from tests.test_retrieval_engine import MERGES

    tok = CLIPTokenizer(MERGES)
    arch = M.CLIPArch(16, 32, 1, 32, 16, 16, tok.vocab_size, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    src = make_synthetic_source(40, image_size=32)
    pipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=2)
    rt = MeshRuntime.create()
    store = build_embedding_store(model, params, pipe, rt, batch_size=16)

    builds = []
    orig_build = CR.build_ivf_index

    def counting_build(*a, **kw):
        builds.append(1)
        return orig_build(*a, **kw)

    monkeypatch.setattr(CR, "build_ivf_index", counting_build)
    path = os.path.join(tmp_path, "ivf_cache.npz")
    kw = dict(top_k=5, ann="ivf", ann_nlist=4, ann_nprobe=4, ann_index_path=path)
    r1 = CR.CLIPRetrieval(model, params, tok, store, **kw)
    assert len(builds) == 1 and os.path.exists(path)
    a = r1.retrieval("hello cat")
    r2 = CR.CLIPRetrieval(model, params, tok, store, **kw)  # "restart"
    assert len(builds) == 1  # loaded from cache, no rebuild
    b = r2.retrieval("hello cat")
    assert [x["uuid"] for x in a] == [x["uuid"] for x in b]
    # live update rebuilds IN MEMORY only (no per-update disk write —
    # a multi-GB sync save per single-doc ingest would serialize updates)
    rng2 = np.random.default_rng(5)
    new = rng2.standard_normal((1, store.dim)).astype(np.float32)
    new /= np.linalg.norm(new, axis=1, keepdims=True)
    r2.add_documents(new, new, ["fresh"])
    assert len(builds) == 2
    # a restart on the UPDATED corpus finds the cache stale (fingerprint
    # mismatch) and rebuilds + re-saves once
    r3 = CR.CLIPRetrieval(model, params, tok, r2._corpus_real_store(), **kw)
    assert len(builds) == 3
    # ...after which the next restart loads the fresh cache
    CR.CLIPRetrieval(model, params, tok, r2._corpus_real_store(), **kw)
    assert len(builds) == 3


def test_index_fingerprint_mismatch_raises(tmp_path):
    import os

    rng = np.random.default_rng(0)
    img, txt = _normed(rng, 64, 16), _normed(rng, 64, 16)
    index = ann.build_ivf_index(img, txt, 4)
    path = os.path.join(tmp_path, "ivf.npz")
    fp = ann.corpus_fingerprint(img, txt)
    ann.save_ivf_index(path, index, fingerprint=fp)
    assert ann.load_ivf_index(path, expected_fingerprint=fp).nlist == 4
    other = ann.corpus_fingerprint(txt, img)  # different corpus
    with pytest.raises(ValueError, match="fingerprint"):
        ann.load_ivf_index(path, expected_fingerprint=other)
    # an index saved WITHOUT a fingerprint is rejected when one is expected
    ann.save_ivf_index(path, index)
    with pytest.raises(ValueError, match="fingerprint"):
        ann.load_ivf_index(path, expected_fingerprint=fp)


def test_fingerprint_catches_trailing_row_change():
    """Every row contributes (row sums): trailing/mid edits a strided
    sample would miss change the fingerprint."""
    rng = np.random.default_rng(0)
    img, txt = _normed(rng, 1000, 16), _normed(rng, 1000, 16)
    base = ann.corpus_fingerprint(img, txt)
    img2 = img.copy()
    img2[-1] = _normed(rng, 1, 16)[0]  # last row (never in a 64-stride sample)
    assert ann.corpus_fingerprint(img2, txt) != base
    img3 = img.copy()
    img3[501] = _normed(rng, 1, 16)[0]  # mid-corpus single row
    assert ann.corpus_fingerprint(img3, txt) != base


def test_save_index_rejects_bare_path(tmp_path):
    import os

    rng = np.random.default_rng(0)
    img, txt = _normed(rng, 32, 8), _normed(rng, 32, 8)
    index = ann.build_ivf_index(img, txt, 4)
    with pytest.raises(ValueError, match="npz"):
        ann.save_ivf_index(os.path.join(tmp_path, "bare"), index)


def test_corrupt_index_cache_rebuilds(tmp_path, devices8, monkeypatch):
    """A truncated cache file must rebuild, not crash startup."""
    import os

    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval import clip_retrieval as CR
    from tests.test_retrieval_engine import MERGES
    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.embedding_store import EmbeddingStore

    tok = CLIPTokenizer(MERGES)
    arch = M.CLIPArch(16, 32, 1, 32, 16, 16, tok.vocab_size, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    store = EmbeddingStore(_normed(rng, 40, 16), _normed(rng, 40, 16), [f"u{i}" for i in range(40)])
    path = os.path.join(tmp_path, "cache.npz")
    with open(path, "wb") as f:
        f.write(b"definitely not a zip file")
    r = CR.CLIPRetrieval(
        model, params, tok, store, top_k=5,
        ann="ivf", ann_nlist=4, ann_nprobe=4, ann_index_path=path,
    )
    assert r.retrieval("hello")  # rebuilt and serving
    # the rebuild overwrote the corrupt file with a loadable one
    assert ann.load_ivf_index(path).nlist == 4
