import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.data.datasets import DataPipeline, make_synthetic_source
from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
from knowledge_enhanced_multimodal_retrieval_tpu.eval import evaluator as E
from knowledge_enhanced_multimodal_retrieval_tpu.eval import metrics as MET
from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime

MERGES = [("c", "a"), ("ca", "t</w>"), ("h", "e"), ("he", "l")]


@pytest.fixture(scope="module")
def world(devices8):
    tok = CLIPTokenizer(MERGES)
    arch = M.CLIPArch(16, 32, 1, 32, 16, 16, tok.vocab_size, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    src = make_synthetic_source(41, image_size=32)  # non-divisible on purpose
    pipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=2)
    rt = MeshRuntime.create()
    return model, params, pipe, rt


def test_encode_dataset_order_and_shapes(world):
    model, params, pipe, rt = world
    enc = E.encode_dataset(model, params, pipe, rt, batch_size=16)
    assert enc.image.shape == (41, 16)
    assert enc.query.shape == (41, 16)
    assert enc.uuids == [f"uuid-{i:06d}" for i in range(41)]
    np.testing.assert_allclose(np.linalg.norm(enc.image, axis=1), 1.0, rtol=1e-4)


def test_encode_dataset_fast_matches_flax(world):
    """The fused-plan encode path reproduces the flax encode (both towers)."""
    model, params, pipe, rt = world
    base = E.encode_dataset(model, params, pipe, rt, batch_size=16)
    fast = E.encode_dataset(model, params, pipe, rt, batch_size=16, use_fast=True)
    np.testing.assert_allclose(fast.image, base.image, atol=1e-4)
    np.testing.assert_allclose(fast.query, base.query, atol=1e-4)
    np.testing.assert_allclose(fast.target, base.target, atol=1e-4)
    assert fast.uuids == base.uuids


def test_encode_dataset_int8_cosine(world):
    """int8 precompute: embeddings stay within quantization tolerance."""
    model, params, pipe, rt = world
    base = E.encode_dataset(model, params, pipe, rt, batch_size=16)
    q8 = E.encode_dataset(model, params, pipe, rt, batch_size=16, quantize="int8")
    for a, b in ((q8.image, base.image), (q8.query, base.query), (q8.target, base.target)):
        cos = np.sum(a * b, -1)  # both l2-normalized
        assert cos.min() > 0.999, cos.min()


def test_run_full_evaluation_rejects_bad_encoder(world):
    model, params, pipe, rt = world
    with pytest.raises(ValueError):
        E.run_full_evaluation(model, params, pipe, rt, encoder="fp16")


def test_encode_padding_no_garbage(world):
    """Padded tail rows must not leak into the output (41 % 16 != 0)."""
    model, params, pipe, rt = world
    enc16 = E.encode_dataset(model, params, pipe, rt, batch_size=16)
    enc41 = E.encode_dataset(model, params, pipe, rt, batch_size=41 + 7)  # one padded batch
    np.testing.assert_allclose(enc16.image, enc41.image, atol=2e-5)
    np.testing.assert_allclose(enc16.target, enc41.target, atol=2e-5)


def test_full_evaluation_report(world, tmp_path):
    model, params, pipe, rt = world
    out = os.path.join(tmp_path, "eval.json")
    t2s = {"uuid-000000": ["uuid-000001"], "uuid-000002": []}
    report = E.run_full_evaluation(
        model, params, pipe, rt, batch_size=16, text2sparql_results=t2s, output_json=out
    )
    assert report["num_samples"] == 41
    per_task = report["per_task"]
    for task in ("T2I", "I2T", "T2T"):
        assert f"{task}_R@1" in per_task and f"{task}_MRR" in per_task
    assert "R@1" in report["weighted"]
    sweep = report["fusion_sweep"]
    assert len(sweep) == 2 * 9  # 2 weight pairs x 9 alphas
    assert "t2i0.5_t2t0.5_alpha0.9" in sweep
    saved = json.load(open(out))
    assert saved["num_samples"] == 41


def test_weighted_eval_consistency(world):
    model, params, pipe, rt = world
    enc = E.encode_dataset(model, params, pipe, rt, batch_size=16)
    w = E.evaluate_weighted(enc, 0.7, 0.3)
    direct = MET.compute_retrieval_metrics_final(enc.query, enc.target, enc.image, t2i_weight=0.7, t2t_weight=0.3)
    assert w == direct


def test_fusion_sweep_alpha1_equals_pure_clip(world):
    """alpha=1.0 cell must equal the pure blended-CLIP metrics."""
    model, params, pipe, rt = world
    enc = E.encode_dataset(model, params, pipe, rt, batch_size=16)
    sweep = E.fusion_sweep(enc, {}, weight_pairs=((0.5, 0.5),), alphas=(1.0,))
    pure = E.evaluate_weighted(enc, 0.5, 0.5)
    cell = sweep["t2i0.5_t2t0.5_alpha1.0"]
    assert cell["MRR"] == pytest.approx(pure["MRR"], abs=1e-3)


def _random_encoded(n: int, d: int = 16, seed: int = 0) -> E.EncodedDataset:
    r = np.random.default_rng(seed)

    def unit(x):
        return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)

    return E.EncodedDataset(
        image=unit(r.standard_normal((n, d))),
        query=unit(r.standard_normal((n, d))),
        target=unit(r.standard_normal((n, d))),
        uuids=[f"u{i}" for i in range(n)],
    )


def _dense_sweep_cell(enc, t2s, w_t2i, w_t2t, alpha):
    """Oracle: the materialized-matrix fusion the blocked path replaces."""
    from knowledge_enhanced_multimodal_retrieval_tpu.eval import fusion as F

    hits, _ = F.build_hit_matrix(t2s, enc.uuids, enc.uuids)
    clip_sim = w_t2i * (enc.query @ enc.image.T) + w_t2t * (enc.query @ enc.target.T)
    fused = alpha * clip_sim + (1.0 - alpha) * hits
    return F.evaluate_retrieval(fused)


def test_fusion_sweep_blocked_matches_dense():
    """Stripe-blocked sweep (odd block → padding + multiple stripes) must
    reproduce the dense-matrix fusion metrics exactly."""
    enc = _random_encoded(41)
    r = np.random.default_rng(1)
    t2s = {
        f"u{i}": [f"u{j}" for j in r.choice(41, size=r.integers(0, 6), replace=False)]
        for i in range(0, 41, 3)
    }
    t2s["u1"] = ["http://kg.example/artefact/u2", "not-in-corpus", "u2"]  # URI form + dup + miss
    sweep = E.fusion_sweep(enc, t2s, weight_pairs=((0.5, 0.5), (0.1, 0.9)), alphas=(0.9, 0.5, 0.1), block=7)
    for (w_t2i, w_t2t) in ((0.5, 0.5), (0.1, 0.9)):
        for alpha in (0.9, 0.5, 0.1):
            expected = _dense_sweep_cell(enc, t2s, w_t2i, w_t2t, alpha)
            got = sweep[f"t2i{w_t2i}_t2t{w_t2t}_alpha{alpha}"]
            for k in expected:
                assert got[k] == pytest.approx(expected[k], rel=1e-5), (k, w_t2i, alpha)


def test_final_metrics_blocked_matches_dense(monkeypatch):
    """compute_retrieval_metrics_final must route through the blocked ranker
    above the threshold and produce identical metrics."""
    enc = _random_encoded(50, seed=3)
    dense = MET.compute_retrieval_metrics_final(enc.query, enc.target, enc.image, t2i_weight=0.7, t2t_weight=0.3)
    monkeypatch.setattr(MET, "_BLOCK_THRESHOLD", 100)  # 50*50 > 100 → blocked
    monkeypatch.setattr(MET, "_RANK_BLOCK", 16)
    blocked = MET.compute_retrieval_metrics_final(enc.query, enc.target, enc.image, t2i_weight=0.7, t2t_weight=0.3)
    for k in dense:
        assert blocked[k] == pytest.approx(dense[k], rel=1e-5), k


@pytest.mark.slow
def test_fusion_sweep_43k_scale_smoke():
    """One sweep cell at the real 43k corpus scale: must complete in stripe
    blocks (peak device memory O(block * N), far under 2 GB)."""
    n = 43_000
    enc = _random_encoded(n, d=16, seed=5)
    t2s = {f"u{i}": [f"u{i}"] for i in range(0, n, 97)}
    sweep = E.fusion_sweep(enc, t2s, weight_pairs=((0.5, 0.5),), alphas=(0.5,), block=2048)
    cell = sweep["t2i0.5_t2t0.5_alpha0.5"]
    assert 0.0 <= cell["MRR"] <= 100.0 and cell["Mean_Rank"] >= 1.0


def test_encode_dataset_batch_not_divisible_by_mesh(world):
    """batch_size=10 on an 8-device mesh must still work (padded to 16)."""
    model, params, pipe, rt = world
    enc = E.encode_dataset(model, params, pipe, rt, batch_size=10)
    assert enc.image.shape == (41, 16)
    enc16 = E.encode_dataset(model, params, pipe, rt, batch_size=16)
    np.testing.assert_allclose(enc.image, enc16.image, atol=2e-5)
