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


def test_encode_dataset_batch_not_divisible_by_mesh(world):
    """batch_size=10 on an 8-device mesh must still work (padded to 16)."""
    model, params, pipe, rt = world
    enc = E.encode_dataset(model, params, pipe, rt, batch_size=10)
    assert enc.image.shape == (41, 16)
    enc16 = E.encode_dataset(model, params, pipe, rt, batch_size=16)
    np.testing.assert_allclose(enc.image, enc16.image, atol=2e-5)
