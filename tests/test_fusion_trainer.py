import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.eval.evaluator import EncodedDataset
from knowledge_enhanced_multimodal_retrieval_tpu.models.fusion_heads import FusionModel
from knowledge_enhanced_multimodal_retrieval_tpu.train.fusion_trainer import (
    evaluate_fusion_model,
    train_fusion_head,
)

D = 16


@pytest.fixture
def encoded(rng):
    """Synthetic world where T2I is informative and T2T is noise: a trained
    gate should learn to favour T2I."""
    n = 64
    base = rng.standard_normal((n, D)).astype(np.float32)

    def norm(x):
        return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)

    query = norm(base + 0.1 * rng.standard_normal((n, D)))
    image = norm(base + 0.1 * rng.standard_normal((n, D)))
    target = norm(rng.standard_normal((n, D)))  # pure noise
    return EncodedDataset(image=image, query=query, target=target, uuids=[f"u{i}" for i in range(n)])


def test_train_reduces_loss_and_beats_init(encoded):
    fm = FusionModel("simple_gated_with_bias", embed_dim=D)
    init_params = fm.init(__import__("jax").random.PRNGKey(0))
    init_report = evaluate_fusion_model(fm, init_params, encoded, block_q=16, block_c=32)

    params, history = train_fusion_head(fm, encoded, epochs=30, batch_size=32, lr=5e-2)
    assert history["loss"][-1] < history["loss"][0]

    report = evaluate_fusion_model(fm, params, encoded, block_q=16, block_c=32)
    # init gate ~0.12 favours the noisy T2T tower; training must swing to T2I
    assert report["fusion"]["FUSION_MRR"] > init_report["fusion"]["FUSION_MRR"]


def test_evaluate_fusion_report_shape(encoded):
    import jax

    fm = FusionModel("bilinear", embed_dim=D)
    params = fm.init(jax.random.PRNGKey(0))
    report = evaluate_fusion_model(fm, params, encoded, block_q=16, block_c=32)
    assert "FUSION_R@1" in report["fusion"]
    assert "BASELINE_MRR" in report["baseline"]
    assert set(report["score_stats"]) == {"fused_mean", "fused_std", "baseline_mean", "baseline_std"}
