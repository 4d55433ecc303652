import json

import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.baselines.text_models import (
    HashTextEncoder,
    evaluate_text_model,
    grouped_retrieval_metrics,
    load_text_variants,
)


def _np_reference_grouped(sim, col_to_group, ks=(1, 5, 10, 20)):
    """Oracle: the reference's per-row argsort walk (evaluate_text_models.py:193-224)."""
    n = sim.shape[0]
    ranks = []
    for i in range(n):
        ranking = np.argsort(-sim[i], kind="stable")
        ranked_artifacts = col_to_group[ranking]
        ranks.append(int(np.where(ranked_artifacts == i)[0][0]) + 1)
    ranks = np.array(ranks)
    out = {f"T2T_R@{k}": np.mean(ranks <= k) * 100 for k in ks}
    out["T2T_MRR"] = np.mean(1.0 / ranks) * 100
    out["T2T_Mean_Rank"] = np.mean(ranks)
    return out


def test_grouped_metrics_match_argsort_oracle(rng):
    n, v = 16, 4
    sim = rng.standard_normal((n, n * v)).astype(np.float32)
    groups = np.repeat(np.arange(n), v)
    ours = grouped_retrieval_metrics(sim, groups)
    ref = _np_reference_grouped(sim, groups)
    for k in ref:
        assert ours[k] == pytest.approx(ref[k], abs=1e-4), k


def test_grouped_metrics_perfect_case():
    # each query's own candidates score highest -> all ranks 1
    n, v = 6, 3
    sim = np.full((n, n * v), -1.0, np.float32)
    groups = np.repeat(np.arange(n), v)
    for i in range(n):
        sim[i, i * v] = 1.0
    m = grouped_retrieval_metrics(sim, groups, k_values=(1,))
    assert m["T2T_R@1"] == pytest.approx(100.0)
    assert m["T2T_MRR"] == 100.0


def _variants(rng, n=12, v=5):
    """Artifact texts: shared artifact word + variant noise."""
    out = []
    for i in range(n):
        out.append([f"artifact{i} variant{j} common{i}" for j in range(v)])
    return out


def test_single_and_multi_modes_run():
    texts = _variants(np.random.default_rng(0))
    enc = HashTextEncoder(dim=16)
    single = evaluate_text_model(enc, texts, mode="single")
    multi = evaluate_text_model(enc, texts, mode="multi")
    for m in (single, multi):
        assert set(m) == {"T2T_R@1", "T2T_R@5", "T2T_R@10", "T2T_R@20", "T2T_MRR", "T2T_Mean_Rank"}
        assert 0 <= m["T2T_MRR"] <= 100
    with pytest.raises(ValueError):
        evaluate_text_model(enc, texts, mode="nope")


def test_identical_variants_rank_first():
    """If all variants of an artifact are identical text, rank must be 1."""
    texts = [[f"unique-artifact-{i}"] * 5 for i in range(10)]
    enc = HashTextEncoder(dim=16)
    m = evaluate_text_model(enc, texts, mode="multi", k_values=(1,))
    assert m["T2T_R@1"] == pytest.approx(100.0)


def test_load_text_variants(tmp_path):
    d = tmp_path / "texts"
    d.mkdir()
    (d / "u1.json").write_text(json.dumps({"content_descriptions": ["a", " ", "c"]}))
    out = load_text_variants(["u1", "missing"], str(d), "content", num_variants=5)
    assert out[0] == ["a", "", "c", "", ""]
    assert out[1] == [""] * 5
    with pytest.raises(KeyError):
        load_text_variants(["u1"], str(d), "bogus_type")


def test_lm_query_target_baseline():
    from knowledge_enhanced_multimodal_retrieval_tpu.baselines.text_models import (
        evaluate_lm_query_target,
    )

    enc = HashTextEncoder(dim=16)
    queries = [f"find the artifact number {i}" for i in range(12)]
    targets = [f"find the artifact number {i}" for i in range(12)]  # identical -> rank 1
    m = evaluate_lm_query_target(enc, queries, targets)
    assert m["T2T_R@1"] == pytest.approx(100.0)
    m2 = evaluate_lm_query_target(enc, queries, list(reversed(targets)), mrr_only=True)
    assert "T2T_R@1" not in m2 and "T2T_MRR" in m2
    with pytest.raises(ValueError):
        evaluate_lm_query_target(enc, queries, targets[:-1])
