import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.eval import metrics as MET


def _np_reference_metrics(sim, ks=(1, 5, 10, 20)):
    """Independent NumPy oracle implementing the reference's argsort semantics."""
    n = sim.shape[0]
    rankings = np.argsort(-sim, axis=1, kind="stable")
    targets = np.arange(n)[:, None]
    positions = np.argmax(rankings == targets, axis=1) + 1
    out = {f"R@{k}": np.mean(positions <= k) * 100.0 for k in ks}
    out["MRR"] = np.mean(1.0 / positions) * 100.0
    out["Mean_Rank"] = np.mean(positions)
    return out


def test_known_answer_matrix():
    # row 0: diagonal best (rank 1); row 1: one better (rank 2); row 2: worst (rank 3)
    sim = np.array(
        [
            [0.9, 0.1, 0.2],
            [0.8, 0.5, 0.1],
            [0.7, 0.6, 0.3],
        ],
        np.float32,
    )
    ranks = np.asarray(MET.diagonal_ranks(sim))
    np.testing.assert_array_equal(ranks, [1, 2, 3])
    r = MET.compute_recall_at_k(sim, [1, 2, 3])
    assert r["R@1"] == pytest.approx(100 / 3)
    assert r["R@2"] == pytest.approx(200 / 3)
    assert r["R@3"] == pytest.approx(100.0)
    m = MET.compute_mrr_and_mean_rank(sim)
    assert m["MRR"] == pytest.approx((1 + 0.5 + 1 / 3) / 3 * 100)
    assert m["Mean_Rank"] == pytest.approx(2.0)


def test_random_matrix_matches_numpy_oracle(rng):
    sim = rng.standard_normal((64, 64)).astype(np.float32)
    ours_r = MET.compute_recall_at_k(sim)
    ours_m = MET.compute_mrr_and_mean_rank(sim)
    ref = _np_reference_metrics(sim)
    for k in (1, 5, 10, 20):
        assert ours_r[f"R@{k}"] == pytest.approx(ref[f"R@{k}"], abs=1e-4)
    assert ours_m["MRR"] == pytest.approx(ref["MRR"], abs=1e-4)
    assert ours_m["Mean_Rank"] == pytest.approx(ref["Mean_Rank"], abs=1e-4)


def test_embedding_metrics_and_prefixes(rng):
    q = rng.standard_normal((32, 16)).astype(np.float32)
    c = rng.standard_normal((32, 16)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    m = MET.compute_retrieval_metrics(q, c, prefix="T2I")
    assert set(m) == {"T2I_R@1", "T2I_R@5", "T2I_R@10", "T2I_R@20", "T2I_MRR", "T2I_Mean_Rank"}
    ref = _np_reference_metrics(q @ c.T)
    assert m["T2I_MRR"] == pytest.approx(ref["MRR"], abs=1e-3)


def test_all_retrieval_metrics_task_wiring(rng):
    q = rng.standard_normal((16, 8)).astype(np.float32)
    t = rng.standard_normal((16, 8)).astype(np.float32)
    i = rng.standard_normal((16, 8)).astype(np.float32)
    all_m = MET.compute_all_retrieval_metrics(q, t, i)
    # T2I uses q->i, I2T uses i->t, T2T uses q->t (metrics.py:198-203)
    assert all_m["T2I_MRR"] == pytest.approx(MET.compute_retrieval_metrics(q, i)["MRR"], abs=1e-4)
    assert all_m["I2T_MRR"] == pytest.approx(MET.compute_retrieval_metrics(i, t)["MRR"], abs=1e-4)
    assert all_m["T2T_MRR"] == pytest.approx(MET.compute_retrieval_metrics(q, t)["MRR"], abs=1e-4)


def test_final_weighted_metrics(rng):
    q = rng.standard_normal((16, 8)).astype(np.float32)
    t = rng.standard_normal((16, 8)).astype(np.float32)
    i = rng.standard_normal((16, 8)).astype(np.float32)
    m = MET.compute_retrieval_metrics_final(q, t, i, t2i_weight=0.7, t2t_weight=0.3)
    ref = _np_reference_metrics(0.7 * (q @ i.T) + 0.3 * (q @ t.T))
    assert m["MRR"] == pytest.approx(ref["MRR"], abs=1e-3)


def test_training_metrics_mrr_only(rng):
    q = rng.standard_normal((8, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)  # diagonal = 1 = row max
    m = MET.compute_training_metrics(q, q, q)
    assert all(("MRR" in k) or ("Mean_Rank" in k) for k in m)
    # identical embeddings -> perfect MRR
    assert m["T2T_MRR"] == pytest.approx(100.0)


def test_average_mrr():
    m = {"T2I_MRR": 50.0, "I2T_MRR": 70.0, "T2T_MRR": 90.0}
    assert MET.average_mrr(m) == pytest.approx(70.0)
    assert MET.average_mrr(m, tasks=("T2I", "T2T")) == pytest.approx(70.0)


def test_rectangular_matrix(rng):
    sim = rng.standard_normal((8, 40)).astype(np.float32)
    ref = _np_reference_metrics(sim, ks=(1, 5))
    ours = MET.compute_recall_at_k(sim, [1, 5])
    assert ours["R@1"] == pytest.approx(ref["R@1"], abs=1e-4)
    assert ours["R@5"] == pytest.approx(ref["R@5"], abs=1e-4)


def test_blocked_ranks_match_dense(rng):
    import jax.numpy as jnp

    q = rng.standard_normal((100, 16)).astype(np.float32)
    c = rng.standard_normal((100, 16)).astype(np.float32)
    dense = np.asarray(MET.diagonal_ranks(jnp.asarray(q) @ jnp.asarray(c).T))
    blocked = np.asarray(MET.diagonal_ranks_blocked(jnp.asarray(q), jnp.asarray(c), block=32))
    np.testing.assert_array_equal(dense, blocked)


def test_blocked_path_triggers_for_large_n(rng, monkeypatch):
    monkeypatch.setattr(MET, "_BLOCK_THRESHOLD", 10)  # force the blocked path
    q = rng.standard_normal((40, 8)).astype(np.float32)
    c = rng.standard_normal((40, 8)).astype(np.float32)
    blocked = MET.compute_retrieval_metrics(q, c)
    monkeypatch.setattr(MET, "_BLOCK_THRESHOLD", 64 * 1024 * 1024)
    dense = MET.compute_retrieval_metrics(q, c)
    for k in dense:
        assert blocked[k] == pytest.approx(dense[k], abs=1e-4), k
