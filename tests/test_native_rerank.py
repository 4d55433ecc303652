"""Native + NumPy host-rescore parity (native/rerank.cpp, rerank_scores_host)."""

import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.native.rerank_wrapper import (
    rerank_scores_native,
)
from knowledge_enhanced_multimodal_retrieval_tpu.ops.similarity import (
    rerank_scores_host,
)


def _world(q=9, r=12, n=200, d=48, seed=0):
    rng = np.random.default_rng(seed)
    norm = lambda x: x / np.linalg.norm(x, axis=1, keepdims=True)  # noqa: E731
    queries = norm(rng.standard_normal((q, d))).astype(np.float32)
    image = norm(rng.standard_normal((n, d))).astype(np.float32)
    text = norm(rng.standard_normal((n, d))).astype(np.float32)
    idx = rng.integers(0, n, (q, r)).astype(np.int32)
    idx[0, :3] = -1  # ANN sentinels
    return queries, image, text, idx


def _oracle(queries, image, text, idx, alpha):
    a = np.broadcast_to(np.asarray(alpha, np.float32).reshape(-1, 1), idx.shape)
    safe = np.maximum(idx, 0)
    s = a * np.einsum("qd,qrd->qr", queries, image[safe]) + (1 - a) * np.einsum(
        "qd,qrd->qr", queries, text[safe]
    )
    return np.where(idx >= 0, s, -np.inf).astype(np.float32)


@pytest.mark.parametrize("alpha", [0.5, None])
def test_native_matches_oracle(alpha):
    queries, image, text, idx = _world()
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, queries.shape[0]).astype(np.float32) if alpha is None else alpha
    got = rerank_scores_native(queries, image, text, idx, a)
    if got is None:
        pytest.skip("no compiler available")
    want = _oracle(queries, image, text, idx, a)
    finite = idx >= 0
    np.testing.assert_allclose(got[finite], want[finite], rtol=1e-4, atol=1e-5)
    assert np.all(np.isneginf(got[~finite]))


def test_native_out_of_range_rows_are_neginf():
    queries, image, text, idx = _world()
    idx[1, 0] = image.shape[0] + 5  # defensive bound
    got = rerank_scores_native(queries, image, text, idx, 0.5)
    if got is None:
        pytest.skip("no compiler available")
    assert np.isneginf(got[1, 0])


def test_host_rescore_numpy_and_native_paths_agree(monkeypatch):
    queries, image, text, idx = _world(seed=3)
    sv_np, si_np = rerank_scores_host(queries, image, text, idx, 0.3)
    monkeypatch.setenv("KEMR_NATIVE_RERANK", "1")
    sv_nat, si_nat = rerank_scores_host(queries, image, text, idx, 0.3)
    if rerank_scores_native(queries, image, text, idx, 0.3) is None:
        pytest.skip("no compiler available")
    np.testing.assert_array_equal(si_np, si_nat)
    finite = np.isfinite(sv_np)
    np.testing.assert_allclose(sv_np[finite], sv_nat[finite], rtol=1e-4, atol=1e-5)


def test_host_rescore_sorted_and_sentinels_last():
    queries, image, text, idx = _world(seed=5)
    sv, si = rerank_scores_host(queries, image, text, idx, 0.5)
    assert np.all(np.diff(np.nan_to_num(sv, neginf=-1e30), axis=1) <= 1e-7)
    # row 0 had 3 sentinels: they sort to the end with -inf scores
    assert np.all(si[0, -3:] == -1) and np.all(np.isneginf(sv[0, -3:]))
