import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.eval import fusion as F


def _np_reference_weighted(sim, results, q_uuids, a_uuids, alpha, w):
    """Oracle reimplementing the reference's loop semantics (fusion.py:22-85)."""
    total = alpha + w
    if not np.isclose(total, 1.0):
        alpha, w = alpha / total, w / total
    a2i = {u: i for i, u in enumerate(a_uuids)}
    sp = np.zeros_like(sim)
    for qi, qu in enumerate(q_uuids):
        for uri in results.get(qu, []):
            uu = uri.split("/")[-1] if "/" in uri else uri
            if uu in a2i:
                sp[qi, a2i[uu]] = 1.0
    return alpha * sim + w * sp


@pytest.fixture
def setup(rng):
    n = 12
    sim = rng.standard_normal((n, n)).astype(np.float32)
    uuids = [f"u{i}" for i in range(n)]
    results = {
        "u0": ["http://kg/artefact/u3", "u5"],
        "u1": [],
        "u2": ["u2"],
        "u4": ["http://kg/nope-not-in-corpus"],
        "u6": [f"u{i}" for i in range(8)],  # large result set
    }
    return sim, uuids, results


def test_uri_to_uuid():
    assert F.uri_to_uuid("http://kg/data/abc-123") == "abc-123"
    assert F.uri_to_uuid("abc-123") == "abc-123"


def test_build_hit_matrix(setup):
    sim, uuids, results = setup
    hits, sizes = F.build_hit_matrix(results, uuids, uuids)
    assert hits[0, 3] == 1.0 and hits[0, 5] == 1.0 and hits[0].sum() == 2
    assert hits[1].sum() == 0
    assert hits[4].sum() == 0  # URI not in corpus contributes no hit...
    assert sizes[4] == 1  # ...but still counts toward result-set size
    assert sizes[6] == 8


def test_weighted_fusion_matches_oracle(setup):
    sim, uuids, results = setup
    ours = np.asarray(F.weighted_fusion(sim, results, uuids, uuids, alpha=0.7, sparql_weight=0.3))
    ref = _np_reference_weighted(sim, results, uuids, uuids, 0.7, 0.3)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_weighted_fusion_renormalizes(setup):
    sim, uuids, results = setup
    ours = np.asarray(F.weighted_fusion(sim, results, uuids, uuids, alpha=1.4, sparql_weight=0.6))
    ref = _np_reference_weighted(sim, results, uuids, uuids, 1.4, 0.6)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_additive_bonus(setup):
    sim, uuids, results = setup
    out = np.asarray(F.additive_bonus_fusion(sim, results, uuids, uuids, delta=0.5))
    assert out[0, 3] == pytest.approx(sim[0, 3] + 0.5)
    assert out[1, 1] == pytest.approx(sim[1, 1])


def test_adaptive_omega_tiers(setup):
    sim, uuids, results = setup
    out = np.asarray(F.adaptive_additive_fusion(sim, results, uuids, uuids, delta=1.0))
    # u2: 1 result -> omega 1.0
    assert out[2, 2] == pytest.approx(sim[2, 2] + 1.0)
    # u0: 2 results -> omega 0.8 (size <= 5)
    assert out[0, 3] == pytest.approx(sim[0, 3] + 0.8)
    # u6: 8 results -> omega 0.5 (size <= 20)
    assert out[6, 0] == pytest.approx(sim[6, 0] + 0.5)
    # u1: empty -> no bonus
    np.testing.assert_allclose(out[1], sim[1], rtol=1e-6)


def test_adaptive_custom_thresholds(setup):
    sim, uuids, results = setup
    out = np.asarray(
        F.adaptive_additive_fusion(sim, results, uuids, uuids, delta=1.0, size_thresholds={2: 0.9, float("inf"): 0.1})
    )
    assert out[0, 3] == pytest.approx(sim[0, 3] + 0.9)  # size 2 <= 2
    assert out[6, 0] == pytest.approx(sim[6, 0] + 0.1)  # size 8 -> inf tier


def test_dispatcher_and_errors(setup):
    sim, uuids, results = setup
    w = np.asarray(F.fuse_clip_and_text2sparql(sim, results, uuids, uuids, "weighted"))
    np.testing.assert_allclose(w, _np_reference_weighted(sim, results, uuids, uuids, 0.7, 0.3), rtol=1e-6)
    with pytest.raises(ValueError):
        F.fuse_clip_and_text2sparql(sim, results, uuids, uuids, "nope")
    with pytest.raises(ValueError):
        F.weighted_fusion(sim[:3], results, uuids, uuids)


def test_evaluate_retrieval_keys(setup):
    sim, uuids, results = setup
    m = F.evaluate_retrieval(sim)
    assert set(m) == {"R@1", "R@5", "R@10", "R@20", "MRR", "Mean_Rank"}
