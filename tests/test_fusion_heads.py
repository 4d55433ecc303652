import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.models.fusion_heads import (
    FUSION_TYPES,
    FusionModel,
)

D = 32


@pytest.fixture
def embeds(rng):
    def norm(x):
        return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)

    q = jnp.asarray(norm(rng.standard_normal((5, D))))
    i = jnp.asarray(norm(rng.standard_normal((9, D))))
    t = jnp.asarray(norm(rng.standard_normal((9, D))))
    return q, i, t


@pytest.mark.parametrize("fusion_type", FUSION_TYPES)
def test_all_heads_shapes(fusion_type, embeds):
    q, i, t = embeds
    fm = FusionModel(fusion_type, embed_dim=D)
    params = fm.init(jax.random.PRNGKey(0))
    scores = fm.scores(params, q, i, t)
    assert scores.shape == (5, 9)
    assert np.isfinite(np.asarray(scores)).all()


def test_unknown_type_raises():
    with pytest.raises(ValueError):
        FusionModel("nope", embed_dim=D)


def test_simple_gated_with_bias_init_gate(embeds):
    """Zero weight + bias -2 -> gate = sigmoid(-2) ~ 0.119 for every query."""
    q, i, t = embeds
    fm = FusionModel("simple_gated_with_bias", embed_dim=D)
    params = fm.init(jax.random.PRNGKey(0))
    scores = np.asarray(fm.scores(params, q, i, t))
    gate = 1 / (1 + np.exp(2.0))
    expected = gate * np.asarray(q @ i.T) + (1 - gate) * np.asarray(q @ t.T)
    np.testing.assert_allclose(scores, expected, rtol=1e-5, atol=1e-6)


def test_simple_gated_init_gate(embeds):
    """weight=1, bias=0 -> gate = sigmoid(sum(q)) per query."""
    q, i, t = embeds
    fm = FusionModel("simple_gated", embed_dim=D)
    params = fm.init(jax.random.PRNGKey(0))
    scores = np.asarray(fm.scores(params, q, i, t))
    gate = 1 / (1 + np.exp(-np.asarray(q).sum(1, keepdims=True)))
    expected = gate * np.asarray(q @ i.T) + (1 - gate) * np.asarray(q @ t.T)
    np.testing.assert_allclose(scores, expected, rtol=1e-4, atol=1e-5)


def test_bilinear_alpha_constrained(embeds):
    q, i, t = embeds
    fm = FusionModel("bilinear", embed_dim=D)
    params = fm.init(jax.random.PRNGKey(0))
    assert float(params["alpha"]) == pytest.approx(0.5)
    scores = fm.scores(params, q, i, t)
    assert np.isfinite(np.asarray(scores)).all()


def test_cross_attention_bounded(embeds):
    q, i, t = embeds
    fm = FusionModel("cross_attention", embed_dim=D)
    params = fm.init(jax.random.PRNGKey(0))
    scores = np.asarray(fm.scores(params, q, i, t))
    assert (np.abs(scores) <= 0.5 + 1e-6).all()  # tanh * 0.5 bound


def test_blockwise_matches_dense(embeds):
    q, i, t = embeds
    for fusion_type in ("linear", "gated", "bilinear"):
        fm = FusionModel(fusion_type, embed_dim=D)
        params = fm.init(jax.random.PRNGKey(1))
        dense = np.asarray(fm.scores(params, q, i, t))
        blocked = np.asarray(fm.blockwise_scores(params, q, i, t, block_q=2, block_c=4))
        np.testing.assert_allclose(blocked, dense, rtol=1e-4, atol=1e-5), fusion_type


def test_heads_trainable(embeds):
    """Gradient flows through every head's params."""
    q, i, t = embeds
    for fusion_type in FUSION_TYPES:
        fm = FusionModel(fusion_type, embed_dim=D)
        params = fm.init(jax.random.PRNGKey(0))

        def loss(p):
            s = fm.scores(p, q, i, t)
            return jnp.mean((s - jnp.eye(5, 9)) ** 2)

        grads = jax.grad(loss)(params)
        norms = [float(jnp.linalg.norm(g)) for g in jax.tree_util.tree_leaves(grads)]
        assert any(n > 0 for n in norms), fusion_type
