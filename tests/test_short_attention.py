import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.ops.attention import mha_xla
from knowledge_enhanced_multimodal_retrieval_tpu.ops.short_attention import short_attention


def _qkv(rng, b=2, h=4, s=77, d=32, dtype=np.float32):
    return tuple(jnp.asarray(rng.standard_normal((b, h, s, d)), dtype) for _ in range(3))


@pytest.mark.parametrize("s", [50, 77, 128, 257])
@pytest.mark.parametrize("causal", [False, True])
def test_short_matches_xla(rng, s, causal):
    q, k, v = _qkv(rng, s=s)
    ref = mha_xla(q, k, v, causal=causal)
    out = short_attention(q, k, v, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_head_group_divisor_fallback(rng):
    """h=6 not divisible by 4 -> group falls back to 2."""
    q, k, v = _qkv(rng, h=6, s=64)
    out = short_attention(q, k, v, head_group=4, interpret=True)
    ref = mha_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_short_bf16(rng):
    q, k, v = _qkv(rng, s=77, dtype=jnp.bfloat16)
    out = short_attention(q, k, v, interpret=True)
    ref = mha_xla(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )


def test_short_gradients_match(rng):
    q, k, v = _qkv(rng, b=1, h=2, s=50, d=16)

    def loss_short(q_, k_, v_):
        return jnp.sum(short_attention(q_, k_, v_, True, 4, True) ** 2)

    def loss_ref(q_, k_, v_):
        return jnp.sum(mha_xla(q_, k_, v_, causal=True) ** 2)

    g1 = jax.grad(loss_short, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)
