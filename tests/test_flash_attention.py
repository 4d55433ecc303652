import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.ops.attention import mha, mha_xla
from knowledge_enhanced_multimodal_retrieval_tpu.ops.flash_attention import flash_attention


def _qkv(rng, b=2, h=3, s=77, d=64, dtype=np.float32):
    shape = (b, h, s, d)
    return tuple(jnp.asarray(rng.standard_normal(shape), dtype) for _ in range(3))


@pytest.mark.parametrize("s", [64, 77, 128, 200, 257])
@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_xla(rng, s, causal):
    q, k, v = _qkv(rng, s=s)
    ref = mha_xla(q, k, v, causal=causal)
    out = flash_attention(q, k, v, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_small_blocks(rng):
    """Multiple q/k blocks exercised with non-divisible sequence length."""
    q, k, v = _qkv(rng, b=1, h=2, s=150, d=32)
    ref = mha_xla(q, k, v, causal=True)
    out = flash_attention(q, k, v, causal=True, block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_bf16(rng):
    q, k, v = _qkv(rng, s=128, dtype=jnp.bfloat16)
    ref = mha_xla(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )


def test_flash_gradients_match(rng):
    """custom_vjp backward (XLA recompute) must match pure-XLA grads."""
    q, k, v = _qkv(rng, b=1, h=2, s=64, d=32)

    def loss_flash(q_, k_, v_):
        return jnp.sum(flash_attention(q_, k_, v_, causal=True, interpret=True) ** 2)

    def loss_ref(q_, k_, v_):
        return jnp.sum(mha_xla(q_, k_, v_, causal=True) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def test_mha_dispatch_cpu_uses_xla(rng):
    """On CPU backend the dispatcher must pick XLA (no interpret overhead)."""
    q, k, v = _qkv(rng, s=128)
    out = mha(q, k, v)
    ref = mha_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
