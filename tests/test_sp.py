"""Sequence parallelism (parallel/sp.py): ring attention over the seq axis
pinned against dense attention, and the sequence-sharded residual block
pinned against the real CLIP ``ResidualBlock`` — forward and grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
from knowledge_enhanced_multimodal_retrieval_tpu.ops.attention import mha_xla
from knowledge_enhanced_multimodal_retrieval_tpu.parallel.sp import (
    ring_attention,
    sp_block_apply,
)


def _seq_mesh(n=8, extra_data=0):
    if extra_data:
        devs = np.array(jax.devices()[: n * extra_data]).reshape(extra_data, n)
        return Mesh(devs, ("data", "seq"))
    return Mesh(np.array(jax.devices()[:n]), ("seq",))


def _qkv(key, b=2, h=2, s=32, d=8):
    kq, kk, kv = jax.random.split(key, 3)
    return (
        jax.random.normal(kq, (b, h, s, d), jnp.float32),
        jax.random.normal(kk, (b, h, s, d), jnp.float32),
        jax.random.normal(kv, (b, h, s, d), jnp.float32),
    )


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_dense(devices8, causal):
    mesh = _seq_mesh(8)
    q, k, v = _qkv(jax.random.PRNGKey(0))
    got = ring_attention(q, k, v, mesh, causal=causal)
    want = mha_xla(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_ring_order_invariance_small_ring(devices8):
    """Same inputs on a 2-device ring and an 8-device ring: the online
    softmax must make the result independent of how the sequence is cut."""
    q, k, v = _qkv(jax.random.PRNGKey(1), s=24)
    a = ring_attention(q, k, v, _seq_mesh(2), causal=True)
    b = ring_attention(q, k, v, _seq_mesh(8), causal=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_ring_composes_with_data_axis(devices8):
    """Extra mesh axes replicate: a (data=2, seq=4) mesh gives the same
    answer as the dense oracle (batch stays unsharded inside)."""
    mesh = _seq_mesh(4, extra_data=2)
    q, k, v = _qkv(jax.random.PRNGKey(2), s=16)
    got = ring_attention(q, k, v, mesh, causal=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(mha_xla(q, k, v)), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("causal", [False, True])
def test_ring_grads_match_dense(devices8, causal):
    """jax.grad through scan+ppermute = the reverse ring; q/k/v grads must
    match dense attention's (training-readiness for long sequences)."""
    mesh = _seq_mesh(8)
    q, k, v = _qkv(jax.random.PRNGKey(3), b=1, h=1, s=16, d=4)
    w = jax.random.normal(jax.random.PRNGKey(4), q.shape, jnp.float32)

    def loss_ring(q_, k_, v_):
        return jnp.sum(ring_attention(q_, k_, v_, mesh, causal=causal) * w)

    def loss_dense(q_, k_, v_):
        return jnp.sum(mha_xla(q_, k_, v_, causal=causal) * w)

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-5)


def test_ring_bf16_inputs(devices8):
    """bf16 q/k/v (the production compute dtype): f32 accumulation inside
    keeps the result within bf16 tolerance of the dense bf16 path."""
    mesh = _seq_mesh(4)
    q, k, v = _qkv(jax.random.PRNGKey(5), s=16)
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
    got = ring_attention(qb, kb, vb, mesh)
    assert got.dtype == jnp.bfloat16
    want = mha_xla(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize("causal", [False, True])
def test_sp_block_matches_residual_block(devices8, causal):
    """Whole CLIP residual block with activations sharded [B, S/8, W] ==
    the unsharded flax ResidualBlock (pre-LN, fused qkv, QuickGELU)."""
    mesh = _seq_mesh(8)
    width, heads, s = 32, 2, 16
    block = M.ResidualBlock(width, heads, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, s, width), jnp.float32)
    params = block.init(jax.random.PRNGKey(7), x)["params"]
    got = sp_block_apply(params, x, mesh, heads=heads, causal=causal)
    want = block.apply({"params": params}, x, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_sp_block_grads_flow(devices8):
    """Grad w.r.t. the sequence-sharded input is finite and matches the
    dense block's input grad."""
    mesh = _seq_mesh(4)
    width, heads, s = 16, 2, 8
    block = M.ResidualBlock(width, heads, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(8), (1, s, width), jnp.float32)
    params = block.init(jax.random.PRNGKey(9), x)["params"]

    g_sp = jax.grad(lambda x_: jnp.sum(sp_block_apply(params, x_, mesh, heads=heads) ** 2))(x)
    g_dn = jax.grad(lambda x_: jnp.sum(block.apply({"params": params}, x_, False) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_dn), rtol=3e-5, atol=3e-5)


def test_sp_validation_errors(devices8):
    mesh = _seq_mesh(8)
    q, k, v = _qkv(jax.random.PRNGKey(10), s=32)
    with pytest.raises(ValueError, match="no axis"):
        ring_attention(q, k, v, mesh, axis="nope")
    q2, k2, v2 = _qkv(jax.random.PRNGKey(11), s=30)  # 30 % 8 != 0
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(q2, k2, v2, mesh)
    with pytest.raises(ValueError, match="not divisible"):
        sp_block_apply({}, jnp.zeros((1, 30, 16)), mesh, heads=2)
