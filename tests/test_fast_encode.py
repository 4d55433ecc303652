"""Fused transformer-block kernels + fast text-encode path.

Oracle strategy: the Pallas kernels run in interpret mode on CPU against the
XLA reference implementations, and ``encode_text_fast`` (both paths) is
pinned against the flax ``TextTransformer`` the trainer uses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
from knowledge_enhanced_multimodal_retrieval_tpu.models.fast_encode import (
    encode_text_fast,
    make_text_plan,
)
from knowledge_enhanced_multimodal_retrieval_tpu.ops.fused_block import (
    attention_block_reference,
    default_attention_tile,
    fused_attention_block,
    fused_mlp_block,
    mlp_block_reference,
    pad_rows,
)

W, H, S = 256, 4, 16


def _attn_weights(rng, width=W):
    return dict(
        ln_scale=jnp.asarray(1 + 0.1 * rng.standard_normal(width), jnp.float32),
        ln_bias=jnp.asarray(0.1 * rng.standard_normal(width), jnp.float32),
        wqkv=jnp.asarray(rng.standard_normal((width, 3 * width)) * 0.05, jnp.float32),
        bqkv=jnp.asarray(0.02 * rng.standard_normal(3 * width), jnp.float32),
        wo=jnp.asarray(rng.standard_normal((width, width)) * 0.05, jnp.float32),
        bo=jnp.asarray(0.02 * rng.standard_normal(width), jnp.float32),
    )


def _mlp_weights(rng, width=W, ff=4 * W):
    return dict(
        ln_scale=jnp.asarray(1 + 0.1 * rng.standard_normal(width), jnp.float32),
        ln_bias=jnp.asarray(0.1 * rng.standard_normal(width), jnp.float32),
        w1=jnp.asarray(rng.standard_normal((width, ff)) * 0.05, jnp.float32),
        b1=jnp.asarray(0.02 * rng.standard_normal(ff), jnp.float32),
        w2=jnp.asarray(rng.standard_normal((ff, width)) * 0.05, jnp.float32),
        b2=jnp.asarray(0.02 * rng.standard_normal(width), jnp.float32),
    )


def test_fused_attention_block_matches_reference(rng):
    x = jnp.asarray(rng.standard_normal((8 * S, W)), jnp.float32)
    wts = _attn_weights(rng)
    ref = attention_block_reference(x, **wts, seq_len=S, heads=H)
    got = fused_attention_block(x, **wts, seq_len=S, heads=H, tile=4 * S, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_fused_attention_block_mask_len(rng):
    """mask_len < seq_len: padded key columns are invisible to attention."""
    x = np.asarray(rng.standard_normal((4 * S, W)), np.float32)
    wts = _attn_weights(rng)
    # zero the padded tail rows like encode_text_fast does
    x[:, :][np.arange(4 * S) % S >= 12] = 0.0
    x = jnp.asarray(x)
    ref = attention_block_reference(x, **wts, seq_len=S, heads=H, mask_len=12)
    got = fused_attention_block(x, **wts, seq_len=S, heads=H, mask_len=12, tile=2 * S, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)
    # and the valid region must differ from the unmasked result
    full = attention_block_reference(x, **wts, seq_len=S, heads=H)
    assert not np.allclose(np.asarray(full), np.asarray(ref))


def test_fused_attention_block_is_causal(rng):
    """Changing a later token never changes an earlier row's output."""
    x = np.asarray(rng.standard_normal((S, W)), np.float32)
    wts = _attn_weights(rng)
    out1 = np.asarray(fused_attention_block(jnp.asarray(x), **wts, seq_len=S, heads=H, tile=S, interpret=True))
    x2 = x.copy()
    x2[10] += 1.0
    out2 = np.asarray(fused_attention_block(jnp.asarray(x2), **wts, seq_len=S, heads=H, tile=S, interpret=True))
    np.testing.assert_allclose(out1[:10], out2[:10], atol=1e-5)
    assert not np.allclose(out1[10:], out2[10:])


def test_fused_attention_block_noncausal(rng):
    """Bidirectional mode (vision tower)."""
    x = jnp.asarray(rng.standard_normal((4 * S, W)), jnp.float32)
    wts = _attn_weights(rng)
    ref = attention_block_reference(x, **wts, seq_len=S, heads=H, causal=False)
    got = fused_attention_block(x, **wts, seq_len=S, heads=H, causal=False, tile=2 * S, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)
    causal = attention_block_reference(x, **wts, seq_len=S, heads=H, causal=True)
    assert not np.allclose(np.asarray(causal), np.asarray(ref))


def test_fused_mlp_block_matches_reference(rng):
    x = jnp.asarray(rng.standard_normal((128, W)), jnp.float32)
    wts = _mlp_weights(rng)
    ref = mlp_block_reference(x, **wts)
    got = fused_mlp_block(x, **wts, tile=32, n_chunks=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_fused_block_shape_validation(rng):
    x = jnp.zeros((64, W), jnp.float32)
    wts = _attn_weights(rng)
    with pytest.raises(ValueError):
        fused_attention_block(x, **wts, seq_len=S, heads=H, tile=24, interpret=True)  # tile % seq
    with pytest.raises(ValueError):
        fused_mlp_block(x, **_mlp_weights(rng), tile=48, interpret=True)  # rows % tile


def test_pad_rows_roundtrip():
    x = jnp.ones((5, 8))
    p = pad_rows(x, 4)
    assert p.shape == (8, 8)
    assert np.asarray(p[5:]).sum() == 0


def test_default_attention_tile():
    assert default_attention_tile(32) == 256
    assert default_attention_tile(64) == 256
    assert default_attention_tile(80) % 80 == 0
    assert default_attention_tile(80) % 16 == 0


# ---------------------------------------------------------------------------
# encode_text_fast vs the flax tower
# ---------------------------------------------------------------------------

TINY = M.CLIPArch(
    embed_dim=64, image_resolution=32, vision_layers=1, vision_width=128,
    vision_patch_size=16, context_length=16, vocab_size=512, text_width=128,
    text_heads=2, text_layers=2,
)


@pytest.fixture(scope="module")
def tiny_model():
    model = M.CLIP(TINY, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    return model, params


def _ids(rng, b, s):
    ids = np.zeros((b, s), np.int32)
    ids[:, 0] = TINY.vocab_size - 2
    for i in range(b):
        L = int(rng.integers(3, s - 2))
        ids[i, 1:1 + L] = rng.integers(1, TINY.vocab_size - 2, L)
        ids[i, 1 + L] = TINY.vocab_size - 1
    return jnp.asarray(ids)


def test_encode_text_fast_matches_flax(tiny_model, rng):
    model, params = tiny_model
    ids = _ids(rng, 6, TINY.context_length)
    want = np.asarray(model.apply({"params": params}, ids, method=M.CLIP.encode_text))
    plan = make_text_plan(params, dtype=jnp.float32)
    got = np.asarray(encode_text_fast(TINY, plan, ids, use_fused=False))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    got_k = np.asarray(encode_text_fast(TINY, plan, ids, use_fused=True, interpret=True))
    np.testing.assert_allclose(got_k, want, atol=1e-4, rtol=1e-4)


def test_encode_text_fast_non_sublane_seq(tiny_model, rng):
    """Sequence lengths that need sublane padding (the 77-context case)."""
    model, params = tiny_model
    ids = _ids(rng, 4, 12)  # 12 -> padded to 16 internally
    want = np.asarray(model.apply({"params": params}, ids, method=M.CLIP.encode_text))
    plan = make_text_plan(params, dtype=jnp.float32)
    got = np.asarray(encode_text_fast(TINY, plan, ids, use_fused=False))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    got_k = np.asarray(encode_text_fast(TINY, plan, ids, use_fused=True, interpret=True))
    np.testing.assert_allclose(got_k, want, atol=1e-4, rtol=1e-4)


def test_encode_text_fast_odd_batch(tiny_model, rng):
    """Batches that don't fill the row tile (row padding path)."""
    model, params = tiny_model
    ids = _ids(rng, 3, TINY.context_length)
    want = np.asarray(model.apply({"params": params}, ids, method=M.CLIP.encode_text))
    plan = make_text_plan(params, dtype=jnp.float32)
    got = np.asarray(encode_text_fast(TINY, plan, ids, use_fused=False))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_encode_text_fast_jits(tiny_model, rng):
    model, params = tiny_model
    ids = _ids(rng, 4, TINY.context_length)
    plan = make_text_plan(params, dtype=jnp.float32)
    import functools
    f = jax.jit(functools.partial(encode_text_fast, TINY, use_fused=False))
    got = np.asarray(f(plan, ids))
    want = np.asarray(encode_text_fast(TINY, plan, ids, use_fused=False))
    np.testing.assert_allclose(got, want, atol=1e-5)
