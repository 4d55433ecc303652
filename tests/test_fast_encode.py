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
    plan_is_quantized,
)
from knowledge_enhanced_multimodal_retrieval_tpu.ops.fused_block import (
    attention_block_q8_reference,
    attention_block_reference,
    default_attention_tile,
    fused_attention_block,
    fused_attention_block_q8,
    fused_mlp_block,
    fused_mlp_block_q8,
    mlp_block_q8_reference,
    mlp_block_reference,
    pad_rows,
    quantize_weight,
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
# int8 (W8A8 dynamic) variants
# ---------------------------------------------------------------------------


def _q8_attn_weights(rng, width=W):
    wts = _attn_weights(rng, width)
    wqkv_q, wqkv_s = quantize_weight(wts["wqkv"])
    wo_q, wo_s = quantize_weight(wts["wo"])
    return dict(
        ln_scale=wts["ln_scale"], ln_bias=wts["ln_bias"],
        wqkv_q=wqkv_q, wqkv_s=wqkv_s, bqkv=wts["bqkv"],
        wo_q=wo_q, wo_s=wo_s, bo=wts["bo"],
    ), wts


def test_quantize_weight_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((W, 2 * W)) * 0.05, jnp.float32)
    wq, s = quantize_weight(w)
    assert wq.dtype == jnp.int8 and s.shape == (1, 2 * W)
    err = np.abs(np.asarray(wq, np.float32) * np.asarray(s) - np.asarray(w)).max()
    assert err <= np.asarray(s).max() / 2 + 1e-7  # within half a step


def test_fused_attention_block_q8_matches_reference(rng):
    x = jnp.asarray(rng.standard_normal((8 * S, W)), jnp.float32)
    q8, _ = _q8_attn_weights(rng)
    ref = attention_block_q8_reference(x, **q8, seq_len=S, heads=H)
    # single tile == identical op order == exact; multi-tile grouping can
    # shift f32 ulps across int8 rounding boundaries, so it gets a
    # quant-step tolerance instead (steps ~ wo_s, here ~2e-3)
    got1 = fused_attention_block_q8(x, **q8, seq_len=S, heads=H, tile=8 * S, interpret=True)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref), atol=1e-4, rtol=1e-4)
    got4 = fused_attention_block_q8(x, **q8, seq_len=S, heads=H, tile=2 * S, interpret=True)
    np.testing.assert_allclose(np.asarray(got4), np.asarray(ref), atol=0.02)


def test_q8_attention_close_to_fp(rng):
    """Quantization error stays small relative to the fp32 block output."""
    x = jnp.asarray(rng.standard_normal((4 * S, W)), jnp.float32)
    q8, wts = _q8_attn_weights(rng)
    fp = np.asarray(attention_block_reference(x, **wts, seq_len=S, heads=H))
    q = np.asarray(attention_block_q8_reference(x, **q8, seq_len=S, heads=H))
    denom = np.abs(fp).max()
    assert np.abs(q - fp).max() / denom < 0.05


def test_fused_mlp_block_q8_matches_reference(rng):
    x = jnp.asarray(rng.standard_normal((128, W)), jnp.float32)
    wts = _mlp_weights(rng)
    w1_q, w1_s = quantize_weight(wts["w1"])
    w2_q, w2_s = quantize_weight(wts["w2"])
    q8 = dict(
        ln_scale=wts["ln_scale"], ln_bias=wts["ln_bias"],
        w1_q=w1_q, w1_s=w1_s, b1=wts["b1"], w2_q=w2_q, w2_s=w2_s, b2=wts["b2"],
    )
    ref = mlp_block_q8_reference(x, **q8, n_chunks=4)
    got = fused_mlp_block_q8(x, **q8, tile=32, n_chunks=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)
    fp = np.asarray(mlp_block_reference(x, **wts))
    assert np.abs(np.asarray(ref) - fp).max() / np.abs(fp).max() < 0.05


def test_fused_layer_q8_matches_two_block_kernels(rng):
    """The single-kernel layer == its two building-block kernels, bit-exact
    at the same tile; and tracks the two-block reference chain to within a
    few quantization steps (cross-grouping ulps can flip int8 roundings)."""
    from knowledge_enhanced_multimodal_retrieval_tpu.ops.fused_block import fused_layer_q8

    x = jnp.asarray(rng.standard_normal((4 * S, W)), jnp.float32)
    q8a, _ = _q8_attn_weights(rng)
    m = _mlp_weights(rng)
    w1_q, w1_s = quantize_weight(m["w1"])
    w2_q, w2_s = quantize_weight(m["w2"])
    blocks = fused_attention_block_q8(x, **q8a, seq_len=S, heads=H, tile=2 * S, interpret=True)
    blocks = fused_mlp_block_q8(
        blocks, m["ln_scale"], m["ln_bias"], w1_q, w1_s, m["b1"], w2_q, w2_s, m["b2"],
        tile=2 * S, n_chunks=4, interpret=True,
    )
    got = fused_layer_q8(
        x, q8a["ln_scale"], q8a["ln_bias"], q8a["wqkv_q"], q8a["wqkv_s"], q8a["bqkv"],
        q8a["wo_q"], q8a["wo_s"], q8a["bo"], m["ln_scale"], m["ln_bias"],
        w1_q, w1_s, m["b1"], w2_q, w2_s, m["b2"],
        seq_len=S, heads=H, tile=2 * S, n_chunks=4, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(blocks))
    ref = attention_block_q8_reference(x, **q8a, seq_len=S, heads=H)
    ref = mlp_block_q8_reference(
        ref, m["ln_scale"], m["ln_bias"], w1_q, w1_s, m["b1"], w2_q, w2_s, m["b2"],
        n_chunks=4,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.05)


def test_encode_text_fast_int8_plan(tiny_model, rng):
    """int8 plan: kernel == reference, and cosine vs the fp tower stays high."""
    model, params = tiny_model
    ids = _ids(rng, 6, TINY.context_length)
    plan = make_text_plan(params, dtype=jnp.float32, quantize="int8")
    assert plan_is_quantized(plan)
    ref = np.asarray(encode_text_fast(TINY, plan, ids, use_fused=False))
    got = np.asarray(encode_text_fast(TINY, plan, ids, use_fused=True, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
    fp = np.asarray(model.apply({"params": params}, ids, method=M.CLIP.encode_text))
    cos = np.sum(ref * fp, -1) / (np.linalg.norm(ref, axis=-1) * np.linalg.norm(fp, axis=-1))
    assert cos.min() > 0.999, cos


def test_make_text_plan_rejects_unknown_mode(tiny_model):
    _, params = tiny_model
    with pytest.raises(ValueError):
        make_text_plan(params, quantize="int4")


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


def test_encode_image_fast_matches_flax(tiny_model, rng):
    from knowledge_enhanced_multimodal_retrieval_tpu.models.fast_encode import (
        encode_image_fast,
        make_vision_plan,
    )

    model, params = tiny_model
    imgs = jnp.asarray(rng.standard_normal((3, 32, 32, 3)), jnp.float32)
    want = np.asarray(model.apply({"params": params}, imgs, method=M.CLIP.encode_image))
    plan = make_vision_plan(params, dtype=jnp.float32)
    got = np.asarray(encode_image_fast(TINY, plan, imgs, use_fused=False))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    got_k = np.asarray(encode_image_fast(TINY, plan, imgs, use_fused=True, interpret=True))
    np.testing.assert_allclose(got_k, want, atol=1e-4, rtol=1e-4)


def test_encode_image_fast_int8_cosine(tiny_model, rng):
    from knowledge_enhanced_multimodal_retrieval_tpu.models.fast_encode import (
        encode_image_fast,
        make_vision_plan,
    )

    model, params = tiny_model
    imgs = jnp.asarray(rng.standard_normal((3, 32, 32, 3)), jnp.float32)
    fp = np.asarray(model.apply({"params": params}, imgs, method=M.CLIP.encode_image))
    plan = make_vision_plan(params, dtype=jnp.float32, quantize="int8")
    ref = np.asarray(encode_image_fast(TINY, plan, imgs, use_fused=False))
    got = np.asarray(encode_image_fast(TINY, plan, imgs, use_fused=True, interpret=True))
    # kernel path == reference path exactly only at identical grouping;
    # here both run one tile, so keep the tolerance tight
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)
    cos = np.sum(ref * fp, -1) / (np.linalg.norm(ref, axis=-1) * np.linalg.norm(fp, axis=-1))
    assert cos.min() > 0.999, cos


def test_apply_layers_q8_vmem_fallback(tiny_model, rng, monkeypatch):
    """Layers whose weights exceed the VMEM caps must fall back to the XLA
    reference blocks (same math) instead of attempting fused kernels."""
    import knowledge_enhanced_multimodal_retrieval_tpu.models.fast_encode as FE

    model, params = tiny_model
    ids = _ids(rng, 4, TINY.context_length)
    plan = make_text_plan(params, dtype=jnp.float32, quantize="int8")
    want = np.asarray(encode_text_fast(TINY, plan, ids, use_fused=False))
    # force every cap below any real layer: all fused kernels are ineligible,
    # so use_fused=True must route to reference blocks — if it tried a
    # kernel, interpret=False on CPU would raise
    monkeypatch.setattr(FE, "_LAYER_Q8_WEIGHT_CAP", 0)
    monkeypatch.setattr(FE, "_LAYER_Q8_WIDE_CAP", 0)
    monkeypatch.setattr(FE, "_BLOCK_WEIGHT_CAP", 0)
    monkeypatch.setattr(FE, "_BLOCK_WIDE_CAP_Q8", 0)
    monkeypatch.setattr(FE, "_BLOCK_WIDE_CAP_BF16_ATTN", 0)
    monkeypatch.setattr(FE, "_BLOCK_WIDE_CAP_BF16_MLP", 0)
    got = np.asarray(encode_text_fast(TINY, plan, ids, use_fused=True, interpret=False))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_apply_layers_q8_wide_vmem_routing(tiny_model, rng, monkeypatch):
    """Layers between the default-budget cap and the wide cap must run the
    whole-layer kernel with ``vmem_limit_bytes`` raised (vision-L/14-class
    layers: ~12 MiB int8 weights vs the ~16 MiB default scoped budget)."""
    import knowledge_enhanced_multimodal_retrieval_tpu.models.fast_encode as FE

    model, params = tiny_model
    ids = _ids(rng, 4, TINY.context_length)
    plan = make_text_plan(params, dtype=jnp.float32, quantize="int8")
    want = np.asarray(encode_text_fast(TINY, plan, ids, use_fused=False))

    seen = []
    real = FE.fused_layer_q8

    def recorder(*a, **kw):
        seen.append(kw.get("vmem_limit_bytes"))
        return real(*a, **kw)

    monkeypatch.setattr(FE, "fused_layer_q8", recorder)
    # tiny layer <= default cap: no raised limit
    got = np.asarray(encode_text_fast(TINY, plan, ids, use_fused=True, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    assert seen and all(v is None for v in seen)

    # force the tiny layer into the wide band: raised limit must be passed
    seen.clear()
    monkeypatch.setattr(FE, "_LAYER_Q8_WEIGHT_CAP", 0)
    got = np.asarray(encode_text_fast(TINY, plan, ids, use_fused=True, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    assert seen and all(v == FE._WIDE_VMEM_BYTES for v in seen)


def test_apply_layers_bf16_wide_vmem_routing(tiny_model, rng, monkeypatch):
    """bf16 blocks between the default block cap and the wide cap must run
    the fused kernels with ``vmem_limit_bytes`` raised (vision-L/14's
    16.8 MiB bf16 MLP) instead of falling back to the XLA reference."""
    import knowledge_enhanced_multimodal_retrieval_tpu.models.fast_encode as FE

    model, params = tiny_model
    ids = _ids(rng, 4, TINY.context_length)
    plan = make_text_plan(params, dtype=jnp.float32)
    want = np.asarray(encode_text_fast(TINY, plan, ids, use_fused=False))

    seen = {"attn": [], "mlp": []}
    real_attn, real_mlp = FE.fused_attention_block, FE.fused_mlp_block

    def rec_attn(*a, **kw):
        seen["attn"].append(kw.get("vmem_limit_bytes"))
        return real_attn(*a, **kw)

    def rec_mlp(*a, **kw):
        seen["mlp"].append(kw.get("vmem_limit_bytes"))
        return real_mlp(*a, **kw)

    monkeypatch.setattr(FE, "fused_attention_block", rec_attn)
    monkeypatch.setattr(FE, "fused_mlp_block", rec_mlp)
    # force the tiny blocks into the wide band
    monkeypatch.setattr(FE, "_BLOCK_WEIGHT_CAP", 0)
    got = np.asarray(encode_text_fast(TINY, plan, ids, use_fused=True, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    assert seen["attn"] and all(v == FE._WIDE_VMEM_BYTES for v in seen["attn"])
    assert seen["mlp"] and all(v == FE._WIDE_VMEM_BYTES for v in seen["mlp"])


def test_encode_text_fast_jits(tiny_model, rng):
    model, params = tiny_model
    ids = _ids(rng, 4, TINY.context_length)
    plan = make_text_plan(params, dtype=jnp.float32)
    import functools
    f = jax.jit(functools.partial(encode_text_fast, TINY, use_fused=False))
    got = np.asarray(f(plan, ids))
    want = np.asarray(encode_text_fast(TINY, plan, ids, use_fused=False))
    np.testing.assert_allclose(got, want, atol=1e-5)
