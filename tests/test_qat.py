"""Quantization-aware training (train/qat.py, TrainConfig.qat).

The QAT forward must round through EXACTLY the int8 serving math
(ops/fused_block quantize_weight / _quantize_rows) with straight-through
gradients, touch only the serving-quantized parameters, and ride the
existing train steps (DP, GSPMD, LoRA) via forward_for_config.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.ops.fused_block import (
    _quantize_rows,
    quantize_weight,
)
from knowledge_enhanced_multimodal_retrieval_tpu.train.qat import (
    QAT_DENSE_NAMES,
    fake_quant_rows,
    fake_quant_weight,
    qat_apply,
    qat_params,
)
from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import TrainConfig


def test_fake_quant_weight_matches_serving_math():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((24, 16)), jnp.float32)
    wq, s = quantize_weight(w)
    want = np.asarray(wq, np.float32) * np.asarray(s)
    np.testing.assert_allclose(np.asarray(fake_quant_weight(w)), want, rtol=1e-6)


def test_fake_quant_rows_matches_serving_math():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((6, 32)), jnp.float32)
    xq, r = _quantize_rows(x)
    want = np.asarray(xq, np.float32) * np.asarray(r)
    np.testing.assert_allclose(np.asarray(fake_quant_rows(x)), want, rtol=1e-6)


def test_straight_through_gradients():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.standard_normal((8, 4)), jnp.float32)
    g = jax.grad(lambda v: fake_quant_weight(v).sum())(w)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)
    g = jax.grad(lambda v: (fake_quant_rows(v) * 3.0).sum())(w)
    np.testing.assert_allclose(np.asarray(g), 3.0, atol=1e-6)


def _tiny_model():
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M

    arch = M.CLIPArch(16, 32, 1, 32, 16, 16, 64, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    return model, params


def test_qat_params_touches_only_projection_kernels():
    _, params = _tiny_model()
    qp = qat_params(params)
    changed, same = [], []
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    qflat = jax.tree_util.tree_flatten_with_path(qp)[0]
    for (path, a), (_, b) in zip(flat, qflat):
        names = [getattr(p, "key", None) for p in path]
        identical = np.array_equal(np.asarray(a), np.asarray(b))
        is_target = len(names) >= 2 and names[-1] == "kernel" and names[-2] in QAT_DENSE_NAMES
        (changed if is_target else same).append(identical)
        if not is_target:
            assert identical, f"non-target leaf changed: {names}"
    assert changed and not all(changed), "no projection kernel was rounded"


def test_qat_apply_rounds_the_forward():
    from knowledge_enhanced_multimodal_retrieval_tpu.models.clip import CLIP

    model, params = _tiny_model()
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 64, (2, 16)), jnp.int32)
    plain = model.apply({"params": params}, ids, method=CLIP.encode_text)
    qat = qat_apply(model, params, ids, method=CLIP.encode_text)
    # both fake-quantizations perturb the forward, but only slightly
    d = float(jnp.abs(plain - qat).max())
    assert 0 < d < 0.5 * float(jnp.abs(plain).max())
    # weights-only (no interceptor) differs from the full QAT forward:
    # proves the activation interceptor fires
    w_only = model.apply({"params": qat_params(params)}, ids, method=CLIP.encode_text)
    assert float(jnp.abs(w_only - qat).max()) > 0


def test_qat_train_step_descends(devices8, tmp_path):
    from knowledge_enhanced_multimodal_retrieval_tpu.data.datasets import (
        DataPipeline,
        make_synthetic_source,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.train import trainer as T
    from tests.test_trainer import MERGES, TINY

    tok = CLIPTokenizer(MERGES)
    arch = M.CLIPArch(**{**TINY.__dict__, "vocab_size": tok.vocab_size})
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    src = make_synthetic_source(32, image_size=32)
    pipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=2)
    cfg = TrainConfig(
        batch_size=16, epochs=1, lr=1e-3, qat=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    trainer = T.CLIPTrainer(model, params, pipe, None, cfg, out_dir=str(tmp_path))
    db = trainer._device_batch(pipe.make_batch(list(range(16))))
    state, losses = trainer.state, []
    for _ in range(8):
        state, metrics = trainer.train_step(state, db)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    # master weights stay full precision (not snapped to rounding points)
    w = np.asarray(
        state["params"]["text"]["transformer"]["resblocks_0"]["mlp"]["c_fc"]["kernel"]
    )
    s = np.maximum(np.abs(w).max(axis=0, keepdims=True) / 127.0, 1e-12)
    assert not np.allclose(w, np.round(w / s) * s, atol=1e-9)


def test_qat_reduces_serving_quantization_error(devices8, tmp_path):
    """The point of QAT: after training WITH fake-quant, the gap between
    the plain forward and the quantized forward shrinks versus training
    WITHOUT it (same data, steps, seeds)."""
    from knowledge_enhanced_multimodal_retrieval_tpu.data.datasets import (
        DataPipeline,
        make_synthetic_source,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.models.clip import CLIP
    from knowledge_enhanced_multimodal_retrieval_tpu.train import trainer as T
    from tests.test_trainer import MERGES, TINY

    tok = CLIPTokenizer(MERGES)
    arch = M.CLIPArch(**{**TINY.__dict__, "vocab_size": tok.vocab_size})
    model = M.CLIP(arch, dtype=jnp.float32)
    src = make_synthetic_source(32, image_size=32)
    pipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=2)
    ids = jnp.asarray(np.random.default_rng(5).integers(0, tok.vocab_size, (8, 16)))

    def train(qat: bool):
        params = M.init_params(model, jax.random.PRNGKey(0))
        cfg = TrainConfig(
            batch_size=16, epochs=1, lr=5e-3, qat=qat,
            checkpoint_dir=str(tmp_path / f"ckpt{qat}"),
        )
        tr = T.CLIPTrainer(model, params, pipe, None, cfg, out_dir=str(tmp_path))
        db = tr._device_batch(pipe.make_batch(list(range(16))))
        state = tr.state
        for _ in range(12):
            state, _ = tr.train_step(state, db)
        p = state["params"]
        plain = model.apply({"params": p}, ids, method=CLIP.encode_text)
        quant = qat_apply(model, p, ids, method=CLIP.encode_text)
        return float(jnp.abs(plain - quant).mean())

    gap_qat = train(True)
    gap_plain = train(False)
    assert gap_qat < gap_plain, (gap_qat, gap_plain)


def test_qat_composes_with_matryoshka_config():
    cfg = TrainConfig(qat=True, matryoshka_dims=(8,))
    from knowledge_enhanced_multimodal_retrieval_tpu.train.trainer import (
        forward_for_config,
    )

    model, params = _tiny_model()
    from knowledge_enhanced_multimodal_retrieval_tpu.models.clip import CLIP

    fwd = forward_for_config(model, cfg)
    ids = jnp.zeros((2, 16), jnp.int32)
    out = fwd(params, ids, method=CLIP.encode_text)
    assert out.shape == (2, 16) and bool(jnp.all(jnp.isfinite(out)))
