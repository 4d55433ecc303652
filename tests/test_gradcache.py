"""GradCache chunked contrastive training (train/gradcache.py,
TrainConfig.grad_cache_chunks; Gao et al. 2021, arXiv:2101.06983).

The invariant under test everywhere: chunking the encoder passes changes
NO math — losses and gradients match the direct whole-batch
``value_and_grad`` to float tolerance, while activation memory scales
1/chunks. No reference counterpart (its only batch levers are GPU count
and whole-GPU memory).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
from knowledge_enhanced_multimodal_retrieval_tpu.models.clip import CLIP, l2_normalize
from knowledge_enhanced_multimodal_retrieval_tpu.train.gradcache import (
    gradcache_value_and_grad,
)
from knowledge_enhanced_multimodal_retrieval_tpu.train.losses import (
    joint_contrastive_loss,
)
from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import TrainConfig
from tests.test_trainer import MERGES, TINY


ARCH = M.CLIPArch(**{**TINY.__dict__, "vocab_size": 64})


def _model_params():
    model = M.CLIP(ARCH, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    return model, params


def _batch(rng, n):
    return (
        jnp.asarray(rng.standard_normal((n, 32, 32, 3)), jnp.float32),
        jnp.asarray(rng.integers(0, 64, (n, ARCH.context_length)), jnp.int32),
        jnp.asarray(rng.integers(0, 64, (n, ARCH.context_length)), jnp.int32),
    )


def _towers(model, images, q_ids, t_ids):
    enc_img = lambda p, x: l2_normalize(  # noqa: E731
        model.apply({"params": p}, x, method=CLIP.encode_image)
    )
    enc_txt = lambda p, ids: l2_normalize(  # noqa: E731
        model.apply({"params": p}, ids, method=CLIP.encode_text)
    )
    return [(enc_img, (images,)), (enc_txt, (q_ids,)), (enc_txt, (t_ids,))]


def _emb_loss(img_e, q_e, t_e):
    return joint_contrastive_loss(img_e, q_e, t_e, temperature=0.07)


def test_matches_direct_value_and_grad():
    model, params = _model_params()
    rng = np.random.default_rng(0)
    images, q_ids, t_ids = _batch(rng, 8)

    def direct(p):
        embs = [enc(p, *ins) for enc, ins in _towers(model, images, q_ids, t_ids)]
        return _emb_loss(*embs)

    (loss_d, m_d), g_d = jax.value_and_grad(direct, has_aux=True)(params)
    for chunks in (1, 2, 4):
        (loss_c, m_c), g_c = jax.jit(
            lambda p: gradcache_value_and_grad(
                _emb_loss, _towers(model, images, q_ids, t_ids), p, chunks
            )
        )(params)
        assert float(loss_c) == pytest.approx(float(loss_d), rel=1e-5)
        flat_d = jax.tree_util.tree_leaves(g_d)
        flat_c = jax.tree_util.tree_leaves(g_c)
        assert len(flat_d) == len(flat_c)
        for a, b in zip(flat_d, flat_c):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-6)


def test_indivisible_batch_raises():
    model, params = _model_params()
    rng = np.random.default_rng(1)
    images, q_ids, t_ids = _batch(rng, 6)
    with pytest.raises(ValueError, match="divide"):
        gradcache_value_and_grad(
            _emb_loss, _towers(model, images, q_ids, t_ids), params, 4
        )


def _make_trainer(tmp_path, cfg_kwargs, rt=None):
    from knowledge_enhanced_multimodal_retrieval_tpu.data.datasets import (
        DataPipeline,
        make_synthetic_source,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
    from knowledge_enhanced_multimodal_retrieval_tpu.train import trainer as T

    tok = CLIPTokenizer(MERGES)
    arch = M.CLIPArch(**{**TINY.__dict__, "vocab_size": tok.vocab_size})
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    src = make_synthetic_source(32, image_size=32)
    pipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=2)
    cfg = TrainConfig(
        batch_size=16, epochs=1, lr=1e-3,
        checkpoint_dir=str(tmp_path / "ckpt"), **cfg_kwargs,
    )
    trainer = T.CLIPTrainer(model, params, pipe, None, cfg, rt=rt, out_dir=str(tmp_path))
    db = trainer._device_batch(pipe.make_batch(list(range(16))))
    return trainer, db


def test_dp_step_matches_direct_step(devices8, tmp_path):
    """One grad-cache DP step == one direct DP step (same params out),
    with global negatives so stage 2 differentiates through all_gather."""
    t_direct, db = _make_trainer(tmp_path, {"global_negatives": True})
    t_cached, _ = _make_trainer(tmp_path, {"global_negatives": True, "grad_cache_chunks": 2})

    s_d, m_d = t_direct.train_step(t_direct.state, db)
    s_c, m_c = t_cached.train_step(t_cached.state, db)
    assert float(m_c["loss"]) == pytest.approx(float(m_d["loss"]), rel=1e-5)
    assert float(m_c["grad_norm"]) == pytest.approx(float(m_d["grad_norm"]), rel=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_d["params"]), jax.tree_util.tree_leaves(s_c["params"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-5)


def test_composes_with_flip_and_qat(devices8, tmp_path):
    """grad_cache_chunks x image_mask_ratio x qat: the chunked step sees the
    SAME per-image masks as the direct step (mask derives from (seed, step),
    computed on the full local batch before chunking) — losses match."""
    t_direct, db = _make_trainer(tmp_path, {"image_mask_ratio": 0.5, "qat": True})
    t_cached, _ = _make_trainer(
        tmp_path, {"image_mask_ratio": 0.5, "qat": True, "grad_cache_chunks": 2}
    )
    _, m_d = t_direct.train_step(t_direct.state, db)
    _, m_c = t_cached.train_step(t_cached.state, db)
    assert float(m_c["loss"]) == pytest.approx(float(m_d["loss"]), rel=1e-5)


def test_lora_step_matches_direct(devices8, tmp_path):
    t_direct, db = _make_trainer(tmp_path, {"lora_rank": 2, "global_negatives": True})
    t_cached, _ = _make_trainer(
        tmp_path, {"lora_rank": 2, "global_negatives": True, "grad_cache_chunks": 2}
    )
    s_d, m_d = t_direct.train_step(t_direct.state, db)
    s_c, m_c = t_cached.train_step(t_cached.state, db)
    assert float(m_c["loss"]) == pytest.approx(float(m_d["loss"]), rel=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_d["params"]), jax.tree_util.tree_leaves(s_c["params"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-5)


def test_activation_memory_shrinks_with_chunks():
    """The compiled program's temp (activation) memory drops with chunk
    count — the point of the whole exercise. XLA's memory analysis is the
    ground truth the OOM behavior follows."""
    arch = M.CLIPArch(
        embed_dim=64, image_resolution=64, vision_layers=4, vision_width=128,
        vision_patch_size=8, context_length=32, vocab_size=128, text_width=128,
        text_heads=4, text_layers=4,
    )
    model = M.CLIP(arch, dtype=jnp.float32)
    params = jax.eval_shape(lambda k: M.init_params(model, k), jax.random.PRNGKey(0))
    images = jax.ShapeDtypeStruct((64, 64, 64, 3), jnp.float32)
    ids = jax.ShapeDtypeStruct((64, 32), jnp.int32)

    def towers(images, q, t):
        enc_img = lambda p, x: l2_normalize(  # noqa: E731
            model.apply({"params": p}, x, method=CLIP.encode_image)
        )
        enc_txt = lambda p, i: l2_normalize(  # noqa: E731
            model.apply({"params": p}, i, method=CLIP.encode_text)
        )
        return [(enc_img, (images,)), (enc_txt, (q,)), (enc_txt, (t,))]

    def temp_bytes(chunks):
        def f(p, images, q, t):
            (_, m), g = gradcache_value_and_grad(
                _emb_loss, towers(images, q, t), p, chunks
            )
            return m["loss"], g

        mem = jax.jit(f).lower(params, images, ids, ids).compile().memory_analysis()
        return mem.temp_size_in_bytes

    t1, t8 = temp_bytes(1), temp_bytes(8)
    assert t8 < 0.5 * t1, f"chunked temp {t8} not < 50% of direct {t1}"
