"""FLIP-style masked image training (models/clip.py keep_idx,
TrainConfig.image_mask_ratio; Li et al. 2022, arXiv:2212.00794).

Static-size patch subsets cut the vision tower's train FLOPs by the mask
ratio; eval/serving stay unmasked. No reference counterpart.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
from knowledge_enhanced_multimodal_retrieval_tpu.models.clip import CLIP
from knowledge_enhanced_multimodal_retrieval_tpu.train.trainer import sample_keep_idx
from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import TrainConfig


def _tiny():
    arch = M.CLIPArch(16, 32, 1, 32, 16, 16, 64, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    return model, params


def test_sample_keep_idx_shapes_and_validity():
    idx = sample_keep_idx(jax.random.PRNGKey(0), batch=5, n_patches=16, ratio=0.5)
    assert idx.shape == (5, 8) and idx.dtype == jnp.int32
    a = np.asarray(idx)
    assert a.min() >= 0 and a.max() < 16
    for row in a:  # subsets: no duplicate patches within an image
        assert len(set(row.tolist())) == len(row)
    # rows differ across the batch (random per image)
    assert not all(np.array_equal(a[0], r) for r in a[1:])


def test_full_keep_idx_matches_unmasked():
    """keep_idx = identity permutation reproduces the unmasked forward
    exactly (the gather is AFTER pos-embed, so order+content both match)."""
    model, params = _tiny()
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    full = model.apply({"params": params}, imgs, method=CLIP.encode_image)
    n_patches = model.arch.grid_size**2
    ident = jnp.broadcast_to(jnp.arange(n_patches, dtype=jnp.int32), (2, n_patches))
    masked = model.apply({"params": params}, imgs, ident, method=CLIP.encode_image)
    np.testing.assert_allclose(np.asarray(full), np.asarray(masked), atol=1e-5)


def test_masked_forward_drops_tokens_but_stays_close():
    model, params = _tiny()
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    full = model.apply({"params": params}, imgs, method=CLIP.encode_image)
    keep = sample_keep_idx(jax.random.PRNGKey(1), 2, model.arch.grid_size**2, 0.5)
    masked = model.apply({"params": params}, imgs, keep, method=CLIP.encode_image)
    assert masked.shape == full.shape
    d = float(jnp.abs(full - masked).max())
    assert 0 < d  # it really masked something


def test_mask_ratio_train_step_descends_and_is_deterministic(devices8, tmp_path):
    from knowledge_enhanced_multimodal_retrieval_tpu.data.datasets import (
        DataPipeline,
        make_synthetic_source,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
    from knowledge_enhanced_multimodal_retrieval_tpu.train import trainer as T
    from tests.test_trainer import MERGES, TINY

    tok = CLIPTokenizer(MERGES)
    arch = M.CLIPArch(**{**TINY.__dict__, "vocab_size": tok.vocab_size})
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    src = make_synthetic_source(32, image_size=32)
    pipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=2)
    cfg = TrainConfig(
        batch_size=16, epochs=1, lr=1e-3, image_mask_ratio=0.5,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    trainer = T.CLIPTrainer(model, params, pipe, None, cfg, out_dir=str(tmp_path))
    db = trainer._device_batch(pipe.make_batch(list(range(16))))
    state, losses = trainer.state, []
    for _ in range(8):
        state, metrics = trainer.train_step(state, db)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses

    # same (params, batch, step) -> same masked loss: the mask derives from
    # (seed, step), not hidden state
    trainer2 = T.CLIPTrainer(model, params, pipe, None, cfg, out_dir=str(tmp_path))
    _, m1 = trainer2.train_step(trainer2.state, db)
    trainer3 = T.CLIPTrainer(model, params, pipe, None, cfg, out_dir=str(tmp_path))
    _, m2 = trainer3.train_step(trainer3.state, db)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)


def test_mask_composes_with_qat_and_gspmd(devices8, tmp_path):
    """image_mask_ratio rides the GSPMD (tp) step and the QAT forward."""
    from knowledge_enhanced_multimodal_retrieval_tpu.data.datasets import (
        DataPipeline,
        make_synthetic_source,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
    from knowledge_enhanced_multimodal_retrieval_tpu.train import trainer as T
    from tests.test_trainer import MERGES, TINY

    tok = CLIPTokenizer(MERGES)
    arch = M.CLIPArch(**{**TINY.__dict__, "vocab_size": tok.vocab_size})
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    src = make_synthetic_source(32, image_size=32)
    pipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=2)
    from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime
    from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import MeshConfig

    cfg = TrainConfig(
        batch_size=16, epochs=1, lr=1e-3, image_mask_ratio=0.25, qat=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    rt = MeshRuntime.create(MeshConfig(data_parallel=4, model_parallel=2))
    trainer = T.CLIPTrainer(model, params, pipe, None, cfg, rt=rt, out_dir=str(tmp_path))
    db = trainer._device_batch(pipe.make_batch(list(range(16))))
    state, m = trainer.train_step(trainer.state, db)
    assert np.isfinite(float(m["loss"]))
