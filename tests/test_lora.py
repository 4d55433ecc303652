"""LoRA tests (train/lora.py + CLIPTrainer integration)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
from knowledge_enhanced_multimodal_retrieval_tpu.train import lora as L
from knowledge_enhanced_multimodal_retrieval_tpu.train import trainer as T
from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import TrainConfig
from tests.test_trainer import MERGES, TINY, setup  # noqa: F401 (fixture)


def _cfg(tmp, **kw):
    base = dict(
        batch_size=16, epochs=2, lr=1e-2, early_stop_patience=3,
        checkpoint_dir=os.path.join(tmp, "ckpt"), log_every=1,
        lora_rank=2, lora_alpha=4.0,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_lora_init_shapes_and_targets(setup):
    model, params, pipe = setup
    ad = L.lora_init(jax.random.PRNGKey(0), params, rank=3, targets="attn")
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    n_targets = sum(
        1 for p, leaf in flat
        if leaf.ndim == 2 and L._is_target(p, "attn")
    )
    got = [x for x in jax.tree_util.tree_leaves(ad) if hasattr(x, "shape")]
    assert len(got) == 2 * n_targets and n_targets > 0
    # A is [in, r], B is [r, out] and zero
    ad_all = L.lora_init(jax.random.PRNGKey(0), params, rank=3, targets="all")
    assert L.lora_param_count(ad_all) > L.lora_param_count(ad)


def test_lora_merge_identity_at_init(setup):
    """B = 0 at init, so the merged model IS the base model."""
    model, params, pipe = setup
    ad = L.lora_init(jax.random.PRNGKey(1), params, rank=4, targets="all")
    merged = L.lora_merge(params, ad, scale=2.0)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lora_merge_applies_update(setup):
    model, params, pipe = setup
    ad = L.lora_init(jax.random.PRNGKey(1), params, rank=2, targets="attn")
    # poke one adapter's B and check only its kernel moves, by exactly s*A@B
    ad = jax.tree_util.tree_map(lambda x: x + 0.1 if x.ndim == 2 and x.shape[0] == 2 else x, ad)
    merged = L.lora_merge(params, ad, scale=0.5)
    moved = unchanged = 0
    for (path, p), m in zip(
        jax.tree_util.tree_flatten_with_path(params)[0], jax.tree_util.tree_leaves(merged)
    ):
        if p.ndim == 2 and L._is_target(path, "attn"):
            moved += 1
            assert not np.allclose(np.asarray(p), np.asarray(m))
        else:
            unchanged += 1
            np.testing.assert_array_equal(np.asarray(p), np.asarray(m))
    assert moved > 0 and unchanged > 0


def test_lora_validation_errors(setup):
    model, params, pipe = setup
    with pytest.raises(ValueError, match="targets"):
        L.lora_init(jax.random.PRNGKey(0), params, rank=2, targets="everything")
    with pytest.raises(ValueError, match="rank"):
        L.lora_init(jax.random.PRNGKey(0), params, rank=0)


def test_lora_trainer_reduces_loss_and_freezes_base(setup, devices8, tmp_path):
    model, params, pipe = setup
    cfg = _cfg(str(tmp_path))
    trainer = T.CLIPTrainer(model, params, pipe, None, cfg, out_dir=str(tmp_path))
    assert trainer.lora
    base_before = jax.tree_util.tree_map(np.asarray, trainer.base_params)
    batch = pipe.make_batch(list(range(16)))
    db = trainer._device_batch(batch)
    state = trainer.state
    losses = []
    for _ in range(8):
        state, metrics = trainer.train_step(state, db)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    # base params untouched; adapters moved (B no longer zero)
    for a, b in zip(
        jax.tree_util.tree_leaves(base_before), jax.tree_util.tree_leaves(trainer.base_params)
    ):
        np.testing.assert_array_equal(a, np.asarray(b))
    bs = [
        x for x in jax.tree_util.tree_leaves(state["params"])
        if hasattr(x, "shape") and x.shape[0] == cfg.lora_rank
    ]
    assert any(float(jnp.abs(b).max()) > 0 for b in bs)
    # eval_params reflects training: differs from base on target kernels
    trainer.state = state
    merged = trainer.eval_params()
    diffs = [
        float(jnp.abs(m - p).max())
        for m, p in zip(jax.tree_util.tree_leaves(merged), jax.tree_util.tree_leaves(trainer.base_params))
    ]
    assert max(diffs) > 0


def test_lora_trainer_epoch_checkpoint_resume(setup, devices8, tmp_path):
    model, params, pipe = setup
    cfg = _cfg(str(tmp_path), epochs=1)
    trainer = T.CLIPTrainer(model, params, pipe, pipe, cfg, out_dir=str(tmp_path))
    out = trainer.train()
    assert out["history"][-1]["monitor"] > 0 if isinstance(out, dict) and "history" in out else True
    cfg2 = _cfg(str(tmp_path), epochs=1, resume=True)
    trainer2 = T.CLIPTrainer(model, params, pipe, pipe, cfg2, out_dir=str(tmp_path))
    assert trainer2.start_epoch == 1  # resumed past the finished epoch
    # resumed adapters equal the saved ones
    for a, b in zip(
        jax.tree_util.tree_leaves(trainer.state["params"]),
        jax.tree_util.tree_leaves(trainer2.state["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_lora_rejects_tp_fsdp(setup, devices8, tmp_path):
    model, params, pipe = setup
    from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime
    from knowledge_enhanced_multimodal_retrieval_tpu.parallel.mesh import MeshConfig

    rt = MeshRuntime.create(MeshConfig(model_parallel=2))
    with pytest.raises(ValueError, match="lora"):
        T.CLIPTrainer(model, params, pipe, None, _cfg(str(tmp_path)), rt, out_dir=str(tmp_path))


def test_adapter_save_load_roundtrip(setup, tmp_path):
    model, params, pipe = setup
    ad = L.lora_init(jax.random.PRNGKey(3), params, rank=2, targets="all")
    ad = jax.tree_util.tree_map(lambda x: x + 0.25, ad)
    path = os.path.join(str(tmp_path), "adapters.npz")
    L.save_adapters(path, ad, {"rank": 2, "alpha": 4.0, "targets": "all"})
    loaded, meta = L.load_adapters(path, params)
    assert meta["rank"] == 2 and meta["targets"] == "all"
    for a, b in zip(jax.tree_util.tree_leaves(ad), jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    m1 = L.lora_merge(params, ad, 2.0)
    m2 = L.lora_merge(params, loaded, 2.0)
    for a, b in zip(jax.tree_util.tree_leaves(m1), jax.tree_util.tree_leaves(m2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_model_adapters_flag_merges_at_load(setup, tmp_path, monkeypatch):
    """--model.adapters merges the artifact into the base params for every
    CLI entry point (the serve-the-adapted-model path)."""
    import numpy as np

    from knowledge_enhanced_multimodal_retrieval_tpu.cli.common import build_model_and_params
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import config_from_argv

    model, params, pipe = setup
    monkeypatch.setitem(M.ARCHS, "tiny-lora", model.arch)
    cfg = config_from_argv(["--model.name=tiny-lora", "--model.dtype=float32"])
    _, base = build_model_and_params(cfg, rng_seed=0)

    ad = L.lora_init(jax.random.PRNGKey(5), base, rank=2, targets="attn")
    ad = jax.tree_util.tree_map(lambda x: x + 0.3, ad)
    path = os.path.join(str(tmp_path), "ad.npz")
    L.save_adapters(path, ad, {"rank": 2, "alpha": 6.0, "targets": "attn"})

    cfg2 = config_from_argv([
        "--model.name=tiny-lora", "--model.dtype=float32", f"--model.adapters={path}",
    ])
    _, merged = build_model_and_params(cfg2, rng_seed=0)
    want = L.lora_merge(base, ad, 3.0)  # alpha/rank = 6/2
    for a, b in zip(jax.tree_util.tree_leaves(want), jax.tree_util.tree_leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_cli_merges_adapters(setup, tmp_path, monkeypatch):
    """cli/export --model.adapters exports the ADAPTED weights."""
    import numpy as np

    from knowledge_enhanced_multimodal_retrieval_tpu.cli.export import main as export_main
    from knowledge_enhanced_multimodal_retrieval_tpu.models.convert import (
        load_clip_params,
        save_params_npz,
    )

    model, params, pipe = setup
    base_path = os.path.join(str(tmp_path), "base.npz")
    save_params_npz(params, base_path)
    ad = L.lora_init(jax.random.PRNGKey(7), params, rank=2, targets="attn")
    ad = jax.tree_util.tree_map(lambda x: x + 0.2, ad)
    ad_path = os.path.join(str(tmp_path), "ad.npz")
    L.save_adapters(ad_path, ad, {"rank": 2, "alpha": 4.0, "targets": "attn"})
    out = export_main([
        "--out", os.path.join(str(tmp_path), "merged.npz"), "--format", "npz",
        f"--model.checkpoint={base_path}", f"--model.adapters={ad_path}",
    ])
    merged = load_clip_params(out)
    want = L.lora_merge(params, ad, 2.0)
    for a, b in zip(jax.tree_util.tree_leaves(want), jax.tree_util.tree_leaves(merged)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_lora_param_budget(setup):
    """The point of LoRA: adapters are a sliver of the full tree."""
    model, params, pipe = setup
    ad = L.lora_init(jax.random.PRNGKey(0), params, rank=2, targets="all")
    full = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert L.lora_param_count(ad) < 0.2 * full  # tiny model; ~0.1% at L/14
