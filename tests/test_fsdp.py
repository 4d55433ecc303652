"""FSDP/ZeRO-3 sharding (parallel/fsdp.py + init_state_fsdp): spec rules,
actual 1/n state sharding, numeric equivalence with the replicated DP step,
dp×tp composition, and the MeshConfig(fsdp=True) trainer path."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
from knowledge_enhanced_multimodal_retrieval_tpu.parallel.fsdp import (
    fsdp_param_pspecs,
    fsdp_shardings,
    shard_params_fsdp,
)
from knowledge_enhanced_multimodal_retrieval_tpu.parallel.mesh import MeshRuntime
from knowledge_enhanced_multimodal_retrieval_tpu.parallel.sharding import (
    host_local_batch_to_global,
    replicated,
)
from knowledge_enhanced_multimodal_retrieval_tpu.parallel.tp import tp_param_pspecs
from knowledge_enhanced_multimodal_retrieval_tpu.train.trainer import (
    init_state_fsdp,
    make_optimizer,
    make_train_step,
    make_train_step_gspmd,
)
from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import MeshConfig, TrainConfig

_ARCH = M.CLIPArch(
    embed_dim=16, image_resolution=32, vision_layers=2, vision_width=32,
    vision_patch_size=16, context_length=16, vocab_size=128, text_width=32,
    text_heads=2, text_layers=2, vision_heads=2,
)


def _model_and_params():
    model = M.CLIP(_ARCH, dtype=jnp.float32)
    return model, M.init_params(model, jax.random.PRNGKey(0))


def _batch(n, rng):
    ids = np.zeros((n, 16), np.int32)
    ids[:, 0] = 126
    ids[:, 1] = rng.integers(1, 120, n)
    ids[:, 2] = 127
    return {
        "images": rng.standard_normal((n, 32, 32, 3)).astype(np.float32),
        "query_ids": ids,
        "target_ids": ids.copy(),
    }


def test_fsdp_pspec_rules(devices8):
    _, params = _model_and_params()
    specs = fsdp_param_pspecs(params, n_shards=8)
    blk = specs["text"]["transformer"]["resblocks_0"]
    # c_fc kernel [32, 128]: largest divisible dim (128) shards
    assert blk["mlp"]["c_fc"]["kernel"] == P(None, "data")
    # token embedding [128, 32]: vocab dim shards
    assert specs["text"]["token_embedding"]["embedding"] == P("data", None)
    # tiny leaves replicate (LN scale [32] < min_size, scalars)
    assert blk["ln_1"]["ln"]["scale"] == P()
    assert specs["logit_scale"] == P()
    assert jax.tree_util.tree_structure(specs) == jax.tree_util.tree_structure(params)


def test_fsdp_composes_with_tp_specs(devices8):
    _, params = _model_and_params()
    base = tp_param_pspecs(params)
    specs = fsdp_param_pspecs(params, n_shards=4, base=base)
    blk = specs["text"]["transformer"]["resblocks_0"]
    # tp takes the output dim of c_fc; fsdp picks up the spare input dim
    assert blk["mlp"]["c_fc"]["kernel"] == P("data", "model")
    # row-parallel kernel [4w, w]: tp on dim 0, fsdp on dim 1
    assert blk["mlp"]["c_proj"]["kernel"] == P("model", "data")
    # tp-sharded bias [4w] has no spare dim: keeps its tp spec
    assert blk["mlp"]["c_fc"]["bias"] == P("model")


def test_fsdp_actually_shards_state_1_over_n(devices8):
    _, params = _model_and_params()
    rt = MeshRuntime.create(MeshConfig(data_parallel=8, fsdp=True))
    sharded = shard_params_fsdp(params, rt.mesh)
    k = sharded["text"]["transformer"]["resblocks_0"]["mlp"]["c_fc"]["kernel"]
    assert not k.sharding.is_fully_replicated
    local = k.addressable_shards[0].data
    assert local.size == k.size // 8  # per-device memory is 1/n

    opt = make_optimizer(TrainConfig(batch_size=8), steps_per_epoch=1, params=params)
    state = init_state_fsdp(opt, params, rt)
    mu = jax.tree_util.tree_leaves(
        state["opt_state"],
        is_leaf=lambda x: hasattr(x, "sharding"),
    )
    # every Adam-moment leaf with a sharded shape shards like its param
    pk = state["params"]["text"]["transformer"]["resblocks_0"]["mlp"]["c_fc"]["kernel"]
    assert any(
        getattr(m, "shape", None) == pk.shape and m.sharding == pk.sharding for m in mu
    )


def test_fsdp_step_matches_dp_global_negatives(devices8):
    """One FSDP GSPMD step == one replicated dp shard_map step."""
    rng = np.random.default_rng(1)
    batch_np = _batch(8, rng)
    cfg = TrainConfig(batch_size=8, epochs=1, grad_accum_steps=1, global_negatives=True)

    model, params = _model_and_params()
    rt_dp = MeshRuntime.create(MeshConfig(data_parallel=8))
    opt = make_optimizer(cfg, steps_per_epoch=1, params=params)
    state_dp = {
        "params": jax.device_put(params, replicated(rt_dp.mesh)),
        "opt_state": jax.device_put(opt.init(params), replicated(rt_dp.mesh)),
        "step": jnp.zeros((), jnp.int32),
    }
    step_dp = make_train_step(model, opt, cfg, rt_dp)
    state_dp, metrics_dp = step_dp(state_dp, host_local_batch_to_global(batch_np, rt_dp.mesh, rt_dp.data_axis))

    model2, params2 = _model_and_params()
    rt_f = MeshRuntime.create(MeshConfig(data_parallel=8, fsdp=True))
    opt2 = make_optimizer(cfg, steps_per_epoch=1, params=params2)
    state_f = init_state_fsdp(opt2, params2, rt_f)
    step_f = make_train_step_gspmd(model2, opt2, cfg)
    state_f, metrics_f = step_f(state_f, host_local_batch_to_global(batch_np, rt_f.mesh, rt_f.data_axis))

    np.testing.assert_allclose(float(metrics_f["loss"]), float(metrics_dp["loss"]), atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_f["params"]),
        jax.tree_util.tree_leaves(state_dp["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_fsdp_tp_composed_step_matches_dp(devices8):
    """dp4(fsdp) × tp2: composed state sharding, same numerics as dp."""
    rng = np.random.default_rng(2)
    batch_np = _batch(8, rng)
    cfg = TrainConfig(batch_size=8, epochs=1, grad_accum_steps=1, global_negatives=True)

    model, params = _model_and_params()
    rt_dp = MeshRuntime.create(MeshConfig(data_parallel=8))
    opt = make_optimizer(cfg, steps_per_epoch=1, params=params)
    state_dp = {
        "params": jax.device_put(params, replicated(rt_dp.mesh)),
        "opt_state": jax.device_put(opt.init(params), replicated(rt_dp.mesh)),
        "step": jnp.zeros((), jnp.int32),
    }
    step_dp = make_train_step(model, opt, cfg, rt_dp)
    state_dp, _ = step_dp(state_dp, host_local_batch_to_global(batch_np, rt_dp.mesh, rt_dp.data_axis))

    model2, params2 = _model_and_params()
    rt_ft = MeshRuntime.create(MeshConfig(data_parallel=4, model_parallel=2, fsdp=True))
    opt2 = make_optimizer(cfg, steps_per_epoch=1, params=params2)
    state_ft = init_state_fsdp(opt2, params2, rt_ft)
    # composed sharding really engages both axes somewhere in the tree
    k = state_ft["params"]["text"]["transformer"]["resblocks_0"]["mlp"]["c_fc"]["kernel"]
    assert k.sharding.spec == P("data", "model")
    step_ft = make_train_step_gspmd(model2, opt2, cfg)
    state_ft, _ = step_ft(state_ft, host_local_batch_to_global(batch_np, rt_ft.mesh, rt_ft.data_axis))

    for a, b in zip(
        jax.tree_util.tree_leaves(state_ft["params"]),
        jax.tree_util.tree_leaves(state_dp["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_fsdp_shardings_validation(devices8):
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]), ("expert",))
    _, params = _model_and_params()
    with pytest.raises(ValueError, match="no axis"):
        fsdp_shardings(params, mesh)


def test_trainer_fsdp_mode_trains(devices8, tmp_path):
    """CLIPTrainer with MeshConfig(fsdp=True): loss decreases and the live
    train state is actually sharded over the data axis."""
    from knowledge_enhanced_multimodal_retrieval_tpu.data.datasets import (
        DataPipeline,
        make_synthetic_source,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
    from knowledge_enhanced_multimodal_retrieval_tpu.train.trainer import CLIPTrainer

    tok = CLIPTokenizer([("c", "a"), ("ca", "t</w>")])
    arch = M.CLIPArch(**{**_ARCH.__dict__, "vocab_size": tok.vocab_size})
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    src = make_synthetic_source(32, image_size=32)
    pipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=2)
    cfg = TrainConfig(
        batch_size=16, epochs=1, lr=1e-3, global_negatives=True,
        checkpoint_dir=os.path.join(str(tmp_path), "ckpt"), log_every=1,
    )
    rt = MeshRuntime.create(MeshConfig(data_parallel=8, fsdp=True))
    trainer = CLIPTrainer(model, params, pipe, None, cfg, rt=rt, out_dir=str(tmp_path))
    assert trainer.fsdp
    k = trainer.state["params"]["text"]["transformer"]["resblocks_0"]["mlp"]["c_fc"]["kernel"]
    assert not k.sharding.is_fully_replicated
    db = trainer._device_batch(pipe.make_batch(list(range(16))))
    state = trainer.state
    losses = []
    for _ in range(6):
        state, metrics = trainer.train_step(state, db)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses

    # checkpoint round trip keeps values AND re-places with fsdp shardings
    trainer.state = state
    trainer._save("latest", 0)
    before = np.asarray(state["params"]["logit_scale"])
    trainer._resume()
    k2 = trainer.state["params"]["text"]["transformer"]["resblocks_0"]["mlp"]["c_fc"]["kernel"]
    assert not k2.sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(trainer.state["params"]["logit_scale"]), before)
