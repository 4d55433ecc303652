"""Tensor-parallel sharding tests (parallel/tp.py + make_train_step_gspmd).

The reference has no tensor parallelism (SURVEY §2 inventory — DDP only);
these tests pin the framework's optional ``model``-axis extension: Megatron
column/row param specs, GSPMD-partitioned train step on a (data, model)
mesh, and numeric equivalence with the data-parallel shard_map step.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
from knowledge_enhanced_multimodal_retrieval_tpu.parallel.mesh import MeshRuntime
from knowledge_enhanced_multimodal_retrieval_tpu.parallel.sharding import (
    host_local_batch_to_global,
    replicated,
)
from knowledge_enhanced_multimodal_retrieval_tpu.parallel.tp import (
    shard_params_tp,
    tp_param_pspecs,
)
from knowledge_enhanced_multimodal_retrieval_tpu.train.trainer import (
    init_state_gspmd,
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


def test_tp_pspecs_rules(devices8):
    _, params = _model_and_params()
    specs = tp_param_pspecs(params)
    blk = specs["text"]["transformer"]["resblocks_0"]
    assert blk["attn"]["in_proj"]["kernel"] == P(None, "model")
    assert blk["attn"]["in_proj"]["bias"] == P("model")
    assert blk["attn"]["out_proj"]["kernel"] == P("model", None)
    assert blk["attn"]["out_proj"]["bias"] == P(None)
    assert blk["mlp"]["c_fc"]["kernel"] == P(None, "model")
    assert blk["mlp"]["c_proj"]["kernel"] == P("model", None)
    # non-matmul leaves replicate
    assert blk["ln_1"]["ln"]["scale"] == P(None)
    assert specs["logit_scale"] == P()
    # every param leaf got a spec (same tree structure)
    assert jax.tree_util.tree_structure(specs) == jax.tree_util.tree_structure(params)


def test_tp_sharded_forward_matches_replicated(devices8):
    """encode on tp-sharded params == encode on replicated params."""
    model, params = _model_and_params()
    rt = MeshRuntime.create(MeshConfig(data_parallel=2, model_parallel=4))
    rng = np.random.default_rng(0)
    ids = _batch(8, rng)["query_ids"]

    ref = M.encode_text(model, params, jnp.asarray(ids))
    params_tp = shard_params_tp(params, rt.mesh)
    # actually sharded, not a no-op
    k = params_tp["text"]["transformer"]["resblocks_0"]["mlp"]["c_fc"]["kernel"]
    assert not k.sharding.is_fully_replicated
    got = jax.jit(lambda p, i: M.encode_text(model, p, i))(params_tp, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_gspmd_step_matches_dp_global_negatives(devices8):
    """One dp x tp GSPMD step == one dp-only shard_map step (global negatives)."""
    rng = np.random.default_rng(1)
    batch_np = _batch(8, rng)
    cfg = TrainConfig(batch_size=8, epochs=1, grad_accum_steps=1, global_negatives=True)

    # data-parallel reference: 8x1 mesh, shard_map + pmean
    model, params = _model_and_params()
    rt_dp = MeshRuntime.create(MeshConfig(data_parallel=8))
    opt = make_optimizer(cfg, steps_per_epoch=1, params=params)
    state_dp = {
        "params": jax.device_put(params, replicated(rt_dp.mesh)),
        "opt_state": jax.device_put(opt.init(params), replicated(rt_dp.mesh)),
        "step": jnp.zeros((), jnp.int32),
    }
    step_dp = make_train_step(model, opt, cfg, rt_dp)
    batch_dp = host_local_batch_to_global(batch_np, rt_dp.mesh, rt_dp.data_axis)
    state_dp, metrics_dp = step_dp(state_dp, batch_dp)

    # tensor-parallel: 4x2 mesh, GSPMD
    model2, params2 = _model_and_params()
    rt_tp = MeshRuntime.create(MeshConfig(data_parallel=4, model_parallel=2))
    opt2 = make_optimizer(cfg, steps_per_epoch=1, params=params2)
    state_tp = init_state_gspmd(opt2, params2, rt_tp)
    step_tp = make_train_step_gspmd(model2, opt2, cfg)
    batch_tp = host_local_batch_to_global(batch_np, rt_tp.mesh, rt_tp.data_axis)
    state_tp, metrics_tp = step_tp(state_tp, batch_tp)

    np.testing.assert_allclose(
        float(metrics_tp["loss"]), float(metrics_dp["loss"]), atol=1e-5
    )
    flat_dp = jax.tree_util.tree_leaves(state_dp["params"])
    flat_tp = jax.tree_util.tree_leaves(state_tp["params"])
    for a, b in zip(flat_dp, flat_tp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_clip_trainer_tensor_parallel(devices8, tmp_path):
    """CLIPTrainer on a (4, 2) mesh: tp state, GSPMD step, val + checkpoints."""
    import os

    from knowledge_enhanced_multimodal_retrieval_tpu.data.datasets import (
        DataPipeline,
        make_synthetic_source,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
    from knowledge_enhanced_multimodal_retrieval_tpu.train import trainer as T

    tok = CLIPTokenizer([("c", "a"), ("ca", "t</w>"), ("h", "e"), ("he", "l")])
    arch = M.CLIPArch(**{**_ARCH.__dict__, "vocab_size": tok.vocab_size})
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    src = make_synthetic_source(32, image_size=32)
    pipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=2)
    cfg = TrainConfig(
        batch_size=16, epochs=2, lr=1e-3, global_negatives=True,
        checkpoint_dir=os.path.join(str(tmp_path), "ckpt"), log_every=1,
    )
    rt = MeshRuntime.create(MeshConfig(data_parallel=4, model_parallel=2))
    trainer = T.CLIPTrainer(model, params, pipe, pipe, cfg, rt=rt, out_dir=str(tmp_path))
    assert trainer.tensor_parallel
    k = trainer.state["params"]["text"]["transformer"]["resblocks_0"]["mlp"]["c_fc"]["kernel"]
    assert not k.sharding.is_fully_replicated
    result = trainer.train()
    assert result["epochs_run"] == 2
    assert os.path.isdir(os.path.join(str(tmp_path), "ckpt", "checkpoint_latest"))


def test_gspmd_opt_state_inherits_param_sharding(devices8):
    """optimizer.init under jit propagates tp shardings onto Adam moments."""
    model, params = _model_and_params()
    rt = MeshRuntime.create(MeshConfig(data_parallel=2, model_parallel=4))
    cfg = TrainConfig(batch_size=8, epochs=1)
    opt = make_optimizer(cfg, steps_per_epoch=1, params=params)
    state = init_state_gspmd(opt, params, rt)
    pk = state["params"]["text"]["transformer"]["resblocks_0"]["mlp"]["c_fc"]["kernel"]

    found = []

    def visit(leaf):
        if hasattr(leaf, "sharding") and getattr(leaf, "shape", None) == pk.shape:
            found.append(leaf.sharding)

    jax.tree_util.tree_map(visit, state["opt_state"])
    assert found, "no moment leaves matching the c_fc kernel shape"
    assert any(s == pk.sharding for s in found)
