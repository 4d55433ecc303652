"""Multi-slice hybrid data parallelism (``MeshConfig(dcn_parallel=N)``).

TPU-native extension: a leading ``dcn`` mesh axis models data parallelism
ACROSS TPU slices — batches shard over ``('dcn', 'data')`` jointly, XLA
reduces gradients over ICI within a slice and DCN between slices (on the
virtual CPU mesh both are process-local, but the program topology is the
real multi-slice one). fsdp/tp keep sharding INSIDE a slice (specs never
name ``dcn``), the standard hybrid — weight gathers must not cross DCN.

The numeric pins are exact: a dcn2 x data4 mesh shards a global batch into
the same contiguous 8 pieces as a flat data8 mesh (row-major tuple order),
so the hybrid step must reproduce the flat step's loss and params
bit-for-bit (modulo reduction order) under both local and global
negatives.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.data.datasets import (
    DataPipeline,
    make_synthetic_source,
)
from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime
from knowledge_enhanced_multimodal_retrieval_tpu.train import trainer as T
from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import (
    MeshConfig,
    TrainConfig,
)
from tests.test_trainer import MERGES, TINY


@pytest.fixture(scope="module")
def setup():
    tok = CLIPTokenizer(MERGES)
    arch = M.CLIPArch(**{**TINY.__dict__, "vocab_size": tok.vocab_size})
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    src = make_synthetic_source(64, image_size=32)
    pipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=2)
    return model, params, pipe


def _cfg(tmp, **kw):
    base = dict(
        batch_size=16, epochs=1, lr=1e-3,
        checkpoint_dir=os.path.join(tmp, "ckpt"), log_every=100,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_dcn_mesh_shape_and_shardings(devices8):
    rt = MeshRuntime.create(MeshConfig(dcn_parallel=2, data_parallel=4))
    assert rt.mesh.axis_names == ("dcn", "data", "model")
    assert rt.mesh.shape["dcn"] == 2 and rt.mesh.shape["data"] == 4
    assert rt.dcn_axis == "dcn"
    assert rt.data_axes == ("dcn", "data")
    assert rt.num_data == 8
    spec = rt.data_sharding(2).spec
    assert spec[0] == ("dcn", "data")
    # single-slice runtime unchanged
    flat = MeshRuntime.create(MeshConfig(data_parallel=8))
    assert flat.dcn_axis is None and flat.data_axes == ("data",)
    assert flat.num_data == 8
    with pytest.raises(ValueError, match="does not tile"):
        MeshRuntime.create(MeshConfig(dcn_parallel=3, data_parallel=4))


@pytest.mark.parametrize("global_negatives", [False, True], ids=["local", "global"])
def test_dcn2xdp4_step_matches_flat_dp8(setup, devices8, tmp_path, global_negatives):
    """The hybrid mesh shards the batch into the same 8 contiguous pieces as
    the flat mesh (row-major tuple order), so losses and updated params must
    match to float tolerance — including the global-negatives diagonal
    offsets through _flat_axis_index."""
    model, params, pipe = setup
    batch = pipe.make_batch(list(range(16)))
    results = {}
    for name, mcfg in (
        ("flat", MeshConfig(data_parallel=8)),
        ("hybrid", MeshConfig(dcn_parallel=2, data_parallel=4)),
    ):
        cfg = _cfg(str(tmp_path) + name, global_negatives=global_negatives)
        rt = MeshRuntime.create(mcfg)
        tr = T.CLIPTrainer(model, params, pipe, None, cfg, rt=rt, out_dir=str(tmp_path))
        state, metrics = tr.train_step(tr.state, tr._device_batch(batch))
        results[name] = (
            float(metrics["loss"]),
            np.asarray(state["params"]["text"]["text_projection"]),
        )
    assert results["flat"][0] == pytest.approx(results["hybrid"][0], rel=1e-5)
    np.testing.assert_allclose(results["flat"][1], results["hybrid"][1], atol=2e-6)


def test_dcn_full_trainer_loop(setup, devices8, tmp_path):
    model, params, pipe = setup
    cfg = _cfg(str(tmp_path), ema_decay=0.9)
    rt = MeshRuntime.create(MeshConfig(dcn_parallel=2, data_parallel=4))
    tr = T.CLIPTrainer(model, params, pipe, pipe, cfg, rt=rt, out_dir=str(tmp_path))
    result = tr.train()
    assert result["epochs_run"] == 1 and result["best_epoch"] == 0
    assert "ema_params" in tr.state


def test_dcn_composes_with_fsdp_inside_slice(setup, devices8, tmp_path):
    """fsdp shards state over the intra-slice 'data' axis only (specs never
    name 'dcn'), so each slice holds one full state copy sharded 4 ways —
    and the step still matches the flat dp8 global-negatives step."""
    from jax.sharding import PartitionSpec as P

    model, params, pipe = setup
    batch = pipe.make_batch(list(range(16)))
    cfg = _cfg(str(tmp_path), global_negatives=True)
    rt_flat = MeshRuntime.create(MeshConfig(data_parallel=8))
    tr_flat = T.CLIPTrainer(model, params, pipe, None, cfg, rt=rt_flat, out_dir=str(tmp_path))
    s_flat, m_flat = tr_flat.train_step(tr_flat.state, tr_flat._device_batch(batch))

    rt_h = MeshRuntime.create(MeshConfig(dcn_parallel=2, data_parallel=4, fsdp=True))
    tr_h = T.CLIPTrainer(model, params, pipe, None, cfg, rt=rt_h, out_dir=str(tmp_path))
    kern = tr_h.state["params"]["text"]["text_projection"]
    # the sharding spec must not mention the dcn axis (replicated across it)
    flat_spec = [a for part in kern.sharding.spec if part for a in (part if isinstance(part, tuple) else (part,))]
    assert "dcn" not in flat_spec
    s_h, m_h = tr_h.train_step(tr_h.state, tr_h._device_batch(batch))
    assert float(m_flat["loss"]) == pytest.approx(float(m_h["loss"]), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_flat["params"]["text"]["text_projection"]),
        np.asarray(s_h["params"]["text"]["text_projection"]),
        atol=2e-6,
    )


def test_dcn_mesh_refused_for_serving_shards(setup, devices8):
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.clip_retrieval import (
        CLIPRetrieval,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.embedding_store import (
        EmbeddingStore,
    )

    model, params, pipe = setup
    tok = CLIPTokenizer(MERGES)
    rng = np.random.default_rng(0)
    e = rng.standard_normal((16, model.arch.embed_dim)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    store = EmbeddingStore(image=e, text=e.copy(), uuids=[f"u{i}" for i in range(16)])
    rt = MeshRuntime.create(MeshConfig(dcn_parallel=2, data_parallel=4))
    for kw in (dict(shard_queries=True), dict(shard_corpus=True)):
        with pytest.raises(ValueError, match="multi-slice"):
            CLIPRetrieval(model, params, tok, store, rt=rt, **kw)


def test_dcn_composes_with_lora(setup, devices8, tmp_path):
    """The LoRA adapter step rides the axis tuple too: dcn2 x dp4 matches
    flat dp8 adapter training exactly."""
    model, params, pipe = setup
    batch = pipe.make_batch(list(range(16)))
    leafs = {}
    for name, mcfg in (
        ("flat", MeshConfig(data_parallel=8)),
        ("hybrid", MeshConfig(dcn_parallel=2, data_parallel=4)),
    ):
        cfg = _cfg(str(tmp_path) + name, lora_rank=2, global_negatives=True)
        rt = MeshRuntime.create(mcfg)
        tr = T.CLIPTrainer(model, params, pipe, None, cfg, rt=rt, out_dir=str(tmp_path))
        state, metrics = tr.train_step(tr.state, tr._device_batch(batch))
        merged = tr._merge(tr.base_params, state["params"])
        leafs[name] = (
            float(metrics["loss"]),
            np.asarray(merged["text"]["text_projection"]),
        )
    assert leafs["flat"][0] == pytest.approx(leafs["hybrid"][0], rel=1e-5)
    np.testing.assert_allclose(leafs["flat"][1], leafs["hybrid"][1], atol=2e-6)
