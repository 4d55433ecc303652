"""SigLIP pairwise sigmoid loss (train/losses.py::sigmoid_contrastive).

TPU-native opt-in objective (the reference trains softmax InfoNCE only,
``src/clip/train/losses.py:11-63``): every pair is an independent binary
problem, so global-batch negatives cost exactly one all_gather and the
cross-device mean is exact. Oracle-pinned against the published formula
(Zhai et al. 2023) and integration-tested via ``TrainConfig.loss='siglip'``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime
from knowledge_enhanced_multimodal_retrieval_tpu.train.losses import (
    joint_loss_for_config,
    joint_sigmoid_loss,
    sigmoid_contrastive,
)


def _feats(rng, n=16, d=8):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return jnp.asarray(x / np.linalg.norm(x, axis=1, keepdims=True))


def test_sigmoid_matches_formula_oracle(rng):
    a, b = _feats(rng), _feats(rng)
    loss, metrics = sigmoid_contrastive(a, b, temperature=0.1, bias=-10.0)
    # stable log-sigmoid oracle: log sigmoid(x) = min(x, 0) - log1p(exp(-|x|))
    la = np.asarray(a, np.float64) @ np.asarray(b, np.float64).T / 0.1 - 10.0
    z = -np.ones_like(la)
    np.fill_diagonal(z, 1.0)
    x = z * la
    want = float(-np.mean(np.sum(np.minimum(x, 0.0) - np.log1p(np.exp(-np.abs(x))), axis=-1)))
    assert float(loss) == pytest.approx(want, rel=1e-5)
    assert float(metrics["loss"]) == float(loss)


def test_sigmoid_alignment_lowers_loss(rng):
    a = _feats(rng)
    aligned, _ = sigmoid_contrastive(a, a)
    random, _ = sigmoid_contrastive(a, _feats(rng))
    assert float(aligned) < float(random)


def test_sigmoid_bias_shifts_negative_pressure(rng):
    """More negative bias -> negatives are 'easier' (loss drops) on random
    features, because off-diagonal pairs start deep in the correct class."""
    a, b = _feats(rng), _feats(rng)
    shallow, _ = sigmoid_contrastive(a, b, bias=0.0)
    deep, _ = sigmoid_contrastive(a, b, bias=-10.0)
    assert float(deep) < float(shallow)


def test_sigmoid_global_negatives_equals_dense(rng, devices8):
    """Sharded (all_gather + pmean) == unsharded global loss — the property
    that makes siglip the cheap global-negatives objective."""
    rt = MeshRuntime.create()
    a, b = _feats(rng, n=32), _feats(rng, n=32)
    dense, _ = sigmoid_contrastive(a, b, temperature=0.1, bias=-5.0)

    def local(a_, b_):
        loss, _ = sigmoid_contrastive(a_, b_, temperature=0.1, bias=-5.0, axis_name="data")
        return jax.lax.pmean(loss, "data")

    sharded = shard_map(
        local, mesh=rt.mesh, in_specs=(P("data"), P("data")), out_specs=P(), check_vma=False
    )
    out = jax.jit(sharded)(a, b)
    assert float(out) == pytest.approx(float(dense), rel=1e-5)


def test_joint_sigmoid_weights_and_pairing(rng):
    img, q, t = _feats(rng), _feats(rng), _feats(rng)
    l1, m1 = joint_sigmoid_loss(img, q, t, t2i_weight=0.7, t2t_weight=0.3)
    l2, _ = joint_sigmoid_loss(img, q, t, t2i_weight=7.0, t2t_weight=3.0)
    assert float(l1) == pytest.approx(float(l2), rel=1e-6)
    ref_t2i, _ = sigmoid_contrastive(t, img)  # T2I pairs target <-> image
    ref_t2t, _ = sigmoid_contrastive(q, t)  # T2T pairs query <-> target
    assert float(m1["loss_t2i"]) == pytest.approx(float(ref_t2i), rel=1e-6)
    assert float(m1["loss_t2t"]) == pytest.approx(float(ref_t2t), rel=1e-6)


def test_joint_loss_for_config_dispatch():
    from knowledge_enhanced_multimodal_retrieval_tpu.train.losses import (
        joint_contrastive_loss,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import TrainConfig

    assert joint_loss_for_config(TrainConfig()) is joint_contrastive_loss
    fn = joint_loss_for_config(TrainConfig(loss="siglip", sigmoid_bias=-7.0))
    assert fn.keywords == {"bias": -7.0}
    with pytest.raises(ValueError):
        joint_loss_for_config(TrainConfig(loss="nope"))


def test_trainer_siglip_step_reduces_loss(devices8, tmp_path):
    """End-to-end: TrainConfig(loss='siglip') trains the tiny model — loss
    finite and decreasing through the shard_map DP step."""
    import os

    from knowledge_enhanced_multimodal_retrieval_tpu.data.datasets import (
        DataPipeline,
        make_synthetic_source,
    )
    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.train import trainer as T
    from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import TrainConfig

    tok = CLIPTokenizer([("c", "a"), ("ca", "t</w>"), ("h", "e"), ("he", "l")])
    arch = M.CLIPArch(16, 32, 1, 32, 16, 16, tok.vocab_size, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    src = make_synthetic_source(32, image_size=32)
    pipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=2)
    cfg = TrainConfig(
        batch_size=16, epochs=1, lr=1e-3, loss="siglip", temperature=0.1,
        global_negatives=True, log_every=1,
        checkpoint_dir=os.path.join(str(tmp_path), "ckpt"),
    )
    trainer = T.CLIPTrainer(model, params, pipe, None, cfg, out_dir=str(tmp_path))
    batch = pipe.make_batch(list(range(16)))
    db = trainer._device_batch(batch)
    state = trainer.state
    losses = []
    for _ in range(8):
        state, metrics = trainer.train_step(state, db)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses
