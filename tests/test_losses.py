import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime
from knowledge_enhanced_multimodal_retrieval_tpu.train.losses import info_nce, joint_contrastive_loss


def _feats(rng, n=16, d=8):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return jnp.asarray(x / np.linalg.norm(x, axis=1, keepdims=True))


def _torch_infonce(a, b, temperature):
    """Oracle: the reference's torch formulation (losses.py:41-63)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    ta, tb = torch.tensor(np.asarray(a)), torch.tensor(np.asarray(b))
    logits = ta @ tb.T / temperature
    labels = torch.arange(ta.shape[0])
    return float((F.cross_entropy(logits, labels) + F.cross_entropy(logits.T, labels)) / 2)


def test_info_nce_matches_torch_reference(rng):
    a, b = _feats(rng), _feats(rng, d=8)
    loss, metrics = info_nce(a, b, temperature=0.07)
    assert float(loss) == pytest.approx(_torch_infonce(a, b, 0.07), abs=1e-5)
    assert float(metrics["loss_a2b"]) > 0 and float(metrics["loss_b2a"]) > 0


def test_info_nce_perfect_alignment_low_loss(rng):
    a = _feats(rng)
    loss_same, _ = info_nce(a, a, temperature=0.07)
    loss_rand, _ = info_nce(a, _feats(rng), temperature=0.07)
    assert float(loss_same) < float(loss_rand)


def test_joint_loss_weight_normalization(rng):
    img, q, t = _feats(rng), _feats(rng), _feats(rng)
    l1, m1 = joint_contrastive_loss(img, q, t, t2i_weight=0.7, t2t_weight=0.3)
    l2, m2 = joint_contrastive_loss(img, q, t, t2i_weight=7.0, t2t_weight=3.0)
    assert float(l1) == pytest.approx(float(l2), abs=1e-6)
    assert float(m1["t2i_weight"]) == pytest.approx(0.7)
    # pairing: t2i = (target, image), t2t = (query, target)  (losses.py:100-135)
    ref_t2i, _ = info_nce(t, img, 0.07)
    ref_t2t, _ = info_nce(q, t, 0.07)
    assert float(m1["loss_t2i"]) == pytest.approx(float(ref_t2i), abs=1e-6)
    assert float(m1["loss_t2t"]) == pytest.approx(float(ref_t2t), abs=1e-6)
    assert float(l1) == pytest.approx(0.7 * float(ref_t2i) + 0.3 * float(ref_t2t), abs=1e-6)


def test_global_negatives_equals_dense_loss(rng, devices8):
    """Sharded all-gather InfoNCE == unsharded InfoNCE on the global batch."""
    rt = MeshRuntime.create()
    a, b = _feats(rng, n=32), _feats(rng, n=32)
    dense, _ = info_nce(a, b, temperature=0.1)

    def local(a_, b_):
        loss, _ = info_nce(a_, b_, temperature=0.1, axis_name="data")
        return jax.lax.pmean(loss, "data")

    sharded = shard_map(
        local, mesh=rt.mesh, in_specs=(P("data"), P("data")), out_specs=P(), check_vma=False
    )
    out = jax.jit(sharded)(a, b)
    assert float(out) == pytest.approx(float(dense), abs=1e-5)


def test_local_negatives_differ_from_global(rng, devices8):
    rt = MeshRuntime.create()
    a, b = _feats(rng, n=32), _feats(rng, n=32)

    def local(a_, b_):
        loss, _ = info_nce(a_, b_, temperature=0.1)  # local negatives only
        return jax.lax.pmean(loss, "data")

    sharded = shard_map(local, mesh=rt.mesh, in_specs=(P("data"), P("data")), out_specs=P(), check_vma=False)
    local_loss = float(jax.jit(sharded)(a, b))
    dense_loss = float(info_nce(a, b, temperature=0.1)[0])
    # 4 negatives per example vs 32 -> strictly easier task
    assert local_loss < dense_loss
