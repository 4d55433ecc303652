"""Matryoshka Representation Learning: training wrapper + truncated serving.

``train.matryoshka_dims`` averages the joint contrastive loss over prefix-
truncated re-normalized embeddings (train/losses.py::matryoshka_joint_loss);
``CLIPRetrieval(truncate_dim=d)`` scans the corpus at the first d dims
(prefix re-normalized on host) and the host rerank restores full-dim exact
scores. No reference counterpart (fixed-width embeddings only).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.ops.similarity import (
    prefix_normalize,
    prefix_normalize_host,
)
from knowledge_enhanced_multimodal_retrieval_tpu.train.losses import (
    joint_contrastive_loss,
    joint_loss_for_config,
    matryoshka_joint_loss,
)
from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import TrainConfig


def _feats(rng, n=8, d=32):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return jnp.asarray(x / np.linalg.norm(x, axis=1, keepdims=True))


def test_prefix_normalize_scale_invariance():
    rng = np.random.default_rng(0)
    raw = rng.standard_normal((6, 16)).astype(np.float32)
    unit = raw / np.linalg.norm(raw, axis=1, keepdims=True)
    a = prefix_normalize_host(raw, 5)
    b = prefix_normalize_host(unit, 5)
    np.testing.assert_allclose(a, b, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-6)
    # device twin matches the host twin
    np.testing.assert_allclose(
        np.asarray(prefix_normalize(jnp.asarray(raw), 5)), a, atol=1e-6
    )
    # zero (capacity-pad) rows stay zero
    z = prefix_normalize_host(np.zeros((2, 16), np.float32), 5)
    np.testing.assert_array_equal(z, 0.0)
    with pytest.raises(ValueError, match="truncate dim"):
        prefix_normalize_host(raw, 17)


def test_full_dim_only_equals_base_loss():
    rng = np.random.default_rng(1)
    img, q, t = _feats(rng), _feats(rng), _feats(rng)
    base_loss, base_m = joint_contrastive_loss(img, q, t)
    mrl = matryoshka_joint_loss(joint_contrastive_loss, (32,))
    loss, m = mrl(img, q, t)
    np.testing.assert_allclose(float(loss), float(base_loss), rtol=1e-6)
    np.testing.assert_allclose(float(m["loss_t2i"]), float(base_m["loss_t2i"]), rtol=1e-6)


def test_mrl_averages_over_dims_and_appends_full():
    rng = np.random.default_rng(2)
    img, q, t = _feats(rng), _feats(rng), _feats(rng)
    mrl = matryoshka_joint_loss(joint_contrastive_loss, (8, 16))
    loss, m = mrl(img, q, t)
    # full width (32) auto-appended
    assert set(k for k in m if k.startswith("loss_d")) == {"loss_d8", "loss_d16", "loss_d32"}
    manual = np.mean([
        float(joint_contrastive_loss(
            prefix_normalize(img, d), prefix_normalize(q, d), prefix_normalize(t, d)
        )[0])
        for d in (8, 16, 32)
    ])
    np.testing.assert_allclose(float(loss), manual, rtol=1e-6)


def test_config_seam_and_validation():
    cfg = dataclasses.replace(TrainConfig(), matryoshka_dims=(8, 16))
    fn = joint_loss_for_config(cfg)
    rng = np.random.default_rng(3)
    img, q, t = _feats(rng), _feats(rng), _feats(rng)
    loss, m = fn(img, q, t)
    assert "loss_d8" in m and float(loss) > 0
    with pytest.raises(ValueError, match="exceed"):
        fn(img[:, :4], q[:, :4], t[:, :4])
    with pytest.raises(ValueError, match="positive"):
        matryoshka_joint_loss(joint_contrastive_loss, (0, 8))


def test_mrl_gradients_reach_all_prefixes():
    """The d=8 prefix loss must produce gradient signal on the first 8
    coordinates even when the full-dim loss is detached from them."""
    rng = np.random.default_rng(4)
    img, q, t = _feats(rng, 6, 16), _feats(rng, 6, 16), _feats(rng, 6, 16)
    mrl = matryoshka_joint_loss(joint_contrastive_loss, (8,))
    g = jax.grad(lambda x: mrl(x, q, t)[0])(img)
    assert float(jnp.abs(g[:, :8]).sum()) > 0
    assert float(jnp.abs(g).sum()) > 0


def test_trainer_step_descends_with_mrl(devices8, tmp_path):
    """The full jitted DP train step runs with matryoshka_dims and the loss
    (avg over prefixes) descends — MRL is a loss seam, not a new step."""
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
        batch_size=16, epochs=1, lr=1e-3,
        matryoshka_dims=(8,),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    trainer = T.CLIPTrainer(model, params, pipe, None, cfg, out_dir=str(tmp_path))
    db = trainer._device_batch(pipe.make_batch(list(range(16))))
    state, losses = trainer.state, []
    for _ in range(8):
        state, metrics = trainer.train_step(state, db)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert "loss_d8" in metrics and "loss_d16" in metrics  # 8 + auto-appended full


# -- serving ----------------------------------------------------------------


@pytest.fixture(scope="module")
def world(devices8):
    from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.embedding_store import (
        EmbeddingStore,
    )
    from tests.test_retrieval_engine import MERGES

    tok = CLIPTokenizer(MERGES)
    arch = M.CLIPArch(16, 32, 1, 32, 16, 16, tok.vocab_size, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    n, d = 64, 16
    norm = lambda x: x / np.linalg.norm(x, axis=1, keepdims=True)  # noqa: E731
    store = EmbeddingStore(
        image=norm(rng.standard_normal((n, d))).astype(np.float32),
        text=norm(rng.standard_normal((n, d))).astype(np.float32),
        uuids=[f"u{i}" for i in range(n)],
    )
    rt = MeshRuntime.create()
    return model, params, tok, store, rt


def _retr(world, **kw):
    from knowledge_enhanced_multimodal_retrieval_tpu.retrieval.clip_retrieval import (
        CLIPRetrieval,
    )

    model, params, tok, store, rt = world
    return CLIPRetrieval(model, params, tok, store, top_k=10, **kw)


def test_truncated_full_width_rerank_equals_exact(world):
    exact = _retr(world)
    trunc = _retr(world, truncate_dim=8, rerank=True, rerank_factor=7)  # 70 >= 64
    for query in ("hello cat", "green vase"):
        a = exact.retrieval(query, alpha=0.5)
        b = trunc.retrieval(query, alpha=0.5)
        assert [x["uuid"] for x in a] == [x["uuid"] for x in b]
        np.testing.assert_allclose(
            [x["score"] for x in a], [x["score"] for x in b], atol=1e-5
        )


def test_truncated_raw_scores_are_prefix_cosines(world):
    """Without rerank the served scores are the d-dim blend — verified
    against a host prefix-space oracle."""
    model, params, tok, store, rt = world
    trunc = _retr(world, truncate_dim=8)
    q_emb = np.asarray(trunc._encode(trunc._enc_params, trunc._tokenize(["hello cat"])))
    tq = prefix_normalize_host(q_emb, 8)
    ti = prefix_normalize_host(store.image, 8)
    tt = prefix_normalize_host(store.text, 8)
    want = 0.5 * tq @ ti.T + 0.5 * tq @ tt.T
    out = trunc.retrieval("hello cat", alpha=0.5)
    order = np.argsort(-want[0])
    uuid_by_row = store.uuids
    assert [x["uuid"] for x in out] == [uuid_by_row[i] for i in order[:10]]
    np.testing.assert_allclose(
        [x["score"] for x in out], np.sort(want[0])[::-1][:10], atol=1e-4
    )


@pytest.mark.parametrize("packing", ["int8", "int4", "binary"])
def test_truncation_composes_with_packing(world, packing):
    exact = _retr(world)
    r = _retr(
        world, truncate_dim=8, quantize_corpus=packing,
        rerank=True, rerank_factor=7,
    )
    a = exact.retrieval("hello cat", alpha=0.5)
    b = r.retrieval("hello cat", alpha=0.5)
    assert [x["uuid"] for x in a] == [x["uuid"] for x in b]


def test_truncation_composes_with_sharded_corpus(world):
    model, params, tok, store, rt = world
    exact = _retr(world)
    r = _retr(
        world, truncate_dim=8, rt=rt, shard_corpus=True,
        rerank=True, rerank_factor=7,
    )
    a = exact.retrieval("hello cat")
    b = r.retrieval("hello cat")
    assert [x["uuid"] for x in a] == [x["uuid"] for x in b]


def test_truncation_validation(world):
    with pytest.raises(ValueError, match="exceeds the store width"):
        _retr(world, truncate_dim=99)
    with pytest.raises(ValueError, match="does not compose with ann"):
        _retr(world, truncate_dim=8, ann="ivf")
    with pytest.raises(ValueError, match=">= 0"):
        _retr(world, truncate_dim=-1)


def test_truncation_survives_live_update(world):
    r = _retr(
        world, truncate_dim=8, rerank=True, rerank_factor=8,
        capacity_multiple=16,
    )
    model, params, tok, store, rt = world
    rng = np.random.default_rng(11)
    new = rng.standard_normal((2, store.dim)).astype(np.float32)
    new /= np.linalg.norm(new, axis=1, keepdims=True)
    r.add_documents(new, new, ["new-a", "new-b"])
    out = r.retrieval_embeddings_batch(new[:1], alpha=1.0)[0]
    assert out[0]["uuid"] == "new-a"
    assert out[0]["score"] == pytest.approx(1.0, abs=1e-5)


def test_quality_sweep_truncate_rows():
    from knowledge_enhanced_multimodal_retrieval_tpu.eval.quality import quality_sweep

    rng = np.random.default_rng(5)
    norm = lambda x: x / np.linalg.norm(x, axis=1, keepdims=True)  # noqa: E731
    img = norm(rng.standard_normal((128, 32))).astype(np.float32)
    txt = norm(rng.standard_normal((128, 32))).astype(np.float32)
    rows = quality_sweep(img, txt, txt[:16], k=5, truncate_dims=(16,))
    names = [r["config"] for r in rows]
    assert "trunc16" in names and "trunc16+rerank4x" in names
    full = {r["config"]: r for r in rows}
    assert full["trunc16+rerank4x"]["recall_at_k"] >= full["trunc16"]["recall_at_k"]
