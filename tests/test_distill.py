"""Knowledge distillation (`train/distill.py`, `cli/distill.py`)."""

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
from knowledge_enhanced_multimodal_retrieval_tpu.eval.evaluator import EncodedDataset
from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
from knowledge_enhanced_multimodal_retrieval_tpu.train import trainer as T
from knowledge_enhanced_multimodal_retrieval_tpu.train.distill import (
    TeacherBank,
    distill_loss,
    load_encoded_dataset,
    save_encoded_dataset,
)
from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import TrainConfig

TINY = dict(
    embed_dim=16, image_resolution=32, vision_layers=1, vision_width=32,
    vision_patch_size=16, context_length=16, text_width=32, text_heads=2,
    text_layers=1, vision_heads=2,
)


def _normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def setup():
    tok = CLIPTokenizer([("c", "a"), ("ca", "t</w>")])
    arch = M.CLIPArch(vocab_size=tok.vocab_size, **TINY)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    src = make_synthetic_source(48, image_size=32)
    pipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=2)
    return model, params, pipe


def _teacher_for(pipe, model, params, rt, dim=None):
    """Encode the synthetic split with the model itself as 'teacher' (or
    re-project to a different dim to exercise cross-dim KD)."""
    from knowledge_enhanced_multimodal_retrieval_tpu.eval.evaluator import encode_dataset

    enc = encode_dataset(model, params, pipe, rt, batch_size=16)
    if dim is not None and dim != enc.image.shape[1]:
        rng = np.random.default_rng(0)
        proj = rng.standard_normal((enc.image.shape[1], dim)).astype(np.float32)

        def re(x):
            y = x @ proj
            return y / np.linalg.norm(y, axis=1, keepdims=True)

        enc = EncodedDataset(re(enc.image), re(enc.query), re(enc.target), enc.uuids)
    return enc


# ---------------------------------------------------------------------------
# loss
# ---------------------------------------------------------------------------


def test_distill_loss_zero_at_match():
    rng = np.random.default_rng(1)
    img, q, t = _normed(rng, 8, 16), _normed(rng, 8, 16), _normed(rng, 8, 16)
    loss, metrics = distill_loss(img, q, t, img, q, t)
    assert float(loss) == pytest.approx(0.0, abs=1e-5)
    assert float(metrics["loss_kd"]) == pytest.approx(0.0, abs=1e-5)
    assert float(metrics["loss_embed"]) == pytest.approx(0.0, abs=1e-5)


def test_distill_loss_positive_and_kd_dimension_free():
    rng = np.random.default_rng(2)
    s = [_normed(rng, 8, 16) for _ in range(3)]
    t = [_normed(rng, 8, 24) for _ in range(3)]  # different teacher dim
    loss, metrics = distill_loss(*s, *t, embed_weight=0.0)
    assert float(loss) > 0.0 and float(metrics["loss_embed"]) == 0.0


def test_distill_loss_kd_invariant_to_teacher_rotation():
    """KD depends only on teacher *similarities*: any orthogonal rotation of
    the teacher space leaves the loss unchanged."""
    rng = np.random.default_rng(3)
    s = [_normed(rng, 8, 16) for _ in range(3)]
    t = [_normed(rng, 8, 16) for _ in range(3)]
    qmat, _ = np.linalg.qr(rng.standard_normal((16, 16)))
    t_rot = [x @ qmat.astype(np.float32) for x in t]
    l1, _ = distill_loss(*s, *t, embed_weight=0.0)
    l2, _ = distill_loss(*s, *t_rot, embed_weight=0.0)
    assert float(l1) == pytest.approx(float(l2), rel=1e-4)


# ---------------------------------------------------------------------------
# persistence + bank
# ---------------------------------------------------------------------------


def test_encoded_dataset_roundtrip_and_bank(tmp_path):
    rng = np.random.default_rng(4)
    enc = EncodedDataset(
        _normed(rng, 6, 16), _normed(rng, 6, 16), _normed(rng, 6, 16),
        [f"u{i}" for i in range(6)],
    )
    path = str(tmp_path / "teacher.npz")
    save_encoded_dataset(path, enc)
    enc2 = load_encoded_dataset(path)
    np.testing.assert_array_equal(enc.image, enc2.image)
    assert enc2.uuids == enc.uuids

    bank = TeacherBank(enc2)
    timg, tq, tt = bank.rows(["u3", "u0"])
    np.testing.assert_array_equal(timg, enc.image[[3, 0]])
    np.testing.assert_array_equal(tq, enc.query[[3, 0]])
    with pytest.raises(KeyError):
        bank.rows(["nope"])
    with pytest.raises(ValueError):
        TeacherBank(EncodedDataset(enc.image, enc.query, enc.target, ["u0"] * 6))


# ---------------------------------------------------------------------------
# trainer integration
# ---------------------------------------------------------------------------


def _cfg(tmp, **kw):
    base = dict(
        batch_size=16, epochs=2, lr=1e-3, early_stop_patience=3,
        checkpoint_dir=os.path.join(tmp, "ckpt"), log_every=1,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_distill_step_reduces_loss_and_matches_teacher(setup, devices8, tmp_path):
    model, params, pipe = setup
    from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime

    rt = MeshRuntime.create()
    teacher = _teacher_for(pipe, model, params, rt)
    tpath = str(tmp_path / "teacher.npz")
    save_encoded_dataset(tpath, teacher)

    # student starts from a DIFFERENT init than the teacher's weights
    student0 = M.init_params(model, jax.random.PRNGKey(7))
    cfg = _cfg(str(tmp_path), distill_teacher=tpath, lr=3e-3)
    trainer = T.CLIPTrainer(model, student0, pipe, None, cfg, rt, out_dir=str(tmp_path))
    batch = pipe.make_batch(list(range(16)))
    db = trainer._device_batch(batch)
    assert set(db) >= {"t_img", "t_q", "t_t"}
    state, losses = trainer.state, []
    for _ in range(10):
        state, metrics = trainer.train_step(state, db)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert all(np.isfinite(losses))


def test_distill_teacher_rows_align_with_shuffled_uuids(setup, devices8, tmp_path):
    model, params, pipe = setup
    from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime

    rt = MeshRuntime.create()
    teacher = _teacher_for(pipe, model, params, rt)
    tpath = str(tmp_path / "teacher.npz")
    save_encoded_dataset(tpath, teacher)
    cfg = _cfg(str(tmp_path), distill_teacher=tpath)
    trainer = T.CLIPTrainer(model, params, pipe, None, cfg, rt, out_dir=str(tmp_path))
    batch = pipe.make_batch([5, 2, 11, 7] * 4)
    db = trainer._device_batch(batch)
    row = {u: i for i, u in enumerate(teacher.uuids)}
    want = teacher.image[[row[u] for u in batch.uuids]]
    np.testing.assert_array_equal(np.asarray(db["t_img"]), want)


def test_distill_dim_mismatch_guard(setup, devices8, tmp_path):
    model, params, pipe = setup
    from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime

    rt = MeshRuntime.create()
    teacher24 = _teacher_for(pipe, model, params, rt, dim=24)
    tpath = str(tmp_path / "teacher24.npz")
    save_encoded_dataset(tpath, teacher24)

    with pytest.raises(ValueError, match="matching embed dims"):
        T.CLIPTrainer(
            model, params, pipe, None,
            _cfg(str(tmp_path), distill_teacher=tpath), rt, out_dir=str(tmp_path),
        )
    # embed_weight=0: cross-dimension KD works
    cfg = _cfg(str(tmp_path), distill_teacher=tpath, distill_embed_weight=0.0)
    trainer = T.CLIPTrainer(model, params, pipe, None, cfg, rt, out_dir=str(tmp_path))
    db = trainer._device_batch(pipe.make_batch(list(range(16))))
    _, metrics = trainer.train_step(trainer.state, db)
    assert np.isfinite(float(metrics["loss"])) and float(metrics["loss_embed"]) == 0.0


def test_distill_conflicts_with_lora(setup, tmp_path):
    model, params, pipe = setup
    cfg = _cfg(str(tmp_path), distill_teacher="x.npz", lora_rank=2)
    with pytest.raises(ValueError, match="mutually exclusive"):
        T.CLIPTrainer(model, params, pipe, None, cfg, out_dir=str(tmp_path))


def test_distill_full_train_loop_with_validation(setup, devices8, tmp_path):
    """End-to-end: epochs, student-MRR early-stop monitor, checkpoints."""
    model, params, pipe = setup
    from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime
    from knowledge_enhanced_multimodal_retrieval_tpu.train import checkpoint as ckpt

    rt = MeshRuntime.create()
    teacher = _teacher_for(pipe, model, params, rt)
    tpath = str(tmp_path / "teacher.npz")
    save_encoded_dataset(tpath, teacher)
    cfg = _cfg(str(tmp_path), distill_teacher=tpath, epochs=2)
    student0 = M.init_params(model, jax.random.PRNGKey(9))
    trainer = T.CLIPTrainer(model, student0, pipe, pipe, cfg, rt, out_dir=str(tmp_path))
    result = trainer.train()
    assert result["epochs_run"] == 2 if "epochs_run" in result else True
    assert np.isfinite(result["best_metric"]) and result["best_metric"] > 0
    ckpt.wait_for_checkpoints()
    assert ckpt.checkpoint_exists(cfg.checkpoint_dir, "latest")


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def test_cli_distill_end_to_end(tmp_path, devices8, monkeypatch):
    from knowledge_enhanced_multimodal_retrieval_tpu.cli.distill import main as distill

    monkeypatch.setitem(
        M.ARCHS, "tiny", M.CLIPArch(16, 32, 1, 32, 16, 16, 600, 32, 2, 1, vision_heads=2)
    )
    out = distill([
        "--teacher-name=tiny",
        "--data.dataset=synthetic:24",
        "--data.image_size=32",
        "--data.context_length=16",
        "--model.name=tiny",
        "--eval.batch_size=8",
        f"--eval.output_dir={tmp_path}/exp",
        "--train.epochs=1",
        "--train.batch_size=8",
        f"--train.checkpoint_dir={tmp_path}/ckpt",
    ])
    assert os.path.exists(out["teacher_embeddings"])
    assert np.isfinite(out["best_metric"])
    # second run reuses the teacher artifact (no --teacher-name needed)
    out2 = distill([
        f"--teacher-embeddings={out['teacher_embeddings']}",
        "--data.dataset=synthetic:24",
        "--data.image_size=32",
        "--data.context_length=16",
        "--model.name=tiny",
        "--eval.batch_size=8",
        f"--eval.output_dir={tmp_path}/exp2",
        "--train.epochs=1",
        "--train.batch_size=8",
        f"--train.checkpoint_dir={tmp_path}/ckpt2",
    ])
    assert out2["teacher_embeddings"] == out["teacher_embeddings"]
