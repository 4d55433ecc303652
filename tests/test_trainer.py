import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.data.datasets import DataPipeline, make_synthetic_source
from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime
from knowledge_enhanced_multimodal_retrieval_tpu.train import trainer as T
from knowledge_enhanced_multimodal_retrieval_tpu.train.schedule import cosine_annealing_lr
from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import TrainConfig

MERGES = [("c", "a"), ("ca", "t</w>"), ("h", "e"), ("he", "l")]

TINY = M.CLIPArch(
    embed_dim=16,
    image_resolution=32,
    vision_layers=1,
    vision_width=32,
    vision_patch_size=16,
    context_length=16,
    vocab_size=None,  # set below from tokenizer
    text_width=32,
    text_heads=2,
    text_layers=1,
    vision_heads=2,
)


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
        batch_size=16,
        epochs=2,
        lr=1e-3,
        grad_accum_steps=1,
        early_stop_patience=3,
        checkpoint_dir=os.path.join(tmp, "ckpt"),
        log_every=1,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_cosine_schedule_epoch_granularity():
    sched = cosine_annealing_lr(1.0, epochs=4, steps_per_epoch=10, eta_min_factor=0.1)
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(9)) == pytest.approx(1.0)  # same epoch, same lr
    assert float(sched(10)) < 1.0  # epoch boundary steps down
    assert float(sched(40)) == pytest.approx(0.1)


def test_train_step_reduces_loss(setup, devices8, tmp_path):
    model, params, pipe = setup
    cfg = _cfg(str(tmp_path))
    trainer = T.CLIPTrainer(model, params, pipe, None, cfg, out_dir=str(tmp_path))
    batch = pipe.make_batch(list(range(16)))
    db = trainer._device_batch(batch)
    state = trainer.state
    losses = []
    for _ in range(8):
        state, metrics = trainer.train_step(state, db)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state["step"]) == 8


def test_full_train_loop_with_val_and_checkpoints(setup, devices8, tmp_path):
    model, params, pipe = setup
    cfg = _cfg(str(tmp_path), epochs=2)
    trainer = T.CLIPTrainer(model, params, pipe, pipe, cfg, out_dir=str(tmp_path))
    result = trainer.train()
    assert result["epochs_run"] == 2
    assert result["best_epoch"] >= 0
    assert os.path.isdir(os.path.join(str(tmp_path), "ckpt", "checkpoint_latest"))
    assert os.path.isdir(os.path.join(str(tmp_path), "ckpt", "checkpoint_best"))
    assert os.path.exists(os.path.join(str(tmp_path), "train_metrics.jsonl"))


def test_resume_restores_epoch_and_params(setup, devices8, tmp_path):
    model, params, pipe = setup
    cfg = _cfg(str(tmp_path), epochs=1)
    t1 = T.CLIPTrainer(model, params, pipe, pipe, cfg, out_dir=str(tmp_path))
    t1.train()
    w1 = np.asarray(t1.state["params"]["logit_scale"])

    cfg2 = _cfg(str(tmp_path), epochs=1, resume=True)
    t2 = T.CLIPTrainer(model, params, pipe, pipe, cfg2, out_dir=str(tmp_path))
    assert t2.start_epoch == 1
    np.testing.assert_allclose(np.asarray(t2.state["params"]["logit_scale"]), w1)


def test_grad_accum_matches_larger_batch_semantics(setup, devices8, tmp_path):
    """MultiSteps: params must only change every k steps."""
    model, params, pipe = setup
    cfg = _cfg(str(tmp_path), grad_accum_steps=2)
    trainer = T.CLIPTrainer(model, params, pipe, None, cfg, out_dir=str(tmp_path))
    batch = trainer._device_batch(pipe.make_batch(list(range(16))))
    # watch a param with a real gradient path (logit_scale never updates)
    p0 = np.asarray(trainer.state["params"]["text"]["text_projection"])
    state, _ = trainer.train_step(trainer.state, batch)
    p1 = np.asarray(state["params"]["text"]["text_projection"])
    np.testing.assert_array_equal(p0, p1)  # first micro-step: accumulate only
    state, _ = trainer.train_step(state, batch)
    p2 = np.asarray(state["params"]["text"]["text_projection"])
    assert not np.array_equal(p1, p2)  # second micro-step applies the update


def test_freeze_encoders_only_projections_move(setup, devices8, tmp_path):
    model, params, pipe = setup
    cfg = _cfg(str(tmp_path), freeze_image_encoder=True, freeze_text_encoder=True)
    trainer = T.CLIPTrainer(model, params, pipe, None, cfg, out_dir=str(tmp_path))
    batch = trainer._device_batch(pipe.make_batch(list(range(16))))
    state, _ = trainer.train_step(trainer.state, batch)
    state, _ = trainer.train_step(state, batch)
    before = jax.tree_util.tree_map(np.asarray, params)
    after = jax.tree_util.tree_map(np.asarray, state["params"])
    # frozen: first vision block kernel; trainable: projections + logit_scale
    frozen_leaf = before["visual"]["transformer"]["resblocks_0"]["attn"]["in_proj"]["kernel"]
    np.testing.assert_array_equal(
        frozen_leaf, after["visual"]["transformer"]["resblocks_0"]["attn"]["in_proj"]["kernel"]
    )
    np.testing.assert_array_equal(before["text"]["token_embedding"]["embedding"], after["text"]["token_embedding"]["embedding"])
    assert not np.array_equal(before["visual"]["proj"], after["visual"]["proj"])
    assert not np.array_equal(before["text"]["text_projection"], after["text"]["text_projection"])


def test_global_negatives_step_runs(setup, devices8, tmp_path):
    model, params, pipe = setup
    cfg = _cfg(str(tmp_path), global_negatives=True)
    trainer = T.CLIPTrainer(model, params, pipe, None, cfg, out_dir=str(tmp_path))
    batch = trainer._device_batch(pipe.make_batch(list(range(16))))
    state, metrics = trainer.train_step(trainer.state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_grad_accum_schedule_uses_optimizer_steps(monkeypatch):
    """With MultiSteps the inner schedule advances once per k micro-steps, so
    the per-epoch cosine anneal must be built in optimizer steps (ADVICE r1)."""
    captured = {}
    real = T.cosine_annealing_lr

    def spy(lr, epochs, steps_per_epoch, *a, **kw):
        captured["spe"] = steps_per_epoch
        return real(lr, epochs, steps_per_epoch, *a, **kw)

    monkeypatch.setattr(T, "cosine_annealing_lr", spy)
    params = {"w": jnp.zeros((2,))}
    T.make_optimizer(TrainConfig(grad_accum_steps=4), steps_per_epoch=10, params=params)
    assert captured["spe"] == 3  # ceil(10 / 4)
    T.make_optimizer(TrainConfig(grad_accum_steps=1), steps_per_epoch=10, params=params)
    assert captured["spe"] == 10


def test_validate_covers_full_split_and_t2i_t2t_only(setup, devices8, tmp_path):
    """The tail batch must be padded, not dropped: metrics identical whether
    or not the batch size divides the split; tasks are T2I/T2T (reference
    trainer.py:241-252)."""
    model, params, pipe = setup
    tok = CLIPTokenizer(MERGES)
    src = make_synthetic_source(24, image_size=32)
    vpipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=2)

    m_by_bs = {}
    for bs in (8, 16):  # 24 % 16 != 0 → padded tail; 24 % 8 == 0 → exact
        cfg = _cfg(str(tmp_path), batch_size=bs)
        trainer = T.CLIPTrainer(model, params, pipe, vpipe, cfg, out_dir=str(tmp_path))
        m_by_bs[bs] = trainer.validate()
    assert set(m_by_bs[16]) == {"T2I_MRR", "T2I_Mean_Rank", "T2T_MRR", "T2T_Mean_Rank"}
    for k in m_by_bs[8]:
        assert m_by_bs[8][k] == pytest.approx(m_by_bs[16][k], rel=1e-5), k


def test_divergent_val_metrics_identical_stop_decisions(monkeypatch):
    """Multi-host: only the coordinator computes val metrics; after the
    broadcast every process must take the same break/continue decisions."""
    from jax.experimental import multihost_utils

    coordinator_vals = [0.5, 0.4, 0.3, 0.2]  # degrading → early stop
    current = {"v": 0.0}
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(
        multihost_utils, "broadcast_one_to_all", lambda x: np.float32(current["v"])
    )

    decisions = []
    for proc in range(2):
        stopper = T.EarlyStopper(patience=2)
        trace = []
        for epoch, v in enumerate(coordinator_vals):
            current["v"] = v
            local = v if proc == 0 else 0.0  # non-coordinator has no metrics
            monitor = T.sync_early_stop_monitor(local)
            improved = stopper.update(monitor, epoch)
            trace.append((monitor, improved, stopper.should_stop))
        decisions.append(trace)
    assert decisions[0] == decisions[1]
    assert decisions[0][-1][2] is True  # both stop at the same epoch


def test_epoch_metrics_are_means_not_last_step(setup, devices8, tmp_path):
    """Per-epoch train metrics are the epoch mean (reference trainer.py:208-226)."""
    model, params, pipe = setup
    cfg = _cfg(str(tmp_path), epochs=1, log_every=1000)
    trainer = T.CLIPTrainer(model, params, pipe, None, cfg, out_dir=str(tmp_path))

    per_step = []
    real_step = trainer.train_step

    def spy(state, batch):
        state, metrics = real_step(state, batch)
        per_step.append(float(metrics["loss"]))
        return state, metrics

    trainer.train_step = spy
    result = trainer.train()
    logged = result["history"][0]["train"]["loss"]
    assert logged == pytest.approx(np.mean(per_step), rel=1e-5)
    assert logged != pytest.approx(per_step[-1], rel=1e-7)


def test_encode_step_outputs_replicated(setup, devices8):
    """Encode outputs must be replicated (multi-host: P(axis) outputs are
    not fully addressable, and coordinator-only fetch would deadlock)."""
    model, params, pipe = setup
    from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime
    from knowledge_enhanced_multimodal_retrieval_tpu.parallel.sharding import (
        host_local_batch_to_global,
    )

    rt = MeshRuntime.create()
    step = T.make_encode_step(model, rt)
    batch = pipe.make_batch(list(range(8)))
    db = host_local_batch_to_global(
        {"images": batch.images, "query_ids": batch.query_ids, "target_ids": batch.target_ids},
        rt.mesh,
    )
    img_e, q_e, t_e = step(params, db["images"], db["query_ids"], db["target_ids"])
    for e in (img_e, q_e, t_e):
        assert e.sharding.is_fully_replicated
        assert e.shape[0] == 8  # gathered global rows, original order
    # gathered order matches the per-row (unsharded) encode
    ref = M.encode_text(model, params, jnp.asarray(batch.query_ids))
    np.testing.assert_allclose(np.asarray(q_e), np.asarray(ref), atol=1e-5)


def test_device_prefetch_order_and_errors():
    """device_prefetch preserves order and re-raises worker exceptions."""
    out = list(T.device_prefetch(iter(range(7)), lambda x: x * 10, depth=2))
    assert out == [0, 10, 20, 30, 40, 50, 60]

    def bad_source():
        yield 1
        raise RuntimeError("boom")

    it = T.device_prefetch(bad_source(), lambda x: x)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_async_checkpoint_roundtrip(tmp_path):
    """save_checkpoint returns before commit; wait_for_checkpoints flushes,
    and load after an async save restores the exact state."""
    from knowledge_enhanced_multimodal_retrieval_tpu.train import checkpoint as C

    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
             "step": np.int32(3)}
    C.save_checkpoint(str(tmp_path), "latest", state, {"epoch": 1})
    C.wait_for_checkpoints()
    assert C.checkpoint_exists(str(tmp_path), "latest")
    restored, meta = C.load_checkpoint(str(tmp_path), "latest", state)
    np.testing.assert_array_equal(restored["params"]["w"], state["params"]["w"])
    assert meta["epoch"] == 1
    # a second async save + immediate load must serialize correctly
    state2 = {"params": {"w": state["params"]["w"] * 2}, "step": np.int32(4)}
    C.save_checkpoint(str(tmp_path), "latest", state2, {"epoch": 2})
    restored2, meta2 = C.load_checkpoint(str(tmp_path), "latest", state2)
    np.testing.assert_array_equal(restored2["params"]["w"], state2["params"]["w"])
    assert meta2["epoch"] == 2


def test_early_stopper():
    s = T.EarlyStopper(patience=2)
    assert s.update(1.0, 0) is True
    assert s.update(0.5, 1) is False
    assert not s.should_stop
    assert s.update(0.4, 2) is False
    assert s.should_stop
    assert s.best_epoch == 0


def test_logit_scale_untouched_by_training(setup, devices8, tmp_path):
    """Reference parity: the loss uses fixed temperature, so logit_scale gets
    no gradient and torch AdamW skips it entirely — weight decay must not
    erode it here either."""
    model, params, pipe = setup
    cfg = _cfg(str(tmp_path), weight_decay=0.5, lr=1e-2)
    trainer = T.CLIPTrainer(model, params, pipe, None, cfg, out_dir=str(tmp_path))
    batch = trainer._device_batch(pipe.make_batch(list(range(16))))
    state = trainer.state
    before = float(np.asarray(state["params"]["logit_scale"]))
    for _ in range(5):
        state, _ = trainer.train_step(state, batch)
    after = float(np.asarray(state["params"]["logit_scale"]))
    assert after == pytest.approx(before, abs=1e-7)
    # ...while ordinary params do move
    assert not np.array_equal(
        np.asarray(params["text"]["text_projection"]),
        np.asarray(state["params"]["text"]["text_projection"]),
    )


def test_batch_size_must_divide_mesh(setup, devices8, tmp_path):
    model, params, pipe = setup
    cfg = _cfg(str(tmp_path), batch_size=12)  # 12 % 8 != 0
    with pytest.raises(ValueError, match="divisible"):
        T.CLIPTrainer(model, params, pipe, None, cfg, out_dir=str(tmp_path))


def test_device_prefetch_abandoned_consumer_stops_worker():
    """Abandoning the generator mid-iteration (train_step raised) must not
    strand the prefetch worker on a full queue forever."""
    import threading as _th

    produced = []

    def slow_source():
        for i in range(100):
            produced.append(i)
            yield i

    gen = T.device_prefetch(slow_source(), lambda x: x, depth=1)
    assert next(gen) == 0
    gen.close()  # GeneratorExit -> finally must signal the worker to stop
    deadline = time.time() + 5
    while time.time() < deadline:
        if not any(t.name == "kemr-prefetch" and t.is_alive() for t in _th.enumerate()):
            break
        time.sleep(0.05)
    else:
        raise AssertionError("prefetch worker still alive after consumer closed")
    assert len(produced) < 100  # it did not churn through the whole source


def test_checkpoint_meta_commits_after_data(tmp_path):
    """The meta sidecar lands only after the async data commit (a crash must
    never leave meta.json describing an uncommitted checkpoint), and
    wait_for_checkpoints flushes the meta thread too."""
    from knowledge_enhanced_multimodal_retrieval_tpu.train import checkpoint as C

    state = {"params": {"w": np.ones((4, 4), np.float32)}, "step": np.int32(1)}
    C.save_checkpoint(str(tmp_path), "best", state, {"epoch": 7, "best": 0.5})
    C.wait_for_checkpoints()
    meta_path = C._dir(str(tmp_path), "best") + ".meta.json"
    import json as json_mod

    assert C.checkpoint_exists(str(tmp_path), "best")
    assert json_mod.load(open(meta_path))["epoch"] == 7
    # repeated saves: latest meta wins, consistent with the final data
    for e in (8, 9):
        state = {"params": {"w": np.full((4, 4), float(e), np.float32)}, "step": np.int32(e)}
        C.save_checkpoint(str(tmp_path), "best", state, {"epoch": e, "best": 0.1 * e})
    restored, meta = C.load_checkpoint(str(tmp_path), "best", state)
    assert meta["epoch"] == 9
    np.testing.assert_array_equal(restored["params"]["w"], np.full((4, 4), 9.0, np.float32))


# ---------------------------------------------------------------------------
# LR warmup + EMA (round-3 additions)
# ---------------------------------------------------------------------------


def test_warmup_schedule_linear_ramp():
    """warmup_steps multiplies the cosine by (step+1)/w, then is a no-op."""
    sched = cosine_annealing_lr(
        1.0, epochs=4, steps_per_epoch=10, eta_min_factor=0.1, warmup_steps=5
    )
    assert float(sched(0)) == pytest.approx(0.2)
    assert float(sched(2)) == pytest.approx(0.6)
    assert float(sched(4)) == pytest.approx(1.0)  # ramp complete
    assert float(sched(9)) == pytest.approx(1.0)  # epoch-granular plateau
    assert float(sched(10)) < 1.0  # cosine unchanged past warmup
    # warmup interacts with the cosine multiplicatively inside an epoch
    ramped = cosine_annealing_lr(
        1.0, epochs=4, steps_per_epoch=10, eta_min_factor=0.1, warmup_steps=15
    )
    assert float(ramped(10)) == pytest.approx(float(sched(10)) * 11.0 / 15.0)


def test_warmup_config_reaches_optimizer(monkeypatch):
    seen = {}
    real = cosine_annealing_lr

    def spy(*a, **kw):
        seen.update(kw)
        return real(*a, **kw)

    monkeypatch.setattr(T, "cosine_annealing_lr", spy)
    cfg = TrainConfig(batch_size=16, warmup_steps=7)
    params = {"w": jnp.ones((2, 2))}
    T.make_optimizer(cfg, steps_per_epoch=10, params=params)
    assert seen.get("warmup_steps") == 7


def test_ema_matches_manual_recurrence(setup, devices8, tmp_path):
    """state['ema_params'] follows decay*ema + (1-decay)*params exactly,
    starting from the initial params."""
    model, params, pipe = setup
    decay = 0.5
    cfg = _cfg(str(tmp_path), ema_decay=decay)
    trainer = T.CLIPTrainer(model, params, pipe, None, cfg, out_dir=str(tmp_path))
    leaf = lambda s, key: np.asarray(s[key]["text"]["text_projection"])
    manual = leaf(trainer.state, "params").copy()
    batch = trainer._device_batch(pipe.make_batch(list(range(16))))
    state = trainer.state
    for _ in range(3):
        state, _ = trainer.train_step(state, batch)
        manual = decay * manual + (1.0 - decay) * leaf(state, "params")
    np.testing.assert_allclose(leaf(state, "ema_params"), manual, rtol=1e-6)
    # and the shadow genuinely lags the raw params
    assert not np.allclose(leaf(state, "ema_params"), leaf(state, "params"))


def test_ema_eval_and_checkpoint_serve_the_shadow(setup, devices8, tmp_path):
    """eval_params() returns the EMA tree and load_params_only prefers it."""
    from knowledge_enhanced_multimodal_retrieval_tpu.train import checkpoint as C

    model, params, pipe = setup
    cfg = _cfg(str(tmp_path), epochs=1, ema_decay=0.9)
    trainer = T.CLIPTrainer(model, params, pipe, pipe, cfg, out_dir=str(tmp_path))
    trainer.train()
    ema_leaf = np.asarray(trainer.state["ema_params"]["text"]["text_projection"])
    raw_leaf = np.asarray(trainer.state["params"]["text"]["text_projection"])
    np.testing.assert_array_equal(
        np.asarray(trainer.eval_params()["text"]["text_projection"]), ema_leaf
    )
    served = C.load_params_only(cfg.checkpoint_dir, "latest")
    np.testing.assert_allclose(served["text"]["text_projection"], ema_leaf, rtol=1e-6)
    assert not np.allclose(ema_leaf, raw_leaf)
    # resume carries the shadow
    cfg2 = _cfg(str(tmp_path), epochs=1, ema_decay=0.9, resume=True)
    t2 = T.CLIPTrainer(model, params, pipe, pipe, cfg2, out_dir=str(tmp_path))
    np.testing.assert_allclose(
        np.asarray(t2.state["ema_params"]["text"]["text_projection"]), ema_leaf,
        rtol=1e-6,
    )


def test_ema_refused_for_lora_and_distill(setup, devices8, tmp_path):
    model, params, pipe = setup
    with pytest.raises(ValueError, match="ema_decay"):
        T.CLIPTrainer(
            model, params, pipe, None,
            _cfg(str(tmp_path), ema_decay=0.9, lora_rank=2), out_dir=str(tmp_path),
        )
    with pytest.raises(ValueError, match="ema_decay must be in"):
        T.CLIPTrainer(
            model, params, pipe, None,
            _cfg(str(tmp_path), ema_decay=1.5), out_dir=str(tmp_path),
        )


def test_ema_rides_the_gspmd_step(setup, devices8, tmp_path):
    """tp mode: the EMA shadow exists, shards like the params, and follows
    the recurrence."""
    from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import MeshConfig

    model, params, pipe = setup
    decay = 0.5
    cfg = _cfg(str(tmp_path), ema_decay=decay, global_negatives=True)
    rt = MeshRuntime.create(MeshConfig(data_parallel=4, model_parallel=2))
    trainer = T.CLIPTrainer(model, params, pipe, None, cfg, rt=rt, out_dir=str(tmp_path))
    leaf = lambda s, key: np.asarray(s[key]["text"]["text_projection"])
    assert "ema_params" in trainer.state
    assert (
        trainer.state["ema_params"]["text"]["text_projection"].sharding
        == trainer.state["params"]["text"]["text_projection"].sharding
    )
    manual = leaf(trainer.state, "params").copy()
    batch = trainer._device_batch(pipe.make_batch(list(range(16))))
    state = trainer.state
    for _ in range(2):
        state, _ = trainer.train_step(state, batch)
        manual = decay * manual + (1.0 - decay) * leaf(state, "params")
    np.testing.assert_allclose(leaf(state, "ema_params"), manual, rtol=1e-5)
