"""Preemption-safe training: SIGTERM -> collective drain + salvage save.

TPU maintenance events and spot reclaims deliver SIGTERM with a grace
window; the trainer installs a handler (``PreemptionGuard``), agrees on the
drain collectively at fixed step boundaries (``sync_preempt_flag`` — every
process breaks at the SAME step so train-step collectives never desync),
saves a resumable "latest" checkpoint, and returns ``{"preempted": True}``.
The reference has no preemption story (``src/clip/train/trainer.py`` dies
mid-epoch and loses everything since the last epoch save).
"""

import os
import signal
import time

import jax
import jax.numpy as jnp
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.data.datasets import (
    DataPipeline,
    make_synthetic_source,
)
from knowledge_enhanced_multimodal_retrieval_tpu.data.tokenizer import CLIPTokenizer
from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
from knowledge_enhanced_multimodal_retrieval_tpu.parallel import MeshRuntime
from knowledge_enhanced_multimodal_retrieval_tpu.train.trainer import (
    CLIPTrainer,
    PreemptionGuard,
    sync_preempt_flag,
)
from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import TrainConfig

MERGES = [("c", "a"), ("ca", "t</w>"), ("h", "e"), ("he", "l")]


def _world(tmp_path, **cfg_kw):
    tok = CLIPTokenizer(MERGES)
    arch = M.CLIPArch(16, 32, 1, 32, 16, 16, tok.vocab_size, 32, 2, 1, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    src = make_synthetic_source(32, image_size=32)
    pipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=0)
    rt = MeshRuntime.create()
    kw = dict(
        batch_size=16, epochs=3, lr=1e-3, weight_decay=0.0,
        checkpoint_dir=os.path.join(tmp_path, "ckpt"), log_every=100,
        early_stop_patience=100,
    )
    kw.update(cfg_kw)
    cfg = TrainConfig(**kw)
    return model, params, pipe, cfg, rt


def test_triggered_guard_drains_saves_and_resumes(devices8, tmp_path):
    """A pre-armed guard drains at the first check boundary of epoch 0,
    salvage-saves, and a resume=True trainer restarts epoch 0 and finishes."""
    model, params, pipe, cfg, rt = _world(tmp_path, preempt_check_every=1)
    trainer = CLIPTrainer(model, params, pipe, pipe, cfg, rt, out_dir=str(tmp_path))
    guard = PreemptionGuard(install=False)
    guard.trigger()
    result = trainer.train(guard=guard)
    assert result["preempted"] is True
    assert result["epochs_run"] == 1
    assert result["history"][0]["preempted"] is True
    assert result["history"][0]["epoch"] == 0
    assert result["history"][0]["steps"] == 1  # drained at the first boundary

    # the salvage checkpoint resumes at epoch 0 (the interrupted epoch
    # restarts) and an unsignalled run completes all epochs
    model2, params2, pipe2, _, _ = _world(tmp_path)
    cfg2 = TrainConfig(
        batch_size=16, epochs=2, lr=1e-3, weight_decay=0.0,
        checkpoint_dir=os.path.join(tmp_path, "ckpt"), log_every=100,
        early_stop_patience=100, resume=True,
    )
    trainer2 = CLIPTrainer(model2, params2, pipe2, pipe2, cfg2, rt, out_dir=str(tmp_path))
    assert trainer2.start_epoch == 0
    result2 = trainer2.train(guard=PreemptionGuard(install=False))
    assert result2["preempted"] is False
    assert result2["epochs_run"] == 2


def test_signal_handler_sets_flag():
    """A real SIGTERM flips the installed guard's flag (and uninstall
    restores the previous handler)."""
    prev = signal.getsignal(signal.SIGTERM)
    guard = PreemptionGuard()
    try:
        assert not guard.triggered
        os.kill(os.getpid(), signal.SIGTERM)
        deadline = time.monotonic() + 5.0
        while not guard.triggered and time.monotonic() < deadline:
            time.sleep(0.01)
        assert guard.triggered
    finally:
        guard.uninstall()
    assert signal.getsignal(signal.SIGTERM) is prev


def test_sync_preempt_flag_single_process_passthrough():
    assert sync_preempt_flag(True) is True
    assert sync_preempt_flag(False) is False


def test_preempt_save_off_ignores_trigger(devices8, tmp_path):
    """preempt_save=False: a triggered guard is never consulted — training
    runs to completion."""
    model, params, pipe, cfg, rt = _world(
        tmp_path, preempt_save=False, preempt_check_every=1, epochs=1
    )
    trainer = CLIPTrainer(model, params, pipe, pipe, cfg, rt, out_dir=str(tmp_path))
    guard = PreemptionGuard(install=False)
    guard.trigger()
    result = trainer.train(guard=guard)
    assert result["preempted"] is False
    assert result["epochs_run"] == 1
