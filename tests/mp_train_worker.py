"""Worker process for the true multi-process trainer test.

Launched by ``tests/test_multiprocess.py`` (NOT collected by pytest): each
process initializes ``jax.distributed`` over a local TCP coordinator with
Gloo CPU collectives and 4 virtual CPU devices, so 2 processes form the
same 8-device global mesh the single-process suite uses — but with REAL
process boundaries: cross-process ``psum``/``all_gather`` in the train
step, per-process data sharding, the coordinator-only validation monitor
broadcast (``train.trainer.sync_early_stop_monitor``), and coordinator
gating of logging/checkpoints all execute for real.

Usage: ``python mp_train_worker.py <pid> <nproc> <port> <outdir>``.
Writes ``<outdir>/p<pid>.json`` with the per-epoch monitors and the
stop decision for the parent to compare across processes.
"""

import json
import os
import sys


def main() -> None:
    pid, nproc, port, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc and jax.device_count() == 4 * nproc

    import jax.numpy as jnp
    import numpy as np

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
    params = M.init_params(model, jax.random.PRNGKey(0))  # identical per process
    src = make_synthetic_source(64, image_size=32)  # seeded: identical per process
    pipe = DataPipeline(src, tok, image_size=32, context_length=16, num_workers=2)

    cfg = TrainConfig(
        batch_size=16,
        epochs=3,
        lr=1e-3,
        early_stop_patience=3,
        checkpoint_dir=os.path.join(out, "ckpt"),
        log_every=100,
    )
    trainer = T.CLIPTrainer(model, params, pipe, pipe, cfg, out_dir=os.path.join(out, f"run_p{pid}"))
    result = trainer.train()

    # one epoch-0 batch re-derived for the parent's disjointness check: the
    # per-process shards of each global batch must partition it exactly
    b0 = next(iter(pipe.epoch_batches(
        cfg.batch_size, epoch=0, shuffle=True, seed=cfg.seed,
        drop_last=True, num_shards=nproc, shard_index=pid,
    )))

    report = {
        "pid": pid,
        "first_batch_rows": int(b0.images.shape[0]),
        "first_batch_indices": [int(i) for i in np.asarray(b0.indices)],
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "epochs_run": result["epochs_run"],
        "best_epoch": result["best_epoch"],
        "monitors": [r["monitor"] for r in result["history"]],
        "steps": [r["steps"] for r in result["history"]],
        "final_loss": result["history"][-1]["train"].get("loss"),
        "final_param": float(
            np.asarray(trainer.state["params"]["logit_scale"]).reshape(-1)[0]
        ),
    }
    with open(os.path.join(out, f"p{pid}.json"), "w") as f:
        json.dump(report, f)


if __name__ == "__main__":
    main()
