"""Knowledge distillation: train a small student tower to match a large
teacher's retrieval geometry.

Beyond-reference extension (the reference's only efficiency lever is
freezing encoders, ``src/clip/model/clip_model.py:174-245``): serving cost
scales with the tower, so the production path to higher queries/sec/chip is
a smaller student (e.g. ViT-B/32) distilled from the fine-tuned ViT-L/14
teacher. TPU-native design decisions:

- **The teacher never runs in the train loop.** Teacher embeddings are
  precomputed once per split (``eval.evaluator.encode_dataset``, which can
  itself use the int8 serving towers) and stored row-aligned with uuids
  (:func:`save_encoded_dataset`); the distill step consumes them as plain
  batch arrays. This keeps the step a single small jitted program — no
  1.7x-parameter forward, no second model resident in HBM.
- **Similarity-matrix KL, not logit copying.** Retrieval quality lives in
  the score *rankings*; the loss matches softmax rows of the student's
  in-batch T2I / T2T similarity matrices to the teacher's (both
  directions, temperature-scaled, reference task weights). This is
  dimension-free: a 512-dim student can learn from a 768-dim teacher.
- An optional direct cosine term (``distill_embed_weight``) pins the
  student to the teacher's embedding VECTORS when dimensions match — it
  makes the student a drop-in encoder for corpora precomputed with the
  teacher.

Integration: set ``TrainConfig.distill_teacher`` to the teacher `.npz` and
``CLIPTrainer`` swaps its loss — optimizer, schedule, early stopping on
student MRR, checkpoints, and resume all work unchanged.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..eval.evaluator import EncodedDataset
from ..models.clip import CLIP, l2_normalize
from ..parallel.mesh import MeshRuntime
from ..utils.config import TrainConfig


# ---------------------------------------------------------------------------
# Teacher embedding persistence (row-aligned npz)
# ---------------------------------------------------------------------------


def save_encoded_dataset(path: str, enc: EncodedDataset) -> None:
    """Persist an :class:`EncodedDataset` (atomic replace)."""
    import io
    import os

    buf = io.BytesIO()
    np.savez(
        buf,
        image=np.asarray(enc.image, np.float32),
        query=np.asarray(enc.query, np.float32),
        target=np.asarray(enc.target, np.float32),
        uuids=np.asarray(enc.uuids, dtype=object),
    )
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


def load_encoded_dataset(path: str) -> EncodedDataset:
    with np.load(path, allow_pickle=True) as z:
        return EncodedDataset(
            image=z["image"], query=z["query"], target=z["target"],
            uuids=[str(u) for u in z["uuids"]],
        )


class TeacherBank:
    """uuid -> teacher-row lookup for batch assembly (host side)."""

    def __init__(self, enc: EncodedDataset):
        self.enc = enc
        self._row = {u: i for i, u in enumerate(enc.uuids)}
        if len(self._row) != len(enc.uuids):
            raise ValueError("teacher EncodedDataset has duplicate uuids")

    @property
    def dim(self) -> int:
        return int(self.enc.image.shape[1])

    def rows(self, uuids: Sequence[str]) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        try:
            idx = np.asarray([self._row[u] for u in uuids])
        except KeyError as e:
            raise KeyError(f"uuid {e.args[0]!r} not in the teacher embeddings") from None
        return self.enc.image[idx], self.enc.query[idx], self.enc.target[idx]


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------


def _kl_rows(t_logits: jnp.ndarray, s_logits: jnp.ndarray) -> jnp.ndarray:
    """Row-mean KL(teacher || student) over softmaxed logits — 0 at match."""
    p = jax.nn.softmax(t_logits, axis=-1)
    return (
        (p * (jax.nn.log_softmax(t_logits, axis=-1) - jax.nn.log_softmax(s_logits, axis=-1)))
        .sum(axis=-1)
        .mean()
    )


def distill_loss(
    s_img: jnp.ndarray,
    s_q: jnp.ndarray,
    s_t: jnp.ndarray,
    t_img: jnp.ndarray,
    t_q: jnp.ndarray,
    t_t: jnp.ndarray,
    *,
    temperature: float = 0.07,
    t2i_weight: float = 0.7,
    t2t_weight: float = 0.3,
    kd_weight: float = 1.0,
    embed_weight: float = 0.5,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """KD objective over one batch of (student, teacher) embeddings.

    All inputs are L2-normalized ``[B, D_s]`` / ``[B, D_t]``. Returns
    ``(loss, metrics)`` with ``loss = kd_weight * kd + embed_weight *
    embed`` where ``kd`` is the task-weighted row KL of the in-batch T2I
    and T2T similarity matrices (both directions) and ``embed`` is
    ``1 - cos`` averaged over the three modalities (equal dims only —
    callers guard)."""
    total = t2i_weight + t2t_weight
    w_t2i, w_t2t = t2i_weight / total, t2t_weight / total
    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
    s_img, s_q, s_t = f32(s_img), f32(s_q), f32(s_t)
    t_img, t_q, t_t = f32(t_img), f32(t_q), f32(t_t)

    def pair_kd(sa, sb, ta, tb):
        s_logits = sa @ sb.T / temperature
        t_logits = ta @ tb.T / temperature
        return 0.5 * (_kl_rows(t_logits, s_logits) + _kl_rows(t_logits.T, s_logits.T))

    kd = w_t2i * pair_kd(s_q, s_img, t_q, t_img) + w_t2t * pair_kd(s_q, s_t, t_q, t_t)

    if embed_weight > 0.0:
        cos = (
            (s_img * t_img).sum(-1).mean()
            + (s_q * t_q).sum(-1).mean()
            + (s_t * t_t).sum(-1).mean()
        ) / 3.0
        embed = 1.0 - cos
    else:
        embed = jnp.zeros((), jnp.float32)

    loss = kd_weight * kd + embed_weight * embed
    return loss, {"loss": loss, "loss_kd": kd, "loss_embed": embed}


# ---------------------------------------------------------------------------
# Train step (mesh data-parallel, mirrors trainer.make_train_step)
# ---------------------------------------------------------------------------


def make_distill_step(
    model: CLIP,
    optimizer: optax.GradientTransformation,
    cfg: TrainConfig,
    rt: MeshRuntime,
    student_dim: int,
    teacher_dim: int,
) -> Callable:
    """Jitted mesh step: ``(state, batch) -> (state, metrics)`` where the
    batch additionally carries ``t_img / t_q / t_t`` teacher rows (sharded
    on the data axis like the inputs). KD is computed on the LOCAL shard's
    in-batch similarity matrices — the distillation analogue of the
    reference DDP's local-negative loss surface."""
    if cfg.distill_embed_weight > 0.0 and student_dim != teacher_dim:
        raise ValueError(
            f"distill_embed_weight > 0 needs matching embed dims "
            f"(student {student_dim} vs teacher {teacher_dim}); set "
            f"--train.distill_embed_weight=0 for cross-dimension distillation"
        )
    axes = rt.data_axes  # ('dcn', 'data') under multi-slice hybrid DP
    axis = axes if len(axes) > 1 else axes[0]

    def local_step(params, opt_state, step, images, query_ids, target_ids, t_img, t_q, t_t):
        def loss_fn(p):
            s_img = l2_normalize(model.apply({"params": p}, images, method=CLIP.encode_image))
            s_q = l2_normalize(model.apply({"params": p}, query_ids, method=CLIP.encode_text))
            s_t = l2_normalize(model.apply({"params": p}, target_ids, method=CLIP.encode_text))
            return distill_loss(
                s_img, s_q, s_t, t_img, t_q, t_t,
                temperature=cfg.temperature,
                t2i_weight=cfg.t2i_weight,
                t2t_weight=cfg.t2t_weight,
                kd_weight=cfg.distill_kd_weight,
                embed_weight=cfg.distill_embed_weight,
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = jax.lax.pmean(grads, axis)
        metrics = jax.lax.pmean(metrics, axis)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_params, new_opt_state, step + 1, metrics

    sharded = shard_map(
        local_step,
        mesh=rt.mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def distill_step(state, batch):
        params, opt_state, step, metrics = sharded(
            state["params"], state["opt_state"], state["step"],
            batch["images"], batch["query_ids"], batch["target_ids"],
            batch["t_img"], batch["t_q"], batch["t_t"],
        )
        return {"params": params, "opt_state": opt_state, "step": step}, metrics

    return distill_step
