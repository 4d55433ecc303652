"""Data-parallel CLIP fine-tuning on a TPU mesh.

TPU-native re-design of the reference's DDP trainer
(``src/clip/train/trainer.py`` — SURVEY §2.9): one process per host instead
of one per GPU, a ``shard_map`` train step over the mesh's ``data`` axis
instead of NCCL DDP, ``lax.pmean`` gradient reduction over ICI instead of
bucketed all-reduce, and Orbax instead of ``torch.save``.

Reference semantics preserved:
- joint T2I+T2T InfoNCE on *local* per-shard batches with pmean'd gradients
  (exactly DDP's loss surface, ``trainer.py:160-206``); global-batch
  negatives are an opt-in improvement (``TrainConfig.global_negatives``);
- AdamW(beta=(0.9,0.98), eps=1e-6, wd) + per-epoch cosine annealing to
  0.1*lr (``trainer.py:479-492``);
- gradient accumulation + global-norm clipping (``trainer.py:185-206``);
- coordinator-only validation (MRR fast path), JSONL metrics, latest/best
  checkpoints, early stopping with patience on avg/T2I/T2T MRR
  (``trainer.py:230-351``);
- deterministic seeding per epoch (``trainer.py:375-377,154-156``).

bf16 compute / f32 params replaces torch AMP + GradScaler (``trainer.py:110``):
bf16's exponent range makes loss scaling unnecessary on TPU.

Encoder freezing trains only the projection heads (+ final text LayerNorm),
the *intent* of ``freeze_clip_encoders`` (``clip_model.py:174-223``; its
``'proj' in name`` substring match also catches every attention/MLP
out-projection — a defect not replicated here).
"""

from __future__ import annotations

import dataclasses
import functools
import signal
import threading
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..data.datasets import Batch, DataPipeline
from ..eval.metrics import average_mrr, compute_training_metrics
from ..models.clip import CLIP, l2_normalize
from ..parallel.mesh import MeshRuntime
from ..parallel.sharding import host_local_batch_to_global, replicated
from ..utils.config import TrainConfig
from ..utils.logging_utils import MetricsWriter, is_coordinator, setup_logger
from . import checkpoint as ckpt
from .losses import _flat_axis_index, joint_loss_for_config
from .schedule import cosine_annealing_lr

# The reference validates on T2I + T2T only and early-stops on their mean
# MRR (reference trainer.py:241-252); I2T is an eval-time task.
VAL_TASKS = ("T2I", "T2T")


def sync_early_stop_monitor(value: float) -> float:
    """Broadcast the coordinator's monitor value to every process.

    Only the coordinator computes validation metrics; without this
    broadcast each non-coordinator process would feed 0.0 into its
    ``EarlyStopper``, diverge on the break/continue decision after
    ``patience`` epochs, and desynchronize the ``train_step`` collectives
    (hang). Single-process runs are a no-op.
    """
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    return float(multihost_utils.broadcast_one_to_all(np.float32(value)))


def sync_preempt_flag(flag: bool) -> bool:
    """Collective OR of a host-local preemption flag across processes.

    Preemption (SIGTERM) can land on any subset of hosts between different
    steps; if each process drained on ITS OWN flag they would run different
    numbers of ``train_step`` collectives and hang. Every process calls this
    at the same step boundaries and all drain iff any was signalled.
    Single-process runs short-circuit (no device work at all).
    """
    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils

    return bool(np.any(multihost_utils.process_allgather(np.asarray(bool(flag)))))


class PreemptionGuard:
    """Cooperative SIGTERM drain for the trainer.

    TPU maintenance events and spot reclaims deliver SIGTERM with a grace
    window; the default Python behavior (immediate KeyboardInterrupt-less
    death) loses everything since the last epoch checkpoint. The guard
    flips a flag the train loop polls at step boundaries, so the trainer
    saves a resumable checkpoint and exits cleanly instead. The reference
    has no preemption story (``src/clip/train/trainer.py`` dies mid-epoch).

    Installs only from the main thread (signal module requirement); call
    :meth:`uninstall` (or use as a context manager) to restore previous
    handlers. ``trigger()`` arms the flag programmatically (tests, or an
    external watchdog thread).
    """

    def __init__(self, signals=(signal.SIGTERM,), install: bool = True):
        self._flag = False
        self._installed = []
        if install and threading.current_thread() is threading.main_thread():
            for s in signals:
                try:
                    prev = signal.signal(s, self._on_signal)
                except (ValueError, OSError):  # non-main thread / exotic os
                    continue
                self._installed.append((s, prev))

    def _on_signal(self, signum, frame):
        self._flag = True

    def trigger(self) -> None:
        self._flag = True

    @property
    def triggered(self) -> bool:
        return self._flag

    def uninstall(self) -> None:
        for s, prev in self._installed:
            signal.signal(s, prev)
        self._installed = []

    def __enter__(self) -> "PreemptionGuard":
        return self

    def __exit__(self, *exc) -> None:
        self.uninstall()


# ---------------------------------------------------------------------------
# Optimizer
# ---------------------------------------------------------------------------


def _trainable_labels(params, freeze_image: bool, freeze_text: bool):
    """Label pytree: 'train' or 'frozen' per leaf (projection-only freezing)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label(path) -> str:
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        joined = "/".join(str(k) for k in keys)
        if joined == "logit_scale":
            return "train"
        if keys and keys[0] == "visual":
            if joined == "visual/proj":
                return "train"
            return "frozen" if freeze_image else "train"
        if keys and keys[0] == "text":
            if joined in ("text/text_projection",) or joined.startswith("text/ln_final"):
                return "train"
            return "frozen" if freeze_text else "train"
        return "train"

    return jax.tree_util.tree_map_with_path(lambda path, _: label(path), params)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int, params) -> optax.GradientTransformation:
    # MultiSteps advances the inner schedule once per grad_accum_steps
    # micro-batches, so the per-epoch cosine anneal must be built in
    # *optimizer* steps or it runs k times slower than the reference's
    # per-epoch scheduler.step() (trainer.py:304-305).
    opt_steps_per_epoch = max(1, -(-steps_per_epoch // max(1, cfg.grad_accum_steps)))
    schedule = cosine_annealing_lr(
        cfg.lr, cfg.epochs, opt_steps_per_epoch, cfg.eta_min_factor,
        warmup_steps=getattr(cfg, "warmup_steps", 0),
    )

    # The reference loss uses a fixed temperature; logit_scale receives no
    # gradient and torch's AdamW skips grad-less params entirely
    # (trainer.py:479-485, losses.py:75-98). optax would still weight-decay a
    # zero-grad param, so mask it out to match.
    def _wd_mask(p):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: not (len(path) == 1 and getattr(path[0], "key", None) == "logit_scale"),
            p,
        )

    base = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.adamw(
            learning_rate=schedule,
            b1=cfg.beta1,
            b2=cfg.beta2,
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
            mask=_wd_mask,
        ),
    )
    if cfg.freeze_image_encoder or cfg.freeze_text_encoder:
        labels = _trainable_labels(params, cfg.freeze_image_encoder, cfg.freeze_text_encoder)
        base = optax.multi_transform({"train": base, "frozen": optax.set_to_zero()}, labels)
    if cfg.grad_accum_steps > 1:
        base = optax.MultiSteps(base, every_k_schedule=cfg.grad_accum_steps)
    return base


@jax.jit
def _tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def _ema_update(ema, params, decay: float):
    """One EMA step: ``decay * ema + (1 - decay) * params`` (elementwise, so
    it preserves whatever shardings the param tree carries — replicated for
    the DP step, tp/fsdp placements for the GSPMD step)."""
    return jax.tree_util.tree_map(
        lambda e, p: (decay * e + (1.0 - decay) * p).astype(e.dtype), ema, params
    )


def device_prefetch(batches, place_fn: Callable, depth: int = 1):
    """Iterate ``place_fn(batch)`` with host->device placement one step ahead.

    On a tunneled chip the upload is an HTTP round trip (GIL-released
    network IO), so a single background thread genuinely overlaps the next
    batch's transfer with the current step's compute — the classic input-
    pipeline double buffer, without tf.data. Exceptions from the worker
    (including the underlying data source) re-raise at the consumer.
    """
    import queue as queue_mod
    import threading

    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=max(1, depth))
    sentinel = object()
    errors = []
    stop = threading.Event()

    def _put(item) -> bool:
        # Bounded-timeout put so an abandoned consumer (train_step raised,
        # generator GC'd) can't strand this thread — and its staged device
        # batch — on a full queue forever.
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue_mod.Full:
                continue
        return False

    def worker():
        try:
            for b in batches:
                if stop.is_set() or not _put(place_fn(b)):
                    return
        except BaseException as e:  # propagate, don't kill silently
            errors.append(e)
        finally:
            _put(sentinel)

    threading.Thread(target=worker, daemon=True, name="kemr-prefetch").start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if errors:
                    raise errors[0]
                return
            yield item
    finally:
        stop.set()  # unblock the worker on early exit (break/close/error)
        while True:
            try:
                q.get_nowait()
            except queue_mod.Empty:
                break


# ---------------------------------------------------------------------------
# Train step (shard_map over the data axis)
# ---------------------------------------------------------------------------


def forward_for_config(model: CLIP, cfg: TrainConfig) -> Callable:
    """Resolve the train-step forward: plain ``model.apply``, or the QAT
    fake-quantized forward (``train.qat``) when ``cfg.qat`` — one seam
    shared by the DP, tensor-parallel, and LoRA steps (like
    ``joint_loss_for_config``). Extra positional args (e.g. the FLIP
    ``keep_idx``) pass through to the module method."""
    if getattr(cfg, "qat", False):
        from .qat import qat_apply

        return lambda p, *args, method: qat_apply(model, p, *args, method=method)
    return lambda p, *args, method: model.apply({"params": p}, *args, method=method)


def sample_keep_idx(rng, batch: int, n_patches: int, ratio: float) -> jax.Array:
    """FLIP patch subsets: [B, P_keep] random patch indices per image
    (uniform noise + static top-k — no ragged shapes, fully on-device)."""
    keep = max(1, int(round(n_patches * (1.0 - ratio))))
    noise = jax.random.uniform(rng, (batch, n_patches))
    _, idx = jax.lax.top_k(noise, keep)
    return idx.astype(jnp.int32)


def make_train_step(
    model: CLIP,
    optimizer: optax.GradientTransformation,
    cfg: TrainConfig,
    rt: MeshRuntime,
) -> Callable:
    """Build the jitted mesh step: (state, batch) -> (state, metrics).

    ``state = {"params", "opt_state", "step"}`` replicated; batch sharded on
    the data axis. Per-shard loss on local examples (reference DDP
    semantics) or global negatives via all_gather when configured.
    """
    # all batch-sharding axes: ("data",) on one slice, ("dcn", "data") under
    # multi-slice hybrid DP — pmean/all_gather over a tuple reduce over both
    # (gradients ride ICI within a slice and DCN across)
    axes = rt.data_axes
    axis = axes if len(axes) > 1 else axes[0]
    loss_axis = axis if cfg.global_negatives else None
    joint_loss = joint_loss_for_config(cfg)
    fwd = forward_for_config(model, cfg)
    mask_ratio = getattr(cfg, "image_mask_ratio", 0.0)
    n_patches = model.arch.grid_size**2
    base_key = jax.random.PRNGKey(cfg.seed)
    n_gc = int(getattr(cfg, "grad_cache_chunks", 0))
    use_negs = bool(getattr(cfg, "hard_negatives", "")) and getattr(cfg, "hard_negatives_k", 0) > 0

    def local_step(params, opt_state, step, images, query_ids, target_ids, *rest):
        neg_ids = rest[0] if use_negs else None  # [B, k, L] mined target texts
        img_args = (images,)
        if mask_ratio > 0:
            # FLIP masking: fresh per-image subsets each step, decorrelated
            # across shards (fold in the axis index)
            rng = jax.random.fold_in(
                jax.random.fold_in(base_key, step), _flat_axis_index(axis)
            )
            img_args = (images, sample_keep_idx(rng, images.shape[0], n_patches, mask_ratio))

        def emb_loss(img_e, q_e, t_e, neg_e=None):
            kw = {} if neg_e is None else {"neg_text_features": neg_e}
            return joint_loss(
                img_e,
                q_e,
                t_e,
                temperature=cfg.temperature,
                t2i_weight=cfg.t2i_weight,
                t2t_weight=cfg.t2t_weight,
                axis_name=loss_axis,
                **kw,
            )

        enc_img = lambda p, *xs: l2_normalize(fwd(p, *xs, method=CLIP.encode_image))  # noqa: E731
        enc_txt = lambda p, ids: l2_normalize(fwd(p, ids, method=CLIP.encode_text))  # noqa: E731
        neg_flat = (
            neg_ids.reshape(-1, neg_ids.shape[-1]) if neg_ids is not None else None
        )

        if n_gc > 1:
            # GradCache (train/gradcache.py): chunked encoder passes, full
            # negative pool — activation memory 1/n_gc at ~2x forward cost
            from .gradcache import gradcache_value_and_grad

            towers = [(enc_img, img_args), (enc_txt, (query_ids,)), (enc_txt, (target_ids,))]
            if neg_flat is not None:
                towers.append((enc_txt, (neg_flat,)))
            (loss, metrics), grads = gradcache_value_and_grad(
                emb_loss, towers, params, n_gc
            )
        else:

            def loss_fn(p):
                img_e = enc_img(p, *img_args)
                q_e = enc_txt(p, query_ids)
                t_e = enc_txt(p, target_ids)
                neg_e = enc_txt(p, neg_flat) if neg_flat is not None else None
                return emb_loss(img_e, q_e, t_e, neg_e)

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = jax.lax.pmean(grads, axis)
        metrics = jax.lax.pmean(metrics, axis)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_params, new_opt_state, step + 1, metrics

    in_specs = (P(), P(), P(), P(axis), P(axis), P(axis))
    if use_negs:
        in_specs = in_specs + (P(axis),)
    sharded = shard_map(
        local_step,
        mesh=rt.mesh,
        in_specs=in_specs,
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )

    # donate the state: params/opt_state update in place (427M-param state is
    # ~5 GB — without donation two copies must coexist and L/14 OOMs a 16 GB chip)
    ema_decay = float(getattr(cfg, "ema_decay", 0.0))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch):
        extra = (batch["neg_ids"],) if use_negs else ()
        params, opt_state, step, metrics = sharded(
            state["params"], state["opt_state"], state["step"],
            batch["images"], batch["query_ids"], batch["target_ids"], *extra,
        )
        new_state = {"params": params, "opt_state": opt_state, "step": step}
        if "ema_params" in state:
            new_state["ema_params"] = _ema_update(state["ema_params"], params, ema_decay)
        return new_state, metrics

    return train_step


# ---------------------------------------------------------------------------
# Train step (GSPMD over dp x tp meshes)
# ---------------------------------------------------------------------------


def init_state_gspmd(optimizer, params, rt: MeshRuntime) -> Dict[str, Any]:
    """Tensor-parallel train state: params placed with Megatron column/row
    shardings (``parallel.tp``), opt_state initialized under jit with the
    SAME path-suffix spec rules — optimizer moment trees embed the param tree
    (``ScaleByAdamState.mu["text"]...["c_fc"]["kernel"]``), so
    ``tp_param_pspecs`` applies to them verbatim and each Adam moment shards
    exactly like its parameter."""
    from jax.sharding import NamedSharding

    from ..parallel.tp import shard_params_tp, tp_param_pspecs

    params = shard_params_tp(params, rt.mesh, rt.model_axis)
    abstract = jax.eval_shape(optimizer.init, params)
    opt_shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(rt.mesh, s), tp_param_pspecs(abstract, rt.model_axis)
    )
    opt_state = jax.jit(optimizer.init, out_shardings=opt_shardings)(params)
    return {"params": params, "opt_state": opt_state, "step": jnp.zeros((), jnp.int32)}


def _fsdp_state_shardings(tree, rt: MeshRuntime):
    """FSDP shardings for a state(-shaped) tree, composed with tp specs when
    the model axis is active (fsdp shards a spare dim of tp-sharded leaves)."""
    from ..parallel.fsdp import fsdp_shardings
    from ..parallel.tp import tp_param_pspecs

    base = (
        tp_param_pspecs(tree, rt.model_axis)
        if rt.mesh.shape[rt.model_axis] > 1
        else None
    )
    return fsdp_shardings(tree, rt.mesh, rt.data_axis, base=base)


def init_state_fsdp(optimizer, params, rt: MeshRuntime) -> Dict[str, Any]:
    """ZeRO-3 train state: params AND Adam moments sharded over the data
    axis (``parallel.fsdp``), composed with tp shardings when the model axis
    is active. The moments embed the param tree with identical leaf shapes,
    so the same shape-based spec function places them leaf-for-leaf like
    their parameters — per-chip state memory scales 1/n with the mesh."""
    params = jax.device_put(params, _fsdp_state_shardings(params, rt))
    abstract = jax.eval_shape(optimizer.init, params)
    opt_state = jax.jit(
        optimizer.init, out_shardings=_fsdp_state_shardings(abstract, rt)
    )(params)
    return {"params": params, "opt_state": opt_state, "step": jnp.zeros((), jnp.int32)}


def make_train_step_gspmd(
    model: CLIP,
    optimizer: optax.GradientTransformation,
    cfg: TrainConfig,
) -> Callable:
    """Train step for a ``(data, model)`` mesh with tensor-parallel params.

    Takes no mesh argument on purpose: the step derives everything from the
    ARRAY shardings (state placed by :func:`init_state_gspmd`, batch placed
    by ``host_local_batch_to_global``) — there are no collectives to name.

    Unlike :func:`make_train_step` (shard_map with explicit ``pmean`` —
    mirrors the reference's DDP, ``trainer.py:44-49``), this step states NO
    collectives: params carry tp shardings (``parallel.tp``), the batch is
    sharded on ``data``, and XLA's SPMD partitioner inserts the attention/MLP
    all-reduces over the ``model`` axis and the gradient reductions over
    ``data``. Loss semantics are *global-batch* negatives — numerically the
    DP step with ``global_negatives=True`` (pinned in ``tests/test_tp.py``).
    """

    joint_loss = joint_loss_for_config(cfg)
    fwd = forward_for_config(model, cfg)
    mask_ratio = getattr(cfg, "image_mask_ratio", 0.0)
    n_patches = model.arch.grid_size**2
    base_key = jax.random.PRNGKey(cfg.seed)

    def loss_fn(p, images, query_ids, target_ids, keep_idx, neg_ids):
        img_args = (images,) if keep_idx is None else (images, keep_idx)
        img_e = l2_normalize(fwd(p, *img_args, method=CLIP.encode_image))
        q_e = l2_normalize(fwd(p, query_ids, method=CLIP.encode_text))
        t_e = l2_normalize(fwd(p, target_ids, method=CLIP.encode_text))
        kw = {}
        if neg_ids is not None:
            neg_flat = neg_ids.reshape(-1, neg_ids.shape[-1])
            kw["neg_text_features"] = l2_normalize(
                fwd(p, neg_flat, method=CLIP.encode_text)
            )
        return joint_loss(
            img_e, q_e, t_e,
            temperature=cfg.temperature,
            t2i_weight=cfg.t2i_weight,
            t2t_weight=cfg.t2t_weight,
            **kw,
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch):
        keep_idx = None
        if mask_ratio > 0:
            # keep_idx inherits the batch's data sharding via take_along_axis
            rng = jax.random.fold_in(base_key, state["step"])
            keep_idx = sample_keep_idx(
                rng, batch["images"].shape[0], n_patches, mask_ratio
            )
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], batch["images"], batch["query_ids"], batch["target_ids"],
            keep_idx, batch.get("neg_ids"),
        )
        updates, opt_state = optimizer.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = {"params": params, "opt_state": opt_state, "step": state["step"] + 1}
        if "ema_params" in state:
            new_state["ema_params"] = _ema_update(
                state["ema_params"], params, float(getattr(cfg, "ema_decay", 0.0))
            )
        return new_state, metrics

    return train_step


# ---------------------------------------------------------------------------
# Encoding (shared by validation and full evals)
# ---------------------------------------------------------------------------


def make_encode_step(model: CLIP, rt: MeshRuntime, fast: bool = False) -> Callable:
    """Jitted mesh encode: batch -> normalized (img, query, target) embeddings.

    ``fast=True`` returns a step that takes encode *plans* (see
    ``models.fast_encode.make_encode_plans``) instead of raw params and runs
    the fused/quantized serving towers — used by ``eval.encode_dataset`` and
    ``retrieval.build_embedding_store`` for accelerated precompute.

    Outputs are REPLICATED (each shard's rows all_gathered over the data
    axis): on multi-host meshes a ``P(axis)`` output is not fully
    addressable, so callers fetching embeddings to host (validation, eval,
    store building) would fail on every process — and coordinator-only
    fetching of a collective program deadlocks the others. Replicated
    outputs make the fetch identical on every process. Single-host behavior
    is unchanged (same global array, one extra ICI gather)."""
    axes = rt.data_axes
    axis = axes if len(axes) > 1 else axes[0]

    def local(params, images, query_ids, target_ids):
        if fast:
            from ..models.fast_encode import encode_image_fast, encode_text_fast

            img_e = l2_normalize(encode_image_fast(model.arch, params["visual"], images))
            q_e = l2_normalize(encode_text_fast(model.arch, params["text"], query_ids))
            t_e = l2_normalize(encode_text_fast(model.arch, params["text"], target_ids))
        else:
            img_e = l2_normalize(model.apply({"params": params}, images, method=CLIP.encode_image))
            q_e = l2_normalize(model.apply({"params": params}, query_ids, method=CLIP.encode_text))
            t_e = l2_normalize(model.apply({"params": params}, target_ids, method=CLIP.encode_text))
        gather = lambda e: jax.lax.all_gather(e, axis, axis=0, tiled=True)
        return gather(img_e), gather(q_e), gather(t_e)

    sharded = shard_map(
        local,
        mesh=rt.mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        # pallas_call outputs carry no varying-axis metadata; the vma check
        # rejects them inside shard_map even though the sharding is correct
        check_vma=False,
    )
    return jax.jit(sharded)


def make_encode_step_gspmd(model: CLIP, rt: MeshRuntime) -> Callable:
    """Encode step for tensor-parallel params: plain jit, no shard_map.

    The shard_map variant pins params to ``P()`` (replicated), which would
    all-gather the whole tp-sharded tree every call and run each encode
    redundantly on every model-axis device. Here params keep their tp
    shardings and the batch its data sharding; XLA partitions the towers the
    same way as the train step. Outputs are constrained replicated for the
    same multi-host-fetch reason as :func:`make_encode_step`."""
    from jax.sharding import NamedSharding

    rep = NamedSharding(rt.mesh, P())

    def f(params, images, query_ids, target_ids):
        img_e = l2_normalize(model.apply({"params": params}, images, method=CLIP.encode_image))
        q_e = l2_normalize(model.apply({"params": params}, query_ids, method=CLIP.encode_text))
        t_e = l2_normalize(model.apply({"params": params}, target_ids, method=CLIP.encode_text))
        con = lambda e: jax.lax.with_sharding_constraint(e, rep)
        return con(img_e), con(q_e), con(t_e)

    return jax.jit(f)


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class EarlyStopper:
    """Patience-based early stopping on a max-metric (``trainer.py:332-351``)."""

    patience: int
    best: float = -float("inf")
    best_epoch: int = -1
    bad_epochs: int = 0

    def update(self, value: float, epoch: int) -> bool:
        """Record epoch metric; returns True if this is a new best."""
        if value > self.best:
            self.best = value
            self.best_epoch = epoch
            self.bad_epochs = 0
            return True
        self.bad_epochs += 1
        return False

    @property
    def should_stop(self) -> bool:
        return self.bad_epochs >= self.patience


class CLIPTrainer:
    """Epoch-loop orchestration (reference ``CLIPTrainer``, ``trainer.py:58-357``)."""

    def __init__(
        self,
        model: CLIP,
        params,
        train_data: DataPipeline,
        val_data: Optional[DataPipeline],
        cfg: TrainConfig,
        rt: Optional[MeshRuntime] = None,
        out_dir: str = "experiments/train",
    ):
        self.model = model
        self.cfg = cfg
        self.rt = rt or MeshRuntime.create()
        self.train_data = train_data
        self.val_data = val_data
        self.out_dir = out_dir
        self.logger = setup_logger("kemr_tpu.train")
        self.metrics_writer = MetricsWriter(out_dir, "train")
        self._wandb = None
        if cfg.wandb_project and is_coordinator():
            try:  # optional dependency (reference trainer.py:25-29,117-131)
                import wandb

                self._wandb = wandb.init(project=cfg.wandb_project, config=dataclasses.asdict(cfg))
            except Exception as e:
                self.logger.warning("wandb unavailable: %s", e)

        if cfg.batch_size % self.rt.num_data:
            raise ValueError(
                f"train.batch_size={cfg.batch_size} must be divisible by the "
                f"data-axis size ({self.rt.num_data} devices)"
            )
        self.steps_per_epoch = train_data.num_batches(cfg.batch_size)
        # own copy: the donated train step invalidates its input buffers, so
        # the trainer must never alias arrays the caller still holds
        params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
        self.tensor_parallel = self.rt.mesh.shape[self.rt.model_axis] > 1
        self.fsdp = bool(getattr(self.rt, "fsdp", False))
        self.lora = cfg.lora_rank > 0
        self.distill_bank = None  # set in the distill branch below
        self.neg_table = self.neg_uuids = None
        if cfg.hard_negatives and cfg.hard_negatives_k > 0:
            # mined hard negatives (train/negatives.py): per batch example,
            # its top-k mined examples' target texts join the loss denominators
            if cfg.distill_teacher:
                raise ValueError("hard_negatives does not apply to the distill step")
            from .negatives import load_negatives

            self.neg_table, self.neg_uuids = load_negatives(cfg.hard_negatives)
            if self.neg_table.shape[0] != len(train_data):
                raise ValueError(
                    f"hard-negative table has {self.neg_table.shape[0]} rows but the "
                    f"training split has {len(train_data)} examples — re-mine "
                    f"(cli.mine_negatives) on this split"
                )
            if self.neg_table.shape[1] < cfg.hard_negatives_k:
                raise ValueError(
                    f"hard_negatives_k={cfg.hard_negatives_k} exceeds the mined "
                    f"table width {self.neg_table.shape[1]}"
                )
            self.logger.info(
                "hard negatives: %s ([%d, %d] table, using k=%d)",
                cfg.hard_negatives, *self.neg_table.shape, cfg.hard_negatives_k,
            )
        self.ema = float(getattr(cfg, "ema_decay", 0.0)) > 0.0
        if self.ema and not (0.0 < cfg.ema_decay < 1.0):
            raise ValueError(f"ema_decay must be in (0, 1), got {cfg.ema_decay}")
        if self.ema and (self.lora or cfg.distill_teacher):
            raise ValueError("ema_decay rides the DP/GSPMD full-fine-tune steps only")
        if self.lora:
            # LoRA (train/lora.py): state carries rank-r ADAPTERS; the frozen
            # base tree rides beside the step, never donated. Adapter memory
            # is ~0.1% of full fine-tuning, so DP covers every real case —
            # tp/fsdp shard full param/moment trees that LoRA does not have.
            if self.tensor_parallel or self.fsdp:
                raise ValueError("lora_rank > 0 requires plain data parallelism (no tp/fsdp)")
            if cfg.distill_teacher:
                raise ValueError("distill_teacher and lora_rank are mutually exclusive")
            from .lora import lora_init, lora_merge, lora_param_count, make_train_step_lora

            adapters = lora_init(
                jax.random.PRNGKey(cfg.seed), params, cfg.lora_rank, cfg.lora_targets
            )
            self.lora_scale = cfg.lora_alpha / cfg.lora_rank
            self.optimizer = make_optimizer(cfg, self.steps_per_epoch, adapters)
            self.base_params = jax.device_put(params, replicated(self.rt.mesh))
            self.state = {
                "params": jax.device_put(adapters, replicated(self.rt.mesh)),
                "opt_state": jax.device_put(
                    self.optimizer.init(adapters), replicated(self.rt.mesh)
                ),
                "step": jnp.zeros((), jnp.int32),
            }
            lora_step = make_train_step_lora(model, self.optimizer, cfg, self.rt, self.lora_scale)
            self.train_step = lambda state, batch: lora_step(self.base_params, state, batch)
            self._merge = jax.jit(
                functools.partial(lora_merge, scale=self.lora_scale)
            )
            self.encode_step = make_encode_step(model, self.rt)
            self.stopper = EarlyStopper(cfg.early_stop_patience)
            self.start_epoch = 0
            self.logger.info(
                "LoRA rank %d (%s): %d trainable adapter params",
                cfg.lora_rank, cfg.lora_targets, lora_param_count(adapters),
            )
            if cfg.resume and ckpt.checkpoint_exists(cfg.checkpoint_dir, "latest"):
                self._resume()
            return
        if cfg.distill_teacher:
            # knowledge distillation (train/distill.py): teacher embeddings
            # precomputed offline ride the batch; the step swaps InfoNCE for
            # the similarity-matrix KD loss. DP-only: the GSPMD/LoRA steps
            # keep their own losses.
            if self.tensor_parallel or self.fsdp:
                raise ValueError("distill_teacher requires plain data parallelism (no tp/fsdp)")
            from .distill import TeacherBank, load_encoded_dataset, make_distill_step

            self.distill_bank = TeacherBank(load_encoded_dataset(cfg.distill_teacher))
            self.optimizer = make_optimizer(cfg, self.steps_per_epoch, params)
            opt_state = self.optimizer.init(params)
            self.state = {
                "params": jax.device_put(params, replicated(self.rt.mesh)),
                "opt_state": jax.device_put(opt_state, replicated(self.rt.mesh)),
                "step": jnp.zeros((), jnp.int32),
            }
            self.train_step = make_distill_step(
                model, self.optimizer, cfg, self.rt,
                student_dim=model.arch.embed_dim, teacher_dim=self.distill_bank.dim,
            )
            self.encode_step = make_encode_step(model, self.rt)
            self.stopper = EarlyStopper(cfg.early_stop_patience)
            self.start_epoch = 0
            self.logger.info(
                "distilling from %s (%d teacher rows, dim %d -> student dim %d)",
                cfg.distill_teacher, len(self.distill_bank.enc.uuids),
                self.distill_bank.dim, model.arch.embed_dim,
            )
            if cfg.resume and ckpt.checkpoint_exists(cfg.checkpoint_dir, "latest"):
                self._resume()
            return
        self.optimizer = make_optimizer(cfg, self.steps_per_epoch, params)
        if self.tensor_parallel or self.fsdp:
            # model axis active and/or FSDP: sharded params + GSPMD step
            # (parallel/tp.py, parallel/fsdp.py). Loss is computed on the
            # GLOBAL batch — with local negatives configured that deviates
            # from reference DDP semantics, so say so.
            if not cfg.global_negatives:
                self.logger.warning(
                    "the GSPMD step computes global-batch negatives; "
                    "cfg.global_negatives=False is ignored in tp/fsdp mode"
                )
            init = init_state_fsdp if self.fsdp else init_state_gspmd
            self.state = init(self.optimizer, params, self.rt)
            self.train_step = make_train_step_gspmd(model, self.optimizer, cfg)
        else:
            opt_state = self.optimizer.init(params)
            self.state = {
                "params": jax.device_put(params, replicated(self.rt.mesh)),
                "opt_state": jax.device_put(opt_state, replicated(self.rt.mesh)),
                "step": jnp.zeros((), jnp.int32),
            }
            self.train_step = make_train_step(model, self.optimizer, cfg, self.rt)
        if self.ema:
            # EMA shadow initialized AT the starting params (no debias
            # needed); jnp.copy preserves the tree's placements (replicated
            # in DP, tp/fsdp shardings in GSPMD mode)
            self.state["ema_params"] = jax.tree_util.tree_map(
                jnp.copy, self.state["params"]
            )
        # tp/fsdp: GSPMD encode keeps params sharded (the shard_map step
        # would all-gather the whole tree to every device each val batch)
        self.encode_step = (
            make_encode_step_gspmd(model, self.rt)
            if (self.tensor_parallel or self.fsdp)
            else make_encode_step(model, self.rt)
        )
        self.stopper = EarlyStopper(cfg.early_stop_patience)
        self.start_epoch = 0
        if cfg.resume and ckpt.checkpoint_exists(cfg.checkpoint_dir, "latest"):
            self._resume()

    # -- checkpointing ------------------------------------------------------

    def _resume(self) -> None:
        state, meta = ckpt.load_checkpoint(self.cfg.checkpoint_dir, "latest", self.state)
        if self.fsdp:
            # re-place sharded over the data axis (shape-based specs apply
            # to the whole state tree: params, moments, step scalar alike)
            self.state = jax.device_put(state, _fsdp_state_shardings(state, self.rt))
        elif self.tensor_parallel:
            # re-place with the tp shardings (tp_param_pspecs keys off path
            # suffixes, so it applies to the whole state tree: params,
            # optimizer moments, and the step scalar alike)
            from ..parallel.tp import tp_shardings

            self.state = jax.device_put(state, tp_shardings(state, self.rt.mesh, self.rt.model_axis))
        else:
            self.state = jax.device_put(state, replicated(self.rt.mesh))
        self.start_epoch = int(meta.get("epoch", -1)) + 1
        self.stopper.best = float(meta.get("best_metric", -float("inf")))
        self.stopper.best_epoch = int(meta.get("best_epoch", -1))
        self.logger.info("resumed from epoch %d (best %.4f @ %d)", self.start_epoch, self.stopper.best, self.stopper.best_epoch)

    def _save(self, role: str, epoch: int) -> None:
        ckpt.save_checkpoint(
            self.cfg.checkpoint_dir,
            role,
            self.state,
            {"epoch": epoch, "best_metric": self.stopper.best, "best_epoch": self.stopper.best_epoch},
        )

    # -- data placement -----------------------------------------------------

    def _device_batch(self, batch: Batch) -> Dict[str, jax.Array]:
        host = {"images": batch.images, "query_ids": batch.query_ids, "target_ids": batch.target_ids}
        if self.distill_bank is not None:
            host["t_img"], host["t_q"], host["t_t"] = self.distill_bank.rows(batch.uuids)
        if self.neg_table is not None:
            # guard: the mined table must describe THIS dataset's rows
            for row, uuid in zip(np.asarray(batch.indices), batch.uuids):
                if self.neg_uuids[int(row)] != uuid:
                    raise ValueError(
                        f"hard-negative table row {row} is '{self.neg_uuids[int(row)]}' "
                        f"but the batch example is '{uuid}' — the table was mined on "
                        f"a different/reordered dataset"
                    )
            host["neg_ids"] = self.train_data.negative_target_ids(
                batch.indices, self.neg_table, self.cfg.hard_negatives_k
            )
        return host_local_batch_to_global(host, self.rt.mesh, self.rt.data_axes)

    # -- validation ---------------------------------------------------------

    def eval_params(self):
        """The parameter tree to evaluate/export: the trained params, in
        LoRA mode the base merged with the current adapters (W + s*A@B), or
        the EMA shadow when ``cfg.ema_decay`` is set (validation, the best-
        checkpoint monitor, and export all see the smoothed weights)."""
        if self.lora:
            return self._merge(self.base_params, self.state["params"])
        if "ema_params" in self.state:
            return self.state["ema_params"]
        return self.state["params"]

    def validate(self) -> Dict[str, float]:
        """MRR-only validation pass (reference ``trainer.py:230-258``).

        The reference validates on tasks ``['T2I', 'T2T']`` only
        (``trainer.py:241-252``) and on the *full* validation split; the
        tail batch is padded to keep jit shapes static, then sliced back.
        """
        if self.val_data is None:
            return {}
        embs = {"img": [], "q": [], "t": []}
        global_bs = self.cfg.batch_size
        pc, pi = jax.process_count(), jax.process_index()
        # hoisted: in LoRA mode eval_params() merges the full tree — once
        # per validation pass, not once per batch
        eval_params = self.eval_params()
        for batch in self.val_data.epoch_batches(global_bs, shuffle=False, drop_last=False):
            n = batch.images.shape[0]
            pad = global_bs - n
            images, query_ids, target_ids = batch.images, batch.query_ids, batch.target_ids
            if pad:
                images = np.pad(images, ((0, pad), (0, 0), (0, 0), (0, 0)))
                query_ids = np.pad(query_ids, ((0, pad), (0, 0)))
                target_ids = np.pad(target_ids, ((0, pad), (0, 0)))
            if pc > 1:
                # every process builds the identical padded GLOBAL batch and
                # contributes its contiguous slice; gathered encode outputs
                # then come back in global order on every process
                local = global_bs // pc
                sl = slice(pi * local, (pi + 1) * local)
                images, query_ids, target_ids = images[sl], query_ids[sl], target_ids[sl]
            db = host_local_batch_to_global(
                {"images": images, "query_ids": query_ids, "target_ids": target_ids},
                self.rt.mesh,
                self.rt.data_axes,
            )
            img_e, q_e, t_e = self.encode_step(
                eval_params, db["images"], db["query_ids"], db["target_ids"]
            )
            embs["img"].append(np.asarray(img_e)[:n])
            embs["q"].append(np.asarray(q_e)[:n])
            embs["t"].append(np.asarray(t_e)[:n])
        if not embs["img"]:
            return {}
        img = np.concatenate(embs["img"])
        q = np.concatenate(embs["q"])
        t = np.concatenate(embs["t"])
        return compute_training_metrics(q, t, img, tasks=VAL_TASKS)

    # -- main loop ----------------------------------------------------------

    def train(self, guard: Optional["PreemptionGuard"] = None) -> Dict[str, Any]:
        # `guard` injection: tests / external watchdogs drive the drain
        # deterministically via guard.trigger() without raising real signals
        guard = guard or PreemptionGuard(install=self.cfg.preempt_save)
        try:
            return self._train(guard)
        finally:
            guard.uninstall()

    def _train(self, guard: "PreemptionGuard") -> Dict[str, Any]:
        cfg = self.cfg
        history = []
        preempted = False
        for epoch in range(self.start_epoch, cfg.epochs):
            t0 = time.perf_counter()
            # per-epoch metric means (reference trainer.py:208-226), summed on
            # device so the step loop never blocks on a host fetch
            metric_sums = None
            n_steps = 0
            batches = self.train_data.epoch_batches(
                cfg.batch_size, epoch=epoch, shuffle=True, seed=cfg.seed, drop_last=True,
                num_shards=jax.process_count(), shard_index=jax.process_index(),
            )
            for db in device_prefetch(batches, self._device_batch):
                self.state, metrics = self.train_step(self.state, db)
                metric_sums = metrics if metric_sums is None else _tree_add(metric_sums, metrics)
                n_steps += 1
                if n_steps % cfg.log_every == 0:
                    self.logger.info(
                        "epoch %d step %d/%d: loss=%.4f",
                        epoch, n_steps, self.steps_per_epoch, float(metrics["loss"]),
                    )
                # preemption drain, agreed collectively at fixed step
                # boundaries so every process breaks at the SAME step
                if (
                    cfg.preempt_save
                    and cfg.preempt_check_every
                    and n_steps % cfg.preempt_check_every == 0
                    and sync_preempt_flag(guard.triggered)
                ):
                    preempted = True
                    break
            if not preempted and cfg.preempt_save and sync_preempt_flag(guard.triggered):
                preempted = True  # signal landed in the epoch's tail steps
            if preempted:
                # salvage save: resumable "latest" recorded at epoch-1 so
                # _resume (start_epoch = saved+1) RESTARTS this epoch's data
                # pass with the mid-epoch params — epoch-granular resume,
                # nothing is lost but the partial pass's step count
                self._save("latest", epoch - 1)
                ckpt.wait_for_checkpoints()
                self.logger.info(
                    "preempted at epoch %d step %d: salvage checkpoint saved, draining",
                    epoch, n_steps,
                )
                history.append({
                    "epoch": epoch, "steps": n_steps, "preempted": True,
                    "train": {k: float(v) / n_steps for k, v in metric_sums.items()}
                    if metric_sums else {},
                })
                break
            running = (
                {k: float(v) / n_steps for k, v in metric_sums.items()} if metric_sums else {}
            )
            epoch_time = time.perf_counter() - t0

            # EVERY process validates: the encode step is a collective
            # program, so coordinator-only execution would deadlock the other
            # processes on a multi-host mesh; replicated encode outputs make
            # the metrics (and thus the stop decision) identical everywhere.
            val_metrics = self.validate()
            monitor = {
                "avg_mrr": average_mrr(val_metrics, tasks=VAL_TASKS),
                "t2i_mrr": val_metrics.get("T2I_MRR", 0.0),
                "t2t_mrr": val_metrics.get("T2T_MRR", 0.0),
            }.get(cfg.early_stop_metric, 0.0)
            monitor = sync_early_stop_monitor(monitor)

            record = {
                "epoch": epoch,
                "train": running,
                "val": val_metrics,
                "monitor": monitor,
                "epoch_time_s": epoch_time,
                "steps": n_steps,
            }
            history.append(record)
            self.metrics_writer.log(epoch, record)
            if self._wandb is not None:
                self._wandb.log({"epoch": epoch, **{f"train/{k}": v for k, v in running.items()},
                                 **{f"val/{k}": v for k, v in val_metrics.items()}})
            self.logger.info(
                "epoch %d: loss=%.4f monitor(%s)=%.4f (%.1fs)",
                epoch, running.get("loss", float("nan")), cfg.early_stop_metric, monitor, epoch_time,
            )

            improved = self.stopper.update(monitor, epoch)
            self._save("latest", epoch)
            if improved:
                self._save("best", epoch)
            if self.stopper.should_stop:
                self.logger.info("early stop at epoch %d (best %.4f @ %d)", epoch, self.stopper.best, self.stopper.best_epoch)
                break

        final = {
            "best_metric": self.stopper.best,
            "best_epoch": self.stopper.best_epoch,
            "epochs_run": len(history),
            "preempted": preempted,
            "history": history,
        }
        ckpt.wait_for_checkpoints()  # flush async epoch saves before returning
        self.metrics_writer.finalize(final)
        return final
