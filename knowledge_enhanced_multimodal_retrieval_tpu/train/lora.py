"""LoRA: low-rank adaptation for CLIP fine-tuning (beyond-reference).

The reference fine-tunes all ~428M ViT-L/14 parameters (full AdamW state,
``src/clip/train/trainer.py:479-492``) — its only memory lever is freezing
whole encoders (``clip_model.py:174-245``). LoRA trains rank-``r`` updates
``W + (alpha/r) * A @ B`` on the transformer projection kernels instead:
the optimizer state shrinks from two full moment trees (~3.4 GB f32 at
L/14) to a few MB, frozen base weights can stay bf16, and the artifact to
ship per domain is the adapter tree, not a 1.7 GB checkpoint.

TPU-native design: everything is functional trees — no model-code changes.
``lora_merge`` materializes ``W + scale * A @ B`` INSIDE the train step
(rank-r matmuls are a rounding error next to the 45.9 TFLOP step), so the
forward pass, every parallelism mode, and the serving/export paths all see
an ordinary parameter tree. Gradients flow only to the adapters because the
base rides as a non-differentiated argument.

Init follows the LoRA paper: A ~ N(0, 1/r), B = 0, so the merged model
equals the base model at step 0 (pinned in ``tests/test_lora.py``).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import PartitionSpec as P

# kernel-path suffixes adapted per target set; "attn" is the LoRA paper's
# default, "all" adds the MLP projections (helps at very low ranks)
_TARGET_SUFFIXES = {
    "attn": (("attn", "in_proj", "kernel"), ("attn", "out_proj", "kernel")),
    "mlp": (("mlp", "c_fc", "kernel"), ("mlp", "c_proj", "kernel")),
}
_TARGET_SUFFIXES["all"] = _TARGET_SUFFIXES["attn"] + _TARGET_SUFFIXES["mlp"]


def _path_names(path) -> Tuple[str, ...]:
    return tuple(getattr(k, "key", getattr(k, "name", str(k))) for k in path)


def _is_target(path, targets: str) -> bool:
    names = _path_names(path)
    return any(names[-len(s):] == s for s in _TARGET_SUFFIXES[targets])


def lora_init(rng: jax.Array, params, rank: int, targets: str = "attn"):
    """Build the adapter tree: ``{"a": [in, r], "b": [r, out]}`` per target
    kernel, everything else ``None`` (the tree mirrors ``params`` so specs
    and checkpoints treat it like a parameter tree)."""
    if targets not in _TARGET_SUFFIXES:
        raise ValueError(
            f"unknown lora targets {targets!r}: expected one of {sorted(_TARGET_SUFFIXES)}"
        )
    if rank < 1:
        raise ValueError(f"lora rank must be >= 1, got {rank}")
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    keys = jax.random.split(rng, len(leaves))

    def build(path, leaf, key):
        if leaf.ndim != 2 or not _is_target(path, targets):
            return None
        d_in, d_out = leaf.shape
        a = jax.random.normal(key, (d_in, rank), jnp.float32) / jnp.sqrt(rank)
        return {"a": a, "b": jnp.zeros((rank, d_out), jnp.float32)}

    flat = {path: build(path, leaf, k) for (path, leaf), k in zip(leaves, keys)}
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), [flat[p] for p, _ in leaves]
    )


def lora_merge(params, adapters, scale: float):
    """``W + scale * A @ B`` on adapted kernels; other leaves pass through.

    Runs inside jit — at rank 8 on L/14 the extra matmuls are ~0.1% of the
    step FLOPs, and XLA folds the add into the consumer's prologue.
    """

    def merge(p, ad):
        if ad is None:
            return p
        return (p + scale * (ad["a"] @ ad["b"]).astype(p.dtype)).astype(p.dtype)

    return jax.tree_util.tree_map(
        merge, params, adapters, is_leaf=lambda x: x is None or isinstance(x, dict) and "a" in x
    )


def lora_merge_host(params, adapters, scale: float):
    """Host-side (numpy) :func:`lora_merge` for load-time merging.

    On a remote-dispatch backend every eager device op is a network round
    trip, so tree-mapping the merge through jax eagerly costs hundreds of
    round trips at startup; the adapters are tiny, numpy does it in
    milliseconds and the result uploads once like any parameter tree.
    """
    import numpy as np

    def merge(p, ad):
        if ad is None:
            return p
        p = np.asarray(p)
        return (p + scale * (np.asarray(ad["a"]) @ np.asarray(ad["b"]))).astype(p.dtype)

    return jax.tree_util.tree_map(merge, params, adapters)


def lora_param_count(adapters) -> int:
    return sum(
        x.size for x in jax.tree_util.tree_leaves(adapters) if hasattr(x, "size")
    )


def make_train_step_lora(
    model,
    optimizer: optax.GradientTransformation,
    cfg,
    rt,
    scale: float,
) -> Callable:
    """LoRA twin of ``make_train_step``: state carries ADAPTERS (donated);
    the frozen base parameter tree rides as a separate, non-donated,
    non-differentiated argument. Loss semantics (per-shard negatives or
    global via all_gather) match the full fine-tune step exactly."""
    from ..models.clip import CLIP, l2_normalize
    from .losses import _flat_axis_index, joint_loss_for_config

    from .trainer import forward_for_config, sample_keep_idx

    axes = rt.data_axes  # ('dcn', 'data') under multi-slice hybrid DP
    axis = axes if len(axes) > 1 else axes[0]
    loss_axis = axis if cfg.global_negatives else None
    joint_loss = joint_loss_for_config(cfg)
    # QAT composes: the MERGED weights (what serving quantizes after
    # lora_merge) round through the fake-quant forward
    fwd = forward_for_config(model, cfg)
    mask_ratio = getattr(cfg, "image_mask_ratio", 0.0)
    n_patches = model.arch.grid_size**2
    base_key = jax.random.PRNGKey(cfg.seed)

    use_negs = bool(getattr(cfg, "hard_negatives", "")) and getattr(cfg, "hard_negatives_k", 0) > 0

    def local_step(base, adapters, opt_state, step, images, query_ids, target_ids, *rest):
        neg_ids = rest[0] if use_negs else None
        img_args = (images,)
        if mask_ratio > 0:
            rng = jax.random.fold_in(
                jax.random.fold_in(base_key, step), _flat_axis_index(axis)
            )
            img_args = (images, sample_keep_idx(rng, images.shape[0], n_patches, mask_ratio))

        def emb_loss(img_e, q_e, t_e, neg_e=None):
            kw = {} if neg_e is None else {"neg_text_features": neg_e}
            return joint_loss(
                img_e, q_e, t_e,
                temperature=cfg.temperature,
                t2i_weight=cfg.t2i_weight,
                t2t_weight=cfg.t2t_weight,
                axis_name=loss_axis,
                **kw,
            )

        enc_img = lambda ad, *xs: l2_normalize(  # noqa: E731
            fwd(lora_merge(base, ad, scale), *xs, method=CLIP.encode_image)
        )
        enc_txt = lambda ad, ids: l2_normalize(  # noqa: E731
            fwd(lora_merge(base, ad, scale), ids, method=CLIP.encode_text)
        )
        neg_flat = (
            neg_ids.reshape(-1, neg_ids.shape[-1]) if neg_ids is not None else None
        )

        n_gc = int(getattr(cfg, "grad_cache_chunks", 0))
        if n_gc > 1:
            # GradCache over the adapters: the frozen base rides inside the
            # encoder closures (non-differentiated), merge happens per chunk
            from .gradcache import gradcache_value_and_grad

            towers = [(enc_img, img_args), (enc_txt, (query_ids,)), (enc_txt, (target_ids,))]
            if neg_flat is not None:
                towers.append((enc_txt, (neg_flat,)))
            (loss, metrics), grads = gradcache_value_and_grad(
                emb_loss, towers, adapters, n_gc
            )
        else:

            def loss_fn(ad):
                img_e = enc_img(ad, *img_args)
                q_e = enc_txt(ad, query_ids)
                t_e = enc_txt(ad, target_ids)
                neg_e = enc_txt(ad, neg_flat) if neg_flat is not None else None
                return emb_loss(img_e, q_e, t_e, neg_e)

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(adapters)
        grads = jax.lax.pmean(grads, axis)
        metrics = jax.lax.pmean(metrics, axis)
        updates, new_opt_state = optimizer.update(grads, opt_state, adapters)
        new_adapters = optax.apply_updates(adapters, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_adapters, new_opt_state, step + 1, metrics

    in_specs = (P(), P(), P(), P(), P(axis), P(axis), P(axis))
    if use_negs:
        in_specs = in_specs + (P(axis),)
    sharded = shard_map(
        local_step,
        mesh=rt.mesh,
        in_specs=in_specs,
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )

    # donate only the adapter state — the base tree is reused every step
    @functools.partial(jax.jit, donate_argnums=(1,))
    def train_step(base, state, batch):
        extra = (batch["neg_ids"],) if use_negs else ()
        adapters, opt_state, step, metrics = sharded(
            base, state["params"], state["opt_state"], state["step"],
            batch["images"], batch["query_ids"], batch["target_ids"], *extra,
        )
        return {"params": adapters, "opt_state": opt_state, "step": step}, metrics

    return train_step


def save_adapters(path: str, adapters, meta: Dict[str, Any]) -> None:
    """Persist the adapter tree + config as one small ``.npz`` artifact."""
    import json

    import numpy as np

    flat = {}
    for p, leaf in jax.tree_util.tree_flatten_with_path(adapters)[0]:
        if leaf is not None:
            flat["/".join(_path_names(p))] = np.asarray(leaf)
    np.savez(path, __meta__=json.dumps(meta), **flat)


def load_adapters(path: str, params):
    """Load a ``save_adapters`` artifact back into a ``params``-shaped tree."""
    import json

    import numpy as np

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    flat = []
    for p, _ in leaves:
        key = "/".join(_path_names(p))
        a, b = data.get(key + "/a"), data.get(key + "/b")
        flat.append(None if a is None else {"a": jnp.asarray(a), "b": jnp.asarray(b)})
    tree = jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(params), flat)
    return tree, meta
