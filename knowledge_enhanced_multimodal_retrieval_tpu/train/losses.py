"""Contrastive losses for joint T2I + T2T fine-tuning.

Functional (pytree-in, scalars-out) re-design of the reference's loss modules
(``src/clip/train/losses.py``): symmetric InfoNCE (``losses.py:11-63``) and
the normalized-weight joint T2I+T2T combination (``losses.py:66-135`` —
T2I pairs *target_text <-> image*, T2T pairs *query <-> target_text*).

TPU notes: logits accumulate in float32 on the MXU regardless of the
embedding compute dtype, and an optional ``axis_name`` turns on global-batch
negatives: embeddings are all-gathered across the data axis so the
contrastive task sees the full global batch (the reference's DDP only ever
contrasts per-GPU local batches, ``trainer.py:160-185`` — local negatives is
the parity default, global is the TPU-native opt-in improvement).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def _flat_axis_index(axis_name) -> jax.Array:
    """Row-major index over one axis name or a tuple of them.

    Tuple axis names (multi-slice hybrid DP: ``('dcn', 'data')``) must match
    ``all_gather``'s tuple concatenation order — outer axis major.
    """
    if isinstance(axis_name, (tuple, list)):
        idx = jnp.int32(0)
        for a in axis_name:
            idx = idx * jax.lax.psum(1, a) + jax.lax.axis_index(a)
        return idx
    return jax.lax.axis_index(axis_name)


def info_nce(
    features_a: jax.Array,
    features_b: jax.Array,
    temperature: float = 0.07,
    axis_name: Optional[str] = None,
    negatives_a: Optional[jax.Array] = None,
    negatives_b: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Symmetric InfoNCE over L2-normalized features [B, D].

    With ``axis_name`` (inside ``shard_map``/``pmap``), negatives come from
    the whole global batch: both sides are all-gathered and each shard
    computes the loss rows belonging to its local examples.

    ``negatives_b`` ([K, D]) appends extra b-type candidate rows to the
    a→b direction's denominator (and ``negatives_a`` symmetrically to
    b→a) — the mined hard-negative hook (``train/negatives.py``). Extra
    rows are never labels, only competition; under ``axis_name`` they are
    all-gathered like the batch so every shard competes against every
    shard's mined rows.
    """
    a = features_a.astype(jnp.float32)
    b = features_b.astype(jnp.float32)
    n_local = a.shape[0]
    if axis_name is None:
        a_all, b_all, offset = a, b, 0
        na, nb = negatives_a, negatives_b
    else:
        b_all = jax.lax.all_gather(b, axis_name, tiled=True)  # [B_global, D]
        a_all = jax.lax.all_gather(a, axis_name, tiled=True)
        offset = _flat_axis_index(axis_name) * n_local
        na = (
            jax.lax.all_gather(negatives_a.astype(jnp.float32), axis_name, tiled=True)
            if negatives_a is not None
            else None
        )
        nb = (
            jax.lax.all_gather(negatives_b.astype(jnp.float32), axis_name, tiled=True)
            if negatives_b is not None
            else None
        )
    b_pool = b_all if nb is None else jnp.concatenate([b_all, nb.astype(jnp.float32)], axis=0)
    a_pool = a_all if na is None else jnp.concatenate([a_all, na.astype(jnp.float32)], axis=0)
    rows = jnp.arange(n_local)
    labels = offset + rows
    logp_ab = jax.nn.log_softmax((a @ b_pool.T) / temperature, axis=-1)
    logp_ba = jax.nn.log_softmax((b @ a_pool.T) / temperature, axis=-1)
    loss_a2b = -jnp.mean(logp_ab[rows, labels])
    loss_b2a = -jnp.mean(logp_ba[rows, labels])
    loss = (loss_a2b + loss_b2a) / 2.0
    return loss, {"loss": loss, "loss_a2b": loss_a2b, "loss_b2a": loss_b2a}


def joint_loss_for_config(cfg) -> "Callable":
    """Resolve ``TrainConfig.loss`` into a joint-loss callable with the
    :func:`joint_contrastive_loss` signature (``img, q, t`` + keyword
    ``temperature/t2i_weight/t2t_weight/axis_name``). One seam shared by
    the DP, tensor-parallel, and LoRA train steps."""
    import functools

    if cfg.loss == "infonce":
        base = joint_contrastive_loss
    elif cfg.loss == "siglip":
        base = functools.partial(joint_sigmoid_loss, bias=cfg.sigmoid_bias)
    else:
        raise ValueError(f"train.loss must be 'infonce' or 'siglip', got {cfg.loss!r}")
    if getattr(cfg, "matryoshka_dims", ()):
        return matryoshka_joint_loss(base, cfg.matryoshka_dims)
    return base


def matryoshka_joint_loss(base_joint, dims) -> "Callable":
    """Matryoshka Representation Learning (Kusupati et al. 2022) wrapper:
    average ``base_joint`` over prefix-truncated, re-normalized embeddings
    so every prefix in ``dims`` is a usable embedding by itself.

    Serving consumes this via ``CLIPRetrieval(truncate_dim=d)``: the corpus
    scan runs at ``d`` dims (HBM traffic and candidate-scan FLOPs scale
    with ``d``) and the host rerank restores full-dim exactness. The full
    dimension is always included (appended at trace time if absent) so the
    untruncated embedding keeps training. Normalizing a prefix of an
    L2-normalized vector equals normalizing the prefix of the raw vector,
    so the wrapper is correct on the already-normalized tower outputs.

    No reference counterpart (single fixed-width embeddings only,
    ``src/clip/model/clip_model.py:15-44``).
    """
    dims = tuple(dict.fromkeys(int(d) for d in dims))
    if not dims or any(d <= 0 for d in dims):
        raise ValueError(f"matryoshka dims must be positive ints, got {dims!r}")

    from ..ops.similarity import prefix_normalize

    def joint(image_features, query_features, target_features, neg_text_features=None, **kw):
        full = image_features.shape[-1]
        if any(d > full for d in dims):
            raise ValueError(
                f"matryoshka dims {dims} exceed the embedding width {full}"
            )
        all_dims = dims if full in dims else dims + (full,)
        total = jnp.float32(0.0)
        acc: Dict[str, jax.Array] = {}
        per_dim: Dict[str, jax.Array] = {}
        for d in all_dims:
            loss_d, m = base_joint(
                prefix_normalize(image_features, d),
                prefix_normalize(query_features, d),
                prefix_normalize(target_features, d),
                neg_text_features=(
                    prefix_normalize(neg_text_features, d)
                    if neg_text_features is not None
                    else None
                ),
                **kw,
            )
            total = total + loss_d
            per_dim[f"loss_d{d}"] = loss_d
            for key in ("loss_t2i", "loss_t2t"):
                if key in m:
                    acc[key] = acc.get(key, jnp.float32(0.0)) + m[key]
        n = float(len(all_dims))
        total = total / n
        return total, {
            "loss": total,
            **{k: v / n for k, v in acc.items()},
            **per_dim,
        }

    return joint


def sigmoid_contrastive(
    features_a: jax.Array,
    features_b: jax.Array,
    temperature: float = 0.1,
    bias: float = -10.0,
    axis_name: Optional[str] = None,
    negatives_a: Optional[jax.Array] = None,
    negatives_b: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """SigLIP-style pairwise sigmoid loss (Zhai et al. 2023) — the
    TPU-native alternative to :func:`info_nce` (the reference trains with
    softmax InfoNCE only, ``src/clip/train/losses.py:11-63``).

    Every (a_i, b_j) pair is an independent binary problem:
    ``-log sigmoid(z_ij * (sim_ij / temperature + bias))`` with ``z`` = +1
    on the diagonal, −1 off it. No softmax normalization across the batch
    means (1) the loss decomposes per pair, so global-batch negatives need
    only the b-side all_gather — each shard scores its local rows against
    the global columns and the cross-device ``pmean`` completes the global
    mean exactly; and (2) batch size changes shift no implicit task
    difficulty normalizer. ``bias`` offsets the heavy negative-pair
    imbalance (SigLIP init −10). Default ``temperature=0.1`` matches
    SigLIP's t=10 scale (this function divides, like :func:`info_nce`).

    Returns ``(loss, metrics)`` with the per-local-example mean of the
    summed pair losses.
    """
    a = features_a.astype(jnp.float32)
    b = features_b.astype(jnp.float32)
    n_local = a.shape[0]
    if axis_name is None:
        b_all = b
        offset = 0
        na, nb = negatives_a, negatives_b
    else:
        b_all = jax.lax.all_gather(b, axis_name, tiled=True)  # [B_global, D]
        offset = _flat_axis_index(axis_name) * n_local
        na = (
            jax.lax.all_gather(negatives_a.astype(jnp.float32), axis_name, tiled=True)
            if negatives_a is not None
            else None
        )
        nb = (
            jax.lax.all_gather(negatives_b.astype(jnp.float32), axis_name, tiled=True)
            if negatives_b is not None
            else None
        )
    logits = (a @ b_all.T) / temperature + bias  # [B_local, B_global]
    rows = jnp.arange(n_local)
    z = -jnp.ones_like(logits)
    z = z.at[rows, offset + rows].set(1.0)
    loss = -jnp.mean(jnp.sum(jax.nn.log_sigmoid(z * logits), axis=-1))
    # mined extras: pure negative pairs, same per-local-example mean scale
    if nb is not None:
        neg_logits = (a @ nb.astype(jnp.float32).T) / temperature + bias
        loss = loss - jnp.mean(jnp.sum(jax.nn.log_sigmoid(-neg_logits), axis=-1))
    if na is not None:
        neg_logits = (b @ na.astype(jnp.float32).T) / temperature + bias
        loss = loss - jnp.mean(jnp.sum(jax.nn.log_sigmoid(-neg_logits), axis=-1))
    return loss, {"loss": loss}


def joint_sigmoid_loss(
    image_features: jax.Array,
    query_features: jax.Array,
    target_features: jax.Array,
    temperature: float = 0.1,
    t2i_weight: float = 0.5,
    t2t_weight: float = 0.5,
    bias: float = -10.0,
    axis_name: Optional[str] = None,
    neg_text_features: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """:func:`joint_contrastive_loss` with :func:`sigmoid_contrastive`
    parts — same pairing (T2I: target↔image, T2T: query↔target), same
    normalized weights, sigmoid pair losses instead of softmax InfoNCE.
    Mined text negatives add pure negative-pair terms (image-vs-neg in
    T2I, query-vs-neg in T2T)."""
    wsum = t2i_weight + t2t_weight
    w_t2i, w_t2t = t2i_weight / wsum, t2t_weight / wsum
    loss_t2i, _ = sigmoid_contrastive(
        target_features, image_features, temperature, bias, axis_name,
        negatives_a=neg_text_features,
    )
    loss_t2t, _ = sigmoid_contrastive(
        query_features, target_features, temperature, bias, axis_name,
        negatives_b=neg_text_features,
    )
    total = w_t2i * loss_t2i + w_t2t * loss_t2t
    return total, {
        "loss": total,
        "loss_t2i": loss_t2i,
        "loss_t2t": loss_t2t,
        "t2i_weight": jnp.float32(w_t2i),
        "t2t_weight": jnp.float32(w_t2t),
    }


def joint_contrastive_loss(
    image_features: jax.Array,
    query_features: jax.Array,
    target_features: jax.Array,
    temperature: float = 0.07,
    t2i_weight: float = 0.5,
    t2t_weight: float = 0.5,
    axis_name: Optional[str] = None,
    neg_text_features: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Joint loss: ``w_t2i * InfoNCE(target, image) + w_t2t * InfoNCE(query, target)``
    with weights normalized to sum 1 (``losses.py:95-98``).

    ``neg_text_features`` ([K, D], L2-normalized) are mined hard-negative
    target-text embeddings (``train/negatives.py``) added to both terms'
    candidate pools."""
    wsum = t2i_weight + t2t_weight
    w_t2i, w_t2t = t2i_weight / wsum, t2t_weight / wsum
    # mined hard negatives are TARGET TEXTS: in T2I (a=target, b=image) they
    # extend the image→text pool (negatives_a); in T2T (a=query, b=target)
    # the query→target pool (negatives_b)
    loss_t2i, _ = info_nce(
        target_features, image_features, temperature, axis_name,
        negatives_a=neg_text_features,
    )
    loss_t2t, _ = info_nce(
        query_features, target_features, temperature, axis_name,
        negatives_b=neg_text_features,
    )
    total = w_t2i * loss_t2i + w_t2t * loss_t2t
    return total, {
        "loss": total,
        "loss_t2i": loss_t2i,
        "loss_t2t": loss_t2t,
        "t2i_weight": jnp.float32(w_t2i),
        "t2t_weight": jnp.float32(w_t2t),
    }
