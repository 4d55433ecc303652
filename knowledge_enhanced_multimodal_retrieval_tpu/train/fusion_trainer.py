"""Stage-2 training + evaluation of learned fusion heads.

The reference ships six fusion heads and a fusion *evaluator* but no head
training code — ``src/clip/train/train_fusion.py`` is a near-duplicate of the
evaluator with a broken import (``train_fusion.py:1-20``, SURVEY §2.14). This
module supplies the missing stage: heads are trained on frozen CLIP
embeddings with a diagonal-label cross-entropy over fused scores (the
retrieval objective the heads are evaluated on), plus the evaluation path
mirroring ``evaluator_fusion.py:76-121`` (blockwise scoring -> fused-matrix
metrics).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from typing import TYPE_CHECKING

from ..eval.metrics import DEFAULT_KS, compute_retrieval_metrics_fusion

if TYPE_CHECKING:  # break the eval <-> train import cycle; type-only use
    from ..eval.evaluator import EncodedDataset
from ..models.fusion_heads import FusionModel
from ..utils.logging_utils import setup_logger

logger = setup_logger("kemr_tpu.fusion_train")


def train_fusion_head(
    fm: FusionModel,
    encoded: "EncodedDataset",
    epochs: int = 10,
    batch_size: int = 64,
    lr: float = 1e-3,
    temperature: float = 0.07,
    seed: int = 42,
    params=None,
) -> Tuple[dict, Dict[str, list]]:
    """Train a head on frozen embeddings; returns (params, history).

    Objective: symmetric CE with diagonal labels over the head's fused
    [B, B] score block, scaled by 1/temperature — InfoNCE on fused scores.
    """
    rng = jax.random.PRNGKey(seed)
    if params is None:
        params = fm.init(rng)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    q_all = jnp.asarray(encoded.query)
    i_all = jnp.asarray(encoded.image)
    t_all = jnp.asarray(encoded.target)
    n = q_all.shape[0]
    steps = max(1, n // batch_size)

    @jax.jit
    def step(params, opt_state, idx, dropout_rng):
        def loss_fn(p):
            q, i, t = q_all[idx], i_all[idx], t_all[idx]
            scores = fm.scores(p, q, i, t, deterministic=False, dropout_rng=dropout_rng) / temperature
            labels = jnp.arange(scores.shape[0])
            logp_r = jax.nn.log_softmax(scores, axis=-1)
            logp_c = jax.nn.log_softmax(scores.T, axis=-1)
            rows = jnp.arange(scores.shape[0])
            return -(jnp.mean(logp_r[rows, labels]) + jnp.mean(logp_c[rows, labels])) / 2

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    history: Dict[str, list] = {"loss": []}
    np_rng = np.random.default_rng(seed)
    for epoch in range(epochs):
        order = np_rng.permutation(n)
        epoch_loss = 0.0
        for s in range(steps):
            idx = jnp.asarray(order[s * batch_size : (s + 1) * batch_size])
            if idx.shape[0] < 2:
                continue
            rng, drop = jax.random.split(rng)
            params, opt_state, loss = step(params, opt_state, idx, drop)
            epoch_loss += float(loss)
        history["loss"].append(epoch_loss / steps)
        logger.info("fusion head epoch %d: loss=%.4f", epoch, history["loss"][-1])
    return params, history


def save_fusion_head(path: str, fm: FusionModel, params) -> None:
    """Persist a trained head as one ``.npz`` artifact (atomic replace).

    The artifact is self-describing (fusion type + embed dim ride along), so
    :func:`load_fusion_head` needs no side-channel config — the serving CLI
    takes just ``--fusion.head_params=<path>``. The reference has no head
    persistence at all (its ``train_fusion.py`` is broken, SURVEY §2.14).
    """
    import io
    import os

    from flax import traverse_util

    flat = traverse_util.flatten_dict(params, sep="/")
    buf = io.BytesIO()
    np.savez(
        buf,
        __fusion_type__=np.asarray(fm.fusion_type),
        __embed_dim__=np.asarray(fm.embed_dim),
        **{f"param:{k}": np.asarray(v) for k, v in flat.items()},
    )
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


def load_fusion_head(path: str) -> Tuple[FusionModel, dict]:
    """Load a :func:`save_fusion_head` artifact -> ``(FusionModel, params)``."""
    from flax import traverse_util

    with np.load(path) as z:
        fm = FusionModel(str(z["__fusion_type__"]), int(z["__embed_dim__"]))
        flat = {
            k[len("param:"):]: jnp.asarray(z[k])
            for k in z.files
            if k.startswith("param:")
        }
    return fm, traverse_util.unflatten_dict(flat, sep="/")


def evaluate_fusion_model(
    fm: FusionModel,
    params,
    encoded: "EncodedDataset",
    k_values: Sequence[int] = DEFAULT_KS,
    block_q: int = 64,
    block_c: int = 512,
    baseline_weights: Tuple[float, float] = (0.5, 0.5),
) -> Dict[str, object]:
    """Blockwise fused-matrix eval + 0.5/0.5 baseline comparison
    (``evaluator_fusion.py:76-121`` incl. its score-statistics dump :99-115)."""
    fused = fm.blockwise_scores(params, jnp.asarray(encoded.query), jnp.asarray(encoded.image),
                                jnp.asarray(encoded.target), block_q=block_q, block_c=block_c)
    metrics = compute_retrieval_metrics_fusion(fused, prefix="FUSION", k_values=k_values)
    w_t2i, w_t2t = baseline_weights
    baseline = w_t2i * (encoded.query @ encoded.image.T) + w_t2t * (encoded.query @ encoded.target.T)
    stats = {
        "fused_mean": float(jnp.mean(fused)),
        "fused_std": float(jnp.std(fused)),
        "baseline_mean": float(np.mean(baseline)),
        "baseline_std": float(np.std(baseline)),
    }
    metrics_baseline = compute_retrieval_metrics_fusion(baseline, prefix="BASELINE", k_values=k_values)
    return {"fusion": metrics, "baseline": metrics_baseline, "score_stats": stats}
