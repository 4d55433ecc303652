"""Quantization-aware fine-tuning for the int8 serving path.

Serving's fastest encoder (``eval.encoder=int8`` — ``models/fast_encode``,
``ops/fused_block``) runs W8A8 dynamic: projection weights as symmetric
per-output-channel int8, activations as symmetric per-row dynamic int8.
Post-training quantization costs ~1% score error; QAT trains THROUGH both
roundings so the deployed int8 towers are loss-aware.

``TrainConfig.qat=True`` applies two straight-through-estimator (STE)
fake-quantizations inside the train-step forward — no model-code changes:

- **weights**: the four projection kernels of every transformer block
  (``in_proj``/``out_proj``/``c_fc``/``c_proj`` — exactly the set the
  serving plan quantizes, ``models/fast_encode.py``) round through the SAME
  math as ``ops.fused_block.quantize_weight`` at the parameter-tree level;
- **activations**: each of those Dense layers' inputs rounds per row
  through ``ops.fused_block._quantize_rows``'s math, injected via
  ``flax.linen.intercept_methods`` (tracing-time hook, jit/grad-safe).

Gradients pass the roundings unchanged (``x + stop_gradient(q(x) - x)``),
the optimizer keeps full-precision master weights, and checkpoints stay
plain f32 — deployment quantizes as usual and lands on rounding points the
loss already saw. No reference counterpart (the reference has no
quantization story at all).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# the Dense submodule names the int8 serving plan packs (fast_encode.py:113)
QAT_DENSE_NAMES: Tuple[str, ...] = ("in_proj", "out_proj", "c_fc", "c_proj")


def _ste(x: jax.Array, q: jax.Array) -> jax.Array:
    """Value of ``q``, gradient of ``x`` (straight-through estimator)."""
    return x + jax.lax.stop_gradient(q - x)


def fake_quant_weight(w: jax.Array) -> jax.Array:
    """Weight STE round-trip, math-matched to
    ``ops.fused_block.quantize_weight`` (symmetric per-output-channel
    int8): ``round(w / s) * s`` with ``s = max|w|_col / 127``."""
    w32 = jnp.asarray(w, jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w32), axis=0, keepdims=True) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w32 / s), -127, 127) * s
    return _ste(w32, q).astype(w.dtype)


def fake_quant_rows(x: jax.Array) -> jax.Array:
    """Activation STE round-trip, math-matched to
    ``ops.fused_block._quantize_rows`` (symmetric per-row dynamic int8)."""
    x32 = jnp.asarray(x, jnp.float32)
    r = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x32 / r), -127, 127) * r
    return _ste(x32, q).astype(x.dtype)


def qat_params(params):
    """Fake-quantize the projection kernels (and nothing else) in a CLIP
    param tree — biases, LayerNorms, embeddings, and projections outside
    the transformer blocks keep full precision, mirroring the serving plan.
    """

    def visit(path, leaf):
        names = [getattr(p, "key", None) for p in path]
        if (
            len(names) >= 2
            and names[-1] == "kernel"
            and names[-2] in QAT_DENSE_NAMES
        ):
            return fake_quant_weight(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params)


def _act_interceptor(next_fn, args, kwargs, context):
    mod = context.module
    if (
        isinstance(mod, nn.Dense)
        and mod.name in QAT_DENSE_NAMES
        and context.method_name == "__call__"
        and args
    ):
        return next_fn(fake_quant_rows(args[0]), *args[1:], **kwargs)
    return next_fn(*args, **kwargs)


def qat_apply(model, params, *args, method=None):
    """``model.apply`` with both fake-quantizations active: weights rounded
    at the tree level, projection inputs rounded per row via the method
    interceptor. Drop-in for the train-step forward."""
    with nn.intercept_methods(_act_interceptor):
        return model.apply({"params": qat_params(params)}, *args, method=method)
