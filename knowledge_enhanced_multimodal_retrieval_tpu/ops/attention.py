"""Multi-head attention ops.

Two implementations behind one dispatch:

- ``mha_xla``     — plain jnp/einsum attention; XLA fuses it well at CLIP's
                    short sequence lengths (50-257 vision tokens, 77 text).
- ``flash_attention`` (in ``ops.flash_attention``) — Pallas TPU kernel,
  tiled over the sequence axes with an online softmax; used for the vision
  tower's longer sequences and as the building block for future long-context
  models.

``mha`` picks the implementation: the Pallas kernel on TPU when shapes meet
its tile constraints, the XLA path otherwise (CPU tests, tiny shapes).

The reference delegates attention to ``torch.nn.MultiheadAttention`` inside
OpenAI CLIP's ``ResidualAttentionBlock`` (loaded at reference
``src/clip/model/clip_model.py:15-44``); semantics here match that op:
scaled dot-product, optional additive causal mask, no dropout at inference.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def mha_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    softmax_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Scaled dot-product attention, [B, H, S, D] layout.

    Softmax runs in ``softmax_dtype`` (fp32 by default) regardless of the
    input compute dtype — the standard bf16-safe recipe on TPU.
    """
    *_, s_q, d = q.shape
    s_k = k.shape[-2]
    scale = 1.0 / (d**0.5)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(softmax_dtype) * scale
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (s_q, s_k), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (s_q, s_k), 1)
        logits = jnp.where(col <= row, logits, jnp.finfo(softmax_dtype).min)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Dispatching multi-head attention, [B, H, S, D].

    ``use_pallas=None`` auto-selects on TPU:
    - 128 < s <= 512 -> ``short_attention`` (whole sequence in VMEM, no
      score matrix in HBM; the flash grid degenerates into tiny
      overhead-bound blocks at these lengths);
    - s > 512 -> tiled ``flash_attention``;
    - s <= 128 and CPU -> the XLA reference (lane padding would dominate).

    The stock CLIP archs never exceed 257 tokens (ViT-L/14 vision), so the
    flash tier is dormant *for them* — it exists because ``CLIPArch`` is
    user-configurable (``context_length``/``image_resolution`` are free
    knobs, e.g. 448px/14 -> 1025 tokens) and a trainable tower needs an
    O(s)-memory attention with a VJP once sequences outgrow VMEM. It stays
    oracle-tested at s>512 in ``tests/test_flash_attention.py``.
    """
    from .dispatch import on_tpu

    s = q.shape[-2]
    if use_pallas is None:
        # below ~128 tokens the short kernel's lane padding (to 128) wastes
        # more than it saves vs XLA; measured crossover at CLIP shapes
        use_pallas = on_tpu() and q.shape[-1] <= 256 and s > 128
    if use_pallas:
        if s <= 512:
            from .short_attention import short_attention

            return short_attention(q, k, v, causal=causal)
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, causal=causal)
    return mha_xla(q, k, v, causal=causal)
