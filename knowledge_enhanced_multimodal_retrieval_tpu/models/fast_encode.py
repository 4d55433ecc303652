"""Functional fast text-encode path for serving.

TPU-first design note: the flax ``CLIP`` module (``models.clip``) is the
general/trainable implementation; serving does not need module machinery, it
needs the fewest HBM round trips per token. This module provides:

- ``make_text_plan(params)`` — a one-time packing of the text tower's
  parameters into serving dtype (bf16). Casting 85M+ params per call would
  cost an extra HBM sweep inside every request program; the plan pays it
  once at retriever construction.
- ``encode_text_fast(arch, plan, ids)`` — embeddings + N x (fused attention
  block, fused MLP block) Pallas kernels (``ops.fused_block``) + final
  LN/EOT-pool/projection. On CPU (tests) the same function runs the XLA
  reference blocks, so one code path is oracle-checked everywhere.

Semantics match ``models.clip.TextTransformer`` exactly (causal mask, fp32
LayerNorm, EOT pooling at ``argmax(ids)``, fp32 output) — the tower the
reference loads at ``src/clip/model/clip_model.py:15-44``. Parity is pinned
by ``tests/test_fast_encode.py``. Inference-only (kernels define no VJP).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.dispatch import on_tpu
from ..ops.fused_block import (
    attention_block_reference,
    default_attention_tile,
    fused_attention_block,
    fused_mlp_block,
    mlp_block_reference,
    pad_rows,
    unpad_rows,
)

_SUBLANE = 16


def make_text_plan(params, dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Pack the text tower's params into a serving-dtype pytree (one-time cast)."""
    tp = params["text"]
    cast = lambda a: jnp.asarray(a, dtype)
    layers = []
    i = 0
    while f"resblocks_{i}" in tp["transformer"]:
        blk = tp["transformer"][f"resblocks_{i}"]
        layers.append(
            {
                "ln1_scale": jnp.asarray(blk["ln_1"]["ln"]["scale"], jnp.float32),
                "ln1_bias": jnp.asarray(blk["ln_1"]["ln"]["bias"], jnp.float32),
                "wqkv": cast(blk["attn"]["in_proj"]["kernel"]),
                "bqkv": jnp.asarray(blk["attn"]["in_proj"]["bias"], jnp.float32),
                "wo": cast(blk["attn"]["out_proj"]["kernel"]),
                "bo": jnp.asarray(blk["attn"]["out_proj"]["bias"], jnp.float32),
                "ln2_scale": jnp.asarray(blk["ln_2"]["ln"]["scale"], jnp.float32),
                "ln2_bias": jnp.asarray(blk["ln_2"]["ln"]["bias"], jnp.float32),
                "w1": cast(blk["mlp"]["c_fc"]["kernel"]),
                "b1": jnp.asarray(blk["mlp"]["c_fc"]["bias"], jnp.float32),
                "w2": cast(blk["mlp"]["c_proj"]["kernel"]),
                "b2": jnp.asarray(blk["mlp"]["c_proj"]["bias"], jnp.float32),
            }
        )
        i += 1
    return {
        "token_embedding": cast(tp["token_embedding"]["embedding"]),
        "positional_embedding": cast(tp["positional_embedding"]),
        "layers": layers,
        "lnf_scale": jnp.asarray(tp["ln_final"]["ln"]["scale"], jnp.float32),
        "lnf_bias": jnp.asarray(tp["ln_final"]["ln"]["bias"], jnp.float32),
        "text_projection": cast(tp["text_projection"]),
    }


def _mlp_tile(n_rows: int, attn_tile: int) -> int:
    return 256 if n_rows % 256 == 0 else attn_tile


def encode_text_fast(
    arch,
    plan: Dict[str, Any],
    ids: jax.Array,
    *,
    use_fused: Optional[bool] = None,
    interpret: bool = False,
) -> jax.Array:
    """ids [B, S] int32 -> [B, embed_dim] float32 (unnormalized embeddings)."""
    if use_fused is None:
        use_fused = on_tpu()
    b, s = ids.shape
    width = plan["token_embedding"].shape[1]
    heads = arch.text_heads
    dtype = plan["token_embedding"].dtype

    x = jnp.take(plan["token_embedding"], ids, axis=0)
    x = x + plan["positional_embedding"][:s]

    # pad the sequence axis to a sublane multiple (kernel tiling), then pad
    # rows to the tile (whole sequences; zero rows never touch real rows:
    # attention is block-diagonal, the MLP is row-local)
    s_pad = -(-s // _SUBLANE) * _SUBLANE
    if s_pad != s:
        x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
    x = x.reshape(b * s_pad, width)
    n = x.shape[0]
    tile = default_attention_tile(s_pad)
    x = pad_rows(x, tile)
    mtile = _mlp_tile(x.shape[0], tile)

    for lp in plan["layers"]:
        if use_fused:
            x = fused_attention_block(
                x, lp["ln1_scale"], lp["ln1_bias"], lp["wqkv"], lp["bqkv"],
                lp["wo"], lp["bo"], seq_len=s_pad, heads=heads, mask_len=s,
                tile=tile, interpret=interpret,
            )
            x = fused_mlp_block(
                x, lp["ln2_scale"], lp["ln2_bias"], lp["w1"], lp["b1"],
                lp["w2"], lp["b2"], tile=mtile, interpret=interpret,
            )
        else:
            x = attention_block_reference(
                x, lp["ln1_scale"], lp["ln1_bias"], lp["wqkv"], lp["bqkv"],
                lp["wo"], lp["bo"], seq_len=s_pad, heads=heads, mask_len=s,
            )
            x = mlp_block_reference(
                x, lp["ln2_scale"], lp["ln2_bias"], lp["w1"], lp["b1"],
                lp["w2"], lp["b2"],
            )

    x = unpad_rows(x, n).reshape(b, s_pad, width)[:, :s]
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    x = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)) * plan["lnf_scale"] + plan["lnf_bias"]
    eot = jnp.argmax(ids, axis=-1)
    pooled = x[jnp.arange(b), eot].astype(dtype)
    return (pooled @ plan["text_projection"]).astype(jnp.float32)
