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
    attention_block_q8_reference,
    attention_block_reference,
    default_attention_tile,
    fused_attention_block,
    fused_layer_q8,
    fused_mlp_block,
    mlp_block_q8_reference,
    mlp_block_reference,
    pad_rows,
    quantize_weight,
    unpad_rows,
)

_SUBLANE = 16


def make_text_plan(params, dtype=jnp.bfloat16, quantize: Optional[str] = None) -> Dict[str, Any]:
    """Pack the text tower's params into a serving-dtype pytree (one-time cast).

    ``quantize="int8"`` packs the four projection weights of every block as
    symmetric per-output-channel int8 (W8A8 dynamic; see ``ops.fused_block``).
    The MXU runs int8 at ~2x bf16 throughput, at the cost of two rounding
    steps per projection — an opt-in serving mode; embeddings, LayerNorms,
    the attention interior, and the final projection stay in ``dtype``.
    """
    if quantize not in (None, "int8"):
        raise ValueError(f"unknown quantize mode: {quantize!r}")
    tp = params["text"]
    cast = lambda a: jnp.asarray(a, dtype)
    layers = []
    i = 0
    while f"resblocks_{i}" in tp["transformer"]:
        blk = tp["transformer"][f"resblocks_{i}"]
        lp = {
            "ln1_scale": jnp.asarray(blk["ln_1"]["ln"]["scale"], jnp.float32),
            "ln1_bias": jnp.asarray(blk["ln_1"]["ln"]["bias"], jnp.float32),
            "bqkv": jnp.asarray(blk["attn"]["in_proj"]["bias"], jnp.float32),
            "bo": jnp.asarray(blk["attn"]["out_proj"]["bias"], jnp.float32),
            "ln2_scale": jnp.asarray(blk["ln_2"]["ln"]["scale"], jnp.float32),
            "ln2_bias": jnp.asarray(blk["ln_2"]["ln"]["bias"], jnp.float32),
            "b1": jnp.asarray(blk["mlp"]["c_fc"]["bias"], jnp.float32),
            "b2": jnp.asarray(blk["mlp"]["c_proj"]["bias"], jnp.float32),
        }
        if quantize == "int8":
            for name, w in (
                ("wqkv", blk["attn"]["in_proj"]["kernel"]),
                ("wo", blk["attn"]["out_proj"]["kernel"]),
                ("w1", blk["mlp"]["c_fc"]["kernel"]),
                ("w2", blk["mlp"]["c_proj"]["kernel"]),
            ):
                lp[name], lp[name + "_s"] = quantize_weight(w)
        else:
            lp["wqkv"] = cast(blk["attn"]["in_proj"]["kernel"])
            lp["wo"] = cast(blk["attn"]["out_proj"]["kernel"])
            lp["w1"] = cast(blk["mlp"]["c_fc"]["kernel"])
            lp["w2"] = cast(blk["mlp"]["c_proj"]["kernel"])
        layers.append(lp)
        i += 1
    return {
        "token_embedding": cast(tp["token_embedding"]["embedding"]),
        "positional_embedding": cast(tp["positional_embedding"]),
        "layers": layers,
        "lnf_scale": jnp.asarray(tp["ln_final"]["ln"]["scale"], jnp.float32),
        "lnf_bias": jnp.asarray(tp["ln_final"]["ln"]["bias"], jnp.float32),
        "text_projection": cast(tp["text_projection"]),
        # NOTE: no string marker here — the plan travels through jit as a
        # pytree; quantization is detected from the packed weight dtype.
    }


def plan_is_quantized(plan: Dict[str, Any]) -> bool:
    return plan["layers"][0]["wqkv"].dtype == jnp.int8


# Row-tile target for the serving kernels. Measured on v5e at L/14 text
# shapes ([8192, 768]): tile 512 runs a q8 layer in 0.37 ms vs 0.57 at 256
# and 0.68 at 128 (fewer grid steps -> deeper pipeline); 1024 exceeds VMEM.
_TILE_TARGET = 512


def _mlp_tile(n_rows: int, attn_tile: int) -> int:
    return _TILE_TARGET if n_rows % _TILE_TARGET == 0 else attn_tile


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
    tile = default_attention_tile(s_pad, target=_TILE_TARGET)
    x = pad_rows(x, tile)
    mtile = _mlp_tile(x.shape[0], tile)

    q8 = plan_is_quantized(plan)
    for lp in plan["layers"]:
        if q8:
            if use_fused:
                # whole residual layer in one kernel: int8 weights are small
                # enough that attention + MLP fit VMEM together, so the
                # residual stream crosses HBM once per layer
                x = fused_layer_q8(
                    x, lp["ln1_scale"], lp["ln1_bias"], lp["wqkv"], lp["wqkv_s"],
                    lp["bqkv"], lp["wo"], lp["wo_s"], lp["bo"],
                    lp["ln2_scale"], lp["ln2_bias"], lp["w1"], lp["w1_s"],
                    lp["b1"], lp["w2"], lp["w2_s"], lp["b2"],
                    seq_len=s_pad, heads=heads, mask_len=s, tile=tile,
                    interpret=interpret,
                )
            else:
                x = attention_block_q8_reference(
                    x, lp["ln1_scale"], lp["ln1_bias"], lp["wqkv"], lp["wqkv_s"],
                    lp["bqkv"], lp["wo"], lp["wo_s"], lp["bo"],
                    seq_len=s_pad, heads=heads, mask_len=s,
                )
                x = mlp_block_q8_reference(
                    x, lp["ln2_scale"], lp["ln2_bias"], lp["w1"], lp["w1_s"],
                    lp["b1"], lp["w2"], lp["w2_s"], lp["b2"],
                )
        elif use_fused:
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

    # EOT-pool BEFORE the final LayerNorm: LN is row-local, so gathering the
    # B pooled rows first is mathematically identical to the flax tower's
    # LN-then-gather and runs the LN on B rows instead of B*s_pad.
    eot = jnp.argmax(ids, axis=-1)
    x = unpad_rows(x, n).reshape(b, s_pad, width)
    pooled = x[jnp.arange(b), eot]
    pf = pooled.astype(jnp.float32)
    mu = pf.mean(-1, keepdims=True)
    var = ((pf - mu) ** 2).mean(-1, keepdims=True)
    pooled = ((pf - mu) * jax.lax.rsqrt(var + 1e-5)) * plan["lnf_scale"] + plan["lnf_bias"]
    return (pooled.astype(dtype) @ plan["text_projection"]).astype(jnp.float32)
