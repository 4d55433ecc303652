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
    fused_attention_block_q8,
    fused_layer_q8,
    fused_mlp_block,
    fused_mlp_block_q8,
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
    return {
        "token_embedding": cast(tp["token_embedding"]["embedding"]),
        "positional_embedding": cast(tp["positional_embedding"]),
        "layers": _pack_layers(tp["transformer"], dtype, quantize),
        "lnf_scale": jnp.asarray(tp["ln_final"]["ln"]["scale"], jnp.float32),
        "lnf_bias": jnp.asarray(tp["ln_final"]["ln"]["bias"], jnp.float32),
        "text_projection": cast(tp["text_projection"]),
        # NOTE: no string marker here — the plan travels through jit as a
        # pytree; quantization is detected from the packed weight dtype.
    }


def make_vision_plan(params, dtype=jnp.bfloat16, quantize: Optional[str] = None) -> Dict[str, Any]:
    """Pack the vision tower's params (``models.clip.VisionTransformer``) for
    :func:`encode_image_fast`. The conv patch embed is reshaped to a matmul
    weight (stride == kernel size makes the conv an exact patch matmul)."""
    if quantize not in (None, "int8"):
        raise ValueError(f"unknown quantize mode: {quantize!r}")
    vp = params["visual"]
    cast = lambda a: jnp.asarray(a, dtype)
    conv = jnp.asarray(vp["conv1"]["kernel"])  # [P, P, 3, width]
    p = conv.shape[0]
    return {
        "conv_w": cast(conv.reshape(p * p * 3, conv.shape[-1])),
        "class_embedding": cast(vp["class_embedding"]),
        "positional_embedding": cast(vp["positional_embedding"]),
        "ln_pre_scale": jnp.asarray(vp["ln_pre"]["ln"]["scale"], jnp.float32),
        "ln_pre_bias": jnp.asarray(vp["ln_pre"]["ln"]["bias"], jnp.float32),
        "layers": _pack_layers(vp["transformer"], dtype, quantize),
        "ln_post_scale": jnp.asarray(vp["ln_post"]["ln"]["scale"], jnp.float32),
        "ln_post_bias": jnp.asarray(vp["ln_post"]["ln"]["bias"], jnp.float32),
        "proj": cast(vp["proj"]),
    }


def _pack_layers(transformer_params, dtype, quantize: Optional[str]) -> list:
    cast = lambda a: jnp.asarray(a, dtype)
    layers = []
    i = 0
    while f"resblocks_{i}" in transformer_params:
        blk = transformer_params[f"resblocks_{i}"]
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
    return layers


def plan_is_quantized(plan: Dict[str, Any]) -> bool:
    return plan["layers"][0]["wqkv"].dtype == jnp.int8


def fused_encoder_supported(arch) -> bool:
    """Whether the serving kernels can run this arch at all.

    The fused blocks tile rows x width onto 8x128 VREGs (``ops.fused_block.
    _check_common``); widths off the 128-lane grid — tiny test archs,
    exotic converted checkpoints — must use the flax/XLA towers. Auto
    encoder selection (``retrieval.CLIPRetrieval``) consults this so an
    unsupported arch degrades instead of raising at serve time."""
    return arch.text_width % 128 == 0 and arch.vision_width % 128 == 0


def make_encode_plans(params, dtype=jnp.bfloat16, quantize: Optional[str] = None) -> Dict[str, Any]:
    """Both towers' packed plans, keyed like the param tree (visual/text)."""
    return {
        "visual": make_vision_plan(params, dtype=dtype, quantize=quantize),
        "text": make_text_plan(params, dtype=dtype, quantize=quantize),
    }


# Row-tile target for the serving kernels. Measured on v5e at L/14 text
# shapes ([8192, 768]): tile 512 runs a q8 layer in 0.37 ms vs 0.57 at 256
# and 0.68 at 128 (fewer grid steps -> deeper pipeline); 1024 exceeds VMEM.
_TILE_TARGET = 512


def _mlp_tile(n_rows: int, attn_tile: int) -> int:
    return _TILE_TARGET if n_rows % _TILE_TARGET == 0 else attn_tile


# VMEM planning. Mosaic's default scoped-VMEM budget is ~16 MiB, but v5e has
# 128 MiB physical VMEM and Mosaic honors ``vmem_limit_bytes``: layers whose
# weights exceed the default-budget cap but fit a raised 48 MiB budget run the
# whole-layer kernel with the limit raised (measured r4 at vision-L/14 shapes
# [64x272, 1024/4096]: compiles at 32 MiB, bit-identical to the per-block
# pair, wall-time neutral — the layer is compute-bound, so the fusion's value
# is halved HBM traffic + ViT-H-class coverage, not latency).
#
# The wide band is only opened for shape classes VERIFIED on chip (r4/r5):
# q8 whole-layer up to ViT-H-class 19.7 MiB, q8 per-block in the same band,
# and the 16.8 MiB bf16 vision MLP. Un-verified bf16 shapes keep the default
# budget caps and degrade to the XLA reference instead of risking a Mosaic
# compile failure at serve time (advisor r4).
_LAYER_Q8_WEIGHT_CAP = 9 * 2**20  # whole-layer q8 kernel, default VMEM budget
_LAYER_Q8_WIDE_CAP = 24 * 2**20  # whole-layer q8 kernel at _WIDE_VMEM_BYTES
_BLOCK_WEIGHT_CAP = 10 * 2**20  # single attention/MLP block, default budget
_BLOCK_WIDE_CAP_Q8 = 24 * 2**20  # q8 block at _WIDE_VMEM_BYTES (ViT-g MLP)
_BLOCK_WIDE_CAP_BF16_ATTN = _BLOCK_WEIGHT_CAP  # no >10 MiB bf16 attn verified
_BLOCK_WIDE_CAP_BF16_MLP = 17 * 2**20  # verified: 16.8 MiB vision-L/14 MLP
_WIDE_VMEM_BYTES = 48 * 2**20


def _layer_weight_bytes(lp: Dict[str, Any]) -> int:
    return sum(lp[k].size * lp[k].dtype.itemsize for k in ("wqkv", "wo", "w1", "w2"))


def _block_weight_bytes(lp: Dict[str, Any], which: str) -> int:
    keys = ("wqkv", "wo") if which == "attn" else ("w1", "w2")
    return sum(lp[k].size * lp[k].dtype.itemsize for k in keys)


def _apply_layers(
    x: jax.Array,
    layers,
    *,
    s_pad: int,
    heads: int,
    mask_len: int,
    tile: int,
    mtile: int,
    use_fused: bool,
    causal: bool,
    interpret: bool,
) -> jax.Array:
    """Run the residual layers, picking the best kernel strategy per layer
    size: whole-layer q8 kernel when its weights fit VMEM, individual fused
    blocks otherwise, XLA reference blocks when a block's weights don't fit
    (vision-L/14 bf16 MLP) or off-TPU."""
    if not layers:
        return x
    q8 = layers[0]["wqkv"].dtype == jnp.int8
    for lp in layers:
        layer_wb = _layer_weight_bytes(lp)
        if q8 and use_fused and layer_wb <= _LAYER_Q8_WIDE_CAP:
            x = fused_layer_q8(
                x, lp["ln1_scale"], lp["ln1_bias"], lp["wqkv"], lp["wqkv_s"],
                lp["bqkv"], lp["wo"], lp["wo_s"], lp["bo"],
                lp["ln2_scale"], lp["ln2_bias"], lp["w1"], lp["w1_s"],
                lp["b1"], lp["w2"], lp["w2_s"], lp["b2"],
                seq_len=s_pad, heads=heads, mask_len=mask_len, tile=tile,
                causal=causal, interpret=interpret,
                vmem_limit_bytes=(
                    None if layer_wb <= _LAYER_Q8_WEIGHT_CAP else _WIDE_VMEM_BYTES
                ),
            )
        elif q8 and use_fused:
            # per-block kernels, each still guarded by the block VMEM caps so
            # oversized layers degrade to the XLA reference instead of
            # failing Mosaic compilation at serve time
            attn_wb = _block_weight_bytes(lp, "attn")
            if attn_wb <= _BLOCK_WIDE_CAP_Q8:
                x = fused_attention_block_q8(
                    x, lp["ln1_scale"], lp["ln1_bias"], lp["wqkv"], lp["wqkv_s"],
                    lp["bqkv"], lp["wo"], lp["wo_s"], lp["bo"],
                    seq_len=s_pad, heads=heads, mask_len=mask_len, tile=tile,
                    causal=causal, interpret=interpret,
                    vmem_limit_bytes=(
                        None if attn_wb <= _BLOCK_WEIGHT_CAP else _WIDE_VMEM_BYTES
                    ),
                )
            else:
                x = attention_block_q8_reference(
                    x, lp["ln1_scale"], lp["ln1_bias"], lp["wqkv"], lp["wqkv_s"],
                    lp["bqkv"], lp["wo"], lp["wo_s"], lp["bo"],
                    seq_len=s_pad, heads=heads, mask_len=mask_len, causal=causal,
                )
            mlp_wb = _block_weight_bytes(lp, "mlp")
            if mlp_wb <= _BLOCK_WIDE_CAP_Q8:
                x = fused_mlp_block_q8(
                    x, lp["ln2_scale"], lp["ln2_bias"], lp["w1"], lp["w1_s"],
                    lp["b1"], lp["w2"], lp["w2_s"], lp["b2"],
                    tile=mtile, interpret=interpret,
                    vmem_limit_bytes=(
                        None if mlp_wb <= _BLOCK_WEIGHT_CAP else _WIDE_VMEM_BYTES
                    ),
                )
            else:
                x = mlp_block_q8_reference(
                    x, lp["ln2_scale"], lp["ln2_bias"], lp["w1"], lp["w1_s"],
                    lp["b1"], lp["w2"], lp["w2_s"], lp["b2"],
                )
        elif q8:
            x = attention_block_q8_reference(
                x, lp["ln1_scale"], lp["ln1_bias"], lp["wqkv"], lp["wqkv_s"],
                lp["bqkv"], lp["wo"], lp["wo_s"], lp["bo"],
                seq_len=s_pad, heads=heads, mask_len=mask_len, causal=causal,
            )
            x = mlp_block_q8_reference(
                x, lp["ln2_scale"], lp["ln2_bias"], lp["w1"], lp["w1_s"],
                lp["b1"], lp["w2"], lp["w2_s"], lp["b2"],
            )
        else:
            attn_wb = _block_weight_bytes(lp, "attn")
            if use_fused and attn_wb <= _BLOCK_WIDE_CAP_BF16_ATTN:
                x = fused_attention_block(
                    x, lp["ln1_scale"], lp["ln1_bias"], lp["wqkv"], lp["bqkv"],
                    lp["wo"], lp["bo"], seq_len=s_pad, heads=heads,
                    mask_len=mask_len, tile=tile, causal=causal,
                    interpret=interpret,
                    vmem_limit_bytes=(
                        None if attn_wb <= _BLOCK_WEIGHT_CAP else _WIDE_VMEM_BYTES
                    ),
                )
            else:
                x = attention_block_reference(
                    x, lp["ln1_scale"], lp["ln1_bias"], lp["wqkv"], lp["bqkv"],
                    lp["wo"], lp["bo"], seq_len=s_pad, heads=heads,
                    mask_len=mask_len, causal=causal,
                )
            mlp_wb = _block_weight_bytes(lp, "mlp")
            if use_fused and mlp_wb <= _BLOCK_WIDE_CAP_BF16_MLP:
                # vision-L/14 bf16 MLP (16.8 MB of weights) lands here via the
                # wide band: measured 1.60 vs 1.80 ms/layer against the XLA
                # fallback at [64x272, 1024/4096] (r4, medians of 5)
                x = fused_mlp_block(
                    x, lp["ln2_scale"], lp["ln2_bias"], lp["w1"], lp["b1"],
                    lp["w2"], lp["b2"], tile=mtile, interpret=interpret,
                    vmem_limit_bytes=(
                        None if mlp_wb <= _BLOCK_WEIGHT_CAP else _WIDE_VMEM_BYTES
                    ),
                )
            else:
                x = mlp_block_reference(
                    x, lp["ln2_scale"], lp["ln2_bias"], lp["w1"], lp["b1"],
                    lp["w2"], lp["b2"],
                )
    return x


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

    x = _apply_layers(
        x, plan["layers"], s_pad=s_pad, heads=heads, mask_len=s, tile=tile,
        mtile=mtile, use_fused=use_fused, causal=True, interpret=interpret,
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


def encode_image_fast(
    arch,
    plan: Dict[str, Any],
    images: jax.Array,
    *,
    use_fused: Optional[bool] = None,
    interpret: bool = False,
) -> jax.Array:
    """images [B, H, W, 3] (NHWC, preprocessed) -> [B, embed_dim] float32.

    Semantics match ``models.clip.VisionTransformer`` exactly: the strided
    conv is computed as an exact patch matmul, attention is bidirectional,
    pooling takes the class token, LayerNorms run in fp32. At vision-L/14
    widths (1024/4096) the whole-layer q8 kernel and the bf16 MLP block both
    run with the scoped-VMEM limit raised (12 MiB int8 / 16.8 MiB bf16
    weights vs the ~16 MiB default budget) — ``_apply_layers`` picks per
    layer; oversized layers degrade to the XLA reference blocks.
    """
    if use_fused is None:
        use_fused = on_tpu()
    b = images.shape[0]
    p = arch.vision_patch_size
    g = arch.grid_size
    width = plan["conv_w"].shape[1]
    heads = arch.heads_vision
    dtype = plan["conv_w"].dtype

    # strided conv == patch matmul: [B, g, p, g, p, 3] -> [B, g*g, p*p*3]
    x = images.astype(dtype).reshape(b, g, p, g, p, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, g * g, p * p * 3)
    x = x @ plan["conv_w"]

    cls = jnp.broadcast_to(plan["class_embedding"], (b, 1, width))
    x = jnp.concatenate([cls, x], axis=1) + plan["positional_embedding"]
    s = g * g + 1
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    x = (((xf - mu) * jax.lax.rsqrt(var + 1e-5)) * plan["ln_pre_scale"] + plan["ln_pre_bias"]).astype(dtype)

    s_pad = -(-s // _SUBLANE) * _SUBLANE
    if s_pad != s:
        x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
    x = x.reshape(b * s_pad, width)
    n = x.shape[0]
    tile = default_attention_tile(s_pad, target=_TILE_TARGET)
    x = pad_rows(x, tile)
    mtile = _mlp_tile(x.shape[0], tile)

    x = _apply_layers(
        x, plan["layers"], s_pad=s_pad, heads=heads, mask_len=s, tile=tile,
        mtile=mtile, use_fused=use_fused, causal=False, interpret=interpret,
    )

    # class-token pool, then fp32 LN on the B pooled rows (row-local)
    pooled = unpad_rows(x, n).reshape(b, s_pad, width)[:, 0]
    pf = pooled.astype(jnp.float32)
    mu = pf.mean(-1, keepdims=True)
    var = ((pf - mu) ** 2).mean(-1, keepdims=True)
    pooled = ((pf - mu) * jax.lax.rsqrt(var + 1e-5)) * plan["ln_post_scale"] + plan["ln_post_bias"]
    return (pooled.astype(dtype) @ plan["proj"]).astype(jnp.float32)
