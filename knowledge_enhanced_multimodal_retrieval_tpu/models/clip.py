"""CLIP in Flax: ViT image tower + causal text transformer.

A TPU-first re-implementation of the public CLIP architecture the reference
loads via ``clip.load`` (reference ``src/clip/model/clip_model.py:15-44``):
QuickGELU MLPs, pre-LN residual attention blocks, class-token ViT with a
learned projection, causal text transformer pooled at the EOT position
(selected as ``argmax`` over token ids, matching OpenAI's convention), and a
learnable ``logit_scale`` initialized to ``ln(1/0.07)``.

TPU-first choices:
- NHWC images; patch embedding as a single conv lowered by XLA onto the MXU.
- Parameters live in float32; compute dtype (default bfloat16) is a config
  knob; LayerNorm and softmax run in float32.
- Attention dispatches to the Pallas flash kernel on TPU (``ops.attention``).
- Optional ``jax.checkpoint`` rematerialization of tower blocks for
  memory-bound fine-tuning.

Named variants: ViT-B/32, ViT-B/16, ViT-L/14 (reference
``clip_model.py:15``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import mha


@dataclasses.dataclass(frozen=True)
class CLIPArch:
    """Architecture hyperparameters of one CLIP variant."""

    embed_dim: int
    image_resolution: int
    vision_layers: int
    vision_width: int
    vision_patch_size: int
    context_length: int
    vocab_size: int
    text_width: int
    text_heads: int
    text_layers: int
    vision_heads: int = 0  # 0 = auto (width // 64, the OpenAI convention)

    @property
    def heads_vision(self) -> int:
        return self.vision_heads or self.vision_width // 64

    @property
    def grid_size(self) -> int:
        return self.image_resolution // self.vision_patch_size


ARCHS = {
    "ViT-B/32": CLIPArch(512, 224, 12, 768, 32, 77, 49408, 512, 8, 12),
    "ViT-B/16": CLIPArch(512, 224, 12, 768, 16, 77, 49408, 512, 8, 12),
    "ViT-L/14": CLIPArch(768, 224, 24, 1024, 14, 77, 49408, 768, 12, 12),
    # OpenAI's high-resolution L/14 (``clip.load("ViT-L/14@336px")``): same
    # towers, 336px input -> 24x24 patch grid (577 tokens). The reference
    # accepts any name its ``clip.load`` knows (model/clip_model.py:15-44).
    "ViT-L/14@336px": CLIPArch(768, 336, 24, 1024, 14, 77, 49408, 768, 12, 12),
}


def quick_gelu(x: jax.Array) -> jax.Array:
    """QuickGELU: x * sigmoid(1.702 x) — OpenAI CLIP's activation (parity-critical)."""
    return x * jax.nn.sigmoid(1.702 * x)


class LayerNormF32(nn.Module):
    """LayerNorm computed in float32 with cast back to the compute dtype."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dtype = x.dtype
        y = nn.LayerNorm(epsilon=self.epsilon, dtype=jnp.float32, name="ln")(x.astype(jnp.float32))
        return y.astype(dtype)


class Attention(nn.Module):
    """Multi-head self-attention with fused qkv in_proj (OpenAI layout)."""

    width: int
    heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, causal: bool = False) -> jax.Array:
        b, s, _ = x.shape
        head_dim = self.width // self.heads
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(t):
            return t.reshape(b, s, self.heads, head_dim).transpose(0, 2, 1, 3)

        out = mha(heads_first(q), heads_first(k), heads_first(v), causal=causal)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, self.width)
        return nn.Dense(self.width, dtype=self.dtype, name="out_proj")(out)


class MLP(nn.Module):
    width: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(4 * self.width, dtype=self.dtype, name="c_fc")(x)
        h = quick_gelu(h)
        return nn.Dense(self.width, dtype=self.dtype, name="c_proj")(h)


class ResidualBlock(nn.Module):
    """Pre-LN residual attention block (OpenAI ResidualAttentionBlock)."""

    width: int
    heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, causal: bool = False) -> jax.Array:
        x = x + Attention(self.width, self.heads, self.dtype, name="attn")(
            LayerNormF32(name="ln_1")(x), causal=causal
        )
        x = x + MLP(self.width, self.dtype, name="mlp")(LayerNormF32(name="ln_2")(x))
        return x


class Transformer(nn.Module):
    width: int
    layers: int
    heads: int
    dtype: Any = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, causal: bool = False) -> jax.Array:
        block_cls = ResidualBlock
        if self.remat:
            block_cls = nn.remat(ResidualBlock, static_argnums=(2,))
        for i in range(self.layers):
            blk = block_cls(self.width, self.heads, self.dtype, name=f"resblocks_{i}")
            x = blk(x, causal) if self.remat else blk(x, causal=causal)
        return x


class VisionTransformer(nn.Module):
    arch: CLIPArch
    dtype: Any = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, images: jax.Array, keep_idx: Optional[jax.Array] = None) -> jax.Array:
        """images: [B, H, W, 3] (NHWC, preprocessed) -> [B, embed_dim] (unnormalized).

        ``keep_idx`` ([B, P_keep] int32 patch indices) enables FLIP-style
        masked training (Li et al. 2022, arXiv:2212.00794): only the listed
        patch tokens (plus the class token) enter the transformer, cutting
        the tower's FLOPs by the mask ratio with a STATIC token count —
        TPU-friendly (no ragged shapes). Tokens are gathered AFTER the
        positional embedding is added, so each kept patch carries its true
        position. Inference passes None (full token grid).
        """
        a = self.arch
        x = nn.Conv(
            a.vision_width,
            kernel_size=(a.vision_patch_size, a.vision_patch_size),
            strides=(a.vision_patch_size, a.vision_patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(images.astype(self.dtype))
        b = x.shape[0]
        x = x.reshape(b, -1, a.vision_width)  # [B, grid*grid, width]
        cls = self.param(
            "class_embedding",
            lambda key: jax.random.normal(key, (a.vision_width,)) * a.vision_width**-0.5,
        )
        pos = self.param(
            "positional_embedding",
            lambda key: jax.random.normal(key, (a.grid_size**2 + 1, a.vision_width)) * a.vision_width**-0.5,
        )
        cls_tok = jnp.broadcast_to(cls.astype(self.dtype), (b, 1, a.vision_width))
        x = jnp.concatenate([cls_tok, x], axis=1) + pos.astype(self.dtype)
        if keep_idx is not None:
            # class token (slot 0) always survives; patch slot i lives at 1+i
            gather = jnp.concatenate(
                [jnp.zeros((b, 1), jnp.int32), keep_idx.astype(jnp.int32) + 1], axis=1
            )
            x = jnp.take_along_axis(x, gather[..., None], axis=1)
        x = LayerNormF32(name="ln_pre")(x)
        x = Transformer(a.vision_width, a.vision_layers, a.heads_vision, self.dtype, self.remat, name="transformer")(x)
        x = LayerNormF32(name="ln_post")(x[:, 0, :])
        proj = self.param(
            "proj",
            lambda key: jax.random.normal(key, (a.vision_width, a.embed_dim)) * a.vision_width**-0.5,
        )
        return (x @ proj.astype(self.dtype)).astype(jnp.float32)


class TextTransformer(nn.Module):
    arch: CLIPArch
    dtype: Any = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        """ids: [B, context_length] int32 -> [B, embed_dim] (unnormalized).

        Pools at the EOT position found as ``argmax(ids)`` — EOT is the
        largest id in the CLIP vocab (OpenAI convention). No padding mask:
        causal masking only, exactly like the original.
        """
        a = self.arch
        emb = nn.Embed(a.vocab_size, a.text_width, dtype=self.dtype, name="token_embedding")
        x = emb(ids)
        pos = self.param(
            "positional_embedding",
            lambda key: jax.random.normal(key, (a.context_length, a.text_width)) * 0.01,
        )
        x = x + pos[: ids.shape[1]].astype(self.dtype)
        x = Transformer(a.text_width, a.text_layers, a.text_heads, self.dtype, self.remat, name="transformer")(
            x, causal=True
        )
        x = LayerNormF32(name="ln_final")(x)
        eot = jnp.argmax(ids, axis=-1)
        x = x[jnp.arange(ids.shape[0]), eot]
        proj = self.param(
            "text_projection",
            lambda key: jax.random.normal(key, (a.text_width, a.embed_dim)) * a.text_width**-0.5,
        )
        return (x @ proj.astype(self.dtype)).astype(jnp.float32)


class CLIP(nn.Module):
    """Full dual-tower CLIP.

    ``__call__`` returns (image_embeds, text_embeds, logit_scale) —
    unnormalized; L2-normalization is applied by callers exactly as in the
    reference trainer (``trainer.py:168-179``).
    """

    arch: CLIPArch
    dtype: Any = jnp.bfloat16
    remat: bool = False

    def setup(self):
        self.visual = VisionTransformer(self.arch, self.dtype, self.remat)
        self.text = TextTransformer(self.arch, self.dtype, self.remat)
        self.logit_scale = self.param(
            "logit_scale", lambda key: jnp.asarray(jnp.log(1.0 / 0.07), jnp.float32)
        )

    def encode_image(self, images: jax.Array, keep_idx: Optional[jax.Array] = None) -> jax.Array:
        return self.visual(images, keep_idx)

    def encode_text(self, ids: jax.Array) -> jax.Array:
        return self.text(ids)

    def __call__(self, images: jax.Array, ids: jax.Array):
        return self.encode_image(images), self.encode_text(ids), self.logit_scale


# ---------------------------------------------------------------------------
# Functional helpers
# ---------------------------------------------------------------------------


def build_model(name: str, dtype: Any = jnp.bfloat16, remat: bool = False) -> CLIP:
    if name not in ARCHS:
        raise ValueError(f"unknown CLIP variant {name!r}; available: {sorted(ARCHS)}")
    return CLIP(ARCHS[name], dtype=dtype, remat=remat)


def arch_from_params(params) -> CLIPArch:
    """Infer the :class:`CLIPArch` from a converted parameter tree's shapes.

    Lets real checkpoints (OpenAI ``.pt`` / HF ``CLIPModel``) be loaded
    without naming the variant up front — the reference instead requires a
    ``--model_name`` that must match the checkpoint
    (``src/clip/model/clip_model.py:15-44``).
    """
    visual, text = params["visual"], params["text"]
    patch = visual["conv1"]["kernel"].shape[0]
    vision_width = visual["conv1"]["kernel"].shape[3]
    grid_sq = visual["positional_embedding"].shape[0] - 1
    image_resolution = int(round(grid_sq**0.5)) * patch
    vocab_size, text_width = text["token_embedding"]["embedding"].shape
    return CLIPArch(
        embed_dim=text["text_projection"].shape[1],
        image_resolution=image_resolution,
        vision_layers=len(visual["transformer"]),
        vision_width=vision_width,
        vision_patch_size=patch,
        context_length=text["positional_embedding"].shape[0],
        vocab_size=vocab_size,
        text_width=text_width,
        text_heads=text_width // 64,
        text_layers=len(text["transformer"]),
    )


def build_model_from_params(params, dtype: Any = jnp.bfloat16, remat: bool = False) -> CLIP:
    """Build the CLIP module matching a converted checkpoint's shapes."""
    return CLIP(arch_from_params(params), dtype=dtype, remat=remat)


def init_params(model: CLIP, rng: jax.Array, batch: int = 1):
    """Initialize a parameter pytree with dummy inputs."""
    a = model.arch
    images = jnp.zeros((batch, a.image_resolution, a.image_resolution, 3), jnp.float32)
    ids = jnp.zeros((batch, a.context_length), jnp.int32)
    return model.init(rng, images, ids)["params"]


def encode_image(model: CLIP, params, images: jax.Array, normalize: bool = True) -> jax.Array:
    out = model.apply({"params": params}, images, method=CLIP.encode_image)
    return l2_normalize(out) if normalize else out


def encode_text(model: CLIP, params, ids: jax.Array, normalize: bool = True) -> jax.Array:
    out = model.apply({"params": params}, ids, method=CLIP.encode_text)
    return l2_normalize(out) if normalize else out


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def count_params(params) -> int:
    """Total parameter count (reference ``clip_model.py:247-291``)."""
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
