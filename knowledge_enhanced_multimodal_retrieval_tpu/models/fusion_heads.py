"""Learned fusion heads combining T2I and T2T evidence.

Flax re-implementations of the reference's six heads
(``src/clip/model/fusion_model.py`` — SURVEY §2.7), same architectures and
initializations:

- ``LinearFusionHead``          — MLP over stacked [t2i, t2t] scores (:25-48)
- ``CrossAttentionFusionHead``  — per-pair query attends over {image, target},
  tanh-bounded to [-0.5, 0.5] (:51-133)
- ``GatedFusionHead``           — query-conditioned sigmoid gate MLP (:136-180)
- ``SimpleGatedFusion``         — linear gate, weight=1 bias=0 init (:182-196)
- ``SimpleGatedFusionWithBias`` — zero weight, bias=-2 (gate ~ 0.12) (:9-23)
- ``BilinearFusionHead``        — per-modality projections + learnable
  sigmoid-constrained alpha (:198-240)

``FusionModel`` composes a frozen CLIP with one head; ``blockwise_scores``
materializes the full fused score matrix in [block_q x block_c] tiles (the
reference's 50x500 tiling, ``evaluator_fusion.py:79-121``) — tile sizes
rounded to TPU-friendly shapes.
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

FUSION_TYPES = (
    "linear",
    "cross_attention",
    "gated",
    "simple_gated",
    "simple_gated_with_bias",
    "bilinear",
)

# Heads whose forward consumes precomputed score matrices rather than embeddings.
SCORE_BASED = ("linear",)


class LinearFusionHead(nn.Module):
    """MLP on stacked [t2i, t2t] score pairs (fusion_model.py:25-48)."""

    hidden_dim: int = 128
    dropout: float = 0.1

    @nn.compact
    def __call__(self, t2i_sim: jax.Array, t2t_sim: jax.Array, deterministic: bool = True) -> jax.Array:
        x = jnp.stack([t2i_sim, t2t_sim], axis=-1)  # [N, M, 2]
        x = nn.Dense(self.hidden_dim, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(1, name="fc2")(x)
        return x.squeeze(-1)


class CrossAttentionFusionHead(nn.Module):
    """Per-pair cross-attention over {image, target} (fusion_model.py:51-133)."""

    embed_dim: int = 768
    num_heads: int = 8
    hidden_dim: int = 256
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self, query_embed: jax.Array, image_embed: jax.Array, target_embed: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        n, d = query_embed.shape
        m = image_embed.shape[0]
        q = nn.Dense(self.embed_dim, name="query_proj")(query_embed)  # [N, D]
        i = nn.Dense(self.embed_dim, name="image_proj")(image_embed)  # [M, D]
        t = nn.Dense(self.embed_dim, name="target_proj")(target_embed)

        # All pairs: query token attends over its pair's {image, target} tokens.
        q_pairs = jnp.broadcast_to(q[:, None, None, :], (n, m, 1, self.embed_dim)).reshape(n * m, 1, self.embed_dim)
        kv = jnp.stack([jnp.broadcast_to(i[None], (n, m, self.embed_dim)),
                        jnp.broadcast_to(t[None], (n, m, self.embed_dim))], axis=2).reshape(n * m, 2, self.embed_dim)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            name="cross_attn",
        )(q_pairs, kv)  # [N*M, 1, D]
        x = attn.squeeze(1)
        x = nn.Dense(self.hidden_dim, name="mlp1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(64, name="mlp2")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(1, name="mlp3")(x).squeeze(-1)  # [N*M]
        return (jnp.tanh(x) * 0.5).reshape(n, m)


class GatedFusionHead(nn.Module):
    """Query-conditioned sigmoid gate over T2I/T2T (fusion_model.py:136-180)."""

    embed_dim: int = 768
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self, query_embed: jax.Array, image_embed: jax.Array, target_embed: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        t2i = query_embed @ image_embed.T
        t2t = query_embed @ target_embed.T
        g = nn.Dense(128, name="gate1")(query_embed)
        g = nn.relu(g)
        g = nn.Dropout(self.dropout, deterministic=deterministic)(g)
        g = nn.Dense(1, name="gate2")(g)
        gate = nn.sigmoid(g)  # [N, 1]
        return gate * t2i + (1 - gate) * t2t


class SimpleGatedFusion(nn.Module):
    """Linear gate: weight=ones, bias=0 init (fusion_model.py:182-196)."""

    embed_dim: int = 768

    @nn.compact
    def __call__(self, query_embed, image_embed, target_embed, deterministic: bool = True) -> jax.Array:
        w = self.param("query_weight", lambda k: jnp.ones((self.embed_dim,), jnp.float32))
        b = self.param("bias", lambda k: jnp.zeros((1,), jnp.float32))
        t2i = query_embed @ image_embed.T
        t2t = query_embed @ target_embed.T
        gate = nn.sigmoid(jnp.sum(query_embed * w, axis=1, keepdims=True) + b)
        return gate * t2i + (1 - gate) * t2t


class SimpleGatedFusionWithBias(nn.Module):
    """Zero-init weight, bias=-2 so the gate starts ~0.12 (fusion_model.py:9-23)."""

    embed_dim: int = 768

    @nn.compact
    def __call__(self, query_embed, image_embed, target_embed, deterministic: bool = True) -> jax.Array:
        w = self.param("query_weight", lambda k: jnp.zeros((self.embed_dim,), jnp.float32))
        b = self.param("bias", lambda k: jnp.asarray(-2.0, jnp.float32))
        t2i = query_embed @ image_embed.T
        t2t = query_embed @ target_embed.T
        gate = nn.sigmoid(jnp.sum(query_embed * w, axis=1, keepdims=True) + b)
        return gate * t2i + (1 - gate) * t2t


class BilinearFusionHead(nn.Module):
    """Learned per-modality projections + sigmoid alpha (fusion_model.py:198-240)."""

    embed_dim: int = 768

    @nn.compact
    def __call__(self, query_embed, image_embed, target_embed, deterministic: bool = True) -> jax.Array:
        img_p = nn.Dense(self.embed_dim, use_bias=False, name="W_image")(image_embed)
        tgt_p = nn.Dense(self.embed_dim, use_bias=False, name="W_target")(target_embed)
        alpha_param = self.param("alpha", lambda k: jnp.asarray(0.5, jnp.float32))
        alpha = nn.sigmoid(alpha_param)
        return alpha * (query_embed @ img_p.T) + (1 - alpha) * (query_embed @ tgt_p.T)


def build_head(fusion_type: str, embed_dim: int = 768) -> nn.Module:
    """Head factory (``FusionModel.__init__``, fusion_model.py:270-286)."""
    if fusion_type == "linear":
        return LinearFusionHead(hidden_dim=128)
    if fusion_type == "cross_attention":
        return CrossAttentionFusionHead(embed_dim=embed_dim, num_heads=8, hidden_dim=256)
    if fusion_type == "gated":
        return GatedFusionHead(embed_dim=embed_dim)
    if fusion_type == "simple_gated":
        return SimpleGatedFusion(embed_dim=embed_dim)
    if fusion_type == "simple_gated_with_bias":
        return SimpleGatedFusionWithBias(embed_dim=embed_dim)
    if fusion_type == "bilinear":
        return BilinearFusionHead(embed_dim=embed_dim)
    raise ValueError(f"Unknown fusion type: {fusion_type}")


class FusionModel:
    """Frozen-CLIP + fusion-head composition (fusion_model.py:243-331).

    CLIP encoding is delegated to the framework's encoders (embeddings are
    L2-normalized upstream); this class routes score-based vs embedding-based
    heads exactly like the reference's ``forward`` (:305-331).
    """

    def __init__(self, fusion_type: str, embed_dim: int = 768):
        if fusion_type not in FUSION_TYPES:
            raise ValueError(f"Unknown fusion type: {fusion_type}")
        self.fusion_type = fusion_type
        self.head = build_head(fusion_type, embed_dim)
        self.embed_dim = embed_dim
        self._cand_fn = None  # jitted per-query candidate rescorer (lazy)

    def init(self, rng: jax.Array, n: int = 2, m: int = 3):
        q = jnp.zeros((n, self.embed_dim))
        c = jnp.zeros((m, self.embed_dim))
        if self.fusion_type in SCORE_BASED:
            return self.head.init(rng, jnp.zeros((n, m)), jnp.zeros((n, m)))["params"]
        return self.head.init(rng, q, c, c)["params"]

    def scores(
        self,
        params,
        query_embed: jax.Array,
        image_embed: jax.Array,
        target_embed: jax.Array,
        deterministic: bool = True,
        dropout_rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        if self.fusion_type in SCORE_BASED:
            t2i = query_embed @ image_embed.T
            t2t = query_embed @ target_embed.T
            return self.head.apply({"params": params}, t2i, t2t, deterministic, rngs=rngs)
        return self.head.apply(
            {"params": params}, query_embed, image_embed, target_embed, deterministic, rngs=rngs
        )

    def candidate_scores(
        self,
        params,
        query_embed: jax.Array,
        image_embed: jax.Array,
        target_embed: jax.Array,
    ) -> jax.Array:
        """Per-query candidate rescoring: ``[Q, D] x [Q, R, D]² -> [Q, R]``.

        The two-tier learned-fusion serving rescorer
        (:meth:`CLIPRetrieval.retrieval_fused_batch`): each query is scored
        against only ITS fetched candidates — a vmap of :meth:`scores` with
        a one-row query block, so the head semantics match training/eval
        exactly. Jitted once per (Q, R) shape and cached on the instance.
        """
        if self._cand_fn is None:

            def one(p, q1, i1, t1):
                return self.scores(p, q1[None, :], i1, t1)[0]

            self._cand_fn = jax.jit(jax.vmap(one, in_axes=(None, 0, 0, 0)))
        return self._cand_fn(params, query_embed, image_embed, target_embed)

    def blockwise_scores(
        self,
        params,
        query_embed: jax.Array,
        image_embed: jax.Array,
        target_embed: jax.Array,
        block_q: int = 64,
        block_c: int = 512,
    ) -> jax.Array:
        """Full [N, M] fused matrix in tiles (evaluator_fusion.py:79-121).

        TPU-friendly tile sizes replace the reference's 50x500; tiles are
        jitted once and reused, padding handles the ragged edges.
        """
        n, _ = query_embed.shape
        m = image_embed.shape[0]
        pad_n = (-n) % block_q
        pad_m = (-m) % block_c
        q = jnp.pad(query_embed, ((0, pad_n), (0, 0)))
        i = jnp.pad(image_embed, ((0, pad_m), (0, 0)))
        t = jnp.pad(target_embed, ((0, pad_m), (0, 0)))

        score_fn = jax.jit(functools.partial(self.scores, deterministic=True))
        rows = []
        for qs in range(0, q.shape[0], block_q):
            cols = []
            for cs in range(0, i.shape[0], block_c):
                cols.append(score_fn(params, q[qs : qs + block_q], i[cs : cs + block_c], t[cs : cs + block_c]))
            rows.append(jnp.concatenate(cols, axis=1))
        return jnp.concatenate(rows, axis=0)[:n, :m]
