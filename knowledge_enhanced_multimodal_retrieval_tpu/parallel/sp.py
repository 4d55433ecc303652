"""Sequence parallelism: ring attention over a mesh axis.

The reference has no sequence-axis scaling at all — CLIP's 77/257-token
contexts fit trivially on one GPU (``src/clip/train/trainer.py:164-165``
truncates to 77 tokens; SURVEY §5 "long-context: not applicable"). This
module is the framework's scaling path for sequences LONGER than one chip's
HBM: activations are sharded along the sequence axis, and attention — the
only cross-token op in a transformer — runs as a ring schedule in which K/V
shards rotate device-to-device over ICI via ``lax.ppermute`` while each
device's Q shard stays resident.

TPU-native design:

- One compiled program: a ``lax.scan`` over the ring steps inside
  ``shard_map``; XLA overlaps each step's ppermute with the next step's
  [s_q, s_kv] block matmuls (the classic compute/communication overlap —
  per-step compute grows with s², transfer with s, so longer shards hide
  the hop entirely).
- Online softmax (running max / numerator / denominator in f32) exactly as
  in flash attention, so the result is invariant to ring order and matches
  dense attention to float tolerance.
- Differentiable end-to-end: ``jax.grad`` through scan+ppermute yields the
  reverse ring (gradient hops run the ring backwards) — no custom VJP.
- Everything but attention in a transformer block is per-token, so a whole
  encoder layer runs with activations sharded ``[B, S/n, W]``
  (:func:`sp_block_apply`): per-device activation memory scales 1/n with
  the sequence axis.

CLIP itself never needs SP (257 tokens max); this exists so the framework
scales past CLIP, pinned against dense attention and the real CLIP
``ResidualBlock`` in ``tests/test_sp.py`` and exercised by the multi-chip
dry run.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

_NEG = -1e30  # large-negative mask value (not -inf: keeps fully-masked rows NaN-free)


def _ring_attention_local(q, k, v, axis: str, causal: bool):
    """Per-device body: q,k,v are local sequence shards [B, H, s, D]."""
    n = jax.lax.psum(1, axis)
    me = jax.lax.axis_index(axis)
    b, h, s, d = q.shape
    scale = 1.0 / (d**0.5)
    qf = q.astype(jnp.float32) * scale
    q_pos = me * s + jnp.arange(s)  # global positions of my queries

    def step(carry, t):
        kc, vc, m, num, den = carry
        # kc/vc originated on device (me - t) mod n after t hops
        src = (me - t) % n
        scores = jnp.einsum("bhqd,bhkd->bhqk", qf, kc.astype(jnp.float32))
        if causal:
            k_pos = src * s + jnp.arange(s)
            mask = q_pos[:, None] >= k_pos[None, :]
            scores = jnp.where(mask[None, None], scores, _NEG)
        m_new = jnp.maximum(m, scores.max(axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new[..., None])
        num = num * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, vc.astype(jnp.float32)
        )
        den = den * alpha + p.sum(axis=-1)
        # rotate K/V one hop around the ring (ICI neighbour exchange)
        perm = [(i, (i + 1) % n) for i in range(n)]
        kc = jax.lax.ppermute(kc, axis, perm)
        vc = jax.lax.ppermute(vc, axis, perm)
        return (kc, vc, m_new, num, den), None

    init = (
        k,
        v,
        jnp.full((b, h, s), _NEG, jnp.float32),
        jnp.zeros((b, h, s, d), jnp.float32),
        jnp.zeros((b, h, s), jnp.float32),
    )
    (_, _, _, num, den), _ = jax.lax.scan(step, init, jnp.arange(n))
    return (num / jnp.maximum(den, 1e-30)[..., None]).astype(q.dtype)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "seq",
    causal: bool = False,
) -> jax.Array:
    """Sequence-sharded attention; semantics of ``ops.attention.mha_xla``.

    ``q, k, v``: ``[B, H, S, D]`` with ``S`` divisible by ``mesh.shape[axis]``.
    The arrays are sharded ``P(None, None, axis, None)`` inside; any other
    mesh axes (``data`` etc.) see the batch dims replicated here — compose
    DP by sharding B outside.
    """
    if axis not in mesh.shape:
        raise ValueError(f"mesh has no axis {axis!r}: {dict(mesh.shape)}")
    n = mesh.shape[axis]
    if q.shape[2] % n:
        raise ValueError(f"sequence {q.shape[2]} not divisible by {axis}={n}")
    spec = P(None, None, axis, None)
    fn = shard_map(
        lambda q_, k_, v_: _ring_attention_local(q_, k_, v_, axis, causal),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_rep=False,
    )
    return fn(q, k, v)


def _dense(x, kernel, bias):
    return jnp.einsum("bsw,wo->bso", x, kernel.astype(x.dtype)) + bias.astype(x.dtype)


def _layernorm_f32(x, p, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) / jnp.sqrt(var + eps) * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def sp_block_apply(
    block_params: Any,
    x: jax.Array,
    mesh: Mesh,
    heads: int,
    axis: str = "seq",
    causal: bool = False,
) -> jax.Array:
    """One CLIP ``ResidualBlock`` with sequence-sharded activations.

    Same math as ``models/clip.py::ResidualBlock`` (pre-LN, fused qkv,
    QuickGELU MLP) — pinned in ``tests/test_sp.py`` — but ``x`` ``[B, S, W]``
    is sharded ``P(None, axis, None)``: LN, the qkv/out/mlp matmuls, and the
    residual adds are all per-token (shard-local); only attention crosses
    tokens, via :func:`ring_attention`. Per-device activation memory is
    ``S/n``, which is the point of SP.

    ``block_params``: the flax param subtree ``{ln_1, attn, ln_2, mlp}``.
    """
    n = mesh.shape[axis]
    if x.shape[1] % n:
        raise ValueError(f"sequence {x.shape[1]} not divisible by {axis}={n}")
    spec = P(None, axis, None)

    def qkv_local(xl):
        h = _layernorm_f32(xl, block_params["ln_1"]["ln"])
        qkv = _dense(h, block_params["attn"]["in_proj"]["kernel"],
                     block_params["attn"]["in_proj"]["bias"])
        return jnp.split(qkv, 3, axis=-1)

    def heads_first(t):
        b, s, w = t.shape
        return t.reshape(b, s, heads, w // heads).transpose(0, 2, 1, 3)

    def per_shard(xl):
        q, k, v = qkv_local(xl)
        out = _ring_attention_local(
            heads_first(q), heads_first(k), heads_first(v), axis, causal
        )
        b, h, s, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        xl = xl + _dense(out, block_params["attn"]["out_proj"]["kernel"],
                         block_params["attn"]["out_proj"]["bias"])
        hdn = _dense(_layernorm_f32(xl, block_params["ln_2"]["ln"]),
                     block_params["mlp"]["c_fc"]["kernel"],
                     block_params["mlp"]["c_fc"]["bias"])
        hdn = hdn * jax.nn.sigmoid(1.702 * hdn)  # QuickGELU
        return xl + _dense(hdn, block_params["mlp"]["c_proj"]["kernel"],
                           block_params["mlp"]["c_proj"]["bias"])

    fn = shard_map(per_shard, mesh=mesh, in_specs=(spec,), out_specs=spec,
                   check_rep=False)
    return fn(x)
