"""Pallas attention for short sequences (CLIP's 77-257 token regime).

At CLIP sequence lengths the classic flash decomposition is the wrong shape
for the TPU: a (batch, head, q-block, k-block) grid degenerates into
thousands of tiny [128, 64] matmuls dominated by per-step overhead, and the
XLA path is bandwidth-bound writing the [B, H, S, S] score matrix to HBM.

This kernel instead keeps the *entire* sequence in VMEM and processes a
group of heads per grid step: one [G*S, D] x [D, S] matmul, an in-register
fp32 softmax (no score matrix ever touches HBM), and one [G*S, S] x [S, D]
matmul. HBM traffic is exactly q+k+v+o.

Grid: (batch, head_groups). Sequence padded to a lane multiple with masked
keys; pad is static.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _short_kernel(
    q_ref,  # [1, G, S, D]
    k_ref,
    v_ref,
    o_ref,
    *,
    scale: float,
    causal: bool,
    valid_len: int,
    group: int,
    s_pad: int,
    d: int,
):
    q = q_ref[0].astype(jnp.float32).reshape(group * s_pad, d)
    k = k_ref[0].astype(jnp.float32)  # [G, S, D]
    v = v_ref[0].astype(jnp.float32)

    # scores per head in the group: [G, S, S]
    qg = q.reshape(group, s_pad, d)
    s = jax.lax.dot_general(
        qg, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale

    col = jax.lax.broadcasted_iota(jnp.int32, (group, s_pad, s_pad), 2)
    mask = col < valid_len
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (group, s_pad, s_pad), 1)
        mask = jnp.logical_and(mask, col <= row)
    s = jnp.where(mask, s, _NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = jnp.where(mask, p, 0.0)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.where(denom == 0.0, 1.0, denom)

    o = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [G, S, D]
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def short_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    head_group: int = 4,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Full-sequence-in-VMEM attention, [B, H, S, D] -> [B, H, S, D]."""
    return _short_forward(q, k, v, causal, head_group, interpret)


def _short_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    head_group: int = 4,
    interpret: Optional[bool] = None,
) -> jax.Array:
    if interpret is None:
        from .dispatch import on_tpu

        interpret = not on_tpu()
    b, h, s, d = q.shape
    scale = 1.0 / (d**0.5)
    s_pad = max(128, ((s + 127) // 128) * 128)
    group = head_group
    while h % group:
        group //= 2
    group = max(1, group)

    pad = s_pad - s
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))

    kernel = functools.partial(
        _short_kernel, scale=scale, causal=causal, valid_len=s, group=group, s_pad=s_pad, d=d
    )
    spec = pl.BlockSpec((1, group, s_pad, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, h // group),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_pad * s_pad * d,
            bytes_accessed=4 * b * h * s_pad * d * q.dtype.itemsize,
            transcendentals=b * h * s_pad * s_pad,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :, :s, :]


def _fwd(q, k, v, causal, head_group, interpret):
    return _short_forward(q, k, v, causal, head_group, interpret), (q, k, v)


def _bwd(causal, head_group, interpret, res, g):
    # backward via XLA recompute — cheap at short sequence lengths
    from .attention import mha_xla

    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: mha_xla(q_, k_, v_, causal=causal), q, k, v)
    return vjp(g)


short_attention.defvjp(_fwd, _bwd)
