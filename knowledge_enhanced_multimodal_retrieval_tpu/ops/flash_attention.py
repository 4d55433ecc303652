"""Pallas TPU flash attention (tiled online-softmax attention).

Forward pass is a Pallas kernel that streams K/V tiles through VMEM with a
running (max, sum, accumulator) online softmax, so the S x S score matrix is
never materialized in HBM. The backward pass recomputes attention with the
XLA reference implementation under ``jax.custom_vjp`` — at CLIP sequence
lengths (77 text / 50-257 vision tokens) recompute is cheaper than storing
attention probabilities, and it keeps the kernel surface small.

Replaces the ``torch.nn.MultiheadAttention`` CUDA path inside the towers the
reference loads via ``clip.load`` (reference ``src/clip/model/clip_model.py:15``).

Layout: [B, H, S, D]. Sequences are padded to the query/key block size with
masked keys; the pad is static so masking folds into the compiled kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _flash_kernel(
    q_ref,  # [1, 1, block_q, D]
    k_ref,  # [1, 1, block_k, D]
    v_ref,  # [1, 1, block_k, D]
    o_ref,  # [1, 1, block_q, D]
    m_scr,  # [block_q, 128] running max (lane-broadcast)
    l_scr,  # [block_q, 128] running sum
    acc_scr,  # [block_q, D]
    *,
    causal: bool,
    scale: float,
    valid_len: int,
    block_q: int,
    block_k: int,
):
    qi = pl.program_id(2)
    kj = pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(kj == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # Skip fully-masked key blocks under the causal mask.
    @pl.when((not causal) or (kj * block_k <= qi * block_q + block_q - 1))
    def _step():
        q = q_ref[0, 0].astype(jnp.float32)  # [bq, D]
        k = k_ref[0, 0].astype(jnp.float32)  # [bk, D]
        v = v_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [bq, bk]

        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + kj * block_k
        mask = col < valid_len
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + qi * block_q
            mask = jnp.logical_and(mask, col <= row)
        s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_scr[:, :1]  # [bq, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # [bq, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        # guard: rows with no unmasked keys keep exp(0)=... masked to 0 below
        p = jnp.exp(s - m_new)  # [bq, bk]
        p = jnp.where(mask, p, 0.0)
        correction = jnp.exp(m_prev - m_new)  # [bq, 1]
        l_new = l_scr[:, :1] * correction + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * correction + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(kj == n_k - 1)
    def _finalize():
        l = l_scr[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)


def _flash_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool,
    block_q: int,
    block_k: int,
    interpret: bool,
) -> jax.Array:
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    scale = 1.0 / (d**0.5)

    pad_q = (-s_q) % block_q
    pad_k = (-s_k) % block_k
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    n_q = qp.shape[2] // block_q
    n_k = kp.shape[2] // block_k

    kernel = functools.partial(
        _flash_kernel,
        causal=causal,
        scale=scale,
        valid_len=s_k,
        block_q=block_q,
        block_k=block_k,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, h, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i, j: (b_, h_, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, i, j: (b_, h_, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, i, j: (b_, h_, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i, j: (b_, h_, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_q * s_k * d,
            bytes_accessed=(qp.size + kp.size + vp.size + qp.size) * q.dtype.itemsize,
            transcendentals=b * h * s_q * s_k,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :, :s_q, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Flash attention, [B, H, S, D] -> [B, H, S, D].

    ``interpret=None`` auto-selects Pallas interpreter mode off-TPU so tests
    run on the CPU mesh.
    """
    if interpret is None:
        from .dispatch import on_tpu

        interpret = not on_tpu()
    return _flash_forward(q, k, v, causal, block_q, block_k, interpret)


def _fwd(q, k, v, causal, block_q, block_k, interpret):
    return flash_attention(q, k, v, causal, block_q, block_k, interpret), (q, k, v)


def _bwd(causal, block_q, block_k, interpret, res, g):
    from .attention import mha_xla

    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: mha_xla(q_, k_, v_, causal=causal), q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
