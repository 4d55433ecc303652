"""Fused transformer-block Pallas kernels (serving fast path).

The CLIP towers are HBM-bandwidth-bound at serving shapes on v5e: the XLA
path round-trips every intermediate ([N, 4W] MLP activations, qkv, attention
layouts) through HBM, ~3 GB per L/14 text forward at batch 256. These two
kernels keep a residual-block's intermediates in VMEM and stream only the
residual stream:

- ``fused_attention_block`` — LN1 -> qkv projection -> per-sequence causal
  attention (block-diagonal within the row tile, heads unrolled) -> output
  projection -> residual add. Measured 0.33 ms vs 0.64 ms XLA per L/14 text
  layer at [8192, 768] bf16 (the attention-layout transposes never touch HBM).
- ``fused_mlp_block`` — LN2 -> c_fc -> QuickGELU -> c_proj -> residual add,
  with the [tile, 4W] intermediate chunked over the FF axis so weights and
  activations fit the 16 MB VMEM budget.

Both are inference-only (no VJP; the trainer keeps the flax/XLA path, which
autodiffs and remats). Reference semantics match the OpenAI
``ResidualAttentionBlock`` the reference loads at
``src/clip/model/clip_model.py:15-44``: pre-LN (fp32), fused in_proj, scaled
dot-product attention with additive causal mask, QuickGELU.

Layout contract: ``x`` is ``[num_rows, width]`` with whole sequences of
``seq_len`` rows stored contiguously (row r belongs to sequence r // seq_len)
and ``num_rows`` divisible by the row tile. ``pad_rows``/``unpad_rows`` below
handle arbitrary batch sizes. ``mask_len`` masks out trailing key positions
of each sequence (for sequence lengths padded up to a sublane multiple).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUBLANE = 16  # bf16 sublane multiple


def _check_common(x, width: int):
    if x.ndim != 2:
        raise ValueError(f"x must be [rows, width], got {x.shape}")
    if x.shape[1] != width:
        raise ValueError(f"width mismatch: x {x.shape} vs weights {width}")
    if width % _LANE != 0:
        raise ValueError(f"width must be a multiple of {_LANE}, got {width}")


def default_mlp_chunks(ff: int) -> int:
    """Most FF chunks that stay lane-aligned (chunk size a multiple of 128)."""
    for c in (8, 6, 4, 3, 2):
        if ff % c == 0 and (ff // c) % _LANE == 0:
            return c
    return 1


def default_attention_tile(seq_len: int, target: int = 256) -> int:
    """Largest multiple of ``seq_len`` that is sublane-aligned and <= target."""
    if seq_len % _SUBLANE == 0 and seq_len <= target:
        return seq_len * max(1, target // seq_len)
    # seq_len not sublane-aligned: the tile must still hold whole sequences;
    # use lcm(seq_len, sublane) capped at a few sequences
    tile = seq_len
    while tile % _SUBLANE or tile < target // 2:
        tile += seq_len
    return tile


# ---------------------------------------------------------------------------
# Attention block
# ---------------------------------------------------------------------------


def _attention_interior(
    qkv: jax.Array, *, tile: int, seq_len: int, mask_len: int, heads: int,
    causal: bool, out_dtype,
) -> jax.Array:
    """Per-sequence attention over row-contiguous sequences: [tile, 3W] -> [tile, W].

    Reshapes each head to ``[tile // seq_len, seq_len, head_dim]`` and runs a
    batched ``seq x seq`` score/softmax — the straightforward ``tile x tile``
    block-diagonal layout costs ``tile / seq_len`` times more softmax VPU
    work (8x at the 32-token serving bucket), which dominated the kernel.
    """
    width = qkv.shape[1] // 3
    head_dim = width // heads
    nseq = tile // seq_len
    row = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 1)
    ok = col < mask_len
    if causal:
        ok &= col <= row
    neg = jnp.float32(-1e9)
    scale = jnp.float32(1.0 / np.sqrt(head_dim))
    bdims = (((2,), (2,)), ((0,), (0,)))
    outs = []
    for hh in range(heads):
        q_h = qkv[:, hh * head_dim:(hh + 1) * head_dim].reshape(nseq, seq_len, head_dim)
        k_h = qkv[:, width + hh * head_dim:width + (hh + 1) * head_dim].reshape(nseq, seq_len, head_dim)
        v_h = qkv[:, 2 * width + hh * head_dim:2 * width + (hh + 1) * head_dim].reshape(nseq, seq_len, head_dim)
        s = jax.lax.dot_general(q_h, k_h, bdims, preferred_element_type=jnp.float32)
        s = jnp.where(ok, s * scale, neg)
        s = s - jnp.max(s, -1, keepdims=True)
        e = jnp.exp(s)
        p = (e / jnp.sum(e, -1, keepdims=True)).astype(qkv.dtype)
        o = jax.lax.dot_general(
            p, v_h, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        outs.append(o.reshape(tile, head_dim).astype(out_dtype))
    return jnp.concatenate(outs, axis=-1)


def _attention_block_kernel(
    x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, o_ref,
    *, tile: int, seq_len: int, mask_len: int, heads: int, eps: float, causal: bool,
):
    width = x_ref.shape[1]
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    h = ((xf - mu) * jax.lax.rsqrt(var + eps)) * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    h = h.astype(x.dtype)
    qkv = jnp.dot(h, wqkv_ref[:], preferred_element_type=jnp.float32) + bqkv_ref[:].astype(jnp.float32)
    qkv = qkv.astype(x.dtype)
    attn = _attention_interior(
        qkv, tile=tile, seq_len=seq_len, mask_len=mask_len, heads=heads,
        causal=causal, out_dtype=x.dtype,
    )
    out = jnp.dot(attn, wo_ref[:], preferred_element_type=jnp.float32) + bo_ref[:].astype(jnp.float32)
    o_ref[:] = x + out.astype(x.dtype)


def fused_attention_block(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    wqkv: jax.Array,
    bqkv: jax.Array,
    wo: jax.Array,
    bo: jax.Array,
    *,
    seq_len: int,
    heads: int,
    mask_len: Optional[int] = None,
    tile: Optional[int] = None,
    eps: float = 1e-5,
    causal: bool = True,
    interpret: bool = False,
    vmem_limit_bytes: Optional[int] = None,
) -> jax.Array:
    """x + out_proj(attention(LN(x))) over row-contiguous sequences.

    ``causal=True`` is the text tower; ``causal=False`` (bidirectional) is
    the vision tower."""
    width = wqkv.shape[0]
    _check_common(x, width)
    n = x.shape[0]
    tile = tile or default_attention_tile(seq_len)
    if tile % seq_len or n % tile:
        raise ValueError(f"rows {n} / tile {tile} / seq_len {seq_len} incompatible")
    if width % heads or (width // heads) % 2:
        raise ValueError(f"width {width} not divisible into {heads} even heads")
    mask_len = seq_len if mask_len is None else mask_len
    kern = functools.partial(
        _attention_block_kernel,
        tile=tile, seq_len=seq_len, mask_len=mask_len, heads=heads, eps=eps,
        causal=causal,
    )
    row2 = lambda a: a.reshape(1, -1)
    return pl.pallas_call(
        kern,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((width, 3 * width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((width, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, width), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * width * 4 * width + heads * 4 * n * seq_len * (width // heads),
            bytes_accessed=2 * n * width * 2 + 4 * width * width * 2,
            transcendentals=n * seq_len * heads,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_bytes),
        interpret=interpret,
    )(x, row2(ln_scale), row2(ln_bias), wqkv, row2(bqkv), wo, row2(bo))


# ---------------------------------------------------------------------------
# MLP block
# ---------------------------------------------------------------------------


def _mlp_block_kernel(
    x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, acc_ref,
    *, n_chunks: int, eps: float,
):
    ff = w1_ref.shape[1]
    ck = ff // n_chunks
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    h = ((xf - mu) * jax.lax.rsqrt(var + eps)) * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    h = h.astype(x.dtype)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for c in range(n_chunks):
        f = jnp.dot(h, w1_ref[:, c * ck:(c + 1) * ck], preferred_element_type=jnp.float32)
        f = f + b1_ref[:, c * ck:(c + 1) * ck].astype(jnp.float32)
        f = (f * jax.nn.sigmoid(1.702 * f)).astype(x.dtype)  # QuickGELU
        acc_ref[:] += jnp.dot(f, w2_ref[c * ck:(c + 1) * ck, :], preferred_element_type=jnp.float32)
    o_ref[:] = x + (acc_ref[:] + b2_ref[:].astype(jnp.float32)).astype(x.dtype)


def fused_mlp_block(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    *,
    tile: int = 256,
    n_chunks: Optional[int] = None,
    eps: float = 1e-5,
    interpret: bool = False,
    vmem_limit_bytes: Optional[int] = None,
) -> jax.Array:
    """x + c_proj(quick_gelu(c_fc(LN(x)))); FF axis chunked for VMEM."""
    width, ff = w1.shape
    _check_common(x, width)
    n = x.shape[0]
    n_chunks = default_mlp_chunks(ff) if n_chunks is None else n_chunks
    if n % tile:
        raise ValueError(f"rows {n} not divisible by tile {tile}")
    if ff % n_chunks or (ff // n_chunks) % _LANE:
        raise ValueError(f"ff {ff} must split into {n_chunks} lane-aligned chunks")
    kern = functools.partial(_mlp_block_kernel, n_chunks=n_chunks, eps=eps)
    row2 = lambda a: a.reshape(1, -1)
    return pl.pallas_call(
        kern,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((width, ff), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ff), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ff, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, width), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile, width), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * width * ff * 2,
            bytes_accessed=2 * n * width * 2 + 2 * width * ff * 2,
            transcendentals=n * ff,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_bytes),
        interpret=interpret,
    )(x, row2(ln_scale), row2(ln_bias), w1, row2(b1), w2, row2(b2))


# ---------------------------------------------------------------------------
# int8 (W8A8 dynamic) variants — serving MXU runs int8 at ~2x bf16
# ---------------------------------------------------------------------------
#
# Quantization scheme (measured 345 TOP/s int8 vs 176 TFLOP/s bf16 on v5e):
# weights are symmetric per-output-channel int8 (``w ~= w_q * s_col``,
# ``s_col = max_k |w[k, c]| / 127``, packed once at plan build); activations
# are symmetric per-row dynamic int8 computed in-kernel after the LayerNorm
# (``h ~= h_q * r_row``). The int32 MXU accumulator is rescaled by the rank-1
# outer product ``r_row * s_col`` — exact up to the two rounding steps. The
# attention interior (scores, softmax, p@v) stays bf16: it is tiny next to
# the projections and quantizing it would hurt ranking fidelity for nothing.


def quantize_weight(w: jax.Array) -> tuple:
    """Symmetric per-output-channel int8: returns (w_q [K, C] int8, s [1, C] f32)."""
    w = jnp.asarray(w, jnp.float32)
    s = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    return jnp.round(w / s).astype(jnp.int8), s


def _quantize_rows(h: jax.Array) -> tuple:
    """Symmetric per-row dynamic int8 for f32 activations: (h_q int8, r [N, 1] f32)."""
    r = jnp.max(jnp.abs(h), axis=-1, keepdims=True) / 127.0
    r = jnp.maximum(r, 1e-12)
    return jnp.round(h / r).astype(jnp.int8), r


def _q8_matmul(h: jax.Array, wq, ws) -> jax.Array:
    """f32 activations x int8 weights -> f32, via dynamic row quantization."""
    hq, r = _quantize_rows(h)
    acc = jax.lax.dot_general(hq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * r * ws


def _attn_half_q8(
    x, g, c, wqkv_q, wqkv_s, bqkv, wo_q, wo_s, bo,
    *, tile, seq_len, mask_len, heads, eps, causal,
):
    """LN -> int8 qkv-proj -> attention -> int8 out-proj -> residual.

    The ONE implementation of the q8 attention half, shared by the block
    kernel, the whole-layer kernel, and the XLA reference: quantized paths
    amplify ulp-level op-order differences into whole rounding steps, so
    keeping kernels and oracle in sync requires a single body."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    h = ((xf - mu) * jax.lax.rsqrt(var + eps)) * g.astype(jnp.float32) + c.astype(jnp.float32)
    qkv = _q8_matmul(h, wqkv_q, wqkv_s) + bqkv.astype(jnp.float32)
    qkv = qkv.astype(x.dtype)
    attn = _attention_interior(
        qkv, tile=tile, seq_len=seq_len, mask_len=mask_len, heads=heads,
        causal=causal, out_dtype=x.dtype,
    )
    out = _q8_matmul(attn.astype(jnp.float32), wo_q, wo_s) + bo.astype(jnp.float32)
    return x + out.astype(x.dtype)


def _mlp_chunk_views(w1_q, w1_s, b1, w2_q, n_chunks):
    """Split the MLP operands into per-chunk views along the FF axis.

    Kernels call this on *refs* (Mosaic loads each window with a clean
    layout — slicing an already-loaded row vector yields an offset layout
    it cannot broadcast); the XLA reference calls it on values."""
    ff = w1_q.shape[1]
    ck = ff // n_chunks
    return [
        (
            w1_q[:, i * ck:(i + 1) * ck],
            w1_s[:, i * ck:(i + 1) * ck],
            b1[:, i * ck:(i + 1) * ck],
            w2_q[i * ck:(i + 1) * ck, :],
        )
        for i in range(n_chunks)
    ]


def _mlp_half_q8(x, g, c, chunks, w2_s, b2, *, eps, acc_ref=None):
    """LN -> int8 c_fc -> QuickGELU -> int8 c_proj -> residual, FF-chunked
    with per-chunk activation requantization. The ONE implementation of the
    q8 MLP half (see :func:`_attn_half_q8` for why). ``chunks`` comes from
    :func:`_mlp_chunk_views`; kernels pass their f32 VMEM scratch as
    ``acc_ref`` (relieves register pressure at row tile 512), the XLA
    reference accumulates in a value."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    h = ((xf - mu) * jax.lax.rsqrt(var + eps)) * g.astype(jnp.float32) + c.astype(jnp.float32)
    hq, hr = _quantize_rows(h)
    if acc_ref is not None:
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc = None
    for w1_c, s1_c, b1_c, w2_c in chunks:
        f = jax.lax.dot_general(
            hq, w1_c, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32) * hr * s1_c
        f = f + b1_c.astype(jnp.float32)
        f = f * jax.nn.sigmoid(1.702 * f)  # QuickGELU, f32
        fq, fr = _quantize_rows(f)
        part = jax.lax.dot_general(
            fq, w2_c, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32) * fr * w2_s
        if acc_ref is not None:
            acc_ref[:] += part
        else:
            acc = part if acc is None else acc + part
    if acc_ref is not None:
        acc = acc_ref[:]
    return x + (acc + b2.astype(jnp.float32)).astype(x.dtype)


def _attention_block_q8_kernel(
    x_ref, g_ref, b_ref, wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, so_ref, bo_ref,
    o_ref,
    *, tile: int, seq_len: int, mask_len: int, heads: int, eps: float, causal: bool,
):
    o_ref[:] = _attn_half_q8(
        x_ref[:], g_ref[:], b_ref[:], wqkv_ref[:], sqkv_ref[:], bqkv_ref[:],
        wo_ref[:], so_ref[:], bo_ref[:],
        tile=tile, seq_len=seq_len, mask_len=mask_len, heads=heads, eps=eps,
        causal=causal,
    )


def fused_attention_block_q8(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    wqkv_q: jax.Array,
    wqkv_s: jax.Array,
    bqkv: jax.Array,
    wo_q: jax.Array,
    wo_s: jax.Array,
    bo: jax.Array,
    *,
    seq_len: int,
    heads: int,
    mask_len: Optional[int] = None,
    tile: Optional[int] = None,
    eps: float = 1e-5,
    causal: bool = True,
    interpret: bool = False,
    vmem_limit_bytes: Optional[int] = None,
) -> jax.Array:
    """int8-projection variant of :func:`fused_attention_block`."""
    width = wqkv_q.shape[0]
    _check_common(x, width)
    n = x.shape[0]
    tile = tile or default_attention_tile(seq_len)
    if tile % seq_len or n % tile:
        raise ValueError(f"rows {n} / tile {tile} / seq_len {seq_len} incompatible")
    mask_len = seq_len if mask_len is None else mask_len
    kern = functools.partial(
        _attention_block_q8_kernel,
        tile=tile, seq_len=seq_len, mask_len=mask_len, heads=heads, eps=eps,
        causal=causal,
    )
    row2 = lambda a: a.reshape(1, -1)
    return pl.pallas_call(
        kern,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((width, 3 * width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((width, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, width), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=n * width * 4 * width + heads * 4 * n * seq_len * (width // heads),
            bytes_accessed=2 * n * width * 2 + 4 * width * width,
            transcendentals=n * seq_len * heads,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_bytes),
        interpret=interpret,
    )(x, row2(ln_scale), row2(ln_bias), wqkv_q, wqkv_s, row2(bqkv), wo_q, wo_s, row2(bo))


def _mlp_block_q8_kernel(
    x_ref, g_ref, b_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
    o_ref, acc_ref,
    *, n_chunks: int, eps: float,
):
    chunks = [
        (w1_c[:], s1_c[:], b1_c[:], w2_c[:])
        for w1_c, s1_c, b1_c, w2_c in _mlp_chunk_views(w1_ref, s1_ref, b1_ref, w2_ref, n_chunks)
    ]
    o_ref[:] = _mlp_half_q8(
        x_ref[:], g_ref[:], b_ref[:], chunks, s2_ref[:], b2_ref[:],
        eps=eps, acc_ref=acc_ref,
    )


def fused_mlp_block_q8(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    w1_q: jax.Array,
    w1_s: jax.Array,
    b1: jax.Array,
    w2_q: jax.Array,
    w2_s: jax.Array,
    b2: jax.Array,
    *,
    tile: int = 256,
    n_chunks: Optional[int] = None,
    eps: float = 1e-5,
    interpret: bool = False,
    vmem_limit_bytes: Optional[int] = None,
) -> jax.Array:
    """int8 variant of :func:`fused_mlp_block` (per-chunk activation requant)."""
    width, ff = w1_q.shape
    _check_common(x, width)
    n = x.shape[0]
    n_chunks = default_mlp_chunks(ff) if n_chunks is None else n_chunks
    if n % tile:
        raise ValueError(f"rows {n} not divisible by tile {tile}")
    if ff % n_chunks or (ff // n_chunks) % _LANE:
        raise ValueError(f"ff {ff} must split into {n_chunks} lane-aligned chunks")
    kern = functools.partial(_mlp_block_q8_kernel, n_chunks=n_chunks, eps=eps)
    row2 = lambda a: a.reshape(1, -1)
    return pl.pallas_call(
        kern,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((width, ff), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ff), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ff), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ff, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, width), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile, width), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * width * ff,
            bytes_accessed=2 * n * width * 2 + 2 * width * ff,
            transcendentals=n * ff,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_bytes),
        interpret=interpret,
    )(x, row2(ln_scale), row2(ln_bias), w1_q, w1_s, row2(b1), w2_q, w2_s, row2(b2))


def _layer_q8_kernel(
    x_ref, g1_ref, c1_ref, wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, so_ref, bo_ref,
    g2_ref, c2_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
    o_ref, acc_ref,
    *, tile: int, seq_len: int, mask_len: int, heads: int, n_chunks: int,
    eps: float, causal: bool,
):
    y = _attn_half_q8(
        x_ref[:], g1_ref[:], c1_ref[:], wqkv_ref[:], sqkv_ref[:], bqkv_ref[:],
        wo_ref[:], so_ref[:], bo_ref[:],
        tile=tile, seq_len=seq_len, mask_len=mask_len, heads=heads, eps=eps,
        causal=causal,
    )
    chunks = [
        (w1_c[:], s1_c[:], b1_c[:], w2_c[:])
        for w1_c, s1_c, b1_c, w2_c in _mlp_chunk_views(w1_ref, s1_ref, b1_ref, w2_ref, n_chunks)
    ]
    o_ref[:] = _mlp_half_q8(
        y, g2_ref[:], c2_ref[:], chunks, s2_ref[:], b2_ref[:],
        eps=eps, acc_ref=acc_ref,
    )


def fused_layer_q8(
    x: jax.Array,
    ln1_scale: jax.Array,
    ln1_bias: jax.Array,
    wqkv_q: jax.Array,
    wqkv_s: jax.Array,
    bqkv: jax.Array,
    wo_q: jax.Array,
    wo_s: jax.Array,
    bo: jax.Array,
    ln2_scale: jax.Array,
    ln2_bias: jax.Array,
    w1_q: jax.Array,
    w1_s: jax.Array,
    b1: jax.Array,
    w2_q: jax.Array,
    w2_s: jax.Array,
    b2: jax.Array,
    *,
    seq_len: int,
    heads: int,
    mask_len: Optional[int] = None,
    tile: Optional[int] = None,
    n_chunks: Optional[int] = None,
    eps: float = 1e-5,
    causal: bool = True,
    interpret: bool = False,
    vmem_limit_bytes: Optional[int] = None,
) -> jax.Array:
    """A whole residual layer (attention block + MLP block) in ONE kernel.

    int8 weights make the full layer's weights ~7 MB at L/14 text scale, so
    both halves fit VMEM together and the residual stream crosses HBM once
    per layer instead of twice — the bf16 kernels cannot do this (14 MB of
    weights plus activations exceeds the *default* 16 MB scoped-VMEM budget).

    ``vmem_limit_bytes`` raises Mosaic's scoped-VMEM ceiling (v5e has 128 MiB
    physical VMEM; XLA's default scoped limit is ~16 MiB). Vision-scale
    layers (width 1024, ff 4096: ~12 MiB int8 weights) need ~2x the default
    to keep all four projections resident — see ``fast_encode._apply_layers``.
    """
    width = wqkv_q.shape[0]
    _check_common(x, width)
    ff = w1_q.shape[1]
    n = x.shape[0]
    tile = tile or default_attention_tile(seq_len)
    if tile % seq_len or n % tile:
        raise ValueError(f"rows {n} / tile {tile} / seq_len {seq_len} incompatible")
    mask_len = seq_len if mask_len is None else mask_len
    n_chunks = default_mlp_chunks(ff) if n_chunks is None else n_chunks
    if ff % n_chunks or (ff // n_chunks) % _LANE:
        raise ValueError(f"ff {ff} must split into {n_chunks} lane-aligned chunks")
    kern = functools.partial(
        _layer_q8_kernel,
        tile=tile, seq_len=seq_len, mask_len=mask_len, heads=heads,
        n_chunks=n_chunks, eps=eps, causal=causal,
    )
    row2 = lambda a: a.reshape(1, -1)
    fixed = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM),
            fixed((1, width)), fixed((1, width)),
            fixed((width, 3 * width)), fixed((1, 3 * width)), fixed((1, 3 * width)),
            fixed((width, width)), fixed((1, width)), fixed((1, width)),
            fixed((1, width)), fixed((1, width)),
            fixed((width, ff)), fixed((1, ff)), fixed((1, ff)),
            fixed((ff, width)), fixed((1, width)), fixed((1, width)),
        ],
        out_specs=pl.BlockSpec((tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, width), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile, width), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n * width * (4 * width + 2 * ff) + heads * 4 * n * seq_len * (width // heads),
            bytes_accessed=2 * n * width * 2 + width * (4 * width + 2 * ff),
            transcendentals=n * (seq_len * heads + ff),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_bytes),
        interpret=interpret,
    )(
        x, row2(ln1_scale), row2(ln1_bias), wqkv_q, wqkv_s, row2(bqkv),
        wo_q, wo_s, row2(bo), row2(ln2_scale), row2(ln2_bias),
        w1_q, w1_s, row2(b1), w2_q, w2_s, row2(b2),
    )


def attention_block_q8_reference(
    x, ln_scale, ln_bias, wqkv_q, wqkv_s, bqkv, wo_q, wo_s, bo,
    *, seq_len, heads, mask_len=None, eps: float = 1e-5, causal: bool = True,
):
    """XLA oracle — literally the same ``_attn_half_q8`` the kernels run.
    Independence from the kernels is covered by the fp-proximity and
    flax-cosine tests."""
    mask_len = seq_len if mask_len is None else mask_len
    row2 = lambda a: a.reshape(1, -1)
    return _attn_half_q8(
        x, ln_scale, ln_bias, wqkv_q, wqkv_s, row2(bqkv), wo_q, wo_s, row2(bo),
        tile=x.shape[0], seq_len=seq_len, mask_len=mask_len, heads=heads,
        eps=eps, causal=causal,
    )


def mlp_block_q8_reference(
    x, ln_scale, ln_bias, w1_q, w1_s, b1, w2_q, w2_s, b2,
    *, n_chunks: Optional[int] = None, eps: float = 1e-5
):
    """XLA oracle — the same ``_mlp_half_q8`` the kernels run (including
    per-FF-chunk requantization; the chunk count changes the dynamic scales
    slightly). Exact kernel equality still requires matching the kernel's
    row grouping — cross-tile f32 ulps can flip int8 roundings."""
    ff = w1_q.shape[1]
    n_chunks = default_mlp_chunks(ff) if n_chunks is None else n_chunks
    row2 = lambda a: a.reshape(1, -1)
    chunks = _mlp_chunk_views(w1_q, w1_s, row2(b1), w2_q, n_chunks)
    return _mlp_half_q8(x, ln_scale, ln_bias, chunks, w2_s, row2(b2), eps=eps)


# ---------------------------------------------------------------------------
# XLA reference implementations (CPU path + oracles for the kernels)
# ---------------------------------------------------------------------------


def _ln_ref(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) * scale + bias).astype(x.dtype)


def attention_block_reference(
    x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, *, seq_len, heads,
    mask_len=None, eps: float = 1e-5, causal: bool = True,
):
    """XLA oracle with identical semantics (row-contiguous sequences)."""
    width = wqkv.shape[0]
    head_dim = width // heads
    mask_len = seq_len if mask_len is None else mask_len
    h = _ln_ref(x, ln_scale, ln_bias, eps)
    qkv = (h @ wqkv.astype(x.dtype)) + bqkv.astype(x.dtype)
    qkv = qkv.reshape(-1, seq_len, 3, heads, head_dim)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / np.sqrt(head_dim)
    rr = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 1)
    ok = cc < mask_len
    if causal:
        ok &= cc <= rr
    logits = jnp.where(ok, logits, -1e9)
    p = jax.nn.softmax(logits, -1).astype(x.dtype)
    a = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3).reshape(-1, width)
    return x + (a @ wo.astype(x.dtype) + bo.astype(x.dtype))


def mlp_block_reference(x, ln_scale, ln_bias, w1, b1, w2, b2, *, eps: float = 1e-5):
    h = _ln_ref(x, ln_scale, ln_bias, eps)
    f = h @ w1.astype(x.dtype) + b1.astype(x.dtype)
    f = f * jax.nn.sigmoid(1.702 * f.astype(jnp.float32)).astype(x.dtype)
    return x + (f @ w2.astype(x.dtype) + b2.astype(x.dtype))


# ---------------------------------------------------------------------------
# Row padding helpers
# ---------------------------------------------------------------------------


def pad_rows(x: jax.Array, multiple: int) -> jax.Array:
    """Zero-pad the leading axis to a multiple (whole-sequence granularity)."""
    n = x.shape[0]
    rem = n % multiple
    if rem == 0:
        return x
    return jnp.pad(x, ((0, multiple - rem), (0, 0)))


def unpad_rows(x: jax.Array, n: int) -> jax.Array:
    return x[:n]
