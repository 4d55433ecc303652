"""Vision q8 kernel-interior experiments (VERDICT r3 #3).

The vision tower's per-layer cost (~2.2-2.4 ms at [64x272, 1024] int8) sits
~1.55x over the pure-MATMUL roofline (1.50 ms: qkv 0.32 + out 0.11 + interior
0.22 at half-MXU k=64 + mlp 0.85) and the gap is kernel-INTERIOR (tiling was
measured exhausted; whole-layer fusion that removes the 71 MB/layer residual
HBM round-trip measured wall-time NEUTRAL — the layer is compute-bound).
Remaining suspects are the VPU chains:

- attention: 272x272 f32 softmax per (seq, head) = 75.7M transcendentals;
- MLP: QuickGELU sigmoid + per-chunk dynamic requantization over the
  71M-element FF tensor.

This script times ISOLATED interior variants at production vision shapes
(batch 64, s_pad 272, width 1024, ff 4096, heads 16) with the repo's
serially-dependent scan timing, printing medians of --reps runs:

  attention: production loop vs no-max-subtract softmax diagnostic
  mlp:       production vs no-gelu/no-requant diagnostics (numerics differ —
             DIAGNOSTIC ONLY, quantifies the VPU share)
  layer:     per-block pair vs whole-layer (vmem_limit_bytes raised)

NOTE a batched-heads dot_general attention interior is NOT among the
variants: Mosaic cannot lower the lane-dim-splitting reshape
[tile, width] -> [nseq, s, heads, hd] ("infer-vector-layout: unsupported
shape cast"), so the per-head loop over 64-lane slices is the only
formulation that compiles; its matmuls run at half MXU utilization
(contraction = head_dim 64) by construction.

Run: python scripts/profile_vision_interior.py [--reps 7] [--iters 8]
"""

from __future__ import annotations

import argparse
import functools
import statistics
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import _time
from knowledge_enhanced_multimodal_retrieval_tpu.ops import fused_block as FB


# ---------------------------------------------------------------------------
# attention interior variants
# ---------------------------------------------------------------------------


def _interior_nomax(qkv, *, tile, seq_len, mask_len, heads, causal, out_dtype):
    """Production per-head loop WITHOUT the max-subtract softmax pass.

    DIAGNOSTIC ONLY (numerically unsafe for |logits| > ~80): quantifies the
    cost of the row-max reduce + subtract over the 75.7M-score tensor."""
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
        e = jnp.exp(s)  # no max-subtract
        p = (e / jnp.sum(e, -1, keepdims=True)).astype(qkv.dtype)
        o = jax.lax.dot_general(
            p, v_h, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        outs.append(o.reshape(tile, head_dim).astype(out_dtype))
    return jnp.concatenate(outs, axis=-1)


def _attn_kernel_variant(
    x_ref, g_ref, b_ref, wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, so_ref, bo_ref, o_ref,
    *, tile, seq_len, mask_len, heads, eps, causal, interior,
):
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    h = ((xf - mu) * jax.lax.rsqrt(var + eps)) * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    qkv = FB._q8_matmul(h, wqkv_ref[:], sqkv_ref[:]) + bqkv_ref[:].astype(jnp.float32)
    qkv = qkv.astype(x.dtype)
    attn = interior(
        qkv, tile=tile, seq_len=seq_len, mask_len=mask_len, heads=heads,
        causal=causal, out_dtype=x.dtype,
    )
    out = FB._q8_matmul(attn.astype(jnp.float32), wo_ref[:], so_ref[:]) + bo_ref[:].astype(jnp.float32)
    o_ref[:] = x + out.astype(x.dtype)


def attn_q8_variant(x, lp, *, seq_len, heads, mask_len, tile, interior, causal=False):
    width = lp["wqkv"].shape[0]
    n = x.shape[0]
    kern = functools.partial(
        _attn_kernel_variant, tile=tile, seq_len=seq_len, mask_len=mask_len,
        heads=heads, eps=1e-5, causal=causal, interior=interior,
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
    )(x, row2(lp["ln1_scale"]), row2(lp["ln1_bias"]), lp["wqkv"], lp["wqkv_s"],
      row2(lp["bqkv"]), lp["wo"], lp["wo_s"], row2(lp["bo"]))


# ---------------------------------------------------------------------------
# MLP diagnostics (numerics differ — measure the VPU share, don't ship)
# ---------------------------------------------------------------------------


def _mlp_kernel_diag(
    x_ref, g_ref, b_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
    o_ref, acc_ref, *, n_chunks, eps, gelu, requant,
):
    ff = w1_ref.shape[1]
    ck = ff // n_chunks
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    h = ((xf - mu) * jax.lax.rsqrt(var + eps)) * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    hq, hr = FB._quantize_rows(h)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for c in range(n_chunks):
        f = jax.lax.dot_general(
            hq, w1_ref[:, c * ck:(c + 1) * ck], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * hr * s1_ref[:, c * ck:(c + 1) * ck]
        f = f + b1_ref[:, c * ck:(c + 1) * ck].astype(jnp.float32)
        if gelu:
            f = f * jax.nn.sigmoid(1.702 * f)
        if requant:
            fq, fr = FB._quantize_rows(f)
            part = jax.lax.dot_general(
                fq, w2_ref[c * ck:(c + 1) * ck, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * fr * s2_ref[:]
        else:
            part = jax.lax.dot_general(
                f.astype(jnp.bfloat16), w2_ref[c * ck:(c + 1) * ck, :].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ) * s2_ref[:]
        acc_ref[:] += part
    o_ref[:] = x + (acc_ref[:] + b2_ref[:].astype(jnp.float32)).astype(x.dtype)


def mlp_q8_diag(x, lp, *, tile, gelu, requant, n_chunks=None):
    width, ff = lp["w1"].shape
    n = x.shape[0]
    n_chunks = FB.default_mlp_chunks(ff) if n_chunks is None else n_chunks
    kern = functools.partial(
        _mlp_kernel_diag, n_chunks=n_chunks, eps=1e-5, gelu=gelu, requant=requant
    )
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
    )(x, row2(lp["ln2_scale"]), row2(lp["ln2_bias"]), lp["w1"], lp["w1_s"],
      row2(lp["b1"]), lp["w2"], lp["w2_s"], row2(lp["b2"]))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--reps", type=int, default=7)
    args = p.parse_args()

    from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
    from knowledge_enhanced_multimodal_retrieval_tpu.models.fast_encode import (
        _SUBLANE,
        _TILE_TARGET,
        make_vision_plan,
    )

    model = M.build_model("ViT-L/14", dtype=jnp.bfloat16)
    arch = model.arch
    params = M.init_params(model, jax.random.PRNGKey(0))
    plan = make_vision_plan(params, quantize="int8")
    lp = plan["layers"][0]
    width, heads = arch.vision_width, arch.heads_vision
    s = arch.grid_size**2 + 1
    s_pad = -(-s // _SUBLANE) * _SUBLANE
    tile = FB.default_attention_tile(s_pad, target=_TILE_TARGET)
    rng = np.random.default_rng(0)
    x0 = [jnp.asarray(rng.standard_normal((args.batch * s_pad, width)) * 0.02, jnp.bfloat16)]
    dummy = jnp.zeros((8, 8), jnp.bfloat16)

    def run(label, fn):
        outs = []
        for _ in range(args.reps):
            outs.append(_time(fn, lp, x0, dummy, dummy, iters=args.iters))
        med = statistics.median(outs)
        print(f"{label:34s} median {med * 1e3:7.3f} ms  (spread {min(outs)*1e3:.3f}-{max(outs)*1e3:.3f})")
        return med

    def mk_attn(interior):
        def f(lp, x, cimg, ctxt):
            y = attn_q8_variant(
                x, lp, seq_len=s_pad, heads=heads, mask_len=s, tile=tile,
                interior=interior,
            )
            return y[:, :20].astype(jnp.float32), (y[:, :20] * 100).astype(jnp.int32)
        return f

    run("attn_q8 per-head loop (prod)", mk_attn(FB._attention_interior))
    run("attn_q8 no-max-subtract softmax", mk_attn(_interior_nomax))

    def mk_mlp(gelu, requant):
        def f(lp, x, cimg, ctxt):
            y = mlp_q8_diag(x, lp, tile=256, gelu=gelu, requant=requant)
            return y[:, :20].astype(jnp.float32), (y[:, :20] * 100).astype(jnp.int32)
        return f

    run("mlp_q8 prod (gelu+requant)", mk_mlp(True, True))
    run("mlp_q8 no requant (w8a16 mm2)", mk_mlp(True, False))
    run("mlp_q8 no gelu no requant", mk_mlp(False, False))

    # whole layer: per-block pair vs the single-kernel fusion (raised VMEM)
    def per_block(lp, x, cimg, ctxt):
        y = FB.fused_attention_block_q8(
            x, lp["ln1_scale"], lp["ln1_bias"], lp["wqkv"], lp["wqkv_s"],
            lp["bqkv"], lp["wo"], lp["wo_s"], lp["bo"], seq_len=s_pad,
            heads=heads, mask_len=s, tile=tile, causal=False)
        y = FB.fused_mlp_block_q8(
            y, lp["ln2_scale"], lp["ln2_bias"], lp["w1"], lp["w1_s"], lp["b1"],
            lp["w2"], lp["w2_s"], lp["b2"], tile=256)
        return y[:, :20].astype(jnp.float32), (y[:, :20] * 100).astype(jnp.int32)

    def whole_layer(lp, x, cimg, ctxt):
        y = FB.fused_layer_q8(
            x, lp["ln1_scale"], lp["ln1_bias"], lp["wqkv"], lp["wqkv_s"],
            lp["bqkv"], lp["wo"], lp["wo_s"], lp["bo"], lp["ln2_scale"],
            lp["ln2_bias"], lp["w1"], lp["w1_s"], lp["b1"], lp["w2"],
            lp["w2_s"], lp["b2"], seq_len=s_pad, heads=heads, mask_len=s,
            tile=tile, causal=False, vmem_limit_bytes=48 * 2**20)
        return y[:, :20].astype(jnp.float32), (y[:, :20] * 100).astype(jnp.int32)

    run("layer per-block pair (prod)", per_block)
    run("layer whole-kernel (vmem 48MiB)", whole_layer)


if __name__ == "__main__":
    main()
