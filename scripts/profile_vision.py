"""Break down vision-tower encode: embed overhead, per-layer cost, per-block
kernel cost at ViT-L/14 vision shapes (batch 64 -> [64*260, 1024] rows).

Uses bench.py's serially-dependent scan timing (honest on the relay chip).
Run: python scripts/profile_vision.py [--batch 64] [--iters 8]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _time
from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
from knowledge_enhanced_multimodal_retrieval_tpu.models.fast_encode import (
    _SUBLANE,
    _TILE_TARGET,
    encode_image_fast,
    make_vision_plan,
)
from knowledge_enhanced_multimodal_retrieval_tpu.ops.fused_block import (
    default_attention_tile,
    fused_attention_block_q8,
    fused_mlp_block_q8,
    fused_attention_block,
    pad_rows,
)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--model", default="ViT-L/14")
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    model = M.build_model(args.model, dtype=jnp.bfloat16)
    arch = model.arch
    params = M.init_params(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    images = [
        jnp.asarray(rng.standard_normal((args.batch, arch.image_resolution, arch.image_resolution, 3)), jnp.float32)
    ]
    dummy = jnp.zeros((8, 8), jnp.bfloat16)

    plans = {
        "bf16": make_vision_plan(params, dtype=jnp.bfloat16),
        "int8": make_vision_plan(params, quantize="int8"),
    }
    n_layers = len(plans["bf16"]["layers"])

    def encode_pipeline(plan, imgs, cimg, ctxt):
        e = encode_image_fast(arch, plan, imgs)
        return e[:, :20], (e[:, :20] * 100).astype(jnp.int32)

    # full tower + layer-count slope (0 / half / all layers)
    for mode, plan in plans.items():
        times = {}
        for cnt in (0, n_layers // 2, n_layers):
            sub = dict(plan, layers=plan["layers"][:cnt])
            times[cnt] = _time(encode_pipeline, sub, images, dummy, dummy, iters=args.iters)
        per_layer = (times[n_layers] - times[n_layers // 2]) / (n_layers - n_layers // 2)
        print(
            f"{mode}: full {times[n_layers] * 1e3:7.2f} ms "
            f"({args.batch / times[n_layers]:7.1f} img/s) | embed+pool "
            f"{times[0] * 1e3:6.2f} ms | per-layer {per_layer * 1e3:6.3f} ms"
        )

    # per-block kernels at vision shapes, tile sweep
    width = arch.vision_width
    heads = arch.heads_vision
    s = arch.grid_size**2 + 1
    # PRODUCTION padding (fast_encode pads sequences to the bf16 sublane, 16)
    s_pad = -(-s // _SUBLANE) * _SUBLANE
    lp8 = plans["int8"]["layers"][0]
    lpb = plans["bf16"]["layers"][0]
    x0 = [jnp.asarray(rng.standard_normal((args.batch * s_pad, width)), jnp.bfloat16)]

    # the attention tile is fixed by the sequence length (whole sequences per
    # tile: default_attention_tile(272, *) == 272 at L/14); only the MLP
    # row tile is a free knob — sweep it, time attention once
    attn_tile = default_attention_tile(s_pad, target=_TILE_TARGET)

    def attn_q8(lp, x, cimg, ctxt):
        y = fused_attention_block_q8(
            x, lp["ln1_scale"], lp["ln1_bias"], lp["wqkv"], lp["wqkv_s"],
            lp["bqkv"], lp["wo"], lp["wo_s"], lp["bo"],
            seq_len=s_pad, heads=heads, mask_len=s, tile=attn_tile, causal=False,
        )
        return y[:, :20].astype(jnp.float32), (y[:, :20] * 100).astype(jnp.int32)

    def attn_bf16(lp, x, cimg, ctxt):
        y = fused_attention_block(
            x, lp["ln1_scale"], lp["ln1_bias"], lp["wqkv"], lp["bqkv"],
            lp["wo"], lp["bo"], seq_len=s_pad, heads=heads, mask_len=s,
            tile=attn_tile, causal=False,
        )
        return y[:, :20].astype(jnp.float32), (y[:, :20] * 100).astype(jnp.int32)

    ta = _time(attn_q8, lp8, x0, dummy, dummy, iters=args.iters)
    tb = _time(attn_bf16, lpb, x0, dummy, dummy, iters=args.iters)
    print(f"attn tile {attn_tile}: attn_q8 {ta * 1e3:6.3f} ms | attn_bf16 {tb * 1e3:6.3f} ms")

    for tile in (128, 256, _TILE_TARGET):
        if (args.batch * s_pad) % tile:
            continue

        def mlp_q8(lp, x, cimg, ctxt, _t=tile):
            y = fused_mlp_block_q8(
                x, lp["ln2_scale"], lp["ln2_bias"], lp["w1"], lp["w1_s"],
                lp["b1"], lp["w2"], lp["w2_s"], lp["b2"], tile=_t,
            )
            return y[:, :20].astype(jnp.float32), (y[:, :20] * 100).astype(jnp.int32)

        tm = _time(mlp_q8, lp8, x0, dummy, dummy, iters=args.iters)
        print(
            f"mlp tile {tile:4d}: mlp_q8 {tm * 1e3:6.3f} ms "
            f"| layer_q8 sum {(ta + tm) * 1e3:6.3f} ms"
        )


if __name__ == "__main__":
    main()
