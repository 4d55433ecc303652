"""Pipeline parallelism (parallel/pp.py): GPipe schedule over the pipe axis
pinned against the plain sequential layer stack — forward, grads, and the
real CLIP residual blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
from knowledge_enhanced_multimodal_retrieval_tpu.parallel.pp import (
    pipeline_apply,
    stack_stages,
    stage_sharding,
)


def _pipe_mesh(n=4, extra=()):
    devs = np.array(jax.devices()[: n * max(1, int(np.prod([s for _, s in extra])))])
    if extra:
        shape = (n,) + tuple(s for _, s in extra)
        names = ("pipe",) + tuple(a for a, _ in extra)
        return Mesh(devs.reshape(shape), names)
    return Mesh(devs.reshape(n), ("pipe",))


def _toy_layers(n_layers, d, key):
    keys = jax.random.split(key, n_layers)
    return [
        {
            "w": jax.random.normal(k, (d, d), jnp.float32) * 0.2,
            "b": jax.random.normal(k, (d,), jnp.float32) * 0.1,
        }
        for k in keys
    ]


def _toy_layer_fn(p, x):
    return x + jnp.tanh(x @ p["w"] + p["b"])


def _sequential(layers, xs):
    out = xs
    for p in layers:
        out = jax.vmap(lambda x: _toy_layer_fn(p, x))(out)
    return out


def test_pipeline_matches_sequential(devices8):
    mesh = _pipe_mesh(4)
    layers = _toy_layers(8, 16, jax.random.PRNGKey(0))
    xs = jax.random.normal(jax.random.PRNGKey(1), (6, 4, 16), jnp.float32)  # [M, mb, d]
    sp = stack_stages(layers, 4)
    sp = jax.device_put(sp, stage_sharding(mesh, sp))
    got = pipeline_apply(_toy_layer_fn, sp, xs, mesh)
    want = _sequential(layers, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_pipeline_single_stage_degenerates(devices8):
    mesh = _pipe_mesh(1)
    layers = _toy_layers(3, 8, jax.random.PRNGKey(2))
    xs = jax.random.normal(jax.random.PRNGKey(3), (2, 2, 8), jnp.float32)
    sp = stack_stages(layers, 1)
    got = pipeline_apply(_toy_layer_fn, sp, xs, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_sequential(layers, xs)), rtol=2e-5, atol=2e-5)


def test_pipeline_grads_match_sequential(devices8):
    """jax.grad through the scan/ppermute = the reverse pipeline; parameter
    grads must equal the sequential stack's (training-readiness)."""
    mesh = _pipe_mesh(4)
    layers = _toy_layers(4, 8, jax.random.PRNGKey(4))
    xs = jax.random.normal(jax.random.PRNGKey(5), (5, 2, 8), jnp.float32)

    def loss_pp(sp):
        return jnp.sum(pipeline_apply(_toy_layer_fn, sp, xs, mesh) ** 2)

    def loss_seq(layers_):
        return jnp.sum(_sequential(layers_, xs) ** 2)

    sp = stack_stages(layers, 4)
    sp = jax.device_put(sp, stage_sharding(mesh, sp))
    g_pp = jax.grad(loss_pp)(sp)
    g_seq = stack_stages(jax.tree_util.tree_map(np.asarray, jax.grad(loss_seq)(layers)), 4)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp), jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_pipeline_real_clip_blocks(devices8):
    """The flagship's own residual blocks pipeline correctly: a tiny text
    tower's block stack staged 4-ways matches the in-module Transformer."""
    arch = M.CLIPArch(16, 32, 1, 32, 16, 16, 64, 32, 2, 8, vision_heads=2)
    model = M.CLIP(arch, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0))
    tparams = params["text"]["transformer"]
    layer_list = [tparams[f"resblocks_{i}"] for i in range(arch.text_layers)]

    block = M.ResidualBlock(arch.text_width, arch.text_heads, jnp.float32)

    def layer_fn(p, x):
        return block.apply({"params": p}, x, True)  # causal, as in the text tower

    mesh = _pipe_mesh(4)
    xs = jax.random.normal(jax.random.PRNGKey(1), (4, 2, arch.context_length, arch.text_width), jnp.float32)
    sp = stack_stages(layer_list, 4)
    sp = jax.device_put(sp, stage_sharding(mesh, sp))
    got = pipeline_apply(layer_fn, sp, xs, mesh)

    transformer = M.Transformer(arch.text_width, arch.text_layers, arch.text_heads, jnp.float32)
    want = jax.vmap(lambda x: transformer.apply({"params": tparams}, x, causal=True))(xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_stack_stages_validates():
    layers = _toy_layers(6, 4, jax.random.PRNGKey(6))
    with pytest.raises(ValueError):
        stack_stages(layers, 4)
    sp = stack_stages(layers, 3)
    assert jax.tree_util.tree_leaves(sp)[0].shape[:2] == (3, 2)
