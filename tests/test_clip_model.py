import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.models import clip as M
from knowledge_enhanced_multimodal_retrieval_tpu.models import convert as CV

TINY = M.CLIPArch(
    embed_dim=32,
    image_resolution=32,
    vision_layers=2,
    vision_width=64,
    vision_patch_size=16,
    context_length=16,
    vocab_size=101,
    text_width=48,
    text_heads=4,
    text_layers=2,
    vision_heads=4,
)


@pytest.fixture(scope="module")
def tiny_model_params():
    model = M.CLIP(TINY, dtype=jnp.float32)
    params = M.init_params(model, jax.random.PRNGKey(0), batch=2)
    return model, params


def _inputs(batch=2, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.standard_normal((batch, 32, 32, 3)).astype(np.float32)
    ids = np.zeros((batch, 16), np.int32)
    for i in range(batch):
        n = 5 + i
        ids[i, 0] = 99  # sot
        ids[i, 1 : n + 1] = rng.integers(1, 90, n)
        ids[i, n + 1] = 100  # eot (largest id -> argmax pooling finds it)
    return jnp.asarray(images), jnp.asarray(ids)


def test_forward_shapes(tiny_model_params):
    model, params = tiny_model_params
    images, ids = _inputs()
    img_e, txt_e, scale = model.apply({"params": params}, images, ids)
    assert img_e.shape == (2, 32)
    assert txt_e.shape == (2, 32)
    assert np.isclose(float(scale), np.log(1 / 0.07))


def test_eot_pooling_ignores_padding(tiny_model_params):
    """Tokens after EOT must not affect the text embedding (argmax pooling +
    causal masking semantics)."""
    model, params = tiny_model_params
    _, ids = _inputs()
    e1 = model.apply({"params": params}, ids, method=M.CLIP.encode_text)
    ids2 = np.asarray(ids).copy()
    ids2[:, -2:] = 7  # garbage beyond EOT (id < eot so argmax still finds eot)
    e2 = model.apply({"params": params}, jnp.asarray(ids2), method=M.CLIP.encode_text)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)


def test_l2_normalize():
    x = jnp.array([[3.0, 4.0]])
    out = np.asarray(M.l2_normalize(x))
    np.testing.assert_allclose(out, [[0.6, 0.8]], rtol=1e-6)
    assert np.isfinite(np.asarray(M.l2_normalize(jnp.zeros((1, 4))))).all()


def test_param_count_vitb32_matches_openai():
    """ViT-B/32 must have the public 151.28M parameter count."""
    model = M.build_model("ViT-B/32")
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 77), jnp.int32)),
        jax.random.PRNGKey(0),
    )["params"]
    total = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes))
    assert abs(total - 151_277_313) < 1000, total


def test_param_count_vitl14():
    model = M.build_model("ViT-L/14")
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 77), jnp.int32)),
        jax.random.PRNGKey(0),
    )["params"]
    total = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes))
    assert abs(total - 427_616_513) < 2000, total


def test_unknown_variant():
    with pytest.raises(ValueError):
        M.build_model("ViT-H/14")


def test_vitl14_336px_variant():
    """The high-res OpenAI variant: same towers as ViT-L/14, 24x24 grid, and
    the same parameter count except the larger vision positional embedding
    (577 vs 257 tokens)."""
    base = M.ARCHS["ViT-L/14"]
    hi = M.build_model("ViT-L/14@336px").arch
    assert hi.grid_size == 24 and hi.image_resolution == 336
    assert dataclasses.replace(hi, image_resolution=224) == base
    shapes = jax.eval_shape(
        lambda k: M.build_model("ViT-L/14@336px").init(
            k, jnp.zeros((1, 336, 336, 3)), jnp.zeros((1, 77), jnp.int32)
        ),
        jax.random.PRNGKey(0),
    )["params"]
    total = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes))
    assert abs(total - (427_616_513 + (577 - 257) * 1024)) < 2000, total


def test_remat_forward_identical(tiny_model_params):
    model, params = tiny_model_params
    images, ids = _inputs()
    remat_model = M.CLIP(TINY, dtype=jnp.float32, remat=True)
    a = model.apply({"params": params}, images, ids)
    b = remat_model.apply({"params": params}, images, ids)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), atol=1e-5)


def test_bf16_close_to_f32(tiny_model_params):
    model, params = tiny_model_params
    images, ids = _inputs()
    bf16_model = M.CLIP(TINY, dtype=jnp.bfloat16)
    f32_img = np.asarray(model.apply({"params": params}, images, method=M.CLIP.encode_image))
    bf_img = np.asarray(bf16_model.apply({"params": params}, images, method=M.CLIP.encode_image))
    cos = (f32_img * bf_img).sum(-1) / (np.linalg.norm(f32_img, axis=-1) * np.linalg.norm(bf_img, axis=-1))
    assert (cos > 0.99).all(), cos


# ---------------------------------------------------------------------------
# HF CLIPModel golden parity: same weights, same inputs, same outputs.
# Validates both the flax model math and the hf converter.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def hf_tiny():
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")
    cfg = transformers.CLIPConfig(
        projection_dim=32,
        text_config={
            "hidden_size": 48,
            "intermediate_size": 192,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "max_position_embeddings": 16,
            "vocab_size": 101,
            "hidden_act": "quick_gelu",
            "eos_token_id": 2,  # legacy argmax pooling path (OpenAI semantics)
        },
        vision_config={
            "hidden_size": 64,
            "intermediate_size": 256,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "image_size": 32,
            "patch_size": 16,
            "hidden_act": "quick_gelu",
        },
    )
    torch.manual_seed(0)
    hf_model = transformers.CLIPModel(cfg).eval()
    return hf_model, torch


def test_hf_parity(hf_tiny):
    hf_model, torch = hf_tiny
    sd = CV.normalize_state_dict(hf_model.state_dict())
    assert CV.detect_format(sd) == "hf"
    params = CV.hf_to_flax(sd)
    model = M.CLIP(TINY, dtype=jnp.float32)
    images, ids = _inputs()

    with torch.no_grad():
        hf_img = hf_model.get_image_features(
            pixel_values=torch.tensor(np.asarray(images)).permute(0, 3, 1, 2)
        ).numpy()
        hf_txt = hf_model.get_text_features(input_ids=torch.tensor(np.asarray(ids))).numpy()

    ours_img = np.asarray(model.apply({"params": params}, images, method=M.CLIP.encode_image))
    ours_txt = np.asarray(model.apply({"params": params}, ids, method=M.CLIP.encode_text))
    np.testing.assert_allclose(ours_img, hf_img, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(ours_txt, hf_txt, rtol=2e-4, atol=2e-4)


def test_openai_vs_hf_conversion_agree(hf_tiny):
    """Build an OpenAI-layout state dict from the HF weights; both converters
    must produce identical flax trees."""
    hf_model, torch = hf_tiny
    sd = CV.normalize_state_dict(hf_model.state_dict())

    oa = {}
    oa["visual.conv1.weight"] = sd["vision_model.embeddings.patch_embedding.weight"]
    oa["visual.class_embedding"] = sd["vision_model.embeddings.class_embedding"]
    oa["visual.positional_embedding"] = sd["vision_model.embeddings.position_embedding.weight"]
    oa["visual.ln_pre.weight"] = sd["vision_model.pre_layrnorm.weight"]
    oa["visual.ln_pre.bias"] = sd["vision_model.pre_layrnorm.bias"]
    oa["visual.ln_post.weight"] = sd["vision_model.post_layernorm.weight"]
    oa["visual.ln_post.bias"] = sd["vision_model.post_layernorm.bias"]
    oa["visual.proj"] = sd["visual_projection.weight"].T
    oa["token_embedding.weight"] = sd["text_model.embeddings.token_embedding.weight"]
    oa["positional_embedding"] = sd["text_model.embeddings.position_embedding.weight"]
    oa["ln_final.weight"] = sd["text_model.final_layer_norm.weight"]
    oa["ln_final.bias"] = sd["text_model.final_layer_norm.bias"]
    oa["text_projection"] = sd["text_projection.weight"].T
    oa["logit_scale"] = sd["logit_scale"]
    for side, hf_prefix, oa_prefix, n in [
        ("v", "vision_model.encoder.layers", "visual.transformer.resblocks", 2),
        ("t", "text_model.encoder.layers", "transformer.resblocks", 2),
    ]:
        for i in range(n):
            hp, op = f"{hf_prefix}.{i}", f"{oa_prefix}.{i}"
            oa[f"{op}.attn.in_proj_weight"] = np.concatenate(
                [sd[f"{hp}.self_attn.q_proj.weight"], sd[f"{hp}.self_attn.k_proj.weight"], sd[f"{hp}.self_attn.v_proj.weight"]],
                axis=0,
            )
            oa[f"{op}.attn.in_proj_bias"] = np.concatenate(
                [sd[f"{hp}.self_attn.q_proj.bias"], sd[f"{hp}.self_attn.k_proj.bias"], sd[f"{hp}.self_attn.v_proj.bias"]]
            )
            oa[f"{op}.attn.out_proj.weight"] = sd[f"{hp}.self_attn.out_proj.weight"]
            oa[f"{op}.attn.out_proj.bias"] = sd[f"{hp}.self_attn.out_proj.bias"]
            oa[f"{op}.ln_1.weight"] = sd[f"{hp}.layer_norm1.weight"]
            oa[f"{op}.ln_1.bias"] = sd[f"{hp}.layer_norm1.bias"]
            oa[f"{op}.ln_2.weight"] = sd[f"{hp}.layer_norm2.weight"]
            oa[f"{op}.ln_2.bias"] = sd[f"{hp}.layer_norm2.bias"]
            oa[f"{op}.mlp.c_fc.weight"] = sd[f"{hp}.mlp.fc1.weight"]
            oa[f"{op}.mlp.c_fc.bias"] = sd[f"{hp}.mlp.fc1.bias"]
            oa[f"{op}.mlp.c_proj.weight"] = sd[f"{hp}.mlp.fc2.weight"]
            oa[f"{op}.mlp.c_proj.bias"] = sd[f"{hp}.mlp.fc2.bias"]

    assert CV.detect_format(oa) == "openai"
    p_oa = CV.openai_to_flax(oa)
    p_hf = CV.hf_to_flax(sd)
    flat_oa = CV.flatten_params(p_oa)
    flat_hf = CV.flatten_params(p_hf)
    assert flat_oa.keys() == flat_hf.keys()
    for k in flat_oa:
        np.testing.assert_array_equal(flat_oa[k], flat_hf[k], err_msg=k)


def test_flax_init_tree_matches_converter_tree(hf_tiny, tiny_model_params):
    """Converted trees must have exactly the structure flax init produces."""
    hf_model, _ = hf_tiny
    _, params = tiny_model_params
    converted = CV.hf_to_flax(CV.normalize_state_dict(hf_model.state_dict()))
    init_flat = CV.flatten_params(jax.tree_util.tree_map(np.asarray, params))
    conv_flat = CV.flatten_params(converted)
    assert set(init_flat) == set(conv_flat)
    for k in init_flat:
        assert init_flat[k].shape == conv_flat[k].shape, k


def test_npz_roundtrip(tmp_path, tiny_model_params):
    _, params = tiny_model_params
    path = str(tmp_path / "params.npz")
    np_params = jax.tree_util.tree_map(np.asarray, params)
    CV.save_params_npz(np_params, path)
    loaded = CV.load_params_npz(path)
    a, b = CV.flatten_params(np_params), CV.flatten_params(loaded)
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_wrapped_state_dict_layouts(hf_tiny):
    """The reference's 3 checkpoint layouts all normalize (clip_model.py:47-71)."""
    hf_model, torch = hf_tiny
    raw = hf_model.state_dict()
    base = CV.normalize_state_dict(raw)
    for wrap in (
        {"state_dict": raw},
        {"model_state_dict": raw, "epoch": 3},
        {("module." + k): v for k, v in raw.items()},
    ):
        sd = CV.normalize_state_dict(wrap)
        assert sd.keys() == base.keys()


# ---------------------------------------------------------------------------
# Export: flax -> torch layouts (inverse converters + HF publishability)
# ---------------------------------------------------------------------------


def _assert_trees_equal(a, b):
    fa, fb = CV.flatten_params(a), CV.flatten_params(b)
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k], np.float32), fb[k], err_msg=k)


def test_flax_to_openai_roundtrip(tiny_model_params):
    _, params = tiny_model_params
    np_params = jax.tree_util.tree_map(np.asarray, params)
    sd = CV.flax_to_openai(np_params)
    assert CV.detect_format(sd) == "openai"
    _assert_trees_equal(np_params, CV.openai_to_flax(sd))


def test_flax_to_hf_roundtrip(tiny_model_params):
    _, params = tiny_model_params
    np_params = jax.tree_util.tree_map(np.asarray, params)
    sd = CV.flax_to_hf(np_params)
    assert CV.detect_format(sd) == "hf"
    _assert_trees_equal(np_params, CV.hf_to_flax(sd))


def test_save_openai_pt_reimports(tiny_model_params, tmp_path):
    """The exported .pt goes back through the file-level importer losslessly
    (i.e. the reference's load_clip_model(checkpoint_path=...) would see
    exactly these weights)."""
    pytest.importorskip("torch")
    _, params = tiny_model_params
    np_params = jax.tree_util.tree_map(np.asarray, params)
    path = str(tmp_path / "exported.pt")
    CV.save_openai_pt(np_params, path)
    _assert_trees_equal(np_params, CV.torch_to_flax(CV.load_torch_state_dict(path)))


def test_export_hf_checkpoint_bit_exact(hf_tiny, tmp_path):
    """HF weights -> flax -> exported HF dir -> from_pretrained: the round
    trip is bit-exact, so a model fine-tuned here is publishable exactly like
    the reference's xuemduan/reevaluate-clip (evaluator_hf.py:276-284)."""
    transformers = pytest.importorskip("transformers")
    hf_model, torch = hf_tiny
    params = CV.hf_to_flax(CV.normalize_state_dict(hf_model.state_dict()))
    out = CV.export_hf_checkpoint(params, TINY, str(tmp_path / "hf_export"))
    reloaded = transformers.CLIPModel.from_pretrained(out).eval()

    images, ids = _inputs()
    pix = torch.tensor(np.asarray(images)).permute(0, 3, 1, 2)
    tids = torch.tensor(np.asarray(ids))
    with torch.no_grad():
        np.testing.assert_array_equal(
            hf_model.get_image_features(pixel_values=pix).numpy(),
            reloaded.get_image_features(pixel_values=pix).numpy(),
        )
        np.testing.assert_array_equal(
            hf_model.get_text_features(input_ids=tids).numpy(),
            reloaded.get_text_features(input_ids=tids).numpy(),
        )
