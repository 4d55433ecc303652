"""Checkpoint conversion: PyTorch CLIP state dicts -> Flax parameter trees.

Covers the three on-disk families the reference consumes:

- OpenAI ``clip`` checkpoints (TorchScript archives or raw state dicts) —
  reference ``src/clip/model/clip_model.py:15-44``;
- the reference's own fine-tuned checkpoints in any of its three layouts
  (raw / ``state_dict`` / ``model_state_dict``, with optional DDP
  ``module.`` prefixes) — ``clip_model.py:47-71,102-106``;
- HuggingFace ``CLIPModel`` state dicts (the published
  ``xuemduan/reevaluate-clip``) — ``src/clip/eval/evaluator_hf.py:276-284``.

Plus a flat ``.npz`` save/load for converted parameters (training
checkpoints use Orbax; see ``train.checkpoint``).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


# ---------------------------------------------------------------------------
# Loading torch files
# ---------------------------------------------------------------------------


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into {name: float32 numpy array}.

    Handles TorchScript archives (OpenAI clip distribution), plain state
    dicts, and the reference's wrapped layouts; strips DDP ``module.``
    prefixes (reference ``clip_model.py:47-71``).
    """
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    except Exception:
        obj = torch.jit.load(path, map_location="cpu").state_dict()
    return normalize_state_dict(obj)


def normalize_state_dict(obj: Any) -> Dict[str, np.ndarray]:
    """Unwrap checkpoint layouts and convert tensors to float32 numpy."""
    if hasattr(obj, "state_dict") and not isinstance(obj, Mapping):
        obj = obj.state_dict()
    if isinstance(obj, Mapping):
        for key in ("model_state_dict", "state_dict", "model"):
            if key in obj and isinstance(obj[key], Mapping):
                obj = obj[key]
                break
    out: Dict[str, np.ndarray] = {}
    for k, v in obj.items():
        if not hasattr(v, "shape"):
            continue  # skip scalars/metadata entries
        name = k[len("module.") :] if k.startswith("module.") else k
        arr = v.detach().cpu().float().numpy() if hasattr(v, "detach") else np.asarray(v, np.float32)
        out[name] = arr.astype(np.float32)
    return out


def detect_format(sd: Mapping[str, np.ndarray]) -> str:
    """'openai' | 'hf' based on key fingerprints."""
    if any(k.startswith("visual.conv1") for k in sd):
        return "openai"
    if any(k.startswith("vision_model.") for k in sd):
        return "hf"
    raise ValueError("unrecognized CLIP state dict format")


# ---------------------------------------------------------------------------
# OpenAI layout -> flax params
# ---------------------------------------------------------------------------


def _block_from_openai(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    def t(name):  # torch Linear weight [out, in] -> flax kernel [in, out]
        return sd[f"{prefix}.{name}"].T

    def b(name):
        return sd[f"{prefix}.{name}"]

    return {
        "ln_1": {"ln": {"scale": b("ln_1.weight"), "bias": b("ln_1.bias")}},
        "ln_2": {"ln": {"scale": b("ln_2.weight"), "bias": b("ln_2.bias")}},
        "attn": {
            "in_proj": {"kernel": t("attn.in_proj_weight"), "bias": b("attn.in_proj_bias")},
            "out_proj": {"kernel": t("attn.out_proj.weight"), "bias": b("attn.out_proj.bias")},
        },
        "mlp": {
            "c_fc": {"kernel": t("mlp.c_fc.weight"), "bias": b("mlp.c_fc.bias")},
            "c_proj": {"kernel": t("mlp.c_proj.weight"), "bias": b("mlp.c_proj.bias")},
        },
    }


def openai_to_flax(sd: Mapping[str, np.ndarray]) -> dict:
    n_vis = 1 + max(int(k.split(".")[3]) for k in sd if k.startswith("visual.transformer.resblocks."))
    n_txt = 1 + max(int(k.split(".")[2]) for k in sd if k.startswith("transformer.resblocks."))
    visual = {
        "conv1": {"kernel": sd["visual.conv1.weight"].transpose(2, 3, 1, 0)},
        "class_embedding": sd["visual.class_embedding"],
        "positional_embedding": sd["visual.positional_embedding"],
        "ln_pre": {"ln": {"scale": sd["visual.ln_pre.weight"], "bias": sd["visual.ln_pre.bias"]}},
        "ln_post": {"ln": {"scale": sd["visual.ln_post.weight"], "bias": sd["visual.ln_post.bias"]}},
        "proj": sd["visual.proj"],
        "transformer": {
            f"resblocks_{i}": _block_from_openai(sd, f"visual.transformer.resblocks.{i}") for i in range(n_vis)
        },
    }
    text = {
        "token_embedding": {"embedding": sd["token_embedding.weight"]},
        "positional_embedding": sd["positional_embedding"],
        "ln_final": {"ln": {"scale": sd["ln_final.weight"], "bias": sd["ln_final.bias"]}},
        "text_projection": sd["text_projection"],
        "transformer": {f"resblocks_{i}": _block_from_openai(sd, f"transformer.resblocks.{i}") for i in range(n_txt)},
    }
    return {"visual": visual, "text": text, "logit_scale": sd["logit_scale"].reshape(())}


# ---------------------------------------------------------------------------
# HF CLIPModel layout -> flax params
# ---------------------------------------------------------------------------


def _block_from_hf(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    def t(name):
        return sd[f"{prefix}.{name}"].T

    def b(name):
        return sd[f"{prefix}.{name}"]

    in_proj_kernel = np.concatenate(
        [t("self_attn.q_proj.weight"), t("self_attn.k_proj.weight"), t("self_attn.v_proj.weight")], axis=1
    )
    in_proj_bias = np.concatenate(
        [b("self_attn.q_proj.bias"), b("self_attn.k_proj.bias"), b("self_attn.v_proj.bias")]
    )
    return {
        "ln_1": {"ln": {"scale": b("layer_norm1.weight"), "bias": b("layer_norm1.bias")}},
        "ln_2": {"ln": {"scale": b("layer_norm2.weight"), "bias": b("layer_norm2.bias")}},
        "attn": {
            "in_proj": {"kernel": in_proj_kernel, "bias": in_proj_bias},
            "out_proj": {"kernel": t("self_attn.out_proj.weight"), "bias": b("self_attn.out_proj.bias")},
        },
        "mlp": {
            "c_fc": {"kernel": t("mlp.fc1.weight"), "bias": b("mlp.fc1.bias")},
            "c_proj": {"kernel": t("mlp.fc2.weight"), "bias": b("mlp.fc2.bias")},
        },
    }


def hf_to_flax(sd: Mapping[str, np.ndarray]) -> dict:
    n_vis = 1 + max(int(k.split(".")[3]) for k in sd if k.startswith("vision_model.encoder.layers."))
    n_txt = 1 + max(int(k.split(".")[3]) for k in sd if k.startswith("text_model.encoder.layers."))
    visual = {
        "conv1": {"kernel": sd["vision_model.embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0)},
        "class_embedding": sd["vision_model.embeddings.class_embedding"],
        "positional_embedding": sd["vision_model.embeddings.position_embedding.weight"],
        "ln_pre": {
            "ln": {"scale": sd["vision_model.pre_layrnorm.weight"], "bias": sd["vision_model.pre_layrnorm.bias"]}
        },
        "ln_post": {
            "ln": {"scale": sd["vision_model.post_layernorm.weight"], "bias": sd["vision_model.post_layernorm.bias"]}
        },
        "proj": sd["visual_projection.weight"].T,
        "transformer": {
            f"resblocks_{i}": _block_from_hf(sd, f"vision_model.encoder.layers.{i}") for i in range(n_vis)
        },
    }
    text = {
        "token_embedding": {"embedding": sd["text_model.embeddings.token_embedding.weight"]},
        "positional_embedding": sd["text_model.embeddings.position_embedding.weight"],
        "ln_final": {
            "ln": {"scale": sd["text_model.final_layer_norm.weight"], "bias": sd["text_model.final_layer_norm.bias"]}
        },
        "text_projection": sd["text_projection.weight"].T,
        "transformer": {f"resblocks_{i}": _block_from_hf(sd, f"text_model.encoder.layers.{i}") for i in range(n_txt)},
    }
    return {"visual": visual, "text": text, "logit_scale": sd["logit_scale"].reshape(())}


def torch_to_flax(sd: Mapping[str, np.ndarray]) -> dict:
    """Auto-detecting conversion entry point."""
    fmt = detect_format(sd)
    return openai_to_flax(sd) if fmt == "openai" else hf_to_flax(sd)


def load_clip_params(path: str) -> dict:
    """Load + convert any supported checkpoint file to a flax param tree."""
    if path.endswith(".npz"):
        return load_params_npz(path)
    return torch_to_flax(load_torch_state_dict(path))


# ---------------------------------------------------------------------------
# Flax params -> torch layouts (export; exact inverses of the importers)
# ---------------------------------------------------------------------------
#
# The reference ecosystem is torch-shaped: its fine-tuned weights live as
# OpenAI-layout ``.pt`` files (``src/clip/model/clip_model.py:78-121``) and
# its published model as an HF ``CLIPModel`` (``evaluator_hf.py:276-284``).
# These exporters let a model fine-tuned HERE be dropped back into either
# stack — ``flax_to_hf(...)`` loads into ``transformers.CLIPModel`` with
# ``strict`` key/shape checking, and ``flax_to_openai(...)`` round-trips
# through ``openai_to_flax`` bit-exactly (tests/test_clip_model.py).


def _n_blocks(transformer: Mapping) -> int:
    return 1 + max(int(k.split("_")[-1]) for k in transformer if k.startswith("resblocks_"))


def _f32(x: Any) -> np.ndarray:
    return np.asarray(x, np.float32)


def _block_to_openai(block: Mapping, prefix: str, out: Dict[str, np.ndarray]) -> None:
    out[f"{prefix}.ln_1.weight"] = _f32(block["ln_1"]["ln"]["scale"])
    out[f"{prefix}.ln_1.bias"] = _f32(block["ln_1"]["ln"]["bias"])
    out[f"{prefix}.ln_2.weight"] = _f32(block["ln_2"]["ln"]["scale"])
    out[f"{prefix}.ln_2.bias"] = _f32(block["ln_2"]["ln"]["bias"])
    attn, mlp = block["attn"], block["mlp"]
    out[f"{prefix}.attn.in_proj_weight"] = _f32(attn["in_proj"]["kernel"]).T
    out[f"{prefix}.attn.in_proj_bias"] = _f32(attn["in_proj"]["bias"])
    out[f"{prefix}.attn.out_proj.weight"] = _f32(attn["out_proj"]["kernel"]).T
    out[f"{prefix}.attn.out_proj.bias"] = _f32(attn["out_proj"]["bias"])
    out[f"{prefix}.mlp.c_fc.weight"] = _f32(mlp["c_fc"]["kernel"]).T
    out[f"{prefix}.mlp.c_fc.bias"] = _f32(mlp["c_fc"]["bias"])
    out[f"{prefix}.mlp.c_proj.weight"] = _f32(mlp["c_proj"]["kernel"]).T
    out[f"{prefix}.mlp.c_proj.bias"] = _f32(mlp["c_proj"]["bias"])


def flax_to_openai(params: Mapping) -> Dict[str, np.ndarray]:
    """Inverse of :func:`openai_to_flax` — OpenAI ``clip`` state-dict keys."""
    visual, text = params["visual"], params["text"]
    out: Dict[str, np.ndarray] = {
        "visual.conv1.weight": _f32(visual["conv1"]["kernel"]).transpose(3, 2, 0, 1),
        "visual.class_embedding": _f32(visual["class_embedding"]),
        "visual.positional_embedding": _f32(visual["positional_embedding"]),
        "visual.ln_pre.weight": _f32(visual["ln_pre"]["ln"]["scale"]),
        "visual.ln_pre.bias": _f32(visual["ln_pre"]["ln"]["bias"]),
        "visual.ln_post.weight": _f32(visual["ln_post"]["ln"]["scale"]),
        "visual.ln_post.bias": _f32(visual["ln_post"]["ln"]["bias"]),
        "visual.proj": _f32(visual["proj"]),
        "token_embedding.weight": _f32(text["token_embedding"]["embedding"]),
        "positional_embedding": _f32(text["positional_embedding"]),
        "ln_final.weight": _f32(text["ln_final"]["ln"]["scale"]),
        "ln_final.bias": _f32(text["ln_final"]["ln"]["bias"]),
        "text_projection": _f32(text["text_projection"]),
        "logit_scale": _f32(params["logit_scale"]).reshape(()),
    }
    for i in range(_n_blocks(visual["transformer"])):
        _block_to_openai(visual["transformer"][f"resblocks_{i}"], f"visual.transformer.resblocks.{i}", out)
    for i in range(_n_blocks(text["transformer"])):
        _block_to_openai(text["transformer"][f"resblocks_{i}"], f"transformer.resblocks.{i}", out)
    return out


def _block_to_hf(block: Mapping, prefix: str, out: Dict[str, np.ndarray]) -> None:
    out[f"{prefix}.layer_norm1.weight"] = _f32(block["ln_1"]["ln"]["scale"])
    out[f"{prefix}.layer_norm1.bias"] = _f32(block["ln_1"]["ln"]["bias"])
    out[f"{prefix}.layer_norm2.weight"] = _f32(block["ln_2"]["ln"]["scale"])
    out[f"{prefix}.layer_norm2.bias"] = _f32(block["ln_2"]["ln"]["bias"])
    attn, mlp = block["attn"], block["mlp"]
    kernel, bias = _f32(attn["in_proj"]["kernel"]), _f32(attn["in_proj"]["bias"])
    width = kernel.shape[0]
    for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
        out[f"{prefix}.self_attn.{name}.weight"] = kernel[:, j * width : (j + 1) * width].T
        out[f"{prefix}.self_attn.{name}.bias"] = bias[j * width : (j + 1) * width]
    out[f"{prefix}.self_attn.out_proj.weight"] = _f32(attn["out_proj"]["kernel"]).T
    out[f"{prefix}.self_attn.out_proj.bias"] = _f32(attn["out_proj"]["bias"])
    out[f"{prefix}.mlp.fc1.weight"] = _f32(mlp["c_fc"]["kernel"]).T
    out[f"{prefix}.mlp.fc1.bias"] = _f32(mlp["c_fc"]["bias"])
    out[f"{prefix}.mlp.fc2.weight"] = _f32(mlp["c_proj"]["kernel"]).T
    out[f"{prefix}.mlp.fc2.bias"] = _f32(mlp["c_proj"]["bias"])


def flax_to_hf(params: Mapping) -> Dict[str, np.ndarray]:
    """Inverse of :func:`hf_to_flax` — HF ``CLIPModel`` state-dict keys.

    (``pre_layrnorm`` is transformers' actual key spelling, not a typo here.)
    """
    visual, text = params["visual"], params["text"]
    out: Dict[str, np.ndarray] = {
        "vision_model.embeddings.patch_embedding.weight": _f32(visual["conv1"]["kernel"]).transpose(3, 2, 0, 1),
        "vision_model.embeddings.class_embedding": _f32(visual["class_embedding"]),
        "vision_model.embeddings.position_embedding.weight": _f32(visual["positional_embedding"]),
        "vision_model.pre_layrnorm.weight": _f32(visual["ln_pre"]["ln"]["scale"]),
        "vision_model.pre_layrnorm.bias": _f32(visual["ln_pre"]["ln"]["bias"]),
        "vision_model.post_layernorm.weight": _f32(visual["ln_post"]["ln"]["scale"]),
        "vision_model.post_layernorm.bias": _f32(visual["ln_post"]["ln"]["bias"]),
        "visual_projection.weight": _f32(visual["proj"]).T,
        "text_model.embeddings.token_embedding.weight": _f32(text["token_embedding"]["embedding"]),
        "text_model.embeddings.position_embedding.weight": _f32(text["positional_embedding"]),
        "text_model.final_layer_norm.weight": _f32(text["ln_final"]["ln"]["scale"]),
        "text_model.final_layer_norm.bias": _f32(text["ln_final"]["ln"]["bias"]),
        "text_projection.weight": _f32(text["text_projection"]).T,
        "logit_scale": _f32(params["logit_scale"]).reshape(()),
    }
    for i in range(_n_blocks(visual["transformer"])):
        _block_to_hf(visual["transformer"][f"resblocks_{i}"], f"vision_model.encoder.layers.{i}", out)
    for i in range(_n_blocks(text["transformer"])):
        _block_to_hf(text["transformer"][f"resblocks_{i}"], f"text_model.encoder.layers.{i}", out)
    return out


def save_openai_pt(params: Mapping, path: str) -> None:
    """Write an OpenAI-layout ``.pt`` loadable by the reference's
    ``load_clip_model(checkpoint_path=...)`` (``clip_model.py:47-71``)."""
    import torch

    # .copy(): leaves may be non-writable views (jax exports, transposes) and
    # torch.from_numpy refuses those
    torch.save(
        {k: torch.from_numpy(np.ascontiguousarray(v).copy()) for k, v in flax_to_openai(params).items()},
        path,
    )


def hf_clip_config(arch) -> "Any":
    """``transformers.CLIPConfig`` matching a :class:`models.clip.CLIPArch`.

    ``hidden_act='quick_gelu'`` and ``eos_token_id=2`` (transformers' marker
    for the legacy argmax-EOT pooling path) reproduce OpenAI-CLIP semantics,
    which is what the flax model implements."""
    import transformers

    return transformers.CLIPConfig(
        projection_dim=arch.embed_dim,
        text_config={
            "hidden_size": arch.text_width,
            "intermediate_size": arch.text_width * 4,
            "num_hidden_layers": arch.text_layers,
            "num_attention_heads": arch.text_heads,
            "max_position_embeddings": arch.context_length,
            "vocab_size": arch.vocab_size,
            "hidden_act": "quick_gelu",
            "eos_token_id": 2,
        },
        vision_config={
            "hidden_size": arch.vision_width,
            "intermediate_size": arch.vision_width * 4,
            "num_hidden_layers": arch.vision_layers,
            "num_attention_heads": arch.heads_vision,
            "image_size": arch.image_resolution,
            "patch_size": arch.vision_patch_size,
            "hidden_act": "quick_gelu",
        },
    )


def export_hf_checkpoint(params: Mapping, arch, out_dir: str) -> str:
    """Write an HF ``CLIPModel`` directory; ``from_pretrained(out_dir)`` works
    offline — the publishable-artifact format of the reference's
    ``xuemduan/reevaluate-clip`` (``evaluator_hf.py:276-284``).

    Keys and shapes are verified strictly: the only tolerated mismatches are
    transformers' non-persistent ``position_ids`` buffers (absent from our
    export, present in some transformers versions)."""
    import torch
    import transformers

    model = transformers.CLIPModel(hf_clip_config(arch))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v).copy()) for k, v in flax_to_hf(params).items()}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    bad_missing = [k for k in missing if not k.endswith("position_ids")]
    if bad_missing or unexpected:
        raise ValueError(f"HF export key mismatch: missing={bad_missing} unexpected={list(unexpected)}")
    model.save_pretrained(out_dir)
    return out_dir


# ---------------------------------------------------------------------------
# Flat npz persistence for converted params
# ---------------------------------------------------------------------------


def flatten_params(params: Mapping, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in params.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            out.update(flatten_params(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_params(flat: Mapping[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params_npz(params: Mapping, path: str) -> None:
    np.savez(path, **flatten_params(params))


def load_params_npz(path: str) -> dict:
    with np.load(path) as data:
        return unflatten_params({k: data[k] for k in data.files})
