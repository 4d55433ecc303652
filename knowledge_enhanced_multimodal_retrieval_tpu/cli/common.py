"""Shared CLI plumbing: model/params/data construction from a Config.

Replaces the reference's per-entry-point argparse blocks and pip-installing
shell scripts (``scripts/*/*.sh`` — SURVEY §2.20) with one factory layer on
top of the typed config system. Dataset URIs:

- ``synthetic:N``                  — offline random corpus (tests/smoke);
- anything else                    — HuggingFace dataset name with the
  reference schema (``xuemduan/reevaluate-image-text-pairs``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..data.datasets import DataPipeline, load_hf_source, make_synthetic_source
from ..data.tokenizer import CLIPTokenizer
from ..models import clip as clip_mod
from ..models.convert import load_clip_params
from ..parallel.mesh import MeshRuntime
from ..utils.config import Config


def maybe_enable_compile_cache(cfg: Config) -> None:
    """Honor ``eval.compile_cache`` (persistent executable cache on disk) —
    called by every CLI main right after config parsing, BEFORE the first
    jit, so restarted daemons/eval runs skip the remote recompiles."""
    if cfg.eval.compile_cache:
        from ..ops.dispatch import enable_compile_cache

        enable_compile_cache(cfg.eval.compile_cache)


def build_tokenizer(cfg: Config) -> CLIPTokenizer:
    return CLIPTokenizer.find_default()


def build_model_and_params(cfg: Config, rng_seed: int = 0):
    """Model from config; params from checkpoint (OpenAI / HF / npz) or init."""
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.model.dtype]
    model = clip_mod.build_model(cfg.model.name, dtype=dtype, remat=cfg.model.remat)
    if cfg.model.checkpoint:
        params = load_clip_params(cfg.model.checkpoint)
    else:
        params = clip_mod.init_params(model, jax.random.PRNGKey(rng_seed))
    if cfg.model.adapters:
        params = merge_adapters(cfg.model.adapters, params)
    return model, params


def merge_adapters(adapters_path: str, params):
    """Merge a LoRA adapter artifact into ``params`` at load time — the one
    implementation every entry point (serve/evaluate/precompute/export)
    shares. Host-side numpy merge: eager per-op dispatch on a remote
    backend would cost hundreds of round trips at startup."""
    from ..train.lora import load_adapters, lora_merge_host

    adapters, meta = load_adapters(adapters_path, params)
    scale = float(meta["alpha"]) / float(meta["rank"])
    return lora_merge_host(params, adapters, scale)


def build_pipeline(cfg: Config, split: str, tokenizer: Optional[CLIPTokenizer] = None) -> DataPipeline:
    name = cfg.data.dataset
    if name.startswith("synthetic:"):
        n = int(name.split(":", 1)[1])
        source = make_synthetic_source(n, image_size=cfg.data.image_size)
        tokenizer = tokenizer or _tiny_tokenizer()
    else:
        source = load_hf_source(name, split)
        tokenizer = tokenizer or build_tokenizer(cfg)
    return DataPipeline(
        source,
        tokenizer,
        image_size=cfg.data.image_size,
        context_length=cfg.data.context_length,
        max_text_words=cfg.data.max_text_words,
        num_workers=cfg.data.num_workers,
        preprocess_mode=cfg.data.preprocess_mode,
    )


def _tiny_tokenizer() -> CLIPTokenizer:
    """Byte-fallback tokenizer (no merges) — enough for synthetic smoke runs."""
    return CLIPTokenizer([])


def build_runtime(cfg: Config) -> MeshRuntime:
    return MeshRuntime.create(cfg.mesh)


def pop_flag(args, flag: str, default=None):
    """Remove ``--flag value`` or ``--flag=value`` from ``args``; return value.

    Entry-point flags (paths, formats) share a command line with dotted
    config overrides, which always use ``=`` form — so both spellings must
    work or ``--format=openai`` silently keeps the default and then fails
    later inside config parsing with an unrelated error.
    """
    prefix = flag + "="
    for i, tok in enumerate(args):
        if tok == flag:
            if i + 1 >= len(args):
                raise ValueError(f"{flag} requires a value")
            val = args[i + 1]
            del args[i : i + 2]
            return val
        if tok.startswith(prefix):
            del args[i]
            return tok[len(prefix):]
    return default
