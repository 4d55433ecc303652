"""Persistent compilation cache (ops.dispatch.enable_compile_cache).

Restarted serving/eval processes load compiled executables from disk
instead of re-paying the (minutes-long on a relay backend) remote compile.
No reference counterpart — the reference has no compilation step to cache.
"""

import jax
import jax.numpy as jnp
import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.ops.dispatch import enable_compile_cache
from knowledge_enhanced_multimodal_retrieval_tpu.utils.config import config_from_argv


@pytest.fixture()
def restore_cache_dir():
    """These tests repoint the GLOBAL cache; put it back so the rest of the
    suite keeps writing to the shared tests/.jax_test_cache dir."""
    prev = jax.config.jax_compilation_cache_dir
    yield
    if prev is not None:
        enable_compile_cache(prev)


def test_enable_compile_cache_writes_entries(tmp_path, devices8, restore_cache_dir):
    path = enable_compile_cache(str(tmp_path / "cache"))
    assert path == str(tmp_path / "cache")

    @jax.jit
    def f(x):
        return jnp.sin(x @ x.T).sum()

    f(jnp.arange(30.0).reshape(5, 6)).block_until_ready()
    entries = list((tmp_path / "cache").iterdir())
    assert entries, "no cache entries written"


def test_config_knob_and_cli_hook(tmp_path, devices8, restore_cache_dir):
    cfg = config_from_argv([f"--eval.compile_cache={tmp_path / 'c2'}"])
    assert cfg.eval.compile_cache == str(tmp_path / "c2")

    from knowledge_enhanced_multimodal_retrieval_tpu.cli.common import (
        maybe_enable_compile_cache,
    )

    maybe_enable_compile_cache(cfg)
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "c2")
    # off by default: the hook is a no-op (doesn't clobber an existing dir)
    maybe_enable_compile_cache(config_from_argv([]))
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "c2")
