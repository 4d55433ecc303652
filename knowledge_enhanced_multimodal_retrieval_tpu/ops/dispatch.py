"""Kernel-dispatch helpers."""

from __future__ import annotations

import jax


def target_platform() -> str:
    """Platform the next computation will run on.

    Respects an active ``jax.default_device(...)`` context (where
    ``jax.default_backend()`` would still report the process-wide default —
    and hand compiled Pallas kernels to a CPU device).
    """
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform
    return jax.default_backend()


def on_tpu() -> bool:
    return target_platform() == "tpu"


def enable_compile_cache(path: str) -> str:
    """Turn on JAX's persistent compilation cache rooted at ``path``.

    Compiled executables are keyed by HLO + compile options + backend and
    written to disk, so a RESTARTED process (serve daemon, evaluate rerun)
    loads them instead of recompiling — on a relay/jit backend where a cold
    L/14 compile takes minutes, this is the difference between instant and
    minutes-long startup. Verified to work over the axon relay (second
    process: 0.07s vs 0.45s first compile). Threshold configs are zeroed so
    even small serving programs (top-k, per-bucket encoders) cache.

    Idempotent; returns the path. The cache composes with (does not replace)
    warmup — warmup still pays the first-ever compile, the cache makes every
    later process skip it.
    """
    import os

    os.makedirs(path, exist_ok=True)
    if jax.config.jax_compilation_cache_dir not in (None, path):
        # the cache object latches its dir at first use; a process switching
        # dirs (serve CLI after a library default) must drop the live handle
        try:
            from jax.experimental.compilation_cache import compilation_cache

            compilation_cache.reset_cache()
        except Exception:
            pass  # older JAX: config update below is sufficient pre-first-use
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
