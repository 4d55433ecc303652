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
