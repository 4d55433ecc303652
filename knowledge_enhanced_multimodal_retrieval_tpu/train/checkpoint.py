"""Orbax checkpointing with the reference's latest/best semantics.

The reference saves ``checkpoint_latest.pt`` every epoch and
``checkpoint_best.pt`` on metric improvement, bundling model + optimizer +
scheduler state + best-metric bookkeeping (``trainer.py:260-288``,
``clip_model.py:78-171``). Here the same contract is implemented with Orbax
(async-capable, multi-host-safe): one directory per role, params + opt_state
+ counters in a single pytree, JSON sidecar for scalars.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..utils.logging_utils import is_coordinator


def _dir(base: str, role: str) -> str:
    return os.path.join(os.path.abspath(base), f"checkpoint_{role}")


def save_checkpoint(
    base_dir: str,
    role: str,  # "latest" | "best"
    state: Any,  # pytree: {"params", "opt_state", "step"}
    metadata: Dict[str, Any],
) -> None:
    """Save a training-state pytree + JSON metadata under ``base_dir``."""
    if not is_coordinator():
        return
    path = _dir(base_dir, role)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree_util.tree_map(np.asarray, state), force=True)
    ckptr.wait_until_finished()
    with open(path + ".meta.json", "w") as f:
        json.dump(metadata, f, indent=2)


def load_checkpoint(
    base_dir: str,
    role: str,
    target: Any,
) -> Tuple[Any, Dict[str, Any]]:
    """Restore a training-state pytree (structure/dtypes from ``target``)."""
    path = _dir(base_dir, role)
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, jax.tree_util.tree_map(np.asarray, target))
    state = ckptr.restore(path, target=abstract)
    meta_path = path + ".meta.json"
    metadata = json.load(open(meta_path)) if os.path.exists(meta_path) else {}
    return state, metadata


def checkpoint_exists(base_dir: str, role: str) -> bool:
    return os.path.isdir(_dir(base_dir, role))
