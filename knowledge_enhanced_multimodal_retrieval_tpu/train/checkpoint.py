"""Orbax checkpointing with the reference's latest/best semantics.

The reference saves ``checkpoint_latest.pt`` every epoch and
``checkpoint_best.pt`` on metric improvement, bundling model + optimizer +
scheduler state + best-metric bookkeeping (``trainer.py:260-288``,
``clip_model.py:78-171``). Here the same contract is implemented with Orbax
(async-capable, multi-host-safe): one directory per role, params + opt_state
+ counters in a single pytree, JSON sidecar for scalars.
"""

from __future__ import annotations

import itertools
import json
import os
import threading
from typing import Any, Dict, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..utils.logging_utils import is_coordinator


def _dir(base: str, role: str) -> str:
    return os.path.join(os.path.abspath(base), f"checkpoint_{role}")


# One shared checkpointer so successive async saves serialize against each
# other and a single wait flushes everything pending.
_CKPTR = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def wait_for_checkpoints() -> None:
    """Block until every pending async save (data AND meta sidecar) commits."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()
    while True:
        with _META_LOCK:
            pending = [t for t in _META_THREADS if t.is_alive()]
            _META_THREADS[:] = pending
        if not pending:
            return
        for t in pending:
            t.join()


def save_checkpoint(
    base_dir: str,
    role: str,  # "latest" | "best"
    state: Any,  # pytree: {"params", "opt_state", "step"}
    metadata: Dict[str, Any],
    wait: bool = False,
) -> None:
    """Save a training-state pytree + JSON metadata under ``base_dir``.

    The device->host snapshot is synchronous ON PURPOSE: the caller's state
    buffers get donated to the next train step, so orbax must never read
    them after this returns. The disk write itself is asynchronous (a 5 GB
    L/14 state no longer stalls the epoch loop); call
    :func:`wait_for_checkpoints` (the trainer does, at loop exit) or pass
    ``wait=True`` to flush.

    Multi-process runs (``jax.process_count() > 1``): EVERY process calls
    orbax save/wait on the shared ``base_dir`` — orbax's save and
    wait_until_finished contain global barriers, so coordinator-only
    invocation deadlocks the other processes at their next collective
    (reproduced with gloo CPU collectives; orbax's primary-host logic
    writes the data once). The save is synchronous here so every barrier
    call stays symmetric across processes; only the coordinator writes the
    meta sidecar (plain file IO, no barriers).
    """
    path = _dir(base_dir, role)
    if jax.process_count() > 1:
        ckptr = _checkpointer()
        ckptr.wait_until_finished()
        ckptr.save(path, jax.tree_util.tree_map(np.asarray, state), force=True)
        ckptr.wait_until_finished()  # data committed; barriers symmetric
        if is_coordinator():
            _write_meta(path, json.dumps(metadata, indent=2), next(_META_SEQ))
        return
    if not is_coordinator():
        return
    ckptr = _checkpointer()
    ckptr.wait_until_finished()  # serialize against a still-running save
    ckptr.save(path, jax.tree_util.tree_map(np.asarray, state), force=True)
    _commit_meta_after_save(ckptr, path, metadata, wait=wait)


# Meta sidecars must land AFTER their async data commit — writing them
# eagerly would, on a crash mid-save, leave meta.json describing a
# checkpoint that never committed (or pair new epoch/best-metric metadata
# with the PREVIOUS weights on resume). Latest-wins sequencing guards
# against out-of-order commit threads when the same role saves repeatedly.
_META_SEQ = itertools.count()
_META_LATEST: Dict[str, int] = {}
_META_LOCK = threading.Lock()
_META_THREADS: list = []


def _write_meta(path: str, meta_text: str, seq: int) -> None:
    """Atomically commit the meta sidecar (latest-wins across threads)."""
    with _META_LOCK:
        if _META_LATEST.get(path, -1) > seq:
            return  # a newer save's meta already committed
        _META_LATEST[path] = seq
        tmp = f"{path}.meta.json.tmp-{seq}"
        with open(tmp, "w") as f:
            f.write(meta_text)
        os.replace(tmp, path + ".meta.json")


def _commit_meta_after_save(ckptr, path: str, metadata: Dict[str, Any], wait: bool) -> None:
    seq = next(_META_SEQ)
    meta_text = json.dumps(metadata, indent=2)

    def _commit() -> None:
        ckptr.wait_until_finished()
        _write_meta(path, meta_text, seq)

    if wait:
        _commit()
    else:
        t = threading.Thread(target=_commit, daemon=True, name="kemr-ckpt-meta")
        with _META_LOCK:
            _META_THREADS.append(t)
        t.start()


def load_checkpoint(
    base_dir: str,
    role: str,
    target: Any,
) -> Tuple[Any, Dict[str, Any]]:
    """Restore a training-state pytree (structure/dtypes from ``target``)."""
    path = _dir(base_dir, role)
    wait_for_checkpoints()  # an in-flight save of this path must land first
    ckptr = _checkpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, jax.tree_util.tree_map(np.asarray, target))
    state = ckptr.restore(path, target=abstract)
    meta_path = path + ".meta.json"
    metadata = json.load(open(meta_path)) if os.path.exists(meta_path) else {}
    return state, metadata


def checkpoint_exists(base_dir: str, role: str) -> bool:
    return os.path.isdir(_dir(base_dir, role))


def load_params_only(base_dir: str, role: str) -> Any:
    """Restore just the serving weights of a training checkpoint.

    Targetless restore (structure read from the checkpoint itself) so callers
    that only want weights — export, serving — don't need to reconstruct the
    optimizer state's pytree. An EMA-trained checkpoint
    (``TrainConfig.ema_decay``) carries an ``ema_params`` shadow; that is
    what validation and the best-checkpoint monitor scored, so it is what
    export/serving get. Host numpy leaves."""
    path = _dir(base_dir, role)
    wait_for_checkpoints()
    state = _checkpointer().restore(path)
    if "params" not in state:
        raise ValueError(f"{path} is not a training checkpoint (no 'params' subtree)")
    key = "ema_params" if "ema_params" in state else "params"
    return jax.tree_util.tree_map(np.asarray, state[key])
