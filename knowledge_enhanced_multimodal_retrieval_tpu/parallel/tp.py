"""Tensor-parallel parameter sharding for the CLIP towers.

The reference is data-parallel only (``src/clip/train/trainer.py:44-49``,
NCCL DDP — SURVEY §2 parallelism inventory); tensor parallelism is this
framework's optional extension for towers whose optimizer state outgrows a
single chip (ViT-L/14 train state is ~5 GB; bigger towers or Adam-heavy
recipes want a ``model`` axis).

Design: Megatron-style column/row-parallel specs expressed as
``PartitionSpec`` annotations on the *parameters only* — XLA's SPMD
partitioner propagates the shardings through the forward/backward graph and
inserts the all-reduces (over ICI) at the row-parallel projections. No model
code changes, no manual collectives:

- ``attn/in_proj``  kernel ``[w, 3w]``  -> ``P(None, model)`` (column)
- ``attn/out_proj`` kernel ``[w, w]``   -> ``P(model, None)`` (row)
- ``mlp/c_fc``      kernel ``[w, 4w]``  -> ``P(None, model)`` (column)
- ``mlp/c_proj``    kernel ``[4w, w]``  -> ``P(model, None)`` (row)
- column-parallel biases shard with their outputs; row-parallel biases,
  LayerNorms, embeddings, and projections replicate.

The fused qkv output dim (OpenAI layout, ``models/clip.py::Attention``)
splits as ``[q|k|v]``; sharding it is still correct under SPMD (the
partitioner reshards around the head reshape when the tp degree does not
align with the q/k/v boundaries) — correctness is pinned by
``tests/test_tp.py`` against the data-parallel step.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COLUMN = ("in_proj", "c_fc")  # output-dim sharded, bias sharded
_ROW = ("out_proj", "c_proj")  # input-dim sharded, bias replicated


def tp_param_pspecs(params: Any, model_axis: str = "model") -> Any:
    """PartitionSpec pytree for a CLIP param tree (Megatron column/row rules).

    Works on the full two-tower tree or any subtree (e.g. ``params["text"]``
    for the serving text tower). Leaves that match no rule replicate.
    """

    def spec(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", None)) for k in path]
        module = names[-2] if len(names) >= 2 else None
        kind = names[-1]
        if module in _COLUMN:
            if kind == "kernel":
                return P(None, model_axis)
            if kind == "bias":
                return P(model_axis)
        if module in _ROW and kind == "kernel":
            return P(model_axis, None)
        return P(*([None] * leaf.ndim))

    return jax.tree_util.tree_map_with_path(spec, params)


def tp_shardings(params: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    """NamedSharding pytree: tp specs over ``mesh`` (data axis unused by
    params — replicated across it, as in the DP step)."""
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), tp_param_pspecs(params, model_axis)
    )


def shard_params_tp(params: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    """Place a param tree onto ``mesh`` with tensor-parallel shardings."""
    return jax.device_put(params, tp_shardings(params, mesh, model_axis))
