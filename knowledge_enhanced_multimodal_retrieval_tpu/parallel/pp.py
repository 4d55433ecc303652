"""Pipeline parallelism: GPipe-style microbatch pipelining over a mesh axis.

The reference's only parallelism is single-node data parallelism
(``src/clip/train/trainer.py:44-49``); this module is the framework's
scaling path for towers DEEPER than one chip's HBM — stage the layer stack
over a ``pipe`` mesh axis and stream microbatches through it, activations
hopping stage-to-stage over ICI via ``lax.ppermute``.

TPU-native design (vs a torch-style scheduler):

- The whole schedule is ONE compiled program: a ``lax.scan`` over
  ``M + S - 1`` ticks inside ``shard_map``. No host round trips between
  microbatches, no per-stage processes — XLA sees the full dataflow and
  overlaps each tick's ppermute with the next tick's compute.
- Stage parameters are a stacked pytree (leading axis = stage) sharded over
  the ``pipe`` axis, so each device materializes only its own stage —
  this is what makes N-times-deeper models fit.
- Differentiable end-to-end: ``jax.grad`` through the scan/ppermute yields
  the reverse pipeline (grads hop backwards), so the same primitive serves
  training; combine with a ``data`` axis for DP×PP.

CLIP itself (≤24-layer towers) does not need PP — DP×TP covers it
(``parallel/tp.py``); this exists so the framework scales past CLIP and is
exercised on the real CLIP block stack in ``tests/test_pp.py`` and the
multi-chip dry run.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_stages(per_layer_params: list, num_stages: int) -> Any:
    """Group a list of per-layer param pytrees into a stacked stage pytree.

    ``L`` layers split into ``num_stages`` contiguous stages of ``L/S``
    layers; every leaf gains leading axes ``[S, L/S]``. Shard axis 0 over
    the ``pipe`` mesh axis (see :func:`stage_sharding`).
    """
    n = len(per_layer_params)
    if n % num_stages:
        raise ValueError(f"{n} layers do not split into {num_stages} equal stages")
    per_stage = n // num_stages
    stacked_layers = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *per_layer_params)
    return jax.tree_util.tree_map(
        lambda leaf: leaf.reshape((num_stages, per_stage) + leaf.shape[1:]), stacked_layers
    )


def stage_sharding(mesh: Mesh, stage_params: Any, axis: str = "pipe") -> Any:
    """NamedShardings placing each stage's slice on its pipeline device."""
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, P(axis, *([None] * (leaf.ndim - 1)))), stage_params
    )


def pipeline_apply(
    layer_fn: Callable[[Any, jax.Array], jax.Array],
    stage_params: Any,
    xs: jax.Array,
    mesh: Mesh,
    axis: str = "pipe",
) -> jax.Array:
    """Run microbatches through the staged layer stack; returns their outputs.

    - ``layer_fn(params_one_layer, x) -> y`` with ``y.shape == x.shape``
      (a residual transformer block).
    - ``stage_params``: pytree with leading axes ``[S, L/S]`` (from
      :func:`stack_stages`), sharded ``P(axis)`` on axis 0.
    - ``xs``: ``[M, mb, ...]`` microbatches, replicated.

    Output ``[M, mb, ...]``, replicated. Jit-safe and differentiable; the
    schedule is the classic GPipe fill/steady/drain — utilization
    ``M / (M + S - 1)``, so feed several microbatches per step.
    """
    if axis not in mesh.shape:
        raise ValueError(f"mesh has no axis {axis!r}: {dict(mesh.shape)}")
    num_stages = mesh.shape[axis]
    num_micro = xs.shape[0]
    replicated = P(*([None] * xs.ndim))

    def per_device(sp, xs_local):
        s = jax.lax.axis_index(axis)
        my_params = jax.tree_util.tree_map(lambda leaf: leaf[0], sp)  # [L/S, ...]

        def stage_fn(x):
            def body(h, one_layer):
                return layer_fn(one_layer, h), None

            out, _ = jax.lax.scan(body, x, my_params)
            return out

        def tick(carry, t):
            act, outs = carry
            # stage 0 ingests microbatch t during the fill/steady phase
            m_in = jnp.clip(t, 0, num_micro - 1)
            x_in = jax.lax.dynamic_index_in_dim(xs_local, m_in, keepdims=False)
            h = jnp.where(s == 0, x_in, act)
            y = stage_fn(h)
            # the last stage drains microbatch t-(S-1)
            m_out = jnp.clip(t - (num_stages - 1), 0, num_micro - 1)
            valid = (s == num_stages - 1) & (t >= num_stages - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, m_out, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(valid, y, cur), m_out, 0
            )
            # activation hop over ICI (ring; the wraparound edge is unused data)
            nxt = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % num_stages) for i in range(num_stages)]
            )
            return (nxt, outs), None

        init = (jnp.zeros_like(xs_local[0]), jnp.zeros_like(xs_local))
        (_, outs), _ = jax.lax.scan(tick, init, jnp.arange(num_micro + num_stages - 1))
        # outs is populated only on the last stage; psum replicates it
        outs = jax.lax.psum(jnp.where(s == num_stages - 1, outs, 0), axis)
        return outs

    # non-pipe mesh axes (e.g. data) see replicated operands here; callers
    # compose DP outside (shard xs over "data" before calling).
    other_axes = tuple(a for a in mesh.axis_names if a != axis)
    in_spec_params = jax.tree_util.tree_map(
        lambda leaf: P(axis, *([None] * (leaf.ndim - 1))), stage_params
    )
    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(in_spec_params, replicated),
        out_specs=replicated,
        check_rep=False,
    )
    del other_axes
    return fn(stage_params, xs)
