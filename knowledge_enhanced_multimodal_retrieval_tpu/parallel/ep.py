"""Expert parallelism: mixture-of-experts MLP sharded over a mesh axis.

The reference has no MoE anywhere (SURVEY §2 parallelism table: "EP — NO");
CLIP's towers are dense. This module is the framework's expert-axis scaling
path for when a tower grows a sparse MLP: a GShard/Switch-style top-k
routed expert layer whose FLOPs per token stay constant while parameter
count scales with the number of experts.

TPU-native design (capacity-factor dense dispatch, NOT ragged gather):

- Routing produces fixed-shape one-hot dispatch/combine tensors
  ``[T, E, C]`` (C = per-expert capacity). Everything downstream is three
  einsums — dispatch ``[T,E,C]×[T,W]→[E,C,W]``, the per-expert FFN
  ``[E,C,W]×[E,W,H]→[E,C,H]``, combine back — so the whole layer is static
  shapes on the MXU with no data-dependent control flow, which is exactly
  what XLA wants (ragged per-expert gathers would force dynamic shapes).
- Expert parallelism is a *sharding annotation*, not hand-written comms:
  put the expert-stacked weights ``[E, ...]`` and the dispatched
  activations on ``PartitionSpec("expert", ...)`` (:func:`ep_shardings`)
  and jit — XLA's SPMD partitioner inserts the token all-to-alls over ICI.
  Same pattern as ``parallel/tp.py``.
- Tokens beyond an expert's capacity are dropped (their combine weight is
  zero → they pass through the residual only), the standard GShard
  behavior; capacity_factor trades padding FLOPs for drop rate.
- Aux load-balancing loss (Switch eq. 4: ``E · Σ_e f_e · P_e``) returned
  alongside, so a trainer can keep routing balanced.
- Differentiable end-to-end; the router runs in f32 for stable softmax.

Pinned against a per-token Python-loop oracle and the sharded-vs-unsharded
identity in ``tests/test_ep.py``; ep4 phase in ``__graft_entry__``'s
multi-chip dry run.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_moe_params(
    key: jax.Array,
    width: int,
    hidden: int,
    num_experts: int,
    dtype: Any = jnp.float32,
) -> Dict[str, Any]:
    """Router + expert-stacked FFN params.

    Layout: ``router.kernel [W, E]``; ``w_in [E, W, H]``, ``b_in [E, H]``,
    ``w_out [E, H, W]``, ``b_out [E, W]`` — the leading expert dim is the
    one :func:`ep_shardings` puts on the mesh ``expert`` axis.
    """
    kr, ki, ko = jax.random.split(key, 3)
    s_in = 1.0 / np.sqrt(width)
    s_out = 1.0 / np.sqrt(hidden)
    return {
        "router": {"kernel": (jax.random.normal(kr, (width, num_experts)) * s_in).astype(jnp.float32)},
        "w_in": (jax.random.normal(ki, (num_experts, width, hidden)) * s_in).astype(dtype),
        "b_in": jnp.zeros((num_experts, hidden), dtype),
        "w_out": (jax.random.normal(ko, (num_experts, hidden, width)) * s_out).astype(dtype),
        "b_out": jnp.zeros((num_experts, width), dtype),
    }


def _capacity(tokens: int, num_experts: int, k: int, capacity_factor: float) -> int:
    return max(1, int(np.ceil(tokens * k * capacity_factor / num_experts)))


def router_dispatch(
    logits: jax.Array, k: int, capacity: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Top-k routing → fixed-shape dispatch/combine tensors.

    ``logits`` ``[T, E]`` (f32). Returns ``(dispatch, combine, aux_loss)``:
    ``dispatch`` ``[T, E, C]`` one-hot {0,1}, ``combine`` the same support
    scaled by the renormalized top-k gate, ``aux_loss`` the Switch
    load-balancing scalar. Slot assignment is first-come-first-served in
    token order per (choice-rank, expert), the GShard convention; tokens
    that overflow an expert's capacity get zero combine weight there.
    """
    t, e = logits.shape
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)  # [T, E]
    gate_vals, gate_idx = jax.lax.top_k(probs, k)  # [T, k]
    gate_vals = gate_vals / jnp.maximum(gate_vals.sum(-1, keepdims=True), 1e-9)

    # one-hot expert choice per (token, rank): [T, k, E]
    choice = jax.nn.one_hot(gate_idx, e, dtype=jnp.float32)
    # position of each (token, rank) in its expert's queue: rank-0 choices
    # of all tokens first, then rank-1, ... (GShard ordering) — flatten
    # [k, T, E], cumsum over the k*T axis, un-flatten.
    flat = choice.transpose(1, 0, 2).reshape(k * t, e)
    pos_flat = jnp.cumsum(flat, axis=0) - flat  # 0-based slot index
    pos = pos_flat.reshape(k, t, e).transpose(1, 0, 2)  # [T, k, E]
    keep = (pos < capacity).astype(jnp.float32) * choice
    slot = jax.nn.one_hot(jnp.sum(pos * choice, axis=-1), capacity, dtype=jnp.float32)  # [T,k,C]
    # [T, k, E] x [T, k, C] -> [T, E, C]
    dispatch = jnp.einsum("tke,tkc->tec", keep, slot)
    combine = jnp.einsum("tke,tkc->tec", keep * gate_vals[..., None], slot)

    # Switch load-balance loss: E * sum_e mean_t(frac routed to e) * mean_t(P_e)
    frac = (choice.sum(1) > 0).astype(jnp.float32).mean(0)  # [E] fraction of tokens choosing e
    aux = e * jnp.sum(frac * probs.mean(0))
    return dispatch, combine, aux


def moe_apply(
    params: Dict[str, Any],
    x: jax.Array,
    k: int = 2,
    capacity_factor: float = 1.25,
    capacity: int | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Routed expert FFN (GELU), residual-free: returns ``(y, aux_loss)``.

    ``x`` ``[..., W]`` — leading dims flatten into the token axis. Output
    has ``x``'s shape and dtype; dropped (over-capacity) tokens contribute
    zero, so callers should use this inside a residual branch
    (``x + moe_apply(...)``) exactly like a dense MLP.
    """
    shape = x.shape
    w = shape[-1]
    xt = x.reshape(-1, w)
    t = xt.shape[0]
    e = params["router"]["kernel"].shape[1]
    c = capacity if capacity is not None else _capacity(t, e, k, capacity_factor)

    logits = xt.astype(jnp.float32) @ params["router"]["kernel"]
    dispatch, combine, aux = router_dispatch(logits, k, c)

    xe = jnp.einsum("tec,td->ecd", dispatch.astype(xt.dtype), xt)  # [E, C, W]
    h = jnp.einsum("ecd,edh->ech", xe, params["w_in"]) + params["b_in"][:, None, :]
    h = jax.nn.gelu(h)
    ye = jnp.einsum("ech,ehd->ecd", h, params["w_out"]) + params["b_out"][:, None, :]
    y = jnp.einsum("tec,ecd->td", combine.astype(xt.dtype), ye)
    return y.reshape(shape).astype(x.dtype), aux


def ep_shardings(mesh: Mesh, params: Dict[str, Any], axis: str = "expert") -> Dict[str, Any]:
    """NamedShardings putting the expert dim on ``axis``; router replicated.

    ``jax.device_put(params, ep_shardings(mesh, params))`` then jit
    :func:`moe_apply` — XLA partitions the three einsums over the expert
    axis and inserts the dispatch/combine all-to-alls itself.
    """
    if axis not in mesh.shape:
        raise ValueError(f"mesh has no axis {axis!r}: {dict(mesh.shape)}")

    def spec(path, leaf):
        name = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
        if "router" in name:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(axis, *([None] * (leaf.ndim - 1))))

    return jax.tree_util.tree_map_with_path(spec, params)
