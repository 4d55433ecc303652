"""Expert parallelism (parallel/ep.py): capacity-dispatch MoE pinned against
a per-token loop oracle, drop semantics, grads, and the sharded-vs-unsharded
identity on the expert mesh axis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from knowledge_enhanced_multimodal_retrieval_tpu.parallel.ep import (
    ep_shardings,
    init_moe_params,
    moe_apply,
    router_dispatch,
)


def _params(key=0, width=8, hidden=16, experts=4):
    return init_moe_params(jax.random.PRNGKey(key), width, hidden, experts)


def _oracle(params, x, k):
    """Per-token loop: top-k experts, renormalized gates, dense FFN each.
    Assumes ample capacity (no drops)."""
    xt = np.asarray(x, np.float64).reshape(-1, x.shape[-1])
    router = np.asarray(params["router"]["kernel"], np.float64)
    w_in = np.asarray(params["w_in"], np.float64)
    b_in = np.asarray(params["b_in"], np.float64)
    w_out = np.asarray(params["w_out"], np.float64)
    b_out = np.asarray(params["b_out"], np.float64)
    out = np.zeros_like(xt)
    for t in range(xt.shape[0]):
        logits = xt[t] @ router
        p = np.exp(logits - logits.max())
        p /= p.sum()
        top = np.argsort(-p)[:k]
        gates = p[top] / p[top].sum()
        for g, e in zip(gates, top):
            h = np.asarray(jax.nn.gelu(jnp.asarray(xt[t] @ w_in[e] + b_in[e])))
            out[t] += g * (h @ w_out[e] + b_out[e])
    return out.reshape(x.shape)


@pytest.mark.parametrize("k", [1, 2])
def test_moe_matches_loop_oracle(k):
    params = _params()
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 6, 8), jnp.float32)
    # ample capacity: every (token, choice) gets a slot → exact parity
    y, aux = moe_apply(params, x, k=k, capacity=3 * 6)
    np.testing.assert_allclose(np.asarray(y), _oracle(params, x, k), rtol=1e-5, atol=1e-5)
    assert np.isfinite(float(aux)) and float(aux) > 0


def test_moe_default_capacity_no_drop_when_balanced():
    """With uniform routing pressure and capacity_factor covering the load,
    default capacity matches the oracle too."""
    params = _params(width=4, hidden=8, experts=2)
    x = jax.random.normal(jax.random.PRNGKey(2), (16, 4), jnp.float32)
    y, _ = moe_apply(params, x, k=1, capacity_factor=2.0)
    np.testing.assert_allclose(np.asarray(y), _oracle(params, x, 1), rtol=1e-5, atol=1e-5)


def test_overflow_tokens_drop_to_zero():
    """Force every token onto expert 0 with capacity 2: tokens 0,1 keep
    their slots (GShard first-come order), the rest contribute zero."""
    params = _params(width=4, hidden=8, experts=2)
    # rig the router so expert 0 always wins by a mile
    params["router"]["kernel"] = jnp.zeros_like(params["router"]["kernel"]).at[:, 0].set(5.0)
    x = jnp.ones((5, 4), jnp.float32)  # identical tokens
    y, _ = moe_apply(params, x, k=1, capacity=2)
    y = np.asarray(y)
    want_kept = _oracle(params, x[:2], 1)
    np.testing.assert_allclose(y[:2], want_kept, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(y[2:], 0.0, atol=1e-7)


def test_dispatch_combine_shapes_and_slots():
    logits = jnp.asarray([[2.0, 0.0], [2.0, 0.0], [0.0, 2.0]], jnp.float32)
    dispatch, combine, aux = router_dispatch(logits, k=1, capacity=2)
    assert dispatch.shape == (3, 2, 2)
    d = np.asarray(dispatch)
    # token 0 → expert 0 slot 0; token 1 → expert 0 slot 1; token 2 → expert 1 slot 0
    assert d[0, 0, 0] == 1 and d[1, 0, 1] == 1 and d[2, 1, 0] == 1
    assert d.sum() == 3
    c = np.asarray(combine)
    np.testing.assert_allclose(c.sum(axis=(1, 2)), 1.0, rtol=1e-6)  # k=1 gates renormalize to 1


def test_moe_grads_flow():
    params = _params(width=4, hidden=8, experts=2)
    x = jax.random.normal(jax.random.PRNGKey(3), (6, 4), jnp.float32)

    def loss(p):
        y, aux = moe_apply(p, x, k=2, capacity=12)
        return jnp.sum(y**2) + 0.01 * aux

    grads = jax.grad(loss)(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # router must receive gradient through the gate values
    assert float(jnp.abs(grads["router"]["kernel"]).max()) > 0


def test_expert_sharded_matches_unsharded(devices8):
    """Experts placed on the mesh expert axis via GSPMD: jitted sharded
    result == the unsharded one (XLA inserts the collectives)."""
    mesh = Mesh(np.array(jax.devices()[:8]), ("expert",))
    params = _params(width=8, hidden=16, experts=8)
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 8, 8), jnp.float32)
    want, aux_want = moe_apply(params, x, k=2, capacity=16)

    sharded = jax.device_put(params, ep_shardings(mesh, params))
    got, aux_got = jax.jit(lambda p, x_: moe_apply(p, x_, k=2, capacity=16))(sharded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(aux_got), float(aux_want), rtol=1e-5)


def test_ep_shardings_validation(devices8):
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    with pytest.raises(ValueError, match="no axis"):
        ep_shardings(mesh, _params())
