"""MoE dispatch-path equivalence and determinism (SURVEY.md §4: add the MoE
dispatch-determinism tests the reference lacked)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from apertis_llm_tpu.ops import moe as moe_ops


def _setup(s=64, h=32, inter=64, e=4, k=2, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(s, h)), jnp.float32)
    params = {
        "ln_w": jnp.ones((e, h)),
        "ln_b": jnp.zeros((e, h)),
        "w1": jnp.asarray(rng.normal(size=(e, h, inter)) * 0.05, jnp.float32),
        "b1": jnp.zeros((e, inter)),
        "w2": jnp.asarray(rng.normal(size=(e, inter, h)) * 0.05, jnp.float32),
        "b2": jnp.zeros((e, h)),
    }
    router = {
        "ln_w": jnp.ones((h,)), "ln_b": jnp.zeros((h,)),
        "w": jnp.asarray(rng.normal(size=(h, e)) * 0.1, jnp.float32),
        "b": jnp.zeros((e,)),
    }
    routing = moe_ops.route(
        x, router["ln_w"], router["ln_b"], router["w"], router["b"], k,
        layer_norm_eps=1e-12)
    return x, routing, params


def test_ragged_equals_dense():
    x, routing, params = _setup()
    dense = moe_ops.moe_dense(x, routing, params, "gelu", 1e-12)
    ragged = moe_ops.moe_ragged(x, routing, params, "gelu", 1e-12)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(ragged),
                               rtol=1e-5, atol=1e-5)


def test_dispatch_with_ample_capacity_equals_dense():
    x, routing, params = _setup()
    dense = moe_ops.moe_dense(x, routing, params, "gelu", 1e-12)
    dispatched = moe_ops.moe_dispatch(x, routing, params, "gelu", 1e-12,
                                      capacity=x.shape[0] * 2)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(dispatched),
                               rtol=1e-5, atol=1e-5)


def test_dispatch_determinism():
    x, routing, params = _setup()
    a = moe_ops.moe_dispatch(x, routing, params, "gelu", 1e-12, capacity=8)
    b = moe_ops.moe_dispatch(x, routing, params, "gelu", 1e-12, capacity=8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_capacity_drops_overflow_gracefully():
    x, routing, params = _setup()
    tight = moe_ops.moe_dispatch(x, routing, params, "gelu", 1e-12, capacity=1)
    assert np.isfinite(np.asarray(tight)).all()
    # Some tokens must differ from the uncapped result (drops happened).
    full = moe_ops.moe_dense(x, routing, params, "gelu", 1e-12)
    assert not np.allclose(np.asarray(tight), np.asarray(full))


def test_expert_dropout_mask_keeps_one():
    mask = moe_ops.expert_dropout_mask(jax.random.PRNGKey(0), 4, 0.99)
    assert int(jnp.sum(mask)) >= 1


def test_ragged_grads_match_dense():
    x, routing, params = _setup(s=32)

    def loss(fn, params):
        return jnp.sum(fn(x, routing, params, "gelu", 1e-12) ** 2)

    gd = jax.grad(lambda p: loss(moe_ops.moe_dense, p))(params)
    gr = jax.grad(lambda p: loss(moe_ops.moe_ragged, p))(params)
    for key in gd:
        np.testing.assert_allclose(np.asarray(gd[key]), np.asarray(gr[key]),
                                   rtol=1e-4, atol=1e-5, err_msg=key)
