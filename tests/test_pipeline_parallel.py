"""GPipe pipeline parallelism: sharded-stage forward/backward equals the
plain scan-over-layers result."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from apertis_llm_tpu.parallel.mesh import create_mesh
from apertis_llm_tpu.parallel.pipeline import (
    microbatch, pipeline_apply, shard_layers_for_pipeline)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices")


def _mlp_layer(lp, h):
    return h + jnp.tanh(h @ lp["w"]) * lp["g"]


def _make(num_layers=8, d=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "w": jnp.asarray(rng.normal(size=(num_layers, d, d)) * 0.3, jnp.float32),
        "g": jnp.asarray(rng.normal(size=(num_layers, 1, d)) * 0.5, jnp.float32),
    }


def _reference(params, x):
    def scan_fn(h, lp):
        return _mlp_layer(lp, h), None

    h, _ = jax.lax.scan(scan_fn, x, params)
    return h


def test_pipeline_forward_matches_scan():
    d = 16
    params = _make()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 4, d)), jnp.float32)  # (B, T, D)

    ref = _reference(params, x)

    mesh = create_mesh(jax.devices()[:4], (1, 4, 1))
    sharded = shard_layers_for_pipeline(params, mesh, "model")
    mb = microbatch(x, 4)                                     # (M, mB, T, D)
    out = jax.jit(lambda p, i: pipeline_apply(p, i, _mlp_layer, mesh, "model"))(
        sharded, mb)
    out = out.reshape(8, 4, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_backward_matches_scan():
    d = 16
    params = _make(num_layers=4)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 2, d)), jnp.float32)

    mesh = create_mesh(jax.devices()[:2], (1, 2, 1))
    sharded = shard_layers_for_pipeline(params, mesh, "model")

    def loss_pp(p):
        out = pipeline_apply(p, microbatch(x, 2), _mlp_layer, mesh, "model")
        return jnp.sum(out ** 2)

    def loss_ref(p):
        return jnp.sum(_reference(p, x) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(sharded)
    g_ref = jax.grad(loss_ref)(params)
    for key in params:
        np.testing.assert_allclose(np.asarray(g_pp[key]), np.asarray(g_ref[key]),
                                   rtol=1e-4, atol=1e-5, err_msg=key)
