"""Sequence-parallel SSM scan: sharded-L result equals the single-device scan."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from apertis_llm_tpu.ops.ssm import selective_scan
from apertis_llm_tpu.parallel.mesh import create_mesh
from apertis_llm_tpu.parallel.sequence import ssm_scan_sequence_parallel

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices")


def test_sequence_parallel_scan_matches_single_device():
    rng = np.random.default_rng(0)
    b, h, l, n = 2, 3, 256, 8    # L shards over 4 devices -> 64 per chunk
    a = jnp.asarray(rng.uniform(0.4, 0.999, (b, h, l, n)), jnp.float32)
    bt = jnp.asarray(rng.normal(size=(b, h, l, n)), jnp.float32)

    ref_h, ref_last = selective_scan(a, bt)

    mesh = create_mesh(jax.devices()[:4], (1, 4, 1))
    shard = NamedSharding(mesh, P(None, None, "model", None))
    a_s = jax.device_put(a, shard)
    b_s = jax.device_put(bt, shard)

    h, h_last = jax.jit(
        lambda a, b: ssm_scan_sequence_parallel(a, b, mesh, "model")
    )(a_s, b_s)

    np.testing.assert_allclose(np.asarray(h), np.asarray(ref_h),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), np.asarray(ref_last),
                               rtol=1e-5, atol=1e-5)
    # Output keeps the sequence sharding (no implicit gather of activations).
    assert h.sharding.spec == P(None, None, "model", None)


def test_sequence_parallel_grads_flow():
    rng = np.random.default_rng(1)
    b, h, l, n = 1, 2, 128, 4
    a = jnp.asarray(rng.uniform(0.4, 0.999, (b, h, l, n)), jnp.float32)
    bt = jnp.asarray(rng.normal(size=(b, h, l, n)), jnp.float32)

    mesh = create_mesh(jax.devices()[:4], (1, 4, 1))
    shard = NamedSharding(mesh, P(None, None, "model", None))
    a_s, b_s = jax.device_put(a, shard), jax.device_put(bt, shard)

    def loss_sp(a, b):
        return jnp.sum(ssm_scan_sequence_parallel(a, b, mesh, "model")[0] ** 2)

    def loss_ref(a, b):
        return jnp.sum(selective_scan(a, b)[0] ** 2)

    gsp = jax.jit(jax.grad(loss_sp, argnums=(0, 1)))(a_s, b_s)
    gref = jax.grad(loss_ref, argnums=(0, 1))(a, bt)
    np.testing.assert_allclose(np.asarray(gsp[0]), np.asarray(gref[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gsp[1]), np.asarray(gref[1]),
                               rtol=1e-4, atol=1e-4)
