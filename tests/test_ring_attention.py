"""Ring attention equals single-device attention (values + gradients)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from apertis_llm_tpu.ops.attention import mha
from apertis_llm_tpu.parallel.mesh import create_mesh
from apertis_llm_tpu.parallel.ring_attention import ring_attention

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices")


def _qkv(l=128, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(2, 3, l, 32)), jnp.float32)
    return mk(), mk(), mk()


@pytest.mark.parametrize("causal", [True, False])
def test_ring_attention_matches_mha(causal):
    q, k, v = _qkv()
    ref = mha(q, k, v, causal=causal)

    mesh = create_mesh(jax.devices()[:4], (1, 4, 1))
    shard = NamedSharding(mesh, P(None, None, "model", None))
    qs, ks, vs = (jax.device_put(x, shard) for x in (q, k, v))
    out = jax.jit(lambda q, k, v: ring_attention(
        q, k, v, mesh, "model", causal))(qs, ks, vs)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    assert out.sharding.spec == P(None, None, "model", None)


def test_ring_attention_grads_match():
    q, k, v = _qkv(l=64, seed=1)
    mesh = create_mesh(jax.devices()[:4], (1, 4, 1))
    shard = NamedSharding(mesh, P(None, None, "model", None))
    qs, ks, vs = (jax.device_put(x, shard) for x in (q, k, v))

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh, "model", True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha(q, k, v, causal=True) ** 2)

    gr = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(qs, ks, vs)
    gref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gr, gref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{name}")
