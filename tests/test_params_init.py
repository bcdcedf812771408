"""init_params' vmapped layer initialisation must be bit-identical to
stacking per-layer inits (the r1-r3 implementation): JAX random primitives
batch per-key, so vmap over split keys reproduces the exact draws."""

import jax
import jax.numpy as jnp

from apertis_llm_tpu.config import ApertisConfig
from apertis_llm_tpu.models.params import init_layer_params, init_params


def test_vmapped_layer_init_matches_per_layer_stack():
    config = ApertisConfig(
        vocab_size=101, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64,
        attention_type="selective_ssm", ssm_d_state=4)
    params = init_params(jax.random.PRNGKey(0), config)

    # Reproduce the pre-vmap implementation for the layer stack.
    rngs = list(jax.random.split(jax.random.PRNGKey(0), 6))
    layer_rngs = list(jax.random.split(rngs[4], config.num_hidden_layers))
    dtype = jnp.dtype(config.param_dtype)
    per_layer = [init_layer_params(r, config, dtype) for r in layer_rngs]
    expected = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)

    jax.tree.map(
        lambda a, b: None if jnp.array_equal(a, b) else (_ for _ in ()).throw(
            AssertionError("vmapped init diverged from per-layer stack")),
        params["layers"], expected)


def test_init_compiles_with_one_layer_body():
    """The init program's jaxpr must not grow with depth (the compile-time
    fix): equation count at L=2 and L=8 should match."""
    def eqns(layers):
        config = ApertisConfig(
            vocab_size=101, hidden_size=32, num_hidden_layers=layers,
            num_attention_heads=4, intermediate_size=64)
        jaxpr = jax.make_jaxpr(lambda r: init_params(r, config))(
            jax.random.PRNGKey(0))
        return len(jaxpr.jaxpr.eqns)

    assert eqns(2) == eqns(8)
