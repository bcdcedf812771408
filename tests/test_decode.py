"""Decode-path consistency: prefill + single-token cached decode must produce
the same logits as the full-sequence forward, for both mixer types."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from apertis_llm_tpu.config import ApertisConfig
from apertis_llm_tpu.models import apertis as model_lib
from apertis_llm_tpu.models.params import init_params

BASE = dict(
    vocab_size=101,
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=128,
    max_position_embeddings=64,
    hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0,
    decode_max_length=32,
)

VARIANTS = {
    "mha": {},
    "ssm": dict(attention_type="selective_ssm", ssm_d_state=8),
    "mha_moe": dict(use_expert_system=True, num_experts=4, experts_per_token=2),
    "ssm_swiglu": dict(attention_type="selective_ssm", ssm_d_state=8,
                       use_swiglu=True, use_rmsnorm=True),
}


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_prefill_decode_matches_full_forward(variant):
    cfg = dict(BASE)
    cfg.update(VARIANTS[variant])
    config = ApertisConfig.from_dict(cfg)
    params = init_params(jax.random.PRNGKey(0), config)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, config.vocab_size, size=(2, 10)))

    full = model_lib.forward(params, config, ids).logits

    prefix = 6
    cache = model_lib.init_cache(config, 2)
    pre = model_lib.prefill(params, config, cache, ids[:, :prefix])
    np.testing.assert_allclose(
        np.asarray(pre.logits[:, -1]), np.asarray(full[:, prefix - 1]),
        atol=2e-4, rtol=2e-4)

    cache, t = pre.cache, int(pre.length)
    for step in range(prefix, 10):
        logits, cache = model_lib.decode_step(
            params, config, cache, ids[:, step], jnp.asarray(t, jnp.int32))
        t += 1
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, step]),
            atol=2e-4, rtol=2e-4,
            err_msg=f"{variant}: step {step}")


def test_ssm_scan_parallel_equals_recurrent():
    """The associative scan must equal step-by-step recurrence."""
    from apertis_llm_tpu.ops import ssm as ssm_ops

    rng = np.random.default_rng(1)
    b, h, l, n = 2, 3, 33, 8
    a_bar = jnp.asarray(rng.uniform(0.3, 0.999, size=(b, h, l, n)), jnp.float32)
    b_term = jnp.asarray(rng.normal(size=(b, h, l, n)), jnp.float32)

    h_par, h_last = ssm_ops.selective_scan(a_bar, b_term)

    state = jnp.zeros((b, h, n), jnp.float32)
    for t in range(l):
        state = ssm_ops.selective_scan_step(state, a_bar[:, :, t], b_term[:, :, t])
        np.testing.assert_allclose(
            np.asarray(h_par[:, :, t]), np.asarray(state), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), np.asarray(state),
                               atol=1e-5, rtol=1e-5)


def test_ssm_scan_chunked_composition():
    """Chunked scans composed via carried state equal one full scan —
    the mechanism behind sequence-parallel SSM."""
    from apertis_llm_tpu.ops import ssm as ssm_ops

    rng = np.random.default_rng(2)
    b, h, l, n = 1, 2, 64, 4
    a_bar = jnp.asarray(rng.uniform(0.3, 0.999, size=(b, h, l, n)), jnp.float32)
    b_term = jnp.asarray(rng.normal(size=(b, h, l, n)), jnp.float32)

    h_full, _ = ssm_ops.selective_scan(a_bar, b_term)

    mid = 24
    h1, carry = ssm_ops.selective_scan(a_bar[:, :, :mid], b_term[:, :, :mid])
    h2, _ = ssm_ops.selective_scan(a_bar[:, :, mid:], b_term[:, :, mid:], h_init=carry)
    np.testing.assert_allclose(np.asarray(h_full[:, :, :mid]), np.asarray(h1),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h_full[:, :, mid:]), np.asarray(h2),
                               atol=1e-5, rtol=1e-5)
