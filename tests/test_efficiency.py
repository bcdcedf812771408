"""Efficiency invariants (structural, not timing-based — the reference's
timing assertions were flaky, SURVEY.md §4 on test_efficiency.py).

Checks the properties that make decode O(1)/O(n): constant-size SSM decode
state, cache memory independent of generated length for SSM, and the engine's
while_loop decode touching only static-shape buffers.
"""

import numpy as np

import jax
import jax.numpy as jnp

from apertis_llm_tpu.config import ApertisConfig
from apertis_llm_tpu.models import apertis as model_lib
from apertis_llm_tpu.models.params import init_params


def _cfg(**over):
    base = dict(vocab_size=64, hidden_size=64, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=128,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    base.update(over)
    return ApertisConfig.from_dict(base)


def test_ssm_decode_state_is_constant_size():
    """The selective-SSM cache is O(1) in sequence length — the architecture's
    long-context claim (reference markets O(1) recurrent decode state,
    core.py:337-353)."""
    config = _cfg(attention_type="selective_ssm", ssm_d_state=8)
    small = model_lib.init_cache(config, batch_size=1, max_length=64)
    large = model_lib.init_cache(config, batch_size=1, max_length=4096)
    assert jax.tree.map(lambda x: x.shape, small) == \
        jax.tree.map(lambda x: x.shape, large)
    total = sum(x.size for x in jax.tree.leaves(small))
    # conv window (K-1, d_inner) + ssm state (H, N) per layer
    expected = config.num_hidden_layers * (
        (config.ssm_conv_kernel - 1) * config.ssm_d_inner
        + config.num_attention_heads * config.ssm_d_state)
    assert total == expected


def test_mha_cache_scales_linearly():
    config = _cfg()
    c64 = model_lib.init_cache(config, 1, max_length=64)
    c128 = model_lib.init_cache(config, 1, max_length=128)
    assert sum(x.size for x in jax.tree.leaves(c128)) == \
        2 * sum(x.size for x in jax.tree.leaves(c64))


def test_decode_step_flops_independent_of_history():
    """The compiled decode step's cost model must not grow with how many
    tokens were generated — same jaxpr for any t."""
    config = _cfg(attention_type="selective_ssm", ssm_d_state=8)
    params = init_params(jax.random.PRNGKey(0), config)
    cache = model_lib.init_cache(config, 1, max_length=32)

    def step(t):
        return model_lib.decode_step(
            params, config, cache, jnp.asarray([5]), jnp.asarray(t, jnp.int32))

    jaxpr_early = jax.make_jaxpr(step)(1)
    jaxpr_late = jax.make_jaxpr(step)(30)
    assert str(jaxpr_early) == str(jaxpr_late)


def test_generate_compiles_once_per_bucket():
    """Prompt-length bucketing bounds recompilation."""
    from apertis_llm_tpu.inference.engine import InferenceEngine

    config = _cfg(attention_type="selective_ssm", ssm_d_state=8)
    params = init_params(jax.random.PRNGKey(0), config)
    engine = InferenceEngine(config, params)
    for l in (3, 9, 17, 30):
        prompt = np.full((1, l), 5, np.int32)
        engine.generate(prompt, max_new_tokens=2, eos_token_id=())
    # all four prompts share the 32-bucket -> exactly one compiled program
    # set: one prefill + one decode-loop in split mode (SSM default; the
    # decode length is dynamic so max_new_tokens never forks a key), or a
    # single monolithic program otherwise.
    gen_keys = [k for k in engine._compiled if not isinstance(k[0], str)]
    pf_keys = [k for k in engine._compiled if k[0] == "split_prefill"]
    dec_keys = [k for k in engine._compiled if k[0] == "split_decode"]
    if pf_keys:
        assert len(pf_keys) == 1 and len(dec_keys) == 1 and not gen_keys
    else:
        assert len(gen_keys) == 1
