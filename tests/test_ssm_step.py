"""Fused SSM decode-step kernel (ops/pallas/ssm_step.py): numerics vs the
plain XLA step, routing, and the attach-pack gates (interpret mode on CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from apertis_llm_tpu.config import ApertisConfig
from apertis_llm_tpu.models import apertis as model_lib
from apertis_llm_tpu.models.params import init_params
from apertis_llm_tpu.models.quantize import quantize_params
from apertis_llm_tpu.models.ssm_fuse import attach_fused_ssm_params, ssm_fusable


def _setup(hidden=64, heads=4, layers=2, vocab=128):
    config = ApertisConfig(
        vocab_size=vocab, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, intermediate_size=hidden * 2,
        attention_type="selective_ssm", ssm_d_state=16,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        max_position_embeddings=64)
    params = quantize_params(init_params(jax.random.PRNGKey(0), config),
                             min_size=0)
    return config, params


def test_fusable_and_attach():
    config, params = _setup()
    assert ssm_fusable(params, config)
    attached = attach_fused_ssm_params(params, config)
    fused = attached["layers"]["attn"]["fused"]
    c = config.num_attention_heads * config.ssm_d_state
    assert fused["xb_wq"].shape[-1] == c
    assert fused["xc_wq"].shape[-1] == c
    assert fused["a_row"].shape == (config.num_hidden_layers, 1, c)
    # every leaf layer-stacked (scan compatibility of the attached tree)
    for leaf in jax.tree_util.tree_leaves(fused):
        assert leaf.shape[0] == config.num_hidden_layers
    # MHA config: not fusable
    mha_cfg = ApertisConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128)
    mha_params = quantize_params(
        init_params(jax.random.PRNGKey(1), mha_cfg), min_size=0)
    assert not ssm_fusable(mha_params, mha_cfg)


def test_decode_step_fused_matches_plain():
    config, params = _setup()
    params = attach_fused_ssm_params(params, config)
    b = 4
    cache = model_lib.init_cache(config, b, max_length=16)
    # Warm the cache with a couple of plain steps so states are non-trivial.
    toks = jnp.asarray([3, 5, 7, 9], jnp.int32)
    _, cache = model_lib.decode_step(params, config, cache, toks,
                                     jnp.asarray(0, jnp.int32))
    _, cache = model_lib.decode_step(params, config, cache, toks + 1,
                                     jnp.asarray(1, jnp.int32))

    t = jnp.asarray(2, jnp.int32)
    logits_plain, cache_plain = model_lib.decode_step(
        params, config, cache, toks + 2, t)
    os.environ["APERTIS_SSM_STEP"] = "force"
    try:
        jaxpr = jax.make_jaxpr(
            lambda p, c: model_lib.decode_step(p, config, c, toks + 2, t)
        )(params, cache)
        assert "pallas_call" in str(jaxpr), "fused SSM step not routed"
        logits_fused, cache_fused = model_lib.decode_step(
            params, config, cache, toks + 2, t)
    finally:
        del os.environ["APERTIS_SSM_STEP"]

    scale = float(jnp.max(jnp.abs(logits_plain))) + 1e-6
    err = float(jnp.max(jnp.abs(logits_fused - logits_plain))) / scale
    assert err < 3e-2, err
    assert jnp.array_equal(jnp.argmax(logits_plain, -1),
                           jnp.argmax(logits_fused, -1))
    # carried states match (conv window exactly minus int8 rounding; ssm f32)
    dc = float(jnp.max(jnp.abs(
        cache_fused["conv"].astype(jnp.float32)
        - cache_plain["conv"].astype(jnp.float32))))
    ds = float(jnp.max(jnp.abs(cache_fused["ssm"] - cache_plain["ssm"])))
    ref = float(jnp.max(jnp.abs(cache_plain["ssm"]))) + 1e-6
    assert dc < 2e-2, dc
    assert ds / ref < 3e-2, (ds, ref)


def test_engine_moe_fused_router_matches_plain():
    """MoE flagship decode with the in-kernel router + fat-kernel chain:
    greedy tokens match the plain (XLA route + fat) path."""
    config = ApertisConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        attention_type="selective_ssm", ssm_d_state=16,
        use_expert_system=True, num_experts=4, experts_per_token=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        max_position_embeddings=64)
    params = quantize_params(init_params(jax.random.PRNGKey(2), config),
                             min_size=0)
    from apertis_llm_tpu.inference.engine import InferenceEngine

    prompt = np.asarray([[1, 17, 93, 40]], np.int32)
    os.environ["APERTIS_SSM_STEP"] = "0"
    try:
        plain = InferenceEngine(config, params).generate(
            prompt, max_new_tokens=6, eos_token_id=(), do_sample=False,
            rng=jax.random.PRNGKey(0))
    finally:
        os.environ["APERTIS_SSM_STEP"] = "force"
    try:
        fused = InferenceEngine(config, params).generate(
            prompt, max_new_tokens=6, eos_token_id=(), do_sample=False,
            rng=jax.random.PRNGKey(0))
    finally:
        del os.environ["APERTIS_SSM_STEP"]
    assert plain.tolist() == fused.tolist()


def test_engine_generate_fused_matches_plain():
    config, params = _setup(vocab=256)
    from apertis_llm_tpu.inference.engine import InferenceEngine

    prompt = np.asarray([[1, 17, 93, 40]], np.int32)
    os.environ["APERTIS_SSM_STEP"] = "0"
    try:
        plain = InferenceEngine(config, params).generate(
            prompt, max_new_tokens=6, eos_token_id=(), do_sample=False,
            rng=jax.random.PRNGKey(0))
    finally:
        os.environ["APERTIS_SSM_STEP"] = "force"
    try:
        fused = InferenceEngine(config, params).generate(
            prompt, max_new_tokens=6, eos_token_id=(), do_sample=False,
            rng=jax.random.PRNGKey(0))
    finally:
        del os.environ["APERTIS_SSM_STEP"]
    assert plain.tolist() == fused.tolist()


def _setup_bf16(hidden=64, heads=4, layers=2, vocab=128):
    """Non-quantized tree: the kernel's bf16 weight layout (VERDICT r4
    item 7 — bf16 serving must not fall back to the unfused round-2 path)."""
    config = ApertisConfig(
        vocab_size=vocab, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, intermediate_size=hidden * 2,
        attention_type="selective_ssm", ssm_d_state=16,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        max_position_embeddings=64)
    return config, init_params(jax.random.PRNGKey(0), config)


def test_fusable_and_attach_bf16():
    config, params = _setup_bf16()
    assert ssm_fusable(params, config)
    attached = attach_fused_ssm_params(params, config)
    fused = attached["layers"]["attn"]["fused"]
    c = config.num_attention_heads * config.ssm_d_state
    assert "inx_w" in fused and "inx_wq" not in fused
    assert fused["xb_w"].shape[-1] == c
    assert fused["out_w"].shape[-1] == config.hidden_size
    for leaf in jax.tree_util.tree_leaves(fused):
        assert leaf.shape[0] == config.num_hidden_layers
    # a mixed tree (quantized in_proj_x only) is NOT fusable
    import copy
    mixed = copy.deepcopy(params)
    from apertis_llm_tpu.models.quantize import quantize_weight
    wq, ws = quantize_weight(mixed["layers"]["attn"]["in_proj_x"].pop("w"))
    mixed["layers"]["attn"]["in_proj_x"].update({"w_q": wq, "w_s": ws})
    assert not ssm_fusable(mixed, config)


def test_decode_step_fused_matches_plain_bf16():
    """bf16 pack: no activation quantization — the fused step matches the
    plain XLA step to accumulation-order tolerance and tokens exactly."""
    config, params = _setup_bf16()
    params = attach_fused_ssm_params(params, config)
    b = 4
    cache = model_lib.init_cache(config, b, max_length=16)
    toks = jnp.asarray([3, 5, 7, 9], jnp.int32)
    _, cache = model_lib.decode_step(params, config, cache, toks,
                                     jnp.asarray(0, jnp.int32))
    t = jnp.asarray(1, jnp.int32)
    logits_plain, cache_plain = model_lib.decode_step(
        params, config, cache, toks + 1, t)
    os.environ["APERTIS_SSM_STEP"] = "force"
    try:
        jaxpr = jax.make_jaxpr(
            lambda p, c: model_lib.decode_step(p, config, c, toks + 1, t)
        )(params, cache)
        assert "pallas_call" in str(jaxpr), "fused SSM step not routed"
        logits_fused, cache_fused = model_lib.decode_step(
            params, config, cache, toks + 1, t)
    finally:
        del os.environ["APERTIS_SSM_STEP"]
    scale = float(jnp.max(jnp.abs(logits_plain))) + 1e-6
    err = float(jnp.max(jnp.abs(logits_fused - logits_plain))) / scale
    assert err < 2e-3, err
    assert jnp.array_equal(jnp.argmax(logits_plain, -1),
                           jnp.argmax(logits_fused, -1))
    ds = float(jnp.max(jnp.abs(cache_fused["ssm"] - cache_plain["ssm"])))
    ref = float(jnp.max(jnp.abs(cache_plain["ssm"]))) + 1e-6
    assert ds / ref < 2e-3, (ds, ref)


def test_engine_generate_fused_bf16_matches_plain():
    """Full bf16 serving chain — fused mixer kernel + bf16 fused dense-FFN
    kernel (ffn_mode='dense') — greedy-token-exact vs the plain path."""
    config, params = _setup_bf16(vocab=256)
    from apertis_llm_tpu.inference.engine import InferenceEngine

    prompt = np.asarray([[1, 17, 93, 40]], np.int32)
    os.environ["APERTIS_SSM_STEP"] = "0"
    try:
        plain = InferenceEngine(config, params).generate(
            prompt, max_new_tokens=6, eos_token_id=(), do_sample=False,
            rng=jax.random.PRNGKey(0))
    finally:
        os.environ["APERTIS_SSM_STEP"] = "force"
    os.environ["APERTIS_FFN_FUSED"] = "force"
    try:
        engine = InferenceEngine(config, params)
        fused = engine.generate(
            prompt, max_new_tokens=6, eos_token_id=(), do_sample=False,
            rng=jax.random.PRNGKey(0))
    finally:
        del os.environ["APERTIS_SSM_STEP"]
        del os.environ["APERTIS_FFN_FUSED"]
    assert plain.tolist() == fused.tolist()
