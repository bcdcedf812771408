#!/usr/bin/env python
"""Cold serving bring-up probe: time each stage of a fresh process's path to
its first b256 token, one JSON line per stage (stderr shows progress).

Stages timed (1.5B int8 multimodal selective-SSM, the bench flagship):
  init        jit(init_params) trace+compile+run
  quantize    jit(quantize_params) trace+compile+run
  engine      InferenceEngine construction (fused packs, int8 head)
  prefill     the stream-path prefill program (image+text, logit_positions)
  step        the stream-path single-decode-step program
  ttft        the monolithic generate program, max_new_tokens=1
  short       the monolithic generate program, max_new_tokens=16

Env: APERTIS_COMPILE_EFFORT / APERTIS_COMPILE_LHS are read by the engine's
_compiler_options; APERTIS_PROBE_STAGES=comma-list restricts stages;
APERTIS_PROBE_TAG labels the output rows.

Usage (never timeout-kill this process once it touched the TPU):
  python tools/compile_probe.py 2>&1 | tee /tmp/probe_<tag>.log
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import logging

logging.disable(logging.WARNING)

TAG = os.environ.get("APERTIS_PROBE_TAG", "baseline")
STAGES = set(os.environ.get(
    "APERTIS_PROBE_STAGES",
    "init,quantize,engine,prefill,step,ttft,short").split(","))


def emit(stage, seconds, **extra):
    row = {"tag": TAG, "stage": stage, "seconds": round(seconds, 2)}
    row.update(extra)
    print(json.dumps(row), flush=True)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from apertis_llm_tpu.config import ApertisConfig
    from apertis_llm_tpu.models.factory import calculate_model_dimensions
    from apertis_llm_tpu.models.params import count_params, init_params
    from apertis_llm_tpu.models.quantize import quantize_params
    from apertis_llm_tpu.inference.engine import GenerationParams, InferenceEngine
    from apertis_llm_tpu.models import apertis as model_lib

    preset = os.environ.get("APERTIS_PROBE_PRESET", "1.5B")
    if preset == "tiny":
        jax.config.update("jax_platforms", "cpu")
        cfg = dict(hidden_size=256, num_hidden_layers=2,
                   num_attention_heads=4, intermediate_size=512,
                   vision_layers=2, vision_heads=4, vision_embed_dim=128,
                   image_size=64)
    else:
        dims = calculate_model_dimensions(preset, 32000)
        cfg = dict(hidden_size=dims["hidden_size"],
                   num_hidden_layers=dims["num_hidden_layers"],
                   num_attention_heads=dims["num_attention_heads"],
                   intermediate_size=dims["intermediate_size"])
    config = ApertisConfig(
        vocab_size=32000, attention_type="selective_ssm", ssm_d_state=16,
        multimodal=True, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, max_position_embeddings=4096,
        dtype="bfloat16", param_dtype="bfloat16", **cfg)

    # Backend bring-up constant: first trivial device op (device client +
    # libtpu init + first tiny compile through the tunnel).
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.ones(()) + 1.0)
    emit("warmup", time.perf_counter() - t0)

    t0 = time.perf_counter()
    params = jax.jit(lambda rng: init_params(rng, config))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    emit("init", time.perf_counter() - t0,
         params_b=round(count_params(params) / 1e9, 3))

    t0 = time.perf_counter()
    params = jax.jit(quantize_params)(params)
    jax.block_until_ready(params)
    emit("quantize", time.perf_counter() - t0)

    t0 = time.perf_counter()
    engine = InferenceEngine(config, params)
    jax.block_until_ready(engine.params)
    emit("engine", time.perf_counter() - t0)

    batch = int(os.environ.get("APERTIS_PROBE_BATCH",
                               "256" if preset != "tiny" else "4"))
    prompt_len = 32
    num_img = config.num_image_tokens
    bucket = prompt_len + ((-(num_img + prompt_len)) % 8)
    r = np.random.default_rng(0)

    def fresh(seed):
        rr = np.random.default_rng(seed)
        ids = rr.integers(4, config.vocab_size,
                          size=(batch, prompt_len)).astype(np.int32)
        pix = rr.integers(0, 255, size=(batch, config.image_size,
                                        config.image_size, 3)).astype(np.uint8)
        return ids, pix

    if "prefill" in STAGES or "step" in STAGES:
        max_new = 16
        cache_len = num_img + bucket + max_new
        ids, pix = fresh(1)
        padded = np.pad(ids, ((0, 0), (0, bucket - prompt_len)))
        attn = np.pad(np.ones((batch, prompt_len), np.int32),
                      ((0, 0), (0, bucket - prompt_len)))
        cache = model_lib.init_cache(config, batch, max_length=cache_len)
        pix_dev = jax.device_put(pix)
        jax.block_until_ready(pix_dev)
        if "prefill" in STAGES:
            fn = engine._jit_prefill(cache_len, True)
            t0 = time.perf_counter()
            pre = fn(engine.params, cache, jnp.asarray(padded),
                     jnp.asarray(attn),
                     jnp.full((batch,), prompt_len - 1, jnp.int32),
                     pixel_values=pix_dev)
            jax.block_until_ready(pre.logits)
            emit("prefill", time.perf_counter() - t0)
            # warm re-run to split compile from run
            ids2, pix2 = fresh(2)
            padded2 = np.pad(ids2, ((0, 0), (0, bucket - prompt_len)))
            pix2 = jax.device_put(pix2)
            jax.block_until_ready(pix2)
            t0 = time.perf_counter()
            pre2 = fn(engine.params, cache, jnp.asarray(padded2),
                      jnp.asarray(attn),
                      jnp.full((batch,), prompt_len - 1, jnp.int32),
                      pixel_values=pix2)
            jax.block_until_ready(pre2.logits)
            emit("prefill_warm", time.perf_counter() - t0)
        if "step" in STAGES:
            fn = engine._jit_step()
            mask = np.zeros((batch, cache_len), np.int32)
            mask[:, :num_img + prompt_len] = 1
            tok = jnp.asarray(r.integers(4, 32000, size=(batch,)), jnp.int32)
            t0 = time.perf_counter()
            out = fn(engine.params, pre.cache, tok, num_img + bucket,
                     jnp.asarray(mask),
                     jnp.full((batch,), num_img + prompt_len, jnp.int32))
            jax.block_until_ready(out[0])
            emit("step", time.perf_counter() - t0)

    def time_monolith(stage, max_new, seed):
        gen = GenerationParams(max_new_tokens=max_new, eos_token_ids=(),
                               pad_token_id=0)
        fn = engine._get_fn(gen, bucket, batch, True)
        ids, pix = fresh(seed)
        padded = np.pad(ids, ((0, 0), (0, bucket - prompt_len)),
                        constant_values=0)
        attn = np.pad(np.ones((batch, prompt_len), np.int32),
                      ((0, 0), (0, bucket - prompt_len)))
        pix = jax.device_put(pix)
        jax.block_until_ready(pix)
        t0 = time.perf_counter()
        toks, _ = fn(engine.params, input_ids=jnp.asarray(padded),
                     attention_mask=jnp.asarray(attn),
                     rng=jax.random.PRNGKey(seed), pixel_values=pix)
        jax.block_until_ready(toks)
        emit(stage, time.perf_counter() - t0)

    def time_split(seed):
        from apertis_llm_tpu.inference.engine import GenerationParams as GP

        gen_key = GP(max_new_tokens=0, min_new_tokens=0, eos_token_ids=(),
                     pad_token_id=0)
        cap = engine._decode_cap(16)
        ids, pix = fresh(seed)
        padded = np.pad(ids, ((0, 0), (0, bucket - prompt_len)))
        attn = np.pad(np.ones((batch, prompt_len), np.int32),
                      ((0, 0), (0, bucket - prompt_len)))
        pix = jax.device_put(pix)
        jax.block_until_ready(pix)
        pf = engine._get_split_prefill(gen_key, bucket, batch, True, cap)
        t0 = time.perf_counter()
        state = pf(engine.params, input_ids=jnp.asarray(padded),
                   attention_mask=jnp.asarray(attn),
                   rng=jax.random.PRNGKey(seed), pixel_values=pix)
        jax.block_until_ready(state.tokens)
        emit("split_prefill", time.perf_counter() - t0)
        df = engine._get_split_decode(gen_key, bucket, batch, True, cap)
        lens = jnp.full((batch,), prompt_len, jnp.int32)
        t0 = time.perf_counter()
        toks, _ = df(engine.params, state, lens,
                     jnp.asarray(16, jnp.int32), jnp.asarray(0, jnp.int32))
        jax.block_until_ready(toks)
        emit("split_decode", time.perf_counter() - t0)

    if "split" in STAGES:
        time_split(7)
    if "ttft" in STAGES:
        time_monolith("ttft", 1, 3)
    if "short" in STAGES:
        time_monolith("short", 16, 4)
    print(json.dumps({"tag": TAG, "stage": "done"}), flush=True)


if __name__ == "__main__":
    main()
