#!/usr/bin/env python
"""Headline benchmark: decode throughput of the 1.5B multimodal Apertis
(selective-SSM mixer) on one TPU chip.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "tok/s/chip", "vs_baseline": N/10000}

``vs_baseline`` is the ratio against the BASELINE.json north-star target of
10,000 decode tokens/sec/chip (v5e). TTFT and other details go to stderr.

Env knobs: APERTIS_BENCH_PRESET=tiny for a fast smoke run (CPU-friendly),
APERTIS_BENCH_BATCH to override the decode batch size.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import logging

logging.disable(logging.WARNING)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_model(preset: str):
    import jax

    from apertis_llm_tpu.config import ApertisConfig
    from apertis_llm_tpu.models.factory import calculate_model_dimensions
    from apertis_llm_tpu.models.params import init_params

    if preset == "tiny":
        cfg = dict(hidden_size=256, num_hidden_layers=2, num_attention_heads=4,
                   intermediate_size=512, vision_layers=2, vision_heads=4,
                   vision_embed_dim=128, image_size=64)
    else:
        dims = calculate_model_dimensions("1.5B", 32000)
        cfg = dict(hidden_size=dims["hidden_size"],
                   num_hidden_layers=dims["num_hidden_layers"],
                   num_attention_heads=dims["num_attention_heads"],
                   intermediate_size=dims["intermediate_size"])
    config = ApertisConfig(
        vocab_size=32000,
        attention_type="selective_ssm",
        ssm_d_state=16,
        multimodal=True,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        max_position_embeddings=4096,
        dtype="bfloat16",
        param_dtype="bfloat16",
        **cfg,
    )
    t0 = time.perf_counter()
    params = jax.jit(
        lambda rng: init_params(rng, config), backend=None
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    from apertis_llm_tpu.models.params import count_params

    log(f"model init: {count_params(params)/1e9:.3f}B params "
        f"in {time.perf_counter()-t0:.1f}s on {jax.devices()[0].platform}")
    return config, params


def main():
    preset = os.environ.get("APERTIS_BENCH_PRESET", "1.5B")
    batch = int(os.environ.get("APERTIS_BENCH_BATCH", "64" if preset != "tiny" else "4"))
    prompt_len = 32
    n_short, n_long = 16, 144

    import numpy as np
    import jax

    from apertis_llm_tpu.inference.engine import InferenceEngine

    config, params = build_model(preset)
    engine = InferenceEngine(config, params)

    rng = np.random.default_rng(0)
    # Distinct prompt/pixel buffers per timed call: the execution layer can
    # cache results for identical (executable, args) pairs, which would make
    # repeat timings measure nothing.
    def fresh_inputs(i):
        r = np.random.default_rng(i)
        prompt = r.integers(4, config.vocab_size,
                            size=(batch, prompt_len)).astype(np.int32)
        pixels = r.normal(size=(batch, 3, config.image_size,
                                config.image_size)).astype(np.float32)
        return prompt, pixels

    gen_kwargs = dict(eos_token_id=(), do_sample=False)

    def timed(n_tokens):
        prompt, pixels = fresh_inputs(0)
        t0 = time.perf_counter()
        engine.generate(prompt, pixel_values=pixels, max_new_tokens=n_tokens,
                        rng=jax.random.PRNGKey(0), **gen_kwargs)
        compile_s = time.perf_counter() - t0
        best = float("inf")
        out = None
        for i in range(1, 3):
            prompt, pixels = fresh_inputs(i)
            t0 = time.perf_counter()
            out = engine.generate(prompt, pixel_values=pixels,
                                  max_new_tokens=n_tokens,
                                  rng=jax.random.PRNGKey(i), **gen_kwargs)
            best = min(best, time.perf_counter() - t0)
        return best, compile_s, out

    t_short, c_short, _ = timed(n_short)
    log(f"gen {n_short} tokens: {t_short:.3f}s (compile {c_short:.1f}s)")
    t_long, c_long, out = timed(n_long)
    log(f"gen {n_long} tokens: {t_long:.3f}s (compile {c_long:.1f}s)")

    # Subtracting the short run removes prefill + fixed overheads.
    decode_tps = batch * (n_long - n_short) / max(t_long - t_short, 1e-9)
    per_step_ms = (t_long - t_short) / (n_long - n_short) * 1e3
    ttft_est = t_short - per_step_ms * 1e-3 * n_short
    log(f"decode: {decode_tps:,.0f} tok/s/chip  ({per_step_ms:.2f} ms/step, "
        f"batch {batch});  TTFT(batch) ~ {ttft_est*1e3:.0f} ms")

    print(json.dumps({
        "metric": f"decode_tokens_per_sec_per_chip_{preset}_multimodal_ssm",
        "value": round(decode_tps, 1),
        "unit": "tok/s/chip",
        "vs_baseline": round(decode_tps / 10000.0, 3),
    }))


if __name__ == "__main__":
    main()
