#!/usr/bin/env python
"""Headline benchmark: decode throughput of the flagship multimodal Apertis
(selective-SSM mixer) on one TPU chip.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "tok/s/chip", "vs_baseline": N/10000,
   ..., "moe_tok_s": N}

``vs_baseline`` is the ratio against the BASELINE.json north-star target of
10,000 decode tokens/sec/chip (v5e). TTFT and details go to stderr. The
metric name carries the MEASURED parameter count (round 3's "1.5B" label
was the factory target; the search lands on 1.218B — ADVICE r3). By
default one run also appends a secondary MoE row (``moe_*`` keys) so the
driver captures both families (VERDICT r3 item 5); APERTIS_BENCH_SECONDARY=0
disables it.

Measurement protocol (see memory note axon-tpu-tunnel-quirks): every timed
call uses fresh input buffers (the execution layer caches identical calls),
and decode rate comes from the delta between a short and a long generation
so prefill and fixed overheads cancel.

Env knobs:
  APERTIS_BENCH_PRESET=tiny|1.5B|6.7B|...   model size (factory search)
  APERTIS_BENCH_ARCH=ssm|moe|mha  moe = top-2-of-8 AdaptiveExpertSystem;
                                  mha = standard_mha mixer (flash path)
  APERTIS_BENCH_BATCH=N           decode batch (default 256)
  APERTIS_BENCH_QUANT=int8|bf16   serving mode (default int8)
  APERTIS_BENCH_MODE=train        train-throughput metric instead
  APERTIS_BENCH_SECONDARY=0       skip the appended MoE row
  APERTIS_JAX_CACHE_DIR=/path     persistent compile cache (bring-up)
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


import logging

logging.disable(logging.WARNING)

from apertis_llm_tpu.utils.jax_cache import maybe_enable_cache

maybe_enable_cache()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_model(preset: str, quant: str, arch: str = "ssm"):
    import jax

    from apertis_llm_tpu.config import ApertisConfig
    from apertis_llm_tpu.models.factory import calculate_model_dimensions
    from apertis_llm_tpu.models.params import count_params, init_params

    if preset == "tiny":
        cfg = dict(hidden_size=256, num_hidden_layers=2, num_attention_heads=4,
                   intermediate_size=512, vision_layers=2, vision_heads=4,
                   vision_embed_dim=128, image_size=64)
    else:
        # Any "1.5B" / "6.7B"-style target works; the factory search picks
        # the dimensions exactly like create-model does. For the MoE arch the
        # search counts every expert's weights, so the TOTAL stays on target.
        dims = calculate_model_dimensions(
            preset, 32000, use_expert_system=(arch == "moe"))
        cfg = dict(hidden_size=dims["hidden_size"],
                   num_hidden_layers=dims["num_hidden_layers"],
                   num_attention_heads=dims["num_attention_heads"],
                   intermediate_size=dims["intermediate_size"])
    if arch == "moe":
        # The reference's AdaptiveExpertSystem FFN: top-2 of 8 experts.
        cfg.update(use_expert_system=True, num_experts=8, experts_per_token=2)
    # The MHA family benches text-only: full-MHA KV at the 1.5B shapes costs
    # ~428 KB per (row, slot) — an image prefix (197 slots) alone would eat
    # the HBM that the generated-token cache needs (see docs/README.md MHA
    # row note).
    config = ApertisConfig(
        vocab_size=32000,
        attention_type="standard_mha" if arch == "mha" else "selective_ssm",
        ssm_d_state=16,
        multimodal=(arch != "mha"),
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        max_position_embeddings=4096,
        dtype="bfloat16",
        param_dtype="bfloat16",
        **cfg,
    )
    t0 = time.perf_counter()
    params = jax.jit(lambda rng: init_params(rng, config))(jax.random.PRNGKey(0))
    # Logical model size from the UNQUANTIZED tree: int8 swaps each weight
    # for same-size {w_q, w_s} but int4 nibble-packs (half the elements),
    # which would understate the metric label's parameter count.
    n_params = count_params(params)
    if quant in ("int8", "int4"):
        from apertis_llm_tpu.models.quantize import quantize_params

        if quant == "int4":
            # w4a8 serving: dense-FFN/SwiGLU weights pack to int4
            # (models/quantize.py); the MoE fat stack packs at engine
            # attach time; mixer/head stay int8.
            os.environ["APERTIS_QUANT_BITS"] = "4"
        params = jax.jit(quantize_params)(params)
    jax.block_until_ready(params)
    init_s = time.perf_counter() - t0
    log(f"model init: {n_params/1e9:.3f}B params "
        f"({quant or 'bf16'}) in {init_s:.1f}s "
        f"on {jax.devices()[0].platform}")
    return config, params, n_params, init_s


def bench_training():
    """Secondary metric: selective-SSM training throughput on one chip
    (APERTIS_BENCH_MODE=train)."""
    import jax
    import jax.numpy as jnp

    from apertis_llm_tpu.config import ApertisConfig
    from apertis_llm_tpu.models.params import init_params
    from apertis_llm_tpu.training.step import (
        create_train_state, make_optimizer, make_train_step)

    config = ApertisConfig(
        vocab_size=32000, hidden_size=1024, num_hidden_layers=12,
        num_attention_heads=16, intermediate_size=4096,
        attention_type="selective_ssm", ssm_d_state=16,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        max_position_embeddings=2048)
    b, l = 4, 1024
    params = jax.jit(lambda r: init_params(r, config))(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(1e-4, 1000)
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, l), 4, 32000)
    batch = {"input_ids": ids, "labels": ids}
    step_fn = jax.jit(make_train_step(config, tx, "bfloat16"),
                      donate_argnums=(0,))
    state = create_train_state(params, tx, jax.random.PRNGKey(2))
    state, m = step_fn(state, batch)
    log(f"train compile+1st: loss={float(m['loss']):.3f}")

    def chain(n):
        nonlocal state
        t0 = time.perf_counter()
        last = None
        for _ in range(n):
            state, met = step_fn(state, batch)
            last = met["loss"]
        float(last)
        return time.perf_counter() - t0

    t4, t16 = chain(4), chain(16)
    slope = (t16 - t4) / 12
    tps = b * l / slope
    log(f"train: {slope*1e3:.1f} ms/step -> {tps:,.0f} tok/s")
    print(json.dumps({
        "metric": "train_tokens_per_sec_per_chip_165M_ssm_bf16",
        "value": round(tps, 1),
        "unit": "tok/s/chip",
        "vs_baseline": round(tps / 10000.0, 3),
    }))


def measure_decode(preset: str, quant: str, arch: str, batch: int,
                   samples: int, full_ttft: bool = True):
    """Run the fixed short/long-delta protocol on one model family.

    Returns a stats dict: decode rate, per-step ms, TTFT p50s, compile and
    init times, spreads. ``full_ttft=False`` trims the protocol for the
    appended secondary row (3 TTFT samples, no end-to-end-transfer TTFT)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from apertis_llm_tpu.inference.engine import InferenceEngine

    prompt_len = 32
    # Long runs are sized so the short/long delta (the decode signal) is
    # several times the tunnel's observed 1-2 s wall-clock stall magnitude.
    # The MHA family is capped by KV-cache memory (b64 x 256 slots ~ 7 GB at
    # the 1.5B shapes) and its per-step cost scales with the ALLOCATED cache
    # length, so its long run is short and the delta estimator reports the
    # per-step cost at the long run's 256-slot allocation (n_short's 48-slot
    # steps bias the rate by ~2%).
    if arch == "mha":
        n_short, n_long = 16, 224
    else:
        n_short, n_long = 16, (1200 if preset != "tiny" else 80)


    config, params, n_params, init_s = build_model(preset, quant, arch)
    t0 = time.perf_counter()
    engine = InferenceEngine(config, params)
    jax.block_until_ready(engine.params)
    engine_s = time.perf_counter() - t0
    log(f"engine build (fused packs + int8 head): {engine_s:.1f}s")

    def fresh_inputs(seed):
        r = np.random.default_rng(seed)
        prompt = r.integers(4, config.vocab_size,
                            size=(batch, prompt_len)).astype(np.int32)
        if not config.multimodal:
            return prompt, None
        # Raw uint8 HWC images: resize/normalise happen on device, and the
        # host->device transfer is 4x smaller than fp32 CHW.
        pixels = r.integers(0, 255, size=(batch, config.image_size,
                                          config.image_size, 3)).astype(np.uint8)
        return prompt, pixels

    def run(n_tokens, seed, stage_pixels=False):
        prompt, pixels = fresh_inputs(seed)
        if pixels is not None and stage_pixels:
            # Pre-stage the 38 MB image batch on device: isolates model
            # latency from the tunnel's host->device transfer jitter (a
            # production PCIe link moves this in ~4 ms).
            pixels = jax.device_put(pixels)
            _ = float(jnp.sum(pixels.astype(jnp.float32)))  # force the copy
        t0 = time.perf_counter()
        engine.generate(prompt, pixel_values=pixels, max_new_tokens=n_tokens,
                        eos_token_id=(), do_sample=False,
                        rng=jax.random.PRNGKey(seed))
        return time.perf_counter() - t0

    c0 = run(1, 0)         # compile TTFT shape (prefill + 1 token)
    c1 = run(n_short, 0)   # compile short
    c2 = run(n_long, 0)    # compile long
    log(f"compiles: ttft {c0:.1f}s, short {c1:.1f}s, long {c2:.1f}s")
    log(f"bring-up to first b{batch} token: {init_s + engine_s + c0:.1f}s "
        f"(init {init_s:.1f}s + engine {engine_s:.1f}s + first-token "
        f"program {c0:.1f}s)")
    # Thermal/clock preamble: drive sustained decode before sampling so the
    # chip reaches its steady operating point (session-to-session drift was
    # the dominant spread source in round 2 — VERDICT r2 item 8).
    if preset != "tiny":
        for i in range(2 if full_ttft else 1):
            run(n_long, 50 + i)
    # TTFT = image+text prefill + first decoded token, p50 of 5 fresh-input
    # runs (BASELINE.md north-star row: p50 TTFT on image+text).
    ttft_p50_ms = None
    if full_ttft:
        ttft_samples = sorted(run(1, 10 + i) for i in range(5))
        ttft_p50_ms = ttft_samples[2] * 1e3
        log(f"TTFT(b{batch} image+text): p50 {ttft_p50_ms:.0f} ms "
            f"(samples {[f'{t*1e3:.0f}' for t in ttft_samples]})")
    n_ttft_dev = 5 if full_ttft else 3
    ttft_dev = sorted(run(1, 20 + i, stage_pixels=True)
                      for i in range(n_ttft_dev))
    ttft_device_p50_ms = ttft_dev[n_ttft_dev // 2] * 1e3
    ttft_tag = ("device-staged pixels" if config.multimodal
                else "text-only prompt")
    log(f"TTFT({ttft_tag}): p50 {ttft_device_p50_ms:.0f} ms "
        f"(samples {[f'{t*1e3:.0f}' for t in ttft_dev]})")
    # Fixed protocol (VERDICT r1 item 7): `samples` interleaved short/long
    # pairs on fresh inputs. The axon tunnel adds rare one-sided wall-clock
    # stalls (seconds), so the headline estimator is the DELTA OF MEDIANS —
    # median(t_long) - median(t_short) — which a stall in any single run
    # cannot move; per-pair rates are reported as the spread.
    steps = n_long - n_short
    shorts_raw = [run(n_short, 100 + 2 * i) for i in range(samples)]
    longs_raw = [run(n_long, 101 + 2 * i) for i in range(samples)]
    shorts, longs = sorted(shorts_raw), sorted(longs_raw)
    # Adaptive top-up: if the per-sample spread is stall-dominated, take a
    # few more pairs so the medians settle.
    if (samples >= 4 and preset != "tiny"
            and (longs[-1] - longs[0]) > 0.3 * longs[samples // 2]):
        log("note: high spread; collecting 4 extra sample pairs")
        shorts_raw += [run(n_short, 200 + 2 * i) for i in range(4)]
        longs_raw += [run(n_long, 201 + 2 * i) for i in range(4)]
        shorts, longs = sorted(shorts_raw), sorted(longs_raw)
        samples += 4
    t_short, t_long = shorts[samples // 2], longs[samples // 2]
    delta = t_long - t_short
    if delta > 0.2 * t_long:
        decode_tps = batch * steps / delta
        per_step_ms = delta / steps * 1e3
    else:
        # Delta within noise (tiny models): conservative end-to-end rate.
        decode_tps = batch * n_long / t_long
        per_step_ms = t_long / n_long * 1e3
        log("note: short/long delta within noise; end-to-end rate used")
    # True interleaved run pairs (run order, not rank-matched order stats).
    pair_rates = sorted(batch * steps / (tl - ts)
                        for ts, tl in zip(shorts_raw, longs_raw) if tl - ts > 0)
    # The tunnel's wall-clock stalls are one-sided multi-second outliers, so
    # the reported spread is interquartile (robust scale around the median
    # the headline uses); the full min-max range still goes to the log.
    if pair_rates:
        q1 = pair_rates[len(pair_rates) // 4]
        q3 = pair_rates[(3 * len(pair_rates)) // 4]
        spread_pct = 100.0 * (q3 - q1) / decode_tps
    else:
        spread_pct = 0.0
    log(f"decode: {decode_tps:,.0f} tok/s/chip (median-of-{samples} deltas; "
        f"per-pair {pair_rates[0]:,.0f}-{pair_rates[-1]:,.0f}, "
        f"iqr spread {spread_pct:.0f}%; {per_step_ms:.2f} ms/step, "
        f"batch {batch})")
    return {
        "decode_tps": decode_tps, "per_step_ms": per_step_ms,
        "ttft_p50_ms": ttft_p50_ms, "ttft_device_p50_ms": ttft_device_p50_ms,
        "samples": samples, "spread_pct": spread_pct, "n_params": n_params,
        "init_s": init_s, "engine_s": engine_s, "ttft_compile_s": c0,
        "bringup_s": init_s + engine_s + c0,
    }


def main():
    if os.environ.get("APERTIS_BENCH_MODE") == "train":
        bench_training()
        return
    preset = os.environ.get("APERTIS_BENCH_PRESET", "1.5B")
    # int8 is the default serving mode for the headline bench: it beats bf16
    # by 1.22x at b256 (65.9k vs 54.1k tok/s, quiet-host medians) with equal
    # device-staged TTFT, and greedy-token parity with bf16 is pinned by
    # tests (test_quantize.py, test_interface.py). Set APERTIS_BENCH_QUANT=
    # bf16 to measure the unquantized path.
    quant = os.environ.get("APERTIS_BENCH_QUANT",
                           "int8" if preset != "tiny" else "")
    if quant in ("bf16", "none"):
        quant = ""
    # APERTIS_BENCH_ARCH=moe benches the 8-expert top-2 MoE variant of the
    # preset (the reference's AdaptiveExpertSystem flagship family);
    # =mha benches the standard-MHA mixer (flash decode, KV cache).
    arch = os.environ.get("APERTIS_BENCH_ARCH", "ssm")
    default_batch = "4" if preset == "tiny" else ("64" if arch == "mha"
                                                  else "256")
    batch = int(os.environ.get("APERTIS_BENCH_BATCH", default_batch))
    samples = int(os.environ.get("APERTIS_BENCH_SAMPLES",
                                 "7" if preset != "tiny" else "3"))

    stats = measure_decode(preset, quant, arch, batch, samples)

    suffix = f"_{quant}" if quant else ""
    arch_tag = {"moe": "ssm_moe", "mha": "mha"}.get(arch, "ssm")
    modal_tag = "text" if arch == "mha" else "multimodal"
    size_tag = (f"{stats['n_params']/1e9:.1f}B" if preset != "tiny"
                else "tiny")
    out = {
        "metric": f"decode_tokens_per_sec_per_chip_{size_tag}_{modal_tag}"
                  f"_{arch_tag}_b{batch}{suffix}",
        "value": round(stats["decode_tps"], 1),
        "unit": "tok/s/chip",
        "vs_baseline": round(stats["decode_tps"] / 10000.0, 3),
        "ttft_p50_ms": round(stats["ttft_p50_ms"], 1),
        "ttft_device_p50_ms": round(stats["ttft_device_p50_ms"], 1),
        "samples": stats["samples"],
        "spread_pct": round(stats["spread_pct"], 1),
        "params_b": round(stats["n_params"] / 1e9, 3),
        "init_s": round(stats["init_s"], 1),
        "ttft_compile_s": round(stats["ttft_compile_s"], 1),
        "bringup_s": round(stats["bringup_s"], 1),
    }

    # Secondary rows: the MoE and MHA families from the SAME driver run
    # (VERDICT r3 item 5 / r4 item 8) with a trimmed protocol (5 pairs,
    # device-staged TTFT only). MHA benches at its KV-memory-bound batch.
    if (preset != "tiny" and arch == "ssm"
            and os.environ.get("APERTIS_BENCH_SECONDARY", "1") != "0"):
        log("--- secondary row: MoE family ---")
        moe = measure_decode(preset, quant, "moe", batch,
                             samples=min(samples, 5), full_ttft=False)
        out.update({
            "moe_tok_s": round(moe["decode_tps"], 1),
            "moe_ms_per_step": round(moe["per_step_ms"], 2),
            "moe_ttft_device_p50_ms": round(moe["ttft_device_p50_ms"], 1),
            "moe_params_b": round(moe["n_params"] / 1e9, 3),
            "moe_spread_pct": round(moe["spread_pct"], 1),
        })
        log("--- secondary row: MHA family (b64, int8 paired KV) ---")
        # The MHA serving default: int8 paired KV cache (APERTIS_QUANT_KV
        # is a process-level cache-layout knob — set before the engine
        # builds; the SSM/MoE rows above never read it).
        os.environ.setdefault("APERTIS_QUANT_KV", "1")
        mha = measure_decode(preset, quant, "mha", 64,
                             samples=min(samples, 5), full_ttft=False)
        out.update({
            "mha_tok_s_b64": round(mha["decode_tps"], 1),
            "mha_ms_per_step": round(mha["per_step_ms"], 2),
            "mha_ttft_device_p50_ms": round(mha["ttft_device_p50_ms"], 1),
            "mha_params_b": round(mha["n_params"] / 1e9, 3),
            "mha_spread_pct": round(mha["spread_pct"], 1),
        })

    print(json.dumps(out))


if __name__ == "__main__":
    main()
