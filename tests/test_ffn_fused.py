"""Fused dense-FFN decode kernel (ops/pallas/ffn_fused.py): kernel-vs-XLA
numerics and the decode_step dispatch route (interpret mode on CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apertis_llm_tpu.ops.pallas.ffn_fused import (
    ffn_decode_fused, fused_eligible)
from apertis_llm_tpu.ops.pallas.quant_matmul import quantize_rows
from apertis_llm_tpu.models.quantize import quantize_weight


def _make(seed, s=48, h=256, i=512, layers=3):
    r = np.random.default_rng(seed)
    w1 = (r.standard_normal((layers, h, i)) * 0.05).astype(np.float32)
    b1 = (r.standard_normal((layers, i)) * 0.02).astype(np.float32)
    w2 = (r.standard_normal((layers, i, h)) * 0.05).astype(np.float32)
    b2 = (r.standard_normal((layers, h)) * 0.02).astype(np.float32)
    x = (r.standard_normal((s, h)) * 0.5).astype(np.float32)
    return jnp.asarray(w1), jnp.asarray(b1), jnp.asarray(w2), jnp.asarray(b2), \
        jnp.asarray(x, jnp.bfloat16)


def test_kernel_matches_quantized_reference():
    w1, b1, w2, b2, x = _make(0)
    w1q, w1s = quantize_weight(w1)
    w2q, w2s = quantize_weight(w2)
    xq, xs = quantize_rows(x)
    for li in range(3):
        got = ffn_decode_fused(xq, xs, w1q, w1s, b1, w2q, w2s, b2,
                               layer_idx=li, out_dtype=jnp.float32,
                               block_n=128)
        # Reference math with the same quantized weights and per-row
        # activation scales; hidden requantization differs (per-(row, tile)
        # in the kernel) so tolerance covers the int8 rounding band.
        acc = (xq.astype(jnp.float32) @ w1q[li].astype(jnp.float32)
               ) * xs * w1s[li] + b1[li]
        hid = jax.nn.gelu(acc, approximate=False)
        ref = hid @ (w2q[li].astype(jnp.float32) * w2s[li]) + b2[li]
        scale = float(jnp.max(jnp.abs(ref))) + 1e-6
        err = float(jnp.max(jnp.abs(got - ref))) / scale
        assert err < 2e-2, (li, err)


def test_kernel_unstacked_single_layer():
    w1, b1, w2, b2, x = _make(1, layers=1)
    w1q, w1s = quantize_weight(w1[0])
    w2q, w2s = quantize_weight(w2[0])
    xq, xs = quantize_rows(x)
    got = ffn_decode_fused(xq, xs, w1q, w1s, b1[0], w2q, w2s, b2[0],
                           out_dtype=jnp.float32, block_n=128)
    assert got.shape == (x.shape[0], x.shape[1])
    assert bool(jnp.all(jnp.isfinite(got)))


def test_eligibility_gate():
    w1, b1, w2, b2, _ = _make(2)
    w1q, w1s = quantize_weight(w1)
    w2q, w2s = quantize_weight(w2)
    d1 = {"w_q": w1q, "w_s": w1s, "b": b1}
    d2 = {"w_q": w2q, "w_s": w2s, "b": b2}
    # off-TPU default: ineligible
    assert not fused_eligible(d1, d2, rows=256)
    os.environ["APERTIS_FFN_FUSED"] = "force"
    try:
        assert fused_eligible(d1, d2, rows=256)
        assert not fused_eligible({"w": w1}, d2, rows=256)  # unquantized
    finally:
        del os.environ["APERTIS_FFN_FUSED"]


def test_decode_step_routes_through_kernel():
    """Greedy decode logits with the fused path (force) stay within the
    int8-requantization band of the plain quantized path, and the argmax
    tokens agree."""
    from apertis_llm_tpu.config import ApertisConfig
    from apertis_llm_tpu.models import apertis as model_lib
    from apertis_llm_tpu.models.params import init_params
    from apertis_llm_tpu.models.quantize import quantize_params

    config = ApertisConfig(
        vocab_size=128, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=8, intermediate_size=256,
        attention_type="selective_ssm", ssm_d_state=16,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        max_position_embeddings=64)
    params = init_params(jax.random.PRNGKey(0), config)
    qparams = quantize_params(params, min_size=0)
    cache = model_lib.init_cache(config, 4, max_length=16)
    toks = jnp.asarray([3, 5, 7, 9], jnp.int32)
    t = jnp.asarray(0, jnp.int32)

    logits_plain, _ = model_lib.decode_step(qparams, config, cache, toks, t)
    os.environ["APERTIS_FFN_FUSED"] = "force"
    try:
        # The route must actually be taken: the jaxpr carries a pallas_call
        # (numerics alone can't distinguish routing from fallback).
        jaxpr = jax.make_jaxpr(
            lambda p, c: model_lib.decode_step(p, config, c, toks, t)
        )(qparams, cache)
        assert "pallas_call" in str(jaxpr), "fused FFN kernel not routed"
        logits_fused, _ = model_lib.decode_step(qparams, config, cache, toks, t)
    finally:
        del os.environ["APERTIS_FFN_FUSED"]
    scale = float(jnp.max(jnp.abs(logits_plain))) + 1e-6
    err = float(jnp.max(jnp.abs(logits_fused - logits_plain))) / scale
    assert err < 3e-2, err
    assert jnp.array_equal(jnp.argmax(logits_plain, -1),
                           jnp.argmax(logits_fused, -1))


@pytest.mark.parametrize("pipelined", ["0", "1"])
def test_kernel_bf16_matches_xla(pipelined):
    """bf16 weight layout (scales None): kernel == plain XLA FFN math to
    f32 accumulation-order tolerance — no quantization anywhere."""
    w1, b1, w2, b2, x = _make(3)
    x = x.astype(jnp.float32)
    os.environ["APERTIS_FFN_FUSED_PIPE"] = pipelined
    try:
        for li in (0, 2):
            got = ffn_decode_fused(x, None, w1, None, b1, w2, None, b2,
                                   layer_idx=li, out_dtype=jnp.float32,
                                   block_n=128)
            hid = jax.nn.gelu(x @ w1[li] + b1[li], approximate=False)
            ref = hid @ w2[li] + b2[li]
            scale = float(jnp.max(jnp.abs(ref))) + 1e-6
            err = float(jnp.max(jnp.abs(got - ref))) / scale
            assert err < 1e-4, (li, err)
    finally:
        del os.environ["APERTIS_FFN_FUSED_PIPE"]


def test_eligibility_gate_bf16():
    w1, b1, w2, b2, _ = _make(4)
    d1 = {"w": w1, "b": b1}
    d2 = {"w": w2, "b": b2}
    assert not fused_eligible(d1, d2, rows=256)       # off-TPU default
    os.environ["APERTIS_FFN_FUSED"] = "force"
    try:
        assert fused_eligible(d1, d2, rows=256)
        # mixed layouts are not eligible
        w1q, w1s = quantize_weight(w1)
        assert not fused_eligible({"w_q": w1q, "w_s": w1s, "b": b1}, d2,
                                  rows=256)
    finally:
        del os.environ["APERTIS_FFN_FUSED"]
