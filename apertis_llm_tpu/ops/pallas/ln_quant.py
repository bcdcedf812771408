"""Fused LayerNorm/RMSNorm + per-row int8 quantize (prefill hot path).

At int8-serving prefill shapes every pre-norm feeds a dynamic-int8 matmul:
the XLA lowering runs LayerNorm, a per-row absmax reduce, and the int8
round/clip as separate HBM passes over the (tokens, H) activation —
profiled at ~3.7 ms/layer at the 1.5B b256 TTFT shapes (59392 x 2432),
~3x the one-pass traffic floor. This kernel reads x once, computes the
norm statistics, the normalized-affine row, its absmax, and the int8
quantization entirely in VMEM, and writes only the int8 tensor plus the
per-row scale.

Used by models/apertis._ln_quant for serving-quantized full-sequence
forward passes; numerics = quantize_rows(norm(x)) exactly (same formulas,
fp32 internally), pinned in tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 256 rows keeps the f32 working set (x + normed, ~2.5 MB each at H=2432)
# plus double-buffered IO inside the 16 MB scoped-VMEM limit up to H~8K;
# 1024-row blocks OOMed the stack at the 1.5B TTFT shape (59392 x 2432).
BLOCK_M = 256


def _kernel(eps, is_rms, has_bias, act_dtype, x_ref, w_ref, b_ref,
            q_ref, s_ref):
    x = x_ref[:].astype(jnp.float32)                  # (BM, H)
    if is_rms:
        # RMSNorm with the reference's eps-on-RMS quirk and the zero-row
        # guard, exactly as ops/norms.rms_norm.
        ss = jnp.sum(x * x, axis=1, keepdims=True)
        rms = jnp.where(ss > 0, jnp.sqrt(jnp.where(ss > 0, ss, 1.0)), 0.0)
        rms = rms * (x.shape[1] ** -0.5)
        inv = jnp.where(ss > 0, 1.0 / (rms + eps), 0.0)
        normed = x * inv * w_ref[0]
    else:
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=1, keepdims=True)
        inv = jnp.where(var > 0, jnp.reciprocal(jnp.sqrt(var + eps)), 0.0)
        normed = (x - mean) * inv * w_ref[0]
    if has_bias:
        normed = normed + b_ref[0]
    # The unfused path casts the normed tensor to the activation dtype
    # before quantize_rows re-reads it in f32 — reproduce that rounding
    # so fused and unfused agree bit-for-bit (a no-op for f32 models).
    normed = normed.astype(act_dtype).astype(jnp.float32)
    absmax = jnp.max(jnp.abs(normed), axis=1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
    q_ref[:] = jnp.clip(jnp.round(normed / scale), -127, 127).astype(jnp.int8)
    s_ref[:] = scale


def ln_quantize(
    x: jnp.ndarray,             # (..., H)
    w: jnp.ndarray,             # (H,) scale
    b: jnp.ndarray | None,      # (H,) bias, None for RMSNorm
    *,
    eps: float,
    rms: bool,
):
    """Returns ``(x_q int8, scale f32)`` with ``x_q * scale ~= norm(x)``.

    ``rms=True`` computes the reference-quirk RMSNorm (x / (rms + eps) * w),
    else standard LayerNorm with affine ``w``/``b``. The normed tensor is
    rounded through ``x.dtype`` before quantizing, mirroring the unfused
    norm -> quantize_rows composition."""
    lead = x.shape[:-1]
    h = x.shape[-1]
    x2 = x.reshape(-1, h)
    m = x2.shape[0]
    block_m = min(BLOCK_M, -(-m // 8) * 8)
    pad = -m % block_m
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    mp = x2.shape[0]
    has_bias = b is not None
    b_in = (b if has_bias else jnp.zeros((h,), jnp.float32))

    q, s = pl.pallas_call(
        functools.partial(_kernel, eps, rms, has_bias, x.dtype),
        interpret=jax.default_backend() != "tpu",
        grid=(mp // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_m, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((mp, h), jnp.int8),
                   jax.ShapeDtypeStruct((mp, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x2, w.reshape(1, h).astype(jnp.float32),
      b_in.reshape(1, h).astype(jnp.float32))
    q = q[:m].reshape(*lead, h)
    s = s[:m].reshape(*lead, 1)
    return q, s
