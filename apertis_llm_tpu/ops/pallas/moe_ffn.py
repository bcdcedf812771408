"""Fused all-expert MoE FFN Pallas kernel (decode hot path).

The dense all-expert decode combine (ops/moe.moe_dense) is BANDWIDTH-bound
on its own intermediates, not on the MXU: at the 1.5B-MoE decode shapes
(E=8, S=256, H=704, I=2816) the (E, S, I) hidden activations are 8x the
routed activation volume, and together with the two activation-quantization
passes they push ~2x more HBM traffic than the int8 expert weights
themselves (measured 0.196 ms/layer vs a 0.088 ms traffic floor; a stacked
two-fat-GEMM re-association measures identical, 0.192 ms — the MXU is NOT
the limiter at these shapes).

This kernel runs the ENTIRE expert FFN for one (expert, row-block) grid
step in VMEM:

    int8 GEMM1 -> dequant -> +b1 -> act -> requantize -> int8 GEMM2 -> out

so the (rows, I) hidden block never reaches HBM, each expert's int8 weights
stream exactly once (weight block index depends only on the expert grid
axis; row-blocks iterate inside), and the activation quantize work rides
the VPU while the MXU streams. HBM traffic per layer step drops to
~weights + x + out ~= 34 MB.

The per-expert LayerNorm affine is pre-folded into W1 (models/moe_fuse.py)
so the kernel consumes ONE shared un-affine-normalized, pre-quantized x
block for every expert. Combine (routing weights x expert outputs) stays
outside — it is a cheap (S,E)x(E,S,H) contraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_M = 128


def _erf(x: jnp.ndarray) -> jnp.ndarray:
    """erf via Abramowitz–Stegun 7.1.26 (|error| <= 1.5e-7).

    Mosaic's TPU lowering has no erf/erfc primitive (only exp/tanh/
    logistic), so the exact-GELU activation is computed in-kernel from this
    polynomial; 1.5e-7 absolute is ~3 orders below the int8 requantization
    noise this kernel already carries."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


_KERNEL_ACTS = {
    "relu": lambda x: jnp.maximum(x, 0.0),
    "silu": lambda x: x * jax.nn.sigmoid(x),
    "swish": lambda x: x * jax.nn.sigmoid(x),
}


def kernel_activation(name: str):
    """Kernel-safe activation by name; unknown names fall back to exact
    GELU, mirroring ops/activations.get_activation."""
    return _KERNEL_ACTS.get(name, _gelu_exact)


def _kernel(act_fn, xq_ref, xs_ref, w1q_ref, w1s_ref, b1_ref,
            w2q_ref, w2s_ref, b2_ref, out_ref):
    xq = xq_ref[:]                                    # (BM, H) int8
    acc1 = jax.lax.dot_general(
        xq, w1q_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)             # (BM, I)
    h = (acc1.astype(jnp.float32) * xs_ref[:]         # per-row x scale
         * w1s_ref[0]                                 # per-(e, out-ch) scale
         + b1_ref[0])
    h = act_fn(h)

    # Requantize the hidden block in VMEM (per-row symmetric int8).
    absmax = jnp.max(jnp.abs(h), axis=1, keepdims=True)
    hs = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
    hq = jnp.clip(jnp.round(h / hs), -127, 127).astype(jnp.int8)

    acc2 = jax.lax.dot_general(
        hq, w2q_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)             # (BM, H)
    y = acc2.astype(jnp.float32) * hs * w2s_ref[0] + b2_ref[0]
    out_ref[0] = y.astype(out_ref.dtype)


def expert_ffn_dense(
    xq: jnp.ndarray,     # (S, H) int8 — shared pre-quantized normalized x
    xs: jnp.ndarray,     # (S, 1) float32 per-row activation scales
    w1q: jnp.ndarray,    # (E, H, I) int8, LayerNorm-affine folded
    w1s: jnp.ndarray,    # (E, 1, I) float32
    b1: jnp.ndarray,     # (E, I) float32, LN-bias folded
    w2q: jnp.ndarray,    # (E, I, H) int8
    w2s: jnp.ndarray,    # (E, 1, H) float32
    b2: jnp.ndarray,     # (E, H) float32
    out_dtype=jnp.bfloat16,
    hidden_act: str = "gelu",
) -> jnp.ndarray:
    """Every expert's FFN over every row: (E, S, H), combine applied outside."""
    act_fn = kernel_activation(hidden_act)
    s, h = xq.shape
    e, _, i = w1q.shape
    block_m = min(BLOCK_M, -(-s // 32) * 32)          # int8 sublane multiple
    pad = -s % block_m
    if pad:
        xq = jnp.pad(xq, ((0, pad), (0, 0)))
        xs = jnp.pad(xs, ((0, pad), (0, 0)))
    sp = s + pad

    grid = (e, sp // block_m)
    out = pl.pallas_call(
        functools.partial(_kernel, act_fn),
        # interpret on non-TPU backends so the CPU suite exercises the same
        # numerics; the model only dispatches here for the decode hot path.
        interpret=jax.default_backend() != "tpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, h), lambda ei, mi: (mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda ei, mi: (mi, 0),
                         memory_space=pltpu.VMEM),
            # Weight blocks depend only on the expert axis -> fetched once
            # per expert, reused across row-blocks (mi must be the inner,
            # fastest-moving grid axis).
            pl.BlockSpec((1, h, i), lambda ei, mi: (ei, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, i), lambda ei, mi: (ei, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, i), lambda ei, mi: (ei, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i, h), lambda ei, mi: (ei, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h), lambda ei, mi: (ei, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h), lambda ei, mi: (ei, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_m, h), lambda ei, mi: (ei, mi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, sp, h), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(xq, xs, w1q, w1s.reshape(e, 1, i), b1.reshape(e, 1, i),
      w2q, w2s.reshape(e, 1, h), b2.reshape(e, 1, h))
    return out[:, :s, :]
