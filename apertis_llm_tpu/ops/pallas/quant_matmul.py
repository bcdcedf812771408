"""Fused int8-weight matmul Pallas kernel (weight-only quantized serving).

Computes ``x @ (w_q * w_s)`` reading the weights from HBM as int8 — half the
bytes of bf16 — and dequantising in VMEM right before the MXU. XLA can fuse
the dequant multiply into the dot for some shapes but not others (measured:
1.57x at batch 64, 0.4x at batch 256); this kernel makes the bandwidth win
deterministic.

Decode matmuls are skinny (x rows = batch, K/N in the thousands), so the
grid tiles (N, K) with a float32 VMEM accumulator over the K dimension and
the whole x block resident.

Serving-only: differentiation falls back to the XLA dequant expression via
custom_vjp, so training through a quantized layer still works (it just
doesn't use the kernel on the backward pass).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_M = 512
BLOCK_N = 512
BLOCK_K = 512


def _kernel(x_ref, wq_ref, ws_ref, o_ref, acc_ref):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]                                        # (BM, BK) bf16/f32
    w = wq_ref[:].astype(x.dtype)                       # (BK, BN) int8 -> x dtype
    acc_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc_ref[:] * ws_ref[0]).astype(o_ref.dtype)


def _pad_axis(x, axis, mult):
    pad = -x.shape[axis] % mult
    if pad:
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        x = jnp.pad(x, widths)
    return x


def _quant_matmul_impl(x: jnp.ndarray, w_q: jnp.ndarray, w_s: jnp.ndarray):
    m, k = x.shape
    _, n = w_q.shape
    block_k = min(BLOCK_K, k)
    block_n = min(BLOCK_N, n)
    # Rows of x: pad to the dtype's sublane multiple, then tile.
    row_mult = 16 if x.dtype == jnp.bfloat16 else 8
    block_m = min(BLOCK_M, -(-m // row_mult) * row_mult)
    xp = _pad_axis(_pad_axis(x, 1, block_k), 0, block_m)
    wqp = _pad_axis(_pad_axis(w_q, 0, block_k), 1, block_n)
    wsp = _pad_axis(w_s.reshape(1, -1), 1, block_n)
    mp = xp.shape[0]
    kp, np_ = wqp.shape

    out = pl.pallas_call(
        _kernel,
        grid=(mp // block_m, np_ // block_n, kp // block_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda mi, ni, ki: (mi, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda mi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda mi, ni, ki: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda mi, ni, ki: (mi, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(xp, wqp, wsp)
    return out[:m, :n]


def _dyn_kernel(xq_ref, wq_ref, xs_ref, ws_ref, o_ref, acc_ref):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # int8 x int8 -> int32 runs on the MXU at 2x bf16 peak (v5e); the
    # accumulator is exact integer math, scales applied once at the end.
    acc_ref[:] += jax.lax.dot_general(
        xq_ref[:], wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc_ref[:].astype(jnp.float32)
                    * xs_ref[:] * ws_ref[0]).astype(o_ref.dtype)


def quantize_rows(x: jnp.ndarray):
    """Symmetric per-row int8: x ~= x_q * x_s, scales over the K axis."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, scale


def _quant_matmul_dyn_impl(x, w_q, w_s, out_dtype):
    m, k = x.shape
    _, n = w_q.shape
    x_q, x_s = quantize_rows(x)
    block_k = min(BLOCK_K, k)
    block_n = min(BLOCK_N, n)
    block_m = min(BLOCK_M, -(-m // 32) * 32)     # int8 sublane multiple
    xqp = _pad_axis(_pad_axis(x_q, 1, block_k), 0, block_m)
    xsp = _pad_axis(x_s, 0, block_m)
    wqp = _pad_axis(_pad_axis(w_q, 0, block_k), 1, block_n)
    wsp = _pad_axis(w_s.reshape(1, -1).astype(jnp.float32), 1, block_n)
    mp = xqp.shape[0]
    kp, np_ = wqp.shape

    out = pl.pallas_call(
        _dyn_kernel,
        grid=(mp // block_m, np_ // block_n, kp // block_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda mi, ni, ki: (mi, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda mi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda mi, ni, ki: (mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda mi, ni, ki: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda mi, ni, ki: (mi, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(xqp, wqp, xsp, wsp)
    return out[:m, :n]


@jax.custom_vjp
def quant_matmul_dyn(x: jnp.ndarray, w_q: jnp.ndarray, w_s: jnp.ndarray):
    """Dynamic-activation int8 matmul: per-row quantize x on the fly, then
    int8 x int8 -> int32 on the MXU (2x bf16 matmul peak AND half the weight
    bytes — wins at compute-bound large batch where weight-only dequant
    cannot). ~0.5% relative error from activation rounding; serving-only."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    out = _quant_matmul_dyn_impl(x2, w_q, w_s.reshape(-1), x.dtype)
    return out.reshape(*lead, w_q.shape[-1])


def _dyn_fwd(x, w_q, w_s):
    return quant_matmul_dyn(x, w_q, w_s), (x, w_q, w_s)


@jax.custom_vjp
def quant_matmul_dyn_xla(x: jnp.ndarray, w_q: jnp.ndarray, w_s: jnp.ndarray):
    """Dynamic-activation int8 matmul through XLA's native int8 dot.

    Same math as ``quant_matmul_dyn`` but lowered by XLA instead of Pallas:
    per-row quantize x, ``lax.dot_general(int8, int8) -> int32``, scale once.
    Measured on v5e at decode shapes (M=256, 2048<->8192 chain): 449 TFLOP/s
    vs 190 bf16 / 213 for the Pallas dyn kernel — XLA's int8 matmul pipeline
    beats our hand tiling at MXU-saturating row counts, so this is the
    large-batch serving path (see models/apertis._linear dispatch)."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    x_q, x_s = quantize_rows(x2)
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = (acc.astype(jnp.float32) * x_s
           * w_s.reshape(1, -1).astype(jnp.float32)).astype(x.dtype)
    return out.reshape(*lead, w_q.shape[-1])


def _dyn_xla_fwd(x, w_q, w_s):
    return quant_matmul_dyn_xla(x, w_q, w_s), (x, w_q, w_s)


@jax.custom_vjp
def quant_matmul(x: jnp.ndarray, w_q: jnp.ndarray, w_s: jnp.ndarray):
    """x (..., K) @ dequant(w_q (K, N), w_s (1, N) or (N,)) -> (..., N)."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    out = _quant_matmul_impl(x2, w_q, w_s.reshape(-1))
    return out.reshape(*lead, w_q.shape[-1])


def _fwd(x, w_q, w_s):
    return quant_matmul(x, w_q, w_s), (x, w_q, w_s)


def _bwd(res, g):
    x, w_q, w_s = res
    # Serving kernels don't train the quantized weights; dx flows through
    # the dequantised weight, dw is None-like zeros.
    w = w_q.astype(g.dtype) * w_s.reshape(1, -1).astype(g.dtype)
    dx = g @ w.T
    return dx, jnp.zeros_like(w_q), jnp.zeros_like(w_s)


quant_matmul.defvjp(_fwd, _bwd)
quant_matmul_dyn.defvjp(_dyn_fwd, _bwd)
quant_matmul_dyn_xla.defvjp(_dyn_xla_fwd, _bwd)


# ---------------------------------------------------------------------------
# Fused in-kernel activation quantization (prefill-shape path)
# ---------------------------------------------------------------------------

def _dyn_fused_kernel(x_ref, wq_ref, ws_ref, o_ref, acc_ref):
    """Quantize the x block in VMEM right before the int8 dot.

    ``quant_matmul_dyn_xla`` materialises the quantized activations through
    HBM (read x bf16, write x_q int8, read x_q back) and its per-row scales
    need a full-K pass before the dot can start. Here each (BM, BK) x block
    is quantized on the VPU with a per-(row, k-block) scale — sub-channel
    granularity, strictly finer than per-row — and fed straight to the MXU,
    so x is read from HBM exactly once and the quantize work (~1% of the
    block's MXU FLOPs) overlaps the grid pipeline. The f32 accumulator
    folds each block's row scale in as it goes."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.float32)                     # (BM, BK)
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)  # (BM, 1)
    scale = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    block = jax.lax.dot_general(
        q, wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc_ref[:] += block.astype(jnp.float32) * scale

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc_ref[:] * ws_ref[0]).astype(o_ref.dtype)


def _quant_matmul_dyn_fused_impl(x, w_q, w_s, out_dtype):
    m, k = x.shape
    _, n = w_q.shape
    block_k = min(BLOCK_K, k)
    block_n = min(BLOCK_N, n)
    row_mult = 16 if x.dtype == jnp.bfloat16 else 8
    block_m = min(BLOCK_M, -(-m // row_mult) * row_mult)
    xp = _pad_axis(_pad_axis(x, 1, block_k), 0, block_m)
    wqp = _pad_axis(_pad_axis(w_q, 0, block_k), 1, block_n)
    wsp = _pad_axis(w_s.reshape(1, -1).astype(jnp.float32), 1, block_n)
    mp = xp.shape[0]
    kp, np_ = wqp.shape

    out = pl.pallas_call(
        _dyn_fused_kernel,
        # interpret on non-TPU backends so numerics are testable on the
        # virtual-device CPU suite (the model dispatch only selects this
        # path on TPU anyway).
        interpret=jax.default_backend() != "tpu",
        grid=(mp // block_m, np_ // block_n, kp // block_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda mi, ni, ki: (mi, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda mi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda mi, ni, ki: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda mi, ni, ki: (mi, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(xp, wqp, wsp)
    return out[:m, :n]


@jax.custom_vjp
def quant_matmul_dyn_fused(x: jnp.ndarray, w_q: jnp.ndarray, w_s: jnp.ndarray):
    """Dynamic int8 matmul with IN-KERNEL activation quantization
    (sub-channel scales). Serving-only; backward falls back to the
    dequantised-weight expression like the other quantized matmuls."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    out = _quant_matmul_dyn_fused_impl(x2, w_q, w_s.reshape(-1), x.dtype)
    return out.reshape(*lead, w_q.shape[-1])


def _dyn_fused_fwd(x, w_q, w_s):
    return quant_matmul_dyn_fused(x, w_q, w_s), (x, w_q, w_s)


quant_matmul_dyn_fused.defvjp(_dyn_fused_fwd, _bwd)
