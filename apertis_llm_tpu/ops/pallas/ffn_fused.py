"""Fused dense-FFN decode kernel (int8 serving hot path).

At decode row counts the dense FFN is weight-read-bound, but the XLA
lowering splits it into three passes with real intermediate traffic:
GEMM1's fusion carries the gelu + row-absmax epilogue and writes the
(S, I) hidden in bf16 (profiled 65.5 us/layer at the 1.5B b256 step —
~55 % of the HBM rate its weight read implies), a quantize pass re-reads
that hidden, and GEMM2 reads the int8 copy. This kernel runs the whole
FFN per intermediate tile in VMEM:

    int8 GEMM1 -> dequant +b1 -> act -> requantize -> int8 GEMM2 -> acc

so each weight matrix streams from HBM exactly once and the hidden never
leaves VMEM — the dense-model counterpart of the MoE decode kernel
(ops/pallas/moe_ffn.expert_ffn_fat), with per-(row, tile) hidden scales
folded into the accumulator.

Weights arrive LAYER-STACKED (L, ...) with the layer selected by a
scalar-prefetched index: inside the decode ``lax.scan`` XLA cannot fuse a
dynamic-slice of the stack into a pallas operand and would materialise a
full copy of both matrices every layer step (the moe_ffn.py lesson);
prefetching the index DMAs tiles straight from the resident stack.

Reference behavior being accelerated: the eval-mode dense FFN
(reference: src/model/core.py:407-457) under int8 serving quantization.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from apertis_llm_tpu.ops.pallas.moe_ffn import (
    kernel_activation, maybe_unpack_int4 as _maybe_unpack)


def _kernel(act_fn, int4, quant, lidx_ref, *refs):
    w1sh = w2sh = None
    if int4:
        (xq_ref, xs_ref, w1q_ref, w1sh_ref, w1s_ref, b1_ref,
         w2q_ref, w2sh_ref, w2s_ref, b2_ref, out_ref, acc_ref) = refs
        w1sh, w2sh = w1sh_ref[0], w2sh_ref[0]
    elif quant:
        (xq_ref, xs_ref, w1q_ref, w1s_ref, b1_ref,
         w2q_ref, w2s_ref, b2_ref, out_ref, acc_ref) = refs
    else:
        (xq_ref, w1q_ref, b1_ref, w2q_ref, b2_ref, out_ref, acc_ref) = refs
    ni = pl.program_id(0)

    @pl.when(ni == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xq = xq_ref[:]                          # (S, H) int8/bf16 resident
    if quant:
        acc1 = jax.lax.dot_general(
            xq, _maybe_unpack(w1q_ref[0], int4, w1sh),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)         # (S, BN)
        # Biases arrive in their native (bf16) dtype and are cast here in
        # VMEM: an .astype on the host side would materialise a full-stack
        # f32 copy INSIDE the decode layer scan (profiled 21.8 us x
        # 2/layer/step).
        h = (acc1.astype(jnp.float32) * xs_ref[:] * w1s_ref[0]
             + b1_ref[0].astype(jnp.float32))
    else:
        h = jax.lax.dot_general(
            xq, w1q_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (S, BN)
        h = h + b1_ref[0].astype(jnp.float32)
    h = act_fn(h)

    if quant:
        # Requantize per (row, tile): finer granularity than the XLA path's
        # per-row scales, folded into the f32 accumulator.
        absmax = jnp.max(jnp.abs(h), axis=1, keepdims=True)
        hs = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
        hq = jnp.clip(jnp.round(h / hs), -127, 127).astype(jnp.int8)
        acc2 = jax.lax.dot_general(
            hq, _maybe_unpack(w2q_ref[0], int4, w2sh),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)         # (S, H)
        acc_ref[:] += acc2.astype(jnp.float32) * hs
    else:
        acc_ref[:] += jax.lax.dot_general(
            h.astype(w2q_ref.dtype), w2q_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (S, H)

    @pl.when(ni == pl.num_programs(0) - 1)
    def _():
        acc = acc_ref[:]
        if quant:
            acc = acc * w2s_ref[0]
        out_ref[:] = (acc + b2_ref[0].astype(jnp.float32)).astype(out_ref.dtype)


def _kernel_pipelined(act_fn, n_tiles, int4, quant, lidx_ref, *refs):
    """Software-pipelined dense-FFN kernel (the moe_ffn.py transform):
    GEMM2 for tile ``ni-1`` issues before tile ``ni``'s VPU epilogue, so the
    MXU never waits on the dequant/act/requant chain; grid runs one extra
    drain step and hq/hs ping-pong in scratch."""
    if int4:
        (xq_ref, xs_ref, w1q_ref, w1sh_ref, w1s_ref, b1_ref, w2q_ref,
         w2sh_ref, w2s_ref, b2_ref, out_ref, acc_ref, hq_ref, hs_ref) = refs
    elif quant:
        (xq_ref, xs_ref, w1q_ref, w1s_ref, b1_ref, w2q_ref, w2s_ref, b2_ref,
         out_ref, acc_ref, hq_ref, hs_ref) = refs
    else:
        (xq_ref, w1q_ref, b1_ref, w2q_ref, b2_ref,
         out_ref, acc_ref, hq_ref) = refs
    ni = pl.program_id(0)

    @pl.when(ni == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(ni < n_tiles)
    def _():
        if quant:
            acc1 = jax.lax.dot_general(
                xq_ref[:], _maybe_unpack(w1q_ref[0], int4,
                                         w1sh_ref[0] if int4 else None),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)     # (S, BN)
            h = (acc1.astype(jnp.float32) * xs_ref[:] * w1s_ref[0]
                 + b1_ref[0].astype(jnp.float32))
        else:
            h = jax.lax.dot_general(
                xq_ref[:], w1q_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            h = h + b1_ref[0].astype(jnp.float32)
        h = act_fn(h)
        if quant:
            absmax = jnp.max(jnp.abs(h), axis=1, keepdims=True)
            hs = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
            hq_ref[ni % 2] = jnp.clip(jnp.round(h / hs), -127,
                                      127).astype(jnp.int8)
            hs_ref[ni % 2] = hs
        else:
            hq_ref[ni % 2] = h.astype(hq_ref.dtype)

    @pl.when(ni > 0)
    def _():
        acc2 = jax.lax.dot_general(
            hq_ref[(ni - 1) % 2],
            _maybe_unpack(w2q_ref[0], int4, w2sh_ref[0] if int4 else None),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if quant else jnp.float32)
        if quant:
            acc_ref[:] += acc2.astype(jnp.float32) * hs_ref[(ni - 1) % 2]
        else:
            acc_ref[:] += acc2

    @pl.when(ni == n_tiles)
    def _():
        acc = acc_ref[:]
        if quant:
            acc = acc * w2s_ref[0]
        out_ref[:] = (acc + b2_ref[0].astype(jnp.float32)).astype(out_ref.dtype)


def _pick_block_n(i: int, target: int) -> int:
    """Largest 128-multiple divisor of ``i`` that is <= target."""
    bn = (min(target, i) // 128) * 128   # align the start DOWN to 128
    while bn >= 128:
        if i % bn == 0:
            return bn
        bn -= 128
    return 0


def ffn_decode_fused(
    xq: jnp.ndarray,      # (S, H) int8 per-row-quantized input — or the
                          #   bf16 normed input when the weights are bf16
    xs,                   # (S, 1) float32 activation scales; None for bf16
    w1_q: jnp.ndarray,    # (H, I) or layer-stacked (L, H, I) int8/bf16;
                          #   int4 mode: (H/2, I) / (L, H/2, I) packed
    w1_s,                 # (1, I) / (L, 1, I) float32; None for bf16
    b1: jnp.ndarray,      # (I,) / (L, I)
    w2_q: jnp.ndarray,    # (I, H) / (L, I, H) int8/bf16; int4: packed
    w2_s,                 # (1, H) / (L, 1, H) float32; None for bf16
    b2: jnp.ndarray,      # (H,) / (L, H)
    layer_idx=None,       # required iff weights are layer-stacked
    out_dtype=jnp.bfloat16,
    hidden_act: str = "gelu",
    block_n=None,
    int4: bool = False,   # weights are int4 nibble-packed (quantize.py)
    w1_sh=None,           # int4: (H/128, I) / (L, H/128, I) int8 shifts
    w2_sh=None,           # int4: (I/128, H) / (L, I/128, H)
):
    """Whole-FFN output (S, H) = act(xq@w1 + b1) @ w2 + b2 with the hidden
    tile resident in VMEM. Quantized (int8/int4 + scales) and bf16 weight
    layouts share the tiling; the bf16 mode (scales None) keeps every dot
    in bf16 with f32 accumulation — no activation quantization. Caller
    gates eligibility via :func:`fused_eligible`."""
    quant = w1_s is not None
    if block_n is None:
        block_n = int(os.environ.get("APERTIS_FFN_FUSED_BN", "1216"))
    act_fn = kernel_activation(hidden_act)
    s, h = xq.shape
    if w1_q.ndim == 2:
        w1_q, w2_q = w1_q[None], w2_q[None]
        b1, b2 = b1[None], b2[None]
        if quant:
            w1_s, w2_s = w1_s[None], w2_s[None]
        if int4:
            w1_sh, w2_sh = w1_sh[None], w2_sh[None]
        layer_idx = 0
    nl, _, i = w1_q.shape
    bn = _pick_block_n(i, block_n)
    kdiv = 2 if int4 else 1   # packed contraction rows per weight byte row
    sp = -(-s // 32) * 32                              # int8 sublane multiple
    if sp != s:
        xq = jnp.pad(xq, ((0, sp - s), (0, 0)))
        if quant:
            xs = jnp.pad(xs, ((0, sp - s), (0, 0)))
    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    pipelined = os.environ.get("APERTIS_FFN_FUSED_PIPE", "1") == "1"
    n_tiles = i // bn
    hidden_dtype = jnp.int8 if quant else w1_q.dtype
    if pipelined:
        grid = (n_tiles + 1,)
        last = n_tiles - 1
        w1_map = lambda ni, li: (li[0], 0, jnp.minimum(ni, last))
        w2_map = lambda ni, li: (li[0], jnp.maximum(ni - 1, 0), 0)
        kernel = functools.partial(_kernel_pipelined, act_fn, n_tiles, int4,
                                   quant)
        scratch = [pltpu.VMEM((sp, h), jnp.float32),
                   pltpu.VMEM((2, sp, bn), hidden_dtype)]
        if quant:
            scratch += [pltpu.VMEM((2, sp, 1), jnp.float32)]
    else:
        grid = (n_tiles,)
        w1_map = lambda ni, li: (li[0], 0, ni)
        w2_map = lambda ni, li: (li[0], ni, 0)
        kernel = functools.partial(_kernel, act_fn, int4, quant)
        scratch = [pltpu.VMEM((sp, h), jnp.float32)]

    x_specs = [pl.BlockSpec((sp, h), lambda ni, li: (0, 0),
                            memory_space=pltpu.VMEM)]
    x_in = [xq]
    if quant:
        x_specs += [pl.BlockSpec((sp, 1), lambda ni, li: (0, 0),
                                 memory_space=pltpu.VMEM)]
        x_in += [xs]
    w1_specs = [pl.BlockSpec((1, h // kdiv, bn), w1_map,
                             memory_space=pltpu.VMEM)]
    w1_in = [w1_q]
    if int4:
        w1_specs += [pl.BlockSpec((1, h // 128, bn), w1_map,
                                  memory_space=pltpu.VMEM)]
        w1_in += [w1_sh]
    if quant:
        w1_specs += [pl.BlockSpec((1, 1, bn), w1_map,
                                  memory_space=pltpu.VMEM)]
        w1_in += [w1_s.reshape(nl, 1, i)]
    w2_specs = [pl.BlockSpec((1, bn // kdiv, h), w2_map,
                             memory_space=pltpu.VMEM)]
    w2_in = [w2_q]
    if int4:
        w2_specs += [pl.BlockSpec((1, bn // 128, h), w2_map,
                                  memory_space=pltpu.VMEM)]
        w2_in += [w2_sh]
    if quant:
        w2_specs += [pl.BlockSpec((1, 1, h), lambda ni, li: (li[0], 0, 0),
                                  memory_space=pltpu.VMEM)]
        w2_in += [w2_s.reshape(nl, 1, h)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=x_specs + w1_specs + [
            pl.BlockSpec((1, 1, bn), w1_map, memory_space=pltpu.VMEM),
        ] + w2_specs + [
            pl.BlockSpec((1, 1, h), lambda ni, li: (li[0], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sp, h), lambda ni, li: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((sp, h), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(lidx, *x_in, *w1_in, b1.reshape(nl, 1, i), *w2_in,
      b2.reshape(nl, 1, h))
    return out[:s]


def fused_eligible(w1: dict, w2: dict, rows: int) -> bool:
    """Static dispatch gate for the fused decode FFN: int8- (or packed
    int4-) quantized or plain bf16 dense weights, decode-scale row counts
    (the prefill path is compute-bound and XLA's pipelines win there),
    tileable intermediate width."""
    mode = os.environ.get("APERTIS_FFN_FUSED", "auto")
    if mode == "0":
        return False
    if not (isinstance(w1, dict) and isinstance(w2, dict)
            and "b" in w1 and "b" in w2):
        return False
    if "w_q4" in w1 and "w_q4" in w2:
        wq1, kdiv = w1["w_q4"], 2
    elif "w_q" in w1 and "w_q" in w2:
        wq1, kdiv = w1["w_q"], 1
    elif "w" in w1 and "w" in w2:
        wq1, kdiv = w1["w"], 1
    else:
        return False
    i = wq1.shape[-1]
    h = wq1.shape[-2] * kdiv
    if h % 128 != 0 or _pick_block_n(
            i, int(os.environ.get("APERTIS_FFN_FUSED_BN", "1216"))) == 0:
        return False
    if mode == "force":
        return True
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    # 512 is the measured VMEM ceiling at the 1.5B shapes: the kernel
    # keeps the (rows, H) x block AND an f32 (rows, H) accumulator
    # resident, so 1024 x 2432 rows blew scoped VMEM (b1024 bench, r5).
    return on_tpu and rows <= int(os.environ.get(
        "APERTIS_FFN_FUSED_MAX_ROWS", "512"))
