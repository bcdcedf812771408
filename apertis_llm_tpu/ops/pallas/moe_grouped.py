"""Grouped (MegaBlocks-style) MoE FFN Pallas kernel for PREFILL.

The prefill/training grouped GEMMs ran through ``jax.lax.ragged_dot`` — a
custom-call XLA can neither fuse operands into nor epilogues out of.
xplane decomposition of the 1.5B-MoE b256 image+text TTFT (44 layers,
118,784 routed rows/layer) showed the structural costs that implies:

* the layer scan's dynamic-slice of the stacked expert weights cannot
  feed a custom-call in place — XLA MATERIALISED ~10 ms/layer of weight
  copies (bf16[8,2816,704] copy-starts + four quarter-slices of W1);
* the dots themselves ran at 38 % of the bf16 MXU rate (6.4 + 5.6
  ms/layer), and an int8 ragged_dot was measured STRICTLY WORSE (2,092
  vs 1,713 ms TTFT): its unfusable int32 accumulator (1.3 GB/layer)
  round-trips HBM, then a separate dequant/act/requant chain re-reads it;
* the (118,784 x 2816) activation epilogue cost a further ~5 ms/layer of
  pure bandwidth.

This kernel runs the whole grouped FFN per 128-row tile of the
expert-sorted token matrix, entirely in VMEM:

    int8 GEMM1 -> dequant +b1 -> act -> requantize -> int8 GEMM2

Groups are padded to tile multiples by the dispatcher (ops/moe.
moe_grouped_fat), so every tile belongs to exactly ONE expert; a
scalar-prefetched tile->expert map selects the weight blocks (together
with the scalar-prefetched layer index — the stacked weights stream
straight from the resident (L, ...) fat tensors with no per-layer copy,
the moe_ffn.py lesson). Consecutive tiles of the same expert reuse the
resident weight blocks (Pallas skips re-fetching blocks whose index is
unchanged), so each expert's weights stream from HBM once per layer.

Weights are the SAME combine-folded fat stack the decode kernel uses
(models/moe_fuse.py): per-expert LayerNorm affine folded into W1 (the
dispatcher applies one shared un-affine normalize), W2 scales shared
per output channel (the documented fat-layout coarsening), b2 applied
outside as ``combine @ b2``.

Reference counterpart: src/model/core.py:470-607 (expert dispatch), as
exercised by the prefill path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from apertis_llm_tpu.ops.pallas.moe_ffn import kernel_activation

TILE = 128


def _kernel(act_fn, lidx_ref, emap_ref, xq_ref, xs_ref, w1q_ref, w1s_ref,
            b1_ref, w2q_ref, w2s_ref, out_ref):
    xq = xq_ref[:]                                    # (T, H) int8
    acc1 = jax.lax.dot_general(
        xq, w1q_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)             # (T, I)
    h = (acc1.astype(jnp.float32) * xs_ref[:] * w1s_ref[0]
         + b1_ref[0].astype(jnp.float32))
    h = act_fn(h)
    # Requantize per row in VMEM: the f32 hidden never reaches HBM.
    absmax = jnp.max(jnp.abs(h), axis=1, keepdims=True)
    hs = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
    hq = jnp.clip(jnp.round(h / hs), -127, 127).astype(jnp.int8)
    acc2 = jax.lax.dot_general(
        hq, w2q_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)             # (T, H)
    out_ref[:] = (acc2.astype(jnp.float32) * hs
                  * w2s_ref[0]).astype(out_ref.dtype)


def expert_ffn_grouped(
    xq: jnp.ndarray,       # (P, H) int8 — expert-sorted, tile-padded rows
    xs: jnp.ndarray,       # (P, 1) f32 per-row activation scales
    emap: jnp.ndarray,     # (P/T,) int32 tile -> expert
    w1t_q: jnp.ndarray,    # (L, H, E*I) int8 fat stack (LN-affine folded)
    w1t_s: jnp.ndarray,    # (L, 1, E*I) f32
    b1t: jnp.ndarray,      # (L, E*I)
    w2t_q: jnp.ndarray,    # (L, E*I, H) int8
    w2t_s: jnp.ndarray,    # (L, 1, H) f32 shared per-out-channel
    num_experts: int,
    layer_idx,
    out_dtype=jnp.float32,
    hidden_act: str = "gelu",
) -> jnp.ndarray:
    """Whole grouped FFN output (P, H); combine weights / b2 applied by
    the caller. Requires P % TILE == 0 (the dispatcher pads groups)."""
    act_fn = kernel_activation(hidden_act)
    p, h = xq.shape
    nl, _, ei = w1t_q.shape
    i = ei // num_experts
    n_tiles = p // TILE
    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    emap = emap.astype(jnp.int32)
    # Operands must arrive PRE-SHAPED (L, 1, ·): a reshape here would sit
    # inside the caller's layer scan, and XLA materialises custom-call
    # operand copies per iteration instead of hoisting them (xplane:
    # ~0.7 s/TTFT of (44, 1, 22528) f32 slice-copies before this guard).
    if b1t.ndim == 2:
        b1t = b1t.reshape(nl, 1, ei)
    if w1t_s.ndim == 2:
        w1t_s = w1t_s.reshape(nl, 1, ei)
    if w2t_s.ndim == 2:
        w2t_s = w2t_s.reshape(nl, 1, h)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, h), lambda ni, li, em: (ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda ni, li, em: (ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, i), lambda ni, li, em: (li[0], 0, em[ni]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, i), lambda ni, li, em: (li[0], 0, em[ni]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, i), lambda ni, li, em: (li[0], 0, em[ni]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i, h), lambda ni, li, em: (li[0], em[ni], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h), lambda ni, li, em: (li[0], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, h), lambda ni, li, em: (ni, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel, act_fn),
        interpret=jax.default_backend() != "tpu",
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p, h), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(lidx, emap, xq, xs, w1t_q, w1t_s, b1t, w2t_q, w2t_s)


def grouped_eligible(fat_stack, num_experts: int) -> bool:
    """Static gate: TPU backend, int8 fat stack, VMEM-sized weight blocks.

    ``APERTIS_MOE_GROUPED``: ``auto`` (default), ``force`` (CPU interpret
    testing), ``0``. int4 fat stacks (w4a8 decode packs) keep the ragged
    path at prefill — w4a8 is a decode-only format."""
    import os

    mode = os.environ.get("APERTIS_MOE_GROUPED", "auto")
    if mode == "0":
        return False
    if not isinstance(fat_stack, dict) or "w1t_q" not in fat_stack:
        return False
    if fat_stack["w1t_q"].ndim != 3:
        return False
    _, h, ei = fat_stack["w1t_q"].shape
    if num_experts <= 0 or ei % num_experts:
        return False
    i = ei // num_experts
    # Double-buffered (H, I) + (I, H) int8 weight blocks plus the (T, I)
    # f32 hidden tile and (T, H) in/out blocks must fit scoped VMEM.
    vmem = 2 * 2 * (h * i) + TILE * i * 5 + TILE * h * 8
    if vmem > 14 * 1024 * 1024:
        return False
    if mode == "force":
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
