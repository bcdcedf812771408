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
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_M = 128


def _erf(x: jnp.ndarray) -> jnp.ndarray:
    """erf as tanh of an odd quintic: ONE hardware transcendental, 4 mults.

    Mosaic's TPU lowering has no erf/erfc primitive. The A&S 7.1.26
    rational form this kernel originally used needs a divide AND an exp,
    and a div/exp-free piecewise deg-8 polynomial needs ~32 mult/add
    passes — BOTH xplane-measured at ~29 us/layer of VPU time inside the
    fat MoE kernel at the 1.5B b256 decode shapes (91.1 us/layer vs
    62.5 us/layer with this form, round 4; the dense-FFN kernel shares the
    activation through kernel_activation). tanh is a single-pass hardware
    op on the VPU, so erf(x) = tanh(x*(a + b*x^2 + c*x^4)) costs ~nothing;
    its |error| <= 3.7e-5 (coefficients minimax-refit over [0, 6]; odd
    symmetry and saturation are inherited from tanh) stays ~1 order below
    the int8 requantization noise the kernel already carries — pinned
    against exact GELU by tests/test_moe_fused.py."""
    # Clamp to the fit domain: the quintic's argument changes sign past
    # |x| ~ 8.25; erf(6) is 1 to f32 precision, so the clamp is exact.
    xc = jnp.clip(x, -6.0, 6.0)
    z2 = xc * xc
    return jnp.tanh(xc * (1.1281433796476101
                          + z2 * (0.10408118539321598
                                  + z2 * -0.0017864744333988334)))


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


def maybe_unpack_int4(w, int4: bool, sh=None):
    """int4 mode: the weight block arrives nibble-PACKED (in/2, n) int8 and
    unpacks to int8 in VMEM (models/quantize.unpack_int4's group-128
    interleave — reshape/shift/concat plus one broadcast integer multiply
    by the per-(group, channel) shift factors, Mosaic-lowerable). The HBM
    DMA moves half the bytes; the VPU unpack overlaps the (halved) weight
    stream on a DMA-bound kernel. Shared by the dense-FFN decode kernel
    (ops/pallas/ffn_fused.py)."""
    if not int4:
        return w
    from apertis_llm_tpu.models.quantize import unpack_int4

    return unpack_int4(w, sh)


def _fat_kernel(act_fn, tiles_per_expert, bf16_dot2, int4,
                lidx_ref, *refs):
    """Combine-folded fused MoE FFN: one grid step per intermediate tile.

    Grid axis = tiles of the flattened E*I intermediate (each tile inside
    one expert). Per step: int8 GEMM1 on the resident x block -> dequant ->
    +b1 -> act -> x combine column for the tile's expert (selected from the
    resident (S, E) block with an iota mask — Mosaic supports neither
    in-kernel dynamic_slice nor sub-128-lane blocks) -> requantize per
    (row, tile) -> int8 GEMM2 accumulated into the (S, H) output scratch. The hidden tile lives only in VMEM;
    weight slices stream exactly once. Per-(row, tile) hidden scales fold
    into the accumulation (finer than the fat path's per-row scales); W2's
    shared per-output-channel scale is applied once in the epilogue.

    Weights arrive LAYER-STACKED (L, ...) with the layer chosen by the
    scalar-prefetched ``lidx_ref`` through the BlockSpec index maps: inside
    the decode lax.scan over layers, XLA cannot fuse a dynamic-slice of the
    stacked weights into a pallas operand and materialises a full copy of
    both expert matrices every layer step (profiled at ~47 us/layer of the
    ~94 us kernel time at the 1.5B shapes) — prefetching the index instead
    DMAs tiles straight from the resident stack."""
    if int4:
        (xq_ref, xs_ref, comb_ref, w1q_ref, w1sh_ref, w1s_ref, b1_ref,
         w2q_ref, w2sh_ref, w2s_ref, out_ref, acc_ref) = refs
        w1sh, w2sh = w1sh_ref[0], w2sh_ref[0]
    else:
        (xq_ref, xs_ref, comb_ref, w1q_ref, w1s_ref, b1_ref,
         w2q_ref, w2s_ref, out_ref, acc_ref) = refs
        w1sh = w2sh = None
    ni = pl.program_id(0)

    @pl.when(ni == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xq = xq_ref[:]                                    # (S, H) int8 resident
    acc1 = jax.lax.dot_general(
        xq, maybe_unpack_int4(w1q_ref[0], int4, w1sh),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)             # (S, BN)
    h = acc1.astype(jnp.float32) * xs_ref[:] * w1s_ref[0] + b1_ref[0]
    h = act_fn(h)
    # Select the tile's expert combine column from the resident (S, E)
    # block with an iota mask — Mosaic supports neither in-kernel
    # dynamic_slice nor sub-128-lane block shapes.
    e_idx = ni // tiles_per_expert
    comb = comb_ref[:]                                # (S, E)
    lane = jax.lax.broadcasted_iota(jnp.int32, comb.shape, 1)
    col = jnp.sum(jnp.where(lane == e_idx, comb, 0.0), axis=1, keepdims=True)
    h = h * col

    if bf16_dot2:
        # Skip the requantize: dot bf16 activations against the raw int8
        # weights cast to bf16 (integers <= 127 are exact in bf16). Trades
        # the absmax/round/clip VPU passes for a bf16-rate MXU dot.
        acc2 = jax.lax.dot_general(
            h.astype(jnp.bfloat16),
            maybe_unpack_int4(w2q_ref[0], int4, w2sh).astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (S, H)
        acc_ref[:] += acc2
    else:
        absmax = jnp.max(jnp.abs(h), axis=1, keepdims=True)
        hs = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
        hq = jnp.clip(jnp.round(h / hs), -127, 127).astype(jnp.int8)

        acc2 = jax.lax.dot_general(
            hq, maybe_unpack_int4(w2q_ref[0], int4, w2sh),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)         # (S, H)
        acc_ref[:] += acc2.astype(jnp.float32) * hs

    @pl.when(ni == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = (acc_ref[:] * w2s_ref[0]).astype(out_ref.dtype)


def _fat_kernel_pipelined(act_fn, tiles_per_expert, n_tiles, int4,
                          lidx_ref, *refs):
    """Software-pipelined fat kernel: GEMM2 for tile ``ni-1`` issues BEFORE
    tile ``ni``'s epilogue, so the MXU contraction overlaps the VPU's
    dequant/act/requant chain instead of waiting on it.

    The unpipelined kernel serialises GEMM1 (MXU) -> epilogue (VPU, ~3.7 us
    on a (256, 2816) tile: dequant, exact GELU, combine, absmax/round/clip)
    -> GEMM2 (MXU) within every grid step — xplane-profiled at 91 us/layer
    vs the ~41 us MXU+DMA roofline at the 1.5B-MoE shapes, i.e. the MXU
    idles through every epilogue. Here grid = n_tiles + 1; step ni computes
    GEMM1+epilogue for tile ni into a ping-pong hq/hs scratch and GEMM2 for
    tile ni-1 from the other buffer; the extra final step drains the last
    tile. The w1/w2 BlockSpec index maps are shifted accordingly, so tile
    DMA double-buffering is unchanged. The combine column folds into the
    per-(row, tile) requant scales ((S, 1) scalars) instead of a full
    (S, bn) multiply — combine weights are >= 0, so
    absmax(h*col) == absmax(h)*col and the quantized payload is identical.
    """
    if int4:
        (xq_ref, xs_ref, comb_ref, w1q_ref, w1sh_ref, w1s_ref, b1_ref,
         w2q_ref, w2sh_ref, w2s_ref, out_ref,
         acc_ref, hq_ref, hs_ref) = refs
    else:
        (xq_ref, xs_ref, comb_ref, w1q_ref, w1s_ref, b1_ref,
         w2q_ref, w2s_ref, out_ref, acc_ref, hq_ref, hs_ref) = refs
    ni = pl.program_id(0)

    @pl.when(ni == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(ni < n_tiles)
    def _():
        xq = xq_ref[:]                                # (S, H) int8 resident
        acc1 = jax.lax.dot_general(
            xq, maybe_unpack_int4(w1q_ref[0], int4,
                                  w1sh_ref[0] if int4 else None),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)         # (S, BN)
        h = acc1.astype(jnp.float32) * xs_ref[:] * w1s_ref[0] + b1_ref[0]
        h = act_fn(h)
        e_idx = ni // tiles_per_expert
        comb = comb_ref[:]                            # (S, E)
        lane = jax.lax.broadcasted_iota(jnp.int32, comb.shape, 1)
        col = jnp.sum(jnp.where(lane == e_idx, comb, 0.0), axis=1,
                      keepdims=True)
        absmax = jnp.max(jnp.abs(h), axis=1, keepdims=True)
        hs = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
        hq_ref[ni % 2] = jnp.clip(jnp.round(h / hs),
                                  -127, 127).astype(jnp.int8)
        hs_ref[ni % 2] = hs * col

    @pl.when(ni > 0)
    def _():
        acc2 = jax.lax.dot_general(
            hq_ref[(ni - 1) % 2],
            maybe_unpack_int4(w2q_ref[0], int4,
                              w2sh_ref[0] if int4 else None),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)         # (S, H)
        acc_ref[:] += acc2.astype(jnp.float32) * hs_ref[(ni - 1) % 2]

    @pl.when(ni == n_tiles)
    def _():
        out_ref[:] = (acc_ref[:] * w2s_ref[0]).astype(out_ref.dtype)


def expert_ffn_fat(
    xq: jnp.ndarray,      # (S, H) int8 — shared pre-quantized normalized x
    xs: jnp.ndarray,      # (S, 1) float32 per-row activation scales
    combine: jnp.ndarray, # (S, E) float32 routing-combine weights
    w1t_q: jnp.ndarray,   # (H, E*I) or layer-stacked (L, H, E*I) int8
    w1t_s: jnp.ndarray,   # (1, E*I) / (L, 1, E*I) float32
    b1t: jnp.ndarray,     # (E*I,) / (L, E*I) float32
    w2t_q: jnp.ndarray,   # (E*I, H) / (L, E*I, H) int8
    w2t_s: jnp.ndarray,   # (1, H) / (L, 1, H) float32 shared per-out-channel
    num_experts: int,
    layer_idx=None,       # required iff weights are layer-stacked
    out_dtype=jnp.bfloat16,
    hidden_act: str = "gelu",
    block_n: Optional[int] = None,
    bf16_dot2: Optional[bool] = None,
    pipelined: Optional[bool] = None,
    int4: bool = False,   # w1t/w2t are int4 nibble-packed (models/quantize)
    w1t_sh=None,          # int4: (H/128, E*I) / (L, H/128, E*I) int8 shifts
    w2t_sh=None,          # int4: (E*I/128, H) / (L, E*I/128, H)
) -> jnp.ndarray:
    """Combined MoE FFN output (S, H); ``combine @ b2`` is added outside."""
    import os

    if block_n is None:
        # 2816 (one whole expert per tile at the 1.5B-MoE shapes) measured
        # 91.3 vs 93.9 us/layer against 1408 on v5e; the bf16-GEMM2 variant
        # (APERTIS_MOE_FATK_BF16DOT2=1) measured 110 us — int8 requant stays.
        block_n = int(os.environ.get("APERTIS_MOE_FATK_BN", "2816"))
    if bf16_dot2 is None:
        bf16_dot2 = os.environ.get("APERTIS_MOE_FATK_BF16DOT2", "0") == "1"
    if pipelined is None:
        pipelined = os.environ.get("APERTIS_MOE_FATK_PIPE", "1") == "1"
    pipelined = pipelined and not bf16_dot2
    act_fn = kernel_activation(hidden_act)
    s, h = xq.shape
    if w1t_q.ndim == 2:
        # Unstacked: present as a 1-layer stack.
        w1t_q, w2t_q = w1t_q[None], w2t_q[None]
        w1t_s, b1t, w2t_s = w1t_s[None], b1t[None], w2t_s[None]
        if int4:
            w1t_sh, w2t_sh = w1t_sh[None], w2t_sh[None]
        layer_idx = 0
    nl, _, ei = w1t_q.shape
    i = ei // num_experts
    kdiv = 2 if int4 else 1   # packed contraction rows per weight byte row
    # Tile must stay inside one expert and keep the lane dim 128-aligned.
    bn = block_n
    while i % bn != 0 or bn % 128 != 0:
        bn //= 2
        if bn < 128:
            bn = 128 if i % 128 == 0 else i
            break
    if int4 and (bn % 128 or h % 128):
        raise ValueError("int4 fat kernel needs 128-aligned H and tile")
    tiles_per_expert = max(i // bn, 1)
    sp = -(-s // 32) * 32                             # int8 sublane multiple
    if sp != s:
        xq = jnp.pad(xq, ((0, sp - s), (0, 0)))
        xs = jnp.pad(xs, ((0, sp - s), (0, 0)))
        combine = jnp.pad(combine, ((0, sp - s), (0, 0)))
    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    n_tiles = ei // bn
    if pipelined:
        # Pipelined grid runs one extra drain step; tile index maps clamp
        # (GEMM1 side) or shift back one (GEMM2 side).
        grid = (n_tiles + 1,)
        last = n_tiles - 1

        def w1_map(ni, li):
            return (li[0], 0, jnp.minimum(ni, last))

        def w2_map(ni, li):
            return (li[0], jnp.maximum(ni - 1, 0), 0)

        kernel = functools.partial(_fat_kernel_pipelined, act_fn,
                                   tiles_per_expert, n_tiles, int4)
        scratch = [pltpu.VMEM((sp, h), jnp.float32),
                   pltpu.VMEM((2, sp, bn), jnp.int8),
                   pltpu.VMEM((2, sp, 1), jnp.float32)]
    else:
        grid = (n_tiles,)

        def w1_map(ni, li):
            return (li[0], 0, ni)

        def w2_map(ni, li):
            return (li[0], ni, 0)

        kernel = functools.partial(_fat_kernel, act_fn, tiles_per_expert,
                                   bf16_dot2, int4)
        scratch = [pltpu.VMEM((sp, h), jnp.float32)]

    # Index maps receive the grid ids then the scalar-prefetch refs.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((sp, h), lambda ni, li: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sp, 1), lambda ni, li: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sp, num_experts), lambda ni, li: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h // kdiv, bn), w1_map, memory_space=pltpu.VMEM),
            *([pl.BlockSpec((1, h // 128, bn), w1_map,
                            memory_space=pltpu.VMEM)] if int4 else []),
            pl.BlockSpec((1, 1, bn), w1_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), w1_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn // kdiv, h), w2_map, memory_space=pltpu.VMEM),
            *([pl.BlockSpec((1, bn // 128, h), w2_map,
                            memory_space=pltpu.VMEM)] if int4 else []),
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
    )(lidx, xq, xs, combine, w1t_q,
      *([w1t_sh] if int4 else []), w1t_s.reshape(nl, 1, ei),
      b1t.reshape(nl, 1, ei), w2t_q,
      *([w2t_sh] if int4 else []), w2t_s.reshape(nl, 1, h))
    return out[:s]


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
