"""Fused MHA decode-attention Pallas kernel over a head-PAIRED KV cache.

The round-4 MHA serving profile (tools/profile_decode.py, PROF_ARCH=mha,
1.5B b64, 320-slot cache) showed the two decode-attention einsums costing
11.7 ms of a 15.9 ms step — ~42 % of HBM peak — for two structural
reasons this kernel removes:

* **Lane padding in HBM.** The (nl, B, H, L, Dh) cache's minor dim is
  head_dim = 64 < the 128-lane tile, so XLA stores (and streams) the
  multi-GB cache HALF PADDING (`bf16[...,320,64]{...:T(8,128)}` in the
  profile). The paired layout packs 128/head_dim adjacent heads into one
  128-lane block — cache shape (nl, B, H/pairs, L, 128) — so every HBM
  byte is payload.
* **f32 probability traffic + unfused mask/softmax chain.** One grid
  step streams a (pairs-block, L, 128) K/V tile through VMEM once and
  does score -> mask -> softmax -> context in-register, with the fresh
  token's self-term folded into the same softmax (the
  ops/attention.decode_attention_selfterm math, reorganised).

Per-head segment reductions use 0/1 MXU matrices ((128, pairs) to reduce
scores, (pairs, 128) to expand probabilities) — Mosaic has no lane-
segment reduce, and all dots here are standard minor-dim contractions,
so the kernel contains no transposes at all. Each pair's q row is folded
into the segment matrix (k-tile @ (q_col * seg)), so the (L, 128)
score product is never materialised and K/V stay bf16 in VMEM.

The layer-stacked cache is indexed by a scalar-prefetched layer id (the
moe_ffn.py lesson: a dynamic-slice feeding a pallas operand materialises
a full copy per decode-scan step).

Reference counterpart: src/model/core.py:705-832 (standard MHA decode).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(pairs, scale, quant, lidx_ref, *refs):
    if quant:
        (q_ref, qt_ref, qs_ref, kn_ref, vn_ref, bias_ref, seg_ref,
         segt_ref, k_ref, v_ref, ks_ref, vs_ref, out_ref) = refs
    else:
        (q_ref, qt_ref, kn_ref, vn_ref, bias_ref, seg_ref, segt_ref,
         k_ref, v_ref, out_ref) = refs
    p_blk = q_ref.shape[1]
    q = q_ref[0].astype(jnp.float32)              # (P, 128), pre-scaled
    qt = qt_ref[0]                                # (128, P), pre-scaled
                                                  # (quant: int8 values)
    kn = kn_ref[0].astype(jnp.float32)            # (P, 128)
    bias = bias_ref[0].astype(jnp.float32)        # (L, 1)
    seg = seg_ref[:]                              # (128, pairs) 0/1 f32
    segt = segt_ref[:]                            # (pairs, 128)
    if quant:
        qs = qs_ref[0]                            # (1, P) f32 q dequant
        # One f32 lane<->sublane transpose per grid step turns the
        # compactly-stored (P, L) scale blocks into the (L, 1) columns the
        # per-pair dequant broadcasts need (storing them L-minor instead
        # would tile-pad P=19 lanes to 128 in HBM — 6.7x scale traffic).
        ks_t = jnp.swapaxes(ks_ref[0, 0], 0, 1)   # (L, P)
        vs_t = jnp.swapaxes(vs_ref[0, 0], 0, 1)

    # Self-term scores for every pair at once: (P, pairs).
    s_self = jax.lax.dot_general(
        q * kn, seg, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    ctx_rows = []
    for p in range(p_blk):
        k_p = k_ref[0, 0, p]                      # (L, 128) bf16 / int8
        v_p = v_ref[0, 0, p]
        if quant:
            # int8 cache: scores via an int8 x int8 MXU dot against the
            # int8-quantized q column folded into the segment matrix. The
            # fold runs in f32 (Mosaic has no int8 vector multiply) and
            # converts back — exact for int8-valued floats times 0/1. The
            # per-slot cache scales and the per-pair-row q scale
            # dequantize the (L, pairs) int32 result on the VPU.
            segq = (seg * qt.astype(jnp.float32)[:, p:p + 1]
                    ).astype(jnp.int8)                      # (128, pairs)
            s = jax.lax.dot_general(
                k_p, segq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)           # (L, pairs)
            s = s.astype(jnp.float32) * (ks_t[:, p:p + 1] * qs[0, p])
        else:
            # Scores via MXU without materialising an (L, 128) product:
            # fold this pair's q column into the segment matrix.
            segq = (seg * qt.astype(jnp.float32)[:, p:p + 1]
                    ).astype(k_p.dtype)                     # (128, pairs)
            s = jax.lax.dot_general(
                k_p, segq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # (L, pairs)
        s = s + bias                                        # mask
        sp_self = s_self[p:p + 1, :]                        # (1, pairs)
        m = jnp.maximum(jnp.max(s, axis=0, keepdims=True), sp_self)
        probs = jnp.exp(s - m)                              # (L, pairs)
        p_self = jnp.exp(sp_self - m)                       # (1, pairs)
        denom = jnp.sum(probs, axis=0, keepdims=True) + p_self
        if quant:
            # Fold the per-slot V scales into the probabilities BEFORE the
            # 128-lane expansion: one (L, pairs) multiply instead of an
            # (L, 128) dequant multiply.
            probs = probs * vs_t[:, p:p + 1]
        # Expand per-head probabilities back to their 128-lane segments.
        pw = jax.lax.dot_general(
            probs, segt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (L, 128)
        ctx = jnp.sum(pw * v_p.astype(jnp.float32), axis=0,
                      keepdims=True)                        # (1, 128)
        ctx = ctx + jax.lax.dot_general(
            p_self, segt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * vn_ref[0, p:p + 1, :].astype(jnp.float32)
        inv = jax.lax.dot_general(
            1.0 / denom, segt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ctx_rows.append(ctx * inv)
    out_ref[0] = jnp.concatenate(ctx_rows, axis=0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("head_dim",))
def mha_decode_ctx(
    q: jnp.ndarray,        # (B, P, 128) pair-packed, post-RoPE
    k_stack: jnp.ndarray,  # (nl, B, P, L, 128) bf16 — or int8 with scales
    v_stack: jnp.ndarray,  # (nl, B, P, L, 128)
    k_new: jnp.ndarray,    # (B, P, 128) this token's key (self-term)
    v_new: jnp.ndarray,    # (B, P, 128)
    bias_t: jnp.ndarray,   # (B, L, 1) additive f32 (0 valid / NEG invalid)
    layer_idx,
    *,
    head_dim: int,
    ks_stack=None,         # (nl, B, P, L) f32 per-(pair-row, slot) K scales
    vs_stack=None,         # (nl, B, P, L) f32 V scales
) -> jnp.ndarray:
    """Single-token attention over one layer of the paired cache plus the
    explicit self-term; returns ctx (B, P, 128).

    With ``ks_stack``/``vs_stack`` the cache is int8 (half the HBM read —
    the step's dominant term): scores run as int8 x int8 MXU dots against
    a per-pair-row int8-quantized q (~0.4 % rounding on q, the same
    class as the serving path's activation quantization), and the V
    scales fold into the probabilities pre-expansion."""
    b, p_total, _ = q.shape
    l = k_stack.shape[3]
    pairs = 128 // head_dim
    scale = head_dim ** -0.5
    quant = ks_stack is not None
    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    eye = jnp.eye(pairs, dtype=jnp.float32)
    seg = jnp.repeat(eye, head_dim, axis=0)       # (128, pairs)
    segt = jnp.repeat(eye, head_dim, axis=1)      # (pairs, 128)

    def rows(*dims):
        return pl.BlockSpec((1,) + dims, lambda bi, li: (bi,) + (0,) * len(dims),
                            memory_space=pltpu.VMEM)

    def fixed(*dims):
        return pl.BlockSpec(dims, lambda bi, li: (0,) * len(dims),
                            memory_space=pltpu.VMEM)

    def stacked(minor=128):
        if minor is None:   # 4-D scale stacks (nl, B, P, L)
            return pl.BlockSpec((1, 1, p_total, l),
                                lambda bi, li: (li[0], bi, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, 1, p_total, l, minor),
                            lambda bi, li: (li[0], bi, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    if quant:
        # Per-pair-row symmetric int8 q (prescaled): the kernel folds the
        # int8 column into the segment matrix for the int8 score dot.
        qf = q.astype(jnp.float32)
        qmax = jnp.max(jnp.abs(qf), axis=2, keepdims=True)  # (B, P, 1)
        qscale = jnp.maximum(qmax, 1e-8) * (1.0 / 127.0)
        q_i = jnp.clip(jnp.round(qf / qscale), -127, 127).astype(jnp.int8)
        q_t = jnp.swapaxes(q_i, 1, 2)             # (B, 128, P) int8
        qs_in = [qscale.reshape(b, 1, p_total)]
        qs_specs = [rows(1, p_total)]
        sc_in = [ks_stack, vs_stack]
        sc_specs = [stacked(None), stacked(None)]
    else:
        q_t = jnp.swapaxes(q, 1, 2)               # (B, 128, P) — tiny
        qs_in, qs_specs, sc_in, sc_specs = [], [], [], []

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            rows(p_total, 128),               # q (pre-scaled)
            rows(128, p_total),               # q transposed (int8 if quant)
            *qs_specs,                        # q dequant scales
            rows(p_total, 128),               # k_new
            rows(p_total, 128),               # v_new
            rows(l, 1),                       # additive mask bias
            fixed(128, pairs),                # segment reduce matrix
            fixed(pairs, 128),                # segment expand matrix
            stacked(),                        # K cache (layer-stacked)
            stacked(),                        # V cache
            *sc_specs,                        # K/V per-slot scales
        ],
        out_specs=rows(p_total, 128),
    )
    return pl.pallas_call(
        functools.partial(_kernel, pairs, scale, quant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, p_total, 128), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(lidx, q, q_t, *qs_in, k_new, v_new, bias_t, seg, segt,
      k_stack, v_stack, *sc_in)


def pair_kv_enabled(config) -> bool:
    """Static gate for the paired-cache MHA decode path.

    ``APERTIS_MHA_STEP``: ``auto`` (default — on when the backend is TPU),
    ``force`` (CPU interpret-mode testing), ``0`` (off). Requires a
    power-of-two head_dim dividing 128 and a head count divisible by the
    pair width. Under ``APERTIS_QUANT_KV=1`` the paired cache stores int8
    values with per-(pair-row, slot) scales — half the step's dominant
    HBM read. Off under a parallel mesh: the kernel is single-device;
    TP/SP serving keeps the XLA self-term path."""
    mode = os.environ.get("APERTIS_MHA_STEP", "auto")
    if mode == "0":
        return False
    if config.attention_type == "selective_ssm":
        return False
    if config.head_dim not in (32, 64, 128):
        return False
    pairs = 128 // config.head_dim
    if config.num_attention_heads % pairs:
        return False
    from apertis_llm_tpu.parallel.context import current as _par_current

    if _par_current().mesh is not None:
        return False
    if mode == "force":
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def pair_cache_fits(config, max_length: int, quant: bool = False) -> bool:
    """Whether one batch row's full (P, L, 128) K and V blocks fit VMEM
    with Pallas double-buffering (the kernel streams whole per-row cache
    blocks; very long contexts keep the XLA path)."""
    pairs = 128 // config.head_dim
    p_rows = config.num_attention_heads // pairs
    elt = 1 if quant else 2                      # int8 / bf16
    blk = p_rows * max_length * (128 * elt + 4 * quant)  # + f32 scale row
    return 2 * 2 * blk <= 64 * 1024 * 1024


def quantize_pairs(t: jnp.ndarray):
    """Symmetric per-128-lane-row int8 for pair-packed K/V: returns
    ``(q int8, scale f32)`` with the trailing lane axis reduced away
    (scale shape = t.shape[:-1], the paired cache's scale-stack layout)."""
    absmax = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(t.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def pack_heads(z: jnp.ndarray) -> jnp.ndarray:
    """(B, 1, H*Dh) head-major projection -> (B, H/pairs, 128): adjacent
    heads share one 128-lane row (pure reshape — heads are contiguous)."""
    return z.reshape(z.shape[0], -1, 128)


def pack_cache(k: jnp.ndarray, pairs: int) -> jnp.ndarray:
    """(nl, B, H, L, Dh) -> (nl, B, H/pairs, L, 128) paired layout: head
    h = p*pairs + j occupies lanes [j*Dh, (j+1)*Dh) of pair-row p."""
    nl, b, h, l, dh = k.shape
    k = k.reshape(nl, b, h // pairs, pairs, l, dh)
    return jnp.moveaxis(k, 3, 4).reshape(nl, b, h // pairs, l, pairs * dh)
