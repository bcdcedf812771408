"""Fused MHA decode-attention Pallas kernel over a FLAT (L, H*Dh) KV cache.

The round-4 MHA serving profile (tools/profile_decode.py, PROF_ARCH=mha,
1.5B b64, 320-slot cache) showed the two decode-attention einsums costing
11.7 ms of a 15.9 ms step — ~42 % of HBM peak — because the
(nl, B, H, L, Dh) cache's minor dim is head_dim = 64 < the 128-lane tile,
so XLA stores (and streams) the multi-GB cache HALF PADDING. The round-5
PAIRED layout (128/head_dim heads per 128-lane row) fixed the padding but
kept a separate sublane axis per pair row, forcing the kernel into a
19-iteration Python loop of tiny (L, 128) x (128, pairs) dots — xplane
measured 426 us per (layer, batch=64) kernel call against a ~120 us DMA
floor: latency-bound on per-dot overhead, not bandwidth.

This kernel uses the natural FLAT layout instead: cache block (L, H*Dh)
— the projection output's own axis order, zero lane padding whenever
H*Dh is a multiple of 128 (the 1.5B MHA config: 38*64 = 2432 = 19 tiles)
— and computes ALL heads' scores in ONE MXU dot against a segment-masked
q matrix:

    s(L, H) = K(L, H*Dh) @ (seg(H*Dh, H) * q(H*Dh, 1))

where seg[d, h] = 1 iff lane d belongs to head h. Columns never mix
heads, so no cross-term masking is needed; softmax runs along the
sublane (slot) axis for every head at once; probabilities expand back to
lanes with the transposed segment matrix (one more dot) and reduce
against V on the VPU. The fresh token's K/V fold in as an explicit
self-term through the same softmax (the ops/attention math), and the
layer-stacked cache is indexed by a scalar-prefetched layer id (the
moe_ffn.py lesson: a dynamic-slice feeding a pallas operand materialises
a full copy per decode-scan step).

Under APERTIS_QUANT_KV=1 the cache stores int8 with per-(head, slot)
scales: scores run as int8 x int8 MXU dots against a per-head
int8-quantized q (~0.4 % q rounding, the serving path's
activation-quant class), and the V scales fold into the probabilities
before the lane expansion.

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


def _kernel(quant, lidx_ref, *refs):
    if quant:
        (q_ref, qi_ref, qs_ref, kn_ref, vn_ref, bias_ref, seg_ref,
         segt_ref, k_ref, v_ref, ks_ref, vs_ref, out_ref) = refs
    else:
        (q_ref, kn_ref, vn_ref, bias_ref, seg_ref, segt_ref,
         k_ref, v_ref, out_ref) = refs
    # Per-row operands carry a singleton middle axis so their (1, dims)
    # blocks satisfy Mosaic's last-two-dims rule; ref[0] drops it.
    seg = seg_ref[:]                              # (D, H) 0/1 f32
    segt = segt_ref[:]                            # (H, D)
    q = q_ref[0].astype(jnp.float32)              # (1, D), pre-scaled
    kn = kn_ref[0].astype(jnp.float32)            # (1, D)
    bias = jnp.swapaxes(bias_ref[0], 0, 1)        # (L, 1) f32
    k_blk = k_ref[0, 0]                           # (L, D) bf16 / int8

    # Self-term scores for every head at once — full-precision q even on
    # the quantized path: (1, H) = (q .* k_new) @ seg.
    s_self = jax.lax.dot_general(
        q * kn, seg, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    if quant:
        # int8 cache: ONE int8 x int8 MXU dot for all heads' scores. The
        # segment fold runs in f32 (Mosaic has no int8 vector multiply)
        # and converts back — exact for int8-valued floats times 0/1.
        qi_t = jnp.swapaxes(qi_ref[0].astype(jnp.float32), 0, 1)  # (D, 1)
        qseg = (seg * qi_t).astype(jnp.int8)                      # (D, H)
        s = jax.lax.dot_general(
            k_blk, qseg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)                     # (L, H)
        # One f32 transpose per grid step turns the compactly-stored
        # (H, L) scale blocks into (L, H) for the dequant broadcast
        # (storing them H-minor would tile-pad H=38 lanes to 128 in HBM).
        ks_t = jnp.swapaxes(ks_ref[0, 0], 0, 1)                   # (L, H)
        s = s.astype(jnp.float32) * (ks_t * qs_ref[0])
        vs_t = jnp.swapaxes(vs_ref[0, 0], 0, 1)
    else:
        q_t = jnp.swapaxes(q, 0, 1)                               # (D, 1)
        qseg = (seg * q_t).astype(k_blk.dtype)
        s = jax.lax.dot_general(
            k_blk, qseg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                   # (L, H)

    s = s + bias                                                  # mask
    m = jnp.maximum(jnp.max(s, axis=0, keepdims=True), s_self)    # (1, H)
    probs = jnp.exp(s - m)                                        # (L, H)
    p_self = jnp.exp(s_self - m)
    denom = jnp.sum(probs, axis=0, keepdims=True) + p_self
    if quant:
        # Fold the per-(head, slot) V scales into the probabilities
        # BEFORE the context contraction: one (L, H) multiply instead of
        # an (L, D) dequant multiply.
        probs = probs * vs_t
    # Context via ONE MXU dot: C[h, d] = sum_l probs[l, h] * v[l, d]
    # computes every head's probabilities against every head's V lanes;
    # the diagonal blocks (lane d inside head h's segment) are the real
    # contexts, selected by a tiny (H, D) mask-and-sublane-reduce. The
    # cross terms cost idle MXU cycles (~30M MACs) but replace the
    # (L, D)-sized expand + elementwise-reduce VPU passes that dominated
    # the per-step time.
    probs_t = jnp.swapaxes(probs, 0, 1)                           # (H, L)
    c_all = jax.lax.dot_general(
        probs_t, v_ref[0, 0].astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                       # (H, D)
    ctx = jnp.sum(c_all * segt, axis=0, keepdims=True)            # (1, D)
    ctx = ctx + jax.lax.dot_general(
        p_self, segt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * vn_ref[0].astype(jnp.float32)
    inv = jax.lax.dot_general(
        1.0 / denom, segt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0] = (ctx * inv).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("head_dim",))
def mha_decode_ctx(
    q: jnp.ndarray,        # (B, D) head-flat, post-RoPE
    k_stack: jnp.ndarray,  # (nl, B, L, D) bf16 — or int8 with scales
    v_stack: jnp.ndarray,  # (nl, B, L, D)
    k_new: jnp.ndarray,    # (B, D) this token's key (self-term)
    v_new: jnp.ndarray,    # (B, D)
    bias: jnp.ndarray,     # (B, L) additive f32 (0 valid / NEG invalid)
    layer_idx,
    *,
    head_dim: int,
    ks_stack=None,         # (nl, B, H, L) f32 per-(head, slot) K scales
    vs_stack=None,         # (nl, B, H, L) f32 V scales
) -> jnp.ndarray:
    """Single-token attention over one layer of the flat cache plus the
    explicit self-term; returns ctx (B, D)."""
    b, d = q.shape
    l = k_stack.shape[2]
    heads = d // head_dim
    scale = head_dim ** -0.5
    quant = ks_stack is not None
    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    seg = jnp.repeat(jnp.eye(heads, dtype=jnp.float32), head_dim,
                     axis=0)                          # (D, H)
    segt = jnp.swapaxes(seg, 0, 1)                    # (H, D)

    def rows(*dims):
        # (B, 1, dims) arrays with (1, 1, dims) blocks: the singleton
        # middle axis keeps Mosaic's last-two-block-dims rule satisfied
        # (the trailing dims equal the array's).
        return pl.BlockSpec((1, 1) + dims,
                            lambda bi, li: (bi,) + (0,) * (len(dims) + 1),
                            memory_space=pltpu.VMEM)

    def fixed(*dims):
        return pl.BlockSpec(dims, lambda bi, li: (0,) * len(dims),
                            memory_space=pltpu.VMEM)

    def stacked(*dims):
        return pl.BlockSpec((1, 1) + dims,
                            lambda bi, li: (li[0], bi) + (0,) * len(dims),
                            memory_space=pltpu.VMEM)

    if quant:
        # Per-head symmetric int8 q (prescaled): the kernel folds the int8
        # column into the segment matrix for the int8 score dot.
        qf = q.astype(jnp.float32).reshape(b, heads, head_dim)
        qmax = jnp.max(jnp.abs(qf), axis=2)           # (B, H)
        qscale = jnp.maximum(qmax, 1e-8) * (1.0 / 127.0)
        q_i = jnp.clip(jnp.round(qf / qscale[..., None]), -127,
                       127).reshape(b, d)             # int8-valued f32
        extra_in = [q_i, qscale]
        extra_specs = [rows(d), rows(heads)]
        sc_in = [ks_stack, vs_stack]
        sc_specs = [stacked(heads, l), stacked(heads, l)]
    else:
        extra_in, extra_specs, sc_in, sc_specs = [], [], [], []

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            rows(d),                          # q (pre-scaled, f32-precision)
            *extra_specs,                     # int8-valued q + head scales
            rows(d),                          # k_new
            rows(d),                          # v_new
            rows(l),                          # additive mask bias
            fixed(d, heads),                  # segment reduce matrix
            fixed(heads, d),                  # segment expand matrix
            stacked(l, d),                    # K cache (layer-stacked)
            stacked(l, d),                    # V cache
            *sc_specs,                        # K/V per-(head, slot) scales
        ],
        out_specs=rows(d),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, quant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, d), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(lidx, q[:, None, :], *[z[:, None, :] for z in extra_in],
      k_new[:, None, :], v_new[:, None, :], bias[:, None, :], seg, segt,
      k_stack, v_stack, *sc_in)
    return out[:, 0, :]


def pair_kv_enabled(config) -> bool:
    """Static gate for the flat-cache MHA decode path.

    ``APERTIS_MHA_STEP``: ``auto`` (default — on when the backend is TPU),
    ``force`` (CPU interpret-mode testing), ``0`` (off). Requires the
    flattened head dim (H * Dh) to be a multiple of the 128-lane tile
    (zero cache padding — the layout's whole point). Off under a parallel
    mesh: the kernel is single-device; TP/SP serving keeps the XLA
    self-term path."""
    mode = os.environ.get("APERTIS_MHA_STEP", "auto")
    if mode == "0":
        return False
    if config.attention_type == "selective_ssm":
        return False
    if (config.num_attention_heads * config.head_dim) % 128:
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
    """Whether one batch row's full (L, D) K and V blocks fit VMEM with
    Pallas double-buffering (the kernel streams whole per-row cache
    blocks; very long contexts keep the XLA path)."""
    d = config.num_attention_heads * config.head_dim
    elt = 1 if quant else 2                      # int8 / bf16
    blk = max_length * d * elt
    seg_bytes = 2 * 4 * d * config.num_attention_heads
    return 2 * 2 * blk + seg_bytes <= 64 * 1024 * 1024


def quantize_heads(t: jnp.ndarray, head_dim: int):
    """Symmetric per-head-segment int8 for flat K/V rows: the trailing
    axis (D = H*Dh) quantizes per 64/128-lane head segment. Returns
    ``(q int8 — same shape, scale f32 — shape[:-1] + (H,))``."""
    lead = t.shape[:-1]
    heads = t.shape[-1] // head_dim
    tf = t.astype(jnp.float32).reshape(lead + (heads, head_dim))
    absmax = jnp.max(jnp.abs(tf), axis=-1)
    scale = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(tf / scale[..., None]), -127,
                 127).astype(jnp.int8)
    return q.reshape(t.shape), scale


def pack_heads(z: jnp.ndarray) -> jnp.ndarray:
    """(B, 1, H*Dh) head-major projection -> (B, D): the flat cache row IS
    the projection layout (pure reshape)."""
    return z.reshape(z.shape[0], -1)


def pack_cache(k: jnp.ndarray) -> jnp.ndarray:
    """(nl, B, H, L, Dh) head-major prefill cache -> (nl, B, L, H*Dh)
    flat layout: one transpose at the prefill->decode handoff."""
    nl, b, h, l, dh = k.shape
    return jnp.moveaxis(k, 2, 3).reshape(nl, b, l, h * dh)
