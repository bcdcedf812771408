"""Fused selective-SSM decode-step Pallas kernel (serving hot path; int8
and bf16 weight layouts).

One decode step of the SSM mixer is ~20 small XLA ops per layer (pre-norm,
two in-projections, conv window, x_param/dt projections, softplus, state
update, gating, out-projection), each a few microseconds of latency on
(B, d_inner)-sized tensors — profiled at ~0.62 ms of the dense 1.5B b256
step and the dominant cost of the 44-layer MoE family's step. This kernel
runs the ENTIRE mixer — RMS pre-norm -> quantize -> in_proj x/z -> causal
conv step -> SiLU -> B/C/dt projections -> softplus Δ -> h' = e^{ΔA}h + B
-> y = C·h' + D·x -> z-gate -> out_proj -> residual add — in one grid
step per row block, weights resident in VMEM.

Weights arrive LAYER-STACKED with the layer chosen by a scalar-prefetched
index (the moe_ffn.py lesson: XLA materialises dynamic-slice copies of
pallas operands inside the decode scan). The x_param projection is split
into three weight stacks (dt / B / C) at attach time (models/ssm_fuse.py)
so the kernel never lane-slices at 128-misaligned offsets.

Semantics mirror models/apertis._ssm_decode_step exactly (reference
recurrence: src/model/core.py:337-401) with the serving path's dynamic
per-row int8 activation quantization on the three big projections
(dt_proj stays bf16, like the quantizer's skip list).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_M = 256


def _quant_rows(x):
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(x * (1.0 / scale)), -127, 127).astype(jnp.int8)
    return q, scale


def _idot(q, wq_ref, scale, ws_ref):
    acc = jax.lax.dot_general(q, wq_ref[0], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * scale * ws_ref[0].astype(jnp.float32)


def _softplus(x):
    # Overflow-safe log(1 + e^x): above the knee it is x to f32 precision.
    safe = jnp.minimum(x, 20.0)
    return jnp.where(x > 20.0, x, jnp.log(1.0 + jnp.exp(safe)))


def _norm(x, eps, rms, w_ref, b_ref):
    """Pre-norm in f32: RMS (eps-on-RMS, zero-row-safe) or torch LayerNorm
    (zero-variance-safe) — the ops/norms.py semantics."""
    if rms:
        ss = jnp.sum(x * x, axis=1, keepdims=True)
        r = jnp.where(ss > 0, jnp.sqrt(jnp.where(ss > 0, ss, 1.0)), 0.0)
        r = r * (x.shape[1] ** -0.5)
        inv = jnp.where(ss > 0, 1.0 / (r + eps), 0.0)
        return x * inv * w_ref[0].astype(jnp.float32)
    mean = jnp.mean(x, axis=1, keepdims=True)
    cen = x - mean
    var = jnp.mean(cen * cen, axis=1, keepdims=True)
    inv = jnp.where(var > 0, jax.lax.rsqrt(var + eps), 0.0)
    return (cen * inv * w_ref[0].astype(jnp.float32)
            + b_ref[0].astype(jnp.float32))


def _bdot(x, w_ref):
    """bf16 MXU dot with f32 accumulation (non-quantized weight layout)."""
    return jax.lax.dot_general(
        x.astype(w_ref.dtype), w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _kernel(eps, rms, ffn_mode, num_experts, quant, lidx_ref, *refs):
    if quant:
        (h_ref, s0_ref, s1_ref, s2_ref, ssm_ref, expand_ref,
         normw_ref, normb_ref, inx_wq_ref, inx_ws_ref,
         inz_wq_ref, inz_ws_ref,
         convw_ref, convb_ref,
         xdt_wq_ref, xdt_ws_ref, xb_wq_ref, xb_ws_ref, xc_wq_ref,
         xc_ws_ref, dtw_ref, dtb_ref, a_ref, d_ref,
         out_wq_ref, out_ws_ref) = refs[:26]
        refs = refs[26:]
    else:
        (h_ref, s0_ref, s1_ref, s2_ref, ssm_ref, expand_ref,
         normw_ref, normb_ref, inx_w_ref, inz_w_ref,
         convw_ref, convb_ref,
         xdt_w_ref, xb_w_ref, xc_w_ref,
         dtw_ref, dtb_ref, a_ref, d_ref, out_w_ref) = refs[:20]
        refs = refs[20:]
    if ffn_mode != "none":
        fnw_ref, fnb_ref = refs[:2]
        refs = refs[2:]
    if ffn_mode == "moe":
        rlnw_ref, rlnb_ref, rw_ref, rb_ref = refs[:4]
        refs = refs[4:]
    hout_ref, xpout_ref, ssmout_ref = refs[:3]
    refs = refs[3:]
    if ffn_mode != "none":
        xqout_ref = refs[0]
        refs = refs[1:]
        # The MoE fat pack is int8 even under a bf16 mixer pack
        # (models/moe_fuse.py quantizes at attach time), so the MoE
        # epilogue always emits quantized activations.
        if quant or ffn_mode == "moe":
            xsout_ref = refs[0]
            refs = refs[1:]
    if ffn_mode == "moe":
        combout_ref = refs[0]

    x = h_ref[:].astype(jnp.float32)                       # (BM, D)

    nrm = _norm(x, eps, rms, normw_ref, normb_ref)

    if quant:
        nq, nscl = _quant_rows(nrm)
        x_proj = _idot(nq, inx_wq_ref, nscl, inx_ws_ref)   # (BM, C)
        z = _idot(nq, inz_wq_ref, nscl, inz_ws_ref)
    else:
        x_proj = _bdot(nrm, inx_w_ref)
        z = _bdot(nrm, inz_w_ref)

    # Depthwise causal conv over the carried window (K = 4), torch layout
    # taps: out = s0*w0 + s1*w1 + s2*w2 + x_t*w3 + b.
    xp_b = x_proj.astype(s0_ref.dtype)                     # cache dtype
    cw = convw_ref[0].astype(jnp.float32)                  # (K, C)
    yc = (s0_ref[:].astype(jnp.float32) * cw[0]
          + s1_ref[:].astype(jnp.float32) * cw[1]
          + s2_ref[:].astype(jnp.float32) * cw[2]
          + xp_b.astype(jnp.float32) * cw[3]
          + convb_ref[0].astype(jnp.float32))
    x_act = yc * jax.nn.sigmoid(yc)                        # SiLU

    if quant:
        aq, ascl = _quant_rows(x_act)
        dt_feats = _idot(aq, xdt_wq_ref, ascl, xdt_ws_ref)  # (BM, R)
        b_seg = _idot(aq, xb_wq_ref, ascl, xb_ws_ref)       # (BM, C)
        c_seg = _idot(aq, xc_wq_ref, ascl, xc_ws_ref)       # (BM, C)
    else:
        dt_feats = _bdot(x_act, xdt_w_ref)
        b_seg = _bdot(x_act, xb_w_ref)
        c_seg = _bdot(x_act, xc_w_ref)

    # dt_proj stays bf16 (quantizer skip list), softplus'd in f32.
    dt_raw = jax.lax.dot_general(
        dt_feats.astype(dtw_ref.dtype), dtw_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (BM, H)
    delta = _softplus(dt_raw + dtb_ref[0].astype(jnp.float32))

    # Broadcast per-head Δ over the head's d_state lanes with a 0/1 matmul
    # (Mosaic has no lane gather); a_ref carries -exp(A_log) pre-flattened.
    delta_c = jax.lax.dot_general(
        delta, expand_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (BM, C)
    a_bar = jnp.exp(delta_c * a_ref[0])
    h_new = a_bar * ssm_ref[:] + b_seg                     # recurrence step
    y = c_seg * h_new + d_ref[0].astype(jnp.float32) * x_act
    g = y * (z * jax.nn.sigmoid(z))

    if quant:
        gq, gscl = _quant_rows(g)
        out = _idot(gq, out_wq_ref, gscl, out_ws_ref)      # (BM, D)
    else:
        out = _bdot(g, out_w_ref)

    hsum = x + out                                         # residual add
    hout_ref[:] = hsum.astype(hout_ref.dtype)
    xpout_ref[:] = xp_b
    ssmout_ref[:] = h_new

    if ffn_mode == "none":
        return
    # ---- fused FFN-side epilogue: pre-norm (+ router) + quantize --------
    # n2 is rounded through bf16 first so the quantized activations match
    # the XLA path, which quantizes the bf16 output of _apply_norm.
    n2 = _norm(hsum, eps, rms, fnw_ref, fnb_ref)
    n2 = n2.astype(jnp.bfloat16).astype(jnp.float32)
    if ffn_mode == "dense":
        if quant:
            q2, s2 = _quant_rows(n2)
            xqout_ref[:] = q2
            xsout_ref[:] = s2
        else:
            # bf16 serving: the fused dense-FFN kernel (bf16 layout)
            # consumes the normed activation directly — no activation
            # quantization anywhere on the bf16 dense path.
            xqout_ref[:] = n2.astype(xqout_ref.dtype)
        return
    # MoE: the per-expert LayerNorm affine is folded into W1
    # (models/moe_fuse.py), so the expert input is the CENTERED/UNIT-VAR
    # form of n2 with the inverse folded into the row scales — exactly
    # ops/moe.moe_dense_fat_kernel's preparation.
    mean2 = jnp.mean(n2, axis=1, keepdims=True)
    cen2 = n2 - mean2
    var2 = jnp.mean(cen2 * cen2, axis=1, keepdims=True)
    inv2 = jnp.where(var2 > 0, jax.lax.rsqrt(var2 + eps), 0.0)
    q2, s2 = _quant_rows(cen2)
    xqout_ref[:] = q2
    xsout_ref[:] = s2 * inv2
    # Router (eval mode, top-2): LayerNorm -> f32 logits -> softmax ->
    # two first-index-wins argmax passes -> renormalised one-hot combine —
    # ops/moe.route + _top_k_gates + _combine_weights, in VMEM.
    rn = _norm(n2, eps, False, rlnw_ref, rlnb_ref)
    logits = jax.lax.dot_general(
        rn, rw_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + rb_ref[0].astype(jnp.float32)
    m = jnp.max(logits, axis=1, keepdims=True)
    e_l = jnp.exp(logits - m)
    gates = e_l / jnp.sum(e_l, axis=1, keepdims=True)      # (BM, E)
    lane = jax.lax.broadcasted_iota(jnp.int32, gates.shape, 1)
    w1 = jnp.max(gates, axis=1, keepdims=True)
    i1 = jnp.min(jnp.where(gates == w1, lane, num_experts),
                 axis=1, keepdims=True)
    is1 = lane == i1
    g2 = jnp.where(is1, -jnp.inf, gates)
    w2 = jnp.max(g2, axis=1, keepdims=True)
    i2 = jnp.min(jnp.where(g2 == w2, lane, num_experts),
                 axis=1, keepdims=True)
    is2 = lane == i2
    denom = w1 + w2 + 1e-6
    combout_ref[:] = (jnp.where(is1, w1, 0.0)
                      + jnp.where(is2, w2, 0.0)) / denom


def ssm_decode_step_fused(
    h: jnp.ndarray,          # (B, D) bf16 residual stream
    conv_state: jnp.ndarray, # (B, K-1, C) carried conv window (K-1 == 3)
    ssm_state: jnp.ndarray,  # (B, C) float32 (bitcast of (B, H, N))
    fused: dict,             # layer-stacked weight pack (models/ssm_fuse.py)
    layer_idx,
    eps: float,
    rms: bool,
    ffn_mode: str = "none",  # "none" | "dense" | "moe": fold the FFN
                             # pre-norm (+ router) + activation quantize in
):
    """Returns ``(h_plus_mixer_out, new_x_proj, new_ssm_state)`` plus — per
    ``ffn_mode`` — the FFN input (int8 pack: quantized ``(x_q, x_s)``;
    bf16 pack: the normed bf16 activation alone) and the MoE ``combine``
    weights; the caller rebuilds the conv window as
    ``[s1, s2, new_x_proj]``. The weight layout (int8 ``*_wq/*_ws`` vs
    bf16 ``*_w``, models/ssm_fuse.py) is detected from the pack."""
    b, d = h.shape
    c = ssm_state.shape[-1]
    quant = "inx_wq" in fused
    nl = fused["inx_wq" if quant else "inx_w"].shape[0]
    r = fused["xdt_wq" if quant else "xdt_w"].shape[-1]
    heads = fused["dt_w"].shape[-1]
    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    s0, s1, s2 = (conv_state[:, 0, :], conv_state[:, 1, :],
                  conv_state[:, 2, :])

    block_m = min(BLOCK_M, -(-b // 32) * 32)
    pad = -b % block_m
    if pad:
        widths = ((0, pad), (0, 0))
        h = jnp.pad(h, widths)
        s0, s1, s2 = (jnp.pad(t, widths) for t in (s0, s1, s2))
        ssm_state = jnp.pad(ssm_state, widths)
    bp = b + pad

    def rows(shape_c):
        return pl.BlockSpec((block_m, shape_c), lambda mi, li: (mi, 0),
                            memory_space=pltpu.VMEM)

    def stacked(*dims):
        return pl.BlockSpec((1,) + dims, lambda mi, li: (li[0],) + (0,) * len(dims),
                            memory_space=pltpu.VMEM)

    if quant:
        proj_specs = [
            stacked(d, c), stacked(1, c),    # in_x
            stacked(d, c), stacked(1, c),    # in_z
        ]
        xparam_specs = [
            stacked(c, r), stacked(1, r),    # x_param dt segment
            stacked(c, c), stacked(1, c),    # x_param B segment
            stacked(c, c), stacked(1, c),    # x_param C segment
        ]
        out_proj_specs = [stacked(c, d), stacked(1, d)]
        proj_in = [fused["inx_wq"], fused["inx_ws"],
                   fused["inz_wq"], fused["inz_ws"]]
        xparam_in = [fused["xdt_wq"], fused["xdt_ws"],
                     fused["xb_wq"], fused["xb_ws"],
                     fused["xc_wq"], fused["xc_ws"]]
        out_proj_in = [fused["out_wq"], fused["out_ws"]]
    else:
        proj_specs = [stacked(d, c), stacked(d, c)]
        xparam_specs = [stacked(c, r), stacked(c, c), stacked(c, c)]
        out_proj_specs = [stacked(c, d)]
        proj_in = [fused["inx_w"], fused["inz_w"]]
        xparam_in = [fused["xdt_w"], fused["xb_w"], fused["xc_w"]]
        out_proj_in = [fused["out_w"]]
    in_specs = [
        rows(d),                         # h
        rows(c), rows(c), rows(c),       # conv window planes
        rows(c),                         # ssm state
        stacked(heads, c),               # head-expansion 0/1 matrix
        stacked(1, d), stacked(1, d),    # norm weight, bias
        *proj_specs,
        stacked(fused["convw"].shape[1], c),  # conv taps (K, C)
        stacked(1, c),                   # conv bias
        *xparam_specs,
        stacked(r, heads), stacked(1, heads),  # dt_proj w, b
        stacked(1, c),                   # a_row = -exp(A_log)
        stacked(1, c),                   # D
        *out_proj_specs,                 # out_proj
    ]
    inputs = [lidx, h, s0, s1, s2, ssm_state, fused["expand"],
              fused["norm_w"], fused["norm_b"],
              *proj_in,
              fused["convw"], fused["convb"],
              *xparam_in,
              fused["dt_w"], fused["dt_b"],
              fused["a_row"], fused["d_row"],
              *out_proj_in]
    out_specs = [rows(d), rows(c), rows(c)]
    out_shape = [
        jax.ShapeDtypeStruct((bp, d), h.dtype),
        jax.ShapeDtypeStruct((bp, c), conv_state.dtype),
        jax.ShapeDtypeStruct((bp, c), jnp.float32),
    ]
    num_experts = 0
    if ffn_mode != "none":
        in_specs += [stacked(1, d), stacked(1, d)]   # FFN pre-norm w, b
        inputs += [fused["fnorm_w"], fused["fnorm_b"]]
        if quant or ffn_mode == "moe":
            out_specs += [rows(d), pl.BlockSpec((block_m, 1),
                                                lambda mi, li: (mi, 0),
                                                memory_space=pltpu.VMEM)]
            out_shape += [jax.ShapeDtypeStruct((bp, d), jnp.int8),
                          jax.ShapeDtypeStruct((bp, 1), jnp.float32)]
        else:
            out_specs += [rows(d)]
            out_shape += [jax.ShapeDtypeStruct((bp, d), jnp.bfloat16)]
    if ffn_mode == "moe":
        num_experts = fused["router_w"].shape[-1]
        in_specs += [stacked(1, d), stacked(1, d),   # router LN w, b
                     stacked(d, num_experts), stacked(1, num_experts)]
        inputs += [fused["rln_w"], fused["rln_b"],
                   fused["router_w"], fused["router_b"]]
        out_specs += [rows(num_experts)]
        out_shape += [jax.ShapeDtypeStruct((bp, num_experts), jnp.float32)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bp // block_m,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[],
    )
    outs = pl.pallas_call(
        functools.partial(_kernel, eps, rms, ffn_mode, num_experts, quant),
        interpret=jax.default_backend() != "tpu",
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(*inputs)
    return tuple(o[:b] for o in outs)


def ssm_step_fused_enabled(rows: int) -> bool:
    """Dispatch gate: serving decode on TPU at dyn-int8 row counts (the XLA
    path quantizes activations per row from 128 rows up — the kernel keeps
    the same numerics class); APERTIS_SSM_STEP=0|auto|force."""
    mode = os.environ.get("APERTIS_SSM_STEP", "auto")
    if mode == "0":
        return False
    if mode == "force":
        return True
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    return on_tpu and 128 <= rows <= int(os.environ.get(
        "APERTIS_SSM_STEP_MAX_ROWS", "1024"))
