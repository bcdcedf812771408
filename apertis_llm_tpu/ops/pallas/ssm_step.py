"""Fused selective-SSM decode-step Pallas kernel (int8 serving hot path).

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


def _kernel(eps, rms, lidx_ref,
            h_ref, s0_ref, s1_ref, s2_ref, ssm_ref, expand_ref,
            normw_ref, normb_ref, inx_wq_ref, inx_ws_ref,
            inz_wq_ref, inz_ws_ref,
            convw_ref, convb_ref,
            xdt_wq_ref, xdt_ws_ref, xb_wq_ref, xb_ws_ref, xc_wq_ref,
            xc_ws_ref, dtw_ref, dtb_ref, a_ref, d_ref,
            out_wq_ref, out_ws_ref,
            hout_ref, xpout_ref, ssmout_ref):
    x = h_ref[:].astype(jnp.float32)                       # (BM, D)

    if rms:
        # RMS pre-norm: eps-on-RMS, zero-row-safe inverse (ops/norms.py)
        ss = jnp.sum(x * x, axis=1, keepdims=True)
        r = jnp.where(ss > 0, jnp.sqrt(jnp.where(ss > 0, ss, 1.0)), 0.0)
        r = r * (x.shape[1] ** -0.5)
        inv = jnp.where(ss > 0, 1.0 / (r + eps), 0.0)
        nrm = x * inv * normw_ref[0].astype(jnp.float32)
    else:
        # torch-semantics LayerNorm with the zero-variance-safe inverse
        mean = jnp.mean(x, axis=1, keepdims=True)
        cen = x - mean
        var = jnp.mean(cen * cen, axis=1, keepdims=True)
        inv = jnp.where(var > 0, jax.lax.rsqrt(var + eps), 0.0)
        nrm = (cen * inv * normw_ref[0].astype(jnp.float32)
               + normb_ref[0].astype(jnp.float32))

    nq, nscl = _quant_rows(nrm)
    x_proj = _idot(nq, inx_wq_ref, nscl, inx_ws_ref)       # (BM, C)
    z = _idot(nq, inz_wq_ref, nscl, inz_ws_ref)

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

    aq, ascl = _quant_rows(x_act)
    dt_feats = _idot(aq, xdt_wq_ref, ascl, xdt_ws_ref)     # (BM, R)
    b_seg = _idot(aq, xb_wq_ref, ascl, xb_ws_ref)          # (BM, C)
    c_seg = _idot(aq, xc_wq_ref, ascl, xc_ws_ref)          # (BM, C)

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

    gq, gscl = _quant_rows(g)
    out = _idot(gq, out_wq_ref, gscl, out_ws_ref)          # (BM, D)

    hout_ref[:] = (x + out).astype(hout_ref.dtype)         # residual add
    xpout_ref[:] = xp_b
    ssmout_ref[:] = h_new


def ssm_decode_step_fused(
    h: jnp.ndarray,          # (B, D) bf16 residual stream
    conv_state: jnp.ndarray, # (B, K-1, C) carried conv window (K-1 == 3)
    ssm_state: jnp.ndarray,  # (B, C) float32 (bitcast of (B, H, N))
    fused: dict,             # layer-stacked weight pack (models/ssm_fuse.py)
    layer_idx,
    eps: float,
    rms: bool,
):
    """Returns ``(h_plus_mixer_out, new_x_proj, new_ssm_state)``; the caller
    rebuilds the conv window as ``[s1, s2, new_x_proj]``."""
    b, d = h.shape
    c = ssm_state.shape[-1]
    nl = fused["inx_wq"].shape[0]
    r = fused["xdt_wq"].shape[-1]
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bp // block_m,),
        in_specs=[
            rows(d),                         # h
            rows(c), rows(c), rows(c),       # conv window planes
            rows(c),                         # ssm state
            stacked(heads, c),               # head-expansion 0/1 matrix
            stacked(1, d), stacked(1, d),    # norm weight, bias
            stacked(d, c), stacked(1, c),    # in_x
            stacked(d, c), stacked(1, c),    # in_z
            stacked(fused["convw"].shape[1], c),  # conv taps (K, C)
            stacked(1, c),                   # conv bias
            stacked(c, r), stacked(1, r),    # x_param dt segment
            stacked(c, c), stacked(1, c),    # x_param B segment
            stacked(c, c), stacked(1, c),    # x_param C segment
            stacked(r, heads), stacked(1, heads),  # dt_proj w, b
            stacked(1, c),                   # a_row = -exp(A_log)
            stacked(1, c),                   # D
            stacked(c, d), stacked(1, d),    # out_proj
        ],
        out_specs=[rows(d), rows(c), rows(c)],
        scratch_shapes=[],
    )
    hout, xpout, ssmout = pl.pallas_call(
        functools.partial(_kernel, eps, rms),
        interpret=jax.default_backend() != "tpu",
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bp, d), h.dtype),
            jax.ShapeDtypeStruct((bp, c), conv_state.dtype),
            jax.ShapeDtypeStruct((bp, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(lidx, h, s0, s1, s2, ssm_state, fused["expand"],
      fused["norm_w"], fused["norm_b"],
      fused["inx_wq"], fused["inx_ws"],
      fused["inz_wq"], fused["inz_ws"],
      fused["convw"], fused["convb"],
      fused["xdt_wq"], fused["xdt_ws"],
      fused["xb_wq"], fused["xb_ws"],
      fused["xc_wq"], fused["xc_ws"],
      fused["dt_w"], fused["dt_b"],
      fused["a_row"], fused["d_row"],
      fused["out_wq"], fused["out_ws"])
    return hout[:b], xpout[:b], ssmout[:b]


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
