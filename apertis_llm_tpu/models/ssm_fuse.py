"""Serving-time weight pack for the fused SSM decode-step kernel.

Built once by the inference engine after quantization (the MoE analogue is
models/moe_fuse.py): reorganises the layer-stacked SSM mixer weights into
the shapes ops/pallas/ssm_step.py consumes —

  * the x_param projection split into three stacks (dt / B / C) so the
    kernel never lane-slices its fat output at 128-misaligned offsets,
  * conv taps transposed to (L, K, C) so each tap is a lane row,
  * ``-exp(A_log)`` pre-flattened to (L, 1, H*N),
  * a (H, H*N) 0/1 head-expansion matrix (Mosaic has no lane gather).

The pack is attached under ``params["layers"]["attn"]["fused"]`` and
hoisted out of the scanned tree by decode_step; the full-sequence paths
never read it (scan xs DCE drops it from prefill/training programs).
"""

from __future__ import annotations

import jax.numpy as jnp


def ssm_fusable(params: dict, config) -> bool:
    """True iff the serving tree carries everything the fused decode-step
    kernel needs (RMS or LayerNorm pre-norm; bf16 dt) in ONE of its two
    weight layouts: int8 {w_q, w_s} on all four big projections, or plain
    bf16 {w} on all four (non-quantized serving, VERDICT r4 item 7)."""
    return _fuse_kind(params, config) is not None


def _fuse_kind(params: dict, config):
    """``"int8"`` / ``"bf16"`` / None — which fused-pack layout the tree
    supports (mixed trees are not fusable)."""
    if config.attention_type != "selective_ssm":
        return None
    if config.ssm_conv_kernel != 4:
        return None
    attn = params.get("layers", {}).get("attn")
    if not isinstance(attn, dict):
        return None
    kinds = set()
    for key in ("in_proj_x", "in_proj_z", "x_param_proj", "out_proj"):
        sub = attn.get(key)
        if not isinstance(sub, dict):
            return None
        if "w_q" in sub:
            kinds.add("int8")
        elif "w" in sub:
            kinds.add("bf16")
        else:
            return None
    if len(kinds) != 1:
        return None
    pre = attn.get("pre_norm", {})
    has_norm = "scale" in pre or ("w" in pre and "b" in pre)
    if not (has_norm and "w" in attn.get("dt_proj", {})
            and "w" in attn.get("conv", {})):
        return None
    return kinds.pop()


def attach_fused_ssm_params(params: dict, config) -> dict:
    """Return params with the fused decode pack attached (no-op when the
    tree is not fusable)."""
    kind = _fuse_kind(params, config)
    if kind is None:
        return params
    attn = params["layers"]["attn"]
    nl = attn["A_log"].shape[0]
    heads, d_state = config.num_attention_heads, config.ssm_d_state
    c = heads * d_state
    r = config.ssm_dt_rank

    pre = attn["pre_norm"]
    if "scale" in pre:
        norm_w, norm_b = pre["scale"], jnp.zeros_like(pre["scale"])
    else:
        norm_w, norm_b = pre["w"], pre["b"]
    if kind == "bf16":
        # Non-quantized layout: the kernel does bf16 MXU dots directly —
        # same tensor roles, no scale rows.
        xp_w = attn["x_param_proj"]["w"]
        proj = {
            "inx_w": attn["in_proj_x"]["w"],
            "inz_w": attn["in_proj_z"]["w"],
            "xdt_w": xp_w[:, :, :r],
            "xb_w": xp_w[:, :, r:r + c],
            "xc_w": xp_w[:, :, r + c:],
            "out_w": attn["out_proj"]["w"],
        }
    else:
        xp_wq, xp_ws = attn["x_param_proj"]["w_q"], attn["x_param_proj"]["w_s"]
        proj = {
            "inx_wq": attn["in_proj_x"]["w_q"],
            "inx_ws": attn["in_proj_x"]["w_s"],
            "inz_wq": attn["in_proj_z"]["w_q"],
            "inz_ws": attn["in_proj_z"]["w_s"],
            "xdt_wq": xp_wq[:, :, :r], "xdt_ws": xp_ws[:, :, :r],
            "xb_wq": xp_wq[:, :, r:r + c], "xb_ws": xp_ws[:, :, r:r + c],
            "xc_wq": xp_wq[:, :, r + c:], "xc_ws": xp_ws[:, :, r + c:],
            "out_wq": attn["out_proj"]["w_q"],
            "out_ws": attn["out_proj"]["w_s"],
        }
    fused = {
        "norm_w": norm_w[:, None, :],
        "norm_b": norm_b[:, None, :],
        **proj,
        "convw": jnp.transpose(attn["conv"]["w"], (0, 2, 1)),   # (L, K, C)
        "convb": attn["conv"]["b"][:, None, :],
        "dt_w": attn["dt_proj"]["w"],
        "dt_b": attn["dt_proj"]["b"][:, None, :],
        "a_row": -jnp.exp(attn["A_log"].astype(jnp.float32)
                          ).reshape(nl, 1, c),
        "d_row": attn["D"][:, None, :],
        # Layer-stacked though identical per layer: every leaf of the
        # attached pack must carry the leading depth axis so the
        # full-sequence scan over params["layers"] still traces (the
        # prefill body never reads it; XLA DCEs the slices).
        "expand": jnp.broadcast_to(
            jnp.repeat(jnp.eye(heads, dtype=jnp.float32), d_state, axis=1),
            (nl, heads, c)),                                    # (L, H, C)
    }
    # FFN-side epilogue tensors (optional): the kernel can also emit the
    # FFN pre-norm + per-row int8 quantize of its output — and, for MoE,
    # the router's top-2 combine weights — removing the remaining XLA glue
    # between the mixer and FFN kernels on the decode path.
    ffn = params["layers"].get("ffn")
    if isinstance(ffn, dict) and isinstance(ffn.get("pre_norm"), dict):
        pre2 = ffn["pre_norm"]
        if "scale" in pre2:
            f_w, f_b = pre2["scale"], jnp.zeros_like(pre2["scale"])
        else:
            f_w, f_b = pre2["w"], pre2["b"]
        fused["fnorm_w"] = f_w[:, None, :]
        fused["fnorm_b"] = f_b[:, None, :]
        router, rln = ffn.get("router"), ffn.get("router_ln")
        if (isinstance(router, dict) and "w" in router
                and isinstance(rln, dict) and "w" in rln):
            fused["rln_w"] = rln["w"][:, None, :]
            fused["rln_b"] = rln["b"][:, None, :]
            fused["router_w"] = router["w"]
            fused["router_b"] = router["b"][:, None, :]
    params = dict(params)
    params["layers"] = dict(params["layers"])
    params["layers"]["attn"] = dict(attn)
    params["layers"]["attn"]["fused"] = fused
    return params
