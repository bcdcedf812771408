"""Apertis decoder-only LM — functional forward passes.

TPU-native redesign of the reference model (reference: src/model/core.py):
  * parameters are stacked per-layer pytrees; depth is traversed with
    ``lax.scan`` (one compiled layer body regardless of depth),
  * the decode path uses preallocated static-shape caches — KV ring for
    standard MHA, (conv window, ssm state) for the selective mixer — so the
    whole autoregressive loop stays inside one compiled program,
  * everything is a pure function of (params, inputs, rng); dropout is driven
    by explicit PRNG keys and a ``training`` flag.

Architecture semantics match the reference exactly in eval mode (see
tests/test_parity.py): pre-norm residual attention (MHA with full-width
interleaved RoPE, or Mamba-style selective SSM), pre-norm residual FFN
(dense / SwiGLU / adaptive-expert MoE), final post-norm, tied LM head.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import functools
import os

import jax
import jax.numpy as jnp

from apertis_llm_tpu.config import ApertisConfig
from apertis_llm_tpu.ops import attention as attn_ops
from apertis_llm_tpu.ops import moe as moe_ops
from apertis_llm_tpu.ops import ssm as ssm_ops
from apertis_llm_tpu.ops.activations import get_activation, silu
from apertis_llm_tpu.ops.norms import layer_norm, rms_norm
from apertis_llm_tpu.ops.rope import apply_rope, rope_tables

Params = Dict[str, Any]


class LMOutput(NamedTuple):
    loss: Optional[jnp.ndarray]
    logits: jnp.ndarray
    lb_loss: jnp.ndarray
    rz_loss: jnp.ndarray
    attentions: Optional[jnp.ndarray] = None  # (num_layers, B, H, L, L) when requested
    hidden_states: Optional[jnp.ndarray] = None  # (num_layers + 1, B, L, D) when requested


class PrefillOutput(NamedTuple):
    logits: jnp.ndarray          # (B, L_text, V) logits over the text positions
    cache: Params
    length: jnp.ndarray          # scalar int32: tokens written to the cache


# ---------------------------------------------------------------------------
# small helpers
# ---------------------------------------------------------------------------

def _decode_unroll(num_layers: int) -> int:
    """Unroll factor for the decode-step layer scan (APERTIS_DECODE_UNROLL).

    Default 1: unrolling was hypothesised to amortise while-loop overhead
    for deep-skinny stacks (the MoE presets: 44 layers at hidden ~704),
    but measured on v5e it REGRESSES decode — the 1.5B MoE at b256 went
    12.03 ms/step with unroll=4 vs 8.28 ms/step rolled (the rolled scan
    pipelines each layer's stacked-weight prefetch against the previous
    body; the unrolled body defeats that overlap). The env knob remains
    for experiments; parity is bit-exact either way
    (test_decode_unroll_parity)."""
    env = os.environ.get("APERTIS_DECODE_UNROLL", "").strip()
    if env:
        return max(1, min(int(env), num_layers))
    return 1


def _apply_norm(p: Params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    if "scale" in p:
        return rms_norm(x, p["scale"], eps=eps)
    return layer_norm(x, p["w"], p["b"], eps=eps)


def _quant_mode() -> str:
    """APERTIS_QUANT_MATMUL: 'weightonly' (XLA dequant expression — exact
    math, bandwidth-bound win at small batch: 4.1x bf16 measured at M=64),
    'dyn' (int8 x int8 on the MXU via XLA's native int8 dot with per-row
    activation quantization — 2.4x bf16 matmul throughput measured at M=256,
    ~0.5% activation rounding error), 'pallas' (the hand-written dequant
    kernel; measured slower than XLA's own int8 pipelines at decode shapes,
    kept for comparison), or 'auto' (default: dyn once the token dimension
    saturates the MXU, else weightonly)."""
    import os

    return os.environ.get("APERTIS_QUANT_MATMUL", "auto")


def _linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "w_q4" in p:
        # int4-packed weights (models/quantize.quantize_weight_int4,
        # APERTIS_QUANT_BITS=4). The XLA path unpacks to int8 in-graph —
        # the dequant/unpack fuses into the consuming dot's operand load;
        # the decode hot paths consume the PACKED form directly in the
        # fused kernels (ffn_fused.py / moe_ffn.py) for the bandwidth win.
        from apertis_llm_tpu.models.quantize import unpack_int4

        rows = x.size // x.shape[-1]
        if _quant_mode() in ("auto", "dyn") and rows >= 128 and _on_tpu():
            from apertis_llm_tpu.ops.pallas.quant_matmul import (
                quant_matmul_dyn_xla)

            y = quant_matmul_dyn_xla(x, unpack_int4(p["w_q4"], p.get("w_sh")),
                                     p["w_s"])
        else:
            y = x @ (unpack_int4(p["w_q4"], p.get("w_sh")).astype(x.dtype)
                     * p["w_s"].astype(x.dtype))
        if "b" in p:
            y = y + p["b"]
        return y
    if "w_q" in p:
        # int8 weights with per-output-channel scales. Small row counts
        # (decode at modest batch) are weight-bandwidth-bound: XLA's dequant
        # fusion reads int8 and converts in VMEM better than our Pallas
        # tiling (measured 0.24 vs 1.11 ms on a decode-shaped chain at
        # M=64). MXU-saturating row counts switch to XLA's native int8 dot
        # with dynamic activation quantization (449 vs 190 bf16 TFLOP/s at
        # M=256).
        mode = _quant_mode()
        if not _on_tpu() and mode not in ("dyn", "fused"):
            mode = "weightonly"          # Pallas/auto-dyn are TPU-tuned
                                         # (fused interprets off-TPU)
        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        # auto: dyn from 128 rows up. Clean-chain rates at the serving
        # model's FFN shapes (T=58k, 2432<->9728, round 3): dyn 194
        # TFLOP/s, weight-only dequant 142, pure bf16 146 — dyn is never
        # worse, and at decode row counts it additionally halves the
        # weight read (72.5k vs 54k tok/s end-to-end at b256). In-context
        # prefill TTFT measured equal (1100 vs 1110 ms) for dyn vs
        # weight-only — the model's fusion mix runs both at ~159 TFLOP/s —
        # so the dispatch stays the simple row threshold.
        if mode == "fused":
            # In-kernel activation quantization (sub-channel scales):
            # x read once from HBM, int8 MXU dot. Experimental dispatch —
            # see ops/pallas/quant_matmul.quant_matmul_dyn_fused.
            from apertis_llm_tpu.ops.pallas.quant_matmul import (
                quant_matmul_dyn_fused)

            y = quant_matmul_dyn_fused(x, p["w_q"], p["w_s"])
        elif mode == "dyn" or (mode == "auto" and rows >= 128):
            from apertis_llm_tpu.ops.pallas.quant_matmul import (
                quant_matmul_dyn_xla)

            y = quant_matmul_dyn_xla(x, p["w_q"], p["w_s"])
        elif mode == "pallas":
            from apertis_llm_tpu.ops.pallas.quant_matmul import quant_matmul

            y = quant_matmul(x, p["w_q"], p["w_s"])
        else:
            y = x @ (p["w_q"].astype(x.dtype) * p["w_s"].astype(x.dtype))
    else:
        y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def _maybe_ln_quant(norm_p: Params, x: jnp.ndarray, eps: float,
                    consumers) -> Tuple[Optional[jnp.ndarray],
                                        Optional[Tuple]]:
    """Fused norm + per-row int8 quantize for the serving full-sequence path.

    When every consuming projection is int8-quantized and the token count
    saturates the MXU, the XLA lowering of norm -> absmax -> round/clip
    runs ~3 separate HBM passes over the (tokens, H) activation (profiled
    ~3.7 ms/layer at the 1.5B b256 TTFT shapes); the fused kernel
    (ops/pallas/ln_quant.py) does it in one read. Returns
    ``(normed, None)`` on the plain path or ``(None, (x_q, x_s))`` fused —
    consumers feed the pair to :func:`_linear_pre_q`."""
    from apertis_llm_tpu.parallel.context import current as _parallel_current

    rows = x.size // x.shape[-1]
    lnq = os.environ.get("APERTIS_LN_QUANT", "1")
    # 'force' engages off-TPU / at any row count (interpret-mode kernel) so
    # tests can pin the fused full-forward against the unfused path on CPU.
    if (((_on_tpu() and rows >= 512) or lnq == "force")
            and _quant_mode() in ("auto", "dyn")
            and all(c is not None and ("w_q" in c or "w_q4" in c)
                    for c in consumers)
            and _parallel_current().mesh is None
            and lnq != "0"):
        from apertis_llm_tpu.ops.pallas.ln_quant import ln_quantize

        if "scale" in norm_p:
            q, s = ln_quantize(x, norm_p["scale"], None, eps=eps, rms=True)
        else:
            q, s = ln_quantize(x, norm_p["w"], norm_p["b"], eps=eps,
                               rms=False)
        return None, (q, s)
    return _apply_norm(norm_p, x, eps), None


def _linear_pre_q(p: Params, x_q: jnp.ndarray, x_s: jnp.ndarray,
                  out_dtype) -> jnp.ndarray:
    """int8 matmul with PRE-quantized activations — the same math as
    ops/pallas/quant_matmul.quant_matmul_dyn_xla after its quantize_rows,
    so fused-LN callers produce identical outputs to the unfused path.
    int4-packed weights unpack in-graph (the int8 activations feed the
    same integer dot)."""
    if "w_q4" in p:
        from apertis_llm_tpu.models.quantize import unpack_int4

        w_q = unpack_int4(p["w_q4"], p.get("w_sh"))
    else:
        w_q = p["w_q"]
    acc = jax.lax.dot_general(
        x_q, w_q, (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = (acc.astype(jnp.float32) * x_s
         * p["w_s"].reshape(1, -1).astype(jnp.float32)).astype(out_dtype)
    if "b" in p:
        y = y + p["b"]
    return y


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _flash_eligible(config: ApertisConfig, seq_len: int, head_dim: int) -> bool:
    """Static gate for the fused attention kernel: user-enabled, running on
    TPU, lane-aligned head dim, and long enough that the kernel beats plain
    XLA attention (the kernel itself pads any length to its block size, so —
    like the reference's flash path, core.py:754-759 — there is no
    divisibility requirement)."""
    if not config.use_flash_attention:
        return False
    if seq_len < 128 or head_dim % 8 != 0 or head_dim > 256:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _dropout(rng: Optional[jax.Array], x: jnp.ndarray, rate: float, training: bool) -> jnp.ndarray:
    if not training or rate <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# attention sublayer (full-sequence)
# ---------------------------------------------------------------------------

def _sp_ctx():
    """Active sequence-parallel context (trace-time), or None."""
    from apertis_llm_tpu.parallel import context as par_ctx

    ctx = par_ctx.current()
    return ctx if ctx.active else None


def _ep_ctx(num_tokens: int):
    """Active expert-parallel context, if the token count shards evenly.

    Returns (ctx, token_axes) where token_axes is the full dim-0 sharding of
    the flat token array: batch, expert (extra data parallelism), and — when
    SP is also on — the sequence axis (the (B, L) flatten merges them in
    that order)."""
    from apertis_llm_tpu.parallel import context as par_ctx

    ctx = par_ctx.current()
    if not ctx.ep_active:
        return None
    token_axes = []
    if ctx.batch_axis:
        token_axes.append(ctx.batch_axis)
    token_axes.append(ctx.ep_axis)
    if ctx.active:
        token_axes.append(ctx.sp_axis)
    shards = 1
    for a in token_axes:
        shards *= ctx.mesh.shape.get(a, 1)
    if num_tokens % shards:
        return None
    return ctx, tuple(token_axes)


def _mha_full(
    lp: Params,
    config: ApertisConfig,
    x: jnp.ndarray,                  # (B, L, D) pre-normed
    bias: Optional[jnp.ndarray],     # additive mask or None (-> causal)
    pos_ids: jnp.ndarray,            # (B, L)
    cos_t: jnp.ndarray,
    sin_t: jnp.ndarray,
    *,
    training: bool,
    rng: Optional[jax.Array],
    want_cache: bool,
    want_probs: bool,
    cp_kv_valid: Optional[jnp.ndarray] = None,  # (B, L) key validity for CP
):
    b, l, d = x.shape
    heads, head_dim = config.num_attention_heads, config.head_dim
    q = _linear(lp["q"], x)
    k = _linear(lp["k"], x)
    v = _linear(lp["v"], x)
    if config.position_embedding_type == "rotary":
        # Reference quirk: RoPE over the full hidden width, pre head-split.
        q = apply_rope(q, pos_ids, cos_t, sin_t)
        k = apply_rope(k, pos_ids, cos_t, sin_t)

    def split_heads(t):
        return t.reshape(b, l, heads, head_dim).transpose(0, 2, 1, 3)

    qh, kh, vh = split_heads(q), split_heads(k), split_heads(v)
    probs = None
    sp = _sp_ctx()
    if want_probs:
        ctx, probs = attn_ops.mha_with_probs(qh, kh, vh, bias=bias, causal=True)
    elif (sp is not None and not want_cache
          and l % sp.mesh.shape[sp.sp_axis] == 0):
        # Context parallelism: ring attention over the sequence axis. The
        # padding mask (when any) rides the ring as per-key validity — exact
        # vs the additive-bias path (tests/test_ring_attention.py).
        from apertis_llm_tpu.parallel.ring_attention import ring_attention

        ctx = ring_attention(qh, kh, vh, sp.mesh, sp.sp_axis, causal=True,
                             kv_valid=cp_kv_valid, batch_axis=sp.batch_axis)
    elif bias is None and _flash_eligible(config, l, head_dim):
        # Fused Pallas kernel: same gating as the reference's flash path —
        # enabled, no padding mask, no attention-probs output
        # (reference: core.py:731-740).
        from apertis_llm_tpu.ops.pallas.flash_attention import flash_attention

        ctx = flash_attention(qh, kh, vh, True)
    else:
        ctx = attn_ops.mha(qh, kh, vh, bias=bias, causal=True)
    if training and config.attention_probs_dropout_prob > 0 and rng is not None:
        # Matching reference semantics exactly would require dropping
        # attention probabilities; dropping the context is the fused-kernel
        # equivalent used here (same expected value).
        ctx = _dropout(rng, ctx, config.attention_probs_dropout_prob, training)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, d)
    out = _linear(lp["o"], ctx)
    cache = None
    if want_cache:
        cache = {"k": kh, "v": vh}  # (B, H, L, Dh)
    return out, cache, probs


def _ssm_delta_bc(lp: Params, config: ApertisConfig, x_act: jnp.ndarray):
    """SSM parameterisation front-end: x_act (..., d_inner) ->
    (delta (..., H) float32, a_cont (H, N) float32, b, c (..., H, N))."""
    heads, d_state = config.num_attention_heads, config.ssm_d_state
    dt_rank = config.ssm_dt_rank
    raw = _linear(lp["x_param_proj"], x_act)
    dt_feats = raw[..., :dt_rank]
    b_raw = raw[..., dt_rank:dt_rank + heads * d_state]
    c_raw = raw[..., dt_rank + heads * d_state:]
    delta = jax.nn.softplus(_linear(lp["dt_proj"], dt_feats).astype(jnp.float32))
    a_cont = -jnp.exp(lp["A_log"].astype(jnp.float32))              # (H, N)
    shape = x_act.shape[:-1] + (heads, d_state)
    return delta, a_cont, b_raw.reshape(shape), c_raw.reshape(shape)


def _ssm_compute_params(lp: Params, config: ApertisConfig, x_act: jnp.ndarray):
    """Shared SSM parameterisation: x_act (..., d_inner) ->
    (a_bar, b_term, c_mod) each (..., H, N) with delta in float32."""
    delta, a_cont, b, c = _ssm_delta_bc(lp, config, x_act)
    a_bar = jnp.exp(delta[..., None] * a_cont)                       # (..., H, N)
    return a_bar, b, c


def _ssm_full(
    lp: Params,
    config: ApertisConfig,
    x: Optional[jnp.ndarray],  # (B, L, D) pre-normed (None with x_quant)
    *,
    want_cache: bool,
    seq_mask: Optional[jnp.ndarray] = None,   # (B, L) 1 = real token
    seq_lens: Optional[jnp.ndarray] = None,   # (B,) real lengths (for cache)
    x_quant: Optional[Tuple] = None,          # fused-LN (x_q, x_s) pair
    out_dtype=None,
):
    """Selective-SSM mixer over a full sequence.

    When ``seq_mask`` is given (prefill with right-padded/bucketed prompts),
    padded steps become identity transitions (a=1, b=0) so the carried state
    after the scan equals the state after the last REAL token, and the cached
    conv window is gathered at each row's true length. The unmasked variant
    reproduces the reference exactly (which ignores the attention mask,
    core.py:356-401).
    """
    if x_quant is not None:
        x_q, x_s = x_quant
        b, l, _ = x_q.shape
        x_proj = _linear_pre_q(lp["in_proj_x"], x_q, x_s, out_dtype)
        z = _linear_pre_q(lp["in_proj_z"], x_q, x_s, out_dtype)
    else:
        b, l, _ = x.shape
        x_proj = _linear(lp["in_proj_x"], x)              # (B, L, d_inner)
        z = _linear(lp["in_proj_z"], x)
    dtype = x.dtype if x is not None else jnp.dtype(out_dtype)
    d_inner = config.ssm_d_inner
    k = config.ssm_conv_kernel
    x_conv = ssm_ops.depthwise_causal_conv(x_proj, lp["conv"]["w"], lp["conv"]["b"])
    x_act = silu(x_conv)

    sp = _sp_ctx()
    if sp is not None and l % sp.mesh.shape[sp.sp_axis] == 0:
        # Sequence parallelism: shard L over the seq axis; cross-chunk
        # traffic is one all-gather of (B, H, N) chunk summaries.
        from apertis_llm_tpu.parallel.sequence import (
            ssm_scan_sequence_parallel)

        a_bar, b_term, c_mod = _ssm_compute_params(lp, config, x_act)
        a_bar = a_bar.transpose(0, 2, 1, 3)               # (B, H, L, N)
        b_term = b_term.transpose(0, 2, 1, 3).astype(a_bar.dtype)
        c_mod = c_mod.transpose(0, 2, 1, 3)
        if seq_mask is not None:
            m = seq_mask[:, None, :, None].astype(a_bar.dtype)
            a_bar = a_bar * m + (1.0 - m)   # identity transition on pads
            b_term = b_term * m
        h, h_last = ssm_scan_sequence_parallel(
            a_bar, b_term, sp.mesh, sp.sp_axis, batch_axis=sp.batch_axis)
        y = (c_mod.astype(h.dtype) * h).astype(dtype)    # (B, H, L, N)
        y = y.transpose(0, 2, 1, 3).reshape(b, l, d_inner)
        h_last_f32 = h_last.astype(jnp.float32)
    else:
        delta, a_cont, b_nat, c_nat = _ssm_delta_bc(lp, config, x_act)
        y, h_last_f32 = ssm_ops.ssm_mix(
            delta, a_cont, b_nat, c_nat, seq_mask=seq_mask,
            out_dtype=dtype)                              # (B, L, d_inner)
    y = y + lp["D"] * x_act
    out = _linear(lp["out_proj"], y * silu(z))

    cache = None
    if want_cache:
        # Conv window carries the last K-1 *pre-conv* projected inputs
        # (reference: core.py:372); SSM state is the final recurrence carry.
        pad = jnp.pad(x_proj, ((0, 0), (k - 1, 0), (0, 0)))  # (B, L+K-1, C)
        if k <= 1:
            conv_state = jnp.zeros((b, 0, d_inner), dtype)
        elif seq_lens is None:
            conv_state = pad[:, -(k - 1):, :]
        else:
            # Rows of padded x_proj at [len, len+K-2] are original positions
            # [len-K+1, len-1] — the window ending at the last real token.
            idx = seq_lens[:, None] + jnp.arange(k - 1)[None, :]   # (B, K-1)
            conv_state = jnp.take_along_axis(pad, idx[:, :, None], axis=1)
        cache = {"conv": conv_state, "ssm": h_last_f32}
    return out, cache


# ---------------------------------------------------------------------------
# FFN sublayer
# ---------------------------------------------------------------------------

def _ffn(
    lp: Params,
    config: ApertisConfig,
    x: jnp.ndarray,  # (B, L, D) pre-normed
    *,
    training: bool,
    rng: Optional[jax.Array],
    fat_stack: Optional[Params] = None,  # layer-stacked MoE fat tensors
    layer_idx=None,                      # int32 index into fat_stack
    x_quant: Optional[Tuple] = None,     # fused-LN (x_q, x_s) of the input
    out_dtype=None,
    dense_stack: Optional[Params] = None,  # layer-stacked dense w1/w2 (int8)
):
    eps = config.layer_norm_eps
    zero = jnp.zeros((), jnp.float32)
    # Fused-LN serving path: run the FFN on (tokens, H) 2D shapes. With the
    # (B, L) split present, XLA lays the GEMM1 epilogue chain out L-major
    # ({2,0,1}) and pays a full relayout copy of the int8 hidden before
    # GEMM2 (profiled 1.8 ms/layer at the 1.5B b256 prefill); 2D shapes
    # admit only {1,0} and the copy disappears.
    if x_quant is not None:
        lead = x_quant[0].shape[:-1]
        x_quant = (x_quant[0].reshape(-1, x_quant[0].shape[-1]),
                   x_quant[1].reshape(-1, 1))

        def unflatten(t):
            return t.reshape(*lead, t.shape[-1])
    if config.use_swiglu:
        if x_quant is not None:
            x_q, x_s = x_quant
            h = (silu(_linear_pre_q(lp["w_gate"], x_q, x_s, out_dtype))
                 * _linear_pre_q(lp["w_up"], x_q, x_s, out_dtype))
            out = unflatten(_linear(lp["w_down"], h))
        else:
            h = silu(_linear(lp["w_gate"], x)) * _linear(lp["w_up"], x)
            out = _linear(lp["w_down"], h)
        out = _dropout(rng, out, config.hidden_dropout_prob, training)
        return out, zero, zero
    if config.use_expert_system and config.num_experts > 0:
        b, l, d = x.shape
        flat = x.reshape(b * l, d)
        noise_rng = drop_rng = None
        if training and rng is not None:
            noise_rng, drop_rng = jax.random.split(rng)
        routing = moe_ops.route(
            flat,
            lp["router_ln"]["w"], lp["router_ln"]["b"],
            lp["router"]["w"], lp["router"]["b"],
            config.experts_per_token,
            layer_norm_eps=eps,
            training=training,
            noise_rng=noise_rng,
            w_noise=lp.get("w_noise"),
            noisy_routing_alpha=config.noisy_routing_alpha,
            load_balancing_loss_coef=config.load_balancing_loss_coef,
            router_z_loss_coef=config.router_z_loss_coef,
            use_load_balancing_loss=config.use_load_balancing_loss,
            use_router_z_loss=config.use_router_z_loss,
        )
        active = None
        if (training and config.use_expert_dropout
                and config.expert_dropout_prob > 0 and drop_rng is not None):
            active = moe_ops.expert_dropout_mask(
                drop_rng, config.num_experts, config.expert_dropout_prob)
        s = b * l
        ep = _ep_ctx(s)
        if ep is not None:
            # Explicit expert parallelism: all-to-all dispatch/combine over
            # the expert mesh axis (ops/moe_ep.py), replacing GSPMD-inferred
            # comms for the expert-sharded tree.
            from apertis_llm_tpu.ops.moe_ep import moe_expert_parallel

            ctx, token_axes = ep
            out = moe_expert_parallel(
                flat, routing, lp["experts"], config.hidden_act, eps,
                mesh=ctx.mesh, expert_axis=ctx.ep_axis,
                token_axes=token_axes,
                capacity_factor=config.ep_capacity_factor,
                active_mask=active)
        elif training and config.use_expert_capacity_limit:
            capacity = max(1, int((s / config.num_experts) * config.expert_capacity_factor))
            out = moe_ops.moe_dispatch(
                flat, routing, lp["experts"], config.hidden_act, eps,
                capacity=capacity, active_mask=active)
        elif s <= max(config.num_experts, config.moe_dense_threshold_tokens):
            # Small token counts (decode steps): every expert's weights come
            # off HBM regardless of routing, so the dense all-expert combine
            # is equally memory-bound while skipping the per-layer
            # argsort/scatter/gather of the ragged path entirely.
            if not training and (fat_stack is not None
                                 or "fat" in lp["experts"]):
                # Combine-folded two-fat-2D-GEMM form (models/moe_fuse.py),
                # attached by the inference engine at load time. Default on
                # TPU is the fused Pallas kernel (hidden tile never leaves
                # VMEM); APERTIS_MOE_FUSED=fat selects the plain-XLA fat
                # GEMMs (same weights, hidden activations round-trip HBM),
                # which is also the off-TPU default (the kernel would run
                # in interpret mode there — covered by direct tests).
                mode = os.environ.get("APERTIS_MOE_FUSED", "fatk")
                if (mode == "fat" or (mode == "fatk" and not _on_tpu())) \
                        and "fat" in lp["experts"]:
                    out = moe_ops.moe_dense_fat(
                        flat, routing, lp["experts"], config.hidden_act, eps,
                        active_mask=active)
                else:
                    out = moe_ops.moe_dense_fat_kernel(
                        flat, routing, lp["experts"], config.hidden_act, eps,
                        active_mask=active, fat_stack=fat_stack,
                        layer_idx=layer_idx)
            elif not training and "fused" in lp["experts"]:
                # Per-expert VMEM-resident Pallas kernel (kept selectable:
                # measured ~equal to the XLA dense path at 1.5B shapes).
                out = moe_ops.moe_dense_fused(
                    flat, routing, lp["experts"], config.hidden_act, eps,
                    active_mask=active)
            else:
                out = moe_ops.moe_dense(
                    flat, routing, lp["experts"], config.hidden_act, eps,
                    active_mask=active)
        elif (not training and fat_stack is not None
              and layer_idx is not None):
            # Prefill grouped path (ops/pallas/moe_grouped.py): tile-padded
            # expert-sorted dispatch through the fused grouped-FFN kernel —
            # replaces ragged_dot (a custom-call XLA can't fuse operands or
            # epilogues into; the scanned expert stacks were measured
            # materialising ~10 ms/layer of weight copies at 1.5B b256).
            # The caller hoists the fat stack + passes the layer index;
            # eligibility is checked at hoist time (grouped_eligible).
            out = moe_ops.moe_grouped_fat(
                flat, routing, lp["experts"], config.hidden_act, eps,
                fat_stack, layer_idx, active_mask=active)
        else:
            out = moe_ops.moe_ragged(
                flat, routing, lp["experts"], config.hidden_act, eps,
                active_mask=active)
        return out.reshape(b, l, d), routing.lb_loss, routing.rz_loss
    # dense FFN: Linear -> act -> Dropout -> Linear
    if dense_stack is not None and not training and x_quant is None:
        # Fused decode path: the whole FFN (int8 GEMM1 -> act -> requantize
        # -> int8 GEMM2) runs per intermediate tile in VMEM, each weight
        # matrix streaming from HBM exactly once (ops/pallas/ffn_fused.py;
        # hoisted + scalar-prefetch-indexed by decode_step, the
        # moe_ffn.py lesson about dynamic-slice copies of pallas operands).
        from apertis_llm_tpu.ops.pallas.ffn_fused import ffn_decode_fused
        from apertis_llm_tpu.ops.pallas.quant_matmul import quantize_rows

        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        w1, w2 = dense_stack["w1"], dense_stack["w2"]
        if "w" in w1:
            y = ffn_decode_fused(
                x2, None, w1["w"], None, w1["b"], w2["w"], None, w2["b"],
                layer_idx=layer_idx, out_dtype=x.dtype,
                hidden_act=config.hidden_act)
        else:
            xq, xs = quantize_rows(x2)
            int4 = "w_q4" in w1
            y = ffn_decode_fused(
                xq, xs, w1["w_q4" if int4 else "w_q"], w1["w_s"], w1["b"],
                w2["w_q4" if int4 else "w_q"], w2["w_s"], w2["b"],
                layer_idx=layer_idx, out_dtype=x.dtype,
                hidden_act=config.hidden_act, int4=int4,
                w1_sh=w1.get("w_sh"), w2_sh=w2.get("w_sh"))
        return y.reshape(*lead, y.shape[-1]), zero, zero
    act = get_activation(config.hidden_act)
    if x_quant is not None:
        x_q, x_s = x_quant
        h = act(_linear_pre_q(lp["w1"], x_q, x_s, out_dtype))
        h = _dropout(rng, h, config.hidden_dropout_prob, training)
        return unflatten(_linear(lp["w2"], h)), zero, zero
    h = act(_linear(lp["w1"], x))
    h = _dropout(rng, h, config.hidden_dropout_prob, training)
    return _linear(lp["w2"], h), zero, zero


# ---------------------------------------------------------------------------
# one decoder layer (full sequence)
# ---------------------------------------------------------------------------

def _layer_full(
    lp: Params,
    config: ApertisConfig,
    h: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    pos_ids: jnp.ndarray,
    cos_t: jnp.ndarray,
    sin_t: jnp.ndarray,
    *,
    training: bool,
    rng: Optional[jax.Array],
    want_cache: bool,
    want_probs: bool = False,
    seq_mask: Optional[jnp.ndarray] = None,
    seq_lens: Optional[jnp.ndarray] = None,
    cp_kv_valid: Optional[jnp.ndarray] = None,
    fat_stack: Optional[Params] = None,   # hoisted MoE fat stack (L, ...)
    layer_idx=None,                       # int32 index into the stack
):
    rngs = jax.random.split(rng, 4) if rng is not None else [None] * 4
    eps = config.layer_norm_eps

    if config.attention_type == "selective_ssm":
        # Serving-int8 full-sequence path: fuse the pre-norm with the
        # activation quantize both projections consume (_maybe_ln_quant).
        normed, x_quant = _maybe_ln_quant(
            lp["attn"]["pre_norm"], h, eps,
            (lp["attn"].get("in_proj_x"), lp["attn"].get("in_proj_z")))
        attn_out, cache = _ssm_full(lp["attn"], config, normed,
                                    want_cache=want_cache,
                                    seq_mask=seq_mask, seq_lens=seq_lens,
                                    x_quant=x_quant, out_dtype=h.dtype)
        probs = None
    else:
        normed = _apply_norm(lp["attn"]["pre_norm"], h, eps)
        attn_out, cache, probs = _mha_full(
            lp["attn"], config, normed, bias, pos_ids, cos_t, sin_t,
            training=training, rng=rngs[0], want_cache=want_cache,
            want_probs=want_probs, cp_kv_valid=cp_kv_valid)
    h = h + _dropout(rngs[1], attn_out, config.hidden_dropout_prob, training)

    fp = lp["ffn"]
    if config.use_swiglu:
        ffn_consumers = (fp.get("w_gate"), fp.get("w_up"))
    elif config.use_expert_system and config.num_experts > 0:
        ffn_consumers = (None,)   # the router reads the normed tensor
    else:
        ffn_consumers = (fp.get("w1"),)
    normed, ffn_quant = _maybe_ln_quant(fp["pre_norm"], h, eps, ffn_consumers)
    ffn_out, lb, rz = _ffn(fp, config, normed, training=training,
                           rng=rngs[2], x_quant=ffn_quant, out_dtype=h.dtype,
                           fat_stack=fat_stack, layer_idx=layer_idx)
    h = h + _dropout(rngs[3], ffn_out, config.hidden_dropout_prob, training)
    return h, cache, lb, rz, probs


# ---------------------------------------------------------------------------
# input assembly (embeddings + multimodal prefix)
# ---------------------------------------------------------------------------

def assemble_inputs(
    params: Params,
    config: ApertisConfig,
    input_ids: jnp.ndarray,                   # (B, L_text)
    attention_mask: Optional[jnp.ndarray],    # (B, L_text) 1/0
    position_ids: Optional[jnp.ndarray],      # (B, L_text)
    pixel_values: Optional[jnp.ndarray],      # (B, 3, S, S)
):
    """Token embeddings + optional image prefix; returns
    (embeds, pos_ids, attention_mask, num_img_tokens)."""
    from apertis_llm_tpu.models.vit import vit_encode

    b, l = input_ids.shape
    embeds = jnp.take(params["embed"]["tok"], input_ids, axis=0)
    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(l, dtype=jnp.int32)[None, :], (b, l))
    if attention_mask is None:
        attention_mask = jnp.ones((b, l), jnp.int32)

    num_img = 0
    if config.multimodal and pixel_values is not None:
        if pixel_values.dtype == jnp.uint8 or pixel_values.shape[-1] == 3:
            # Raw (B, H, W, 3) images: resize + normalise in-graph. Shipping
            # uint8 quarters the host->device transfer at prefill.
            from apertis_llm_tpu.models.vit import preprocess_images

            pixel_values = preprocess_images(pixel_values, config.image_size)
        img = vit_encode(params["vision"], config, pixel_values)
        if "vision_proj" in params:
            img = _linear(params["vision_proj"], img)
        img = img.astype(embeds.dtype)
        num_img = img.shape[1]
        embeds = jnp.concatenate([img, embeds], axis=1)
        img_pos = jnp.broadcast_to(
            jnp.arange(num_img, dtype=jnp.int32)[None, :], (b, num_img))
        position_ids = jnp.concatenate([img_pos, position_ids + num_img], axis=1)
        attention_mask = jnp.concatenate(
            [jnp.ones((b, num_img), attention_mask.dtype), attention_mask], axis=1)

    if config.position_embedding_type == "absolute" and "abs_pos" in params:
        embeds = embeds + jnp.take(params["abs_pos"]["emb"], position_ids, axis=0)
    return embeds, position_ids, attention_mask, num_img


def _rope_tables_if_needed(config: ApertisConfig):
    """RoPE tables for the MHA path; None for SSM/absolute models (the
    tables are (P, D/2) arrays — not worth materialising when unused)."""
    if (config.attention_type == "selective_ssm"
            or config.position_embedding_type != "rotary"):
        return None, None
    return rope_tables(config.hidden_size, config.max_position_embeddings,
                       config.rope_theta)


def _build_bias(attention_mask: jnp.ndarray, q_len: int, past_len: int,
                dtype=jnp.float32) -> jnp.ndarray:
    """Combined causal x padding additive bias (B, 1, q_len, kv_len)
    (reference: core.py:1088-1139)."""
    kv_len = past_len + q_len
    causal = attn_ops.causal_mask_bias(q_len, kv_len, dtype)[None, None]
    padding = jnp.where(attention_mask[:, None, None, :kv_len] > 0, 0.0, attn_ops.NEG_INF)
    return causal + padding.astype(dtype)


# ---------------------------------------------------------------------------
# full-sequence forward (training / eval / parity)
# ---------------------------------------------------------------------------

def forward(
    params: Params,
    config: ApertisConfig,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    position_ids: Optional[jnp.ndarray] = None,
    pixel_values: Optional[jnp.ndarray] = None,
    labels: Optional[jnp.ndarray] = None,
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,
    output_attentions: bool = False,
    output_hidden_states: bool = False,
) -> LMOutput:
    """Full-sequence forward; returns logits over the TEXT positions (the
    image prefix is sliced off, reference: core.py:1399-1408) and, when
    ``labels`` given, shifted-CE loss + MoE aux losses."""
    l_text = input_ids.shape[1]
    mask_was_none = attention_mask is None
    embeds, pos_ids, attention_mask, num_img = assemble_inputs(
        params, config, input_ids, attention_mask, position_ids, pixel_values)

    # No user mask -> pure causal attention; bias=None statically enables the
    # fused flash kernel (mirrors the reference's mask-is-None gating,
    # core.py:1088-1108). With a mask, build the combined causal+padding bias.
    # SSM mixers never read the bias (the reference's SSM also ignores the
    # attention mask, core.py:356-401) — skip the O(L^2) buffer entirely so
    # long-context (32K) SSM forward stays O(L) memory.
    bias = (None if (mask_was_none or config.attention_type == "selective_ssm")
            else _build_bias(attention_mask, embeds.shape[1], 0, jnp.float32))

    rngs = jax.random.split(rng, 2) if rng is not None else [None, None]
    h = _dropout(rngs[0], embeds, config.hidden_dropout_prob, training)

    sp = _sp_ctx()
    cp_kv_valid = None
    if sp is not None and h.shape[1] % sp.mesh.shape[sp.sp_axis] == 0:
        # Sequence parallelism: pin activations L-sharded for the whole layer
        # stack — GSPMD splits all pointwise/matmul work over `seq`; the scan
        # and attention route through explicit shard_maps (see _ssm_full /
        # _mha_full). The MHA ring needs per-key validity instead of the
        # (B,1,L,L) bias; SSM keeps the reference's mask-ignoring training
        # semantics (core.py:356-401).
        from jax.sharding import NamedSharding, PartitionSpec as P_

        h = jax.lax.with_sharding_constraint(
            h, NamedSharding(sp.mesh, P_(sp.batch_axis, sp.sp_axis, None)))
        if config.attention_type != "selective_ssm":
            cp_kv_valid = None if mask_was_none else attention_mask
            bias = None   # the ring applies causal+validity masking itself

    cos_t, sin_t = _rope_tables_if_needed(config)

    num_layers = config.num_hidden_layers

    def body(carry, xs):
        h, lb_acc, rz_acc = carry
        lp, idx = xs
        layer_rng = (jax.random.fold_in(rngs[1], idx)
                     if rngs[1] is not None else None)
        h_in = h
        h, _, lb, rz, probs = _layer_full(
            lp, config, h, bias, pos_ids, cos_t, sin_t,
            training=training, rng=layer_rng, want_cache=False,
            want_probs=output_attentions, cp_kv_valid=cp_kv_valid)
        ys = probs
        if output_hidden_states:
            ys = (probs, h_in)
        return (h, lb_acc + lb, rz_acc + rz), ys

    zero = jnp.zeros((), jnp.float32)
    if config.remat and training:
        body = jax.checkpoint(body)
    (h, lb_loss, rz_loss), scan_ys = jax.lax.scan(
        body, (h, zero, zero),
        (params["layers"], jnp.arange(num_layers)))
    if output_hidden_states:
        all_probs, layer_inputs = scan_ys
    else:
        all_probs, layer_inputs = scan_ys, None

    h = _apply_norm(params["final_norm"], h, config.layer_norm_eps)
    all_hidden = None
    if output_hidden_states:
        # Per-layer inputs plus the final post-norm output
        # (reference: core.py:1249, 1295).
        all_hidden = jnp.concatenate([layer_inputs, h[None]], axis=0)

    if num_img > 0:
        h_text = h[:, num_img:, :]
    else:
        h_text = h
    logits = _lm_head(params, h_text)

    loss = None
    if labels is not None:
        loss = cross_entropy_loss(logits, labels, ignore_index=-100)
        if config.use_expert_system:
            loss = loss + lb_loss + rz_loss
    del l_text
    return LMOutput(loss, logits, lb_loss, rz_loss,
                    all_probs if output_attentions else None,
                    all_hidden)


def _lm_head(params: Params, h: jnp.ndarray) -> jnp.ndarray:
    if "lm_head" in params:
        return _linear(params["lm_head"], h)
    return h @ params["embed"]["tok"].T


def cross_entropy_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_index: int = -100
) -> jnp.ndarray:
    """Shifted next-token CE with ignore_index masking
    (reference: core.py:1414-1451)."""
    shift_logits = logits[:, :-1, :].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != ignore_index
    safe_labels = jnp.where(valid, shift_labels, 0)
    log_probs = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / count


# ---------------------------------------------------------------------------
# decode: cache init / prefill / single step
# ---------------------------------------------------------------------------

def init_cache(config: ApertisConfig, batch_size: int, max_length: Optional[int] = None,
               dtype=None) -> Params:
    """Preallocate the static-shape decode cache (stacked over layers)."""
    if max_length is None:
        max_length = config.decode_max_length
    if dtype is None:
        dtype = jnp.dtype(config.dtype)
    nl = config.num_hidden_layers
    if config.attention_type == "selective_ssm":
        return {
            "conv": jnp.zeros(
                (nl, batch_size, max(config.ssm_conv_kernel - 1, 0), config.ssm_d_inner),
                dtype),
            "ssm": jnp.zeros(
                (nl, batch_size, config.num_attention_heads, config.ssm_d_state),
                jnp.float32),
        }
    heads, head_dim = config.num_attention_heads, config.head_dim
    if _paired_kv_layout(config, max_length):
        # Flat KV layout for the fused decode-attention kernel
        # (ops/pallas/mha_step.py): slots store the head-flat (H*Dh)
        # projection row directly, so the multi-GB cache carries ZERO lane
        # padding in HBM whenever H*Dh is 128-aligned (head_dim < 128
        # would otherwise store half padding under the (8, 128) tile) and
        # the kernel computes all heads' scores in one MXU dot.
        # Under APERTIS_QUANT_KV=1 the flat cache stores int8 values with
        # per-(head, slot) f32 scale stacks — half the step's dominant
        # HBM read again; the kernel dequantizes in VMEM.
        d_flat = heads * head_dim
        if _quant_kv():
            return {
                "k": jnp.zeros(
                    (nl, batch_size, max_length, d_flat), jnp.int8),
                "k_ps": jnp.zeros(
                    (nl, batch_size, heads, max_length), jnp.float32),
                "v": jnp.zeros(
                    (nl, batch_size, max_length, d_flat), jnp.int8),
                "v_ps": jnp.zeros(
                    (nl, batch_size, heads, max_length), jnp.float32),
            }
        return {
            "k": jnp.zeros((nl, batch_size, max_length, d_flat), dtype),
            "v": jnp.zeros((nl, batch_size, max_length, d_flat), dtype),
        }
    if _quant_kv():
        # int8 KV serving cache (APERTIS_QUANT_KV=1): values quantize
        # symmetrically per (layer, row, head, slot) with the scale over the
        # head_dim lane — HALVES the MHA decode step's dominant HBM term
        # (the full-cache attention read) and the cache's HBM footprint,
        # doubling servable batch x context. Scales dequantize exactly into
        # the score/context contractions (ops/attention). The in-flight
        # token's K/V stay bf16 through the self-term; only the persisted
        # slots are quantized.
        return {
            "k": jnp.zeros((nl, batch_size, heads, max_length, head_dim),
                           jnp.int8),
            "k_s": jnp.zeros((nl, batch_size, heads, max_length, 1),
                             jnp.float32),
            "v": jnp.zeros((nl, batch_size, heads, max_length, head_dim),
                           jnp.int8),
            "v_s": jnp.zeros((nl, batch_size, heads, max_length, 1),
                             jnp.float32),
        }
    return {
        "k": jnp.zeros((nl, batch_size, heads, max_length, head_dim), dtype),
        "v": jnp.zeros((nl, batch_size, heads, max_length, head_dim), dtype),
    }


def _paired_kv_layout(config: ApertisConfig, max_length: int) -> bool:
    """Whether the MHA decode cache uses the head-flat (nl, B, L, H*Dh)
    layout consumed by the fused Pallas step kernel."""
    from apertis_llm_tpu.ops.pallas.mha_step import (
        pair_cache_fits, pair_kv_enabled)

    return (pair_kv_enabled(config)
            and pair_cache_fits(config, max_length, quant=_quant_kv()))


def _cache_is_paired(config: ApertisConfig, cache: Params) -> bool:
    """Detect the flat layout from the allocated cache itself (the env
    gate must not flip between init_cache and prefill/decode within one
    served program): the flat cache is 4-D (nl, B, L, H*Dh) where the
    head-major layouts are 5-D."""
    if config.attention_type == "selective_ssm" or "k_s" in cache:
        return False
    k = cache["k"]
    if k.ndim != 4:
        return False
    return _paired_kv_layout(config, k.shape[2])


def _quant_kv() -> bool:
    return os.environ.get("APERTIS_QUANT_KV", "0") == "1"


def _quantize_kv(t: jnp.ndarray):
    """Symmetric per-slot int8: scale over the trailing head_dim axis."""
    absmax = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(t.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, scale


def prefill(
    params: Params,
    config: ApertisConfig,
    cache: Params,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    position_ids: Optional[jnp.ndarray] = None,
    pixel_values: Optional[jnp.ndarray] = None,
    logit_positions: Optional[jnp.ndarray] = None,
) -> PrefillOutput:
    """Run the prompt through the model, filling the decode cache.

    ``logit_positions`` (B,) — text positions whose logits are needed (the
    serving engine only consumes each row's last real token). When given,
    the lm_head runs on those single positions instead of the whole
    sequence (saves ~2*V*D FLOPs per skipped position and the (B, L, V)
    logits materialisation) and ``logits`` has shape (B, 1, V)."""
    embeds, pos_ids, attention_mask, num_img = assemble_inputs(
        params, config, input_ids, attention_mask, position_ids, pixel_values)
    l_total = embeds.shape[1]
    # SSM prefill handles padding via identity transitions (seq_mask below);
    # the O(L^2) additive bias is MHA-only — skipping it keeps 32K-token
    # SSM prefill at O(L) memory.
    bias = (None if config.attention_type == "selective_ssm"
            else _build_bias(attention_mask, l_total, 0, jnp.float32))
    cos_t, sin_t = _rope_tables_if_needed(config)
    seq_mask = attention_mask
    seq_lens = jnp.sum(attention_mask.astype(jnp.int32), axis=1)

    # Hoist the MoE fat stack OUT of the scanned tree for the grouped
    # prefill kernel (scan xs would dynamic-slice a full weight copy per
    # layer — ragged_dot's measured pathology); the kernel scalar-
    # prefetches the layer index into the resident (L, ...) stack.
    layers = params["layers"]
    fat_pre = None
    if config.use_expert_system and config.num_experts > 0:
        from apertis_llm_tpu.ops.pallas.moe_grouped import grouped_eligible

        experts = layers.get("ffn", {}).get("experts", {})
        fat = experts.get("fat") if isinstance(experts, dict) else None
        if fat is not None and grouped_eligible(fat, config.num_experts):
            # Pre-shape the scale/bias stacks to the kernel's (L, 1, ·)
            # operand forms HERE, outside the layer scan: reshapes inside
            # the scan body feed a custom-call, and XLA materialises the
            # (L, 1, E*I) f32 copies per iteration instead of hoisting.
            nl = config.num_hidden_layers
            fat_pre = dict(fat)
            fat_pre["b1t"] = fat["b1t"].reshape(nl, 1, -1)
            fat_pre["w1t_s"] = fat["w1t_s"].reshape(nl, 1, -1)
            fat_pre["w2t_s"] = fat["w2t_s"].reshape(nl, 1, -1)
            layers = dict(layers)
            layers["ffn"] = dict(layers["ffn"])
            layers["ffn"]["experts"] = {
                k: v for k, v in experts.items() if k != "fat"}

    def body(h, xs):
        lp, idx = xs
        h, layer_cache, _, _, _ = _layer_full(
            lp, config, h, bias, pos_ids, cos_t, sin_t,
            training=False, rng=None, want_cache=True,
            seq_mask=seq_mask, seq_lens=seq_lens,
            fat_stack=fat_pre, layer_idx=idx)
        return h, layer_cache

    h, stacked_cache = jax.lax.scan(
        body, embeds, (layers, jnp.arange(config.num_hidden_layers)))
    h = _apply_norm(params["final_norm"], h, config.layer_norm_eps)
    h_text = h[:, num_img:, :] if num_img > 0 else h
    if logit_positions is not None:
        h_text = jnp.take_along_axis(
            h_text, logit_positions.astype(jnp.int32)[:, None, None], axis=1)
    logits = _lm_head(params, h_text)

    if config.attention_type == "selective_ssm":
        new_cache = {"conv": stacked_cache["conv"], "ssm": stacked_cache["ssm"]}
    elif "k_s" in cache:
        # int8 KV cache: quantize the prompt's K/V per slot on the way in.
        kq, ks = _quantize_kv(stacked_cache["k"])
        vq, vs = _quantize_kv(stacked_cache["v"])
        new_cache = {
            "k": jax.lax.dynamic_update_slice(cache["k"], kq, (0, 0, 0, 0, 0)),
            "k_s": jax.lax.dynamic_update_slice(
                cache["k_s"], ks, (0, 0, 0, 0, 0)),
            "v": jax.lax.dynamic_update_slice(cache["v"], vq, (0, 0, 0, 0, 0)),
            "v_s": jax.lax.dynamic_update_slice(
                cache["v_s"], vs, (0, 0, 0, 0, 0)),
        }
    else:
        kc, vc = stacked_cache["k"], stacked_cache["v"]
        if _cache_is_paired(config, cache):
            from apertis_llm_tpu.ops.pallas.mha_step import (
                pack_cache, quantize_heads)

            kc, vc = pack_cache(kc), pack_cache(vc)   # (nl, B, L, H*Dh)
            if "k_ps" in cache:
                # int8 flat cache: quantize the prompt's K/V per
                # (head, slot) on the way in; scales store head-major
                # (nl, B, H, L) so the kernel's scale blocks stay compact.
                kc, ks = quantize_heads(kc, config.head_dim)
                vc, vs = quantize_heads(vc, config.head_dim)
                ks, vs = jnp.moveaxis(ks, 3, 2), jnp.moveaxis(vs, 3, 2)
                new_cache = {
                    "k": jax.lax.dynamic_update_slice(
                        cache["k"], kc, (0, 0, 0, 0)),
                    "k_ps": jax.lax.dynamic_update_slice(
                        cache["k_ps"], ks, (0, 0, 0, 0)),
                    "v": jax.lax.dynamic_update_slice(
                        cache["v"], vc, (0, 0, 0, 0)),
                    "v_ps": jax.lax.dynamic_update_slice(
                        cache["v_ps"], vs, (0, 0, 0, 0)),
                }
            else:
                new_cache = {
                    "k": jax.lax.dynamic_update_slice(
                        cache["k"], kc.astype(cache["k"].dtype),
                        (0, 0, 0, 0)),
                    "v": jax.lax.dynamic_update_slice(
                        cache["v"], vc.astype(cache["v"].dtype),
                        (0, 0, 0, 0)),
                }
            return PrefillOutput(logits, new_cache,
                                 jnp.asarray(l_total, jnp.int32))
        # stacked (nl, B, H, L, Dh) -> write into preallocated ring at [0:L]
        new_cache = {
            "k": jax.lax.dynamic_update_slice(
                cache["k"], kc.astype(cache["k"].dtype), (0, 0, 0, 0, 0)),
            "v": jax.lax.dynamic_update_slice(
                cache["v"], vc.astype(cache["v"].dtype), (0, 0, 0, 0, 0)),
        }
    return PrefillOutput(logits, new_cache, jnp.asarray(l_total, jnp.int32))


def decode_step(
    params: Params,
    config: ApertisConfig,
    cache: Params,
    token_ids: jnp.ndarray,     # (B,) current tokens
    t: jnp.ndarray,             # scalar int32: cache slot to write
    attn_mask_row: Optional[jnp.ndarray] = None,  # (B, Lmax) validity incl. new token
    positions: Optional[jnp.ndarray] = None,      # (B,) logical positions for RoPE
) -> Tuple[jnp.ndarray, Params]:
    """One autoregressive step: returns (logits (B, V), updated cache).

    ``t`` indexes the physical cache slot; ``positions`` (defaulting to ``t``)
    are the logical sequence positions used for rotary/absolute embeddings —
    they differ when prompts were right-padded to a bucket length.
    """
    b = token_ids.shape[0]
    h = jnp.take(params["embed"]["tok"], token_ids, axis=0)[:, None, :]  # (B,1,D)
    if positions is None:
        pos = jnp.full((b, 1), t, jnp.int32)
    else:
        pos = positions.astype(jnp.int32)[:, None]
    if config.position_embedding_type == "absolute" and "abs_pos" in params:
        h = h + jnp.take(params["abs_pos"]["emb"], pos, axis=0)

    eps = config.layer_norm_eps
    is_ssm = config.attention_type == "selective_ssm"
    if is_ssm or config.position_embedding_type != "rotary":
        # SSM decode never touches RoPE; don't build the (P, D/2) tables
        # inside the decode loop body.
        cos_t = sin_t = None
    else:
        cos_t, sin_t = rope_tables(
            config.hidden_size, config.max_position_embeddings, config.rope_theta)

    if not is_ssm:
        # Flat (nl, B, L, H*Dh) fused-kernel layout vs head-major
        # (nl, B, H, L, Dh): the slot axis moves.
        max_len = cache["k"].shape[2 if cache["k"].ndim == 4 else 3]
        if attn_mask_row is None:
            valid = jnp.arange(max_len)[None, :] <= t
            valid = jnp.broadcast_to(valid, (b, max_len))
        else:
            valid = attn_mask_row > 0

    # Hoist the layer-stacked MoE fat tensors OUT of the scanned tree when
    # the fused fat kernel will consume them: scan would dynamic-slice them
    # per layer, and XLA materialises a full copy of both expert matrices
    # for every pallas operand (~47 us/layer profiled at 1.5B shapes). The
    # kernel instead scalar-prefetches the layer index into the full stack.
    layers = params["layers"]
    fat_stack = None
    experts = layers.get("ffn", {}).get("experts", {}) if isinstance(
        layers.get("ffn"), dict) else {}
    if ("fat" in experts
            and (_on_tpu()
                 # interpret-mode testing of the fused-ssm MoE chain on CPU
                 or os.environ.get("APERTIS_SSM_STEP") == "force")
            and os.environ.get("APERTIS_MOE_FUSED", "fatk") == "fatk"):
        fat_stack = experts["fat"]
        layers = dict(layers)
        layers["ffn"] = dict(layers["ffn"])
        layers["ffn"]["experts"] = {
            k: v for k, v in experts.items() if k != "fat"}
    # Fused SSM mixer step (ops/pallas/ssm_step.py): the attached weight
    # pack (models/ssm_fuse.py, engine-built) is ALWAYS popped from the
    # scanned tree — its leaves would otherwise be sliced per layer — and
    # consumed via a scalar-prefetched layer index when the dispatch gate
    # opens.
    ssm_stack = None
    ssm_rms = False
    attn_p = layers.get("attn", {}) if isinstance(
        layers.get("attn"), dict) else {}
    if "fused" in attn_p:
        from apertis_llm_tpu.ops.pallas.ssm_step import ssm_step_fused_enabled
        from apertis_llm_tpu.parallel.context import current as _par_cur

        layers = dict(layers)
        layers["attn"] = {k: v for k, v in attn_p.items() if k != "fused"}
        if is_ssm and _par_cur().mesh is None and ssm_step_fused_enabled(b):
            ssm_stack = attn_p["fused"]
            ssm_rms = "scale" in attn_p.get("pre_norm", {})
    # FFN epilogue folding (pre-norm + quantize [+ router] inside the SSM
    # kernel): "dense" feeds the fused dense-FFN kernel directly; "moe"
    # feeds the fat MoE kernel with in-kernel top-2 combine weights.
    ffn_mode = "none"
    if ssm_stack is not None and "fnorm_w" in ssm_stack:
        if (config.use_expert_system and config.num_experts > 0
                and fat_stack is not None and "router_w" in ssm_stack
                and config.experts_per_token == 2
                and b <= config.moe_dense_threshold_tokens):
            ffn_mode = "moe"
    # Same hoist for the DENSE int8 FFN: the fused decode kernel
    # (ops/pallas/ffn_fused.py) consumes the layer-stacked w1/w2 via a
    # scalar-prefetched layer index instead of scan-sliced copies.
    dense_stack = None
    if (not config.use_swiglu
            and not (config.use_expert_system and config.num_experts > 0)):
        from apertis_llm_tpu.ops.pallas.ffn_fused import fused_eligible
        from apertis_llm_tpu.parallel.context import current as _par_current

        ffn_p = layers.get("ffn", {}) if isinstance(
            layers.get("ffn"), dict) else {}
        # The attach-time int4 decode pack (models/quantize.attach_int4_ffn,
        # APERTIS_QUANT_BITS=4) is ALWAYS removed from the scanned tree —
        # scan xs would slice it per layer — and preferred over the int8
        # stacks when the fused kernel dispatch accepts it.
        w4 = ffn_p.get("w4")
        if w4 is not None:
            layers = dict(layers)
            layers["ffn"] = {k: v for k, v in layers["ffn"].items()
                             if k != "w4"}
            ffn_p = layers["ffn"]
        if _par_current().mesh is None:
            if w4 is not None and fused_eligible(w4["w1"], w4["w2"], b):
                dense_stack = w4
            elif fused_eligible(ffn_p.get("w1"), ffn_p.get("w2"), b):
                dense_stack = {"w1": ffn_p["w1"], "w2": ffn_p["w2"]}
        if dense_stack is not None:
            if "w1" in dense_stack and dense_stack is not w4:
                layers = dict(layers)
                layers["ffn"] = {k: v for k, v in layers["ffn"].items()
                                 if k not in ("w1", "w2")}
            if (ssm_stack is not None and "fnorm_w" in ssm_stack
                    # pack kinds must agree: a bf16 mixer pack emits a bf16
                    # FFN input, an int8 pack emits (x_q, x_s) — mixing
                    # layouts would hand the FFN kernel the wrong operands.
                    and (("inx_w" in ssm_stack)
                         == ("w" in dense_stack["w1"]))):
                ffn_mode = "dense"

    if not is_ssm:
        # MHA: the decode step's ONLY O(cache) HBM traffic should be
        # attention's unavoidable read of the filled K/V slots. The original
        # structure (stacked cache as scan xs, updated per-layer caches
        # re-stacked as scan ys) rewrote the ENTIRE cache allocation every
        # decode step — at the 1.5B b64 serving shapes ~7 GB of write per
        # token on top of the ~7 GB read, measured as the round-4 849 tok/s
        # (75.4 ms/step) pathology. Here the cache is decoupled from the
        # scan: each layer READS its old-cache slice (scan xs), attends to
        # the brand-new token via an explicit self-term (the old cache's
        # slot ``t`` is stale and masked out), and emits its new K/V slot
        # as a tiny (B, H, 1, Dh) scan ys; ONE dynamic_update_slice after
        # the scan writes every layer's slot column in place.
        valid_cache = valid & (jnp.arange(max_len)[None, :] != t)
        quant_kv = "k_s" in cache

        if _cache_is_paired(config, cache):
            # Fused decode-attention path (ops/pallas/mha_step.py): the
            # pair-packed cache is hoisted OUT of the scanned tree (the
            # fat_stack lesson — scan xs would dynamic-slice a full copy
            # per layer); the kernel scalar-prefetches the layer index
            # into the full stack and fuses score/mask/softmax/context
            # plus the fresh token's self-term in one VMEM pass.
            from apertis_llm_tpu.ops.pallas.mha_step import NEG as _MHA_NEG

            bias_t = jnp.where(valid_cache, 0.0,
                               _MHA_NEG).astype(jnp.float32)  # (B, Lmax)
            k_full, v_full = cache["k"], cache["v"]
            kv_q = "k_ps" in cache
            ks_full = cache["k_ps"] if kv_q else None
            vs_full = cache["v_ps"] if kv_q else None
            # int8 serving tree: fused LN+quantize feeds int8 x int8
            # projection dots (see _mha_decode_step_paired's rationale).
            attn_tree = layers.get("attn", {})
            mha_q8 = all("w_q" in attn_tree.get(k2, {})
                         for k2 in ("q", "k", "v", "o"))

            def body_mha_paired(hc, xs):
                lp, li = xs
                if mha_q8:
                    if os.environ.get("APERTIS_MHA_LNQ", "xla") == "xla":
                        # Decode-row LN+quantize in plain XLA: at 64-256
                        # rows the fused ln_quant Pallas call is overhead-
                        # bound (xplane: 64 us/call on a 311 KB block,
                        # 1.29 ms of the b64 step across 20 layers), and
                        # XLA fuses the chain into neighbours instead.
                        from apertis_llm_tpu.ops.pallas.quant_matmul import (
                            quantize_rows)

                        normed = _apply_norm(lp["attn"]["pre_norm"], hc, eps)
                        xq8, xs8 = quantize_rows(normed[:, 0, :])
                    else:
                        from apertis_llm_tpu.ops.pallas.ln_quant import (
                            ln_quantize)

                        pre = lp["attn"]["pre_norm"]
                        if "scale" in pre:
                            xq8, xs8 = ln_quantize(hc[:, 0, :], pre["scale"],
                                                   None, eps=eps, rms=True)
                        else:
                            xq8, xs8 = ln_quantize(hc[:, 0, :], pre["w"],
                                                   pre["b"], eps=eps,
                                                   rms=False)
                    attn_out, kp, vp = _mha_decode_step_paired(
                        lp["attn"], config, None, k_full, v_full, pos,
                        bias_t, cos_t, sin_t, li, x_quant=(xq8, xs8),
                        ks_stack=ks_full, vs_stack=vs_full)
                else:
                    normed = _apply_norm(lp["attn"]["pre_norm"], hc, eps)
                    attn_out, kp, vp = _mha_decode_step_paired(
                        lp["attn"], config, normed, k_full, v_full, pos,
                        bias_t, cos_t, sin_t, li,
                        ks_stack=ks_full, vs_stack=vs_full)
                hc = hc + attn_out
                normed = _apply_norm(lp["ffn"]["pre_norm"], hc, eps)
                ffn_out, _, _ = _ffn(
                    lp["ffn"], config, normed, training=False, rng=None,
                    fat_stack=fat_stack, layer_idx=li,
                    dense_stack=dense_stack)
                return hc + ffn_out, (kp, vp)

            arange_l = jnp.arange(config.num_hidden_layers, dtype=jnp.int32)
            h, (kp_stack, vp_stack) = jax.lax.scan(
                body_mha_paired, h, (layers, arange_l),
                unroll=_decode_unroll(config.num_hidden_layers))
            if kv_q:
                from apertis_llm_tpu.ops.pallas.mha_step import quantize_heads

                kq_st, ks_st = quantize_heads(kp_stack,
                                              config.head_dim)  # (nl, B, ·)
                vq_st, vs_st = quantize_heads(vp_stack, config.head_dim)
                new_cache = {
                    "k": jax.lax.dynamic_update_slice(
                        cache["k"], kq_st[:, :, None, :], (0, 0, t, 0)),
                    "k_ps": jax.lax.dynamic_update_slice(
                        cache["k_ps"], ks_st[:, :, :, None], (0, 0, 0, t)),
                    "v": jax.lax.dynamic_update_slice(
                        cache["v"], vq_st[:, :, None, :], (0, 0, t, 0)),
                    "v_ps": jax.lax.dynamic_update_slice(
                        cache["v_ps"], vs_st[:, :, :, None], (0, 0, 0, t)),
                }
            else:
                new_cache = {
                    "k": jax.lax.dynamic_update_slice(
                        cache["k"], kp_stack[:, :, None, :].astype(
                            cache["k"].dtype), (0, 0, t, 0)),
                    "v": jax.lax.dynamic_update_slice(
                        cache["v"], vp_stack[:, :, None, :].astype(
                            cache["v"].dtype), (0, 0, t, 0)),
                }
            h = _apply_norm(params["final_norm"], h, eps)
            logits = _lm_head(params, h)[:, 0, :]
            return logits, new_cache

        def body_mha(hc, xs):
            if quant_kv:
                lp, k_l, ks_l, v_l, vs_l, li = xs
            else:
                lp, k_l, v_l, li = xs
                ks_l = vs_l = None
            normed = _apply_norm(lp["attn"]["pre_norm"], hc, eps)
            attn_out, kh, vh = _mha_decode_step(
                lp["attn"], config, normed, k_l, v_l, pos, valid_cache,
                cos_t, sin_t, k_scale=ks_l, v_scale=vs_l)
            hc = hc + attn_out
            normed = _apply_norm(lp["ffn"]["pre_norm"], hc, eps)
            ffn_out, _, _ = _ffn(lp["ffn"], config, normed, training=False,
                                 rng=None, fat_stack=fat_stack, layer_idx=li,
                                 dense_stack=dense_stack)
            return hc + ffn_out, (kh, vh)

        arange_l = jnp.arange(config.num_hidden_layers, dtype=jnp.int32)
        xs_scan = ((layers, cache["k"], cache["k_s"], cache["v"],
                    cache["v_s"], arange_l) if quant_kv
                   else (layers, cache["k"], cache["v"], arange_l))
        h, (kh_stack, vh_stack) = jax.lax.scan(
            body_mha, h, xs_scan,
            unroll=_decode_unroll(config.num_hidden_layers))
        if quant_kv:
            kq, ks = _quantize_kv(kh_stack)
            vq, vs = _quantize_kv(vh_stack)
            new_cache = {
                "k": jax.lax.dynamic_update_slice(
                    cache["k"], kq, (0, 0, 0, t, 0)),
                "k_s": jax.lax.dynamic_update_slice(
                    cache["k_s"], ks, (0, 0, 0, t, 0)),
                "v": jax.lax.dynamic_update_slice(
                    cache["v"], vq, (0, 0, 0, t, 0)),
                "v_s": jax.lax.dynamic_update_slice(
                    cache["v_s"], vs, (0, 0, 0, t, 0)),
            }
        else:
            new_cache = {
                "k": jax.lax.dynamic_update_slice(
                    cache["k"], kh_stack.astype(cache["k"].dtype),
                    (0, 0, 0, t, 0)),
                "v": jax.lax.dynamic_update_slice(
                    cache["v"], vh_stack.astype(cache["v"].dtype),
                    (0, 0, 0, t, 0)),
            }
        h = _apply_norm(params["final_norm"], h, eps)
        logits = _lm_head(params, h)[:, 0, :]
        return logits, new_cache

    def body(h, xs):
        lp, layer_cache, li = xs
        if ssm_stack is not None:
            # Entire mixer (pre-norm .. out_proj + residual) in one kernel;
            # with ffn_mode set it also emits the FFN's quantized input
            # (+ MoE combine weights) so the FFN kernel chains directly.
            from apertis_llm_tpu.ops.pallas.ssm_step import (
                ssm_decode_step_fused)

            ssm2 = layer_cache["ssm"].reshape(b, -1)
            outs = ssm_decode_step_fused(
                h[:, 0, :], layer_cache["conv"], ssm2, ssm_stack, li, eps,
                ssm_rms, ffn_mode=ffn_mode)
            h2, xp_new, ssm_new = outs[:3]
            new_layer_cache = {
                "conv": jnp.concatenate(
                    [layer_cache["conv"][:, 1:, :], xp_new[:, None, :]],
                    axis=1),
                "ssm": ssm_new.reshape(layer_cache["ssm"].shape),
            }
            if ffn_mode == "dense":
                from apertis_llm_tpu.ops.pallas.ffn_fused import (
                    ffn_decode_fused)

                w1, w2 = dense_stack["w1"], dense_stack["w2"]
                if "w" in w1:
                    # bf16 serving: the mixer kernel emitted the normed
                    # bf16 FFN input directly (no activation quantization).
                    y = ffn_decode_fused(
                        outs[3], None, w1["w"], None, w1["b"],
                        w2["w"], None, w2["b"],
                        layer_idx=li, out_dtype=h2.dtype,
                        hidden_act=config.hidden_act)
                else:
                    xq2, xs2 = outs[3], outs[4]
                    i4 = "w_q4" in w1
                    y = ffn_decode_fused(
                        xq2, xs2, w1["w_q4" if i4 else "w_q"], w1["w_s"],
                        w1["b"], w2["w_q4" if i4 else "w_q"], w2["w_s"],
                        w2["b"], layer_idx=li, out_dtype=h2.dtype,
                        hidden_act=config.hidden_act, int4=i4,
                        w1_sh=w1.get("w_sh"), w2_sh=w2.get("w_sh"))
                return (h2 + y)[:, None, :], new_layer_cache
            if ffn_mode == "moe":
                from apertis_llm_tpu.ops.pallas.moe_ffn import expert_ffn_fat

                xq2, xs2, comb = outs[3], outs[4], outs[5]
                i4 = "w1t_q4" in fat_stack
                y = expert_ffn_fat(
                    xq2, xs2, comb,
                    fat_stack["w1t_q4" if i4 else "w1t_q"],
                    fat_stack["w1t_s"], fat_stack["b1t"],
                    fat_stack["w2t_q4" if i4 else "w2t_q"],
                    fat_stack["w2t_s"],
                    config.num_experts, layer_idx=li,
                    out_dtype=jnp.float32, hidden_act=config.hidden_act,
                    int4=i4, w1t_sh=fat_stack.get("w1t_sh"),
                    w2t_sh=fat_stack.get("w2t_sh"))
                y = y + comb @ lp["ffn"]["experts"]["b2"].astype(jnp.float32)
                return (h2 + y.astype(h2.dtype))[:, None, :], new_layer_cache
            h = h2[:, None, :]
        else:
            normed = _apply_norm(lp["attn"]["pre_norm"], h, eps)
            attn_out, new_layer_cache = _ssm_decode_step(
                lp["attn"], config, normed[:, 0, :], layer_cache)
            h = h + attn_out[:, None, :]
        normed = _apply_norm(lp["ffn"]["pre_norm"], h, eps)
        ffn_out, _, _ = _ffn(lp["ffn"], config, normed, training=False,
                             rng=None, fat_stack=fat_stack, layer_idx=li,
                             dense_stack=dense_stack)
        h = h + ffn_out
        return h, new_layer_cache

    h, new_cache = jax.lax.scan(
        body, h, (layers, cache,
                  jnp.arange(config.num_hidden_layers, dtype=jnp.int32)),
        unroll=_decode_unroll(config.num_hidden_layers))
    h = _apply_norm(params["final_norm"], h, eps)
    logits = _lm_head(params, h)[:, 0, :]
    return logits, new_cache


def _mha_decode_step(lp, config, x, k_l, v_l, pos, valid_cache, cos_t, sin_t,
                     k_scale=None, v_scale=None):
    """Single-token MHA step reading the layer's OLD cache slice.

    The new token's K/V never touch the cache here: attention runs over
    the stale-slot-masked old slice plus an explicit self-term
    (:func:`ops.attention.decode_attention_selfterm`), and the fresh
    (B, H, 1, Dh) slot is returned for the caller's single post-scan
    slot-column write. ``k_scale``/``v_scale`` dequantize an int8 cache
    (APERTIS_QUANT_KV) inside the attention contractions."""
    b = x.shape[0]
    heads, head_dim = config.num_attention_heads, config.head_dim
    q = _linear(lp["q"], x)
    k = _linear(lp["k"], x)
    v = _linear(lp["v"], x)
    if config.position_embedding_type == "rotary":
        q = apply_rope(q, pos, cos_t, sin_t)
        k = apply_rope(k, pos, cos_t, sin_t)

    def split_heads(z):
        return z.reshape(b, 1, heads, head_dim).transpose(0, 2, 1, 3)

    qh, kh, vh = split_heads(q), split_heads(k), split_heads(v)
    out_dtype = jnp.dtype(config.dtype)
    ctx = attn_ops.decode_attention_selfterm(
        qh, k_l, v_l, kh.astype(out_dtype), vh.astype(out_dtype),
        valid_cache, k_scale=k_scale, v_scale=v_scale)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, 1, heads * head_dim)
    return _linear(lp["o"], ctx), kh, vh


def _mha_decode_step_paired(lp, config, x, k_stack, v_stack, pos, bias_t,
                            cos_t, sin_t, layer_idx, x_quant=None,
                            ks_stack=None, vs_stack=None):
    """Single-token MHA step over the head-flat cache via the fused
    Pallas decode-attention kernel (ops/pallas/mha_step.py).

    Projections + RoPE stay XLA (they are weight-bound); the attention
    score/mask/softmax/context chain — the step's dominant HBM term, the
    full-cache read — runs in one Pallas pass over the padding-free flat
    layout. With ``x_quant`` (the fused-LN int8 activations from
    the quantized serving tree) the four projections run as int8 x int8
    MXU dots — at decode row counts XLA's weight-only lowering was
    measured MATERIALISING dequantized bf16 copies of the K/V projection
    matrices every layer step (1.6 ms of the round-4 10.2 ms b64 step),
    which the pre-quantized dot avoids entirely. Returns
    (attn_out, k_flat, v_flat) with the fresh slot's head-flat (B, D)
    K/V for the caller's single post-scan slot-column write."""
    from apertis_llm_tpu.ops.pallas.mha_step import mha_decode_ctx, pack_heads

    out_dtype = jnp.dtype(config.dtype)
    if x_quant is not None:
        x_q, x_s = x_quant
        b = x_q.shape[0]
        if "qkv" in lp:
            # Fused QKV stack (models/quantize.attach_qkv_mha): one int8
            # dot + dequant epilogue; the split is a lane-aligned slice.
            y = _linear_pre_q(lp["qkv"], x_q, x_s, out_dtype)
            q, k, v = (z[:, None, :] for z in jnp.split(y, 3, axis=-1))
        else:
            q = _linear_pre_q(lp["q"], x_q, x_s, out_dtype)[:, None, :]
            k = _linear_pre_q(lp["k"], x_q, x_s, out_dtype)[:, None, :]
            v = _linear_pre_q(lp["v"], x_q, x_s, out_dtype)[:, None, :]
    else:
        b = x.shape[0]
        q = _linear(lp["q"], x)
        k = _linear(lp["k"], x)
        v = _linear(lp["v"], x)
    heads, head_dim = config.num_attention_heads, config.head_dim
    if config.position_embedding_type == "rotary":
        q = apply_rope(q, pos, cos_t, sin_t)
        k = apply_rope(k, pos, cos_t, sin_t)
    qp = pack_heads(q)                                    # (B, H*Dh)
    kp = pack_heads(k)
    vp = pack_heads(v)
    if ks_stack is None:
        # bf16 cache: the fresh pair column is written back verbatim.
        kp = kp.astype(k_stack.dtype)
        vp = vp.astype(v_stack.dtype)
    ctx = mha_decode_ctx(qp.astype(out_dtype), k_stack, v_stack,
                         kp.astype(out_dtype), vp.astype(out_dtype),
                         bias_t, layer_idx, head_dim=head_dim,
                         ks_stack=ks_stack, vs_stack=vs_stack)
    ctx = ctx.reshape(b, 1, heads * head_dim)
    if x_quant is not None:
        from apertis_llm_tpu.ops.pallas.quant_matmul import quantize_rows

        c_q, c_s = quantize_rows(ctx[:, 0, :])
        return (_linear_pre_q(lp["o"], c_q, c_s, out_dtype)[:, None, :],
                kp, vp)
    return _linear(lp["o"], ctx.astype(x.dtype)), kp, vp


def _ssm_decode_step(lp, config, x, layer_cache):
    """Single-token selective-SSM update carrying (conv window, ssm state)."""
    b = x.shape[0]
    d_inner = config.ssm_d_inner
    x_proj = _linear(lp["in_proj_x"], x)             # (B, d_inner)
    z = _linear(lp["in_proj_z"], x)
    y_conv, new_conv = ssm_ops.depthwise_conv_step(
        layer_cache["conv"], x_proj, lp["conv"]["w"], lp["conv"]["b"])
    x_act = silu(y_conv)
    a_bar, b_term, c_mod = _ssm_compute_params(lp, config, x_act)  # (B, H, N)
    h_new = ssm_ops.selective_scan_step(
        layer_cache["ssm"], a_bar, b_term.astype(jnp.float32))
    y = (c_mod.astype(jnp.float32) * h_new).reshape(b, d_inner).astype(x.dtype)
    y = y + lp["D"] * x_act
    out = _linear(lp["out_proj"], y * silu(z))
    return out, {"conv": new_conv.astype(layer_cache["conv"].dtype), "ssm": h_new}
