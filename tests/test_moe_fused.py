"""Fused dense-MoE decode path (models/moe_fuse.py + ops/moe.moe_dense_fused).

The fused path re-associates the all-expert combine into two stacked int8
GEMMs; its only deviation from ops/moe.moe_dense is int8 rounding, so the
tests pin tolerance against the float dense path and exercise the engine
attach/dispatch wiring end to end.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from apertis_llm_tpu.config import ApertisConfig
from apertis_llm_tpu.models.moe_fuse import (
    attach_fused_decode_params, fuse_moe_decode_params)
from apertis_llm_tpu.models.params import init_params
from apertis_llm_tpu.models.quantize import quantize_params
from apertis_llm_tpu.ops import moe as moe_ops


def _expert_stack(rng, e=4, h=64, i=128, scale_spread=False):
    r = np.random.default_rng(rng)
    ln_w = 1.0 + 0.1 * r.normal(size=(e, h))
    ln_b = 0.05 * r.normal(size=(e, h))
    w1 = 0.08 * r.normal(size=(e, h, i))
    w2 = 0.08 * r.normal(size=(e, i, h))
    if scale_spread:
        # Per-expert magnitude spread exercises the sigma factor.
        mags = np.geomspace(0.1, 10.0, e)[:, None, None]
        w1, w2 = w1 * mags, w2 * mags
    return {
        "ln_w": jnp.asarray(ln_w, jnp.float32),
        "ln_b": jnp.asarray(ln_b, jnp.float32),
        "w1": jnp.asarray(w1, jnp.float32),
        "b1": jnp.asarray(0.02 * r.normal(size=(e, i)), jnp.float32),
        "w2": jnp.asarray(w2, jnp.float32),
        "b2": jnp.asarray(0.02 * r.normal(size=(e, h)), jnp.float32),
    }


def _routing(rng, s, e, k=2):
    r = np.random.default_rng(rng)
    logits = jnp.asarray(r.normal(size=(s, e)), jnp.float32)
    gates = jax.nn.softmax(logits, axis=-1)
    w, i = jax.lax.top_k(gates, k)
    w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-6)
    zero = jnp.zeros((), jnp.float32)
    return moe_ops.RouterOutput(w, i.astype(jnp.int32), zero, zero)


@pytest.mark.parametrize("spread", [False, True])
def test_fused_matches_dense(spread):
    e, h, i, s = 4, 64, 128, 16
    experts = _expert_stack(0, e, h, i, scale_spread=spread)
    routing = _routing(1, s, e)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(s, h)), jnp.float32)

    ref = moe_ops.moe_dense(x, routing, experts, "gelu", 1e-12)
    fused = {**experts, "fused": fuse_moe_decode_params(experts)}
    got = moe_ops.moe_dense_fused(x, routing, fused, "gelu", 1e-12)

    denom = float(jnp.max(jnp.abs(ref))) + 1e-6
    rel = float(jnp.max(jnp.abs(got - ref))) / denom
    assert rel < 0.06, f"fused deviates {rel:.4f} from dense (spread={spread})"


def test_fused_from_quantized_stack():
    """Fusion from an already int8-quantized expert stack stays close."""
    e, h, i, s = 4, 64, 128, 8
    experts = _expert_stack(3, e, h, i)
    from apertis_llm_tpu.models.quantize import quantize_weight
    qtree = dict(experts)
    for key in ("w1", "w2"):
        wq, ws = quantize_weight(qtree.pop(key))
        qtree[key + "_q"], qtree[key + "_s"] = wq, ws
    routing = _routing(4, s, e)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(s, h)), jnp.float32)

    ref = moe_ops.moe_dense(x, routing, experts, "gelu", 1e-12)
    fused = {**qtree, "fused": fuse_moe_decode_params(qtree)}
    got = moe_ops.moe_dense_fused(x, routing, fused, "gelu", 1e-12)
    denom = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert float(jnp.max(jnp.abs(got - ref))) / denom < 0.08


def test_fused_active_mask():
    """Expert masking zeroes the combine exactly like the dense path."""
    e, h, i, s = 4, 32, 64, 8
    experts = _expert_stack(6, e, h, i)
    routing = _routing(7, s, e)
    x = jnp.asarray(np.random.default_rng(8).normal(size=(s, h)), jnp.float32)
    mask = jnp.asarray([True, False, True, True])

    ref = moe_ops.moe_dense(x, routing, experts, "gelu", 1e-12,
                            active_mask=mask)
    fused = {**experts, "fused": fuse_moe_decode_params(experts)}
    got = moe_ops.moe_dense_fused(x, routing, fused, "gelu", 1e-12,
                                  active_mask=mask)
    denom = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert float(jnp.max(jnp.abs(got - ref))) / denom < 0.06


@pytest.mark.parametrize("spread", [False, True])
def test_fat_matches_dense(spread):
    """Combine-folded two-fat-2D-GEMM path vs the float dense path. The
    spread case exercises W2's shared-per-channel scales (the one extra
    coarsening this layout carries)."""
    from apertis_llm_tpu.models.moe_fuse import fuse_moe_decode_params_fat

    e, h, i, s = 4, 64, 128, 16
    experts = _expert_stack(0, e, h, i, scale_spread=spread)
    routing = _routing(1, s, e)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(s, h)), jnp.float32)

    ref = moe_ops.moe_dense(x, routing, experts, "gelu", 1e-12)
    fat = {**experts, "fat": fuse_moe_decode_params_fat(experts)}
    got = moe_ops.moe_dense_fat(x, routing, fat, "gelu", 1e-12)

    denom = float(jnp.max(jnp.abs(ref))) + 1e-6
    rel = float(jnp.max(jnp.abs(got - ref))) / denom
    tol = 0.12 if spread else 0.06
    assert rel < tol, f"fat deviates {rel:.4f} from dense (spread={spread})"


@pytest.mark.parametrize("spread", [False, True])
def test_fat_kernel_matches_dense(spread):
    """Fused-Pallas fat path (ops/pallas/moe_ffn.expert_ffn_fat, interpret
    mode off-TPU) vs the float dense path. Same weight layout and W2 scale
    coarsening as moe_dense_fat; hidden scales are per (row, tile)."""
    from apertis_llm_tpu.models.moe_fuse import fuse_moe_decode_params_fat

    e, h, i, s = 4, 64, 128, 16
    experts = _expert_stack(0, e, h, i, scale_spread=spread)
    routing = _routing(1, s, e)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(s, h)), jnp.float32)

    ref = moe_ops.moe_dense(x, routing, experts, "gelu", 1e-12)
    fat = {**experts, "fat": fuse_moe_decode_params_fat(experts)}
    got = moe_ops.moe_dense_fat_kernel(x, routing, fat, "gelu", 1e-12)

    denom = float(jnp.max(jnp.abs(ref))) + 1e-6
    rel = float(jnp.max(jnp.abs(got - ref))) / denom
    tol = 0.12 if spread else 0.06
    assert rel < tol, f"fat kernel deviates {rel:.4f} (spread={spread})"


def test_fat_kernel_active_mask():
    from apertis_llm_tpu.models.moe_fuse import fuse_moe_decode_params_fat

    e, h, i, s = 4, 32, 64, 8
    experts = _expert_stack(6, e, h, i)
    routing = _routing(7, s, e)
    x = jnp.asarray(np.random.default_rng(8).normal(size=(s, h)), jnp.float32)
    mask = jnp.asarray([True, False, True, True])

    ref = moe_ops.moe_dense(x, routing, experts, "gelu", 1e-12,
                            active_mask=mask)
    fat = {**experts, "fat": fuse_moe_decode_params_fat(experts)}
    got = moe_ops.moe_dense_fat_kernel(x, routing, fat, "gelu", 1e-12,
                                       active_mask=mask)
    denom = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert float(jnp.max(jnp.abs(got - ref))) / denom < 0.06


def test_fat_kernel_odd_rows_and_tile_split():
    """Row counts off the 32-sublane multiple pad correctly, and a block_n
    smaller than I exercises the per-(row, tile) scale accumulation."""
    from apertis_llm_tpu.models.moe_fuse import fuse_moe_decode_params_fat
    from apertis_llm_tpu.ops.pallas.moe_ffn import expert_ffn_fat
    from apertis_llm_tpu.ops.pallas.quant_matmul import quantize_rows

    e, h, i, s = 2, 32, 256, 13
    experts = _expert_stack(9, e, h, i)
    routing = _routing(10, s, e)
    x = jnp.asarray(np.random.default_rng(11).normal(size=(s, h)), jnp.float32)
    ref = moe_ops.moe_dense(x, routing, experts, "gelu", 1e-12)

    fat = fuse_moe_decode_params_fat(experts)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    inv = jnp.where(var > 0, jax.lax.rsqrt(var + 1e-12), 0.0)
    xq, xs = quantize_rows(x - mean)
    combine = moe_ops._combine_weights(routing, e, jnp.float32)
    out = expert_ffn_fat(
        xq, xs * inv, combine, fat["w1t_q"], fat["w1t_s"], fat["b1t"],
        fat["w2t_q"], fat["w2t_s"], e, out_dtype=jnp.float32,
        hidden_act="gelu", block_n=128)
    out = out + combine @ experts["b2"]
    denom = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert float(jnp.max(jnp.abs(out - ref))) / denom < 0.06


def test_fat_kernel_bf16_dot2_matches_dense():
    """bf16-GEMM2 kernel variant (APERTIS_MOE_FATK_BF16DOT2): the hidden is
    cast to bf16 instead of requantized to int8 — error stays at the same
    order as the int8 variants."""
    from apertis_llm_tpu.models.moe_fuse import fuse_moe_decode_params_fat
    from apertis_llm_tpu.ops.pallas.moe_ffn import expert_ffn_fat
    from apertis_llm_tpu.ops.pallas.quant_matmul import quantize_rows

    e, h, i, s = 4, 64, 128, 16
    experts = _expert_stack(0, e, h, i)
    routing = _routing(1, s, e)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(s, h)), jnp.float32)
    ref = moe_ops.moe_dense(x, routing, experts, "gelu", 1e-12)

    fat = fuse_moe_decode_params_fat(experts)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    inv = jnp.where(var > 0, jax.lax.rsqrt(var + 1e-12), 0.0)
    xq, xs = quantize_rows(x - mean)
    combine = moe_ops._combine_weights(routing, e, jnp.float32)
    out = expert_ffn_fat(
        xq, xs * inv, combine, fat["w1t_q"], fat["w1t_s"], fat["b1t"],
        fat["w2t_q"], fat["w2t_s"], e, out_dtype=jnp.float32,
        hidden_act="gelu", bf16_dot2=True)
    out = out + combine @ experts["b2"]
    denom = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert float(jnp.max(jnp.abs(out - ref))) / denom < 0.06


def test_fat_kernel_layer_stacked_prefetch():
    """The layer-stacked kernel (scalar-prefetched layer index — the decode
    scan path that avoids XLA's dynamic-slice copies) matches running each
    layer's unstacked kernel."""
    from apertis_llm_tpu.models.moe_fuse import fuse_moe_decode_params_fat

    e, h, i, s, nl = 2, 32, 256, 16, 3
    stacks = [_expert_stack(20 + li, e, h, i) for li in range(nl)]
    stacked = {k: jnp.stack([st[k] for st in stacks]) for k in stacks[0]}
    fat_stack = fuse_moe_decode_params_fat(stacked)
    routing = _routing(30, s, e)
    x = jnp.asarray(np.random.default_rng(31).normal(size=(s, h)), jnp.float32)

    for li in range(nl):
        per_layer = {**stacks[li],
                     "fat": fuse_moe_decode_params_fat(stacks[li])}
        want = moe_ops.moe_dense_fat_kernel(
            x, routing, per_layer, "gelu", 1e-12)
        got = moe_ops.moe_dense_fat_kernel(
            x, routing, stacks[li], "gelu", 1e-12,
            fat_stack=fat_stack, layer_idx=jnp.int32(li))
        assert float(jnp.max(jnp.abs(got - want))) < 1e-5, f"layer {li}"


def test_fat_active_mask():
    from apertis_llm_tpu.models.moe_fuse import fuse_moe_decode_params_fat

    e, h, i, s = 4, 32, 64, 8
    experts = _expert_stack(6, e, h, i)
    routing = _routing(7, s, e)
    x = jnp.asarray(np.random.default_rng(8).normal(size=(s, h)), jnp.float32)
    mask = jnp.asarray([True, False, True, True])

    ref = moe_ops.moe_dense(x, routing, experts, "gelu", 1e-12,
                            active_mask=mask)
    fat = {**experts, "fat": fuse_moe_decode_params_fat(experts)}
    got = moe_ops.moe_dense_fat(x, routing, fat, "gelu", 1e-12,
                                active_mask=mask)
    denom = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert float(jnp.max(jnp.abs(got - ref))) / denom < 0.06


def test_fat_stacked_shapes():
    from apertis_llm_tpu.models.moe_fuse import fuse_moe_decode_params_fat

    cfg = _moe_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params(params, min_size=0)
    fat = fuse_moe_decode_params_fat(qparams["layers"]["ffn"]["experts"])
    L, E, H, I = 2, 4, 64, 128
    assert fat["w1t_q"].shape == (L, H, E * I)
    assert fat["w1t_q"].dtype == jnp.int8
    assert fat["w1t_s"].shape == (L, 1, E * I)
    assert fat["b1t"].shape == (L, E * I)
    assert fat["w2t_q"].shape == (L, E * I, H)
    assert fat["w2t_s"].shape == (L, 1, H)


def _moe_config():
    return ApertisConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        attention_type="selective_ssm", ssm_d_state=8,
        use_expert_system=True, num_experts=4, experts_per_token=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        max_position_embeddings=256)


def test_stacked_layer_fusion_shapes():
    cfg = _moe_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params(params, min_size=0)
    experts = qparams["layers"]["ffn"]["experts"]
    fused = fuse_moe_decode_params(experts)
    L, E, H, I = 2, 4, 64, 128
    assert fused["w1f_q"].shape == (L, E, H, I)
    assert fused["w1f_q"].dtype == jnp.int8
    assert fused["w1f_s"].shape == (L, E, 1, I)
    assert fused["b1f"].shape == (L, E, I)
    assert fused["w2f_q"].shape == (L, E, I, H)
    assert fused["w2f_s"].shape == (L, E, 1, H)


def test_engine_attaches_and_generates(monkeypatch):
    from apertis_llm_tpu.inference.engine import InferenceEngine

    cfg = _moe_config()
    params = quantize_params(init_params(jax.random.PRNGKey(0), cfg),
                             min_size=0)
    eng = InferenceEngine(cfg, params)
    assert "fat" in eng.params["layers"]["ffn"]["experts"]

    prompt = np.array([[5, 7, 9, 11]], np.int32)
    out = eng.generate(prompt, max_new_tokens=4, do_sample=False)
    assert out.shape == (1, 8)

    # Kill switch: APERTIS_MOE_FUSED=0 leaves the tree untouched.
    monkeypatch.setenv("APERTIS_MOE_FUSED", "0")
    eng2 = InferenceEngine(cfg, params)
    assert "fused" not in eng2.params["layers"]["ffn"]["experts"]
    assert "fat" not in eng2.params["layers"]["ffn"]["experts"]

    # Pallas-kernel mode stays selectable.
    monkeypatch.setenv("APERTIS_MOE_FUSED", "1")
    eng3 = InferenceEngine(cfg, params)
    assert "fused" in eng3.params["layers"]["ffn"]["experts"]


def test_attach_idempotent_and_nonmoe_noop():
    cfg = _moe_config()
    params = quantize_params(init_params(jax.random.PRNGKey(0), cfg),
                             min_size=0)
    once = attach_fused_decode_params(params)
    twice = attach_fused_decode_params(once)
    assert once["layers"]["ffn"]["experts"]["fat"] is \
        twice["layers"]["ffn"]["experts"]["fat"]

    dense_cfg = ApertisConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        attention_type="selective_ssm", ssm_d_state=8,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    dense = init_params(jax.random.PRNGKey(1), dense_cfg)
    assert attach_fused_decode_params(dense) is dense


def test_grouped_prefill_matches_dense():
    """Grouped prefill kernel (ops/pallas/moe_grouped.py + moe_grouped_fat):
    tile-padded expert-sorted dispatch on the SAME fat stack matches the
    float dense path within the int8 band, at prefill-scale row counts
    with uneven expert loads (layer-stacked weights, both layers)."""
    from apertis_llm_tpu.models.moe_fuse import fuse_moe_decode_params_fat

    e, h, i, s, layers = 4, 64, 256, 300, 2
    experts = _expert_stack(20, e, h, i)
    stacked = jax.tree.map(
        lambda t: jnp.stack([t, t * 0.5]), experts)   # (L, E, ...)
    fat = fuse_moe_decode_params_fat(stacked)
    routing = _routing(21, s, e)
    x = jnp.asarray(np.random.default_rng(22).normal(size=(s, h)),
                    jnp.float32)
    for li in range(layers):
        lp = jax.tree.map(lambda t: t[li], stacked)
        ref = moe_ops.moe_dense(x, routing, lp, "gelu", 1e-12)
        got = moe_ops.moe_grouped_fat(
            x, routing, {"b2": lp["b2"]}, "gelu", 1e-12, fat, li)
        denom = float(jnp.max(jnp.abs(ref))) + 1e-6
        err = float(jnp.max(jnp.abs(got - ref))) / denom
        assert err < 0.06, (li, err)


def test_grouped_prefill_engine_parity():
    """End-to-end MoE prefill through the engine: the grouped kernel path
    (APERTIS_MOE_GROUPED=force) produces the same greedy tokens as the
    ragged path on the same int8 tree."""
    import os

    from apertis_llm_tpu.inference.engine import InferenceEngine

    cfg = ApertisConfig(
        vocab_size=256, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=8, intermediate_size=256,
        attention_type="selective_ssm", ssm_d_state=16,
        use_expert_system=True, num_experts=4, experts_per_token=2,
        moe_dense_threshold_tokens=8,   # prompt rows take the prefill path
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        max_position_embeddings=64)
    params = quantize_params(init_params(jax.random.PRNGKey(3), cfg),
                             min_size=0)
    prompt = np.asarray([[3, 17, 29, 5, 9, 11, 2, 7]], np.int32)
    outs = {}
    for mode in ("force", "0"):
        os.environ["APERTIS_MOE_GROUPED"] = mode
        try:
            eng = InferenceEngine(cfg, params)
            outs[mode] = eng.generate(
                prompt, max_new_tokens=6, eos_token_id=(), do_sample=False,
                rng=jax.random.PRNGKey(0))[0].tolist()
        finally:
            del os.environ["APERTIS_MOE_GROUPED"]
    assert outs["force"] == outs["0"], outs
