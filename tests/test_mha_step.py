"""Fused MHA decode-attention kernel (ops/pallas/mha_step.py) parity.

The flat KV layout stores each slot as the head-flat (H*Dh) projection
row (zero HBM lane padding when H*Dh is 128-aligned) and the Pallas
kernel fuses the decode step's score/mask/softmax/context chain plus the
fresh token's self-term, with all heads' scores in one MXU dot. These
tests pin it (interpret mode on CPU, ``APERTIS_MHA_STEP=force``)
against the XLA self-term path (ops/attention.decode_attention_selfterm),
which is itself parity-pinned against the PyTorch reference
(src/model/core.py:705-832) by test_parity/test_decode.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apertis_llm_tpu.config import ApertisConfig
from apertis_llm_tpu.models import apertis as M
from apertis_llm_tpu.models.params import init_params
from apertis_llm_tpu.ops import attention as attn_ops
from apertis_llm_tpu.ops.pallas.mha_step import (
    mha_decode_ctx, pack_cache, pair_kv_enabled)


@pytest.fixture
def force_mha_step():
    os.environ["APERTIS_MHA_STEP"] = "force"
    yield
    del os.environ["APERTIS_MHA_STEP"]


def _cfg(**over):
    base = dict(
        vocab_size=128, hidden_size=128, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=256,
        attention_type="standard_mha", dtype="float32",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        max_position_embeddings=64)
    base.update(over)
    return ApertisConfig(**base)


@pytest.mark.parametrize("head_dim,heads", [(32, 4), (64, 2), (128, 2),
                                            (64, 6)])
def test_kernel_matches_xla_selfterm(head_dim, heads):
    """Raw kernel vs decode_attention_selfterm on random tensors."""
    nl, b, l = 3, 4, 24
    rng = np.random.default_rng(0)

    def t(*shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.float32)

    q = t(b, heads, 1, head_dim)
    k_cache = t(nl, b, heads, l, head_dim)
    v_cache = t(nl, b, heads, l, head_dim)
    k_new = t(b, heads, 1, head_dim)
    v_new = t(b, heads, 1, head_dim)
    # Per-row validity with a stale slot masked out, rows of mixed length.
    valid = jnp.asarray(rng.integers(0, 2, (b, l)) > 0)
    valid = valid.at[:, 0].set(True)

    li = 1
    want = attn_ops.decode_attention_selfterm(
        q, k_cache[li], v_cache[li], k_new, v_new, valid)  # (B, H, 1, Dh)

    bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)   # (B, L)
    d = heads * head_dim
    got = mha_decode_ctx(
        q[:, :, 0, :].reshape(b, d), pack_cache(k_cache),
        pack_cache(v_cache),
        k_new[:, :, 0, :].reshape(b, d),
        v_new[:, :, 0, :].reshape(b, d),
        bias, li, head_dim=head_dim)
    got = got.reshape(b, heads, 1, head_dim)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_decode_step_matches_plain(force_mha_step):
    """prefill + decode_step logits match the XLA path, incl. right-padded
    rows (the bias/mask plumbing) and the post-scan slot-column write."""
    cfg = _cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray([[3, 17, 29, 5, 9], [11, 23, 2, 0, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 1, 1], [1, 1, 1, 0, 0]], jnp.int32)

    def run(paired):
        os.environ["APERTIS_MHA_STEP"] = "force" if paired else "0"
        cache = M.init_cache(cfg, 2, max_length=16)
        assert (cache["k"].ndim == 4) == paired
        pre = M.prefill(params, cfg, cache, ids, attention_mask=mask)
        cache = pre.cache
        lens = mask.sum(axis=1)
        logits = jnp.take_along_axis(
            pre.logits, (lens - 1)[:, None, None], axis=1)[:, 0, :]
        outs = [logits]
        row = jnp.zeros((2, 16), jnp.int32).at[:, :5].set(mask)
        for i in range(5):
            t = jnp.asarray(5 + i, jnp.int32)
            row = row.at[:, 5 + i].set(1)
            toks = jnp.argmax(logits, -1)
            logits, cache = M.decode_step(
                params, cfg, cache, toks, t, attn_mask_row=row,
                positions=lens + i)
            outs.append(logits)
        return outs

    plain = run(False)
    paired = run(True)
    os.environ["APERTIS_MHA_STEP"] = "force"  # fixture deletes it
    for i, (a, b) in enumerate(zip(plain, paired)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4, err_msg=f"step {i}")


def test_engine_greedy_matches_plain(force_mha_step):
    """End-to-end compiled generation: token-exact vs the XLA path."""
    cfg = _cfg(vocab_size=256)
    params = init_params(jax.random.PRNGKey(1), cfg)
    from apertis_llm_tpu.inference.engine import InferenceEngine

    prompt = np.asarray([[1, 17, 93, 40], [7, 3, 0, 0]], np.int32)
    mask = np.asarray([[1, 1, 1, 1], [1, 1, 0, 0]], np.int32)
    os.environ["APERTIS_MHA_STEP"] = "0"
    plain = InferenceEngine(cfg, params).generate(
        prompt, attention_mask=mask, max_new_tokens=8, eos_token_id=(),
        do_sample=False, rng=jax.random.PRNGKey(0))
    os.environ["APERTIS_MHA_STEP"] = "force"
    fused = InferenceEngine(cfg, params).generate(
        prompt, attention_mask=mask, max_new_tokens=8, eos_token_id=(),
        do_sample=False, rng=jax.random.PRNGKey(0))
    assert plain.tolist() == fused.tolist()


def test_gates(force_mha_step):
    """Non-128-aligned flat dims and SSM keep the XLA path; QUANT_KV under
    the flat gate allocates the int8 flat layout with scale stacks."""
    assert pair_kv_enabled(_cfg())
    assert not pair_kv_enabled(_cfg(attention_type="selective_ssm"))
    # 3 heads at head_dim 32: H*Dh = 96 isn't a 128-lane multiple.
    assert not pair_kv_enabled(
        _cfg(hidden_size=96, num_attention_heads=3))
    os.environ["APERTIS_QUANT_KV"] = "1"
    try:
        assert pair_kv_enabled(_cfg())
        cache = M.init_cache(_cfg(), 2, max_length=16)
        assert cache["k"].dtype == jnp.int8
        assert cache["k"].shape == (3, 2, 16, 128)      # (nl, B, L, H*Dh)
        assert cache["k_ps"].shape == (3, 2, 4, 16)     # (nl, B, H, L)
        # non-flat configs keep the round-3 int8 layout
        cache = M.init_cache(_cfg(hidden_size=96, num_attention_heads=3),
                             2, max_length=16)
        assert "k_s" in cache and cache["k"].shape[4] == 32
    finally:
        del os.environ["APERTIS_QUANT_KV"]
    # Very long contexts exceed the kernel's VMEM block: normal layout.
    cache = M.init_cache(_cfg(), 1, max_length=300_000)
    assert cache["k"].shape[4] == 32


def test_decode_step_int8_paired_cache(force_mha_step):
    """int8 paired cache (QUANT_KV under the paired gate): prefill +
    decode_step logits stay within the KV/q-quantization band of the bf16
    paired path and greedy tokens agree."""
    cfg = _cfg()
    params = init_params(jax.random.PRNGKey(5), cfg)
    ids = jnp.asarray([[3, 17, 29, 5], [11, 23, 2, 9]], jnp.int32)

    def step(quant_kv):
        if quant_kv:
            os.environ["APERTIS_QUANT_KV"] = "1"
        try:
            cache = M.init_cache(cfg, 2, max_length=16)
            assert ("k_ps" in cache) == quant_kv
            pre = M.prefill(params, cfg, cache, ids)
            logits, cache2 = M.decode_step(
                params, cfg, pre.cache, jnp.argmax(pre.logits[:, -1], -1),
                jnp.asarray(4, jnp.int32))
            if quant_kv:
                # the fresh column landed quantized with its scale
                assert bool(jnp.any(cache2["k_ps"][:, :, :, 4] > 0))
            return logits
        finally:
            if quant_kv:
                del os.environ["APERTIS_QUANT_KV"]

    bf16 = step(False)
    int8 = step(True)
    scale = float(jnp.max(jnp.abs(bf16))) + 1e-6
    err = float(jnp.max(jnp.abs(int8 - bf16))) / scale
    assert err < 3e-2, err
    assert jnp.array_equal(jnp.argmax(bf16, -1), jnp.argmax(int8, -1))


def test_decode_step_quantized_tree(force_mha_step):
    """int8 serving tree: the paired path runs fused-LN int8 projections
    (ln_quant + pre-quantized dots). Logits stay within the int8
    activation-rounding band of the XLA weight-only path and greedy
    tokens agree."""
    from apertis_llm_tpu.models.quantize import quantize_params

    cfg = _cfg()
    params = quantize_params(init_params(jax.random.PRNGKey(3), cfg),
                             min_size=0)
    ids = jnp.asarray([[3, 17, 29, 5], [11, 23, 2, 9]], jnp.int32)

    def step(paired):
        os.environ["APERTIS_MHA_STEP"] = "force" if paired else "0"
        cache = M.init_cache(cfg, 2, max_length=16)
        assert (cache["k"].ndim == 4) == paired
        pre = M.prefill(params, cfg, cache, ids)
        logits, _ = M.decode_step(
            params, cfg, pre.cache, jnp.argmax(pre.logits[:, -1], -1),
            jnp.asarray(4, jnp.int32))
        return logits

    plain = step(False)
    paired = step(True)
    os.environ["APERTIS_MHA_STEP"] = "force"  # fixture deletes it
    scale = float(jnp.max(jnp.abs(plain))) + 1e-6
    err = float(jnp.max(jnp.abs(paired - plain))) / scale
    assert err < 3e-2, err
    assert jnp.array_equal(jnp.argmax(plain, -1), jnp.argmax(paired, -1))


def test_decode_step_fused_qkv_matches_split(force_mha_step):
    """attach_qkv_mha's concatenated projection stack produces the same
    logits as the three split dots (exact: same int8 payloads, same math,
    different fusion grouping)."""
    from apertis_llm_tpu.models.quantize import attach_qkv_mha, quantize_params

    cfg = _cfg()
    params = quantize_params(init_params(jax.random.PRNGKey(7), cfg),
                             min_size=0)
    fused_params = attach_qkv_mha(params)
    assert "qkv" in fused_params["layers"]["attn"]
    assert attach_qkv_mha(fused_params) is fused_params       # idempotent
    ids = jnp.asarray([[3, 17, 29, 5], [11, 23, 2, 9]], jnp.int32)

    def step(p):
        cache = M.init_cache(cfg, 2, max_length=16)
        pre = M.prefill(p, cfg, cache, ids)
        logits, _ = M.decode_step(
            p, cfg, pre.cache, jnp.argmax(pre.logits[:, -1], -1),
            jnp.asarray(4, jnp.int32))
        return logits

    split = step(params)
    fused = step(fused_params)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(split),
                               atol=1e-4, rtol=1e-4)
