"""Pallas kernel correctness (interpreter mode on CPU; native on TPU).

Checks the fused selective-scan and flash-attention kernels against the
portable XLA implementations, forward and backward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


@pytest.fixture(autouse=True)
def interpret_mode():
    if jax.devices()[0].platform != "tpu":
        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


def test_ssm_scan_kernel_fwd_bwd():
    from apertis_llm_tpu.ops.pallas.ssm_scan import selective_scan_pallas
    from apertis_llm_tpu.ops.ssm import _combine

    rng = np.random.default_rng(0)
    b, h, l, n = 2, 3, 320, 8   # non-multiples of CHUNK/ROW_BLK on purpose
    a = jnp.asarray(rng.uniform(0.4, 0.999, (b, h, l, n)), jnp.float32)
    bt = jnp.asarray(rng.normal(size=(b, h, l, n)), jnp.float32)

    _, ref_h = jax.lax.associative_scan(
        _combine, (a, bt), axis=2), None
    ref = jax.lax.associative_scan(_combine, (a, bt), axis=2)[1]
    got, last = selective_scan_pallas(a, bt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(last), np.asarray(ref[:, :, -1]),
                               rtol=1e-5, atol=1e-5)

    # gradients vs autodiff through the associative scan
    def loss_ref(a, bt):
        return jnp.sum(jnp.sin(jax.lax.associative_scan(_combine, (a, bt), axis=2)[1]))

    def loss_pal(a, bt):
        return jnp.sum(jnp.sin(selective_scan_pallas(a, bt)[0]))

    gr = jax.grad(loss_ref, argnums=(0, 1))(a, bt)
    gp = jax.grad(loss_pal, argnums=(0, 1))(a, bt)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               rtol=1e-4, atol=1e-4)


def test_ssm_scan_kernel_h_init():
    from apertis_llm_tpu.ops.pallas.ssm_scan import selective_scan_pallas
    from apertis_llm_tpu.ops.ssm import _combine

    rng = np.random.default_rng(1)
    b, h, l, n = 1, 2, 64, 4
    a = jnp.asarray(rng.uniform(0.4, 0.999, (b, h, l, n)), jnp.float32)
    bt = jnp.asarray(rng.normal(size=(b, h, l, n)), jnp.float32)
    h0 = jnp.asarray(rng.normal(size=(b, h, n)), jnp.float32)

    bt_folded = bt.at[:, :, 0].add(a[:, :, 0] * h0)
    ref = jax.lax.associative_scan(_combine, (a, bt_folded), axis=2)[1]
    got, _ = selective_scan_pallas(a, bt, h0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # grad flows to h_init
    g = jax.grad(lambda h0: jnp.sum(selective_scan_pallas(a, bt, h0)[0]))(h0)
    gref = jax.grad(lambda h0: jnp.sum(jax.lax.associative_scan(
        _combine, (a, bt.at[:, :, 0].add(a[:, :, 0] * h0)), axis=2)[1]))(h0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("causal", [True, False])
def test_flash_attention_fwd(causal):
    from apertis_llm_tpu.ops.attention import mha
    from apertis_llm_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.default_rng(2)
    b, h, l, d = 1, 2, 256, 64
    q = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)

    ref = mha(q, k, v, causal=causal) if causal else mha(q, k, v, causal=False)
    got = flash_attention(q, k, v, causal, None, 128, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_attention_bwd():
    from apertis_llm_tpu.ops.attention import mha
    from apertis_llm_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.default_rng(3)
    b, h, l, d = 1, 2, 256, 64
    q = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(jnp.tanh(mha(q, k, v, causal=True)))

    def loss_pal(q, k, v):
        return jnp.sum(jnp.tanh(flash_attention(q, k, v, True, None, 128, 128)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    for i, name in enumerate("qkv"):
        np.testing.assert_allclose(
            np.asarray(gp[i]), np.asarray(gr[i]), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name}")


@pytest.mark.parametrize("l", [384, 320, 200])
def test_flash_attention_non_block_multiple_lengths(l):
    """Sequence lengths that don't divide the (default 256) blocks: the
    kernel pads to the block size internally and masks padded keys —
    previously the tail query rows were silently never written (ADVICE r1)."""
    from apertis_llm_tpu.ops.attention import mha
    from apertis_llm_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.default_rng(l)
    b, h, d = 1, 2, 32
    q = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)

    ref = mha(q, k, v, causal=True)
    got = flash_attention(q, k, v, True)          # default 256 blocks
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss_ref(q, k, v):
        return jnp.sum(jnp.tanh(mha(q, k, v, causal=True)))

    def loss_pal(q, k, v):
        return jnp.sum(jnp.tanh(flash_attention(q, k, v, True)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    for i, name in enumerate("qkv"):
        np.testing.assert_allclose(
            np.asarray(gp[i]), np.asarray(gr[i]), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name} at L={l}")


def test_gated_scan_2d_fwd_bwd():
    """Fused y = c * scan(a, b): matches the composed reference, fwd + bwd,
    including the h_last output's cotangent path."""
    from apertis_llm_tpu.ops.pallas.ssm_scan import gated_scan_2d
    from apertis_llm_tpu.ops.ssm import _combine

    rng = np.random.default_rng(3)
    m, l = 70, 700    # non-multiples of ROW_BLK/CHUNK on purpose
    a = jnp.asarray(rng.uniform(0.4, 0.999, (m, l)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(m, l)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(m, l)), jnp.float32)

    ref_h = jax.lax.associative_scan(_combine, (a, b), axis=1)[1]
    y, hlast = gated_scan_2d(a, b, c)
    np.testing.assert_allclose(np.asarray(y), np.asarray(c * ref_h),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hlast), np.asarray(ref_h[:, -1]),
                               rtol=1e-5, atol=1e-5)

    def loss_ref(a, b, c):
        h = jax.lax.associative_scan(_combine, (a, b), axis=1)[1]
        return jnp.sum(jnp.sin(c * h)) + jnp.sum(jnp.cos(h[:, -1]))

    def loss_pal(a, b, c):
        y, hlast = gated_scan_2d(a, b, c)
        return jnp.sum(jnp.sin(y)) + jnp.sum(jnp.cos(hlast))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(a, b, c)
    gp = jax.grad(loss_pal, argnums=(0, 1, 2))(a, b, c)
    for i, name in enumerate("abc"):
        np.testing.assert_allclose(
            np.asarray(gp[i]), np.asarray(gr[i]), rtol=1e-4, atol=1e-4,
            err_msg=f"d{name}")


@pytest.mark.parametrize("masked", [False, True])
def test_ssm_mix_pallas_matches_xla(masked):
    """ssm_mix TPU (gated kernel) path == portable XLA path, fwd + grads +
    masked h_last semantics."""
    import os
    from apertis_llm_tpu.ops import ssm as ssm_mod

    rng = np.random.default_rng(7)
    b, l, h, n = 2, 130, 3, 8
    delta = jnp.asarray(rng.uniform(0.01, 2.0, (b, l, h)), jnp.float32)
    a_cont = -jnp.asarray(rng.uniform(0.1, 1.5, (h, n)), jnp.float32)
    bt = jnp.asarray(rng.normal(size=(b, l, h, n)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(b, l, h, n)), jnp.float32)
    mask = None
    if masked:
        mask = jnp.asarray(
            (np.arange(l)[None, :] < np.asarray([l, l - 37])[:, None]),
            jnp.int32)

    orig = os.environ.get("APERTIS_SSM_KERNEL")
    try:
        os.environ["APERTIS_SSM_KERNEL"] = "xla"
        y_ref, hl_ref = ssm_mod.ssm_mix(delta, a_cont, bt, ct, seq_mask=mask)
        os.environ["APERTIS_SSM_KERNEL"] = "pallas"
        y_pal, hl_pal = ssm_mod.ssm_mix(delta, a_cont, bt, ct, seq_mask=mask)

        np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(hl_pal), np.asarray(hl_ref),
                                   rtol=2e-5, atol=2e-5)

        def loss(kind, delta, bt, ct):
            os.environ["APERTIS_SSM_KERNEL"] = kind
            y, hl = ssm_mod.ssm_mix(delta, a_cont, bt, ct, seq_mask=mask)
            return jnp.sum(jnp.sin(y)) + jnp.sum(hl ** 2)

        gr = jax.grad(lambda d, bb, cc: loss("xla", d, bb, cc),
                      argnums=(0, 1, 2))(delta, bt, ct)
        gp = jax.grad(lambda d, bb, cc: loss("pallas", d, bb, cc),
                      argnums=(0, 1, 2))(delta, bt, ct)
        for i, name in enumerate(["delta", "b", "c"]):
            np.testing.assert_allclose(
                np.asarray(gp[i]), np.asarray(gr[i]), rtol=2e-4, atol=2e-4,
                err_msg=f"d{name} (masked={masked})")
    finally:
        if orig is None:
            os.environ.pop("APERTIS_SSM_KERNEL", None)
        else:
            os.environ["APERTIS_SSM_KERNEL"] = orig


class TestLnQuant:
    """Fused norm+quantize kernel (ops/pallas/ln_quant.py, interpret mode
    off-TPU) vs the unfused norm -> quantize_rows composition it replaces
    on the serving prefill path — bit-exact by construction (the kernel
    reproduces the bf16 round-trip between the norm and the quantize)."""

    def _check(self, rms):
        import numpy as np
        import jax.numpy as jnp
        from apertis_llm_tpu.ops.norms import layer_norm, rms_norm
        from apertis_llm_tpu.ops.pallas.ln_quant import ln_quantize
        from apertis_llm_tpu.ops.pallas.quant_matmul import quantize_rows

        r = np.random.default_rng(0)
        x = jnp.asarray(r.standard_normal((37, 256)) * 2.0, jnp.bfloat16)
        x = x.at[5].set(0.0)  # zero-row guard path
        w = jnp.asarray(1.0 + 0.1 * r.standard_normal(256), jnp.float32)
        b = jnp.asarray(0.05 * r.standard_normal(256), jnp.float32)
        eps = 1e-5
        if rms:
            normed = rms_norm(x, w, eps=eps)
            q, s = ln_quantize(x, w, None, eps=eps, rms=True)
        else:
            normed = layer_norm(x, w, b, eps=eps)
            q, s = ln_quantize(x, w, b, eps=eps, rms=False)
        q_ref, s_ref = quantize_rows(normed.reshape(-1, 256))
        dq = np.abs(np.asarray(q).astype(int) - np.asarray(q_ref).astype(int))
        # Reduction-order ulp differences in the row statistics can flip an
        # element sitting exactly on a rounding boundary by one level.
        assert dq.max() <= 1 and (dq > 0).mean() < 1e-3, dq.max()
        assert np.allclose(np.asarray(s)[:, 0], np.asarray(s_ref)[:, 0],
                           rtol=1e-6)

    def test_layer_norm(self):
        self._check(rms=False)

    def test_rms_norm(self):
        self._check(rms=True)
