"""Fused int8 matmul kernel vs the dequant reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from apertis_llm_tpu.models.quantize import quantize_weight
from apertis_llm_tpu.ops.pallas.quant_matmul import quant_matmul


@pytest.fixture(autouse=True)
def interpret_mode():
    if jax.devices()[0].platform != "tpu":
        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


@pytest.mark.parametrize("m,k,n", [(4, 64, 96), (17, 608, 2432), (32, 2432, 608)])
def test_quant_matmul_matches_dequant(m, k, n):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, n)) * 0.05, jnp.float32)
    w_q, w_s = quantize_weight(w)

    ref = x @ (w_q.astype(jnp.float32) * w_s)
    got = quant_matmul(x, w_q, w_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_quant_matmul_batched_leading_dims():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 5, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 128)) * 0.1, jnp.float32)
    w_q, w_s = quantize_weight(w)
    ref = x @ (w_q.astype(jnp.float32) * w_s)
    got = quant_matmul(x, w_q, w_s)
    assert got.shape == (2, 5, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_quant_matmul_grad_flows_to_x():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 96)) * 0.1, jnp.float32)
    w_q, w_s = quantize_weight(w)

    g = jax.grad(lambda x: jnp.sum(quant_matmul(x, w_q, w_s) ** 2))(x)
    wd = w_q.astype(jnp.float32) * w_s
    g_ref = jax.grad(lambda x: jnp.sum((x @ wd) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4)


class TestDynamicActivationInt8:
    """quant_matmul_dyn: int8 x int8 MXU math with per-row activation scales."""

    @pytest.mark.parametrize("m,k,n", [(4, 64, 96), (17, 608, 2432),
                                       (256, 2432, 608)])
    def test_matches_integer_emulation(self, m, k, n):
        from apertis_llm_tpu.ops.pallas.quant_matmul import (
            quant_matmul_dyn, quantize_rows)

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, n)) * 0.05, jnp.float32)
        w_q, w_s = quantize_weight(w)
        x_q, x_s = quantize_rows(x)

        # Integer accumulation is exact (|acc| <= 127*127*K < 2^24), so the
        # kernel must match the f32 emulation of the same quantized math.
        ref = (x_q.astype(jnp.float32) @ w_q.astype(jnp.float32)) * x_s * w_s
        got = quant_matmul_dyn(x, w_q, w_s)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_close_to_float_matmul(self):
        from apertis_llm_tpu.ops.pallas.quant_matmul import quant_matmul_dyn

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(32, 512)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(512, 256)) * 0.05, jnp.float32)
        w_q, w_s = quantize_weight(w)
        ref = x @ w
        got = np.asarray(quant_matmul_dyn(x, w_q, w_s), np.float32)
        denom = np.maximum(np.abs(np.asarray(ref)), 1.0)
        assert np.max(np.abs(got - np.asarray(ref)) / denom) < 0.06

    def test_batched_leading_dims_and_grad(self):
        from apertis_llm_tpu.ops.pallas.quant_matmul import quant_matmul_dyn

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(2, 5, 64)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(64, 128)) * 0.1, jnp.float32)
        w_q, w_s = quantize_weight(w)
        out = quant_matmul_dyn(x, w_q, w_s)
        assert out.shape == (2, 5, 128)

        g = jax.grad(lambda x: jnp.sum(quant_matmul_dyn(x, w_q, w_s) ** 2))(
            x.reshape(10, 64))
        wd = w_q.astype(jnp.float32) * w_s
        g_ref = jax.grad(lambda x: jnp.sum((x @ wd) ** 2))(x.reshape(10, 64))
        # Backward flows through the dequantised weight (same as weight-only);
        # forward rounding shifts the cotangent slightly.
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=0.05, atol=0.05)

    def test_dyn_xla_matches_integer_emulation(self):
        from apertis_llm_tpu.ops.pallas.quant_matmul import (
            quant_matmul_dyn_xla, quantize_rows)

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(256, 608)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(608, 384)) * 0.05, jnp.float32)
        w_q, w_s = quantize_weight(w)
        x_q, x_s = quantize_rows(x)
        ref = (x_q.astype(jnp.float32) @ w_q.astype(jnp.float32)) * x_s * w_s
        got = quant_matmul_dyn_xla(x, w_q, w_s)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
        g = jax.grad(lambda x: jnp.sum(quant_matmul_dyn_xla(x, w_q, w_s)))(x)
        assert g.shape == x.shape
