"""Fused causal flash-attention Pallas kernel (forward + custom VJP).

Replaces the O(L^2)-memory XLA attention for training/prefill: per (batch,
head, query-block) the kernel streams key/value blocks through VMEM with an
online-softmax accumulator, never materialising the (L, L) score matrix —
the TPU counterpart of the reference's external CUDA ``flash_attn_func``
(reference: src/model/core.py:754-759).

Causal masking uses the decode-offset convention shared with
ops.attention.mha: query block rows at absolute position q0 + i attend keys
j <= q0 + i. Block-level early exit skips fully-masked key blocks, so the
causal kernel does ~half the work of the dense one.

Backward recomputes attention probabilities blockwise from the saved
logsumexp (standard flash-attention-2 scheme): one kernel accumulates dQ
over key blocks; a second accumulates dK/dV over query blocks.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
NEG_INF = -1e30


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k, scale, causal,
                kv_len):
    qi = pl.program_id(2)
    q = q_ref[0].astype(jnp.float32) * scale             # (BQ, D)
    block_q = q.shape[0]
    kv_len_pad = k_ref.shape[1]

    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, q.shape[1]), jnp.float32)

    q0 = qi * block_q
    num_kb = kv_len_pad // block_k
    if causal:
        # Key block kb is visible iff kb*block_k <= q0 + block_q - 1; skip
        # the fully-masked tail blocks entirely.
        num_kb = jnp.minimum(num_kb, (q0 + block_q + block_k - 1) // block_k)

    def body(kb, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (BQ, BK)
        cols = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = cols < kv_len                        # mask block-padding keys
        if causal:
            rows = q0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            valid = valid & (rows >= cols)
        s = jnp.where(valid, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m, l, acc))
    l = jnp.maximum(l, 1e-30)        # padded query rows: avoid 0/0 NaNs
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)


def _pad_len(n: int, block: int) -> int:
    return ((n + block - 1) // block) * block


def _pad_axis1(x, target: int, value=0.0):
    if x.shape[1] == target:
        return x
    return jnp.pad(x, ((0, 0), (0, target - x.shape[1]), (0, 0)),
                   constant_values=value)


def _fwd(q, k, v, *, scale, causal, block_q, block_k):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    # Pad sequence lengths up to block multiples (like ssm_scan); padded key
    # columns are masked inside the kernel, padded query rows sliced off.
    lqp, lkp = _pad_len(lq, block_q), _pad_len(lk, block_k)
    grid = (b * h, 1, lqp // block_q)
    qr = _pad_axis1(q.reshape(b * h, lq, d), lqp)
    kr = _pad_axis1(k.reshape(b * h, lk, d), lkp)
    vr = _pad_axis1(v.reshape(b * h, lk, d), lkp)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block_k=block_k, scale=scale,
                          causal=causal, kv_len=lk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, _, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkp, d), lambda bh, _, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkp, d), lambda bh, _, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, _, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh, _, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lqp, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, lqp, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
    )(qr, kr, vr)
    return (out[:, :lq].reshape(b, h, lq, d),
            lse[:, :lq].reshape(b, h, lq))


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
               *, block_k, scale, causal, kv_len):
    qi = pl.program_id(2)
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]          # (BQ, 1)
    delta = delta_ref[0]      # (BQ, 1)
    block_q = q.shape[0]
    kv_len_pad = k_ref.shape[1]
    q0 = qi * block_q

    dq = jnp.zeros_like(q)
    num_kb = kv_len_pad // block_k

    def body(kb, dq):
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q * scale, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        cols = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = cols < kv_len
        if causal:
            rows = q0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            valid = valid & (rows >= cols)
        s = jnp.where(valid, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        return dq + jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, num_kb, body, dq)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, *, block_q, scale, causal):
    ki = pl.program_id(2)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    block_k = k.shape[0]
    q_len = q_ref.shape[1]
    k0 = ki * block_k

    dk = jnp.zeros_like(k)
    dv = jnp.zeros_like(v)
    num_qb = q_len // block_q

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(qb * block_q, block_q), :]     # (BQ, 1)
        delta = delta_ref[0, pl.ds(qb * block_q, block_q), :]
        s = jax.lax.dot_general(q * scale, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if causal:
            rows = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            cols = k0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(rows >= cols, s, NEG_INF)
        p = jnp.exp(s - lse)                                    # (BQ, BK)
        dv = dv + jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        return dk, dv

    dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk, dv))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(q, k, v, causal: bool = True,
                    scale: Optional[float] = None,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K):
    """Fused attention: q, k, v (B, H, L, D) -> (B, H, L, D)."""
    out, _ = _flash_fwd(q, k, v, causal, scale, block_q, block_k)
    return out


def _resolve(q, scale, block_q, block_k):
    lq, lk = q.shape[2], None
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return scale, min(block_q, q.shape[2]), block_k


def _flash_fwd(q, k, v, causal, scale, block_q, block_k):
    scale, block_q, block_k = _resolve(q, scale, block_q, block_k)
    block_k = min(block_k, k.shape[2])
    out, lse = _fwd(q, k, v, scale=scale, causal=causal,
                    block_q=block_q, block_k=block_k)
    return out, (q, k, v, out, lse)


def _flash_fwd_vjp(q, k, v, causal, scale, block_q, block_k):
    # custom_vjp fwd rules receive ALL args in their original order; only the
    # bwd rule gets the nondiff args hoisted to the front.
    out, res = _flash_fwd(q, k, v, causal, scale, block_q, block_k)
    return out, res


def _flash_bwd(causal, scale, block_q, block_k, res, g):
    q, k, v, out, lse = res
    scale, block_q, block_k = _resolve(q, scale, block_q, block_k)
    block_k = min(block_k, k.shape[2])
    b, h, lq, d = q.shape
    lk = k.shape[2]
    lqp, lkp = _pad_len(lq, block_q), _pad_len(lk, block_k)
    delta = jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32), axis=-1)

    qr = _pad_axis1(q.reshape(b * h, lq, d), lqp)
    kr = _pad_axis1(k.reshape(b * h, lk, d), lkp)
    vr = _pad_axis1(v.reshape(b * h, lk, d), lkp)
    dor = _pad_axis1(g.reshape(b * h, lq, d), lqp)
    # Padded query rows: lse=+big makes p=exp(s-lse)=0, delta=0 keeps ds=0,
    # so they contribute nothing to dK/dV and their dQ rows are sliced off.
    lser = _pad_axis1(lse.reshape(b * h, lq, 1), lqp, value=1e30)
    deltar = _pad_axis1(delta.reshape(b * h, lq, 1), lqp)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, block_k=block_k, scale=scale,
                          causal=causal, kv_len=lk),
        grid=(b * h, 1, lqp // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, _, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkp, d), lambda bh, _, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkp, d), lambda bh, _, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda bh, _, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh, _, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh, _, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, _, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, lqp, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
    )(qr, kr, vr, dor, lser, deltar)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, block_q=block_q, scale=scale,
                          causal=causal),
        grid=(b * h, 1, lkp // block_k),
        in_specs=[
            pl.BlockSpec((1, lqp, d), lambda bh, _, ki: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, _, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, _, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lqp, d), lambda bh, _, ki: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lqp, 1), lambda bh, _, ki: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lqp, 1), lambda bh, _, ki: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda bh, _, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, _, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lkp, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, lkp, d), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
    )(qr, kr, vr, dor, lser, deltar)

    return (dq[:, :lq].reshape(q.shape), dk[:, :lk].reshape(k.shape),
            dv[:, :lk].reshape(v.shape))


flash_attention.defvjp(_flash_fwd_vjp, _flash_bwd)
