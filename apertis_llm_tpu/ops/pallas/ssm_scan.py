"""Fused selective-scan Pallas kernel (forward + custom VJP backward).

Computes the diagonal linear recurrence

    h[t] = a[t] * h[t-1] + b[t]

for M independent channels in ONE pass over HBM, replacing
``jax.lax.associative_scan`` (which XLA lowers to a log-depth tree with
materialised intermediates — measured ~150x below HBM speed-of-light for
Apertis SSM shapes).

Layout: channels on sublanes, TIME ON LANES. Each (ROW_BLK, CHUNK) VMEM tile
holds ROW_BLK independent scans over CHUNK consecutive timesteps; the
in-tile inclusive scan is a Hillis-Steele ladder of lane-rolls
(log2(CHUNK) rounds of fully-dense VPU ops), and a VMEM carry composes
chunks across the sequential grid dimension.

Backward uses the scan-adjoint identity: with g = dL/dh,

    lam[t] = g[t] + a[t+1] * lam[t+1]        (reverse scan)
    dL/db[t] = lam[t]
    dL/da[t] = lam[t] * h[t-1]
    dL/dh_init = lam[0] * a[0]

so the same forward kernel runs on time-flipped, index-shifted inputs.

Numerical contract matches ops.ssm.selective_scan (fp32 carry); the model
dispatches here on TPU via APERTIS_SSM_KERNEL=pallas|xla (default pallas on
TPU).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLK = 256    # independent scans per tile (sublane-major)
CHUNK = 512      # max timesteps per tile (lanes)


def _chunk_for(l: int) -> int:
    """Lane-tile size for sequence length ``l``: the 128-multiple that
    covers it, capped at CHUNK — a 232-step prefill pads to 256, not 512
    (the pad writes + in-kernel work scale with the padded length)."""
    return min(CHUNK, -(-l // 128) * 128)


def _scan_kernel(chunk, a_ref, b_ref, out_ref, carry_ref):
    """One (ROW_BLK, chunk) tile: in-tile Hillis-Steele + chunk carry."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    a = a_ref[:].astype(jnp.float32)
    h = b_ref[:].astype(jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
    k = 1
    while k < chunk:
        live = lane >= k
        h_sh = jnp.where(live, pltpu.roll(h, k, axis=1), 0.0)
        a_sh = jnp.where(live, pltpu.roll(a, k, axis=1), 1.0)
        h = h + a * h_sh
        a = a * a_sh
        k *= 2

    # Fold in the carried state: h[t] += (prod a[0..t]) * h_in.
    h = h + a * carry_ref[:, 0][:, None]
    out_ref[:] = h
    carry_ref[:, 0] = h[:, chunk - 1]


def _pad_to(x: jnp.ndarray, rows: int, cols: int, fill) -> jnp.ndarray:
    pr, pc = rows - x.shape[0], cols - x.shape[1]
    if pr or pc:
        x = jnp.pad(x, ((0, pr), (0, pc)), constant_values=fill)
    return x


def _scan_2d(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Inclusive scan over axis 1 of (M, L) arrays, zero initial state."""
    m, l = a.shape
    chunk = _chunk_for(l)
    mp = -(-m // ROW_BLK) * ROW_BLK
    lp = -(-l // chunk) * chunk
    a_p = _pad_to(a, mp, lp, 1.0)   # identity transition on padding
    b_p = _pad_to(b, mp, lp, 0.0)

    grid = (mp // ROW_BLK, lp // chunk)
    out = pl.pallas_call(
        functools.partial(_scan_kernel, chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_BLK, chunk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BLK, chunk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_BLK, chunk), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, lp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ROW_BLK, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # Row blocks are independent; the chunk dimension carries state
            # and must stay sequential.
            dimension_semantics=("parallel", "arbitrary")),
    )(a_p, b_p)
    return out[:m, :l]


def _to_2d(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, L, N) -> (B*H*N, L) with time on the minor axis."""
    b, h, l, n = x.shape
    return x.transpose(0, 1, 3, 2).reshape(b * h * n, l)


def _from_2d(x: jnp.ndarray, shape) -> jnp.ndarray:
    b, h, l, n = shape
    return x.reshape(b, h, n, l).transpose(0, 1, 3, 2)


def _fwd_impl(a_bar, b_term, h_init):
    shape = a_bar.shape
    a2 = _to_2d(a_bar.astype(jnp.float32))
    b2 = _to_2d(b_term.astype(jnp.float32))
    if h_init is not None:
        # Fold the carried state into step 0: b0' = a0 * h_init + b0.
        h0 = h_init.astype(jnp.float32).reshape(a2.shape[0])
        b2 = b2.at[:, 0].add(a2[:, 0] * h0)
    h2 = _scan_2d(a2, b2)
    h = _from_2d(h2, shape)
    return h, h[:, :, -1, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _scan_core(a_bar, b_term, h_init):
    h, _ = _fwd_impl(a_bar, b_term, h_init)
    return h


def _scan_core_fwd(a_bar, b_term, h_init):
    h, _ = _fwd_impl(a_bar, b_term, h_init)
    return h, (a_bar, h, h_init)


def _scan_core_bwd(residuals, g):
    a_bar, h, h_init = residuals
    shape = a_bar.shape
    a2 = _to_2d(a_bar.astype(jnp.float32))
    g2 = _to_2d(g.astype(jnp.float32))
    h2 = _to_2d(h.astype(jnp.float32))

    # lam[t] = g[t] + a[t+1] lam[t+1]  ==  forward scan on time-reversed
    # (a shifted left by one, g).
    a_next = jnp.concatenate(
        [a2[:, 1:], jnp.ones_like(a2[:, :1])], axis=1)
    lam2 = _scan_2d(a_next[:, ::-1], g2[:, ::-1])[:, ::-1]

    # h[t-1] with the initial state at t=0.
    if h_init is not None:
        h0 = h_init.astype(jnp.float32).reshape(a2.shape[0], 1)
    else:
        h0 = jnp.zeros((a2.shape[0], 1), jnp.float32)
    h_prev = jnp.concatenate([h0, h2[:, :-1]], axis=1)

    da = _from_2d(lam2 * h_prev, shape).astype(a_bar.dtype)
    db = _from_2d(lam2, shape)
    dh0 = None
    if h_init is not None:
        dh0 = (lam2[:, 0] * a2[:, 0]).reshape(h_init.shape).astype(h_init.dtype)
    return da, db.astype(jnp.float32), dh0


_scan_core.defvjp(_scan_core_fwd, _scan_core_bwd)


def selective_scan_pallas(
    a_bar: jnp.ndarray,   # (B, H, L, N)
    b_term: jnp.ndarray,  # (B, H, L, N)
    h_init: Optional[jnp.ndarray] = None,  # (B, H, N)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for ops.ssm.selective_scan (fused TPU kernel)."""
    dtype = b_term.dtype
    h = _scan_core(a_bar, b_term,
                   h_init if h_init is None else h_init)
    return h.astype(dtype), h[:, :, -1, :].astype(dtype)


# ---------------------------------------------------------------------------
# Gated scan: y[t] = c[t] * h[t] fused into the same pass, h never hits HBM.
#
# This is the prefill/training hot path behind ops.ssm.ssm_mix. Inputs arrive
# already in the kernel's (rows, time) layout — the model transposes the
# SMALL (B, H, L) delta tensor and broadcasts exp(delta * A) directly into
# time-minor order, so no (B, L, H, N) <-> (B, H, L, N) relayout of the big
# scan operands ever happens (round-2 profile: ~300 ms of transpose/layout
# time per b256 prefill, VERDICT r2 item 2).
# ---------------------------------------------------------------------------


def _gated_kernel(want_h, chunk):
    """Tile kernel: inclusive scan + carry, output c*h (and h if want_h)."""

    def kernel(a_ref, b_ref, c_ref, out_ref, hlast_ref, *rest):
        if want_h:
            h_ref, carry_ref = rest
        else:
            (carry_ref,) = rest
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            carry_ref[:] = jnp.zeros_like(carry_ref)

        a = a_ref[:].astype(jnp.float32)
        h = b_ref[:].astype(jnp.float32)

        lane = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
        k = 1
        while k < chunk:
            live = lane >= k
            h_sh = jnp.where(live, pltpu.roll(h, k, axis=1), 0.0)
            a_sh = jnp.where(live, pltpu.roll(a, k, axis=1), 1.0)
            h = h + a * h_sh
            a = a * a_sh
            k *= 2

        h = h + a * carry_ref[:, 0][:, None]
        out_ref[:] = (c_ref[:].astype(jnp.float32) * h).astype(out_ref.dtype)
        if want_h:
            h_ref[:] = h
        carry_ref[:, 0] = h[:, chunk - 1]

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            hlast_ref[:] = h[:, chunk - 1][:, None]

    return kernel


def _gated_2d(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray,
              out_dtype, want_h: bool):
    """Gated inclusive scan over axis 1 of (M, L) arrays.

    Returns (y, h_last[, h]) with y = c * scan(a, b), h_last the final
    column of the scan in float32.
    """
    m, l = a.shape
    chunk = _chunk_for(l)
    mp = -(-m // ROW_BLK) * ROW_BLK
    lp = -(-l // chunk) * chunk
    a_p = _pad_to(a, mp, lp, 1.0)   # identity transition on padding
    b_p = _pad_to(b, mp, lp, 0.0)
    c_p = _pad_to(c, mp, lp, 0.0)

    grid = (mp // ROW_BLK, lp // chunk)
    spec = pl.BlockSpec((ROW_BLK, chunk), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((mp, lp), out_dtype),
                  jax.ShapeDtypeStruct((mp, 1), jnp.float32)]
    out_specs = [spec,
                 pl.BlockSpec((ROW_BLK, 1), lambda i, j: (i, 0),
                              memory_space=pltpu.VMEM)]
    if want_h:
        out_shapes.append(jax.ShapeDtypeStruct((mp, lp), jnp.float32))
        out_specs.append(spec)
    res = pl.pallas_call(
        _gated_kernel(want_h, chunk),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((ROW_BLK, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(a_p, b_p, c_p)
    y, hlast = res[0][:m, :l], res[1][:m, 0]
    if want_h:
        return y, hlast, res[2][:m, :l]
    return y, hlast


@functools.lru_cache(maxsize=None)
def _gated_core2d_for(out_dtype, b_dtype):
    """Build the custom-VJP gated-scan core for one static dtype pair."""

    @jax.custom_vjp
    def core(a2, b2, c2):
        return _gated_2d(a2, b2, c2, out_dtype, want_h=False)

    def fwd(a2, b2, c2):
        y, hlast, h2 = _gated_2d(a2, b2, c2, out_dtype, want_h=True)
        return (y, hlast), (a2, c2, h2)

    def bwd(residuals, cotangents):
        a2, c2, h2 = residuals
        gy, g_hlast = cotangents
        gy = gy.astype(jnp.float32)
        c32 = c2.astype(jnp.float32)
        # y = c * h  ->  dc = gy * h,  dh = gy * c  (+ the h_last cotangent
        # folded into the final timestep).
        dc = (gy * h2).astype(c2.dtype)
        dh = gy * c32
        dh = dh.at[:, -1].add(g_hlast.astype(jnp.float32))
        # Scan adjoint: lam[t] = dh[t] + a[t+1] * lam[t+1] (reverse scan).
        a32 = a2.astype(jnp.float32)
        a_next = jnp.concatenate(
            [a32[:, 1:], jnp.ones_like(a32[:, :1])], axis=1)
        lam = _scan_2d(a_next[:, ::-1], dh[:, ::-1])[:, ::-1]
        h_prev = jnp.concatenate(
            [jnp.zeros_like(h2[:, :1]), h2[:, :-1]], axis=1)
        da = (lam * h_prev).astype(a2.dtype)
        db = lam.astype(b_dtype)
        return da, db, dc

    core.defvjp(fwd, bwd)
    return core


def gated_scan_2d(
    a2: jnp.ndarray,   # (M, L) decay factors, time minor
    b2: jnp.ndarray,   # (M, L) recurrence inputs
    c2: jnp.ndarray,   # (M, L) output gates
    out_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused y = c * scan(a, b) over time-minor 2D rows.

    Returns ``(y, h_last)``; ``h_last`` (float32) is the scan's final state
    per row. Differentiable via the scan-adjoint custom VJP.
    """
    return _gated_core2d_for(jnp.dtype(out_dtype), b2.dtype)(a2, b2, c2)
