"""Roofline decomposition of the fused fat MoE decode kernel.

Chains the kernel over the 44-layer stacked expert weights exactly like the
decode scan (scalar-prefetched layer index) and times variants that strip
parts of the work, so the per-layer cost decomposes into weight-stream
(DMA), GEMM, and VPU-epilogue components:

  full       the production kernel (ops/pallas/moe_ffn.expert_ffn_fat)
  gemm2skip  GEMM1 + epilogue, GEMM2 replaced by a copy (no second dot)
  gemm_only  both GEMMs, no activation/combine/requant (raw int8 dot rate)
  dma_only   weights streamed, one cheap reduction per tile (pure BW)

Shapes default to the 1.5B-MoE flagship (L=44, H=704, E=8, I=2816, S=256).
Env: MKB_VARIANTS=comma list, MKB_BN tile size, MKB_S rows.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, H, E, I, S = 44, 704, 8, 2816, int(os.environ.get("MKB_S", "256"))
BN = int(os.environ.get("MKB_BN", "2816"))
EI = E * I

# Generate ON DEVICE: materialising the ~1.4 GB weight stacks on the host
# and shipping them through this environment's tunnel takes tens of
# minutes; jax.random on-chip is instant.
def _mk(seed, shape, dtype):
    k = jax.random.PRNGKey(seed)
    if dtype == jnp.int8:
        return jax.random.randint(k, shape, -127, 128, jnp.int32).astype(jnp.int8)
    return jax.random.uniform(k, shape, jnp.float32) * 0.01


# The stacks are passed as jit ARGUMENTS everywhere below: closing over
# them embeds them as HLO constants and the compile request ships ~1.4 GB
# of literals through the tunnel (measured: >30 min, then a broken pipe).
DATA = {
    "w1q": jax.jit(lambda: _mk(0, (L, H, EI), jnp.int8))(),
    "w2q": jax.jit(lambda: _mk(1, (L, EI, H), jnp.int8))(),
    "w1s": jax.jit(lambda: _mk(2, (L, 1, EI), jnp.float32))(),
    "b1": jax.jit(lambda: _mk(3, (L, 1, EI), jnp.float32))(),
    "w2s": jax.jit(lambda: _mk(4, (L, 1, H), jnp.float32))(),
    "xq": jax.jit(lambda: _mk(5, (S, H), jnp.int8))(),
    "xs": jax.jit(lambda: _mk(6, (S, 1), jnp.float32))(),
    "comb": jax.jit(lambda: _mk(7, (S, E), jnp.float32))(),
}
jax.block_until_ready(DATA)
print(json.dumps({"stage": "data_ready"}), flush=True)


def _variant_kernel(variant, tiles_per_expert,
                    lidx_ref, xq_ref, xs_ref, comb_ref, w1q_ref, w1s_ref,
                    b1_ref, w2q_ref, w2s_ref, out_ref, acc_ref):
    ni = pl.program_id(0)

    @pl.when(ni == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if variant == "dma_only":
        # Touch both weight tiles with a trivial reduction; no GEMMs.
        acc_ref[:] += (
            jnp.sum(w1q_ref[0].astype(jnp.float32)) / EI
            + jnp.sum(w2q_ref[0].astype(jnp.float32)) / EI)
    elif variant == "gemm_only":
        acc1 = jax.lax.dot_general(
            xq_ref[:], w1q_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        hq = (acc1 >> 8).astype(jnp.int8)   # cheap narrowing, no VPU passes
        acc2 = jax.lax.dot_general(
            hq, w2q_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc_ref[:] += acc2.astype(jnp.float32)
    else:  # full epilogue, optionally skipping GEMM2
        xqv = xq_ref[:]
        acc1 = jax.lax.dot_general(
            xqv, w1q_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        h = acc1.astype(jnp.float32) * xs_ref[:] * w1s_ref[0] + b1_ref[0]
        h = 0.5 * h * (1.0 + jnp.tanh(0.7978845608 * (h + 0.044715 * h**3)))
        e_idx = ni // tiles_per_expert
        lane = jax.lax.broadcasted_iota(jnp.int32, comb_ref.shape, 1)
        col = jnp.sum(jnp.where(lane == e_idx, comb_ref[:], 0.0), axis=1,
                      keepdims=True)
        h = h * col
        absmax = jnp.max(jnp.abs(h), axis=1, keepdims=True)
        hs = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
        hq = jnp.clip(jnp.round(h / hs), -127, 127).astype(jnp.int8)
        if variant == "gemm2skip":
            acc_ref[:] += jnp.sum(hq.astype(jnp.float32), axis=1,
                                  keepdims=True) * hs
        else:
            acc2 = jax.lax.dot_general(
                hq, w2q_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc_ref[:] += acc2.astype(jnp.float32) * hs

    @pl.when(ni == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = (acc_ref[:] * w2s_ref[0]).astype(out_ref.dtype)


def make_variant(variant, bn):
    tiles_per_expert = max(I // bn, 1)

    def call(lidx, d):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(EI // bn,),
            in_specs=[
                pl.BlockSpec((S, H), lambda ni, li: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S, 1), lambda ni, li: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S, E), lambda ni, li: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H, bn), lambda ni, li: (li[0], 0, ni),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bn), lambda ni, li: (li[0], 0, ni),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bn), lambda ni, li: (li[0], 0, ni),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn, H), lambda ni, li: (li[0], ni, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, H), lambda ni, li: (li[0], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((S, H), lambda ni, li: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((S, H), jnp.float32)],
        )
        return pl.pallas_call(
            functools.partial(_variant_kernel, variant, tiles_per_expert),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((S, H), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(lidx, d["xq"], d["xs"], d["comb"], d["w1q"], d["w1s"], d["b1"],
          d["w2q"], d["w2s"])

    def chained(seed, d):
        # Perturb the activations with the seed so every LAUNCH is unique:
        # the tunnel's execution layer memoizes identical calls (memory
        # note axon-tpu-tunnel-quirks) — the first version of this bench
        # "measured" 0.7 us/layer for a 31.7 MB weight stream.
        d = dict(d)
        d["xq"] = (d["xq"] + (seed % 121).astype(jnp.int8)[None, None])
        def body(carry, li):
            y = call(li.reshape(1), d)
            return carry + y.astype(jnp.float32)[0, 0], None
        out, _ = jax.lax.scan(body, seed.astype(jnp.float32) * 0,
                              jnp.arange(L, dtype=jnp.int32))
        return out

    return jax.jit(chained)


def production(seed, d):
    from apertis_llm_tpu.ops.pallas.moe_ffn import expert_ffn_fat

    xq = (d["xq"] + (seed % 121).astype(jnp.int8)[None, None])

    def body(carry, li):
        y = expert_ffn_fat(xq, d["xs"], d["comb"], d["w1q"], d["w1s"],
                           d["b1"][:, 0, :], d["w2q"], d["w2s"],
                           E, layer_idx=li, block_n=BN)
        return carry + y.astype(jnp.float32)[0, 0], None
    out, _ = jax.lax.scan(body, seed.astype(jnp.float32) * 0,
                          jnp.arange(L, dtype=jnp.int32))
    return out


def time_fn(fn, tag):
    jax.block_until_ready(fn(jnp.asarray(10**6, jnp.int32), DATA))  # compile
    reps = 20
    ts = []
    for r in range(5):
        seeds = [jnp.asarray(10 * r + 17 * i + 1, jnp.int32)
                 for i in range(reps)]
        t0 = time.perf_counter()
        outs = [fn(sd, DATA) for sd in seeds]
        jax.block_until_ready(outs)
        ts.append((time.perf_counter() - t0) / reps)
    ts.sort()
    per_layer_us = ts[len(ts) // 2] / L * 1e6
    print(json.dumps({"variant": tag, "bn": BN, "S": S,
                      "per_layer_us": round(per_layer_us, 1),
                      "ms_per_call": round(ts[len(ts) // 2] * 1e3, 3)}),
          flush=True)


variants = os.environ.get(
    "MKB_VARIANTS", "production,full,gemm_only,gemm2skip,dma_only").split(",")
for v in variants:
    if v == "production":
        time_fn(jax.jit(production), "production")
    else:
        time_fn(make_variant(v, BN), v)
