"""Per-tile decomposition of the fat MoE kernel via per-variant xplane
traces (each variant gets its own trace dir so closed_call names can't
merge). Grid = EI/bn tiles over the real layer-stacked shapes, so tile DMA
double-buffers exactly like production.

Variants: g1 (GEMM1 only), g2 (GEMM2 only), g12 (both), full (production
epilogue), g1_bf16 (GEMM1 with bf16 weights — rate control).
Env: MTP_BN (default 1408), MTP_S (default 256).
"""
import collections
import functools
import glob
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, H, E, I = 44, 704, 8, 2816
S = int(os.environ.get("MTP_S", "256"))
BN = int(os.environ.get("MTP_BN", "1408"))
EI = E * I


def _mk(seed, shape, dtype):
    k = jax.random.PRNGKey(seed)
    if dtype == jnp.int8:
        return jax.random.randint(k, shape, -127, 128, jnp.int32).astype(jnp.int8)
    return (jax.random.uniform(k, shape, jnp.float32) * 0.01).astype(dtype)


DATA = {
    "w1q": jax.jit(lambda: _mk(0, (L, H, EI), jnp.int8))(),
    "w2q": jax.jit(lambda: _mk(1, (L, EI, H), jnp.int8))(),
    "w1b": jax.jit(lambda: _mk(8, (L, H, EI), jnp.bfloat16))(),
    "w1s": jax.jit(lambda: _mk(2, (L, 1, EI), jnp.float32))(),
    "b1": jax.jit(lambda: _mk(3, (L, 1, EI), jnp.float32))(),
    "w2s": jax.jit(lambda: _mk(4, (L, 1, H), jnp.float32))(),
    "xq": jax.jit(lambda: _mk(5, (S, H), jnp.int8))(),
    "xb": jax.jit(lambda: _mk(9, (S, H), jnp.bfloat16))(),
    "xs": jax.jit(lambda: _mk(6, (S, 1), jnp.float32))(),
    "comb": jax.jit(lambda: _mk(7, (S, E), jnp.float32))(),
}
jax.block_until_ready(DATA)


def _kern(variant, tpe, lidx_ref, xq_ref, xs_ref, comb_ref, w1_ref, w1s_ref,
          b1_ref, w2q_ref, w2s_ref, out_ref, acc_ref):
    ni = pl.program_id(0)

    @pl.when(ni == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if variant == "g1":
        acc1 = jax.lax.dot_general(
            xq_ref[:], w1_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc_ref[:] += acc1[:, :H].astype(jnp.float32)
    elif variant == "g1_bf16":
        acc1 = jax.lax.dot_general(
            xq_ref[:].astype(jnp.bfloat16), w1_ref[0],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc_ref[:] += acc1[:, :H]
    elif variant == "g2":
        # reuse xq broadcast as a fake (S, BN) int8 operand tile
        fake = jnp.concatenate([xq_ref[:]] * (BN // H), axis=1)[:, :BN]
        acc2 = jax.lax.dot_general(
            fake.astype(jnp.int8), w2q_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc_ref[:] += acc2.astype(jnp.float32)
    elif variant == "g12":
        acc1 = jax.lax.dot_general(
            xq_ref[:], w1_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        hq = (acc1 >> 8).astype(jnp.int8)
        acc2 = jax.lax.dot_general(
            hq, w2q_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc_ref[:] += acc2.astype(jnp.float32)
    else:  # full production epilogue
        acc1 = jax.lax.dot_general(
            xq_ref[:], w1_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        h = acc1.astype(jnp.float32) * xs_ref[:] * w1s_ref[0] + b1_ref[0]
        h = 0.5 * h * (1.0 + jnp.tanh(0.7978845608 * (h + 0.044715 * h**3)))
        e_idx = ni // (I // BN)
        lane = jax.lax.broadcasted_iota(jnp.int32, comb_ref.shape, 1)
        col = jnp.sum(jnp.where(lane == e_idx, comb_ref[:], 0.0), axis=1,
                      keepdims=True)
        h = h * col
        absmax = jnp.max(jnp.abs(h), axis=1, keepdims=True)
        hs = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
        hq = jnp.clip(jnp.round(h / hs), -127, 127).astype(jnp.int8)
        acc2 = jax.lax.dot_general(
            hq, w2q_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc_ref[:] += acc2.astype(jnp.float32) * hs

    @pl.when(ni == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def make(variant):
    w1key = "w1b" if variant == "g1_bf16" else "w1q"

    def call(lidx, d):
        return pl.pallas_call(
            functools.partial(_kern, variant, I // BN),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(EI // BN,),
                in_specs=[
                    pl.BlockSpec((S, H), lambda ni, li: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((S, 1), lambda ni, li: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((S, E), lambda ni, li: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, H, BN), lambda ni, li: (li[0], 0, ni),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, BN), lambda ni, li: (li[0], 0, ni),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, BN), lambda ni, li: (li[0], 0, ni),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, BN, H), lambda ni, li: (li[0], ni, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, H), lambda ni, li: (li[0], 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((S, H), lambda ni, li: (0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((S, H), jnp.float32)]),
            out_shape=jax.ShapeDtypeStruct((S, H), jnp.float32),
        )(lidx, d["xq"], d["xs"], d["comb"], d[w1key], d["w1s"], d["b1"],
          d["w2q"], d["w2s"])

    @jax.jit
    def run(seed, d):
        d = dict(d)
        d["xq"] = d["xq"] + (seed % 121).astype(jnp.int8)[None, None]

        def body(c, li):
            o = call(li.reshape(1), d)
            return c + o[0, 0], None
        out, _ = jax.lax.scan(body, seed.astype(jnp.float32) * 0,
                              jnp.arange(L, dtype=jnp.int32))
        return out
    return run


def device_ms(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    agg = collections.Counter()
    cnt = collections.Counter()
    for path in glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True):
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(path, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            md = plane.event_metadata
            for line in plane.lines:
                for ev in line.events:
                    name = md[ev.metadata_id].name
                    if "closed_call" in name or "pallas" in name:
                        agg[name] += ev.duration_ps / 1e9
                        cnt[name] += 1
    return agg, cnt


REPS = 6
for variant in os.environ.get(
        "MTP_VARIANTS", "g1,g1_bf16,g2,g12,full").split(","):
    fn = make(variant)
    jax.block_until_ready(fn(jnp.asarray(999, jnp.int32), DATA))
    tdir = f"/tmp/mtp_{variant}"
    jax.profiler.start_trace(tdir)
    outs = [fn(jnp.asarray(1 + r, jnp.int32), DATA) for r in range(REPS)]
    jax.block_until_ready(outs)
    jax.profiler.stop_trace()
    agg, cnt = device_ms(tdir)
    for name, ms in agg.most_common(2):
        calls = cnt[name]
        print(json.dumps({
            "variant": variant, "bn": BN,
            "per_layer_us": round(ms / calls * 1e3, 2),
            "calls": calls}), flush=True)
