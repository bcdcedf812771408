"""Measure the MXU rate of int8 dots inside Pallas vs XLA at the MoE decode
shapes, using xplane device timers (wall-clock through the tunnel is
unusable — execution caching + lazy completion).

Cases (all (256, 704) x (704, 2816)-shaped, chained over a 44-layer stack
with fresh activation perturbation per launch):
  xla_int8    jnp dot_general s8xs8->s32 (XLA's native int8 path)
  pl_int8     pallas kernel: the same dot, nothing else
  pl_int8_2   pallas kernel: TWO chained int8 dots (GEMM1 -> narrow -> GEMM2)
  xla_bf16    bf16 dot at the same shapes (rate reference)
"""
import functools
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, S, H, BN = 44, 256, 704, 2816


def _mk(seed, shape, dtype):
    k = jax.random.PRNGKey(seed)
    if dtype == jnp.int8:
        return jax.random.randint(k, shape, -127, 128, jnp.int32).astype(jnp.int8)
    return (jax.random.uniform(k, shape, jnp.float32) * 0.1).astype(dtype)


W8 = jax.jit(lambda: _mk(0, (L, H, BN), jnp.int8))()
W8b = jax.jit(lambda: _mk(1, (L, BN, H), jnp.int8))()
WB = jax.jit(lambda: _mk(2, (L, H, BN), jnp.bfloat16))()
X8 = jax.jit(lambda: _mk(3, (S, H), jnp.int8))()
XB = jax.jit(lambda: _mk(4, (S, H), jnp.bfloat16))()
jax.block_until_ready((W8, W8b, WB, X8, XB))


def _pl_dot_kernel(two, lidx_ref, x_ref, w_ref, wb_ref, o_ref):
    acc = jax.lax.dot_general(x_ref[:], w_ref[0], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    if two:
        hq = (acc >> 8).astype(jnp.int8)
        acc2 = jax.lax.dot_general(hq, wb_ref[0], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        o_ref[:] = acc2.astype(jnp.float32)[:, :H]
    else:
        o_ref[:] = acc.astype(jnp.float32)[:, :H]


def pl_dot(two, lidx, x):
    return pl.pallas_call(
        functools.partial(_pl_dot_kernel, two),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((S, H), lambda ni, li: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H, BN), lambda ni, li: (li[0], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BN, H), lambda ni, li: (li[0], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((S, H), lambda ni, li: (0, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((S, H), jnp.float32),
    )(lidx, x, W8, W8b)


@jax.jit
def run_xla_int8(seed):
    x = (X8 + (seed % 121).astype(jnp.int8)[None, None])

    def body(c, li):
        w = jax.lax.dynamic_index_in_dim(W8, li, 0, keepdims=False)
        acc = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return c + acc[0, 0].astype(jnp.float32), None
    out, _ = jax.lax.scan(body, seed.astype(jnp.float32) * 0,
                          jnp.arange(L, dtype=jnp.int32))
    return out


@jax.jit
def run_xla_bf16(seed):
    x = XB + (seed % 121).astype(jnp.bfloat16)

    def body(c, li):
        w = jax.lax.dynamic_index_in_dim(WB, li, 0, keepdims=False)
        acc = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return c + acc[0, 0], None
    out, _ = jax.lax.scan(body, seed.astype(jnp.float32) * 0,
                          jnp.arange(L, dtype=jnp.int32))
    return out


def make_pl_runner(two):
    @jax.jit
    def run(seed):
        x = (X8 + (seed % 121).astype(jnp.int8)[None, None])

        def body(c, li):
            o = pl_dot(two, li.reshape(1), x)
            return c + o[0, 0], None
        out, _ = jax.lax.scan(body, seed.astype(jnp.float32) * 0,
                              jnp.arange(L, dtype=jnp.int32))
        return out
    return run


CASES = [("xla_int8", run_xla_int8), ("xla_bf16", run_xla_bf16),
         ("pl_int8", make_pl_runner(False)), ("pl_int8_2", make_pl_runner(True))]

for name, fn in CASES:
    jax.block_until_ready(fn(jnp.asarray(999, jnp.int32)))
print(json.dumps({"stage": "compiled"}), flush=True)

jax.profiler.start_trace("/tmp/int8dot_trace")
outs = []
for r in range(8):
    for name, fn in CASES:
        outs.append(fn(jnp.asarray(1 + r, jnp.int32)))
jax.block_until_ready(outs)
jax.profiler.stop_trace()
print(json.dumps({"stage": "traced"}), flush=True)

import collections
import glob
import re

from tensorflow.tsl.profiler.protobuf import xplane_pb2

agg, cnt = collections.Counter(), collections.Counter()
for path in glob.glob("/tmp/int8dot_trace/**/*.xplane.pb", recursive=True):
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        md = plane.event_metadata
        for line in plane.lines:
            for ev in line.events:
                name = md[ev.metadata_id].name
                agg[name] += ev.duration_ps / 1e9
                cnt[name] += 1
for name, ms in agg.most_common(24):
    print(f"{ms:9.2f} ms x{cnt[name]:5d}  {name[:140]}", flush=True)
