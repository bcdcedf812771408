"""Prefill-shape GEMM rate microbench: bf16 vs weight-only dequant vs
dyn-int8(XLA) vs dyn-int8(fused Pallas) at the flagship's FFN shapes.

Chain: x(M,H) -> up(M,I) -> down(M,H), repeated DEPTH times so the weight
reads amortize like prefill does. Fresh input per timed run (tunnel caches
identical calls)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from apertis_llm_tpu.models.quantize import quantize_weight
from apertis_llm_tpu.ops.pallas.quant_matmul import (
    quant_matmul_dyn_xla, quant_matmul_dyn_fused)

M, H, I, DEPTH = 58624, 2432, 9728, 10
flops = DEPTH * 2 * 2 * M * H * I

rng = np.random.default_rng(0)
w_up = jnp.asarray(rng.standard_normal((H, I)) * 0.02, jnp.bfloat16)
w_dn = jnp.asarray(rng.standard_normal((I, H)) * 0.02, jnp.bfloat16)
uq, us = quantize_weight(w_up.astype(jnp.float32))
dq, ds = quantize_weight(w_dn.astype(jnp.float32))
uq, us, dq, ds = map(jax.device_put, (uq, us, dq, ds))


def mk(fn_up, fn_dn):
    def run(x):
        for _ in range(DEPTH):
            h = jax.nn.gelu(fn_up(x))
            x = fn_dn(h).astype(jnp.bfloat16) + x
        return x
    return jax.jit(run)


chains = {
    "bf16": mk(lambda x: x @ w_up, lambda h: h @ w_dn),
    "weightonly": mk(lambda x: x @ (uq.astype(jnp.bfloat16) * us.astype(jnp.bfloat16)),
                     lambda h: h @ (dq.astype(jnp.bfloat16) * ds.astype(jnp.bfloat16))),
    "dyn_xla": mk(lambda x: quant_matmul_dyn_xla(x, uq, us),
                  lambda h: quant_matmul_dyn_xla(h, dq, ds)),
    "dyn_fused": mk(lambda x: quant_matmul_dyn_fused(x, uq, us),
                    lambda h: quant_matmul_dyn_fused(h, dq, ds)),
}

xs = [jnp.asarray(rng.standard_normal((M, H)) * 0.1, jnp.bfloat16) for _ in range(4)]
xs = [jax.device_put(x) for x in xs]

for name, fn in chains.items():
    fn(xs[0]).block_until_ready()  # compile
    ts = []
    for i, x in enumerate(xs):
        t0 = time.perf_counter()
        fn(x).block_until_ready()
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[len(ts) // 2]
    print(f"{name:11s}: {t*1e3:7.1f} ms median -> {flops/t/1e12:6.1f} TFLOP/s "
          f"(runs {[f'{x*1e3:.0f}' for x in ts]})", flush=True)
