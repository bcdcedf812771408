"""Decode-step traffic probe for the standard-MHA family.

Round-4 diagnosis of the 849 tok/s (75.4 ms/step, b64, 256-slot cache)
MHA serving row: compiles ONE ``model_lib.decode_step`` at scaled-down
MHA shapes on CPU and prints XLA's bytes-accessed cost analysis next to
the analytic floor (cache read + weight read + new-KV write). The
structural suspect: the layer scan carries the stacked (nl, B, H, L, Dh)
KV cache as scan xs and re-stacks the updated per-layer caches as scan
ys, so every decode step REWRITES the entire cache allocation (and any
unfused copy multiplies it further) even though only (nl, B, H, 1, Dh)
of new K/V is produced per token.

Usage: python tools/mha_probe.py [nl B heads Lcache head_dim]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from apertis_llm_tpu.config import ApertisConfig
from apertis_llm_tpu.models import apertis as model_lib
from apertis_llm_tpu.models.params import init_params


def main():
    args = [int(a) for a in sys.argv[1:]] or []
    nl, b, heads, lcache, hd = (args + [8, 8, 8, 128, 64])[:5]
    hidden = heads * hd
    config = ApertisConfig(
        vocab_size=1024, hidden_size=hidden, num_hidden_layers=nl,
        num_attention_heads=heads, intermediate_size=hidden * 4,
        attention_type="standard_mha", multimodal=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        max_position_embeddings=max(lcache, 512), dtype="bfloat16",
        param_dtype="bfloat16")
    params = jax.jit(lambda r: init_params(r, config))(jax.random.PRNGKey(0))
    cache = model_lib.init_cache(config, b, max_length=lcache)

    tok = jnp.zeros((b,), jnp.int32)
    t = jnp.asarray(lcache // 2, jnp.int32)
    mask = jnp.ones((b, lcache), jnp.int32)
    pos = jnp.full((b,), lcache // 2, jnp.int32)

    def step(params, cache, tok, t, mask, pos):
        return model_lib.decode_step(params, config, cache, tok, t,
                                     attn_mask_row=mask, positions=pos)

    lowered = jax.jit(step, donate_argnums=(1,)).lower(
        params, cache, tok, t, mask, pos)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    cache_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(cache))
    w_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    newkv_bytes = nl * b * heads * hd * 2 * 2
    accessed = ca.get("bytes accessed", float("nan"))
    print(f"shapes: nl={nl} b={b} heads={heads} lcache={lcache} hd={hd}")
    print(f"cache bytes        : {cache_bytes/1e6:10.2f} MB")
    print(f"weight bytes       : {w_bytes/1e6:10.2f} MB")
    print(f"new-KV bytes/step  : {newkv_bytes/1e6:10.2f} MB")
    print(f"floor (cache+w+new): {(cache_bytes + w_bytes + newkv_bytes)/1e6:10.2f} MB")
    print(f"XLA bytes accessed : {accessed/1e6:10.2f} MB "
          f"({accessed / (cache_bytes + w_bytes + newkv_bytes):.2f}x floor)")
    for k in sorted(ca):
        if "bytes" in k and "accessed" in k and k != "bytes accessed":
            v = ca[k]
            if v > cache_bytes / 10:
                print(f"  {k}: {v/1e6:.2f} MB")


if __name__ == "__main__":
    main()
