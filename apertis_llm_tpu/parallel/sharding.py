"""Sharding rules: param-tree paths -> PartitionSpecs.

Megatron-style tensor parallelism expressed declaratively: column-parallel
projections shard their OUTPUT feature dim on ``model``; row-parallel
projections shard their INPUT dim (XLA inserts the reduce). The stacked layer
axis (leading dim of every per-layer tensor) is never sharded here — it is
the natural pipeline axis for a later shard_map pipeline schedule.

MoE experts shard on ``expert``; batch shards on ``data``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from apertis_llm_tpu.config import ApertisConfig

# Rules match path *suffixes* (joined with '/'), most specific first.
# None entries in a spec mean replicated on that dim. Specs here EXCLUDE the
# stacked-layer leading dim; it is prepended automatically for layer params.
_LAYER_RULES = [
    # attention (MHA): q/k/v column-parallel, o row-parallel
    ("attn/q/w", P(None, "model")),
    ("attn/k/w", P(None, "model")),
    ("attn/v/w", P(None, "model")),
    ("attn/q/b", P("model")),
    ("attn/k/b", P("model")),
    ("attn/v/b", P("model")),
    ("attn/o/w", P("model", None)),
    ("attn/o/b", P(None)),
    # attention (selective SSM): inner channels (= heads * d_state) on model
    ("attn/in_proj_x/w", P(None, "model")),
    ("attn/in_proj_z/w", P(None, "model")),
    ("attn/conv/w", P("model", None)),
    ("attn/conv/b", P("model")),
    ("attn/x_param_proj/w", P("model", None)),
    ("attn/dt_proj/w", P(None)),
    ("attn/dt_proj/b", P(None)),
    ("attn/A_log", P("model", None)),
    ("attn/D", P("model")),
    ("attn/out_proj/w", P("model", None)),
    # dense FFN / SwiGLU
    ("ffn/w1/w", P(None, "model")),
    ("ffn/w1/b", P("model")),
    ("ffn/w2/w", P("model", None)),
    ("ffn/w2/b", P(None)),
    ("ffn/w_gate/w", P(None, "model")),
    ("ffn/w_up/w", P(None, "model")),
    ("ffn/w_down/w", P("model", None)),
    # MoE: experts on the expert axis, expert-internal dims on model
    ("ffn/experts/ln_w", P("expert", None)),
    ("ffn/experts/ln_b", P("expert", None)),
    ("ffn/experts/w1", P("expert", None, "model")),
    ("ffn/experts/b1", P("expert", "model")),
    ("ffn/experts/w2", P("expert", "model", None)),
    ("ffn/experts/b2", P("expert", None)),
    ("ffn/router/w", P(None)),
    ("ffn/router/b", P(None)),
]

_TOP_RULES = [
    ("embed/tok", P("model", None)),       # vocab-sharded embeddings/LM head
    ("abs_pos/emb", P(None, None)),
    ("lm_head/w", P(None, "model")),
]


def _spec_for(path: str, ndim: int, in_layers: bool) -> P:
    # Quantized leaves (models/quantize.py) inherit the base weight's spec:
    # w_q is shaped like w; the w_s scale keeps the weight's output-channel
    # sharding but its contraction axis (-2) has size 1 and must stay
    # replicated.
    is_scale = False
    if path.endswith("_q"):
        path = path[:-2]
    elif path.endswith("_s"):
        path, is_scale = path[:-2], True
    rules = _LAYER_RULES if in_layers else _TOP_RULES
    for suffix, spec in rules:
        if path.endswith(suffix):
            parts = tuple(spec)
            if in_layers:
                parts = (None,) + parts  # stacked-layer leading dim
            parts = parts + (None,) * (ndim - len(parts))
            parts = parts[:ndim]
            if is_scale and ndim >= 2:
                parts = parts[:-2] + (None,) + parts[-1:]
            return P(*parts)
    return P(*([None] * ndim))


def param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree matching the param tree."""

    def walk(tree, prefix):
        if isinstance(tree, dict):
            return {k: walk(v, f"{prefix}/{k}" if prefix else k)
                    for k, v in tree.items()}
        in_layers = prefix.startswith("layers/")
        return _spec_for(prefix, tree.ndim, in_layers)

    return walk(params, "")


def param_shardings(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), param_specs(params),
        is_leaf=lambda x: isinstance(x, P))


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a param tree onto the mesh according to the rules."""
    return jax.device_put(params, param_shardings(params, mesh))


def batch_specs() -> P:
    """Inputs shard their batch dim over data."""
    return P("data")


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def check_divisibility(config: ApertisConfig, mesh: Mesh) -> None:
    """Fail fast on shapes that cannot shard evenly over the mesh."""
    model = mesh.shape["model"]
    expert = mesh.shape["expert"]
    if config.hidden_size % model:
        raise ValueError(
            f"hidden_size {config.hidden_size} not divisible by model axis {model}")
    if config.attention_type == "selective_ssm":
        if config.num_attention_heads % model:
            raise ValueError(
                f"SSM heads {config.num_attention_heads} not divisible by model axis {model}")
    if config.use_expert_system and config.num_experts and config.num_experts % expert:
        raise ValueError(
            f"num_experts {config.num_experts} not divisible by expert axis {expert}")
