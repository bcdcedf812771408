from apertis_llm_tpu.ops.activations import get_activation
from apertis_llm_tpu.ops.attention import decode_attention, mha
from apertis_llm_tpu.ops.norms import layer_norm, rms_norm
from apertis_llm_tpu.ops.rope import apply_rope, rope_tables
from apertis_llm_tpu.ops.sampling import sample_token
from apertis_llm_tpu.ops.ssm import (
    depthwise_causal_conv,
    depthwise_conv_step,
    selective_scan,
    selective_scan_step,
)

__all__ = [
    "mha", "decode_attention", "layer_norm", "rms_norm", "apply_rope",
    "rope_tables", "sample_token", "selective_scan", "selective_scan_step",
    "depthwise_causal_conv", "depthwise_conv_step", "get_activation",
]
