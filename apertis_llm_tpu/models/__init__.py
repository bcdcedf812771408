from apertis_llm_tpu.models.apertis import (
    LMOutput,
    PrefillOutput,
    cross_entropy_loss,
    decode_step,
    forward,
    init_cache,
    prefill,
)
from apertis_llm_tpu.models.convert import (
    from_torch_state_dict,
    infer_config_from_state_dict,
    load_pretrained,
    save_torch_checkpoint,
    to_torch_state_dict,
)
from apertis_llm_tpu.models.factory import (
    build_model_config,
    calculate_model_dimensions,
    estimate_model_parameters,
    parse_param_count,
)
from apertis_llm_tpu.models.params import count_params, init_params

__all__ = [
    "forward", "prefill", "decode_step", "init_cache", "cross_entropy_loss",
    "LMOutput", "PrefillOutput", "init_params", "count_params",
    "load_pretrained", "save_torch_checkpoint", "from_torch_state_dict",
    "to_torch_state_dict", "infer_config_from_state_dict",
    "build_model_config", "calculate_model_dimensions",
    "estimate_model_parameters", "parse_param_count",
]
