from apertis_llm_tpu.parallel.mesh import AXES, create_mesh, single_device_mesh
from apertis_llm_tpu.parallel.pipeline import (
    microbatch,
    pipeline_apply,
    shard_layers_for_pipeline,
)
from apertis_llm_tpu.parallel.sequence import ssm_scan_sequence_parallel
from apertis_llm_tpu.parallel.sharding import (
    batch_specs,
    check_divisibility,
    param_shardings,
    param_specs,
    shard_params,
)

__all__ = [
    "AXES", "create_mesh", "single_device_mesh",
    "param_specs", "param_shardings", "shard_params", "batch_specs",
    "check_divisibility",
    "ssm_scan_sequence_parallel",
    "pipeline_apply", "shard_layers_for_pipeline", "microbatch",
]
