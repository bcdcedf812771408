from apertis_llm_tpu.inference.engine import GenerationParams, InferenceEngine
from apertis_llm_tpu.inference.interface import ApertisInference, ApertisInterface

__all__ = ["InferenceEngine", "GenerationParams", "ApertisInterface",
           "ApertisInference"]
