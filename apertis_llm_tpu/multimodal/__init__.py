"""Multimodal package: ViT encoder, data processor, sample-image helper
(reference: src/multimodal/module.py)."""

from apertis_llm_tpu.models.vit import preprocess_images, vit_encode
from apertis_llm_tpu.multimodal.processor import MultimodalDataProcessor
from apertis_llm_tpu.utils.images import (
    create_sample_image,
    load_image,
    load_image_batch,
)

__all__ = [
    "vit_encode", "preprocess_images", "MultimodalDataProcessor",
    "create_sample_image", "load_image", "load_image_batch",
]
