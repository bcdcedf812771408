"""Host-side image loading (PIL) -> model-ready pixel tensors.

Matches torchvision's Resize -> ToTensor -> Normalize(ImageNet) pipeline used
by the reference (interface.py:457-471, multimodal/module.py:27-31). Errors
fall back to a blank image, preserving the reference's graceful-degradation
behaviour (module.py:139-142).
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_image(image_path: str, image_size: int = 224) -> np.ndarray:
    """Load + resize + normalise one image -> (1, 3, S, S) float32."""
    try:
        from PIL import Image

        img = Image.open(image_path).convert("RGB")
        img = img.resize((image_size, image_size), Image.BILINEAR)
        arr = np.asarray(img, np.float32) / 255.0           # (S, S, 3)
        arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
        return arr.transpose(2, 0, 1)[None]                  # (1, 3, S, S)
    except Exception as e:
        logger.error("Error preprocessing image %s: %s", image_path, e)
        return np.zeros((1, 3, image_size, image_size), np.float32)


def load_image_batch(paths, image_size: int = 224) -> np.ndarray:
    return np.concatenate([load_image(p, image_size) for p in paths], axis=0)


def create_sample_image(path: Optional[str] = None, size: int = 224) -> np.ndarray:
    """Gradient test image (reference: multimodal/module.py:413-436)."""
    x = np.linspace(0, 1, size, dtype=np.float32)
    r = np.tile(x, (size, 1))
    g = r.T
    b = 0.5 * np.ones((size, size), np.float32)
    img = np.stack([r, g, b], axis=-1)
    if path is not None:
        from PIL import Image

        Image.fromarray((img * 255).astype(np.uint8)).save(path)
    return img
