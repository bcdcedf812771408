"""Standalone text+image batch preprocessor.

Functional port of the reference MultimodalDataProcessor (reference:
src/multimodal/module.py:164-410): owns a ViT encoder + cross-modal
projection head, processes (text, image) samples with an image cache, and
returns the combined feature dict. Used by datasets/examples rather than the
main training path (same role as in the reference).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from apertis_llm_tpu.config import ApertisConfig
from apertis_llm_tpu.models.params import _linear, init_vision_params
from apertis_llm_tpu.models.vit import _vit_layer, vit_encode
from apertis_llm_tpu.ops.norms import layer_norm
from apertis_llm_tpu.utils.images import load_image


class MultimodalDataProcessor:
    def __init__(
        self,
        image_size: int = 224,
        max_text_length: int = 512,
        vision_embed_dim: int = 768,
        vision_patch_size: int = 16,
        vision_heads: int = 12,
        vision_layers: int = 12,
        use_cache: bool = True,
        rng: Optional[jax.Array] = None,
    ):
        self.image_size = image_size
        self.max_text_length = max_text_length
        self.vision_embed_dim = vision_embed_dim
        self.vision_heads = vision_heads
        self.image_cache: Optional[Dict[str, np.ndarray]] = {} if use_cache else None

        self.config = ApertisConfig(
            image_size=image_size, vision_embed_dim=vision_embed_dim,
            vision_patch_size=vision_patch_size, vision_heads=vision_heads,
            vision_layers=vision_layers, multimodal=True)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        r1, r2, r3 = jax.random.split(rng, 3)
        dv = vision_embed_dim
        self.params = {
            "encoder": init_vision_params(r1, self.config, jnp.float32),
            # Cross-modal fusion layer (one pre-norm transformer block).
            "cross_modal": {
                "ln1": {"w": jnp.ones((dv,)), "b": jnp.zeros((dv,))},
                "in_proj_w": jax.random.normal(r2, (dv, 3 * dv)) * 0.02,
                "in_proj_b": jnp.zeros((3 * dv,)),
                "attn_out": _linear(r2, dv, dv, 0.02, True, jnp.float32),
                "ln2": {"w": jnp.ones((dv,)), "b": jnp.zeros((dv,))},
                "linear1": _linear(r2, dv, 4 * dv, 0.02, True, jnp.float32),
                "linear2": _linear(r3, 4 * dv, dv, 0.02, True, jnp.float32),
            },
            "output_projection": _linear(r3, dv, dv, 0.02, True, jnp.float32),
            "output_norm": {"w": jnp.ones((dv,)), "b": jnp.zeros((dv,))},
        }

    # -- in-graph forward ----------------------------------------------
    def __call__(self, input_ids, attention_mask, pixel_values) -> Dict[str, Any]:
        vision_features = vit_encode(
            self.params["encoder"], self.config, jnp.asarray(pixel_values))
        # _vit_layer runs L-first (models/vit.py); transpose in and out.
        fused = _vit_layer(vision_features.transpose(1, 0, 2),
                           self.params["cross_modal"], 8).transpose(1, 0, 2)
        proj = fused @ self.params["output_projection"]["w"] + \
            self.params["output_projection"]["b"]
        combined = layer_norm(proj, self.params["output_norm"]["w"],
                              self.params["output_norm"]["b"], eps=1e-5)
        return {
            "input_ids": input_ids,
            "attention_mask": attention_mask,
            "vision_features": vision_features,
            "combined_features": combined,
        }

    forward = __call__

    # -- host-side helpers ---------------------------------------------
    def _image(self, image_path: str) -> np.ndarray:
        if self.image_cache is not None and image_path in self.image_cache:
            return self.image_cache[image_path]
        arr = load_image(image_path, self.image_size)
        if self.image_cache is not None:
            self.image_cache[image_path] = arr
        return arr

    def process_sample(
        self,
        text: str,
        image_path: Optional[str] = None,
        tokenizer: Any = None,
        raw_image: Optional[np.ndarray] = None,
    ) -> Dict[str, np.ndarray]:
        if tokenizer is not None:
            if hasattr(tokenizer, "__call__") and hasattr(tokenizer, "pad_token_id"):
                enc = tokenizer(text, truncation=True, padding="max_length",
                                max_length=self.max_text_length)
                ids = np.asarray([enc["input_ids"]], np.int32)
                mask = np.asarray([enc["attention_mask"]], np.int32)
            else:
                raw = tokenizer.encode(text)[: self.max_text_length]
                pad = self.max_text_length - len(raw)
                ids = np.asarray([raw + [0] * pad], np.int32)
                mask = np.asarray([[1] * len(raw) + [0] * pad], np.int32)
        else:
            words = text.split()[: self.max_text_length]
            ids = np.asarray([[hash(w) % 30000 + 4 for w in words]
                              + [0] * (self.max_text_length - len(words))], np.int32)
            mask = (ids != 0).astype(np.int32)

        out = {"input_ids": ids, "attention_mask": mask}
        if raw_image is not None:
            out["pixel_values"] = np.asarray(raw_image, np.float32)
        elif image_path is not None:
            out["pixel_values"] = self._image(image_path)
        return out

    def process_batch(self, samples: List[Dict[str, Any]],
                      tokenizer: Any = None) -> Dict[str, np.ndarray]:
        processed = [self.process_sample(s.get("text", ""),
                                         s.get("image_path"), tokenizer,
                                         s.get("raw_image")) for s in samples]
        keys = set().union(*(p.keys() for p in processed))
        batch = {}
        for key in keys:
            rows = [p[key] for p in processed if key in p]
            if len(rows) == len(processed):
                batch[key] = np.concatenate(rows, axis=0)
        return batch
