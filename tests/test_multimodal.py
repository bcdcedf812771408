"""Multimodal components: ViT parity is covered in test_parity (via the full
model); here: the standalone data processor, sample images, in-graph
preprocessing, and output_hidden_states/attentions plumbing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from apertis_llm_tpu.config import ApertisConfig
from apertis_llm_tpu.models import apertis as model_lib
from apertis_llm_tpu.models.params import init_params


def test_multimodal_data_processor_forward(tmp_path):
    from apertis_llm_tpu.multimodal import MultimodalDataProcessor
    from apertis_llm_tpu.utils.images import create_sample_image

    proc = MultimodalDataProcessor(
        image_size=32, vision_embed_dim=64, vision_patch_size=8,
        vision_heads=4, vision_layers=2, max_text_length=16)

    img_path = tmp_path / "img.png"
    create_sample_image(str(img_path), size=32)

    sample = proc.process_sample("hello world", image_path=str(img_path))
    assert sample["input_ids"].shape == (1, 16)
    assert sample["pixel_values"].shape == (1, 3, 32, 32)
    # Cache hit returns the same array object.
    again = proc.process_sample("bye", image_path=str(img_path))
    assert again["pixel_values"] is sample["pixel_values"]

    batch = proc.process_batch(
        [{"text": "a", "image_path": str(img_path)},
         {"text": "b", "image_path": str(img_path)}])
    assert batch["pixel_values"].shape == (2, 3, 32, 32)

    out = proc(batch["input_ids"], batch["attention_mask"],
               batch["pixel_values"])
    patches = (32 // 8) ** 2 + 1
    assert out["vision_features"].shape == (2, patches, 64)
    assert out["combined_features"].shape == (2, patches, 64)
    assert np.isfinite(np.asarray(out["combined_features"])).all()


def test_in_graph_image_preprocess():
    from apertis_llm_tpu.models.vit import preprocess_images

    img = np.random.default_rng(0).integers(0, 255, (2, 48, 64, 3)).astype(np.uint8)
    out = preprocess_images(jnp.asarray(img), image_size=32)
    assert out.shape == (2, 3, 32, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_output_hidden_states_and_attentions():
    config = ApertisConfig(vocab_size=64, hidden_size=32, num_hidden_layers=3,
                           num_attention_heads=2, intermediate_size=64,
                           hidden_dropout_prob=0.0,
                           attention_probs_dropout_prob=0.0)
    params = init_params(jax.random.PRNGKey(0), config)
    ids = jnp.asarray(np.random.default_rng(0).integers(4, 64, (2, 8)))
    out = model_lib.forward(params, config, ids,
                            output_hidden_states=True,
                            output_attentions=True)
    assert out.hidden_states.shape == (4, 2, 8, 32)   # L+1 snapshots
    assert out.attentions.shape == (3, 2, 2, 8, 8)
    # attention rows are probability distributions
    sums = np.asarray(jnp.sum(out.attentions, axis=-1))
    np.testing.assert_allclose(sums, 1.0, atol=1e-5)


def test_multimodal_streaming_chat(tmp_path):
    """The examples/multimodal_chat.py path: image + streaming messages API."""
    import json

    from apertis_llm_tpu.inference.interface import ApertisInference
    from apertis_llm_tpu.models.convert import save_torch_checkpoint
    from apertis_llm_tpu.utils.images import create_sample_image

    config = ApertisConfig(vocab_size=32, hidden_size=64, num_hidden_layers=1,
                           num_attention_heads=2, intermediate_size=128,
                           multimodal=True, image_size=32,
                           vision_patch_size=8, vision_embed_dim=64,
                           vision_layers=1, vision_heads=4,
                           hidden_dropout_prob=0.0,
                           attention_probs_dropout_prob=0.0)
    params = init_params(jax.random.PRNGKey(0), config)
    save_torch_checkpoint(params, config, tmp_path, filename="model.pt")
    (tmp_path / "vocab.json").write_text(json.dumps(
        {"<pad>": 0, "<bos>": 1, "<eos>": 2, "<unk>": 3, "hi": 4}))
    img = tmp_path / "img.png"
    create_sample_image(str(img), size=32)

    inf = ApertisInference(model_path=str(tmp_path),
                           vocab_file=str(tmp_path / "vocab.json"),
                           multimodal=True)
    chunks = list(inf.chat(messages=[{"role": "user", "content": "hi"}],
                           image_path=str(img), stream=True,
                           max_new_tokens=3, temperature=0.0))
    assert len(chunks) >= 1
    assert isinstance(chunks[-1], str)


def test_raw_uint8_images_accepted_in_forward():
    config = ApertisConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                           num_attention_heads=2, intermediate_size=64,
                           multimodal=True, image_size=32,
                           vision_patch_size=8, vision_embed_dim=64,
                           vision_layers=1, vision_heads=4,
                           hidden_dropout_prob=0.0,
                           attention_probs_dropout_prob=0.0)
    params = init_params(jax.random.PRNGKey(0), config)
    ids = jnp.asarray([[1, 5, 9]])
    raw = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (1, 48, 40, 3)), jnp.uint8)  # arbitrary size, HWC uint8
    out = model_lib.forward(params, config, ids, pixel_values=raw)
    assert out.logits.shape == (1, 3, 64)
    assert np.isfinite(np.asarray(out.logits)).all()


def test_get_available_devices():
    from apertis_llm_tpu.training.pipeline import (
        get_available_devices, get_available_gpus)

    devices = get_available_devices()
    assert len(devices) >= 1
    assert {"id", "platform", "kind"} <= set(devices[0])
    assert get_available_gpus is get_available_devices
