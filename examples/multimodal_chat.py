#!/usr/bin/env python3
"""Multimodal Chat Example.

Image + text chat through :class:`ApertisInference` (reference:
examples/multimodal_chat.py). Type ``image <path>`` to attach an image to the
next message; a gradient sample image is generated if you have none.
"""

import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from apertis_llm_tpu.inference.interface import ApertisInference
from apertis_llm_tpu.utils.images import create_sample_image


def ensure_test_model(model_path: str, vocab_file: str) -> None:
    if not os.path.exists(model_path):
        print("Test model not found. Creating a small multimodal test model...")
        os.makedirs(os.path.dirname(model_path), exist_ok=True)
        import jax

        from apertis_llm_tpu.models.convert import save_torch_checkpoint
        from apertis_llm_tpu.models.factory import build_model_config
        from apertis_llm_tpu.models.params import init_params

        config = build_model_config(
            "10M", vocab_size_override=32000, multimodal=True,
            config_overrides={"hidden_size": 256, "num_hidden_layers": 4,
                              "num_attention_heads": 4,
                              "intermediate_size": 512,
                              "vision_layers": 2, "vision_heads": 4,
                              "vision_embed_dim": 128, "image_size": 64,
                              "vision_patch_size": 16})
        params = init_params(jax.random.PRNGKey(0), config)
        save_torch_checkpoint(params, config, os.path.dirname(model_path),
                              filename=os.path.basename(model_path))
        print(f"Test model created at {model_path}")

    if not os.path.exists(vocab_file):
        os.makedirs(os.path.dirname(vocab_file), exist_ok=True)
        vocab = {"<pad>": 0, "<bos>": 1, "<eos>": 2, "<unk>": 3,
                 "the": 4, "a": 5, "image": 6, "is": 7, "shows": 8}
        with open(vocab_file, "w") as f:
            json.dump(vocab, f, indent=2)


def main():
    model_path = "models/test_multimodal_model.pt"
    vocab_file = "data/vocab.json"
    ensure_test_model(model_path, vocab_file)

    print("Initializing Apertis multimodal inference engine...")
    inference = ApertisInference(
        model_path=model_path, vocab_file=vocab_file, multimodal=True)

    sample_path = "data/sample_image.png"
    if not os.path.exists(sample_path):
        os.makedirs("data", exist_ok=True)
        create_sample_image(sample_path,
                            size=inference.config.image_size)
        print(f"Sample image created at {sample_path}")

    print("\n" + "=" * 50)
    print("Welcome to Apertis Multimodal Chat Example!")
    print("Type 'exit' to quit. Type 'image <path>' to load an image.")
    print("=" * 50 + "\n")

    chat_history = [{"role": "system",
                     "content": "You are Apertis, a helpful AI assistant that "
                                "understands both text and images."}]
    current_image = None
    while True:
        user_input = input("You: ")
        if user_input.lower() == "exit":
            print("Goodbye!")
            break
        if user_input.lower().startswith("image "):
            path = user_input[6:].strip()
            if os.path.exists(path):
                current_image = path
                print(f"Image loaded: {path}")
            else:
                print(f"Image not found: {path}")
            continue

        chat_history.append({"role": "user", "content": user_input})
        print("Apertis: ", end="", flush=True)
        response_text = ""
        for text in inference.chat(messages=chat_history,
                                   image_path=current_image, stream=True):
            print(text[len(response_text):], end="", flush=True)
            response_text = text
        print()
        chat_history.append({"role": "assistant", "content": response_text})
        current_image = None  # images attach to a single turn


if __name__ == "__main__":
    main()
