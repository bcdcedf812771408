#!/usr/bin/env python3
"""Simple Chat Example.

Streams a chat with a (tiny, randomly-initialised if absent) Apertis model
through the :class:`ApertisInference` messages API — the surface the
reference examples drive (reference: examples/simple_chat.py:56-102).
"""

import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from apertis_llm_tpu.inference.interface import ApertisInference


def ensure_test_model(model_path: str, vocab_file: str) -> None:
    if not os.path.exists(model_path):
        print("Test model not found. Creating a small test model...")
        os.makedirs(os.path.dirname(model_path), exist_ok=True)
        import jax

        from apertis_llm_tpu.models.convert import save_torch_checkpoint
        from apertis_llm_tpu.models.factory import build_model_config
        from apertis_llm_tpu.models.params import init_params

        config = build_model_config(
            "10M", vocab_size_override=32000,
            config_overrides={"hidden_size": 256, "num_hidden_layers": 4,
                              "num_attention_heads": 4,
                              "intermediate_size": 512})
        params = init_params(jax.random.PRNGKey(0), config)
        save_torch_checkpoint(params, config, os.path.dirname(model_path),
                              filename=os.path.basename(model_path))
        print(f"Test model created at {model_path}")

    if not os.path.exists(vocab_file):
        print("Vocabulary file not found. Creating a sample vocabulary...")
        os.makedirs(os.path.dirname(vocab_file), exist_ok=True)
        vocab = {"<pad>": 0, "<bos>": 1, "<eos>": 2, "<unk>": 3,
                 "the": 4, "a": 5, "an": 6, "is": 7, "was": 8, "are": 9,
                 "were": 10}
        with open(vocab_file, "w") as f:
            json.dump(vocab, f, indent=2)
        print(f"Sample vocabulary created at {vocab_file}")


def main():
    model_path = "models/test_model.pt"
    vocab_file = "data/vocab.json"
    ensure_test_model(model_path, vocab_file)

    print("Initializing Apertis inference engine...")
    inference = ApertisInference(
        model_path=model_path, vocab_file=vocab_file, multimodal=False)

    print("\n" + "=" * 50)
    print("Welcome to Apertis Simple Chat Example!")
    print("Type 'exit' to quit the chat.")
    print("=" * 50 + "\n")

    chat_history = [{"role": "system",
                     "content": "You are Apertis, a helpful and friendly AI assistant."}]
    while True:
        user_input = input("You: ")
        if user_input.lower() == "exit":
            print("Goodbye!")
            break
        chat_history.append({"role": "user", "content": user_input})
        print("Apertis: ", end="", flush=True)
        response_text = ""
        for text in inference.chat(messages=chat_history, stream=True):
            print(text[len(response_text):], end="", flush=True)
            response_text = text
        print()
        chat_history.append({"role": "assistant", "content": response_text})


if __name__ == "__main__":
    main()
