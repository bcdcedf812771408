"""Interface-layer tests: ApertisInterface / ApertisInference / UI backend."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    """A tiny saved model + vocab the interface can load."""
    from apertis_llm_tpu.config import ApertisConfig
    from apertis_llm_tpu.models.convert import save_torch_checkpoint
    from apertis_llm_tpu.models.params import init_params

    d = tmp_path_factory.mktemp("model")
    config = ApertisConfig(vocab_size=32, hidden_size=64, num_hidden_layers=1,
                           num_attention_heads=2, intermediate_size=128,
                           hidden_dropout_prob=0.0,
                           attention_probs_dropout_prob=0.0)
    params = init_params(jax.random.PRNGKey(0), config)
    save_torch_checkpoint(params, config, d, filename="model.pt")
    vocab = {"<pad>": 0, "<bos>": 1, "<eos>": 2, "<unk>": 3,
             "hello": 4, "world": 5, "the": 6, "cat": 7}
    (d / "vocab.json").write_text(json.dumps(vocab))
    return d


def test_interface_chat_roundtrip(model_dir):
    from apertis_llm_tpu.inference.interface import ApertisInterface

    iface = ApertisInterface(model_path=str(model_dir),
                             vocab_file=str(model_dir / "vocab.json"))
    assert iface.config.vocab_size == 32
    assert iface.tokenize("hello world unknownword") == [4, 5, 3]
    assert iface.detokenize([4, 5, 0, 2]) == "hello world"

    response = iface.chat("hello the cat", max_length=5, temperature=0.0)
    assert isinstance(response, str)
    assert len(iface.chat_history) == 2
    iface.reset_chat()
    assert iface.chat_history == []


def test_interface_falls_back_to_dummy(tmp_path):
    from apertis_llm_tpu.inference.interface import ApertisInterface

    iface = ApertisInterface(model_path=str(tmp_path / "nonexistent"))
    assert iface.actual_model_path_loaded == "Dummy Startup Model"
    assert iface.tokenize("anything") is not None


def test_apertis_inference_streaming(model_dir):
    from apertis_llm_tpu.inference.interface import ApertisInference

    inf = ApertisInference(model_path=str(model_dir),
                           vocab_file=str(model_dir / "vocab.json"))
    messages = [{"role": "system", "content": "sys"},
                {"role": "user", "content": "hello the cat"}]
    chunks = list(inf.chat(messages=messages, stream=True, max_new_tokens=4,
                           temperature=0.0))
    assert chunks  # cumulative text snapshots
    final = inf.chat(messages=messages, stream=False, max_new_tokens=4,
                     temperature=0.0)
    assert isinstance(final, str)


def test_ui_backend_jobs(model_dir, tmp_path):
    """UI handlers work without gradio: chat, model load/create, job launch."""
    from apertis_llm_tpu.inference.interface import ApertisInterface
    from apertis_llm_tpu.inference.ui import UIBackend

    iface = ApertisInterface(model_path=str(model_dir),
                             vocab_file=str(model_dir / "vocab.json"))
    backend = UIBackend(iface)

    history, cleared = backend.chat("hello", None, 4, 0.0, 50, 1.0, [])
    assert len(history) == 1 and cleared == ""

    info = backend.load_model(str(model_dir), "")
    assert "attention_type=standard_mha" in info

    status = backend.create_model(
        "10M", 64, False, False, 8, 2, "selective_ssm", False,
        str(tmp_path / "created"))
    assert "Model created" in status
    assert (tmp_path / "created" / "model.pt").exists()

    # Launch a real (tiny) pretraining job through the UI path.
    words = ["the", "cat", "sat"]
    lines = [json.dumps({"text": " ".join(words)})] * 16
    (tmp_path / "train.jsonl").write_text("\n".join(lines))
    vocab = {"<pad>": 0, "<bos>": 1, "<eos>": 2, "<unk>": 3,
             "the": 4, "cat": 5, "sat": 6}
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))

    msg = backend.start_pretraining(
        str(tmp_path / "train.jsonl"), "", str(tmp_path / "vocab.json"),
        "10M", "standard_mha", False, False, 8, 2, False, "", 16,
        str(tmp_path / "out"), 8, 1e-3, 1, 1, False)
    assert "launched" in msg
    # Generous timeout: under a fully loaded host the 8-virtual-device
    # all-reduces crawl (observed >300s in a whole-suite run; 137s alone).
    backend.pretrain_job.thread.join(timeout=900)
    assert not backend.pretrain_job.running()
    assert "finished" in backend.pretrain_job.status()
    assert (tmp_path / "out" / "final" / "pytorch_model.bin").exists()

    # Stop on an idle job reports cleanly.
    assert "No Fine-tuning job" in backend.finetune_job.stop()


def test_interface_int8_quantized_serving(tmp_path):
    """`quantize="int8"` (CLI: chat --quantize int8) serves from a {w_q, w_s}
    tree and still chats; greedy reply matches the bf16 interface. The model
    must be big enough to clear quantize_params' production min_size."""
    from apertis_llm_tpu.config import ApertisConfig
    from apertis_llm_tpu.inference.interface import ApertisInterface
    from apertis_llm_tpu.models.convert import save_torch_checkpoint
    from apertis_llm_tpu.models.params import init_params

    config = ApertisConfig(vocab_size=32, hidden_size=256,
                           num_hidden_layers=1, num_attention_heads=4,
                           intermediate_size=512,
                           hidden_dropout_prob=0.0,
                           attention_probs_dropout_prob=0.0)
    params = init_params(jax.random.PRNGKey(0), config)
    save_torch_checkpoint(params, config, tmp_path, filename="model.pt")
    vocab = {"<pad>": 0, "<bos>": 1, "<eos>": 2, "<unk>": 3,
             "hello": 4, "world": 5, "the": 6, "cat": 7}
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))

    kw = dict(model_path=str(tmp_path),
              vocab_file=str(tmp_path / "vocab.json"))
    iface_q = ApertisInterface(quantize="int8", **kw)
    assert "w_q" in iface_q.params["layers"]["ffn"]["w1"]
    reply_q = iface_q.chat("hello the cat", max_length=5, temperature=0.0)
    iface = ApertisInterface(**kw)
    reply = iface.chat("hello the cat", max_length=5, temperature=0.0)
    assert reply_q == reply

    with pytest.raises(ValueError):
        ApertisInterface(quantize="int4", **kw)


def test_interface_mesh_sharded_serving(tmp_path):
    """`mesh_shape` (CLI: chat --mesh-shape 1,2,1) serves with TP-sharded
    weights; greedy reply matches single-device serving, composing with
    int8 quantization."""
    from apertis_llm_tpu.config import ApertisConfig
    from apertis_llm_tpu.inference.interface import ApertisInterface
    from apertis_llm_tpu.models.convert import save_torch_checkpoint
    from apertis_llm_tpu.models.params import init_params

    config = ApertisConfig(vocab_size=32, hidden_size=256,
                           num_hidden_layers=1, num_attention_heads=4,
                           intermediate_size=512,
                           attention_type="selective_ssm", ssm_d_state=8,
                           hidden_dropout_prob=0.0,
                           attention_probs_dropout_prob=0.0)
    params = init_params(jax.random.PRNGKey(0), config)
    save_torch_checkpoint(params, config, tmp_path, filename="model.pt")
    vocab = {"<pad>": 0, "<bos>": 1, "<eos>": 2, "<unk>": 3,
             "hello": 4, "world": 5, "the": 6, "cat": 7}
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))

    kw = dict(model_path=str(tmp_path),
              vocab_file=str(tmp_path / "vocab.json"))
    ref = ApertisInterface(**kw).chat("hello the cat", max_length=5,
                                      temperature=0.0)
    sharded = ApertisInterface(mesh_shape=[1, 2, 1], **kw)
    assert sharded.chat("hello the cat", max_length=5, temperature=0.0) == ref
    sharded.reset_chat()

    both = ApertisInterface(mesh_shape=[1, 2, 1], quantize="int8", **kw)
    assert both.chat("hello the cat", max_length=5, temperature=0.0) == ref
