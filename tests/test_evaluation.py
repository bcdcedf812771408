"""Evaluation harness: perplexity sanity + multiple-choice correctness."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from apertis_llm_tpu.config import ApertisConfig
from apertis_llm_tpu.evaluation import (
    compute_perplexity, evaluate_multiple_choice, run_eval)
from apertis_llm_tpu.models.params import init_params


def _model():
    config = ApertisConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                           num_attention_heads=2, intermediate_size=64,
                           hidden_dropout_prob=0.0,
                           attention_probs_dropout_prob=0.0)
    params = init_params(jax.random.PRNGKey(0), config)
    return config, params


def test_perplexity_random_model_near_uniform():
    config, params = _model()
    rng = np.random.default_rng(0)
    rows = [rng.integers(4, 64, size=rng.integers(5, 20)).tolist()
            for _ in range(12)]
    result = compute_perplexity(params, config, rows, batch_size=4)
    assert result["tokens"] > 0
    # A random-init model is close to uniform over 64 tokens.
    assert 30 < result["perplexity"] < 130


def test_perplexity_improves_after_training():
    """A model trained on a repeated sentence must get lower ppl on it."""
    import optax

    from apertis_llm_tpu.training.step import (
        create_train_state, make_optimizer, make_train_step)

    config, params = _model()
    row = [1, 5, 9, 5, 9, 5, 9, 2]
    ids = jnp.asarray([row * 1], jnp.int32)
    batch = {"input_ids": jnp.tile(ids, (8, 1)),
             "attention_mask": jnp.ones((8, len(row)), jnp.int32),
             "labels": jnp.tile(ids, (8, 1))}
    tx, _ = make_optimizer(5e-3, 60)
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(config, tx))
    for _ in range(40):
        state, _ = step(state, batch)

    before = compute_perplexity(params, config, [row] * 4, batch_size=4)
    after = compute_perplexity(state.params, config, [row] * 4, batch_size=4)
    assert after["perplexity"] < before["perplexity"] / 2


def test_multiple_choice_prefers_trained_continuation():
    """After training 'question -> answer_a', the harness must pick it."""
    import optax

    from apertis_llm_tpu.training.step import (
        create_train_state, make_optimizer, make_train_step)

    config, params = _model()
    # token language: question = [10, 11], right answer = [20], wrong = [30]
    seq = [10, 11, 20]
    ids = jnp.asarray([seq], jnp.int32)
    batch = {"input_ids": jnp.tile(ids, (8, 1)),
             "attention_mask": jnp.ones((8, 3), jnp.int32),
             "labels": jnp.tile(ids, (8, 1))}
    tx, _ = make_optimizer(5e-3, 60)
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(config, tx))
    for _ in range(40):
        state, _ = step(state, batch)

    encode_map = {"Question: q\nAnswer:": [10, 11], " a": [20], " b": [30]}
    items = [{"question": "q", "choices": ["a", "b"], "answer": 0}]
    result = evaluate_multiple_choice(
        state.params, config, items, lambda s: encode_map[s], batch_size=2)
    assert result["accuracy"] == 1.0
    assert result["items"] == 1


def test_run_eval_cli_surface(tmp_path):
    from apertis_llm_tpu.models.convert import save_torch_checkpoint

    config, params = _model()
    save_torch_checkpoint(params, config, tmp_path / "model")
    vocab = {"<pad>": 0, "<bos>": 1, "<eos>": 2, "<unk>": 3,
             "hello": 4, "world": 5}
    (tmp_path / "model" / "vocab.json").write_text(json.dumps(vocab))
    data = tmp_path / "eval.jsonl"
    data.write_text("\n".join(
        json.dumps({"text": "hello world hello world"}) for _ in range(4)))

    from apertis_llm_tpu.cli import main

    main(["eval", "--model-path", str(tmp_path / "model"),
          "--data", str(data), "--task", "perplexity", "--batch-size", "2"])


def test_perplexity_sliding_window_long_rows():
    """Rows longer than the window are scored by sliding windows: every
    token scored exactly once (no silent truncation), with `overlap`
    re-read context tokens per window."""
    import jax

    from apertis_llm_tpu.config import ApertisConfig
    from apertis_llm_tpu.evaluation.harness import compute_perplexity
    from apertis_llm_tpu.models.params import init_params

    config = ApertisConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                           num_attention_heads=2, intermediate_size=64,
                           attention_type="selective_ssm", ssm_d_state=4,
                           hidden_dropout_prob=0.0,
                           attention_probs_dropout_prob=0.0)
    params = init_params(jax.random.PRNGKey(0), config)
    row = list(np.random.default_rng(0).integers(4, 64, 150))

    full = compute_perplexity(params, config, [row], batch_size=2,
                              window=256, overlap=16)
    windowed = compute_perplexity(params, config, [row], batch_size=2,
                                  window=64, overlap=16)
    # Every token scored exactly once either way.
    assert full["tokens"] == windowed["tokens"] == len(row) - 1
    assert np.isfinite(windowed["perplexity"])
    # Windowing truncates context, so NLL can only be mildly worse.
    assert windowed["nll_per_token"] >= full["nll_per_token"] - 1e-3
    assert windowed["perplexity"] < full["perplexity"] * 1.5
