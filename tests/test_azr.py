"""AZR self-play pipeline tests: component heuristics vs the reference, plus
a full offline self-play run with a local tokenizer (zero-egress safe)."""

import json

import numpy as np
import pytest

from tests.reference_oracle import load_reference


def _make_local_tokenizer(tmp_path):
    """Build a tiny word-level HF tokenizer on disk (no network)."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    words = ("the a cat dog sequence number problem reasoning if then what "
             "next and why is rule pattern comes 2 4 6 8 create simple about "
             "numbers for example we have").split()
    vocab = {"<pad>": 0, "<bos>": 1, "<eos>": 2, "<unk>": 3}
    for w in words:
        vocab[w] = len(vocab)
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", bos_token="<bos>",
        eos_token="<eos>", unk_token="<unk>")
    tok_dir = tmp_path / "tok"
    fast.save_pretrained(tok_dir)
    return str(tok_dir)


# -- heuristic parity with the reference ---------------------------------

core = load_reference()
requires_ref = pytest.mark.skipif(core is None, reason="reference oracle unavailable")


def _ref_azr():
    import importlib
    import sys

    sys.path.insert(0, "/root/reference")
    return (importlib.import_module("src.training.azr.data_construction"),
            importlib.import_module("src.training.azr.rewards"))


SAMPLE_TASKS = [
    "Consider the sequence: 3, 7, 16, 35, 74. What is the next number and "
    "what is the rule governing the sequence?",
    "All expert systems are intelligent. All intelligent systems use "
    "knowledge. Apertis is an expert system. What can you deduce?",
    "short one",
]

SAMPLE_SOLUTION = (
    "First, we look at the differences between terms. Therefore the rule is "
    "multiply by two and add one.\n1. Start with 3.\n2. Apply the rule.\n"
    "Conclusion: the next number is 153.")


@requires_ref
def test_complexity_and_clarity_match_reference():
    ref_dc, _ = _ref_azr()
    from apertis_llm_tpu.training.azr.construction import TaskValidator

    ref_val = ref_dc.TaskValidator({})
    ours = TaskValidator({})
    for task in SAMPLE_TASKS:
        assert abs(ours.complexity(task) - ref_val._calculate_complexity(task)) < 1e-9
        assert abs(ours.clarity(task) - ref_val._calculate_clarity(task)) < 1e-9


@requires_ref
def test_solution_heuristics_match_reference():
    ref_dc, _ = _ref_azr()
    from apertis_llm_tpu.training.azr.construction import SolutionValidator

    ref_val = ref_dc.SolutionValidator({})
    ours = SolutionValidator({})
    task = SAMPLE_TASKS[0]
    assert abs(ours.coherence(SAMPLE_SOLUTION)
               - ref_val._calculate_coherence(SAMPLE_SOLUTION)) < 1e-9
    assert abs(ours.relevance(task, SAMPLE_SOLUTION)
               - ref_val._calculate_relevance(task, SAMPLE_SOLUTION)) < 1e-9
    assert abs(ours.structure(SAMPLE_SOLUTION)
               - ref_val._calculate_structure(SAMPLE_SOLUTION)) < 1e-9


@requires_ref
def test_rewards_match_reference():
    _, ref_rewards = _ref_azr()
    from apertis_llm_tpu.training.azr import rewards as our_rewards

    validation = {"is_valid": True, "complexity": 0.63, "clarity": 0.55,
                  "correctness": 0.7, "coherence": 0.6, "relevance": 0.5,
                  "structure": 0.4}
    pairs = [("ComplexityReward", (validation,)),
             ("ClarityReward", (validation,)),
             ("AccuracyReward", (validation,)),
             ("CoherenceReward", (validation,))]
    for name, args in pairs:
        ref = getattr(ref_rewards, name)({}).calculate(*args)
        mine = getattr(our_rewards, name)({}).calculate(*args)
        assert abs(ref - mine) < 1e-12, name

    task = {"task": SAMPLE_TASKS[0]}
    history = [{"task": SAMPLE_TASKS[1]}, {"task": SAMPLE_TASKS[0]}]
    ref = ref_rewards.DiversityReward({}).calculate(task, history)
    mine = our_rewards.DiversityReward({}).calculate(task, history)
    assert abs(ref - mine) < 1e-12


def test_python_executor_sandbox():
    from apertis_llm_tpu.training.azr import PythonExecutor

    ex = PythonExecutor({"timeout": 5})
    ok = ex.execute("print(6 * 7)")
    assert ok["success"] and "42" in ok["output"]
    bad = ex.execute("raise ValueError('boom')")
    assert not bad["success"] and "boom" in bad["error"]
    slow = ex.execute("import time; time.sleep(30)")
    assert not slow["success"] and "timed out" in slow["error"]


def test_azr_full_loop(tmp_path):
    """Full self-play loop: random model + local tokenizer, 2 iterations."""
    from apertis_llm_tpu.training.azr_pipeline import train_from_config

    tok_dir = _make_local_tokenizer(tmp_path)
    config = {
        "data": {"tokenizer_name": tok_dir},
        "model": {"hidden_size": 64, "num_hidden_layers": 1,
                  "num_attention_heads": 2, "intermediate_size": 128,
                  "attention_type": "selective_ssm", "ssm_d_state": 8,
                  "max_position_embeddings": 512,
                  "hidden_dropout_prob": 0.0,
                  "attention_probs_dropout_prob": 0.0},
        "training": {"method": "azr", "output_dir": str(tmp_path / "out"),
                     "seed": 0},
        "azr": {
            "num_iterations": 2,
            "tasks_per_iteration": 2,
            "checkpoint_interval": 2,
            "task_generator": {"max_new_tokens": 16, "max_attempts": 1,
                               "seed": 0},
            "solution_generator": {"max_new_tokens": 16, "max_attempts": 1},
        },
    }
    cfg_path = tmp_path / "azr.json"
    cfg_path.write_text(json.dumps(config))

    summary = train_from_config(str(cfg_path))
    assert summary["iterations"] == 2
    assert summary["tasks_generated"] == 4
    # Warmup force-accept keeps everything valid in early iterations.
    assert summary["task_valid_rate"] == 1.0
    out = tmp_path / "out"
    assert (out / "azr_data" / "metrics.json").exists()
    assert any((out / "azr_data" / "tasks").iterdir())
    ckpts = list((out / "azr_checkpoints").iterdir())
    assert ckpts and any((c / "pytorch_model.bin").exists() for c in ckpts)


def test_azr_sft_updates_change_weights(tmp_path):
    """With enable_sft_updates, self-play actually trains the policy."""
    import numpy as np

    from apertis_llm_tpu.training.azr_pipeline import AbsoluteZeroReasonerTrainer

    tok_dir = _make_local_tokenizer(tmp_path)
    config = {
        "data": {"tokenizer_name": tok_dir},
        "model": {"hidden_size": 64, "num_hidden_layers": 1,
                  "num_attention_heads": 2, "intermediate_size": 128,
                  "attention_type": "selective_ssm", "ssm_d_state": 8,
                  "max_position_embeddings": 512,
                  "hidden_dropout_prob": 0.0,
                  "attention_probs_dropout_prob": 0.0},
        "training": {"method": "azr", "output_dir": str(tmp_path / "out"),
                     "seed": 0},
        "azr": {
            "num_iterations": 1,
            "tasks_per_iteration": 2,
            "checkpoint_interval": 5,
            "enable_sft_updates": True,
            "sft": {"steps_per_iteration": 2, "batch_size": 4,
                    "max_length": 64, "learning_rate": 1e-3},
            "task_generator": {"max_new_tokens": 12, "max_attempts": 1,
                               "seed": 0},
            "solution_generator": {"max_new_tokens": 12, "max_attempts": 1},
        },
    }
    cfg_path = tmp_path / "azr.json"
    cfg_path.write_text(json.dumps(config))

    trainer = AbsoluteZeroReasonerTrainer(str(cfg_path))
    before = np.asarray(trainer.engine.params["embed"]["tok"]).copy()
    trainer.train()
    after = np.asarray(trainer.engine.params["embed"]["tok"])
    assert not np.array_equal(before, after)  # weights moved


def test_azr_dispatcher_routes(tmp_path):
    """training.method == azr routes through the top-level dispatcher."""
    from apertis_llm_tpu.training import train_from_config

    tok_dir = _make_local_tokenizer(tmp_path)
    config = {
        "data": {"tokenizer_name": tok_dir},
        "model": {"hidden_size": 64, "num_hidden_layers": 1,
                  "num_attention_heads": 2, "intermediate_size": 128,
                  "hidden_dropout_prob": 0.0,
                  "attention_probs_dropout_prob": 0.0},
        "training": {"method": "azr", "output_dir": str(tmp_path / "out")},
        "azr": {"num_iterations": 1, "tasks_per_iteration": 1,
                "task_generator": {"max_new_tokens": 8, "max_attempts": 1},
                "solution_generator": {"max_new_tokens": 8, "max_attempts": 1}},
    }
    cfg_path = tmp_path / "azr.json"
    cfg_path.write_text(json.dumps(config))
    summary = train_from_config(str(cfg_path))
    assert summary["iterations"] == 1
