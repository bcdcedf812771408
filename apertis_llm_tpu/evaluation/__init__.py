"""Evaluation harness: perplexity + multiple-choice (MMLU-style) accuracy.

The reference publishes GLUE/MMLU/VQA numbers but contains no evaluation
code at all (SURVEY.md §6: "the repo contains no evaluation harness that
could have produced them"). This module provides one: batched, jitted
log-likelihood scoring over JSONL datasets, exposed via ``apertis eval``.
"""

from apertis_llm_tpu.evaluation.harness import (
    compute_perplexity,
    evaluate_multiple_choice,
    run_eval,
)

__all__ = ["compute_perplexity", "evaluate_multiple_choice", "run_eval"]
