"""Log-likelihood evaluation over JSONL datasets.

Two tasks:
  * perplexity — JSONL ``{"text": ...}``; exp of the mean next-token NLL
    over all (non-pad) tokens.
  * multiple_choice — JSONL ``{"question": ..., "choices": [...],
    "answer": <index>}`` (MMLU-style); each choice is scored by the summed
    log-probability of its tokens conditioned on the question, the argmax
    is the prediction.

Scoring runs as one jitted log-softmax gather per padded batch; prompts
bucket to a few static lengths to bound recompilation.
"""

from __future__ import annotations

import json
import logging
from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from apertis_llm_tpu.config import ApertisConfig
from apertis_llm_tpu.models import apertis as model_lib

logger = logging.getLogger(__name__)

_BUCKETS = (64, 128, 256, 512, 1024, 2048)


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return _BUCKETS[-1]


def _token_nll_fn(config: ApertisConfig):
    """Jitted per-position NLL: (params, ids, mask) -> (B, L-1) nll, valid."""

    @jax.jit
    def run(params, input_ids, attention_mask):
        out = model_lib.forward(params, config, input_ids,
                                attention_mask=attention_mask)
        logp = jax.nn.log_softmax(out.logits[:, :-1].astype(jnp.float32), -1)
        targets = input_ids[:, 1:]
        nll = -jnp.take_along_axis(logp, targets[..., None], -1)[..., 0]
        valid = attention_mask[:, 1:].astype(jnp.float32)
        return nll, valid

    return run


def _pad_batch(rows: List[List[int]], pad_id: int):
    lmax = _bucket(max(len(r) for r in rows))
    ids = np.full((len(rows), lmax), pad_id, np.int32)
    mask = np.zeros((len(rows), lmax), np.int32)
    for i, r in enumerate(rows):
        r = r[:lmax]
        ids[i, :len(r)] = r
        mask[i, :len(r)] = 1
    return ids, mask


def compute_perplexity(
    params,
    config: ApertisConfig,
    token_rows: Iterable[Sequence[int]],
    batch_size: int = 8,
    window: int = _BUCKETS[-1],
    overlap: int = 256,
) -> Dict[str, float]:
    """Perplexity over pre-tokenised rows.

    Rows longer than ``window`` are scored with a sliding window: each
    subsequent window re-reads ``overlap`` tokens of context but only the
    tokens after the overlap contribute to the NLL, so every token of a
    long document is scored exactly once (standard strided evaluation —
    no silent truncation).

    ``window`` must be <= the largest compiled bucket (2048) — _pad_batch
    slices rows to that bucket, so a larger window would silently truncate —
    and ``overlap`` must satisfy 0 <= overlap < window."""
    if window > _BUCKETS[-1]:
        raise ValueError(
            f"window={window} exceeds the largest compiled bucket "
            f"{_BUCKETS[-1]}; rows are scored in <= {_BUCKETS[-1]}-token "
            "windows, so a larger window would silently truncate")
    if not 0 <= overlap < window:
        raise ValueError(f"overlap must satisfy 0 <= overlap < window "
                         f"(got overlap={overlap}, window={window})")
    nll_fn = _token_nll_fn(config)
    total_nll, total_tokens = 0.0, 0
    batch: List[List[int]] = []
    score_from: List[int] = []

    def flush(batch, score_from):
        nonlocal total_nll, total_tokens
        if not batch:
            return
        while len(batch) < batch_size:
            # Filler rows square up the batch shape; an out-of-range
            # score-from offset keeps them out of the NLL entirely.
            batch.append(batch[-1][:2])
            score_from.append(1 << 30)
        ids, mask = _pad_batch(batch, config.pad_token_id)
        nll, valid = nll_fn(params, jnp.asarray(ids), jnp.asarray(mask))
        # Position p of `nll` scores token p+1; honour each row's
        # score-from offset so overlap context isn't double-counted.
        pos = np.arange(ids.shape[1] - 1)[None, :] + 1
        scoring = (pos >= np.asarray(score_from)[:, None]).astype(np.float32)
        v = np.asarray(valid) * scoring
        total_nll += float(np.sum(np.asarray(nll) * v))
        total_tokens += int(np.sum(v))

    def push(row, start):
        nonlocal batch, score_from
        batch.append(row)
        score_from.append(start)
        if len(batch) == batch_size:
            flush(batch, score_from)
            batch, score_from = [], []

    for row in token_rows:
        row = list(row)
        if len(row) < 2:
            continue
        if len(row) <= window:
            push(row, 0)
        else:
            stride = window - overlap
            push(row[:window], 0)
            for s in range(stride, len(row) - overlap, stride):
                push(row[s:s + window], overlap)
    flush(batch, score_from)
    if total_tokens == 0:
        return {"perplexity": float("nan"), "tokens": 0}
    mean_nll = total_nll / total_tokens
    return {"perplexity": float(np.exp(mean_nll)),
            "nll_per_token": mean_nll, "tokens": total_tokens}


def evaluate_multiple_choice(
    params,
    config: ApertisConfig,
    items: List[Dict[str, Any]],
    encode: Callable[[str], List[int]],
    batch_size: int = 8,
    prompt_template: str = "Question: {question}\nAnswer:",
) -> Dict[str, float]:
    """Accuracy by choice log-likelihood (length-normalised and raw)."""
    nll_fn = _token_nll_fn(config)
    correct = correct_norm = total = 0

    for item in items:
        question = prompt_template.format(question=item["question"])
        q_ids = encode(question)
        rows, q_lens = [], []
        for choice in item["choices"]:
            c_ids = encode(" " + str(choice))
            rows.append(q_ids + c_ids)
            q_lens.append(len(q_ids))
        ids, mask = _pad_batch(rows, config.pad_token_id)
        nll, valid = nll_fn(params, jnp.asarray(ids), jnp.asarray(mask))
        nll = np.asarray(nll * valid)
        scores, scores_norm = [], []
        for i, qlen in enumerate(q_lens):
            # NLL positions qlen-1 .. len(row)-2 predict the choice tokens.
            span = nll[i, qlen - 1: len(rows[i]) - 1]
            scores.append(-span.sum())
            scores_norm.append(-span.mean() if span.size else -np.inf)
        answer = int(item["answer"])
        correct += int(np.argmax(scores) == answer)
        correct_norm += int(np.argmax(scores_norm) == answer)
        total += 1

    return {"accuracy": correct / max(total, 1),
            "accuracy_norm": correct_norm / max(total, 1),
            "items": total}


def run_eval(
    model_path: str,
    data_path: str,
    task: str = "perplexity",
    tokenizer_path: Optional[str] = None,
    batch_size: int = 8,
    max_items: Optional[int] = None,
    prompt_template: str = "Question: {question}\nAnswer:",
    window: int = _BUCKETS[-1],
    overlap: int = 256,
    quantize: Optional[str] = None,
    mesh_shape: Optional[List[int]] = None,
) -> Dict[str, float]:
    """Load a checkpoint and evaluate it on a JSONL dataset.

    ``quantize``/``mesh_shape`` mirror the serving knobs: int8 weights
    and/or a TP/EP serving mesh for scoring large models quickly."""
    from apertis_llm_tpu.inference.interface import ApertisInterface

    iface = ApertisInterface(model_path=model_path, vocab_file=tokenizer_path,
                             quantize=quantize, mesh_shape=mesh_shape)
    params, config = iface.params, iface.config

    items = []
    with open(data_path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                items.append(json.loads(line))
            except json.JSONDecodeError:
                continue
            if max_items and len(items) >= max_items:
                break

    if task == "perplexity":
        rows = [iface.tokenize(it.get("text", "")) for it in items]
        result = compute_perplexity(params, config, rows, batch_size,
                                    window=window, overlap=overlap)
    elif task == "multiple_choice":
        result = evaluate_multiple_choice(
            params, config, items, iface.tokenize, batch_size,
            prompt_template=prompt_template)
    else:
        raise ValueError(f"Unknown eval task: {task}")
    logger.info("Eval %s on %s: %s", task, data_path, result)
    return result
