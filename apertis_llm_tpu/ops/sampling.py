"""Vectorised, jittable token sampling.

Replaces the reference's per-row Python loops (repetition penalty:
src/model/core.py:1605-1610; top-k/top-p: core.py:1612-1629) with batched ops
that run entirely on device inside the compiled decode loop.

Parity notes:
  * Repetition penalty divides the logit once PER OCCURRENCE of the token in
    the generated sequence (the reference loops over every position), i.e. a
    token seen c times is divided by penalty**c.
  * top-k keeps all logits >= the k-th value (ties included, matching
    ``masked_fill_(logits < kth_val)``).
  * top-p sorts descending, keeps the smallest prefix with cumulative
    probability > p shifted so the first above-threshold token survives.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def apply_repetition_penalty(
    logits: jnp.ndarray,      # (B, V) float32
    token_ids: jnp.ndarray,   # (B, L) generated-so-far ids (padded)
    valid_mask: jnp.ndarray,  # (B, L) 1 for real tokens
    penalty: float,
) -> jnp.ndarray:
    vocab = logits.shape[-1]
    counts = jnp.zeros_like(logits)
    ids = jnp.clip(token_ids, 0, vocab - 1)
    counts = jax.vmap(
        lambda c, i, m: c.at[i].add(m.astype(c.dtype))
    )(counts, ids, valid_mask)
    return logits / jnp.power(penalty, counts)


def apply_top_k(logits: jnp.ndarray, top_k: int) -> jnp.ndarray:
    if top_k <= 0 or top_k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    cum_probs = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    # Shift right so the first token crossing the threshold is kept.
    exceeded = cum_probs > top_p
    exceeded = jnp.concatenate(
        [jnp.zeros_like(exceeded[..., :1]), exceeded[..., :-1]], axis=-1)
    # Cutoff = smallest kept logit value in the sorted order.
    cutoff = jnp.min(jnp.where(exceeded, jnp.inf, sorted_logits), axis=-1, keepdims=True)
    return jnp.where(logits < cutoff, NEG_INF, logits)


def sample_token(
    rng: jax.Array,
    logits: jnp.ndarray,        # (B, V)
    *,
    do_sample: bool = False,
    temperature: float = 1.0,
    top_k: int = 50,
    top_p: float = 1.0,
    repetition_penalty: float = 1.0,
    token_history: Optional[jnp.ndarray] = None,
    history_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full sampling pipeline; returns next token ids (B,)."""
    logits = logits.astype(jnp.float32)
    if repetition_penalty != 1.0 and token_history is not None:
        if history_mask is None:
            history_mask = jnp.ones(token_history.shape, dtype=jnp.float32)
        logits = apply_repetition_penalty(
            logits, token_history, history_mask, repetition_penalty)
    if not do_sample:
        return jnp.argmax(logits, axis=-1)
    temp = max(temperature, 1e-6)
    if temp != 1.0:
        logits = logits / temp
    if top_k > 0:
        logits = apply_top_k(logits, top_k)
    if top_p < 1.0:
        logits = apply_top_p(logits, top_p)
    return jax.random.categorical(rng, logits, axis=-1)
