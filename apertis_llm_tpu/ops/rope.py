"""Rotary position embeddings — Apertis variant.

Parity-critical quirk (reference: src/model/core.py:258-293, 676-683): RoPE is
applied to the *full* ``hidden_size``-wide Q/K vectors BEFORE the head split,
rotating interleaved pairs ``(x[..., 2i], x[..., 2i+1])`` with frequencies
indexed over the full width. This differs from standard per-head RoPE and must
be reproduced exactly for logit parity with reference checkpoints.

Computation is float32 (the reference casts to float for the rotation) and the
result is cast back to the input dtype.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_tables(dim: int, max_positions: int, base: float = 10000.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute (cos, sin) tables of shape (max_positions, dim // 2)."""
    if dim % 2 != 0:
        raise ValueError(f"RoPE dimension must be even, got {dim}")
    inv_freq = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(max_positions, dtype=jnp.float32)
    freqs = jnp.einsum("i,j->ij", t, inv_freq)
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(
    x: jnp.ndarray,
    position_ids: jnp.ndarray,
    cos_table: jnp.ndarray,
    sin_table: jnp.ndarray,
) -> jnp.ndarray:
    """Rotate ``x`` of shape (B, L, D) by positions (B, L) or (L,).

    Interleaved-pair rotation over the full feature width:
      out[..., 2i]   = x[..., 2i]   * cos_i - x[..., 2i+1] * sin_i
      out[..., 2i+1] = x[..., 2i]   * sin_i + x[..., 2i+1] * cos_i
    """
    dtype = x.dtype
    b, l, d = x.shape
    if position_ids.ndim == 1:
        position_ids = position_ids[None, :]
    cos = cos_table[position_ids]  # (B, L, D/2)
    sin = sin_table[position_ids]
    xf = x.astype(jnp.float32).reshape(b, l, d // 2, 2)
    x1, x2 = xf[..., 0], xf[..., 1]
    r1 = x1 * cos - x2 * sin
    r2 = x1 * sin + x2 * cos
    out = jnp.stack((r1, r2), axis=-1).reshape(b, l, d)
    return out.astype(dtype)
