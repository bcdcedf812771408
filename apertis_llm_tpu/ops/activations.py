"""Activation functions matching torch semantics.

torch's ``nn.GELU()`` default is the exact erf formulation, while
``jax.nn.gelu`` defaults to the tanh approximation — parity requires
``approximate=False``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.relu(x)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


_ACTIVATIONS = {
    "gelu": gelu,
    "relu": relu,
    "silu": silu,
    "swish": silu,
}


def get_activation(name: str):
    """Resolve an activation by name; unknown names fall back to GELU
    (reference: src/model/core.py:463-468)."""
    return _ACTIVATIONS.get(name, gelu)
