"""Parameter initializers with torch-compatible fan semantics.

The reference initializes GAT projections and attention banks with
``nn.init.xavier_uniform_`` (``layer.py:125-129``), relation embeddings with
Xavier uniform (``scorer.py``), and projection-head linears with torch's
``nn.Linear`` default (Kaiming-uniform with a=sqrt(5), i.e. bound
``1/sqrt(fan_in)``). Matching the *distributions* (not the bits) keeps
training dynamics comparable for epochs-to-parity benchmarks.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xavier_uniform(
    rng: jax.Array, shape, fan_in: int, fan_out: int, dtype=jnp.float32
) -> jax.Array:
    """U(-a, a) with ``a = sqrt(6 / (fan_in + fan_out))`` (torch
    ``xavier_uniform_`` with gain 1)."""
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype=dtype, minval=-a, maxval=a)


def torch_linear_uniform(
    rng: jax.Array, shape, fan_in: int, dtype=jnp.float32
) -> jax.Array:
    """torch ``nn.Linear`` default weight init: U(-1/sqrt(fan_in), +)."""
    a = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(rng, shape, dtype=dtype, minval=-a, maxval=a)
