"""Projection head: GAT output space -> frozen input-embedding space.

Parity with reference ``core/model/projection.py:7-72``:
- ``num_layers == 0``: identity when dims match, else a bias-free Linear,
- ``num_layers == 1``: one bias-free Linear,
- ``num_layers >= 2``: ``(num_layers - 1)`` blocks of
  ``Linear(bias=False) -> GELU(exact) -> LayerNorm`` with ``hidden_dim``
  (default ``in_dim``), then a final bias-free Linear to ``out_dim``,
- trailing dropout in every case.

Weights are stored ``[in, out]`` (apply is ``x @ W``) with torch
``nn.Linear``-default init; LayerNorm is affine with eps 1e-5 (torch default).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from relgat_projector_tpu.models.initializers import torch_linear_uniform


def _resolved_hidden(in_dim: int, hidden_dim: int) -> int:
    return hidden_dim if hidden_dim and hidden_dim > 0 else in_dim


def init_projection_head(
    rng: jax.Array,
    in_dim: int,
    out_dim: int,
    num_layers: int,
    *,
    hidden_dim: int = 0,
    dtype=jnp.float32,
) -> Dict[str, list]:
    num_layers = max(0, int(num_layers))
    hidden = _resolved_hidden(in_dim, hidden_dim)

    if num_layers == 0 and in_dim == out_dim:
        return {"linears": [], "ln_scale": [], "ln_bias": []}
    if num_layers <= 1:
        (k,) = jax.random.split(rng, 1)
        return {
            "linears": [
                torch_linear_uniform(k, (in_dim, out_dim), fan_in=in_dim, dtype=dtype)
            ],
            "ln_scale": [],
            "ln_bias": [],
        }

    keys = jax.random.split(rng, num_layers)
    linears = [
        torch_linear_uniform(keys[0], (in_dim, hidden), fan_in=in_dim, dtype=dtype)
    ]
    ln_scale = [jnp.ones((hidden,), dtype=dtype)]
    ln_bias = [jnp.zeros((hidden,), dtype=dtype)]
    for i in range(num_layers - 2):
        linears.append(
            torch_linear_uniform(
                keys[1 + i], (hidden, hidden), fan_in=hidden, dtype=dtype
            )
        )
        ln_scale.append(jnp.ones((hidden,), dtype=dtype))
        ln_bias.append(jnp.zeros((hidden,), dtype=dtype))
    linears.append(
        torch_linear_uniform(keys[-1], (hidden, out_dim), fan_in=hidden, dtype=dtype)
    )
    return {"linears": linears, "ln_scale": ln_scale, "ln_bias": ln_bias}


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array) -> jax.Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + 1e-5)
    return (x - mean) * inv * scale + bias


def apply_projection_head(
    params: Dict[str, list],
    x: jax.Array,
    *,
    dropout_rate: float = 0.0,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
) -> jax.Array:
    linears = params["linears"]
    n_ln = len(params["ln_scale"])
    y = x
    for i, w in enumerate(linears):
        y = jnp.dot(
            y.astype(compute_dtype), w.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        if i < n_ln:  # every layer except the last: GELU -> LayerNorm
            y = jax.nn.gelu(y, approximate=False)
            y = _layer_norm(y, params["ln_scale"][i], params["ln_bias"][i])
    if train and dropout_rate > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, y.shape)
        y = jnp.where(keep, y / (1.0 - dropout_rate), 0.0)
    return y
