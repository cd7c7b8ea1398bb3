"""Ranking metrics: sampled-negative MRR and Hits@K, jittable.

Parity with reference ``core/eval.py:7-37``:
- pessimistic ties: ``rank = 1 + count(neg >= pos)``,
- sanitization: NaN and -inf -> -1e9, +inf -> 1e9,
- metrics are against the batch's own K sampled negatives (not full-entity
  filtered ranking) — documented reference behavior (SURVEY.md §3 quirk 7).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def _sanitize(x: jax.Array) -> jax.Array:
    x = jnp.where(jnp.isnan(x), -1e9, x)
    return jnp.clip(x, -1e9, 1e9)


def compute_ranks(
    pos_score: jax.Array,  # [B]
    neg_score: jax.Array,  # [B, K]
    *,
    pessimistic: bool = True,
) -> jax.Array:
    pos = _sanitize(pos_score)
    neg = _sanitize(neg_score)
    if pessimistic:
        worse_or_equal = (neg >= pos[:, None]).astype(pos.dtype)
    else:
        worse_or_equal = (neg > pos[:, None]).astype(pos.dtype)
    return 1.0 + jnp.sum(worse_or_equal, axis=1)


def compute_mrr_hits(
    pos_score: jax.Array,
    neg_score: jax.Array,
    ks: Tuple[int, ...],
    *,
    pessimistic: bool = True,
    weights: jax.Array = None,
) -> Tuple[jax.Array, Dict[int, jax.Array]]:
    """Returns ``(mrr, {k: hits@k})`` as scalar arrays (empty batch -> 0).

    ``weights`` is an optional 0/1 example mask for padded batches (no
    reference counterpart; with ``weights=None`` this is exact parity)."""
    b = pos_score.shape[0]
    if b == 0:
        zero = jnp.asarray(0.0)
        return zero, {k: zero for k in ks}

    if weights is None:
        wmean = jnp.mean
    else:
        denom = jnp.maximum(jnp.sum(weights), 1.0)

        def wmean(x):
            return jnp.sum(x * weights) / denom

    ranks = compute_ranks(pos_score, neg_score, pessimistic=pessimistic)
    mrr = wmean(1.0 / jnp.maximum(ranks, 1.0))
    hits = {
        k: wmean((ranks <= float(k)).astype(pos_score.dtype)) for k in ks
    }
    return mrr, hits
