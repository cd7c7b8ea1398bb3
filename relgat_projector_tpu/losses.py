"""Ranking + reconstruction losses, all jittable pure functions.

Parity with the reference loss stack:
- margin ranking: ``relu(margin + neg - pos).mean()`` with pos broadcast to
  ``[B, K]`` (``core/loss/relgat_loss.py:51-54``),
- RotatE-style self-adversarial: ``-logsigmoid(pos).mean()
  - (softmax(alpha * neg, 1) * logsigmoid(-neg)).sum(1).mean()`` with the
  weights detached (``relgat_loss.py:56-71``),
- cosine reconstruction ``(1 - cos(pred, target)).mean()`` with L2-normalize
  on the last dim (``loss/cosine.py:6-13``),
- MSE reconstruction (``loss/mse.py:6-10``),
- multi-objective weighted sum normalized by the sum of ACTIVE weights
  (``loss/multi_objective_loss.py:47-83``).

Canonical layout fix (SURVEY.md §3 quirk 1): negatives are always ``[B, K]``
/ ``[B, K, D]`` end-to-end. The reference mixed a K-major collation with a
B-major view on the projection path, mispairing negatives across positives;
here one layout is used everywhere, so self-adversarial weighting and
per-row MRR pair correctly.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from relgat_projector_tpu.models.scorer import l2_normalize


def _row_mean(x: jax.Array, weights: Optional[jax.Array]) -> jax.Array:
    """Mean over all elements, optionally weighted per leading-dim row.

    With ``weights=None`` this is ``jnp.mean(x)`` (exact reference parity);
    with a 0/1 row mask it is the mean over valid rows only — used for the
    padded final batch under static shapes (no reference counterpart; the
    reference's DataLoader emits a smaller ragged last batch)."""
    if weights is None:
        return jnp.mean(x)
    w = weights.reshape(weights.shape + (1,) * (x.ndim - 1))
    denom = jnp.maximum(jnp.sum(weights), 1.0) * (x.size / x.shape[0])
    return jnp.sum(x * w) / denom


def margin_ranking_loss(
    pos_score: jax.Array,  # [B]
    neg_score: jax.Array,  # [B, K]
    margin: float,
    weights: Optional[jax.Array] = None,
) -> jax.Array:
    return _row_mean(
        jax.nn.relu(margin + neg_score - pos_score[:, None]), weights
    )


def self_adversarial_loss(
    pos_score: jax.Array,  # [B]
    neg_score: jax.Array,  # [B, K]
    alpha: float,
    weights: Optional[jax.Array] = None,
) -> jax.Array:
    adv = jax.lax.stop_gradient(jax.nn.softmax(alpha * neg_score, axis=1))
    pos_loss = _row_mean(-jax.nn.log_sigmoid(pos_score), weights)
    neg_loss = _row_mean(
        -jnp.sum(adv * jax.nn.log_sigmoid(-neg_score), axis=1), weights
    )
    return pos_loss + neg_loss


def ranking_loss(
    pos_score: jax.Array,
    neg_score: jax.Array,
    *,
    use_self_adv_neg: bool,
    margin: float = 1.0,
    self_adv_alpha: float = 1.0,
    weights: Optional[jax.Array] = None,
) -> jax.Array:
    """Loss-mode dispatch (reference ``relgat_loss.py:46-49``)."""
    if use_self_adv_neg:
        return self_adversarial_loss(pos_score, neg_score, self_adv_alpha, weights)
    return margin_ranking_loss(pos_score, neg_score, margin, weights)


def cosine_loss(
    pred: jax.Array,
    target: jax.Array,
    weights: Optional[jax.Array] = None,
) -> jax.Array:
    """``(1 - cos).mean()`` with broadcasting (e.g. pred ``[B, D]`` against
    target ``[B, K, D]`` -> mean over ``[B, K]``)."""
    pred_n = l2_normalize(pred)
    tgt_n = l2_normalize(target)
    if pred_n.ndim < tgt_n.ndim:
        pred_n = jnp.expand_dims(pred_n, axis=tuple(range(1, tgt_n.ndim - 1)))
    cos = jnp.sum(pred_n * tgt_n, axis=-1)
    return _row_mean(1.0 - cos, weights)


def mse_loss(
    a: jax.Array, b: jax.Array, weights: Optional[jax.Array] = None
) -> jax.Array:
    return _row_mean(jnp.square(a - b), weights)


class MultiObjectiveParts(NamedTuple):
    total: jax.Array
    ranking: jax.Array
    cosine_pos: jax.Array
    cosine_neg: jax.Array
    mse: jax.Array


def multi_objective_loss(
    *,
    pos_score: jax.Array,        # [B]
    neg_score: jax.Array,        # [B, K]
    transformed_src: jax.Array,  # [B, D]  f_r(A)
    dst_vec: jax.Array,          # [B, D]  B
    neg_dst_vec: Optional[jax.Array],  # [B, K, D]
    relgat_weight: float = 1.0,
    pos_cosine_weight: float = 1.0,
    neg_cosine_weight: float = 1.0,
    mse_weight: float = 0.0,
    use_self_adv_neg: bool = False,
    margin: float = 1.0,
    self_adv_alpha: float = 1.0,
    weights: Optional[jax.Array] = None,
) -> MultiObjectiveParts:
    """Weighted combination normalized by the sum of active weights.

    The negative-cosine term is ``w * (1 - CosineLoss) = w * mean(cos)`` —
    pushes the transformed source AWAY from negatives (reference
    ``multi_objective_loss.py:66-74``, added in v0.2.1).
    """
    rank = ranking_loss(
        pos_score, neg_score,
        use_self_adv_neg=use_self_adv_neg,
        margin=margin,
        self_adv_alpha=self_adv_alpha,
        weights=weights,
    )
    cos_pos = cosine_loss(transformed_src, dst_vec, weights)
    cos_neg = (
        cosine_loss(transformed_src, neg_dst_vec, weights)
        if neg_dst_vec is not None
        else jnp.asarray(1.0, pos_score.dtype)
    )
    mse = mse_loss(transformed_src, dst_vec, weights)

    parts = []
    weight_sum = 0.0
    if relgat_weight != 0.0:
        parts.append(relgat_weight * rank)
        weight_sum += relgat_weight
    if pos_cosine_weight != 0.0:
        parts.append(pos_cosine_weight * cos_pos)
        weight_sum += pos_cosine_weight
    if neg_cosine_weight != 0.0:
        parts.append(neg_cosine_weight * (1.0 - cos_neg))
        weight_sum += neg_cosine_weight
    if mse_weight != 0.0:
        parts.append(mse_weight * mse)
        weight_sum += mse_weight
    if not parts:
        raise ValueError("At least one loss weight must be non-zero.")
    total = sum(parts) / weight_sum
    return MultiObjectiveParts(
        total=total, ranking=rank, cosine_pos=cos_pos, cosine_neg=cos_neg, mse=mse
    )


def sanitize_scores(scores: jax.Array) -> jax.Array:
    """NaN -> 0, -inf -> -1e9, +inf -> 1e9 (reference ``trainer:584,647-648``)."""
    scores = jnp.where(jnp.isnan(scores), 0.0, scores)
    return jnp.clip(scores, -1e9, 1e9)
