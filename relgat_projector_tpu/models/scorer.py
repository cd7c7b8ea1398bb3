"""Triplet scorers and relation operators (DistMult / TransE).

Parity with reference ``core/scorer.py``:
- DistMult: ``score = (s * r * d).sum(-1)``; ``transform(s, r) = s * r``
  (``scorer.py:58-94``).
- TransE: ``score = -||s + r - d||_2`` with optional L2 normalization of all
  three inputs (the model always builds it with ``normalize=True``,
  reference ``model.py:92-95``); ``transform(s, r) = norm(s) + norm(r)``
  (``scorer.py:154-201``).

Relation embeddings are Xavier-uniform ``[num_rel, rel_dim]``. The
``transform`` operator is the framework's relation-path composition /
query-expansion primitive (compose by repeated application).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from relgat_projector_tpu.models.initializers import xavier_uniform

# torch F.normalize eps (``F.normalize(p=2, dim=-1)`` default).
_NORMALIZE_EPS = 1e-12


def init_scorer(
    rng: jax.Array, num_rel: int, rel_dim: int, *, dtype=jnp.float32
) -> Dict[str, jax.Array]:
    return {
        "rel_emb": xavier_uniform(
            rng, (num_rel, rel_dim), fan_in=rel_dim, fan_out=num_rel, dtype=dtype
        )
    }


def l2_normalize(x: jax.Array, eps: float = _NORMALIZE_EPS) -> jax.Array:
    """torch ``F.normalize(p=2)`` values: ``x / max(||x||, eps)`` — with a
    true ZERO gradient at zero rows (deliberate fix vs the reference).

    Zero rows are real here: zero-in-degree nodes aggregate to exactly zero
    and (at init, with zero LayerNorm biases) project to exactly zero, then
    get gathered into cosine/TransE terms. torch's clamp keeps the VALUE
    finite but backprops ``1/eps = 1e12`` through the zero row — one
    isolated node in a batch inflates the global grad norm ~1e9x and
    clipping then erases the step's real signal. ``normalize`` is genuinely
    non-differentiable at 0; selecting the constant-zero branch makes AD
    return the sane subgradient 0 there. Values are bit-identical to torch
    for every input (the branches only differ below ``||x|| = 1e-12``,
    where both yield 0 in fp32 forward).
    """
    sq = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    out = x / jnp.sqrt(jnp.maximum(sq, eps * eps))
    # NB ``~(sq <= eps^2)``, not ``sq > eps^2``: NaN rows must take the
    # propagate branch so non-finite inputs still surface in the loss (the
    # trainer's skip-step detection depends on it).
    return jnp.where(sq <= eps * eps, jnp.zeros_like(x), out)


def safe_l2_norm(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """``||x||_2`` along the last axis with a zero (not NaN) gradient at 0."""
    sq = jnp.sum(jnp.square(x), axis=-1)
    return jnp.sqrt(jnp.maximum(sq, eps * eps))


def score_triplets(
    params: Dict[str, jax.Array],
    scorer_type: str,
    src_vec: jax.Array,  # [..., D]
    rel_ids: jax.Array,  # [...]
    dst_vec: jax.Array,  # [..., D]
) -> jax.Array:
    """Scores ``[...]``; higher = more plausible."""
    rel = jnp.take(params["rel_emb"], rel_ids, axis=0)
    if scorer_type == "distmult":
        return jnp.sum(src_vec * rel * dst_vec, axis=-1)
    elif scorer_type == "transe":
        s = l2_normalize(src_vec)
        r = l2_normalize(rel)
        d = l2_normalize(dst_vec)
        return -safe_l2_norm(s + r - d)
    raise ValueError(f"Unknown scorer_type: {scorer_type}")


def transform(
    params: Dict[str, jax.Array],
    scorer_type: str,
    src_vec: jax.Array,  # [..., D]
    rel_ids: jax.Array,  # [...] (broadcastable against src batch)
) -> jax.Array:
    """Relation operator ``f_r``: DistMult ``s * r``; TransE ``n(s) + n(r)``."""
    rel = jnp.take(params["rel_emb"], rel_ids, axis=0)
    if scorer_type == "distmult":
        return src_vec * rel
    elif scorer_type == "transe":
        return l2_normalize(src_vec) + l2_normalize(rel)
    raise ValueError(f"Unknown scorer_type: {scorer_type}")
