"""Segment primitives — the XLA baseline ops layer.

These are the TPU-native equivalents of the three ``torch-scatter``
primitives the reference consumes (``core/model/layer.py:284,290,308,316``):
``scatter_max`` / ``scatter_add`` over edge destinations. On TPU, scatters
over a dst-sorted edge layout lower to efficient sorted-segment reductions;
the Pallas fused kernels in ``ops/pallas`` are validated against these.

Numerics match the reference exactly:
- stable softmax subtracts the true per-destination max
  (reference ``layer.py:284-288``),
- the denominator is clamped at ``1e-16``
  (``STABLE_SOFTMAX_EPS``, reference ``layer.py:85,291``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Parity: reference ``core/model/layer.py:85``.
STABLE_SOFTMAX_EPS = 1e-16


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Sum ``data`` rows into ``num_segments`` buckets by ``segment_ids``.

    Equivalent of ``torch_scatter.scatter_add(data, dst, dim=0, dim_size=N)``
    (reference ``layer.py:290,308,316``). Empty segments yield 0.
    """
    return jax.ops.segment_sum(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_max(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Per-segment maximum; empty segments yield ``-inf``.

    Equivalent of ``torch_scatter.scatter_max`` (reference ``layer.py:284``)
    up to the empty-segment fill value (torch-scatter fills 0, we fill -inf;
    the value is only ever gathered back per edge so empty segments are
    unobservable — see tests/test_ops.py).
    """
    return jax.ops.segment_max(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_softmax(
    scores: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    eps: float = STABLE_SOFTMAX_EPS,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Numerically-stable softmax over segments (per destination node).

    For each segment ``d``:  ``alpha_e = exp(s_e - max_d) / max(sum_d, eps)``.

    Parity with reference ``layer.py:280-293`` (scatter_max -> subtract ->
    exp -> scatter_add -> clamp_min(1e-16) -> divide). Works on ``[E]`` or
    ``[E, H]`` scores (heads vectorized, unlike the reference's per-head
    Python loop at ``layer.py:281``).
    """
    max_per_seg = segment_max(
        scores, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    # Segments whose every score is -inf (all edges masked) would yield
    # -inf - -inf = NaN; clamp the subtracted max to a finite value so
    # exp(-inf - 0) = 0 instead.
    max_safe = jnp.where(jnp.isfinite(max_per_seg), max_per_seg, 0.0)
    shifted = scores - max_safe[segment_ids]
    w = jnp.exp(shifted)
    denom = segment_sum(
        w, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    denom = jnp.maximum(denom, eps)
    return w / denom[segment_ids]
