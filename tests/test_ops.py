"""Golden tests for the segment ops layer vs NumPy derivations of the
reference semantics (SURVEY.md §4 plan item 1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from relgat_projector_tpu.ops import (
    STABLE_SOFTMAX_EPS,
    sample_negative_dst,
    segment_max,
    segment_softmax,
    segment_sum,
)


def _np_segment_sum(data, ids, n):
    out = np.zeros((n,) + data.shape[1:], dtype=data.dtype)
    np.add.at(out, ids, data)
    return out


def test_segment_sum_matches_numpy():
    rng = np.random.default_rng(0)
    data = rng.standard_normal((200, 3)).astype(np.float32)
    ids = rng.integers(0, 17, 200)
    got = segment_sum(jnp.asarray(data), jnp.asarray(ids), 17)
    np.testing.assert_allclose(got, _np_segment_sum(data, ids, 17), rtol=1e-5, atol=1e-5)


def test_segment_max_matches_numpy():
    rng = np.random.default_rng(1)
    data = rng.standard_normal(300).astype(np.float32)
    ids = rng.integers(0, 11, 300)
    got = np.asarray(segment_max(jnp.asarray(data), jnp.asarray(ids), 12))
    for s in range(11):
        mask = ids == s
        if mask.any():
            assert got[s] == pytest.approx(data[mask].max(), rel=1e-6)
    # empty segment -> -inf identity
    assert got[11] == -np.inf


def test_segment_softmax_reference_semantics():
    """exp(e - max_dst) / clamp(sum, 1e-16), rows sum to 1 per destination."""
    rng = np.random.default_rng(2)
    e = (rng.standard_normal(500) * 10).astype(np.float32)
    ids = np.sort(rng.integers(0, 40, 500)).astype(np.int32)
    alpha = np.asarray(
        segment_softmax(jnp.asarray(e), jnp.asarray(ids), 40, indices_are_sorted=True)
    )
    # NumPy rederivation of reference layer.py:280-293
    mx = np.full(40, -np.inf, np.float32)
    np.maximum.at(mx, ids, e)
    w = np.exp(e - mx[ids])
    denom = np.maximum(_np_segment_sum(w, ids, 40), STABLE_SOFTMAX_EPS)
    np.testing.assert_allclose(alpha, w / denom[ids], rtol=1e-5, atol=1e-6)
    sums = _np_segment_sum(alpha, ids, 40)
    present = np.isin(np.arange(40), ids)
    np.testing.assert_allclose(sums[present], 1.0, rtol=1e-5)


def test_segment_softmax_multihead_shape():
    rng = np.random.default_rng(3)
    e = rng.standard_normal((128, 4)).astype(np.float32)
    ids = rng.integers(0, 10, 128)
    alpha = segment_softmax(jnp.asarray(e), jnp.asarray(ids), 10)
    assert alpha.shape == (128, 4)
    sums = np.asarray(segment_sum(alpha, jnp.asarray(ids), 10))
    present = np.isin(np.arange(10), ids)
    np.testing.assert_allclose(sums[present], 1.0, rtol=1e-5)


def test_segment_softmax_extreme_scores_stable():
    e = jnp.asarray([1e4, 1e4 - 1.0, -1e4, 500.0], jnp.float32)
    ids = jnp.asarray([0, 0, 0, 1])
    alpha = np.asarray(segment_softmax(e, ids, 2))
    assert np.all(np.isfinite(alpha))
    np.testing.assert_allclose(alpha[3], 1.0, rtol=1e-6)
    np.testing.assert_allclose(alpha[0] + alpha[1] + alpha[2], 1.0, rtol=1e-5)


def test_permutation_invariance():
    """Edge order must not change segment results (SURVEY §4 property test)."""
    rng = np.random.default_rng(4)
    e = rng.standard_normal(256).astype(np.float32)
    ids = rng.integers(0, 13, 256)
    perm = rng.permutation(256)
    a1 = np.asarray(segment_softmax(jnp.asarray(e), jnp.asarray(ids), 13))
    a2 = np.asarray(segment_softmax(jnp.asarray(e[perm]), jnp.asarray(ids[perm]), 13))
    np.testing.assert_allclose(a1[perm], a2, rtol=1e-5, atol=1e-6)


def test_negative_sampling_never_hits_true_dst():
    rng = jax.random.PRNGKey(0)
    dst = jnp.asarray(np.random.default_rng(5).integers(0, 50, 512), jnp.int32)
    neg = np.asarray(sample_negative_dst(rng, dst, num_nodes=50, num_neg=16))
    assert neg.shape == (512, 16)
    assert (neg >= 0).all() and (neg < 50).all()
    assert not np.any(neg == np.asarray(dst)[:, None])


def test_negative_sampling_uniform_over_others():
    rng = jax.random.PRNGKey(1)
    dst = jnp.zeros(20000, jnp.int32)  # true dst = 0 everywhere
    neg = np.asarray(sample_negative_dst(rng, dst, num_nodes=5, num_neg=4)).ravel()
    counts = np.bincount(neg, minlength=5)
    assert counts[0] == 0
    expected = neg.size / 4
    np.testing.assert_allclose(counts[1:], expected, rtol=0.05)
