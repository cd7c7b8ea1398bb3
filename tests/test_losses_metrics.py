"""Golden tests: ranking/reconstruction losses, multi-objective combiner,
MRR/Hits metrics, LR schedules — vs torch re-derivations of the reference."""

import numpy as np
import jax.numpy as jnp
import torch
import pytest

from relgat_projector_tpu import losses, metrics
from relgat_projector_tpu.schedules import (
    compute_total_and_warmup_steps,
    make_lr_schedule,
)

from tests import reference_impl as ref


def _rand(shape, seed):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_margin_ranking_loss_parity():
    pos, neg = _rand(16, 0), _rand((16, 4), 1)
    got = losses.margin_ranking_loss(jnp.asarray(pos), jnp.asarray(neg), 1.0)
    want = ref.margin_loss(torch.tensor(pos), torch.tensor(neg), 1.0)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_self_adversarial_loss_parity():
    pos, neg = _rand(16, 2), _rand((16, 8), 3)
    for alpha in (0.5, 1.0, 2.0):
        got = losses.self_adversarial_loss(
            jnp.asarray(pos), jnp.asarray(neg), alpha
        )
        want = ref.self_adv_loss(torch.tensor(pos), torch.tensor(neg), alpha)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_cosine_and_mse_parity():
    a, b = _rand((16, 32), 4), _rand((16, 32), 5)
    got = losses.cosine_loss(jnp.asarray(a), jnp.asarray(b))
    want = ref.cosine_loss(torch.tensor(a), torch.tensor(b))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    got = losses.mse_loss(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(
        float(got), float(torch.nn.functional.mse_loss(torch.tensor(a), torch.tensor(b))),
        rtol=1e-6,
    )


def test_cosine_loss_broadcast_neg_batch():
    """pred [B,D] against neg targets [B,K,D] -> mean over B*K, matching the
    reference's broadcast (there [K,B,D]; same mean by symmetry)."""
    pred, negt = _rand((8, 16), 6), _rand((8, 5, 16), 7)
    got = losses.cosine_loss(jnp.asarray(pred), jnp.asarray(negt))
    # torch oracle: [K,B,D] layout like reference trainer:634-642
    want = ref.cosine_loss(
        torch.tensor(pred), torch.tensor(np.transpose(negt, (1, 0, 2)))
    )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_multi_objective_weight_normalization():
    pos, neg = _rand(8, 8), _rand((8, 4), 9)
    t, d, nd = _rand((8, 16), 10), _rand((8, 16), 11), _rand((8, 4, 16), 12)

    out = losses.multi_objective_loss(
        pos_score=jnp.asarray(pos), neg_score=jnp.asarray(neg),
        transformed_src=jnp.asarray(t), dst_vec=jnp.asarray(d),
        neg_dst_vec=jnp.asarray(nd),
        relgat_weight=2.0, pos_cosine_weight=1.0,
        neg_cosine_weight=0.0, mse_weight=0.0, margin=1.0,
    )
    rank = float(losses.margin_ranking_loss(jnp.asarray(pos), jnp.asarray(neg), 1.0))
    cosp = float(losses.cosine_loss(jnp.asarray(t), jnp.asarray(d)))
    np.testing.assert_allclose(
        float(out.total), (2.0 * rank + 1.0 * cosp) / 3.0, rtol=1e-6
    )
    # neg-cosine term enters as w*(1 - loss) (reference multi_objective_loss.py:66-74)
    out2 = losses.multi_objective_loss(
        pos_score=jnp.asarray(pos), neg_score=jnp.asarray(neg),
        transformed_src=jnp.asarray(t), dst_vec=jnp.asarray(d),
        neg_dst_vec=jnp.asarray(nd),
        relgat_weight=0.0, pos_cosine_weight=0.0,
        neg_cosine_weight=1.0, mse_weight=0.0,
    )
    cosn = float(losses.cosine_loss(jnp.asarray(t), jnp.asarray(nd)))
    np.testing.assert_allclose(float(out2.total), 1.0 - cosn, rtol=1e-5)


def test_multi_objective_all_zero_raises():
    with pytest.raises(ValueError):
        losses.multi_objective_loss(
            pos_score=jnp.zeros(4), neg_score=jnp.zeros((4, 2)),
            transformed_src=jnp.zeros((4, 8)), dst_vec=jnp.zeros((4, 8)),
            neg_dst_vec=None,
            relgat_weight=0.0, pos_cosine_weight=0.0,
            neg_cosine_weight=0.0, mse_weight=0.0,
        )


def test_weighted_losses_equal_truncated_batch():
    """Masked padded batch == plain loss on the real prefix."""
    pos, neg = _rand(8, 13), _rand((8, 4), 14)
    w = np.array([1, 1, 1, 1, 1, 0, 0, 0], np.float32)
    got = losses.margin_ranking_loss(
        jnp.asarray(pos), jnp.asarray(neg), 1.0, weights=jnp.asarray(w)
    )
    want = losses.margin_ranking_loss(jnp.asarray(pos[:5]), jnp.asarray(neg[:5]), 1.0)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)

    got = losses.self_adversarial_loss(
        jnp.asarray(pos), jnp.asarray(neg), 1.0, weights=jnp.asarray(w)
    )
    want = losses.self_adversarial_loss(jnp.asarray(pos[:5]), jnp.asarray(neg[:5]), 1.0)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_mrr_hits_parity_and_ties():
    pos, neg = _rand(32, 15), _rand((32, 6), 16)
    got_mrr, got_hits = metrics.compute_mrr_hits(
        jnp.asarray(pos), jnp.asarray(neg), (1, 3, 6)
    )
    want_mrr, want_hits = ref.compute_mrr_hits(
        torch.tensor(pos), torch.tensor(neg), (1, 3, 6)
    )
    np.testing.assert_allclose(float(got_mrr), want_mrr, rtol=1e-6)
    for k in (1, 3, 6):
        np.testing.assert_allclose(float(got_hits[k]), want_hits[k], rtol=1e-6)

    # pessimistic ties: neg == pos counts as worse rank
    pos = jnp.asarray([1.0, 2.0])
    neg = jnp.asarray([[1.0, 0.5], [3.0, 2.0]])
    ranks = np.asarray(metrics.compute_ranks(pos, neg))
    np.testing.assert_array_equal(ranks, [2.0, 3.0])


def test_mrr_nan_sanitization():
    pos = jnp.asarray([np.nan, 1.0])
    neg = jnp.asarray([[0.0, 0.0], [np.inf, -np.inf]])
    mrr, hits = metrics.compute_mrr_hits(pos, neg, (1,))
    assert np.isfinite(float(mrr))
    # row0: pos=-1e9, both negs >= -> rank 3; row1: +inf neg -> 1e9 >= 1 -> rank 2
    ranks = np.asarray(metrics.compute_ranks(pos, neg))
    np.testing.assert_array_equal(ranks, [3.0, 2.0])


def test_lr_schedules_match_reference_lambdas():
    total, warmup = 1000, 100
    for sched in ("linear", "cosine", "constant"):
        for decay in (1.0, 0.999):
            f = make_lr_schedule(1.0, sched, total, warmup, decay)
            for step in (0, 1, 50, 100, 101, 500, 999, 1000):
                want = ref.lr_lambda(step, sched, total, warmup, decay)
                np.testing.assert_allclose(
                    float(f(step)), want, rtol=1e-4, atol=1e-6,
                    err_msg=f"{sched} decay={decay} step={step}",
                )


def test_total_and_warmup_steps():
    total, warmup = compute_total_and_warmup_steps(1000, 128, 10, None)
    assert total == 8 * 10  # ceil(1000/128)=8
    assert warmup == 8      # 10% of 80
    # clamp to total-1 (reference lr.py:104)
    total, warmup = compute_total_and_warmup_steps(10, 10, 1, 100)
    assert total == 1 and warmup == 0
