"""Parity tests: scorers, relation operators, projection head."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from relgat_projector_tpu.models import scorer as sc
from relgat_projector_tpu.models.projection import (
    apply_projection_head,
    init_projection_head,
)

from tests import reference_impl as ref


def _rand(shape, seed):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_distmult_score_and_transform():
    src, dst = _rand((32, 16), 0), _rand((32, 16), 1)
    rel_emb = _rand((5, 16), 2)
    rel_ids = np.random.default_rng(3).integers(0, 5, 32)
    params = {"rel_emb": jnp.asarray(rel_emb)}

    got = sc.score_triplets(
        params, "distmult", jnp.asarray(src), jnp.asarray(rel_ids), jnp.asarray(dst)
    )
    want = ref.distmult_score(
        torch.tensor(src), torch.tensor(rel_emb), torch.tensor(rel_ids),
        torch.tensor(dst),
    )
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-6)

    got_t = sc.transform(params, "distmult", jnp.asarray(src), jnp.asarray(rel_ids))
    np.testing.assert_allclose(got_t, src * rel_emb[rel_ids], rtol=1e-5, atol=1e-6)


def test_l2_normalize_zero_row_values_and_gradient():
    """Values match torch F.normalize on zero AND nonzero rows; the
    gradient at a zero row is exactly 0 (deliberate fix vs the reference,
    whose clamp backprops 1/eps = 1e12 through zero rows — produced by
    zero-in-degree nodes at init — so one isolated node nuked the global
    grad norm)."""
    x = np.vstack([_rand((3, 8), 11), np.zeros((2, 8), np.float32)])
    got = np.asarray(sc.l2_normalize(jnp.asarray(x)))
    want = torch.nn.functional.normalize(torch.tensor(x), p=2, dim=-1)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-6, atol=1e-7)

    def loss(v):
        return jnp.sum(jnp.sin(sc.l2_normalize(v)))

    g = np.asarray(jax.grad(loss)(jnp.asarray(x)))
    assert np.all(np.isfinite(g))
    np.testing.assert_array_equal(g[3:], 0.0)     # zero rows: zero grad
    assert np.abs(g[:3]).max() < 10.0             # nonzero rows: sane

    # NaN rows must still PROPAGATE (the trainer's non-finite skip-step
    # detection relies on it) — the zero branch must not swallow them.
    x_nan = x.copy()
    x_nan[0, 0] = np.nan
    got_nan = np.asarray(sc.l2_normalize(jnp.asarray(x_nan)))
    assert np.isnan(got_nan[0]).any()


def test_transe_score_and_transform_normalized():
    src, dst = _rand((32, 16), 4), _rand((32, 16), 5)
    rel_emb = _rand((5, 16), 6)
    rel_ids = np.random.default_rng(7).integers(0, 5, 32)
    params = {"rel_emb": jnp.asarray(rel_emb)}

    got = sc.score_triplets(
        params, "transe", jnp.asarray(src), jnp.asarray(rel_ids), jnp.asarray(dst)
    )
    want = ref.transe_score(
        torch.tensor(src), torch.tensor(rel_emb), torch.tensor(rel_ids),
        torch.tensor(dst), normalize=True,
    )
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-5)

    got_t = np.asarray(
        sc.transform(params, "transe", jnp.asarray(src), jnp.asarray(rel_ids))
    )
    want_t = (
        torch.nn.functional.normalize(torch.tensor(src), p=2, dim=-1)
        + torch.nn.functional.normalize(
            torch.tensor(rel_emb[rel_ids]), p=2, dim=-1
        )
    ).numpy()
    np.testing.assert_allclose(got_t, want_t, rtol=1e-5, atol=1e-6)


def test_projection_head_identity_and_linear():
    # num_layers=0 with equal dims -> identity
    p = init_projection_head(jax.random.PRNGKey(0), 16, 16, 0)
    x = jnp.asarray(_rand((4, 16), 8))
    np.testing.assert_array_equal(apply_projection_head(p, x), x)
    # num_layers=0 with different dims -> single linear
    p = init_projection_head(jax.random.PRNGKey(0), 16, 8, 0)
    assert len(p["linears"]) == 1 and p["linears"][0].shape == (16, 8)
    # num_layers=1 -> single linear
    p = init_projection_head(jax.random.PRNGKey(0), 16, 8, 1)
    y = apply_projection_head(p, x)
    np.testing.assert_allclose(
        y, np.asarray(x) @ np.asarray(p["linears"][0]), rtol=1e-5, atol=1e-6
    )


def test_projection_head_mlp_parity_with_torch():
    """num_layers>=2: Linear->GELU->LayerNorm blocks + final Linear
    (reference projection.py:48-67)."""
    in_dim, hidden, out_dim, L = 24, 20, 12, 3
    p = init_projection_head(
        jax.random.PRNGKey(1), in_dim, out_dim, L, hidden_dim=hidden
    )
    assert len(p["linears"]) == L and len(p["ln_scale"]) == L - 1
    x = _rand((6, in_dim), 9)
    got = np.asarray(apply_projection_head(p, jnp.asarray(x)))

    linears = [torch.tensor(np.asarray(w).T) for w in p["linears"]]
    ln = [
        (torch.tensor(np.asarray(s)), torch.tensor(np.asarray(b)))
        for s, b in zip(p["ln_scale"], p["ln_bias"])
    ]
    want = ref.projection_head_forward(torch.tensor(x), linears, ln).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_projection_default_hidden_is_in_dim():
    p = init_projection_head(jax.random.PRNGKey(2), 24, 12, 2, hidden_dim=0)
    assert p["linears"][0].shape == (24, 24)
    assert p["linears"][1].shape == (24, 12)
