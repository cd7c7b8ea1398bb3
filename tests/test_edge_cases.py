"""Robustness edge cases: tiny graphs, K=1 negatives, self-loops,
single-relation graphs, ragged final batches through the full step."""

import numpy as np
import jax
import jax.numpy as jnp

from relgat_projector_tpu.config import ModelConfig, TrainConfig
from relgat_projector_tpu.data.graph import build_graph, pad_node_embeddings
from relgat_projector_tpu.models.model import init_model, single_gat_step
from relgat_projector_tpu.ops.relgat_ops import relgat_propagate
from relgat_projector_tpu.ops.pallas import relgat_propagate_pallas
from relgat_projector_tpu.schedules import make_lr_schedule
from relgat_projector_tpu.train.state import create_train_state, make_optimizer
from relgat_projector_tpu.train.step import make_train_step


def test_self_loops_and_multi_edges():
    """Self loops and duplicate edges are legal graph content."""
    src = np.array([0, 0, 0, 1, 2], np.int32)
    dst = np.array([0, 0, 1, 1, 2], np.int32)
    et = np.array([0, 1, 0, 1, 0], np.int32)
    g = build_graph(src, dst, et, num_nodes=3)
    rng = np.random.default_rng(0)
    x = jnp.asarray(pad_node_embeddings(
        rng.standard_normal((3, 8)).astype(np.float32), g.num_nodes))
    attn = jnp.asarray((rng.standard_normal((2, 2, 4)) * 0.3).astype(np.float32))
    h = jnp.einsum("ni,hio->nho", x,
                   jnp.asarray(rng.standard_normal((2, 8, 4)).astype(np.float32) * 0.3))
    out = relgat_propagate(h, attn, None, g.src, g.dst, g.etype,
                           num_nodes=g.num_nodes)
    assert np.isfinite(np.asarray(out)).all()
    # node 2 has exactly one (self) edge -> alpha = 1 -> out = its projection
    np.testing.assert_allclose(
        np.asarray(out)[2], np.asarray(h)[2], rtol=1e-5
    )


def test_single_relation_graph_pallas():
    rng = np.random.default_rng(1)
    n, e = 40, 200
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    et = np.zeros(e, np.int32)
    g = build_graph(src, dst, et, num_nodes=n, blocked=True,
                    block_nodes=16, chunk_edges=64)
    h = jnp.asarray(rng.standard_normal((g.num_nodes, 2, 8)).astype(np.float32))
    attn = jnp.asarray((rng.standard_normal((2, 1, 8)) * 0.3).astype(np.float32))
    want = relgat_propagate(h, attn, None, g.src, g.dst, g.etype,
                            num_nodes=g.num_nodes)
    got = relgat_propagate_pallas(h, attn, None, g.blocked)
    # Compare REAL rows only: the plain layout routes its padded edges into
    # the padded absorber row (garbage there by design); the blocked layout
    # leaves it zero. Neither is observable by real computation.
    np.testing.assert_allclose(np.asarray(got)[:n], np.asarray(want)[:n],
                               rtol=1e-4, atol=1e-5)


def test_train_step_k1_and_ragged_batch():
    """num_neg=1 and a mostly-padded batch keep the step finite and
    weighted means correct."""
    rng = np.random.default_rng(2)
    n, e, r, d = 50, 250, 3, 12
    g = build_graph(rng.integers(0, n, e), rng.integers(0, n, e),
                    rng.integers(0, r, e), num_nodes=n)
    x = jnp.asarray(pad_node_embeddings(
        rng.standard_normal((n, d)).astype(np.float32), g.num_nodes))
    cfg = ModelConfig(in_dim=d, num_rel=r, gat_out_dim=4, gat_heads=2,
                      gat_num_layers=1, dropout=0.0,
                      project_to_input_size=True, projection_layers=1)
    tc = TrainConfig(train_batch_size=32, num_neg=1, lr=1e-3,
                     lr_scheduler="constant", warmup_steps=0,
                     eval_ks_ranks=(1,))
    sched = make_lr_schedule(tc.lr, "constant", 10, 0)
    opt = make_optimizer(tc, sched)
    params = init_model(jax.random.PRNGKey(0), cfg)
    state = create_train_state(params, opt, jax.random.PRNGKey(1))
    step = make_train_step(cfg, tc, opt, sched)

    w = np.zeros(32, np.float32)
    w[:3] = 1.0  # only 3 real examples
    state, m = step(
        state, x, g,
        jnp.asarray(rng.integers(0, n, 32), jnp.int32),
        jnp.asarray(rng.integers(0, r, 32), jnp.int32),
        jnp.asarray(rng.integers(0, n, 32), jnp.int32),
        jnp.asarray(w),
    )
    assert bool(m["finite"])
    assert np.isfinite(float(m["loss"]))
    assert 0.0 <= float(m["mrr"]) <= 1.0


def test_dense_hub_node_pallas():
    """One node receiving most edges (hub) spans many chunks of one block."""
    rng = np.random.default_rng(3)
    n, e = 64, 2000
    src = rng.integers(0, n, e).astype(np.int32)
    dst = np.full(e, 7, np.int32)  # everything into node 7
    dst[:100] = rng.integers(0, n, 100)
    et = rng.integers(0, 4, e).astype(np.int32)
    g = build_graph(src, dst, et, num_nodes=n, blocked=True,
                    block_nodes=16, chunk_edges=128)
    h = jnp.asarray(rng.standard_normal((g.num_nodes, 2, 8)).astype(np.float32))
    attn = jnp.asarray((rng.standard_normal((2, 4, 8)) * 0.3).astype(np.float32))
    bias = jnp.asarray((rng.standard_normal(4) * 0.1).astype(np.float32))
    want = relgat_propagate(h, attn, bias, g.src, g.dst, g.etype,
                            num_nodes=g.num_nodes)
    got = relgat_propagate_pallas(h, attn, bias, g.blocked)
    np.testing.assert_allclose(np.asarray(got)[:n], np.asarray(want)[:n],
                               rtol=1e-4, atol=1e-5)


def test_many_relations_graph_pallas():
    """R far above the tested 40 (the kernels' one-hot relation matmuls
    scale with R; a 200-relation KG must stay exact, fwd and grads)."""
    rng = np.random.default_rng(5)
    n, e, r = 60, 400, 200
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    et = rng.integers(0, r, e).astype(np.int32)
    g = build_graph(src, dst, et, num_nodes=n, blocked=True,
                    block_nodes=16, chunk_edges=64)
    h = jnp.asarray(
        rng.standard_normal((g.num_nodes, 2, 8)).astype(np.float32)
    )
    attn = jnp.asarray(
        (rng.standard_normal((2, r, 8)) * 0.3).astype(np.float32)
    )
    bias = jnp.asarray((rng.standard_normal(r) * 0.1).astype(np.float32))
    want = relgat_propagate(h, attn, bias, g.src, g.dst, g.etype,
                            num_nodes=g.num_nodes)
    got = relgat_propagate_pallas(h, attn, bias, g.blocked)
    np.testing.assert_allclose(np.asarray(got)[:n], np.asarray(want)[:n],
                               rtol=1e-4, atol=1e-5)

    gp = jax.grad(lambda a_, b_: jnp.sum(jnp.sin(
        relgat_propagate_pallas(h, a_, b_, g.blocked)[:n])),
        argnums=(0, 1))(attn, bias)
    gx = jax.grad(lambda a_, b_: jnp.sum(jnp.sin(
        relgat_propagate(h, a_, b_, g.src, g.dst, g.etype,
                         num_nodes=g.num_nodes)[:n])),
        argnums=(0, 1))(attn, bias)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_extreme_feature_magnitudes_keep_grads_finite():
    """Padding slots recompute logits from garbage (row-0 features x
    etype-0 attention) in the backward; with large-magnitude features the
    garbage logit can sit >88 above the slot's gathered softmax max, and
    exp overflow would turn the masked alpha into inf * 0 = NaN without
    the pre-exp clamp. Grads must stay finite and match XLA."""
    rng = np.random.default_rng(11)
    n, e, r, heads, f = 80, 300, 5, 2, 8
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    et = rng.integers(0, r, e).astype(np.int32)
    g = build_graph(src, dst, et, num_nodes=n, blocked=True,
                    block_nodes=16, chunk_edges=64)
    # 1e3-scale features -> logit spreads ~1e6 >> the exp(88) overflow gap.
    h = jnp.asarray(
        (rng.standard_normal((g.num_nodes, heads, f)) * 1e3).astype(
            np.float32
        )
    )
    attn = jnp.asarray(
        (rng.standard_normal((heads, r, f)) * 0.3).astype(np.float32)
    )

    # NOTE: at this magnitude the chunk-reference softmax is outside its
    # documented accuracy envelope (per-chunk logit spreads >> the exp(88)
    # underflow bound, BENCH_NOTES), so no XLA comparison here — the
    # hardening's contract is that gradients stay FINITE, never NaN.
    out = relgat_propagate_pallas(h, attn, None, g.blocked)
    assert np.isfinite(np.asarray(out)).all()
    gp = jax.grad(lambda h_, a_: jnp.sum(jnp.sin(
        relgat_propagate_pallas(h_, a_, None, g.blocked)[:n])),
        argnums=(0, 1))(h, attn)
    for name, a in zip(("dh", "dattn"), gp):
        assert np.isfinite(np.asarray(a)).all(), name
